"""Goldens for the structured-data harvesters over crawl HTML:
<meta>-tag (OpenGraph), schema.org microdata, and WebTables-style
first-table extraction. Reference analog: none (the reference consumes
pre-extracted CSVs); these are the web-KG bootstrap surface the north
rule targets."""

import pyspark.sql.functions as F

from ontoweaver_spark.webdoc import (
    extract_html_tables,
    extract_meta_tags,
    extract_microdata,
)

_HTML = """<html><head>
<meta property="og:title" content="My Page"/>
<meta name="description" content="A &amp; B">
<meta content="article" property="og:type" >
<meta charset="utf-8">
<meta property="og:image" content="i1.png"><meta property='og:image' content='i2.png'>
</head><body itemscope itemtype="https://schema.org/Article">
<span itemprop="author">Ada L.</span>
<meta itemprop="datePublished" content="2020-01-02">
<b itemprop = 'note'>s &amp; t</b>
<table class="t"><tr><th> name </th><th>age</th></tr>
<tr><td>Bob &lt;x&gt;</td><td>33</td></tr>
<tr><td><b>Eve</b></td><td></td></tr></table>
<table><tr><td>second table ignored</td></tr></table>
</body></html>"""


def _page(spark, html=_HTML):
    return spark.createDataFrame([("http://a", html)], ["url", "html"])


def test_meta_tags_golden(spark):
    got = {
        (r["predicate"], r["object"])
        for r in extract_meta_tags(_page(spark)).collect()
    }
    assert got == {
        ("og:title", "My Page"),
        ("description", "A & B"),  # entity decoded
        ("og:type", "article"),  # attribute order swapped
        ("og:image", "i1.png"),
        ("og:image", "i2.png"),  # single-quoted + repeated property
    }  # charset tag (no name/property) dropped


def test_microdata_golden(spark):
    got = {
        (r["predicate"], r["object"])
        for r in extract_microdata(_page(spark)).collect()
    }
    assert got == {
        ("a", "https://schema.org/Article"),
        ("author", "Ada L."),  # text-run value
        ("datePublished", "2020-01-02"),  # content= value
        ("note", "s & t"),  # single quotes, spaces around =, entity
    }


def test_html_tables_golden(spark):
    rows = {
        (r["row_idx"], r["col_idx"]): (r["header"], r["cell"])
        for r in extract_html_tables(_page(spark)).collect()
    }
    # header row emits no body cells; second table ignored
    assert rows == {
        (1, 0): ("name", "Bob <x>"),  # entity decoded, header trimmed
        (1, 1): ("age", "33"),
        (2, 0): ("name", "Eve"),  # inner tag stripped
        (2, 1): ("age", ""),
    }


def test_binary_html_and_absences(spark):
    df = spark.createDataFrame(
        [("http://b", bytearray(b"<html><body>plain</body></html>"))],
        ["url", "html"],
    ).select("url", F.col("html").cast("binary").alias("html"))
    assert extract_meta_tags(df).count() == 0
    assert extract_microdata(df).count() == 0
    assert extract_html_tables(df).count() == 0


def test_table_rows_to_frame_and_weave(spark):
    from ontoweaver_spark import weave
    from ontoweaver_spark.webdoc import table_rows_to_frame

    cells = extract_html_tables(_page(spark))
    frame = table_rows_to_frame(cells, ["name", "age", "missing"])
    rows = {r["row_idx"]: r for r in frame.collect()}
    assert rows[1]["name"] == "Bob <x>" and rows[1]["age"] == "33"
    assert rows[1]["missing"] is None  # declared-but-absent header -> null
    frame = frame.withColumn(
        "rid",
        F.concat("url", F.lit("#"), F.col("row_idx").cast("string")),
    )
    mapping = {
        "row": {"map": {"id_from_column": "rid", "to_subject": "table_row"}},
        "transformers": [
            {"map": {"column": "name", "to_object": "person",
                     "via_relation": "names"}},
        ],
    }
    _, fedges = weave(frame, mapping, affix="suffix")
    got = {(r["src"], r["dst"]) for r in fedges.collect()}
    assert ("http://a#1:table_row", "Bob <x>:person") in got
    assert ("http://a#2:table_row", "Eve:person") in got


def test_graph_from_triples_golden(spark):
    from ontoweaver_spark.ontology import graph_from_triples

    t = spark.createDataFrame(
        [("d1", "a", "Article"), ("d1", "a", "Blog"),  # multi-type -> min
         ("d1", "about", "e1"), ("d1", "name", "x"),
         ("d2", "about", "e1"), ("d2", "about", "e2"),
         ("e2", "a", "Person")],
        ["subject", "predicate", "object"],
    )
    nodes, edges, props = graph_from_triples(t, relation_predicates=["about"])
    n = {r["id"]: r["label"] for r in nodes.collect()}
    assert n == {"d1": "Article", "d2": "entity",
                 "e1": "entity", "e2": "Person"}
    e = {(r["src"], r["dst"], r["label"]) for r in edges.collect()}
    assert e == {("d1", "e1", "about"), ("d2", "e1", "about"),
                 ("d2", "e2", "about")}
    p = {(r["id"], r["key"], r["value"]) for r in props.collect()}
    assert p == {("d1", "name", "x")}


def test_infer_table_column_types(spark):
    from ontoweaver_spark.webdoc import infer_table_column_types

    rows = [("u", 1, 0, "n", "12"), ("u", 2, 0, "n", "-3"),
            ("u", 1, 1, "d", "1.5"), ("u", 2, 1, "d", "7"),
            ("u", 1, 2, "t", "2024-01-02"), ("u", 2, 2, "t", "n/a"),
            ("u", 1, 3, "s", "x"), ("u", 2, 3, "s", "")]
    df = spark.createDataFrame(
        rows, ["url", "row_idx", "col_idx", "header", "cell"]
    )
    got = {r["col_idx"]: r for r in infer_table_column_types(df).collect()}
    assert got[0]["inferred_type"] == "integer"
    assert got[1]["inferred_type"] == "decimal"  # ints + one true decimal
    assert got[2]["inferred_type"] == "string"  # 50% dates < 60% threshold
    assert got[3]["inferred_type"] == "string" and got[3]["n_empty"] == 1
    # all-empty column stays string without dividing by zero
    empty = spark.createDataFrame(
        [("u", 1, 0, "h", ""), ("u", 2, 0, "h", "")],
        ["url", "row_idx", "col_idx", "header", "cell"],
    )
    r = infer_table_column_types(empty).collect()[0]
    assert r["inferred_type"] == "string" and r["n_empty"] == 2


def test_script_profile_golden(spark):
    from ontoweaver_spark.textops import script_profile

    df = spark.createDataFrame(
        [(1, "hello мир 123"), (2, "日本語テキスト"), (3, "")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in script_profile(df).collect()}
    assert got[1]["latin_ppm"] == 5 * 1_000_000 // 13
    assert got[1]["cyrillic_ppm"] == 3 * 1_000_000 // 13
    assert got[1]["dominant_script"] == "latin"
    assert got[2]["cjk_ppm"] == 1_000_000
    assert got[2]["dominant_script"] == "cjk"
    assert got[3]["dominant_script"] == "none" and got[3]["n_chars"] == 0
