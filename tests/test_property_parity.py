"""Property-based parity: the Column-compiled operators must agree with a
row-at-a-time Python model of the reference semantics on arbitrary inputs.

The reference has no property-based tests (SURVEY.md §5); these pin the
Spark compilation against models transcribed from the reference's
documented behavior (file:line cited per model). One hypothesis example =
one list of strings = one Spark job, so the suite stays fast.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ontoweaver_spark.ids import affix_id
from ontoweaver_spark.maths_grammar import compile_maths
from ontoweaver_spark.nulls import is_not_null

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# printable-ish cell values, plus the special null-ish cases
cells = st.one_of(
    st.none(),
    st.sampled_from(["", "nan", "NaN", "NAN", "None", "none", " ", "0"]),
    st.text(
        alphabet=st.characters(whitelist_categories=("L", "N", "P", "Z")),
        max_size=24,
    ),
)


def _run(spark, vals, expr):
    df = spark.createDataFrame([(v,) for v in vals], "c string")
    return [r["o"] for r in df.select(expr(F.col("c")).alias("o")).collect()]


# model of base.is_not_null (/root/reference/src/ontoweaver/base.py:25-44)
def _model_valid(v):
    return v is not None and v != "" and v.lower() != "nan" and v != "None"


@given(st.lists(cells, min_size=1, max_size=30))
@settings(**SETTINGS)
def test_is_not_null_parity(spark, vals):
    got = _run(spark, vals, is_not_null)
    assert got == [_model_valid(v) for v in vals]


# model of transformer.split (/root/reference/src/ontoweaver/transformer.py:169-248):
# regex split, pieces whitespace-stripped; invalid cells yield nothing
@given(st.lists(cells, min_size=1, max_size=20), st.sampled_from([",", ";", ", ", "; ", "\\|"]))
@settings(**SETTINGS)
def test_split_parity(spark, vals, sep):
    from ontoweaver_spark.spec import TransformerSpec
    from ontoweaver_spark.transformers import _split_arrays

    spec = TransformerSpec(op="split", columns=["c"], params={"separator": sep})
    df = spark.createDataFrame([(v,) for v in vals], "c string")
    got = [
        r["o"]
        for r in df.select(
            F.when(is_not_null(F.col("c")), _split_arrays(spec))
            .otherwise(F.array().cast("array<string>"))
            .alias("o")
        ).collect()
    ]
    want = [
        [p.strip() for p in re.split(sep, v)] if _model_valid(v) else []
        for v in vals
    ]
    assert got == want


# model of transformer.replace (/root/reference/src/ontoweaver/transformer.py:984-1055):
# re.sub(forbidden, substitute, v) then .strip(substitute)
@given(st.lists(st.text(max_size=24), min_size=1, max_size=20))
@settings(**SETTINGS)
def test_replace_parity(spark, vals):
    from ontoweaver_spark.transformers import _strip_chars

    forbidden, substitute = r"[^a-zA-Z0-9_`.()]", "_"
    got = _run(
        spark, vals,
        lambda c: _strip_chars(F.regexp_replace(c, forbidden, substitute), substitute),
    )
    want = [re.sub(forbidden, substitute, v).strip(substitute) for v in vals]
    assert got == want


# model of str.capitalize (transformer.py:609-628) over ASCII
@given(st.lists(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=16), min_size=1, max_size=20))
@settings(**SETTINGS)
def test_capitalize_parity(spark, vals):
    from ontoweaver_spark.transformers import _case_op

    got = _run(spark, vals, lambda c: _case_op("capitalize", c))
    assert got == [v.capitalize() for v in vals]


# affix modes (iterative.py:95-129)
@given(
    st.lists(st.text(alphabet="ab:_1", min_size=1, max_size=8), min_size=1, max_size=10),
    st.sampled_from(["none", "prefix", "suffix"]),
    st.sampled_from([":", "___"]),
)
@settings(**SETTINGS)
def test_affix_parity(spark, vals, mode, sep):
    got = _run(spark, vals, lambda c: affix_id(c, F.lit("T"), affix=mode, sep=sep))
    if mode == "none":
        want = list(vals)
    elif mode == "prefix":
        want = [f"T{sep}{v}" for v in vals]
    else:
        want = [f"{v}{sep}T" for v in vals]
    assert got == want


# maths grammar (transformer.py:1329-1506) vs Python eval on safe operands
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0.5, max_value=100, allow_nan=False),
            st.floats(min_value=0.5, max_value=100, allow_nan=False),
        ),
        min_size=1,
        max_size=15,
    ),
    st.sampled_from([
        "{x} + {y}", "{x} - {y}", "{x} * {y}", "{x} / {y}",
        "round({x}) + abs({y})", "({x} + {y}) * 2", "{x} ^ 2",
    ]),
)
@settings(**SETTINGS)
def test_maths_parity(spark, pairs, template):
    import builtins
    import math

    sql = compile_maths(template)
    df = spark.createDataFrame(pairs, "x double, y double")
    got = [r["o"] for r in df.select(F.expr(sql).cast("double").alias("o")).collect()]

    def model(x, y):
        expr = template.replace("{x}", repr(x)).replace("{y}", repr(y))
        expr = expr.replace("^", "**")
        # Spark's round() is HALF_UP on the decimal repr; Python's is
        # banker's — use the grammar's documented HALF_UP model
        def r(v):
            return math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)
        return eval(expr, {"round": r, "abs": builtins.abs})

    for g, (x, y) in zip(got, pairs):
        assert abs(g - model(x, y)) < 1e-6 * max(1.0, abs(model(x, y)))


# model of transformer.boolean (/root/reference/src/ontoweaver/transformer.py:1058-1202)
@given(st.lists(cells, min_size=1, max_size=20))
@settings(**SETTINGS)
def test_boolean_parity(spark, vals):
    from ontoweaver_spark.spec import TransformerSpec
    from ontoweaver_spark.transformers import compile_values

    spec = TransformerSpec(
        op="boolean", columns=["c"],
        params={"consider_true": ["yes", "1"], "consider_false": ["no", "0"],
                "output_true": "T", "output_false": "F"},
    )
    df = spark.createDataFrame([(v,) for v in vals], "c string")
    cv = compile_values(spec)
    got = [
        r["o"] for r in df.select(F.element_at(cv.values, 1).alias("o")).collect()
    ]
    want = [
        "T" if v in ("yes", "1") else "F" if v in ("no", "0") else None
        for v in vals
    ]
    assert got == want


# model of transformer.translate skip/keep policies (transformer.py:697-910)
@given(st.lists(cells, min_size=1, max_size=20), st.sampled_from(["skip", "keep"]))
@settings(**SETTINGS)
def test_translate_parity(spark, vals, policy):
    from ontoweaver_spark.spec import TransformerSpec
    from ontoweaver_spark.transformers import compile_values

    table = {"a": "A", "nan": "NAN-mapped", "": "EMPTY"}
    spec = TransformerSpec(
        op="translate", columns=["c"],
        params={"translations": table, "on_unknown_value": policy},
    )
    df = spark.createDataFrame([(v,) for v in vals], "c string")
    cv = compile_values(spec)
    got = [
        r["o"] for r in df.select(F.element_at(cv.values, 1).alias("o")).collect()
    ]

    def model(v):
        if v in table:
            return table[v]
        return v if policy == "keep" else None

    assert got == [model(v) for v in vals]


# ---- round-4 operators -----------------------------------------------------

# URL-ish strings: enough structure to exercise every canonicalization rule,
# enough junk to catch separator-cleanup edge cases
_url_bits = st.sampled_from([
    "http://", "HTTPS://", "", "Example.COM", "a.b.c", ":80", ":443", ":8080",
    "/", "//", "/Path", "/p/q", "?", "&", "#frag", "#", "?utm_source=x",
    "&utm_campaign=y", "?a=1", "&b=2", "?utm_medium=z&keep=1", "%20", "www.",
])
urlish = st.lists(_url_bits, min_size=1, max_size=8).map("".join)


@given(st.lists(urlish, min_size=1, max_size=20))
@settings(**SETTINGS)
def test_canonical_url_idempotent(spark, urls):
    """canonical(canonical(u)) == canonical(u): the cleanup rules must not
    create new material for each other (e.g. stripping a tracking param
    must not leave a separator that a second pass would remove)."""
    from ontoweaver_spark.urls import canonical_url

    df = spark.createDataFrame([(u,) for u in urls], "u string")
    rows = df.select(
        canonical_url(F.col("u")).alias("c1"),
        canonical_url(canonical_url(F.col("u"))).alias("c2"),
    ).collect()
    for r in rows:
        assert r["c1"] == r["c2"], r


@given(st.lists(urlish, min_size=1, max_size=20))
@settings(**SETTINGS)
def test_canonical_url_duckdb_mirror_property(spark, urls):
    """The DuckDB mirror must agree byte-for-byte on arbitrary URL-ish
    junk, not just the curated tricky list."""
    import duckdb

    from ontoweaver_spark.urls import canonical_url, canonical_url_sql

    df = spark.createDataFrame(list(enumerate(urls)), "i int, u string")
    got = [r["c"] for r in
           df.select("i", canonical_url(F.col("u")).alias("c")).orderBy("i").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE u(i INT, url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?, ?)", list(enumerate(urls)))
    exp = [r[0] for r in con.execute(
        f"SELECT {canonical_url_sql('url')} FROM u ORDER BY i").fetchall()]
    assert got == exp


@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1, max_size=12))
@settings(**SETTINGS)
def test_decontaminate_properties(spark, texts):
    """decontaminate(corpus, empty_eval) == corpus; with eval == corpus
    every doc is contaminated (each shares its own n-gram) -> empty; the
    result is always a subset of the corpus."""
    from ontoweaver_spark.decontam import decontaminate

    corpus = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string")
    empty_eval = spark.createDataFrame([], "doc_id bigint, text string")
    ids = {r["doc_id"] for r in corpus.collect()}

    kept_all = {r["doc_id"] for r in decontaminate(corpus, empty_eval, n=3).collect()}
    assert kept_all == ids

    kept_none = {r["doc_id"] for r in decontaminate(corpus, corpus, n=3).collect()}
    assert kept_none == set()  # every doc shares its own (partial) n-gram

    half = corpus.where(F.col("doc_id") % 2 == 0)
    kept_half = {r["doc_id"] for r in decontaminate(corpus, half, n=3).collect()}
    assert kept_half <= ids
    assert not (kept_half & {r["doc_id"] for r in half.collect()})
