"""URL canonicalization + latest-per-URL dedup (urls.py): rule-by-rule
expectations, Spark<->DuckDB mirror parity on tricky inputs, and the
single-aggregate dedup semantics."""

import duckdb
import pytest
from pyspark.sql import functions as F

TRICKY = [
    "HTTPS://Example.COM:443/path/Page?a=1#frag",       # case+port+fragment
    "http://example.com:80/",                           # http default port, root slash
    "http://example.com:8080/x",                        # NON-default port kept
    "https://example.com//a///b//",                     # duplicate slashes
    "https://example.com/x?utm_source=a&utm_medium=b",  # tracking-only query
    "https://example.com/x?utm_source=a&keep=1&gclid=z&also=2",
    "https://example.com/x?fbclid=abc#f",
    "https://example.com/CaseSensitive/Path?Q=UpPer",   # path/query case kept
    "example.com/no/scheme?utm_source=x",               # schemeless passthrough
    "https://example.com",                              # no path at all
    "https://EXAMPLE.com/x?keep=1&utm_campaign=c&",     # trailing separator
]

EXPECTED = [
    "https://example.com/path/Page?a=1",
    "http://example.com",
    "http://example.com:8080/x",
    "https://example.com/a/b",
    "https://example.com/x",
    "https://example.com/x?keep=1&also=2",
    "https://example.com/x",
    "https://example.com/CaseSensitive/Path?Q=UpPer",
    "example.com/no/scheme",
    "https://example.com",
    "https://example.com/x?keep=1",
]


def test_canonical_url_rules(spark):
    from ontoweaver_spark.urls import canonical_url

    df = spark.createDataFrame([(i, u) for i, u in enumerate(TRICKY)], "i int, url string")
    got = [r["c"] for r in
           df.select("i", canonical_url(F.col("url")).alias("c")).orderBy("i").collect()]
    assert got == EXPECTED


def test_canonical_url_duckdb_mirror_parity():
    """canonical_url_sql must produce byte-identical output in DuckDB for
    every tricky input — the mirror lives next to the implementation so
    this test catches any drift (incl. the all-matches 'g' flag DuckDB
    needs where Spark replaces globally by default)."""
    from ontoweaver_spark.urls import canonical_url_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE u AS SELECT * FROM (VALUES " +
                ", ".join(f"({i}, '{u}')" for i, u in enumerate(TRICKY)) +
                ") t(i, url)")
    got = [r[0] for r in con.execute(
        f"SELECT {canonical_url_sql('url')} FROM u ORDER BY i").fetchall()]
    assert got == EXPECTED


def test_latest_per_url(spark):
    from ontoweaver_spark.urls import latest_per_url

    rows = [
        ("https://a.com/x?utm_source=1", 10, "old"),
        ("HTTPS://A.COM/x/", 20, "new"),       # same canonical, later fetch
        ("https://a.com/x", 20, "tie-loser"),  # ts tie -> url string breaks it
        ("https://b.com/y", 5, "only"),
    ]
    df = spark.createDataFrame(rows, "url string, ts bigint, body string")
    got = {r["canonical_url"]: (r["body"], r["ts"], r["url"])
           for r in latest_per_url(df, url_col="url", ts_col="ts").collect()}
    assert set(got) == {"https://a.com/x", "https://b.com/y"}
    # max ts wins; on the ts tie the greater raw url string wins ('HTTPS://A.COM/x/' < 'https://a.com/x')
    assert got["https://a.com/x"] == ("tie-loser", 20, "https://a.com/x")
    assert got["https://b.com/y"][0] == "only"
    # schema: canonical key first, then the original columns
    assert latest_per_url(df, url_col="url", ts_col="ts").columns == \
        ["canonical_url", "url", "ts", "body"]


def test_latest_per_url_is_single_aggregate(spark):
    """Scale shape: dedup must be ONE aggregate pass with a map-side
    partial (struct max_by compiles to SortAggregate — still one exchange
    + partial combine), never a Window rank over the corpus."""
    from ontoweaver_spark.urls import latest_per_url

    df = spark.createDataFrame(
        [("https://a.com/x", 1, "b")], "url string, ts bigint, body string")
    plan = latest_per_url(df, url_col="url", ts_col="ts") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Exchange") == 1  # one shuffle, keyed on canonical url
    assert "partial_max_by" in plan     # map-side combine before it
