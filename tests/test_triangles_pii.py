"""triangle_count (graphstats) and scrub_pii (textops) unit tests."""

from pyspark.sql import functions as F

from ontoweaver_spark.graphstats import triangle_count
from ontoweaver_spark.textops import scrub_pii


def _tri(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r["node"]: r["triangles"] for r in triangle_count(df).collect()}


def test_triangle_count_basic(spark):
    # K4 minus one edge: triangles {a,b,c} and {a,b,d}; c-d missing
    got = _tri(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d"), ("b", "d")])
    assert got == {"a": 2, "b": 2, "c": 1, "d": 1}


def test_triangle_count_simple_graph_semantics(spark):
    # duplicates, reversed duplicates, and self-loops must not change the
    # undirected SIMPLE graph; triangle-free graphs return no rows
    noisy = [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"), ("a", "c"),
             ("c", "c")]
    assert _tri(spark, noisy) == {"a": 1, "b": 1, "c": 1}
    assert _tri(spark, [("a", "b"), ("b", "c"), ("c", "d")]) == {}


def test_triangle_count_hub(spark):
    # a hub in many triangles: wheel graph — hub h + cycle v0..v4 gives 5
    # hub triangles and no others; exercises the degree-ordered orientation
    # (every spoke orients INTO the hub)
    rim = [(f"v{i}", f"v{(i + 1) % 5}") for i in range(5)]
    spokes = [("h", f"v{i}") for i in range(5)]
    got = _tri(spark, rim + spokes)
    assert got["h"] == 5
    assert all(got[f"v{i}"] == 2 for i in range(5))  # two adjacent spokes each


def test_scrub_pii(spark):
    rows = [
        (1, "mail me at jo.na+x@sub.example.org or jo@ex.io thanks"),
        (2, "server 192.168.0.1 and 10.0.0.255 up"),
        (3, "call +1 555-867-5309 or (555) 123 4567 today"),
        (4, "clean text with no pii at all"),
        (5, "combo a@b.co from 10.1.2.3 call 555-111-2222"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {r["id"]: r for r in scrub_pii(df).collect()}

    assert got[1]["n_email"] == 2 and got[1]["n_ipv4"] == 0
    assert "jo.na+x@sub.example.org" not in got[1]["clean_text"]
    assert got[1]["clean_text"].count("<EMAIL>") == 2

    assert got[2]["n_ipv4"] == 2
    assert got[2]["clean_text"] == "server <IP> and <IP> up"

    assert got[3]["n_phone"] == 2
    assert got[3]["clean_text"] == "call <PHONE> or <PHONE> today"

    assert (got[4]["n_email"], got[4]["n_ipv4"], got[4]["n_phone"]) == (0, 0, 0)
    assert got[4]["clean_text"] == got[4]["text"]

    # ordering: the IP is redacted before the phone pass can see digits
    assert got[5]["clean_text"] == "combo <EMAIL> from <IP> call <PHONE>"
    assert (got[5]["n_email"], got[5]["n_ipv4"], got[5]["n_phone"]) == (1, 1, 1)


def test_scrub_pii_zero_shuffle(spark):
    """The scrub is a pure projection — no Exchange in the plan."""
    df = spark.createDataFrame([(1, "a@b.co")], ["id", "text"])
    plan = scrub_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
