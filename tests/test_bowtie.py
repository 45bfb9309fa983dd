"""Golden for bow-tie decomposition (Broder WWW'00): every region
exercised on a hand-built graph, disjointness, and core determinism."""

from ontoweaver_spark.graphstats import bowtie_decomposition


def _graph(spark):
    return spark.createDataFrame(
        [("c1", "c2"), ("c2", "c3"), ("c3", "c1"),  # core 3-cycle
         ("b", "a"), ("a", "c1"),                   # IN chain
         ("c2", "x"), ("x", "y"),                   # OUT chain
         ("a", "t"), ("t", "x"),                    # tube bypassing core
         ("a", "tn"),                               # tendril off IN
         ("w", "y"),                                # tendril into OUT
         ("d", "e2")],                              # disconnected pair
        ["src", "dst"],
    )


def test_all_regions(spark):
    got = {r["node"]: r["region"]
           for r in bowtie_decomposition(_graph(spark), rounds=4).collect()}
    assert got == {
        "c1": "CORE", "c2": "CORE", "c3": "CORE",
        "a": "IN", "b": "IN",
        "x": "OUT", "y": "OUT",
        "t": "TUBE", "tn": "TENDRIL", "w": "TENDRIL",
        "d": "DISCONNECTED", "e2": "DISCONNECTED",
    }


def test_largest_scc_wins_deterministically(spark):
    # two 2-cycles: {a1,a2} and {z1,z2} same size -> min scc_id (a1) wins
    e = spark.createDataFrame(
        [("a1", "a2"), ("a2", "a1"), ("z1", "z2"), ("z2", "z1")],
        ["src", "dst"],
    )
    got = {r["node"]: r["region"]
           for r in bowtie_decomposition(e, rounds=3).collect()}
    assert got["a1"] == got["a2"] == "CORE"
    assert got["z1"] == got["z2"] == "DISCONNECTED"
