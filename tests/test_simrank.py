"""Goldens for truncated SimRank (Jeh & Widom KDD'02): hand-computed
fixed-point scores on toy graphs, symmetry of output ordering, and the
out-degree propagation cap."""

from ontoweaver_spark.graphstats import simrank_scores


def test_single_common_source(spark):
    # u -> a, u -> b: s1(a,b) = C = 0.8; stays 0.8 at round 2
    e = spark.createDataFrame([("u", "a"), ("u", "b")], ["src", "dst"])
    rows = simrank_scores(e, rounds=2).collect()
    assert [(r["a"], r["b"], r["simrank"]) for r in rows] == [("a", "b", 800000)]


def test_shared_pair_of_sources(spark):
    # x,y -> a and b; x -> c. s(a,b) = C*(s(x,x)+s(y,y))/4 = 0.4;
    # s(a,c) = s(b,c) = C*s(x,x)/(2*1) = 0.4 (I(x)=I(y)=empty keeps
    # round 2 identical to round 1)
    e = spark.createDataFrame(
        [("x", "a"), ("y", "a"), ("x", "b"), ("y", "b"), ("x", "c")],
        ["src", "dst"],
    )
    got = {(r["a"], r["b"]): r["simrank"]
           for r in simrank_scores(e, rounds=2).collect()}
    assert got == {("a", "b"): 400000, ("a", "c"): 400000, ("b", "c"): 400000}


def test_second_round_propagates(spark):
    # p -> x, p -> y (so s1(x,y)=0.8); x -> a, y -> b.
    # s1(a,b) = 0 (I(a)={x}, I(b)={y}, s0(x,y)=0) but
    # s2(a,b) = C * s1(x,y) = 0.8*0.8 = 0.64
    e = spark.createDataFrame(
        [("p", "x"), ("p", "y"), ("x", "a"), ("y", "b")], ["src", "dst"]
    )
    r1 = {(r["a"], r["b"]): r["simrank"]
          for r in simrank_scores(e, rounds=1).collect()}
    assert ("a", "b") not in r1 and r1[("x", "y")] == 800000
    r2 = {(r["a"], r["b"]): r["simrank"]
          for r in simrank_scores(e, rounds=2).collect()}
    assert r2[("a", "b")] == (8 * 800000) // 10 == 640000


def test_out_degree_cap_blocks_hub_propagation(spark):
    # hub -> a, b with cap below its out-degree: hub certifies nothing
    e = spark.createDataFrame(
        [("hub", "a"), ("hub", "b"), ("hub", "c")], ["src", "dst"]
    )
    assert simrank_scores(e, rounds=2, max_out_degree=2).count() == 0
    assert simrank_scores(e, rounds=2, max_out_degree=3).count() == 3
