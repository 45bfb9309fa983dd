"""Goldens for seeded label propagation: monotone spread, majority vote,
deterministic tie-break, convergence within diameter rounds."""

from ontoweaver_spark.graphstats import propagate_labels


def test_chain_spread_and_rounds(spark):
    e = spark.createDataFrame(
        [("s1", "a"), ("a", "b"), ("s2", "b"), ("b", "c")], ["src", "dst"]
    )
    seeds = spark.createDataFrame([("s1", "X"), ("s2", "Y")], ["node", "label"])
    got = {r["node"]: (r["label"], r["round_assigned"])
           for r in propagate_labels(e, seeds, rounds=3).collect()}
    assert got == {
        "s1": ("X", 0), "s2": ("Y", 0),
        "a": ("X", 1),          # only labeled neighbor is s1
        "b": ("Y", 1),          # at round 1 only s2 is labeled among nbrs
        "c": ("Y", 2),          # inherits from b one round later
    }


def test_majority_and_tie_break(spark):
    # m has neighbors: two X-seeds, one Y-seed -> X; t has one X one Y -> X
    # (tie broken by label asc)
    e = spark.createDataFrame(
        [("x1", "m"), ("x2", "m"), ("y1", "m"), ("x1", "t"), ("y1", "t")],
        ["src", "dst"],
    )
    seeds = spark.createDataFrame(
        [("x1", "X"), ("x2", "X"), ("y1", "Y")], ["node", "label"]
    )
    got = {r["node"]: r["label"]
           for r in propagate_labels(e, seeds, rounds=1).collect()}
    assert got["m"] == "X" and got["t"] == "X"


def test_seeds_never_flip(spark):
    # seed completely surrounded by the other label keeps its own
    e = spark.createDataFrame(
        [("y1", "s"), ("y2", "s"), ("y3", "s")], ["src", "dst"]
    )
    seeds = spark.createDataFrame(
        [("s", "X"), ("y1", "Y"), ("y2", "Y"), ("y3", "Y")], ["node", "label"]
    )
    got = {r["node"]: (r["label"], r["round_assigned"])
           for r in propagate_labels(e, seeds, rounds=2).collect()}
    assert got["s"] == ("X", 0)
    assert len(got) == 4  # nothing new to label
