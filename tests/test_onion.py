"""Goldens for onion decomposition: peel order on a path-plus-triangle,
core/layer separation within a core, and the round budget."""

from ontoweaver_spark.graphstats import onion_layers


def test_path_into_triangle(spark):
    # a-b-c-d chain attached to triangle d-e-f
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"),
         ("d", "e"), ("e", "f"), ("f", "d")],
        ["src", "dst"],
    )
    got = {r["node"]: (r["core"], r["layer"])
           for r in onion_layers(e, rounds=8).collect()}
    assert got == {
        "a": (1, 1), "b": (1, 2), "c": (1, 3),  # fringe peels inward
        "d": (2, 4), "e": (2, 4), "f": (2, 4),  # triangle = one 2-core layer
    }


def test_layers_separate_within_core(spark):
    # ring of 4 (2-core center) + a 2-chain pendant ring entry:
    # p1-p2-r1, ring r1-r2-r3-r4-r1
    e = spark.createDataFrame(
        [("p1", "p2"), ("p2", "r1"),
         ("r1", "r2"), ("r2", "r3"), ("r3", "r4"), ("r4", "r1")],
        ["src", "dst"],
    )
    got = {r["node"]: (r["core"], r["layer"])
           for r in onion_layers(e, rounds=8).collect()}
    assert got["p1"] == (1, 1) and got["p2"] == (1, 2)
    # all ring nodes are core 2 but a LATER layer than the pendant
    assert {got[f"r{i}"][0] for i in range(1, 5)} == {2}
    assert min(got[f"r{i}"][1] for i in range(1, 5)) > got["p2"][1]


def test_insufficient_rounds_is_partial(spark):
    e = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    # round 1: k=1 peels a, c; round 2 peels b -> 2 rounds = complete
    assert onion_layers(e, rounds=2).count() == 3
    assert onion_layers(e, rounds=1).count() == 2  # b still unpeeled
