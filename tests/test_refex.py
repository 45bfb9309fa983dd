"""Hand-computed ReFeX goldens (Henderson et al. KDD'11, pruned
recursion): base degrees, round-1 neighbor sums, role equality of
symmetric spokes, and the column schedule."""

from ontoweaver_spark.graphstats import refex_features


def _star_chain(spark):
    # h -> a,b,c ; c -> d
    return spark.createDataFrame(
        [("h", "a"), ("h", "b"), ("h", "c"), ("c", "d")], ["src", "dst"]
    )


def test_round1_hand_computed(spark):
    got = {r["node"]: r for r in refex_features(_star_chain(spark), rounds=1).collect()}
    assert (got["h"]["od"], got["h"]["ind"]) == (3, 0)
    assert (got["h"]["os_od"], got["h"]["os_ind"]) == (1, 3)  # sums over a,b,c
    assert (got["a"]["is_od"], got["a"]["is_ind"]) == (3, 0)  # from h
    assert (got["c"]["os_ind"], got["d"]["is_od"]) == (1, 1)
    # a and b are the same role: identical vectors
    va = tuple(got["a"])[1:]
    vb = tuple(got["b"])[1:]
    assert va == vb
    # c is NOT the same role as a (it forwards to d)
    assert tuple(got["c"])[1:] != va


def test_column_schedule(spark):
    out1 = refex_features(_star_chain(spark), rounds=1)
    assert len(out1.columns) == 1 + 2 + 4
    out2 = refex_features(_star_chain(spark), rounds=2)
    assert len(out2.columns) == 1 + 2 + 4 + 8
    # round-2 columns recurse only over round-1 mints (pruned variant)
    assert "os_os_od" in out2.columns and "os_od_od" not in out2.columns


def test_round2_value(spark):
    got = {r["node"]: r for r in refex_features(_star_chain(spark), rounds=2).collect()}
    # d's in-neighbor is c; c's round-1 is_od = 3 (from h) -> d.is_is_od = 3
    assert got["d"]["is_is_od"] == 3
    # h has no in-neighbors: all is_* stay 0
    assert got["h"]["is_is_od"] == 0 and got["h"]["is_os_ind"] == 0
