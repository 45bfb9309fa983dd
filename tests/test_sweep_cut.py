"""Conductance sweep cut (Andersen-Chung-Lang local clustering, part 2).

Planted-partition golden: two 6-cliques joined by a single bridge edge;
pushing from inside clique A, the sweep's conductance minimum must land
exactly at the clique boundary with cut=1 (the bridge)."""

import pyspark.sql.functions as F

from ontoweaver_spark.graphstats import ppr_forward_push, ppr_sweep_cut


def _two_cliques(spark):
    edges = []
    a = [f"a{i}" for i in range(6)]
    b = [f"b{i}" for i in range(6)]
    for grp in (a, b):
        for x in grp:
            for y in grp:
                if x < y:
                    edges.append((x, y))
    edges.append(("a0", "b0"))
    e = spark.createDataFrame(edges, ["src", "dst"])
    sym = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return e, sym


def test_sweep_finds_planted_clique(spark):
    e, sym = _two_cliques(spark)
    seeds = spark.createDataFrame([("a3",)], ["node"])
    sweep = ppr_sweep_cut(e, ppr_forward_push(sym, seeds, rounds=4)).collect()
    best = min((r for r in sweep if r["phi_ppm"] is not None),
               key=lambda r: (r["phi_ppm"], r["rank"]))
    assert best["rank"] == 6
    assert best["cut"] == 1  # exactly the bridge edge
    assert best["vol"] == 31  # 2*15 clique + bridge endpoint
    # the best prefix IS clique A
    prefix = {r["node"] for r in sweep if r["rank"] <= 6}
    assert prefix == {f"a{i}" for i in range(6)}


def test_sweep_invariants(spark):
    e, sym = _two_cliques(spark)
    seeds = spark.createDataFrame([("a3",)], ["node"])
    rows = sorted(
        ppr_sweep_cut(e, ppr_forward_push(sym, seeds, rounds=4)).collect(),
        key=lambda r: r["rank"],
    )
    # ranks contiguous from 1, volume strictly increasing, cut >= 0
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    vols = [r["vol"] for r in rows]
    assert vols == sorted(vols) and len(set(vols)) == len(vols)
    assert all(r["cut"] >= 0 for r in rows)
    # all 12 nodes reached in 4 rounds on this graph: the full prefix has
    # zero boundary -> cut 0, phi NULL (min side is 0)
    assert rows[-1]["cut"] == 0 and rows[-1]["phi_ppm"] is None


def test_sweep_handles_unreached_nodes(spark):
    # path graph a-b-c-d with seed a and 1 round: mass reaches only a, b;
    # prefix {a,b} must show the b-c edge as open boundary cut
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src", "dst"]
    )
    sym = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    seeds = spark.createDataFrame([("a",)], ["node"])
    rows = sorted(
        ppr_sweep_cut(e, ppr_forward_push(sym, seeds, rounds=1)).collect(),
        key=lambda r: r["rank"],
    )
    nodes = [r["node"] for r in rows]
    assert set(nodes) <= {"a", "b"}
    last = rows[-1]
    # boundary of the reached set counts edges into UNRANKED territory
    assert last["cut"] >= 1
