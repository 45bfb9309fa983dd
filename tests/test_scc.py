"""Strongly connected components: trim + mutual-reachability core."""


def _scc(spark, rows, **kw):
    from ontoweaver_spark.graphstats import strongly_connected_components

    edges = spark.createDataFrame(rows, "src string, dst string")
    out = strongly_connected_components(edges, **kw)
    comps = {}
    for r in out.collect():
        comps.setdefault(r.scc_id, set()).add(r.node)
    return {frozenset(v) for v in comps.values()}, dict(
        (r.node, r.scc_id) for r in out.collect()
    )


def test_cycle_with_tail_and_branch(spark):
    # tail t1->t2->a, cycle a->b->c->a, exit c->x
    comps, ids = _scc(
        spark,
        [("t1", "t2"), ("t2", "a"), ("a", "b"), ("b", "c"), ("c", "a"),
         ("c", "x")],
    )
    assert frozenset({"a", "b", "c"}) in comps
    assert ids["t1"] == "t1" and ids["t2"] == "t2" and ids["x"] == "x"
    assert ids["a"] == ids["b"] == ids["c"] == "a"


def test_two_cycles_connected_one_way_stay_separate(spark):
    # cycle1 a<->b, cycle2 c<->d, bridge b->c (one-directional)
    comps, _ = _scc(
        spark, [("a", "b"), ("b", "a"), ("c", "d"), ("d", "c"), ("b", "c")]
    )
    assert frozenset({"a", "b"}) in comps and frozenset({"c", "d"}) in comps


def test_acyclic_graph_all_singletons(spark):
    comps, _ = _scc(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    assert comps == {frozenset({"a"}), frozenset({"b"}), frozenset({"c"})}


def test_self_loop_is_singleton(spark):
    comps, ids = _scc(spark, [("a", "a"), ("a", "b")])
    assert ids["a"] == "a" and ids["b"] == "b"


def test_trim_early_stop_still_correct(spark):
    # chain into a 2-cycle; trim_rounds=1 leaves chain residue for the
    # closure phase — result must be identical
    rows = [(f"c{i}", f"c{i+1}") for i in range(6)] + [
        ("c6", "z1"), ("z1", "z2"), ("z2", "z1")
    ]
    full, _ = _scc(spark, rows)
    lazy, _ = _scc(spark, rows, trim_rounds=1)
    assert full == lazy
    assert frozenset({"z1", "z2"}) in full
