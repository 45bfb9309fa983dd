"""Unit tests for the session-7 operators: Luby MIS, Borůvka minimum
spanning forest, ordered funnel analysis, and ρdf entailment
materialization. Each test checks the DEFINING property of the operator
against an independent in-test computation (brute force / networkx-free
reference implementations in plain Python), not just row counts."""

import datetime as dt
import itertools

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- MIS


def _ring_edges(n):
    return [(f"v{i}", f"v{(i + 1) % n}") for i in range(n)]


def test_mis_is_independent_and_maximal(spark):
    from ontoweaver_spark.graphstats import maximal_independent_set

    # a ring plus chords plus a hub touching every 4th node
    edges = _ring_edges(40) + [("v0", "v20"), ("v5", "v33")] + [
        ("hub", f"v{i}") for i in range(0, 40, 4)
    ]
    e = spark.createDataFrame(edges, "src string, dst string")
    mis = {r["node"] for r in maximal_independent_set(e, rounds=12).collect()}

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # independent: no selected pair is adjacent
    for a, b in edges:
        assert not (a in mis and b in mis), f"adjacent pair {a},{b} both in MIS"
    # maximal: every unselected node has a selected neighbor
    for node, nbrs in adj.items():
        if node not in mis:
            assert nbrs & mis, f"{node} unselected with no selected neighbor"


def test_mis_matches_serial_luby_replay(spark):
    """The Spark result must equal a plain-Python replay of the same
    deterministic rule (priority = md5-padded key), round for round."""
    import hashlib

    from ontoweaver_spark.graphstats import maximal_independent_set

    edges = _ring_edges(23) + [("v3", "v17"), ("v8", "v14")]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r["node"], r["sel_round"])
        for r in maximal_independent_set(e, rounds=12, seed=7).collect()
    }

    def key(n):
        h = int(hashlib.md5(f"7:{n}".encode()).hexdigest()[:15], 16)
        return f"{h:020d}" + n

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    active = set(adj)
    want, rnd = set(), 0
    while active:
        rnd += 1
        winners = {
            n
            for n in active
            if all(key(n) < key(m) for m in adj[n] & active)
        }
        want |= {(n, rnd) for n in winners}
        active -= winners | {m for n in winners for m in adj[n]}
    assert got == want


def test_mis_raises_without_convergence(spark):
    from ontoweaver_spark.graphstats import maximal_independent_set

    e = spark.createDataFrame(_ring_edges(30), "src string, dst string")
    with pytest.raises(RuntimeError, match="active nodes remain"):
        maximal_independent_set(e, rounds=1)


# ---------------------------------------------------------------- MSF


def _kruskal(edges):
    """Reference MSF with the same (w, u, v) total order (plain Python)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = set()
    for w, u, v in sorted((w, min(u, v), max(u, v)) for u, v, w in edges):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            forest.add((u, v, w))
    return forest


def test_msf_matches_kruskal(spark):
    from ontoweaver_spark.graphstats import min_spanning_forest

    # two components + duplicate weights to exercise the tie-break
    edges = [
        ("a", "b", 3), ("b", "c", 1), ("a", "c", 3), ("c", "d", 5),
        ("d", "e", 2), ("e", "a", 4), ("b", "d", 1),
        ("x", "y", 7), ("y", "z", 7), ("x", "z", 7),
    ]
    e = spark.createDataFrame(edges, "src string, dst string, weight long")
    got = {
        (r["src"], r["dst"], r["weight"])
        for r in min_spanning_forest(e).collect()
    }
    assert got == _kruskal(edges)


def test_msf_long_chain_converges(spark):
    """A 64-node path graph: Borůvka merges pairwise, log2(64)=6 rounds;
    the forest must be the whole path."""
    from ontoweaver_spark.graphstats import min_spanning_forest

    edges = [(f"n{i:02d}", f"n{i + 1:02d}", (i * 37) % 19 + 1) for i in range(63)]
    e = spark.createDataFrame(edges, "src string, dst string, weight long")
    out = min_spanning_forest(e, rounds=8, jump_rounds=10)
    rows = out.collect()
    assert len(rows) == 63
    assert {(r["src"], r["dst"], r["weight"]) for r in rows} == _kruskal(edges)
    assert max(r["msf_round"] for r in rows) <= 7


def test_msf_raises_on_round_budget(spark):
    from ontoweaver_spark.graphstats import min_spanning_forest

    edges = [(f"n{i}", f"n{i + 1}", 1) for i in range(15)]
    e = spark.createDataFrame(edges, "src string, dst string, weight long")
    with pytest.raises(RuntimeError, match="Borůvka rounds"):
        min_spanning_forest(e, rounds=1)


# ------------------------------------------------------------- funnel


def test_funnel_earliest_semantics(spark):
    from ontoweaver_spark.sessions import funnel

    t0 = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # u1 completes in order: view@0, click@10, buy@20
        (1, "view", ts(0)), (1, "click", ts(10)), (1, "buy", ts(20)),
        # u2: click BEFORE first view must not count; completes later
        (2, "click", ts(0)), (2, "view", ts(5)), (2, "click", ts(7)), (2, "buy", ts(9)),
        # u3: never clicks
        (3, "view", ts(1)), (3, "buy", ts(2)),
        # u4: no view at all -> absent from output
        (4, "click", ts(1)), (4, "buy", ts(2)),
        # u5: buy before click -> stops at click
        (5, "view", ts(0)), (5, "buy", ts(1)), (5, "click", ts(3)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {
        r["user"]: (r["stages_completed"], r["t_1"], r["t_2"], r["t_3"])
        for r in funnel(ev, ["view", "click", "buy"]).collect()
    }

    def us(minutes):
        return int((t0 + dt.timedelta(minutes=minutes)).timestamp() * 1_000_000)

    assert set(out) == {1, 2, 3, 5}
    assert out[1] == (3, us(0), us(10), us(20))
    assert out[2] == (3, us(5), us(7), us(9))
    assert out[3] == (1, us(1), None, None)
    assert out[5] == (2, us(0), us(3), None)


def test_funnel_horizon_cuts_late_stages(spark):
    from ontoweaver_spark.sessions import funnel

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, "view", t0), (1, "click", t0 + dt.timedelta(minutes=61)),
        (2, "view", t0), (2, "click", t0 + dt.timedelta(minutes=59)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {
        r["user"]: r["stages_completed"]
        for r in funnel(ev, ["view", "click"], horizon_minutes=60).collect()
    }
    assert out == {1: 1, 2: 2}


def test_funnel_rejects_single_stage(spark):
    from ontoweaver_spark.sessions import funnel

    ev = spark.createDataFrame([], "user_id long, event_type string, ts timestamp")
    with pytest.raises(ValueError, match="at least 2 stages"):
        funnel(ev, ["view"])


# ---------------------------------------------------------- entailment


SP = "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"
DOM = "http://www.w3.org/2000/01/rdf-schema#domain"
RNG = "http://www.w3.org/2000/01/rdf-schema#range"
INV = "http://www.w3.org/2002/07/owl#inverseOf"
SC = "http://www.w3.org/2000/01/rdf-schema#subClassOf"


def _entail_brute(schema, edges, types):
    """Fixpoint ρdf + inverseOf by naive rule application (reference)."""
    sp = {(s, o) for s, p, o in schema if p == SP}
    inv = {(s, o) for s, p, o in schema if p == INV}
    dom = {(s, o) for s, p, o in schema if p == DOM}
    rng = {(s, o) for s, p, o in schema if p == RNG}
    sc = {(s, o) for s, p, o in schema if p == SC}
    E, T = set(edges), set(types)
    while True:
        nE = set(E)
        nE |= {(s, q, o) for (s, p, o) in E for (pp, q) in sp if pp == p}
        nE |= {(o, q, s) for (s, p, o) in E for (pp, q) in inv if pp == p}
        nE |= {(o, q, s) for (s, p, o) in E for (q, pp) in inv if pp == p}
        nT = set(T)
        nT |= {(s, c) for (s, p, o) in nE for (pp, c) in dom if pp == p}
        nT |= {(o, c) for (s, p, o) in nE for (pp, c) in rng if pp == p}
        nT |= {(x, d) for (x, c) in nT for (cc, d) in sc if cc == c}
        if nE == E and nT == T:
            return E, T
        E, T = nE, nT


def test_rdfs_entailment_matches_bruteforce_fixpoint(spark):
    from ontoweaver_spark.ontology import rdfs_entailment

    schema = [
        ("hasMother", SP, "hasParent"),
        ("hasParent", SP, "relatedTo"),
        ("hasParent", INV, "hasChild"),
        ("hasChild", SP, "caresFor"),
        ("hasParent", DOM, "Child"),
        ("hasParent", RNG, "Parent"),
        ("caresFor", DOM, "Guardian"),
        ("Parent", SC, "Person"),
        ("Child", SC, "Person"),
        ("Guardian", SC, "Adult"),
        ("Adult", SC, "Person"),
    ]
    edges = [("ann", "hasMother", "bea"), ("cal", "hasParent", "dan"),
             ("eve", "caresFor", "fay")]
    types = [("gil", "Parent")]
    sch = spark.createDataFrame(schema, "subject string, predicate string, object string")
    ed = spark.createDataFrame(edges, "subject string, predicate string, object string")
    ty = spark.createDataFrame(types, "node string, cls string")

    ec, tc = rdfs_entailment(sch, ed, ty)
    got_e = {(r["subject"], r["predicate"], r["object"]) for r in ec.collect()}
    got_t = {(r["node"], r["cls"]) for r in tc.collect()}
    want_e, want_t = _entail_brute(schema, edges, types)
    assert got_e == want_e
    assert got_t == want_t
    # spot-check the interacting chain: hasMother -> hasParent -> inverse
    # hasChild -> sub caresFor -> domain Guardian -> subclass Adult, Person
    assert ("bea", "hasChild", "ann") in got_e
    assert ("bea", "caresFor", "ann") in got_e
    assert ("bea", "Guardian") in got_t and ("bea", "Adult") in got_t


def test_rdfs_entailment_no_schema_is_identity(spark):
    from ontoweaver_spark.ontology import rdfs_entailment

    sch = spark.createDataFrame([], "subject string, predicate string, object string")
    ed = spark.createDataFrame(
        [("a", "p", "b")], "subject string, predicate string, object string"
    )
    ty = spark.createDataFrame([("a", "C")], "node string, cls string")
    ec, tc = rdfs_entailment(sch, ed, ty)
    assert [(r["subject"], r["predicate"], r["object"]) for r in ec.collect()] == [
        ("a", "p", "b")
    ]
    assert [(r["node"], r["cls"]) for r in tc.collect()] == [("a", "C")]
