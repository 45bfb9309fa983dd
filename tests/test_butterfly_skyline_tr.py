"""Round-4 additions: butterfly counting, neighborhood Jaccard,
transitive reduction, distributed skyline."""

import pytest
from pyspark.sql import functions as F

from ontoweaver_spark.graphstats import (
    butterfly_count,
    neighbor_jaccard,
    transitive_reduction,
)
from ontoweaver_spark.sampling import skyline


def test_butterfly_k22_is_one(spark):
    # K_{2,2} is the butterfly itself
    e = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")], "l string, r string"
    )
    row = butterfly_count(e).first()
    assert (row["n_edges"], row["butterflies"]) == (4, 1)


def test_butterfly_k23_and_duplicate_edges(spark):
    # K_{2,3}: C(2,2)*C(3,2) = 3 butterflies; duplicate edges must not
    # inflate the count (the op dedups first)
    rows = [(l, r) for l in "ab" for r in "xyz"] + [("a", "x")] * 5
    e = spark.createDataFrame(rows, "l string, r string")
    row = butterfly_count(e).first()
    assert (row["n_edges"], row["butterflies"]) == (6, 3)


def test_butterfly_pivot_invariance(spark):
    # asymmetric graph: 1 hub on the right touching 6 lefts plus a
    # second shared right between two of them -> exactly C(2,2)=1
    # butterfly regardless of which side the wedge join pivots on
    rows = [(f"l{i}", "hub") for i in range(6)] + [("l0", "x"), ("l1", "x")]
    e = spark.createDataFrame(rows, "l string, r string")
    assert butterfly_count(e).first()["butterflies"] == 1
    flipped = e.select(F.col("r").alias("l"), F.col("l").alias("r"))
    assert butterfly_count(flipped).first()["butterflies"] == 1


def test_butterfly_no_wedges_zero(spark):
    e = spark.createDataFrame([("a", "x"), ("b", "y")], "l string, r string")
    row = butterfly_count(e).first()
    assert (row["n_edges"], row["butterflies"]) == (2, 0)


def test_neighbor_jaccard_exact_values(spark):
    # a-{x,y,z}, b-{x,y} (undirected): common(a,b)=2 via x,y;
    # deg(a)=3, deg(b)=2, union=3 -> jaccard = 2/3 -> 666666 ppm
    e = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("a", "z"), ("b", "x"), ("b", "y")],
        "src string, dst string",
    )
    out = {
        (r["node_a"], r["node_b"]): r
        for r in neighbor_jaccard(e, min_common=2).collect()
    }
    r = out[("a", "b")]
    assert (r["common"], r["degree_a"], r["degree_b"], r["jaccard_ppm"]) == (
        2, 3, 2, 666666,
    )
    # x and y both neighbor {a,b}: jaccard 1.0
    assert out[("x", "y")]["jaccard_ppm"] == 1_000_000


def test_neighbor_jaccard_max_degree_drops_hub_midpoint(spark):
    # hub h neighbors everything; with max_degree=2 the hub is removed
    # from neighbor sets, so a,b share nothing
    e = spark.createDataFrame(
        [("a", "h"), ("b", "h"), ("c", "h")], "src string, dst string"
    )
    assert neighbor_jaccard(e, min_common=1, max_degree=2).count() == 0
    assert neighbor_jaccard(e, min_common=1).count() == 3  # a,b,c pairwise via h


def test_transitive_reduction_diamond(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "d"), ("a", "c"), ("c", "d"), ("a", "d")],
        "src string, dst string",
    )
    kept = {(r["src"], r["dst"]) for r in transitive_reduction(e).collect()}
    assert kept == {("a", "b"), ("b", "d"), ("a", "c"), ("c", "d")}


def test_transitive_reduction_long_chain_shortcuts(spark):
    # chain 0->1->...->9 plus shortcuts 0->5 and 2->9: only chain stays
    chain = [(f"n{i}", f"n{i+1}") for i in range(9)]
    e = spark.createDataFrame(
        chain + [("n0", "n5"), ("n2", "n9")], "src string, dst string"
    )
    kept = {(r["src"], r["dst"]) for r in transitive_reduction(e).collect()}
    assert kept == set(chain)


def test_transitive_reduction_keeps_parallel_paths(spark):
    # two INDEPENDENT edges into d (no implied path): nothing removed
    e = spark.createDataFrame([("a", "d"), ("b", "d")], "src string, dst string")
    assert transitive_reduction(e).count() == 2


def _brute_skyline(points):
    out = []
    for p in points:
        dominated = any(
            all(q[i] >= p[i] for i in (1, 2)) and any(q[i] > p[i] for i in (1, 2))
            for q in points
        )
        if not dominated:
            out.append(p[0])
    return sorted(out)


def test_skyline_matches_bruteforce_multi_partition(spark):
    # deterministic scatter; verified against the O(n^2) definition
    points = [
        (i, (i * 37) % 101, (i * 73) % 97) for i in range(300)
    ]
    df = spark.createDataFrame(points, "doc_id long, a long, b long").repartition(7)
    got = sorted(
        r["doc_id"] for r in skyline(df, ["a", "b"]).select("doc_id").collect()
    )
    assert got == _brute_skyline(points)


def test_skyline_keeps_all_dim_ties(spark):
    # two rows equal on every dim dominate nothing and are both kept
    df = spark.createDataFrame(
        [(1, 10, 10), (2, 10, 10), (3, 1, 1)], "doc_id long, a long, b long"
    )
    got = sorted(r["doc_id"] for r in skyline(df, ["a", "b"]).collect())
    assert got == [1, 2]


def test_skyline_single_dim_is_max(spark):
    df = spark.createDataFrame(
        [(i, i % 50) for i in range(200)], "doc_id long, v long"
    )
    got = sorted(r["doc_id"] for r in skyline(df, ["v"]).collect())
    assert got == [i for i in range(200) if i % 50 == 49]


from ontoweaver_spark.graphstats import wl_colors
from ontoweaver_spark.dedup import suggest_bands


def test_wl_separates_by_neighbor_structure_at_round2(spark):
    # star s-(l1,l2,l3) plus l1-t: l2,l3,t are all degree-1 (same color
    # after round 1) but t hangs off a degree-2 node while l2,l3 hang
    # off the degree-3 hub -> round 2 separates t from l2,l3
    e = spark.createDataFrame(
        [("s", "l1"), ("s", "l2"), ("s", "l3"), ("l1", "t")],
        "src string, dst string",
    )
    c1 = {r["node"]: r["color"] for r in wl_colors(e, rounds=1).collect()}
    assert c1["l2"] == c1["l3"] == c1["t"]
    c2 = {r["node"]: r["color"] for r in wl_colors(e, rounds=2).collect()}
    assert c2["l2"] == c2["l3"]
    assert c2["t"] != c2["l2"]
    # symmetric nodes stay equal at every depth
    assert c2["l2"] == c2["l3"]


def test_wl_triangle_stays_uniform(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    colors = {r["color"] for r in wl_colors(e, rounds=3).collect()}
    assert len(colors) == 1


def test_wl_partition_invariant(spark):
    rows = [(f"n{i}", f"n{(i * 7 + 1) % 23}") for i in range(60)]
    e = spark.createDataFrame(rows, "src string, dst string")
    a = {(r["node"], r["color"]) for r in wl_colors(e.repartition(1), rounds=2).collect()}
    b = {(r["node"], r["color"]) for r in wl_colors(e.repartition(13), rounds=2).collect()}
    assert a == b


def test_suggest_bands_factorizes_and_targets_threshold():
    out = suggest_bands(0.8, 128)
    assert out["bands"] * out["rows"] == 128
    assert abs(out["curve_threshold"] - 0.8) < 0.15
    assert 0.1 < out["p_at_threshold"] < 0.95
    # a low threshold wants many bands / few rows; high wants the reverse
    lo, hi = suggest_bands(0.3, 128), suggest_bands(0.95, 128)
    assert lo["bands"] > hi["bands"]
    with pytest.raises(ValueError):
        suggest_bands(1.5, 128)
    with pytest.raises(ValueError):
        suggest_bands(0.5, 1)


from ontoweaver_spark.graphstats import core_numbers


def _peel_coreness(edges):
    # reference peeling implementation (driver-side, tests only)
    from collections import defaultdict
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b); adj[b].add(a)
    core, deg = {}, {n: len(v) for n, v in adj.items()}
    live = set(adj)
    k = 0
    while live:
        k_min = min(deg[n] for n in live)
        k = max(k, k_min)
        peel = [n for n in live if deg[n] <= k]
        while peel:
            n = peel.pop()
            if n not in live:
                continue
            core[n] = k
            live.discard(n)
            for m in adj[n]:
                if m in live:
                    deg[m] -= 1
                    if deg[m] <= k:
                        peel.append(m)
    return core


def test_coreness_matches_peeling_on_mixed_graph(spark):
    # clique K4 (coreness 3) + pendant chain + a C5 (coreness 2)
    edges = (
        [(f"k{i}", f"k{j}") for i in range(4) for j in range(i + 1, 4)]
        + [("k0", "p1"), ("p1", "p2")]
        + [(f"c{i}", f"c{(i+1) % 5}") for i in range(5)]
    )
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["coreness"] for r in core_numbers(df).collect()}
    assert got == _peel_coreness(edges)


def test_coreness_random_graph_vs_peeling(spark):
    edges = [(f"n{i % 37}", f"n{(i * 11 + 3) % 37}") for i in range(120)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src string, dst string").repartition(9)
    got = {r["node"]: r["coreness"] for r in core_numbers(df).collect()}
    assert got == _peel_coreness(edges)


def test_coreness_exact_rounds_monotone(spark):
    edges = [(f"k{i}", f"k{j}") for i in range(5) for j in range(i + 1, 5)]
    df = spark.createDataFrame(edges, "src string, dst string")
    r1 = {r["node"]: r["coreness"] for r in core_numbers(df, exact_rounds=1).collect()}
    r3 = {r["node"]: r["coreness"] for r in core_numbers(df, exact_rounds=3).collect()}
    assert all(r3[n] <= r1[n] for n in r1)
    assert set(r3.values()) == {4}  # K5 coreness


from ontoweaver_spark.graphstats import maximal_matching


def test_matching_is_valid_and_maximal(spark):
    edges = [(f"n{i % 19}", f"n{(i * 7 + 2) % 19}") for i in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src string, dst string").repartition(5)
    m = [(r["u"], r["v"]) for r in maximal_matching(df).collect()]
    used = [x for e in m for x in e]
    assert len(used) == len(set(used))  # no vertex twice
    und = {frozenset((a, b)) for a, b in edges}
    assert all(frozenset(e) in und for e in m)  # edges of the graph
    # maximal: every unmatched edge touches a matched vertex
    us = set(used)
    assert all(a in us or b in us for a, b in edges if a != b)


def test_matching_deterministic_across_partitionings(spark):
    edges = [(f"a{i}", f"b{(i * 3) % 11}") for i in range(40)]
    df = spark.createDataFrame(edges, "src string, dst string")
    m1 = sorted((r["u"], r["v"]) for r in maximal_matching(df.repartition(1)).collect())
    m2 = sorted((r["u"], r["v"]) for r in maximal_matching(df.repartition(8)).collect())
    assert m1 == m2


def test_matching_path_takes_local_min(spark):
    # triangle: exactly one edge can be matched
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    assert maximal_matching(df).count() == 1


from ontoweaver_spark.graphstats import diameter_double_sweep


def test_diameter_exact_on_path(spark):
    e = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(6)], "src string, dst string"
    )
    row = diameter_double_sweep(e, seed="n3", rounds=8).first()
    # from the middle the farthest end is 3 hops; sweep 2 finds the full 6
    assert (row["far_dist"], row["diameter_lb"]) == (3, 6)
    assert row["far_node"] in ("n0", "n6")


def test_diameter_star_and_cycle(spark):
    star = spark.createDataFrame(
        [("c", f"l{i}") for i in range(5)], "src string, dst string"
    )
    assert diameter_double_sweep(star, seed="c", rounds=4).first()["diameter_lb"] == 2
    cyc = spark.createDataFrame(
        [(f"n{i}", f"n{(i+1) % 8}") for i in range(8)], "src string, dst string"
    )
    # C8 diameter 4; double-sweep reaches it from any seed
    assert diameter_double_sweep(cyc, seed="n0", rounds=8).first()["diameter_lb"] == 4


def test_entailment_symmetric_and_transitive(spark):
    from ontoweaver_spark.ontology import (
        OWL_SYMMETRIC, OWL_TRANSITIVE, RDF_TYPE, RDFS_SUBPROPERTYOF,
        rdfs_entailment,
    )

    schema = spark.createDataFrame(
        [
            ("knows", RDF_TYPE, OWL_SYMMETRIC),
            ("partOf", RDF_TYPE, OWL_TRANSITIVE),
            ("partOf", RDFS_SUBPROPERTYOF, "relatedTo"),
        ],
        "subject string, predicate string, object string",
    )
    edges = spark.createDataFrame(
        [("a", "knows", "b"), ("x", "partOf", "y"), ("y", "partOf", "z")],
        "subject string, predicate string, object string",
    )
    types = spark.createDataFrame([], "node string, cls string")
    ec, _ = rdfs_entailment(schema, edges, types)
    got = {(r["subject"], r["predicate"], r["object"]) for r in ec.collect()}
    assert ("b", "knows", "a") in got              # symmetric
    assert ("x", "partOf", "z") in got             # transitive chain
    assert ("x", "relatedTo", "z") in got          # derived chain re-enters sp
    assert ("x", "relatedTo", "y") in got
    assert ("z", "partOf", "x") not in got         # no spurious flips


def test_entailment_symmetric_transitive_equivalence_closure(spark):
    from ontoweaver_spark.ontology import (
        OWL_SYMMETRIC, OWL_TRANSITIVE, RDF_TYPE, rdfs_entailment,
    )

    schema = spark.createDataFrame(
        [("same", RDF_TYPE, OWL_SYMMETRIC), ("same", RDF_TYPE, OWL_TRANSITIVE)],
        "subject string, predicate string, object string",
    )
    edges = spark.createDataFrame(
        [("a", "same", "b"), ("b", "same", "c")],
        "subject string, predicate string, object string",
    )
    types = spark.createDataFrame([], "node string, cls string")
    ec, _ = rdfs_entailment(schema, edges, types)
    got = {(r["subject"], r["object"]) for r in ec.collect()}
    # sym+trans on a chain = full equivalence relation incl. self edges
    assert got == {(x, y) for x in "abc" for y in "abc"}


def test_entailment_property_chain(spark):
    from ontoweaver_spark.ontology import rdfs_entailment

    schema = spark.createDataFrame(
        [("hasParent", "http://www.w3.org/2000/01/rdf-schema#subPropertyOf",
          "hasAncestor")],
        "subject string, predicate string, object string",
    )
    chains = spark.createDataFrame(
        [("hasParent", "hasParent", "hasGrandparent")],
        "first string, second string, implies string",
    )
    edges = spark.createDataFrame(
        [("a", "hasParent", "b"), ("b", "hasParent", "c"), ("c", "hasParent", "d")],
        "subject string, predicate string, object string",
    )
    types = spark.createDataFrame([], "node string, cls string")
    ec, _ = rdfs_entailment(schema, edges, types, chains=chains)
    got = {(r["subject"], r["predicate"], r["object"]) for r in ec.collect()}
    assert ("a", "hasGrandparent", "c") in got
    assert ("b", "hasGrandparent", "d") in got
    assert ("a", "hasGrandparent", "d") not in got   # chain is length-2, not closure
    assert ("a", "hasAncestor", "b") in got          # sp rewrite still applies
    # grandparent edges do NOT re-enter the chain (hasGrandparent is not
    # a chain member), so no a-(gp o p)->d artifacts
    assert ("a", "hasParent", "c") not in got


def test_entailment_chain_feeds_transitive(spark):
    from ontoweaver_spark.ontology import (
        OWL_TRANSITIVE, RDF_TYPE, rdfs_entailment,
    )

    # step o step => reach, and reach is transitive: the chain-derived
    # reach edges must themselves close transitively (loop interplay)
    schema = spark.createDataFrame(
        [("reach", RDF_TYPE, OWL_TRANSITIVE)],
        "subject string, predicate string, object string",
    )
    chains = spark.createDataFrame(
        [("step", "step", "reach")], "first string, second string, implies string"
    )
    edges = spark.createDataFrame(
        [(f"n{i}", "step", f"n{i+1}") for i in range(6)],
        "subject string, predicate string, object string",
    )
    types = spark.createDataFrame([], "node string, cls string")
    ec, _ = rdfs_entailment(schema, edges, types, chains=chains)
    got = {(r["subject"], r["object"]) for r in ec.collect()
           if r["predicate"] == "reach"}
    # chain gives (i, i+2); transitive closes all even gaps >= 2
    expect = {(f"n{i}", f"n{j}") for i in range(7) for j in range(i + 2, 7, 2)}
    assert got == expect


def test_suggest_cms_standard_guarantee():
    from ontoweaver_spark.textops import suggest_cms

    out = suggest_cms(0.001, 0.01)
    assert out["width"] == 2719 and out["depth"] == 5
    assert out["cells"] == 2719 * 5
    with pytest.raises(ValueError):
        suggest_cms(0.0, 0.01)
    with pytest.raises(ValueError):
        suggest_cms(0.001, 1.0)


def test_reciprocity_values(spark):
    from ontoweaver_spark.graphstats import reciprocity

    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("c", "c"), ("a", "b")],
        "src string, dst string",
    )
    row = reciprocity(e).first()
    # distinct non-loop edges: ab, ba, ac -> 2 of 3 reciprocal
    assert (row["n_edges"], row["n_reciprocal"], row["reciprocity_ppm"]) == (
        3, 2, 666666,
    )


def test_burst_windows_exact_threshold(spark):
    from datetime import datetime

    from ontoweaver_spark.sessions import burst_windows

    # key A: 3 quiet hours of 1 event + 1 hour of 10 -> 10*4 > 3*13: burst
    # key B: uniform 5/hour -> 5*4 == 3*20/..: 20 total, 5*4=20 < 60: none
    rows = []
    for h in range(3):
        rows.append(("A", datetime(2026, 1, 1, h, 30)))
    rows += [("A", datetime(2026, 1, 1, 3, m)) for m in range(10)]
    for h in range(4):
        rows += [("B", datetime(2026, 1, 1, h, m)) for m in range(5)]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = burst_windows(df, bucket_seconds=3600, factor=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["key"], r["n_events"], r["n_buckets"], r["total_events"]) == (
        "A", 10, 4, 13,
    )


def test_katz_truncated_path_counts(spark):
    from ontoweaver_spark.graphstats import katz_fixed_point

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    got = {
        r["node"]: r["katz"]
        for r in katz_fixed_point(e, iterations=2, alpha_inv=10, scale=1000).collect()
    }
    # c: 1 path of len 1 (1000//10=100) + 1 of len 2 ((1000+100)//10 - ...):
    # exact recurrence: k1 = {a:1000,b:1100,c:1100}; k2 adds b's k1//10=110
    assert got == {"a": 1000, "b": 1100, "c": 1110}


def test_katz_partition_invariant(spark):
    from ontoweaver_spark.graphstats import katz_fixed_point

    edges = [(f"n{i % 23}", f"n{(i * 5 + 1) % 23}") for i in range(80)]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = sorted(map(tuple, katz_fixed_point(df.repartition(1), iterations=3).collect()))
    b = sorted(map(tuple, katz_fixed_point(df.repartition(11), iterations=3).collect()))
    assert a == b


def test_square_count_known_graphs(spark):
    from ontoweaver_spark.graphstats import square_count

    c4 = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")], "src string, dst string"
    )
    assert square_count(c4).first()["squares"] == 1
    # K4 contains 3 distinct 4-cycles
    k4 = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")],
        "src string, dst string",
    )
    assert square_count(k4).first()["squares"] == 3
    # triangle has none
    tri = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    row = square_count(tri).first()
    assert (row["squares"], row["n_edges"]) == (0, 3)


def test_weighted_matching_prefers_low_cost(spark):
    from ontoweaver_spark.graphstats import maximal_matching

    # b is contested: (a,b) cost 2 vs (b,c) cost 0 -> (b,c) must win
    # regardless of hash order; then (a,d) cost 2 completes the matching
    e = spark.createDataFrame(
        [("a", "b", 2), ("b", "c", 0), ("a", "d", 2)],
        "src string, dst string, dist int",
    )
    m = sorted(
        (r["u"], r["v"]) for r in maximal_matching(e, cost_col="dist").collect()
    )
    assert m == [("a", "d"), ("b", "c")]
    # duplicate pair rows keep the MIN cost
    e2 = spark.createDataFrame(
        [("a", "b", 2), ("b", "a", 0), ("b", "c", 1)],
        "src string, dst string, dist int",
    )
    m2 = sorted(
        (r["u"], r["v"]) for r in maximal_matching(e2, cost_col="dist").collect()
    )
    assert m2 == [("a", "b")]


def test_extract_embedded_jsonld(spark):
    from ontoweaver_spark.webdoc import extract_embedded_jsonld

    pages = spark.createDataFrame(
        [
            ("u1", '<html><script type="application/ld+json">'
                   '{"@id":"e1","@type":"Article","name":"Foo","lang":"en"}'
                   '</script><body>x</body></html>'),
            ("u2", '<html><script type="application/ld+json">'
                   '{"@type":"Person","name":"Bar"}</script></html>'),  # no @id -> url
            ("u3", "<html>no block here</html>"),
        ],
        "url string, html string",
    )
    got = {(r["subject"], r["predicate"], r["object"])
           for r in extract_embedded_jsonld(pages).collect()}
    assert ("e1", "a", "Article") in got
    assert ("e1", "name", "Foo") in got and ("e1", "lang", "en") in got
    assert ("u2", "a", "Person") in got and ("u2", "name", "Bar") in got
    assert not any(s == "u3" for s, _, _ in got)
    assert not any(p.startswith("@") for _, p, _ in got)


def test_extract_embedded_jsonld_binary_html(spark):
    from pyspark.sql import functions as F

    from ontoweaver_spark.webdoc import extract_embedded_jsonld

    pages = spark.createDataFrame(
        [("u1", '<script type="application/ld+json">{"@type":"T","k":"v"}</script>')],
        "url string, h string",
    ).select("url", F.encode(F.col("h"), "utf-8").alias("html"))
    got = {(r["subject"], r["predicate"], r["object"])
           for r in extract_embedded_jsonld(pages).collect()}
    assert got == {("u1", "a", "T"), ("u1", "k", "v")}


def test_largest_component_extraction(spark):
    from ontoweaver_spark.graphstats import largest_component

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("p", "q"), ("q", "p")],
        "src string, dst string",
    )
    rows = largest_component(e).collect()
    assert {r["vertex"] for r in rows} == {"a", "b", "c", "d"}
    assert all(r["size"] == 4 for r in rows)
    # deterministic tie-break: two size-2 components -> after removing the
    # big one, 'p' component (label min) wins over 'x' lexicographically
    e2 = spark.createDataFrame(
        [("x", "y"), ("p", "q")], "src string, dst string"
    )
    rows2 = largest_component(e2).collect()
    assert {r["vertex"] for r in rows2} == {"p", "q"}


def test_jsonld_lines_roundtrip_and_escaping(spark):
    import json

    from ontoweaver_spark.rdf_export import serialize_jsonld_lines

    t = spark.createDataFrame(
        [
            ("s1", "name", 'say "hi"'),
            ("s1", "name", "b"),
            ("s1", "kind", "Doc"),
            ("s2", "path", "a\\b"),
        ],
        "subject string, predicate string, object string",
    )
    rows = {r["subject"]: r["line"] for r in serialize_jsonld_lines(t).collect()}
    d1 = json.loads(rows["s1"])
    assert d1 == {"@id": "s1", "kind": ["Doc"], "name": ["b", 'say "hi"']}
    d2 = json.loads(rows["s2"])
    assert d2 == {"@id": "s2", "path": ["a\\b"]}
    # byte determinism across partitionings
    a = sorted(r["line"] for r in serialize_jsonld_lines(t.repartition(1)).collect())
    b = sorted(r["line"] for r in serialize_jsonld_lines(t.repartition(7)).collect())
    assert a == b


def test_wl_graph_hash_invariance_and_discrimination(spark):
    from ontoweaver_spark.graphstats import wl_graph_hash

    tri = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    # isomorphic relabeling -> identical fingerprint
    tri2 = spark.createDataFrame(
        [("x", "y"), ("y", "z"), ("z", "x")], "src string, dst string"
    )
    h1, h2 = wl_graph_hash(tri).first(), wl_graph_hash(tri2).first()
    assert (h1["n_nodes"], h1["graph_hash"]) == (h2["n_nodes"], h2["graph_hash"])
    # path P3 has same node count but different structure
    p3 = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    h3 = wl_graph_hash(p3).first()
    assert h3["graph_hash"] != h1["graph_hash"]


def test_jsonld_lines_control_chars_and_raw_subject(spark):
    """Control characters JSON-escape (named + generic \\u00XX) and the
    subject column stays RAW so joins back to the source frame work."""
    import json

    from ontoweaver_spark.rdf_export import serialize_jsonld_lines

    t = spark.createDataFrame(
        [
            ('s "q"\n', "pred\ttab", "line1\nline2"),
            ('s "q"\n', "bell", "ding\x07dong\x01"),
        ],
        "subject string, predicate string, object string",
    )
    out = serialize_jsonld_lines(t).collect()
    assert len(out) == 1
    row = out[0]
    # raw subject for joinability
    assert row["subject"] == 's "q"\n'
    # the line is ONE line (no raw newline survives) and valid JSON
    assert "\n" not in row["line"] and "\t" not in row["line"]
    d = json.loads(row["line"])
    assert d["@id"] == 's "q"\n'
    assert d["pred\ttab"] == ["line1\nline2"]
    assert d["bell"] == ["ding\x07dong\x01"]
    assert "\\u0007" in row["line"] and "\\u0001" in row["line"]


def test_weighted_matching_rejects_out_of_range_cost(spark):
    """cost*2^60 overflows signed 64-bit at cost>=8; the in-plan guard
    must raise instead of silently producing a wrapped priority."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from ontoweaver_spark.graphstats import maximal_matching

    for bad in (8, -1):
        e = spark.createDataFrame(
            [("a", "b", bad)], "src string, dst string, dist int"
        )
        with pytest.raises(Exception) as ei:
            maximal_matching(e, cost_col="dist").collect()
        assert "out of range" in str(ei.value)
    # boundary cost 7 is fine
    e7 = spark.createDataFrame([("a", "b", 7)], "src string, dst string, dist int")
    assert maximal_matching(e7, cost_col="dist").count() == 1


def test_burst_windows_pre_1970_bucketing(spark):
    """Pre-epoch timestamps: bucket id comes from exact BIGINT truncating
    division (Spark `div` == DuckDB `//`), not float division + cast."""
    import datetime as dt

    from ontoweaver_spark.sessions import burst_windows

    tz = dt.timezone.utc
    # 4 events in one pre-1970 hour bucket, 1 in another -> burst fires
    rows = [("u", dt.datetime(1969, 12, 31, 10, m, tzinfo=tz)) for m in (0, 10, 20, 30)]
    rows.append(("u", dt.datetime(1969, 12, 31, 12, 0, tzinfo=tz)))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = burst_windows(df, bucket_seconds=3600, factor=1).collect()
    assert len(out) == 1
    r = out[0]
    # trunc-toward-zero (Spark `div` == DuckDB `//`): 10:00 (-14h exact)
    # stays in bucket -14, but 10:10..10:30 (-13.83h..-13.5h) truncate UP
    # to bucket -13 — so bucket -13 holds 3 events and is the burst
    assert r["bucket_start_us"] == -13 * 3600 * 1_000_000
    assert r["n_events"] == 3


def test_extract_embedded_jsonld_messy_script_tags(spark):
    """Real crawl HTML: extra attributes, reordering, single quotes,
    whitespace around '=' — all must still yield the block."""
    from ontoweaver_spark.webdoc import extract_embedded_jsonld

    variants = [
        '<script async type="application/ld+json" id="x">{"@id":"v1","@type":"T","k":"a"}</script>',
        "<script type='application/ld+json'>{\"@id\":\"v2\",\"@type\":\"T\",\"k\":\"b\"}</script>",
        '<script type = "application/ld+json" >{"@id":"v3","@type":"T","k":"c"}</script>',
        '<SCRIPT TYPE="APPLICATION/LD+JSON">{"@id":"v4","@type":"T","k":"d"}</SCRIPT>',
    ]
    pages = spark.createDataFrame(
        [(f"http://h/{i}", f"<html><head>{v}</head></html>")
         for i, v in enumerate(variants)],
        "url string, html string",
    )
    got = {(r["subject"], r["predicate"], r["object"])
           for r in extract_embedded_jsonld(pages).collect()}
    for i, val in enumerate("abcd"):
        assert (f"v{i+1}", "a", "T") in got
        assert (f"v{i+1}", "k", val) in got
