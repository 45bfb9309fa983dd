"""Round-4 operators + the iterative-loop stats regression.

Covers:
- session.stats_reset_checkpoint: Catalyst size estimates must NOT compound
  across checkpointed loop rounds (the digit count of sizeInBytes doubled
  per round with bare localCheckpoint, killing every fixpoint loop at ~20
  rounds regardless of data size).
- dedup.connected_components (large-star/small-star): convergence on the
  adversarial shapes the old min-label+jump loop failed — long cycles and
  unions of permutation matchings.
- dedup.merge_components: incremental == from-scratch equivalence.
- graphstats.landmark_distances / harmonic_closeness: hand-computed BFS.
- linking.token_blocking_candidates: reordered-name recall, hot-token
  purge, CNP pruning.
"""

import random

from pyspark.sql import functions as F

from ontoweaver_spark.dedup import connected_components, merge_components
from ontoweaver_spark.graphstats import harmonic_closeness, landmark_distances
from ontoweaver_spark.linking import token_blocking_candidates
from ontoweaver_spark.session import stats_reset_checkpoint


def _digits(df):
    sz = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    return len(str(sz))


def test_stats_reset_checkpoint_bounds_size_estimate(spark):
    """Loop of self-join rounds: with bare localCheckpoint the sizeInBytes
    digit count doubles per round (38 -> 94 -> 205 -> ...); with
    stats_reset_checkpoint it stays at the leaf default."""
    df = spark.createDataFrame([(i, i) for i in range(10)], ["k", "x"])
    state = df.localCheckpoint()
    bare = state
    for _ in range(4):
        nxt = bare.alias("l").join(
            bare.alias("r"), F.col("l.k") == F.col("r.k")
        ).select(F.col("l.k").alias("k"), F.col("r.x").alias("x"))
        bare = nxt.localCheckpoint()
    grown = _digits(bare)

    fixed = state
    for _ in range(4):
        nxt = fixed.alias("l").join(
            fixed.alias("r"), F.col("l.k") == F.col("r.k")
        ).select(F.col("l.k").alias("k"), F.col("r.x").alias("x"))
        fixed = stats_reset_checkpoint(nxt)
    flat = _digits(fixed)

    assert grown > 200  # compounding snapshot estimates
    assert flat <= 20  # leaf default (~Long.MaxValue, 19 digits)
    assert fixed.count() == 10  # rewrap preserves the data


def _py_min_components(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for v in parent:
        comp.setdefault(find(v), []).append(v)
    out = {}
    for vs in comp.values():
        m = min(vs)
        for v in vs:
            out[v] = m
    return out


def _cc_dict(spark, edges, **kw):
    pairs = spark.createDataFrame(edges, ["a", "b"])
    return {
        r["vertex"]: r["component"]
        for r in connected_components(pairs, **kw).collect()
    }


def test_cc_long_cycle_converges_in_log_rounds(spark):
    """A 400-cycle: the old min-label+pointer-jump loop was LINEAR here
    and blew max_iterations=50; star rounds close it in ~10."""
    edges = [(f"v{i:03d}", f"v{(i + 1) % 400:03d}") for i in range(400)]
    stats = {}
    got = _cc_dict(spark, edges, max_iterations=15, stats=stats)
    assert got == _py_min_components(edges)
    assert stats["rounds"] <= 12


def test_cc_union_of_matchings(spark):
    """Two permutation matchings (the incremental-CC merge shape) form
    long alternating cycles; must converge and match union-find."""
    n = 300
    edges = [(f"v{r:03d}", f"v{(r * 7 + 3) % n:03d}") for r in range(0, n, 2)]
    edges += [(f"v{r:03d}", f"v{(r * 13 + 5) % n:03d}") for r in range(1, n, 2)]
    got = _cc_dict(spark, edges, max_iterations=20)
    assert got == _py_min_components(edges)


def test_cc_random_graph_matches_union_find(spark):
    random.seed(7)
    edges = [
        (f"r{random.randrange(200):03d}", f"r{random.randrange(200):03d}")
        for _ in range(150)
    ]
    got = _cc_dict(spark, edges)
    # self-pairs become singleton components of themselves
    assert got == _py_min_components(edges)


def test_merge_components_equals_scratch(spark):
    """Folding a second batch into existing labels == CC on the union."""
    random.seed(3)
    batch1 = [
        (f"x{random.randrange(120):03d}", f"x{random.randrange(120):03d}")
        for _ in range(80)
    ]
    batch2 = [
        (f"x{random.randrange(150):03d}", f"x{random.randrange(150):03d}")
        for _ in range(60)
    ]
    labels1 = connected_components(spark.createDataFrame(batch1, ["a", "b"]))
    merged = {
        r["vertex"]: r["component"]
        for r in merge_components(
            labels1, spark.createDataFrame(batch2, ["a", "b"])
        ).collect()
    }
    scratch = _py_min_components(batch1 + batch2)
    assert merged == scratch


def test_landmark_distances_hand_graph(spark):
    # path a->b->c->d plus shortcut a->c
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")], ["src", "dst"]
    )
    lm = spark.createDataFrame([("a",), ("c",)], ["node"])
    d = {
        (r["landmark"], r["node"]): r["dist"]
        for r in landmark_distances(edges, lm, rounds=3).collect()
    }
    assert d == {
        ("a", "a"): 0, ("a", "b"): 1, ("a", "c"): 1, ("a", "d"): 2,
        ("c", "c"): 0, ("c", "d"): 1,
    }


def test_harmonic_closeness_values(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")], ["src", "dst"]
    )
    lm = spark.createDataFrame([("a",), ("c",)], ["node"])
    h = {
        r["node"]: (r["n_landmarks"], r["harmonic"])
        for r in harmonic_closeness(edges, lm, rounds=3, scale=100).collect()
    }
    # self rows (dist 0) excluded; b: only a at dist 1; c: a at 1;
    # d: a at 2 (100 DIV 2 = 50) + c at 1 (100)
    assert h == {"b": (1, 100), "c": (1, 100), "d": (2, 150)}


def test_token_blocking_reordered_names_pair(spark):
    """'john smith' vs 'smith, john' share both tokens -> strongest pair;
    sorted-neighborhood would separate them lexicographically."""
    recs = spark.createDataFrame(
        [
            (1, "John Smith"),
            (2, "Smith, John"),
            (3, "Jane Doe"),
            (4, "doe jane"),
            (5, "unrelated name"),
        ],
        ["id", "name"],
    )
    out = {
        (r["id_a"], r["id_b"]): r["common_blocks"]
        for r in token_blocking_candidates(recs, top_k=5).collect()
    }
    assert out[(1, 2)] == 2
    assert out[(3, 4)] == 2
    assert (1, 3) not in out and (1, 5) not in out


def test_token_blocking_hot_token_purged(spark):
    """A token above max_block_size never generates pairs."""
    rows = [(i, f"acme widget {i}") for i in range(30)]
    recs = spark.createDataFrame(rows, ["id", "name"])
    out = token_blocking_candidates(recs, max_block_size=10, top_k=5)
    # 'acme'/'widget' df=30 > 10 purged; numbers unique -> no pairs at all
    assert out.count() == 0


def test_token_blocking_cnp_prune(spark):
    """top_k=1 keeps only each endpoint's strongest partner (ties by id)."""
    recs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta"), (3, "alpha")],
        ["id", "name"],
    )
    out = {
        (r["id_a"], r["id_b"]): r["common_blocks"]
        for r in token_blocking_candidates(recs, top_k=1).collect()
    }
    # (1,2) shares 2 blocks; (1,3)/(2,3) share 1 — node 3's best is (1,3)
    assert out == {(1, 2): 2, (1, 3): 1}


def _py_louvain(edge_list, rounds):
    """Pure-python mirror of graphstats.louvain_move: synchronous
    monotone-descent moves (only smaller-id targets, strict improvement,
    ties stay put / smaller id)."""
    import collections

    w = collections.Counter()
    for a, b in edge_list:
        if a == b:
            continue
        w[(a, b)] += 1
        w[(b, a)] += 1
    k = collections.Counter()
    for (a, _b), wt in w.items():
        k[a] += wt
    m2 = sum(k.values())
    comm = {a: a for a in k}
    for _ in range(rounds):
        tot = collections.Counter()
        for a in k:
            tot[comm[a]] += k[a]
        k_ac = collections.defaultdict(collections.Counter)
        for (a, b), wt in w.items():
            k_ac[a][comm[b]] += wt
        new = {}
        for a in k:
            cands = {
                c: v for c, v in k_ac[a].items() if c <= comm[a]
            }
            cands.setdefault(comm[a], k_ac[a].get(comm[a], 0))
            new[a] = min(
                cands.items(),
                key=lambda kv: (
                    -(m2 * kv[1]
                      - (tot[kv[0]] - (k[a] if kv[0] == comm[a] else 0)) * k[a]),
                    kv[0] != comm[a],
                    kv[0],
                ),
            )[0]
        comm = new
    return comm


def test_louvain_move_matches_python_reference(spark):
    from ontoweaver_spark.graphstats import louvain_move

    random.seed(11)
    edge_list = list({
        tuple(sorted((f"n{random.randrange(60):02d}", f"n{random.randrange(60):02d}")))
        for _ in range(90)
    })
    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    got = {
        r["node"]: r["community"]
        for r in louvain_move(edges, rounds=2).collect()
    }
    assert got == _py_louvain(edge_list, 2)


def test_louvain_move_two_triangles(spark):
    """Two triangles joined by a bridge: moves must find the triangle
    structure (2 communities) and improve modularity over singletons."""
    from ontoweaver_spark.graphstats import louvain_move, modularity

    edge_list = [
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("d", "e"), ("e", "f"), ("d", "f"),
        ("c", "d"),
    ]
    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    labels = louvain_move(edges, rounds=4)
    got = {r["node"]: r["community"] for r in labels.collect()}
    assert got == _py_louvain(edge_list, 4)
    # descent settles into exactly the two triangles (stable by round 3;
    # plain synchronous moves two-cycle here forever)
    assert len(set(got.values())) == 2
    assert got["a"] == got["b"] == got["c"]
    assert got["d"] == got["e"] == got["f"]
    again = {
        r["node"]: r["community"]
        for r in louvain_move(edges, rounds=6).collect()
    }
    assert again == got  # fixpoint reached, extra rounds are no-ops
    q = modularity(edges, labels).collect()[0]["modularity"]
    singles = spark.createDataFrame(
        [(n, n) for n in "abcdef"], ["node", "community"]
    )
    q0 = modularity(edges, singles).collect()[0]["modularity"]
    assert q > q0


def test_louvain_move_parallel_edges_sum(spark):
    """Duplicate input edges act as weight 2 — they must aggregate, not
    dedupe (weighted-graph semantics)."""
    from ontoweaver_spark.graphstats import louvain_move

    edge_list = [("a", "b"), ("a", "b"), ("b", "c"), ("c", "d"), ("c", "d")]
    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    got = {
        r["node"]: r["community"]
        for r in louvain_move(edges, rounds=2).collect()
    }
    assert got == _py_louvain(edge_list, 2)


def test_clustering_coefficient_hand_graph(spark):
    """Triangle a-b-c with pendant d on c: a,b fully clustered (1e6),
    c has 1 triangle of 3 possible neighbor pairs (333333), d degree-1
    -> 0."""
    from ontoweaver_spark.graphstats import clustering_coefficient

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")], ["src", "dst"]
    )
    got = {
        r["node"]: (r["degree"], r["triangles"], r["clustering"])
        for r in clustering_coefficient(edges).collect()
    }
    assert got == {
        "a": (2, 1, 1000000),
        "b": (2, 1, 1000000),
        "c": (3, 1, 333333),
        "d": (1, 0, 0),
    }


def test_clustering_coefficient_matches_brute_force(spark):
    from ontoweaver_spark.graphstats import clustering_coefficient

    random.seed(13)
    und = list({
        tuple(sorted((f"g{random.randrange(25)}", f"g{random.randrange(25)}")))
        for _ in range(60)
    })
    und = [e for e in und if e[0] != e[1]]
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect = {}
    for n, nb in adj.items():
        nbl = sorted(nb)
        t = sum(
            1
            for i in range(len(nbl))
            for j in range(i + 1, len(nbl))
            if nbl[j] in adj[nbl[i]]
        )
        d = len(nb)
        expect[n] = (d, t, (2 * t * 10**6) // (d * (d - 1)) if d > 1 else 0)
    edges = spark.createDataFrame(und, ["src", "dst"])
    got = {
        r["node"]: (r["degree"], r["triangles"], r["clustering"])
        for r in clustering_coefficient(edges).collect()
    }
    assert got == expect


def test_assortativity_star_is_minus_one(spark):
    """K_{1,3}: perfect hub-leaf mixing -> r = -1 exactly."""
    from ontoweaver_spark.graphstats import degree_assortativity

    edges = spark.createDataFrame(
        [("h", "l1"), ("h", "l2"), ("h", "l3")], ["src", "dst"]
    )
    row = degree_assortativity(edges).collect()[0]
    assert row["m"] == 3 and row["assortativity"] == -1.0


def test_assortativity_regular_graph_guard(spark):
    """A triangle is degree-regular: r is 0/0-undefined; the operator
    reports the documented 0.0 instead of NaN/null."""
    from ontoweaver_spark.graphstats import degree_assortativity

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], ["src", "dst"]
    )
    assert degree_assortativity(edges).collect()[0]["assortativity"] == 0.0


def test_weighted_pagerank_mass_follows_weight(spark):
    """b receives 9x a->b weight vs a->c: after 1 iteration b's rank
    reflects the 9:1 split of a's mass; unweighted treats them equally.
    Hand arithmetic: teleport=150000; a's rank 1e6 splits 900000/100000;
    b also gets c's... c->b? no — graph: a->b (w9), a->c (w1)."""
    from ontoweaver_spark.graphstats import pagerank_fixed_point

    edges = spark.createDataFrame(
        [("a", "b", 9), ("a", "c", 1)], ["src", "dst", "w"]
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank_fixed_point(
            edges, iterations=1, weight_col="w"
        ).collect()
    }
    # a: no inbound -> teleport only = 150000
    # b: 150000 + 85 * (1e6 * 9 // 10) // 100 = 150000 + 765000
    # c: 150000 + 85 * (1e6 * 1 // 10) // 100 = 150000 + 85000
    assert got == {"a": 150000, "b": 915000, "c": 235000}
    # unweighted: both children get the same
    got_u = {
        r["node"]: r["rank"]
        for r in pagerank_fixed_point(edges, iterations=1).collect()
    }
    assert got_u["b"] == got_u["c"]


def test_weighted_pagerank_parallel_edges_sum(spark):
    """Duplicate (src,dst) rows sum their weights, not dedupe."""
    from ontoweaver_spark.graphstats import pagerank_fixed_point

    dup = spark.createDataFrame(
        [("a", "b", 5), ("a", "b", 4), ("a", "c", 1)], ["src", "dst", "w"]
    )
    single = spark.createDataFrame(
        [("a", "b", 9), ("a", "c", 1)], ["src", "dst", "w"]
    )
    r1 = {r["node"]: r["rank"]
          for r in pagerank_fixed_point(dup, iterations=2, weight_col="w").collect()}
    r2 = {r["node"]: r["rank"]
          for r in pagerank_fixed_point(single, iterations=2, weight_col="w").collect()}
    assert r1 == r2


def _py_ktruss(edge_list, k):
    """Iterative python k-truss: drop edges with < k-2 triangles."""
    e = {tuple(sorted(x)) for x in edge_list if x[0] != x[1]}
    while True:
        adj = {}
        for a, b in e:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {
            (a, b): len(adj[a] & adj[b]) for a, b in e
        }
        kept = {ed for ed in e if sup[ed] >= k - 2}
        if kept == e:
            return {ed: sup[ed] for ed in e}
        e = kept


def test_ktruss_k4_with_pendant(spark):
    """K4 + a dangling edge: the dangling edge (0 triangles) peels, the
    K4 survives k=4 (every edge in 2 triangles)."""
    from ontoweaver_spark.graphstats import k_truss

    k4 = [("1", "2"), ("1", "3"), ("1", "4"), ("2", "3"), ("2", "4"), ("3", "4")]
    edges = spark.createDataFrame(k4 + [("4", "x")], ["src", "dst"])
    got = {
        (r["u"], r["v"]): r["support"] for r in k_truss(edges, k=4).collect()
    }
    assert got == {(a, b): 2 for a, b in k4}
    # k=5 needs support >= 3: nothing survives
    assert k_truss(edges, k=5).count() == 0


def test_ktruss_cascade(spark):
    """Triangle hanging off K4: its two private edges peel in round 1,
    which does NOT cascade into the K4 (supports stay >= 2)."""
    from ontoweaver_spark.graphstats import k_truss

    k4 = [("1", "2"), ("1", "3"), ("1", "4"), ("2", "3"), ("2", "4"), ("3", "4")]
    extra = [("1", "5"), ("2", "5")]
    edges = spark.createDataFrame(k4 + extra, ["src", "dst"])
    stats = {}
    got = {
        (r["u"], r["v"]) for r in k_truss(edges, k=4, stats=stats).collect()
    }
    assert got == set(k4)
    assert stats["rounds"] <= 3


def test_ktruss_matches_python(spark):
    from ontoweaver_spark.graphstats import k_truss

    random.seed(17)
    el = list({
        tuple(sorted((f"t{random.randrange(30):02d}", f"t{random.randrange(30):02d}")))
        for _ in range(120)
    })
    el = [e for e in el if e[0] != e[1]]
    edges = spark.createDataFrame(el, ["src", "dst"])
    got = {
        (r["u"], r["v"]): r["support"] for r in k_truss(edges, k=3).collect()
    }
    assert got == _py_ktruss(el, 3)


def test_ktruss_exact_rounds_mode(spark):
    """exact_rounds=1 reports the state after ONE peel (mid-cascade),
    the SQL-oracle-mirrorable mode."""
    from ontoweaver_spark.graphstats import k_truss

    k4 = [("1", "2"), ("1", "3"), ("1", "4"), ("2", "3"), ("2", "4"), ("3", "4")]
    extra = [("1", "5"), ("2", "5")]
    edges = spark.createDataFrame(k4 + extra, ["src", "dst"])
    one = {
        (r["u"], r["v"]): r["support"]
        for r in k_truss(edges, k=4, exact_rounds=1).collect()
    }
    # after round 1 the K4 edges carry their PRE-peel supports
    assert one[("1", "2")] == 3
    assert ("1", "5") not in one


def _py_node2vec(edge_list, walk_length, wr, wn, wf, seed=0, directed=False):
    import hashlib

    e = set()
    for a, b in edge_list:
        if a == b:
            continue
        e.add((a, b))
        if not directed:
            e.add((b, a))
    out = {}
    for a, b in e:
        out.setdefault(a, set()).add(b)

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = []
    for node in sorted(out):
        wid, prev, cur = f"{node}#0", None, node
        rows.append((wid, 0, cur))
        for step in range(1, walk_length + 1):
            cands = out.get(cur)
            if not cands:
                break
            best = None
            for nxt in cands:
                if prev is not None and nxt == prev:
                    w = wr
                elif prev is not None and (prev, nxt) in e:
                    w = wn
                else:
                    w = wf
                key = str(h(f"{wid}:{seed}:{step}:{nxt}") // w).zfill(20) + nxt
                if best is None or key < best[0]:
                    best = (key, nxt)
            prev, cur = cur, best[1]
            rows.append((wid, step, cur))
    return set(rows)


def test_node2vec_matches_python_mirror(spark):
    from ontoweaver_spark.graphstats import node2vec_walks

    random.seed(23)
    el = list({
        tuple(sorted((f"w{random.randrange(30):02d}", f"w{random.randrange(30):02d}")))
        for _ in range(70)
    })
    el = [e for e in el if e[0] != e[1]]
    edges = spark.createDataFrame(el, ["src", "dst"])
    got = {
        (r["walk_id"], r["step"], r["node"])
        for r in node2vec_walks(
            edges, walk_length=3, w_return=4, w_near=2, w_far=1
        ).collect()
    }
    assert got == _py_node2vec(el, 3, 4, 2, 1)


def test_node2vec_unit_weights_equals_uniform_walks(spark):
    """All weights 1 must reproduce random_walks' hash-min choice
    exactly (h DIV 1 == h, same walk ids, same order key)."""
    from ontoweaver_spark.graphstats import node2vec_walks, random_walks

    el = [(f"u{i}", f"u{(i * 3 + 1) % 17}") for i in range(17)]
    edges = spark.createDataFrame(el, ["src", "dst"])
    a = {
        (r["walk_id"], r["step"], r["node"])
        for r in node2vec_walks(edges, walk_length=3).collect()
    }
    b = {
        (r["walk_id"], r["step"], r["node"])
        for r in random_walks(edges, walk_length=3, walks_per_node=1).collect()
    }
    assert a == b


def test_node2vec_return_bias(spark):
    """Overwhelming w_return makes step 2 bounce back to the start on
    most walks (priority h DIV w shrinks ~w-fold)."""
    from ontoweaver_spark.graphstats import node2vec_walks

    random.seed(29)
    el = list({
        tuple(sorted((f"z{random.randrange(40):02d}", f"z{random.randrange(40):02d}")))
        for _ in range(100)
    })
    el = [e for e in el if e[0] != e[1]]
    edges = spark.createDataFrame(el, ["src", "dst"])
    walks = node2vec_walks(edges, walk_length=2, w_return=1000).collect()
    pos = {}
    for r in walks:
        pos.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    start = {w: p[0] for w, p in pos.items() if 0 in p}
    back = [w for w, p in pos.items() if 2 in p and p[2] == start[w]]
    with_step2 = [w for w, p in pos.items() if 2 in p]
    assert len(back) > 0.7 * len(with_step2)


def _py_betweenness(edge_list, landmarks, rounds, scale=10**6, directed=False):
    import collections

    e = set()
    for a, b in edge_list:
        if a == b:
            continue
        e.add((a, b))
        if not directed:
            e.add((b, a))
    adj = collections.defaultdict(set)
    for a, b in e:
        adj[a].add(b)
    bc = collections.Counter()
    for L in landmarks:
        dist = {L: 0}
        levels = {0: {L}}
        for t in range(1, rounds + 1):
            nxt = set()
            for u in levels[t - 1]:
                for w in adj[u]:
                    if w not in dist:
                        nxt.add(w)
            for w in nxt:
                dist[w] = t
            levels[t] = nxt
        sigma = {L: 1}
        for t in range(1, rounds + 1):
            for v in levels[t]:
                sigma[v] = sum(
                    sigma[u] for u in levels[t - 1] if v in adj[u]
                )
        delta = {}
        for t in range(rounds - 1, 0, -1):
            for v in levels[t]:
                s = 0
                for w in adj[v]:
                    if dist.get(w) == t + 1:
                        s += sigma[v] * (scale + delta.get(w, 0)) // sigma[w]
                if s:
                    delta[v] = s
        for v, d in delta.items():
            bc[v] += d
    return dict(bc)


def test_betweenness_path_graph(spark):
    """a->b->c->d from landmark a: b bridges two nodes (2*scale), c one
    (scale), d none."""
    from ontoweaver_spark.graphstats import betweenness_landmark

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src", "dst"]
    )
    lm = spark.createDataFrame([("a",)], ["node"])
    got = {
        r["node"]: r["betweenness"]
        for r in betweenness_landmark(
            edges, lm, rounds=3, directed=True
        ).collect()
    }
    assert got == {"b": 2_000_000, "c": 1_000_000}


def test_betweenness_diamond_splits_paths(spark):
    """a->{b,c}->d: two shortest paths to d, each broker carries half
    (sigma_d = 2 -> scale DIV 2 each)."""
    from ontoweaver_spark.graphstats import betweenness_landmark

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")], ["src", "dst"]
    )
    lm = spark.createDataFrame([("a",)], ["node"])
    got = {
        r["node"]: r["betweenness"]
        for r in betweenness_landmark(
            edges, lm, rounds=2, directed=True
        ).collect()
    }
    assert got == {"b": 500_000, "c": 500_000}


def test_betweenness_matches_python_mirror(spark):
    from ontoweaver_spark.graphstats import betweenness_landmark

    random.seed(31)
    el = list({
        tuple(sorted((f"q{random.randrange(40):02d}", f"q{random.randrange(40):02d}")))
        for _ in range(80)
    })
    el = [e for e in el if e[0] != e[1]]
    lms = sorted({a for a, _ in el})[:3]
    edges = spark.createDataFrame(el, ["src", "dst"])
    lm = spark.createDataFrame([(x,) for x in lms], ["node"])
    got = {
        r["node"]: r["betweenness"]
        for r in betweenness_landmark(
            edges, lm, rounds=3, directed=False
        ).collect()
    }
    assert got == _py_betweenness(el, lms, 3)


def _py_anf(edge_list, rounds, k, directed=False):
    import hashlib

    e = set()
    for a, b in edge_list:
        if a == b:
            continue
        e.add((a, b))
        if not directed:
            e.add((b, a))
    adj = {}
    for a, b in e:
        adj.setdefault(a, set()).add(b)
    nodes = {x for ab in e for x in ab}

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    # exact reachability then KMV estimate — the oracle formulation
    out = {}
    for v in nodes:
        reach = {v}
        frontier = {v}
        for _ in range(rounds):
            frontier = {w for u in frontier for w in adj.get(u, ())} - reach
            reach |= frontier
        hs = sorted(h(x) for x in reach)[:k]
        n_kept = len(hs)
        if n_kept < k:
            est = n_kept
        else:
            est = int((k - 1) * float(1 << 60) / float(hs[-1]) + 0.5)
        out[v] = (n_kept, est)
    return out


def test_anf_exact_below_k(spark):
    """Small graph, big k: sketches never saturate, counts are EXACT
    h-hop neighborhood sizes."""
    from ontoweaver_spark.graphstats import neighborhood_function

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")], ["src", "dst"]
    )
    got = {
        r["node"]: (r["n_kept"], r["estimate"])
        for r in neighborhood_function(edges, rounds=2, k=16).collect()
    }
    # undirected: a reaches {a,b,c} in 2; b reaches all 4; x,y reach {x,y}
    assert got["a"] == (3, 3)
    assert got["b"] == (4, 4)
    assert got["x"] == (2, 2)
    assert got["y"] == (2, 2)


def test_anf_matches_exact_reachability_estimator(spark):
    """Sketch merge == min-k of the exact reachable set's hashes (the
    KMV merge is exact on the k smallest), incl. saturated nodes."""
    from ontoweaver_spark.graphstats import neighborhood_function

    random.seed(37)
    el = list({
        tuple(sorted((f"m{random.randrange(50):02d}", f"m{random.randrange(50):02d}")))
        for _ in range(110)
    })
    el = [e for e in el if e[0] != e[1]]
    edges = spark.createDataFrame(el, ["src", "dst"])
    got = {
        r["node"]: (r["n_kept"], r["estimate"])
        for r in neighborhood_function(edges, rounds=3, k=8).collect()
    }
    assert got == _py_anf(el, 3, 8)


def _py_densest_trace(edge_list, eps_pct, scale=10**6):
    e = {tuple(sorted(x)) for x in edge_list if x[0] != x[1]}
    trace = []
    i = 0
    while True:
        deg = {}
        for a, b in e:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        nv, ne = len(deg), len(e)
        trace.append((i, nv, ne, (ne * scale) // nv if nv else 0))
        if nv == 0:
            break
        bad = {n for n, d in deg.items() if d * nv * 100 <= 2 * ne * (100 + eps_pct)}
        e = {(a, b) for a, b in e if a not in bad and b not in bad}
        i += 1
    return trace


def test_densest_clique_plus_fringe(spark):
    """K5 with pendant leaves: the peel strips the fringe first; the best
    density row is the clique's (10 edges / 5 nodes = 2*scale)."""
    from ontoweaver_spark.graphstats import densest_subgraph

    k5 = [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
    fringe = [(f"c{i}", f"leaf{i}{j}") for i in range(5) for j in range(2)]
    edges = spark.createDataFrame(k5 + fringe, ["src", "dst"])
    trace = sorted(
        (r["round"], r["n_nodes"], r["n_edges"], r["density"])
        for r in densest_subgraph(edges, epsilon_pct=10).collect()
    )
    assert trace == sorted(_py_densest_trace(k5 + fringe, 10))
    best = max(trace, key=lambda t: t[3])
    assert best[1] == 5 and best[2] == 10 and best[3] == 2_000_000
    # exact_rounds at the best round materializes the clique itself
    sub = {
        tuple(sorted((r["u"], r["v"])))
        for r in densest_subgraph(
            edges, epsilon_pct=10, exact_rounds=best[0]
        ).collect()
    }
    assert sub == {tuple(sorted(p)) for p in k5}


def test_densest_trace_matches_python(spark):
    from ontoweaver_spark.graphstats import densest_subgraph

    random.seed(41)
    el = list({
        tuple(sorted((f"d{random.randrange(35):02d}", f"d{random.randrange(35):02d}")))
        for _ in range(90)
    })
    el = [e for e in el if e[0] != e[1]]
    edges = spark.createDataFrame(el, ["src", "dst"])
    trace = sorted(
        (r["round"], r["n_nodes"], r["n_edges"], r["density"])
        for r in densest_subgraph(edges, epsilon_pct=25).collect()
    )
    assert trace == sorted(_py_densest_trace(el, 25))


def _near_dup_corpus(spark):
    rows = []
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    words = base.split()
    for i in range(40):
        w = list(words)
        w[i % len(w)] = f"tok{i}"
        rows.append((i, " ".join(w)))
    rows.append((100, " ".join(words)))        # exact of the base shape
    rows.append((101, "completely different content about spark engines"))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_prefix_jaccard_equals_plain_inverted_index(spark):
    """The prefix filter must be LOSSLESS: identical output to the full
    inverted-index join at the same threshold."""
    from ontoweaver_spark.dedup import jaccard_pairs, jaccard_pairs_prefix

    docs = _near_dup_corpus(spark)
    plain = {
        (r["a"], r["b"], r["jaccard"])
        for r in jaccard_pairs(docs, threshold=0.6).collect()
    }
    pref = {
        (r["a"], r["b"], r["jaccard"])
        for r in jaccard_pairs_prefix(docs, threshold=0.6).collect()
    }
    assert pref == plain
    assert len(pref) > 10  # the corpus genuinely has near-dup pairs


def test_prefix_jaccard_prunes_candidates(spark):
    """At t=0.8 the prefix index is ~20% of shingles -> far fewer raw
    candidate pairs than the full inverted-index join."""
    from ontoweaver_spark.dedup import jaccard_pairs_prefix, shingles
    from pyspark.sql import functions as F

    docs = _near_dup_corpus(spark)
    sh = docs.select("doc_id", F.explode(shingles(F.col("text"), 3)).alias("s")).distinct()
    full_pairs = (
        sh.alias("l").join(sh.alias("r"), "s")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select("l.doc_id", "r.doc_id").distinct().count()
    )
    # reproduce the operator's internal candidate count at t=0.8
    out = jaccard_pairs_prefix(docs, threshold=0.8)
    # the output is a subset of candidates; the real assertion is
    # correctness + that the index got smaller — measure prefix size
    from ontoweaver_spark.compiler import with_row_index
    ranked = with_row_index(
        sh.groupBy("s").agg(F.count("*").alias("_df")).orderBy("_df", "s"), "_rank"
    ).select("s", "_rank")
    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy("_rank")
    counted = sh.join(ranked, "s")
    n = counted.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    pos = counted.withColumn("_p", F.row_number().over(w)).join(n, "doc_id")
    prefix = pos.where(
        F.col("_p") <= F.col("n_sh") - F.ceil(F.lit(0.8) * F.col("n_sh")) + 1
    )
    pref_pairs = (
        prefix.alias("l").join(prefix.alias("r"), "s")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select("l.doc_id", "r.doc_id").distinct().count()
    )
    assert pref_pairs < full_pairs / 3
    assert out.count() >= 1
