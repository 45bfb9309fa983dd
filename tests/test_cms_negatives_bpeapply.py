"""CMS sketch, per-group exact-k sampling, KG negative sampling, BPE apply."""

import hashlib

from pyspark.sql import functions as F


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_cms_sketch_and_estimate(spark):
    from ontoweaver_spark.textops import cms_estimate, cms_sketch

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b c")], "doc_id bigint, text string"
    )
    sk = cms_sketch(df, d=2, w=8)
    cells = {(r["row"], r["bucket"]): r["c"] for r in sk.collect()}
    # python reference
    ref = {}
    for tok in ["a", "a", "a", "b", "a", "b", "c"]:
        for i in range(2):
            k = (i, _md5int(f"cms{i}:{tok}") % 8)
            ref[k] = ref.get(k, 0) + 1
    assert cells == ref
    # sum per row == total token count
    for i in range(2):
        assert sum(v for (r, _), v in cells.items() if r == i) == 7

    probes = spark.createDataFrame([("a",), ("b",), ("c",), ("zz",)], "token string")
    est = {r["token"]: r["cms_n"] for r in cms_estimate(sk, probes, d=2, w=8).collect()}
    # CMS never under-counts
    assert est["a"] >= 4 and est["b"] >= 2 and est["c"] >= 1
    # exact unless a collision in BOTH rows
    exp = {
        t: min(
            sum(
                v
                for (i2, b2), v in ref.items()
                if i2 == i and b2 == _md5int(f"cms{i}:{t}") % 8
            )
            for i in range(2)
        )
        for t in ["a", "b", "c", "zz"]
    }
    assert est == exp


def test_per_group_sample_exact_k(spark):
    from ontoweaver_spark.sampling import per_group_sample

    rows = [(i, "g1" if i % 2 == 0 else "g2") for i in range(20)] + [(100, "g3")]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = per_group_sample(df, "lang", k=3, key_col="doc_id", seed=5)
    got = {}
    for r in out.collect():
        got.setdefault(r["lang"], []).append(r["doc_id"])
    assert len(got["g1"]) == 3 and len(got["g2"]) == 3
    assert got["g3"] == [100]  # smaller group returned whole
    # winners = k smallest md5(seed:key) per group (python reference)
    for g, members in [("g1", range(0, 20, 2)), ("g2", range(1, 20, 2))]:
        exp = sorted(members, key=lambda i: (_md5int(f"5:{i}"), i))[:3]
        assert sorted(got[g]) == sorted(exp)
    # deterministic across partitionings
    again = per_group_sample(df.repartition(7), "lang", k=3, key_col="doc_id", seed=5)
    assert {tuple(sorted(r)) for r in [[x["doc_id"] for x in again.collect()]]} == {
        tuple(sorted([x for v in got.values() for x in v]))
    }


def test_negative_triples(spark):
    from ontoweaver_spark.graphstats import negative_triples

    edges = spark.createDataFrame(
        [("n1", "rel", "n2"), ("n2", "rel", "n3"), ("n3", "rel", "n1")],
        "src string, label string, dst string",
    )
    out = [
        (r["src"], r["label"], r["neg_dst"], r["j"])
        for r in negative_triples(edges, m=4, seed=3).collect()
    ]
    nodes = sorted(["n1", "n2", "n3"])
    true = {("n1", "rel", "n2"), ("n2", "rel", "n3"), ("n3", "rel", "n1")}
    # python reference: same hash-pick, same filters
    exp = []
    for s, l, d in sorted(true):
        for j in range(4):
            pick = nodes[_md5int(f"neg3:{j}:{s}>{l}>{d}") % 3]
            if pick != d and (s, l, pick) not in true:
                exp.append((s, l, pick, j))
    assert sorted(out) == sorted(exp)
    assert len(out) > 0
    # no negative is a true edge or a self-correction
    for s, l, nd, _ in out:
        assert (s, l, nd) not in true


def test_bpe_apply_counts(spark):
    from ontoweaver_spark.textops import bpe_apply, bpe_merges

    # corpus where 'ab' merges first: "abab abab cd"
    df = spark.createDataFrame(
        [(1, "abab abab cd"), (2, "ab cd cd")], "doc_id bigint, text string"
    )
    merges = bpe_merges(df, k_merges=2)
    out = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_apply(df, merges).collect()
    }
    rules = [(r["a"], r["b"]) for r in merges.orderBy("step").collect()]

    def apply_word(w):
        syms = "  " + "  ".join(list(w)) + "  </w>  "
        for a, b in rules:
            syms = syms.replace(f" {a}  {b} ", f" {a}{b} ")
        return len(syms.strip().split("  ")) - 1

    exp = {}
    for doc, text in [(1, "abab abab cd"), (2, "ab cd cd")]:
        ws = text.split()
        exp[doc] = (len(ws), sum(apply_word(w) for w in ws))
    assert out == exp
    # merges actually compressed: fewer bpe tokens than characters
    assert out[1][1] < len("ababababcd")


def test_cms_estimate_broadcasts_sketch(spark):
    """The sketch side of the probe join must be a broadcast (it is at
    most d*w rows by construction)."""
    from ontoweaver_spark.textops import cms_estimate, cms_sketch

    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    probes = spark.createDataFrame([("a",)], "token string")
    plan = (
        cms_estimate(cms_sketch(df, d=2, w=8), probes, d=2, w=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_per_group_sample_one_exchange(spark):
    """Exactly one shuffle: the group-keyed rank window."""
    from ontoweaver_spark.sampling import per_group_sample

    df = spark.createDataFrame([(1, "g")], "doc_id bigint, lang string")
    plan = (
        per_group_sample(df, "lang", k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_walk_skipgram_pairs(spark):
    from ontoweaver_spark.graphstats import walk_skipgram_pairs

    walks = spark.createDataFrame(
        [("w1", 0, "a"), ("w1", 1, "b"), ("w1", 2, "c"), ("w1", 3, "d"),
         ("w2", 0, "a"), ("w2", 1, "b")],
        "walk_id string, step int, node string",
    )
    out = {
        (r["center"], r["context"]): r["n_pairs"]
        for r in walk_skipgram_pairs(walks, window=2).collect()
    }
    # w1 fwd: ab ac bc bd cd ; w2 fwd: ab — then mirrored
    assert out[("a", "b")] == 2 and out[("b", "a")] == 2
    assert out[("a", "c")] == 1 and out[("c", "a")] == 1
    assert ("a", "d") not in out  # distance 3 > window
    assert sum(out.values()) == 12  # 6 fwd pairs, both directions


def test_filter_audit_bitmask(spark):
    from ontoweaver_spark.textops import filter_audit

    rows = [
        (1, "the quick brown fox jumps over it"),      # clean
        (2, "a b"),                                    # too short + short words
        (3, "the " + "spam " * 30),                    # dup tokens
        (4, "zz qq ww rr tt yy uu"),                   # no stopword, short words
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: (r["reasons"], r["keep"]) for r in filter_audit(df).collect()}
    assert out[1] == (0, True)
    assert out[2][0] & 1 and out[2][0] & 4 and not out[2][1]
    assert out[3][0] & 16 and not out[3][1]
    assert out[4][0] & 8 and out[4][0] & 4 and not out[4][1]


def test_bm25_topk(spark):
    """Matches a python BM25 reference; term frequency and rarity both
    move the ranking the right way."""
    import math

    from ontoweaver_spark.textops import bm25_topk

    rows = [
        (1, "spark join spark spark"),
        (2, "spark join window table scan"),
        (3, "table scan merge sort"),
        (4, "join join join join join join join join"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = [(r["doc_id"], r["score"]) for r in bm25_topk(df, ["spark", "window"], k=3).collect()]

    texts = {i: t.split() for i, t in rows}
    n = len(texts)
    avgdl = sum(len(v) for v in texts.values()) / n
    k1, b = 1.2, 0.75

    def score(doc, terms):
        s = 0.0
        for t in terms:
            dfreq = sum(1 for v in texts.values() if t in v)
            if t not in texts[doc]:
                continue
            tf = texts[doc].count(t)
            idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(texts[doc]) / avgdl))
        return math.floor(s * 10000 + 0.5) / 10000

    exp = sorted(
        ((i, score(i, ["spark", "window"])) for i in texts if score(i, ["spark", "window"]) > 0),
        key=lambda x: (-x[1], x[0]),
    )[:3]
    assert out == exp
    # doc 2 (has the rare 'window') must beat doc 4 (no query term at all)
    ids = [i for i, _ in out]
    assert 2 in ids and 4 not in ids


def test_interleaved_order(spark):
    from ontoweaver_spark.sampling import interleaved_order

    rows = [(i, "big" if i < 8 else "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = sorted(
        (r["position"], r["lang"], r["doc_id"])
        for r in interleaved_order(df, "lang", seed=1).collect()
    )
    # positions are contiguous 0..9
    assert [p for p, _, _ in out] == list(range(10))
    # round-robin while both groups have members: first 4 positions
    # alternate big/small (rank 1 of each, then rank 2 of each, ...)
    langs = [l for _, l, _ in out]
    assert langs[:4] == ["big", "small", "big", "small"]
    # after 'small' (2 docs) exhausts, the tail is all 'big'
    assert set(langs[4:]) == {"big"}
    # partition invariance
    again = sorted(
        (r["position"], r["lang"], r["doc_id"])
        for r in interleaved_order(df.repartition(7), "lang", seed=1).collect()
    )
    assert again == out


def test_modularity(spark):
    """Two clean 3-cliques joined by one bridge edge: hand-computed Q for
    the true communities; the all-one-community assignment scores 0."""
    from ontoweaver_spark.graphstats import modularity

    tri = lambda a, b, c: [(a, b), (b, c), (a, c)]
    edges = tri("a1", "a2", "a3") + tri("b1", "b2", "b3") + [("a1", "b1")]
    df = spark.createDataFrame(edges, "src string, dst string")
    comm = spark.createDataFrame(
        [(n, n[0]) for n in ["a1", "a2", "a3", "b1", "b2", "b3"]],
        "node string, community string",
    )
    r = modularity(df, comm).collect()[0]
    # m=7, intra=6, degrees: a1=3,b1=3, others 2 -> d_a=7, d_b=7, dsq=98
    # Q = (4*7*6 - 98) / (4*49) = 70/196
    assert (r["m"], r["intra_edges"], r["degree_sq_sum"]) == (7, 6, 98)
    assert abs(r["modularity"] - round(70 / 196, 4)) < 5e-5

    one = spark.createDataFrame(
        [(n, "x") for n in ["a1", "a2", "a3", "b1", "b2", "b3"]],
        "node string, community string",
    )
    r1 = modularity(df, one).collect()[0]
    # all edges intra, dsq = (2m)^2 -> Q = 0 exactly
    assert r1["modularity"] == 0.0


def test_personalized_pagerank(spark):
    """Seed proximity dominates: on a path seed->a->b, rank decays with
    distance from the seed; a disconnected node gets 0; global start mass
    only lives on seeds."""
    from ontoweaver_spark.graphstats import personalized_pagerank

    edges = spark.createDataFrame(
        [("s", "a"), ("a", "b"), ("x", "y")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("s",)], "node string")
    r = {
        row["node"]: row["rank"]
        for row in personalized_pagerank(edges, seeds, iterations=5).collect()
    }
    assert r["s"] > r["a"] > r["b"]          # decay with distance
    assert r["x"] == 0 and r["y"] == 0      # unreachable from the seed
    # python reference of the same integer recurrence
    scale, damp, tel = 1_000_000, 85, 150_000
    ranks = {n: (scale if n == "s" else 0) for n in ["s", "a", "b", "x", "y"]}
    out = {"s": ["a"], "a": ["b"], "x": ["y"]}
    for _ in range(5):
        inb = {n: 0 for n in ranks}
        for u, vs in out.items():
            for v in vs:
                inb[v] += ranks[u] // len(vs)
        ranks = {
            n: (tel if n == "s" else 0) + damp * inb[n] // 100 for n in ranks
        }
    assert r == ranks


def test_community_graph(spark):
    from ontoweaver_spark.graphstats import community_graph

    edges = spark.createDataFrame(
        [("a1", "a2"), ("a2", "a1"), ("b1", "b2"), ("a1", "b1"), ("a2", "b1")],
        "src string, dst string",
    )
    comm = spark.createDataFrame(
        [("a1", "A"), ("a2", "A"), ("b1", "B"), ("b2", "B")],
        "node string, community string",
    )
    out = {
        (r["src_community"], r["dst_community"]): r["weight"]
        for r in community_graph(edges, comm).collect()
    }
    # duplicate/reversed a1-a2 collapses to ONE intra edge
    assert out == {("A", "A"): 1, ("B", "B"): 1, ("A", "B"): 2}
    no_self = community_graph(edges, comm, keep_self=False).collect()
    assert {(r["src_community"], r["dst_community"]) for r in no_self} == {("A", "B")}
