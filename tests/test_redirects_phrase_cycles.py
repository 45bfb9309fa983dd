"""Redirect resolution (pointer doubling), anchor-text profiles, phrase
search, and directed-cycle detection — the round-4 crawl/KG hygiene ops.

Reference parity anchors: the reference canonicalizes entity identity
before fusion (src/ontoweaver/fusion.py congregate-by-id) — redirect
resolution is the web-URL version of that collapse; cycle detection guards
the subclass hierarchies its type automap walks.
"""

import pytest
from pyspark.sql import functions as F

from ontoweaver_spark.graphstats import cycle_nodes
from ontoweaver_spark.textops import phrase_search
from ontoweaver_spark.urls import link_context_profile, resolve_redirects


def _redirects(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_resolve_chain_and_tree(spark):
    # chain u4->u3->u2->u1->u0 plus aliases a2->u2, a9->u9 (u9 terminal)
    edges = [("u4", "u3"), ("u3", "u2"), ("u2", "u1"), ("u1", "u0"),
             ("a2", "u2"), ("a9", "u9")]
    got = {
        r["src"]: (r["final_url"], r["hops"])
        for r in resolve_redirects(_redirects(spark, edges)).collect()
    }
    assert got == {
        "u4": ("u0", 4), "u3": ("u0", 3), "u2": ("u0", 2), "u1": ("u0", 1),
        "a2": ("u0", 3), "a9": ("u9", 1),
    }


def test_resolve_long_chain_log_rounds(spark):
    # a 40-hop chain resolves inside max_rounds=7 (2^6=64 >= 40) — the
    # doubling contract; a linear propagation would need 40 rounds
    edges = [(f"u{i}", f"u{i-1}") for i in range(1, 41)]
    out = resolve_redirects(_redirects(spark, edges), max_rounds=7)
    rows = {r["src"]: r["hops"] for r in out.collect()}
    assert rows["u40"] == 40 and rows["u1"] == 1
    assert out.where(F.col("final_url") != "u0").count() == 0


def test_resolve_cycle_raises(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    with pytest.raises(RuntimeError, match="cycle"):
        resolve_redirects(_redirects(spark, edges), max_rounds=5)


def test_link_context_profile_counts_and_tiebreak(spark):
    pages = spark.createDataFrame(
        [
            ("https://s1.com/a", "x keywords: alpha. links: https://t/1 ok"),
            ("https://s2.com/b", "y keywords: beta. links: https://t/1 ok"),
            ("https://s1.com/c", "z keywords: beta. links: https://t/1 https://t/2 ok"),
        ],
        "url string, text string",
    )
    got = {
        r["target"]: (r["n_inlinks"], r["n_src_hosts"], r["top_context"])
        for r in link_context_profile(pages).collect()
    }
    # t/1: 3 inlinks from 2 hosts; beta(2) beats alpha(1)
    assert got["https://t/1"] == (3, 2, "beta")
    assert got["https://t/2"] == (1, 1, "beta")
    # tie at 1-1 breaks toward the lexicographically smaller context
    tie = spark.createDataFrame(
        [
            ("https://s1.com/a", "keywords: zz. links: https://t/9 ok"),
            ("https://s2.com/b", "keywords: aa. links: https://t/9 ok"),
        ],
        "url string, text string",
    )
    row = link_context_profile(tie).collect()[0]
    assert (row["top_context"], row["n_inlinks"]) == ("aa", 2)


def test_phrase_search_overlap_and_repeats(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a b"),          # "a a" matches at 0 and 1 (overlap)
            (2, "x a b a a"),        # one match at 3
            (3, "a b a b"),          # no "a a"
            (4, "A a"),              # lowercased match at 0
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(docs, "a a").collect()
    }
    assert got == {1: (2, 0), 2: (1, 3), 4: (1, 0)}
    # three-word phrase crosses two anchor joins
    got3 = phrase_search(docs, "a a a").collect()
    assert [(r["doc_id"], r["n_matches"]) for r in got3] == [(1, 1)]


def test_cycle_nodes_ring_vs_tail(spark):
    # 4-ring r0..r3, tail t->r0, separate 2-cycle {p,q}, pure chain c1->c2
    edges = [("r0", "r1"), ("r1", "r2"), ("r2", "r3"), ("r3", "r0"),
             ("t", "r0"), ("p", "q"), ("q", "p"), ("c1", "c2")]
    got = {
        r["node"]: r["min_cycle_len"]
        for r in cycle_nodes(
            spark.createDataFrame(edges, "src string, dst string")
        ).collect()
    }
    assert got == {"r0": 4, "r1": 4, "r2": 4, "r3": 4, "p": 2, "q": 2}


def test_cycle_nodes_dag_empty(spark):
    edges = [("a", "b"), ("b", "c"), ("a", "c")]
    assert cycle_nodes(
        spark.createDataFrame(edges, "src string, dst string")
    ).count() == 0


def test_hierarchy_levels_longest_path_and_roots(spark):
    from ontoweaver_spark.ontology import hierarchy_levels

    # chain a->b->c->d with shortcut a->c: level(a) must be 3 (longest),
    # not 2 (min-depth via the shortcut)
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")]
    got = {r["node"]: r["level"] for r in hierarchy_levels(
        spark.createDataFrame(edges, "child string, parent string")
    ).collect()}
    assert got == {"d": 0, "c": 1, "b": 2, "a": 3}


def test_hierarchy_levels_cycle_raises(spark):
    import pytest as _pytest

    from ontoweaver_spark.ontology import hierarchy_levels

    edges = [("a", "b"), ("b", "a")]
    with _pytest.raises(ValueError, match="cycle"):
        hierarchy_levels(
            spark.createDataFrame(edges, "child string, parent string")
        )
