"""Hypothesis properties for the late-round-4 operators: triangle counts
vs brute force, boilerplate identity/round-trip, PII-scrub idempotence,
TF-IDF vs a pure-python derivation."""

import math
from collections import Counter
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ontoweaver_spark.graphstats import triangle_count
from ontoweaver_spark.textops import scrub_pii, strip_boilerplate_lines, tfidf_top_terms

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

edges_st = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).map(
        lambda e: (f"n{e[0]}", f"n{e[1]}")
    ),
    min_size=1,
    max_size=40,
)


@given(edges_st)
@settings(**SETTINGS)
def test_triangle_count_matches_brute_force(spark, edges):
    got = {
        r["node"]: r["triangles"]
        for r in triangle_count(spark.createDataFrame(edges, ["src", "dst"])).collect()
    }
    simple = {frozenset(e) for e in edges if e[0] != e[1]}
    adj = {}
    for e in simple:
        a, b = sorted(e)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect = Counter()
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            expect[a] += 1
            expect[b] += 1
            expect[c] += 1
    assert got == dict(expect)


lines_st = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=1, max_size=5),
    min_size=1,
    max_size=8,
)


@given(lines_st)
@settings(**SETTINGS)
def test_boilerplate_identity_and_python_parity(spark, docs):
    rows = [(i, "\n".join(ls)) for i, ls in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # threshold >= n_docs: nothing can be hot -> exact identity
    ident = {r["doc_id"]: r for r in
             strip_boilerplate_lines(df, max_line_docs=len(docs)).collect()}
    for i, ls in enumerate(docs):
        assert ident[i]["clean_text"] == "\n".join(ls)
        assert ident[i]["n_removed"] == 0
    # threshold 1: python-derived expectation (line df = distinct docs)
    line_df = Counter()
    for ls in docs:
        for line in set(ls):
            line_df[line] += 1
    got = {r["doc_id"]: r for r in
           strip_boilerplate_lines(df, max_line_docs=1).collect()}
    for i, ls in enumerate(docs):
        kept = [l for l in ls if line_df[l] <= 1]
        assert got[i]["clean_text"] == "\n".join(kept)
        assert got[i]["n_kept"] == len(kept)
        assert got[i]["n_removed"] == len(ls) - len(kept)


pii_st = st.lists(
    st.sampled_from([
        "plain words only",
        "mail a.b@c.org now",
        "host 1.2.3.4 up",
        "call 555-123-4567",
        "x@y.io at 10.0.0.1 call (555) 111 2222",
    ]),
    min_size=1,
    max_size=6,
)


@given(pii_st)
@settings(**SETTINGS)
def test_scrub_pii_idempotent(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    once = scrub_pii(spark.createDataFrame(rows, ["id", "text"]))
    again = scrub_pii(
        once.select("id", once["clean_text"].alias("text")), out_col="clean2"
    ).collect()
    # a scrubbed text has nothing left to match and never changes again
    for r in again:
        assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (0, 0, 0)
        assert r["clean2"] == r["text"]


corpus_st = st.lists(
    st.lists(st.sampled_from(["apple", "banana", "cherry", "durian"]),
             min_size=1, max_size=6),
    min_size=1,
    max_size=6,
)


@given(corpus_st)
@settings(**SETTINGS)
def test_tfidf_matches_python(spark, docs):
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r["doc"], r["token"]): r for r in
           tfidf_top_terms(df, k=99, min_len=3, max_df_frac=1.0).collect()}
    n = len(docs)
    dfreq = Counter()
    for ws in docs:
        for w in set(ws):
            dfreq[w] += 1
    for i, ws in enumerate(docs):
        for w, tf in Counter(ws).items():
            r = got[(i, w)]
            assert r["tf"] == tf and r["df_t"] == dfreq[w]
            assert r["score"] == tf * ((1_000_000 * n) // dfreq[w])
    assert len(got) == sum(len(set(ws)) for ws in docs)
