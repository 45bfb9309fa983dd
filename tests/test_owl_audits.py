"""owl:FunctionalProperty / owl:InverseFunctionalProperty audits."""

from itertools import combinations

from ontoweaver_spark.ontology import functional_violations, ifp_sameas_candidates


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, label string")


def test_functional_violations(spark):
    e = _edges(spark, [
        ("e1", "1970-01-01", "birth_date"),
        ("e1", "1970-01-01", "birth_date"),   # duplicate row: NOT a violation
        ("e2", "1980-05-05", "birth_date"),
        ("e2", "1980-05-06", "birth_date"),   # two distinct objects
        ("e3", "x", "knows"),                 # non-functional predicate
        ("e3", "y", "knows"),
    ])
    out = functional_violations(e, ["birth_date"])
    assert [(r.src, r.label, r.n_objects) for r in out.collect()] == [
        ("e2", "birth_date", 2)
    ]


def test_ifp_candidates_pairs_and_order(spark):
    e = _edges(spark, [
        ("a", "isbn:1", "has_isbn"),
        ("c", "isbn:1", "has_isbn"),
        ("b", "isbn:1", "has_isbn"),
        ("d", "isbn:2", "has_isbn"),          # singleton: no pair
        ("a", "doi:9", "has_doi"),
        ("z", "doi:9", "has_doi"),
        ("a", "isbn:1", "cites"),             # non-IFP predicate ignored
        ("q", "isbn:1", "cites"),
    ])
    out = ifp_sameas_candidates(e, ["has_isbn", "has_doi"])
    got = {(r.a, r.b, r.label, r.obj) for r in out.collect()}
    want = {(x, y, "has_isbn", "isbn:1") for x, y in combinations("abc", 2)}
    want.add(("a", "z", "has_doi", "doi:9"))
    assert got == want
    assert all(a < b for a, b, _, _ in got)


def test_ifp_skew_guard_drops_placeholder_groups(spark):
    rows = [(f"s{i}", "unknown", "email") for i in range(50)]
    rows += [("a", "joe@x.com", "email"), ("b", "joe@x.com", "email")]
    out = ifp_sameas_candidates(_edges(spark, rows), ["email"], max_group=10)
    assert [(r.a, r.b) for r in out.collect()] == [("a", "b")]
