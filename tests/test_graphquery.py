"""graphquery.match_pattern: BGP semantics over a small KG."""

import pytest

from ontoweaver_spark.graphquery import match_pattern

# a tiny KG: docs -> language, docs -> source, one self-loop
EDGES = [
    ("d1", "in_language", "en"),
    ("d2", "in_language", "en"),
    ("d3", "in_language", "fr"),
    ("d1", "from_source", "web"),
    ("d2", "from_source", "wiki"),
    ("d3", "from_source", "web"),
    ("x", "likes", "x"),
    ("x", "likes", "y"),
]


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(EDGES, ["src", "label", "dst"])


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_single_pattern_constant_pred(edges):
    got = match_pattern(edges, [("?d", "in_language", "?l")])
    assert got.columns == ["d", "l"]
    assert _rows(got) == [("d1", "en"), ("d2", "en"), ("d3", "fr")]


def test_constant_object_binds(edges):
    got = match_pattern(edges, [("?d", "in_language", "en")])
    assert got.columns == ["d"]
    assert _rows(got) == [("d1",), ("d2",)]


def test_two_patterns_join_on_shared_var(edges):
    got = match_pattern(
        edges, [("?d", "in_language", "?l"), ("?d", "from_source", "?s")]
    )
    assert sorted(got.columns) == ["d", "l", "s"]
    assert _rows(got.select("d", "l", "s")) == [
        ("d1", "en", "web"),
        ("d2", "en", "wiki"),
        ("d3", "fr", "web"),
    ]


def test_three_patterns_two_hubs(edges):
    # co-source pairs in the same language: d and e share l AND s
    got = match_pattern(
        edges,
        [
            ("?d", "in_language", "?l"),
            ("?e", "in_language", "?l"),
            ("?d", "from_source", "?s"),
            ("?e", "from_source", "?s"),
        ],
    ).where("d < e")
    assert _rows(got.select("d", "e", "l", "s")) == []
    # relax: same language only
    got2 = match_pattern(
        edges, [("?d", "in_language", "?l"), ("?e", "in_language", "?l")]
    ).where("d < e")
    assert _rows(got2.select("d", "e", "l")) == [("d1", "d2", "en")]


def test_repeated_var_within_triple_is_equality(edges):
    got = match_pattern(edges, [("?x", "likes", "?x")])
    assert got.columns == ["x"]
    assert _rows(got) == [("x",)]


def test_cartesian_guard(edges):
    with pytest.raises(ValueError, match="cartesian"):
        match_pattern(
            edges, [("?a", "in_language", "?b"), ("?c", "from_source", "?d")]
        )
    got = match_pattern(
        edges,
        [("?a", "in_language", "en"), ("?c", "from_source", "wiki")],
        allow_cartesian=True,
    )
    assert _rows(got.select("a", "c")) == [("d1", "d2"), ("d2", "d2")]


def test_validation(edges):
    with pytest.raises(ValueError, match="empty"):
        match_pattern(edges, [])
    with pytest.raises(ValueError, match="3-tuple"):
        match_pattern(edges, [("?a", "b")])
    with pytest.raises(ValueError, match="bare"):
        match_pattern(edges, [("?", "in_language", "?l")])


def test_plan_pushes_constant_pred(edges, tmp_path):
    # constant predicate must reach the parquet scan as a pushed filter
    p = str(tmp_path / "edges.parquet")
    edges.write.parquet(p)
    pe = edges.sparkSession.read.parquet(p)
    plan = match_pattern(
        pe, [("?d", "in_language", "?l")]
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "in_language" in plan
