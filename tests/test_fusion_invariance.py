"""Distributed-correctness properties of fusion: the result must be
invariant to how the input is partitioned, chunked, or salted — the
property that makes the chunked/resumable pipeline and the salted skew path
safe at any cluster size."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ontoweaver_spark.fusion import reconciliate_edges, reconciliate_nodes

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

node_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "d"]),            # id (collisions likely)
        st.sampled_from(["T"]),                            # one label (no conflict)
        st.dictionaries(
            st.sampled_from(["p", "q"]),
            st.lists(st.sampled_from(["1", "2", "3"]), min_size=1, max_size=2),
            max_size=2,
        ),
    ),
    min_size=1,
    max_size=25,
)


def _canon_nodes(df):
    rows = df.collect()
    return sorted(
        (r["id"], r["label"], tuple(sorted((k, tuple(v)) for k, v in (r["properties"] or {}).items())))
        for r in rows
    )


@given(node_rows, st.integers(min_value=1, max_value=6), st.sampled_from([0, 2, 8]))
@settings(**SETTINGS)
def test_node_fusion_partition_and_salt_invariant(spark, rows, nparts, salt):
    df = spark.createDataFrame(
        rows, "id string, label string, properties map<string,array<string>>"
    )
    base = _canon_nodes(reconciliate_nodes(df.coalesce(1), raise_errors=False))
    re_parted = _canon_nodes(
        reconciliate_nodes(df.repartition(nparts, "id"), raise_errors=False, salt=salt)
    )
    assert base == re_parted


edge_rows = st.lists(
    st.tuples(
        st.sampled_from(["e1", "e2", "e3"]),               # id
        st.sampled_from(["x", "y"]),                        # src
        st.sampled_from(["x", "z"]),                        # dst
        st.sampled_from(["r", "s"]),                        # label
        st.dictionaries(
            st.sampled_from(["p"]),
            st.lists(st.sampled_from(["1", "2"]), min_size=1, max_size=2),
            max_size=1,
        ),
    ),
    min_size=1,
    max_size=25,
)


def _canon_edges(df):
    rows = df.collect()
    return sorted(
        (r["id"], r["src"], r["dst"], r["label"],
         tuple(sorted((k, tuple(v)) for k, v in (r["properties"] or {}).items())))
        for r in rows
    )


@given(edge_rows, st.integers(min_value=1, max_value=6), st.sampled_from([0, 4]))
@settings(**SETTINGS)
def test_edge_fusion_partition_and_salt_invariant(spark, rows, nparts, salt):
    df = spark.createDataFrame(
        rows,
        "id string, src string, dst string, label string, properties map<string,array<string>>",
    )
    base = _canon_edges(reconciliate_edges(df.coalesce(1)))
    re_parted = _canon_edges(reconciliate_edges(df.repartition(nparts), salt=salt))
    assert base == re_parted


@given(node_rows)
@settings(**SETTINGS)
def test_chunked_union_equals_whole(spark, rows):
    """fusion(union of chunk extractions) == fusion(whole) — the resume
    correctness property of pipeline.run_pipeline's chunking."""
    df = spark.createDataFrame(
        rows, "id string, label string, properties map<string,array<string>>"
    )
    whole = _canon_nodes(reconciliate_nodes(df, raise_errors=False))
    c0 = df.where(F.pmod(F.xxhash64("id"), F.lit(2)) == 0)
    c1 = df.where(F.pmod(F.xxhash64("id"), F.lit(2)) == 1)
    chunked = _canon_nodes(
        reconciliate_nodes(c0.unionByName(c1), raise_errors=False)
    )
    assert whole == chunked


@given(node_rows, edge_rows)
@settings(**SETTINGS)
def test_incremental_merge_equals_full_refusion(spark, nrows, erows):
    """merge_into_graph(fused(batch0), batch1) == fusion(batch0 ∪ batch1)
    — incremental continuous-crawl updates are exact, not approximate."""
    from ontoweaver_spark.fusion import merge_into_graph, reconciliate

    nodes = spark.createDataFrame(
        nrows, "id string, label string, properties map<string,array<string>>"
    )
    edges = spark.createDataFrame(
        erows,
        "id string, src string, dst string, label string, properties map<string,array<string>>",
    )
    n0 = nodes.where(F.pmod(F.xxhash64("id"), F.lit(2)) == 0)
    n1 = nodes.where(F.pmod(F.xxhash64("id"), F.lit(2)) == 1)
    e0 = edges.where(F.pmod(F.xxhash64("id"), F.lit(2)) == 0)
    e1 = edges.where(F.pmod(F.xxhash64("id"), F.lit(2)) == 1)

    full_n, full_e = reconciliate(nodes, edges, raise_errors=False)
    old_n, old_e = reconciliate(n0, e0, raise_errors=False)
    inc_n, inc_e = merge_into_graph(old_n, old_e, n1, e1, raise_errors=False)

    assert _canon_nodes(full_n) == _canon_nodes(inc_n)
    assert _canon_edges(full_e) == _canon_edges(inc_e)


def test_incremental_merge_label_conflict_raises(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    import pytest
    from ontoweaver_spark.fusion import merge_into_graph

    old_n = spark.createDataFrame(
        [("x", "person", {})], "id string, label string, properties map<string,array<string>>"
    )
    old_e = spark.createDataFrame(
        [], "id string, src string, dst string, label string, properties map<string,array<string>>"
    )
    new_n = spark.createDataFrame(
        [("x", "place", {})], "id string, label string, properties map<string,array<string>>"
    )
    merged_n, _ = merge_into_graph(old_n, old_e, new_n, old_e.limit(0))
    with pytest.raises(SparkRuntimeException, match="conflicting labels for node id 'x'"):
        merged_n.collect()


def test_reconciliate_label_conflict_inline_no_probe_job(spark):
    """Conflict detection is folded into the label projection: constructing
    the fused frame runs ZERO jobs (the old shape ran a driver-side probe
    job eagerly), and the conflict surfaces at execution with the id."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    import pytest
    from ontoweaver_spark.fusion import reconciliate_nodes

    nodes = spark.createDataFrame(
        [("x", "person", {}), ("x", "place", {}), ("y", "person", {})],
        "id string, label string, properties map<string,array<string>>",
    )
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup())
    fused = reconciliate_nodes(nodes, raise_errors=True)  # must stay lazy
    assert set(tracker.getJobIdsForGroup()) == before  # no probe job ran
    with pytest.raises(SparkRuntimeException, match="conflicting labels for node id 'x'"):
        fused.collect()
    # clean rows still fuse fine under raise_errors
    ok = reconciliate_nodes(nodes.where("id = 'y'"), raise_errors=True).collect()
    assert [(r["id"], r["label"]) for r in ok] == [("y", "person")]
