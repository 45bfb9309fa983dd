"""Basic-graph-pattern (triple-pattern) matching over the fused KG —
the SPARQL-core read path of a knowledge graph: given patterns like
``("?d", "in_language", "?l"), ("?d", "from_source", "?s")``, return one
row per binding of the variables.

The reference materializes a graph for Neo4j/BioCypher consumption
(`/root/reference/src/ontoweaver/ontoweave.py:441-452`) and leaves the
query side to Cypher; a Spark-native pipeline wants the same "match a
pattern, get a frame" primitive directly over the edge table, because
downstream corpus jobs (pick all English docs from source X) are Spark
jobs, not Cypher sessions.

Scale shape (10^12-edge KG): each triple pattern is ONE filtered
projection of the edge table — constant predicates/endpoints become
pushed-down scan filters (a label-partitioned edge table as written by
``pipeline.write_graph`` turns a constant predicate into partition
pruning, reading only that label's files). Patterns then join pairwise
on their shared variables: plain equi-joins that AQE reorders and
skew-splits; there is nothing imperative anywhere. A pattern with no
shared variable against the accumulated frame is a deliberate cross
product and raises unless ``allow_cartesian=True``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POS_COLS = ("src", "label", "dst")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def match_pattern(
    edges: DataFrame,
    pattern: list[tuple[str, str, str]],
    src_col: str = "src",
    pred_col: str = "label",
    dst_col: str = "dst",
    allow_cartesian: bool = False,
) -> DataFrame:
    """Match a conjunction of (subject, predicate, object) triple
    patterns against an edge table; terms starting with ``?`` are
    variables, anything else is a constant. Returns one column per
    DISTINCT variable (named without the ``?``), one row per binding —
    bag semantics, like SPARQL's default (no implicit DISTINCT).

    A variable repeated inside one triple (``("?x", "likes", "?x")``)
    becomes an equality filter on that single edge scan; a variable
    shared across triples becomes the join key between them.
    """
    if not pattern:
        raise ValueError("match_pattern: empty pattern")
    bound: DataFrame | None = None
    seen_vars: set[str] = set()
    for i, triple in enumerate(pattern):
        if len(triple) != 3:
            raise ValueError(f"match_pattern: triple #{i} is not a 3-tuple: {triple!r}")
        frame = edges.select(
            F.col(src_col).alias("src"),
            F.col(pred_col).alias("label"),
            F.col(dst_col).alias("dst"),
        )
        cols: dict[str, str] = {}  # variable name -> first position holding it
        for pos, term in zip(_POS_COLS, triple):
            if _is_var(term):
                name = term[1:]
                if not name:
                    raise ValueError(f"match_pattern: bare '?' in triple #{i}")
                if name in cols:  # repeated within this triple: equality filter
                    frame = frame.where(F.col(pos) == F.col(cols[name]))
                else:
                    cols[name] = pos
            else:  # constant: pushed-down scan filter
                frame = frame.where(F.col(pos) == F.lit(term))
        frame = frame.select(*[F.col(p).alias(v) for v, p in cols.items()])
        if bound is None:
            bound, seen_vars = frame, set(cols)
            continue
        keys = sorted(seen_vars & set(cols))
        if not keys and not allow_cartesian:
            raise ValueError(
                f"match_pattern: triple #{i} shares no variable with the "
                "previous patterns - pass allow_cartesian=True if the cross "
                "product is intended"
            )
        bound = bound.join(frame, on=keys) if keys else bound.crossJoin(frame)
        seen_vars |= set(cols)
    return bound


def path_query(
    edges: DataFrame,
    steps: list[object],
    min_len: int = 1,
    max_len: int | None = None,
    src_col: str = "src",
    pred_col: str = "label",
    dst_col: str = "dst",
) -> DataFrame:
    """Bounded regular-path query -> ``(src, dst, path_len)`` DISTINCT
    pairs — the SPARQL property-path subset real KG traversals use:

    - ``steps=["r1", "r2"]`` — a fixed label SEQUENCE (``r1/r2``);
      ``min_len``/``max_len`` are ignored (the length is ``len(steps)``).
    - ``steps=[{"a", "b"}]`` (one set) — Kleene range over an
      ALTERNATION (``(a|b){min_len,max_len}``): any path of length
      ``min_len..max_len`` whose every edge label is in the set.

    Unbounded ``*`` is deliberately absent: an unbounded closure over a
    10^12-edge graph is :func:`ontoweaver_spark.ontology.subclass_closure`
    (path doubling + convergence raise) — use it when you mean it; query
    workloads are bounded hops.

    Shape: each hop is one equi-join of label-FILTERED edge projections
    (constant labels push to the scan; on a label-partitioned edge table
    that is partition pruning), with a DISTINCT per accumulation step so
    diamond fan-out cannot blow the frame up combinatorially (pair
    semantics, like SPARQL DISTINCT paths). max_len joins total.
    """
    if not steps:
        raise ValueError("path_query: empty steps")
    is_kleene = len(steps) == 1 and isinstance(steps[0], (set, frozenset))
    base = edges.select(
        F.col(src_col).alias("src"),
        F.col(pred_col).alias("label"),
        F.col(dst_col).alias("dst"),
    )

    def hop(labels) -> DataFrame:
        labs = sorted(labels) if isinstance(labels, (set, frozenset)) else [labels]
        return base.where(F.col("label").isin(labs)).select("src", "dst").distinct()

    if not is_kleene:
        cur = hop(steps[0]).withColumn("path_len", F.lit(1))
        for lab in steps[1:]:
            nxt = hop(lab).select(F.col("src").alias("_m"), F.col("dst").alias("_d"))
            cur = (
                cur.join(nxt, cur["dst"] == nxt["_m"])
                .select("src", F.col("_d").alias("dst"),
                        (F.col("path_len") + 1).alias("path_len"))
                .distinct()
            )
        return cur

    if max_len is None or max_len < min_len or min_len < 1:
        raise ValueError("path_query: Kleene form needs 1 <= min_len <= max_len")
    one = hop(steps[0])
    cur = one.withColumn("path_len", F.lit(1))
    out = cur.where(F.lit(min_len <= 1))
    for _ in range(2, max_len + 1):
        nxt = one.select(F.col("src").alias("_m"), F.col("dst").alias("_d"))
        cur = (
            cur.join(nxt, cur["dst"] == nxt["_m"])
            .select("src", F.col("_d").alias("dst"),
                    (F.col("path_len") + 1).alias("path_len"))
            .distinct()
        )
        out = out.unionByName(cur.where(F.col("path_len") >= min_len))
    return out.distinct()
