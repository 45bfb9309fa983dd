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
