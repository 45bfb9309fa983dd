"""Composable property-merge functors (the EP3 fusion surface).

The reference lets users pick per-property mergers
(merge.string.* / merge.dictry.PerProperty,
/root/reference/src/ontoweaver/merge.py; e.g. the custom ``MyMax`` in
/root/reference/tests/test_fusion.py:12-14). Here a merger is a function
``Column(array<string>) -> Column(string)`` applied to the deduplicated,
sorted union of a property's values for one fused element.

Ordering note: the reference reduces pairwise in encounter order; at
distributed scale encounter order is not reproducible, so UseFirst/UseLast
operate on the *sorted* value set (deterministic at any parallelism).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

Merger = Callable[[Column], Column]


def OrderedSet(sep: str = "|") -> Merger:
    """Distinct values joined with sep (merge.py:348-371; sorted here)."""
    return lambda vals: F.array_join(vals, sep)


def Append(sep: str = "|") -> Merger:
    """Alias of OrderedSet post-dedup (merge.dictry.Append, merge.py:166-202)."""
    return OrderedSet(sep)


def UseFirst() -> Merger:
    return lambda vals: F.element_at(vals, 1)


def UseLast() -> Merger:
    return lambda vals: F.element_at(vals, -1)


def EnsureIdentical(fallback_sep: str = "|") -> Merger:
    """All values must agree; conflicting values render joined with a
    conflict marker so violations are visible downstream (the reference
    raises FusionError per element, merge.py:254-265 — a per-row raise is
    not expressible mid-aggregation; use fusion.reconciliate_nodes'
    raise_errors for the label variant)."""
    return lambda vals: F.when(F.size(vals) <= 1, F.element_at(vals, 1)).otherwise(
        F.concat(F.lit("!CONFLICT!"), F.array_join(vals, fallback_sep))
    )


def NumericMax() -> Merger:
    """Max over integer-parsed values (the reference test's ``MyMax``)."""
    return lambda vals: F.array_max(
        F.transform(vals, lambda x: x.cast("long"))
    ).cast("string")


def NumericMin() -> Merger:
    return lambda vals: F.array_min(
        F.transform(vals, lambda x: x.cast("long"))
    ).cast("string")


def render_properties(
    df,
    sep: str = "|",
    prop_mergers: dict[str, Merger] | None = None,
):
    """Render properties map<string,array<string>> -> map<string,string>,
    dispatching named properties to their merger and defaulting to the
    reference collapse rule (scalar if single value, else sep-joined)."""
    prop_mergers = prop_mergers or {}

    def render(k: Column, v: Column) -> Column:
        expr = F.when(F.size(v) == 1, F.element_at(v, 1)).otherwise(F.array_join(v, sep))
        for name, merger in prop_mergers.items():
            expr = F.when(k == F.lit(name), merger(v)).otherwise(expr)
        return expr

    return df.withColumn("properties", F.transform_values("properties", render))
