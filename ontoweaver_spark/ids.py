"""Element-ID construction (type affixing).

Replicates ``IterativeAdapter.make_id``
(/root/reference/src/ontoweaver/iterative.py:95-129): IDs optionally carry a
type affix — ``prefix`` -> ``{type}{sep}{name}``, ``suffix`` ->
``{name}{sep}{type}``, ``none`` -> the raw value. Default separator ``":"``
(/root/reference/src/ontoweaver/__init__.py:309). The type used in the affix
is the element's *final* type when a ``final_type`` override is declared,
else its declared target type (/root/reference/src/ontoweaver/iterative.py:281-292).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

AFFIXES = ("none", "prefix", "suffix")


def affix_id(name: Column, type_: Column, affix: str = "none", sep: str = ":") -> Column:
    """Build the element ID Column from a name value and its type label."""
    if affix not in AFFIXES:
        raise ValueError(f"unknown affix {affix!r}, expected one of {AFFIXES}")
    if affix == "prefix":
        return F.concat(type_, F.lit(sep), name)
    if affix == "suffix":
        return F.concat(name, F.lit(sep), type_)
    return name
