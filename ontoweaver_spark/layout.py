"""Write-layout clustering for lakehouse tables: Z-order (Morton) keys.

At 10^12-row scale the dominant read cost is scan pruning: parquet/
Iceberg row-group min/max statistics prune a filter on the SORT column
well and any other column barely. Interleaving the bits of k columns
into one Morton key and range-partitioning + sorting the write by that
key gives every interleaved column locality, so min/max stats prune
multi-dimensional filters (the same layout move Delta/Iceberg expose as
OPTIMIZE ZORDER BY — here as a plain, engine-exact column expression).

Reference analog: none (the reference writes biocypher CSVs); this is
the lakehouse-layout surface of the north rule's Iceberg contract.

Everything is BIGINT shift/mask arithmetic — whole-stage codegen,
deterministic, oracle-reproducible in any engine with >> << & |.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton/Z-order interleave of ``k`` non-negative integer columns
    (each clamped into ``[0, 2^bits)``; negatives clamp to 0, overflow
    clamps to the max — layout keys must never error a 100-TB write) ->
    one BIGINT sort key. ``k * bits`` must stay <= 63.

    Column j's bit i lands at interleaved position ``i*k + j``, so the
    key alternates bits across columns from the least-significant end —
    the classic recursive-quadrant curve. The expression is a flat sum
    of ``k*bits`` shift/mask terms: O(1) per row, no UDF, no shuffle.
    """
    k = len(cols)
    if k == 0:
        raise ValueError("zorder_key: need at least one column")
    if k * bits > 63:
        raise ValueError(
            f"zorder_key: {k} cols x {bits} bits = {k * bits} > 63 key bits"
        )
    out = F.lit(0).cast("long")
    top = (1 << bits) - 1
    for j, c in enumerate(cols):
        cc = F.col(c) if isinstance(c, str) else c
        clamped = F.least(
            F.greatest(cc.cast("long"), F.lit(0)), F.lit(top)
        )
        for i in range(bits):
            out = out + F.shiftleft(
                F.shiftright(clamped, i).bitwiseAND(F.lit(1)), i * k + j
            )
    return out


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    n_files: int | None = None,
    key_name: str = "_zkey",
) -> DataFrame:
    """Range-partition + sort ``df`` by its Z-order key, ready for a
    stats-pruned parquet/Iceberg write: ``repartitionByRange`` bounds
    each output file to one contiguous curve segment (so each file's
    min/max box is tight on EVERY interleaved column) and the
    within-partition sort tightens row-group stats inside the file.
    The key column is kept (drop it post-write if undesired) so audits
    can verify the layout. ``n_files`` defaults to the session shuffle
    partitioning.
    """
    keyed = df.withColumn(key_name, zorder_key(cols, bits=bits))
    parted = (
        keyed.repartitionByRange(n_files, key_name)
        if n_files
        else keyed.repartitionByRange(key_name)
    )
    return parted.sortWithinPartitions(key_name)
