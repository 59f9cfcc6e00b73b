"""Z-order (Morton) clustering for multi-dimensional data skipping.

Parquet scans prune row groups with column min/max statistics; sorting
the write by ONE column gives perfect skipping on that column and none
on any other. Interleaving the bits of two keys and range-sorting the
write by the interleaved value keeps row-group bounding boxes tight in
BOTH dimensions, so a 2-D box predicate (``user BETWEEN … AND value
BETWEEN …``) skips most row groups — the layout trick behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``, here as a plain column
expression any writer can use:

    df.repartitionByRange(n, zorder2("a", "b"))
      .sortWithinPartitions(zorder2("a", "b"))
      .write.parquet(...)

The encoding is the branch-free Morton spread (5 mask-shift rounds per
dimension, pure JVM bitwise ops inside whole-stage codegen — no UDF).
Inputs are clamped to 31 bits (so the 62-bit code stays positive
in signed-64 space — a sign flip would invert the sort order); at 100 TB the write-side cost is one
range exchange, exactly what a single-column sorted write costs.
Verified by ``tests/test_scale_patterns.py``, which counts pyarrow
row-group stats overlapping a 2-D box under z-order vs single-column
order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SPREAD = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_bits(col: Column) -> Column:
    """Spread the low 31 bits of a non-negative long so consecutive
    input bits land two positions apart (Morton spread)."""
    x = col.cast("long").bitwiseAND(F.lit(0x7FFFFFFF))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder2(a, b) -> Column:
    """62-bit Morton code interleaving two 31-bit non-negative keys
    (column name or Column). Bit i of ``a`` → bit 2i, bit i of ``b`` →
    bit 2i+1: close z-values ⇒ close in both dimensions."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return _spread_bits(ca).bitwiseOR(F.shiftleft(_spread_bits(cb), 1))
