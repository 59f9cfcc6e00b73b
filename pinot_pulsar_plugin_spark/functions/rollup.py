"""Materialized-rollup serving: the Spark analog of Pinot's star-tree.

Pinot answers group-by queries from a pre-aggregated star-tree index
instead of scanning segments. The Spark-native equivalent is a CUBE
materialization: one pass over the fact table computes every grouping
set (with ``grouping_id`` tagging which dims are aggregated), lands as
a tiny summary table, and group-by queries over any dim subset are
served by filtering the matching grouping set — a summary-table lookup
instead of a 100 TB scan.

Constraints (same as any pre-agg, star-tree included): measures must be
re-aggregable/associative (count, integer-exact sums, min/max) and the
rollup refreshes with ingestion (the exactly-once foreachBatch sink's
overwrite-by-batch-id pattern fits).

Reference touchpoint: the plugin feeds Pinot realtime segments whose
query-side acceleration is exactly this pre-aggregation idea
(star-tree); no plugin code implements it (SURVEY.md §0) — this is the
engine-scope analog.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GID = "_gid"


def materialize_rollup(
    df: DataFrame, dims: list[str], measures: Mapping[str, Column]
) -> DataFrame:
    """One scan → every grouping set of ``dims`` with re-aggregable
    ``measures``; ``_gid`` tags each row's grouping set (bit i set ⇔
    dims[i] aggregated away, Spark ``grouping_id`` order)."""
    return df.cube(*dims).agg(
        F.grouping_id().alias(GID), *[c.alias(n) for n, c in measures.items()]
    )


def serve_group_by(
    rollup: DataFrame, dims: list[str], subset: list[str], measures: list[str]
) -> DataFrame:
    """Answer ``GROUP BY subset`` from the materialized rollup: select
    the one grouping set whose non-aggregated dims are exactly
    ``subset``. No fact-table scan, no aggregation at query time."""
    unknown = set(subset) - set(dims)
    if unknown:
        raise ValueError(f"subset columns not in rollup dims: {sorted(unknown)}")
    gid = sum(1 << (len(dims) - 1 - i) for i, d in enumerate(dims) if d not in subset)
    return rollup.filter(F.col(GID) == gid).select(*subset, *measures)
