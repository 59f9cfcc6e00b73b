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


# --- Incremental maintenance (realtime star-tree analog) ------------
#
# Pinot keeps its star-tree fresh as realtime segments land; the Spark
# analog: every micro-batch cubes ONLY its own rows (a partial
# rollup — tiny, #cube-cells not #rows) and lands it exactly-once
# under batch_id=N; the serving read merges partials with the
# measure's re-aggregation function (count/sum→sum, min→min,
# max→max — grouping_id is part of the merge key, so a real NULL dim
# value never collides with an aggregated-away NULL). A replayed
# batch overwrites its own partition, so the maintained rollup is
# exactly-once end to end. Merge cost is #batches × #cells — compact
# by rewriting the merged result whenever #batches grows large.

_MERGE = {"sum": F.sum, "min": F.min, "max": F.max}


def incremental_rollup_sink(
    out_dir: str, dims: list[str], measures: Mapping[str, Column]
):
    """foreachBatch function maintaining a materialized rollup: each
    micro-batch writes its partial cube to ``out_dir/batch_id=N``
    (idempotent overwrite — replays replace, never double-count)."""
    import os

    def write_batch(df: DataFrame, batch_id: int) -> None:
        materialize_rollup(df, dims, measures).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    return write_batch


def read_rollup(
    spark, out_dir: str, dims: list[str], merges: Mapping[str, str]
) -> DataFrame:
    """Serve the maintained rollup: merge all batch partials into the
    same shape ``materialize_rollup`` produces on the full table.
    ``merges`` maps measure name → 'sum' | 'min' | 'max'."""
    parts = spark.read.parquet(out_dir)
    return parts.groupBy(*dims, GID).agg(
        *[_MERGE[how](name).alias(name) for name, how in merges.items()]
    )


# --- Incremental JOIN-view maintenance (streaming side of q139) -----
#
# The batch operator q139 proves the two-sided join-delta algebra; in
# a live pipeline the dominant refresh pattern is one-sided — fact
# deltas stream in, the dim is a slowly-changing table — so each
# micro-batch contributes ΔL⋈O: join the delta against the (broadcast)
# dim, partially aggregate, land exactly-once under batch_id=N. The
# serving read merges partials by key; replays overwrite their own
# partition. Dim updates are handled by re-reading the dim per batch
# (the closure takes a PROVIDER, not a frozen DataFrame).


def join_view_sink(
    out_dir: str,
    dim_provider,
    on,
    group_cols: list[str],
    measures: Mapping[str, Column],
):
    """foreachBatch function maintaining a materialized join view.

    ``dim_provider()`` returns the current dim DataFrame (re-evaluated
    every batch so dim updates flow in); ``on`` is the join condition
    or column name(s). Each micro-batch writes its per-key partial
    aggregate of ``delta ⋈ dim`` to ``out_dir/batch_id=N``."""
    import os

    def write_batch(df: DataFrame, batch_id: int) -> None:
        dim = dim_provider()
        joined = df.join(F.broadcast(dim), on)
        partial = joined.groupBy(*group_cols).agg(
            *[c.alias(n) for n, c in measures.items()]
        )
        partial.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    return write_batch


def read_join_view(
    spark, out_dir: str, group_cols: list[str], merges: Mapping[str, str]
) -> DataFrame:
    """Serve the maintained join view: merge all batch partials —
    identical shape to aggregating the full join directly."""
    parts = spark.read.parquet(out_dir)
    return parts.groupBy(*group_cols).agg(
        *[_MERGE[how](name).alias(name) for name, how in merges.items()]
    )
