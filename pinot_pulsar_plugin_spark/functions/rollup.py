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


# --- Streaming KMV distinct sketch maintenance (q141's stream twin) -
#
# The serving pattern behind Pinot's DistinctCountThetaSketch on a
# REALTIME table: every micro-batch lands its per-group bottom-k hash
# sketch (k smallest distinct 60-bit md5 hashes — the q141 encoding)
# under batch_id=N, and the serving read merges partials by taking the
# bottom-k of the union. KMV merge is associative/idempotent, so
# replays (overwrite-by-batch-id) and arbitrary batch boundaries give
# the SAME sketch the batch operator computes on the full table —
# tests assert bit-equality of (n_kept, h_k, estimate) against the
# q141 arithmetic, not an error bound. Merge cost: #batches × #groups
# × k 8-byte hashes — compact by rewriting the merged sketch when
# #batches grows large (same note as read_rollup).


def kmv_hash(col: Column) -> Column:
    """The q141 portable 60-bit hash (first 15 md5 hex chars)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
        .cast("long")
    )


def _bottom_k(df: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    from pyspark.sql.window import Window

    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def kmv_sketch_sink(out_dir: str, group_cols: list[str], value_col: str, k: int = 64):
    """foreachBatch function landing each micro-batch's per-group
    bottom-k hash sketch under ``out_dir/batch_id=N`` (idempotent
    overwrite). The delta only contributes its own distinct hashes —
    per-batch cost is one window over the delta, never state-sized."""
    import os

    def write_batch(df: DataFrame, batch_id: int) -> None:
        hashes = (
            df.select(*group_cols, kmv_hash(F.col(value_col)).alias("h"))
            .distinct()
        )
        _bottom_k(hashes, group_cols, k).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    return write_batch


def read_kmv_sketch(
    spark, out_dir: str, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Serve the maintained sketch: bottom-k of the union of partials
    per group, with the q141 estimator —
    ``(n_kept, est_distinct)`` per group, exact below capacity."""
    parts = spark.read.parquet(out_dir).select(*group_cols, "h").distinct()
    merged = _bottom_k(parts, group_cols, k)
    dom = float(1 << 60)
    agg = merged.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("h_k")
    )
    return agg.select(
        *group_cols,
        "n_kept",
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(dom) / F.col("h_k").cast("double"))
        .alias("est_distinct"),
    )


# --- Streaming sliding-distinct maintenance (q151's stream twin) ----
#
# The WAU-style serving view: trailing-N-day distinct users per group
# per day. COUNT(DISTINCT) partials are NOT summable, but the
# DISTINCT OBSERVATION SET is: each micro-batch lands its distinct
# (group, user, day) triples — idempotent under replay
# (overwrite-by-batch-id) and under cross-batch repeats (the serving
# read re-distincts) — and the serving read runs q151's
# contribute-then-count rotation over the union. The maintained state
# is one row per (group, user, active day), the minimal exact state
# any engine needs for this metric (Pinot's equivalent is a realtime
# segment per day queried with DISTINCTCOUNT over a day range).
# Compaction note: partials accumulate per batch; rewrite the merged
# distinct periodically (the read_rollup note) and age out days older
# than the largest window served.


def sliding_distinct_sink(out_dir: str, group_cols: list[str], user_col: str,
                          day_col: str):
    """foreachBatch function landing each micro-batch's distinct
    (group, user, day) observation triples under ``batch_id=N``."""
    import os

    def write_batch(df: DataFrame, batch_id: int) -> None:
        df.select(*group_cols, user_col, day_col).distinct().write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"batch_id={batch_id}"))

    return write_batch


def read_sliding_distinct(
    spark, out_dir: str, group_cols: list[str], user_col: str, day_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Serve trailing-``window_days`` distinct users per (group, day)
    from the maintained observation set — identical semantics (and
    column names) to the batch q151 rotation."""
    obs = (
        spark.read.parquet(out_dir)
        .select(*group_cols, user_col, day_col)
        .distinct()
    )
    contrib = obs.select(
        *group_cols,
        F.col(user_col),
        F.col(day_col).alias("obs_day"),
        F.explode(
            F.sequence(F.col(day_col), F.col(day_col) + (window_days - 1))
        ).alias("wday"),
    )
    return contrib.groupBy(*group_cols, "wday").agg(
        F.countDistinct(user_col).alias(f"n_users_{window_days}d"),
        F.countDistinct(
            F.when(F.col("obs_day") == F.col("wday"), F.col(user_col))
        ).alias("n_today"),
    )


# --- streaming heavy-hitters maintenance ------------------------------
#
# q76's stream twin. COUNT per (group, key) IS summable, so the
# maintained state is the minimal mergeable partial: each micro-batch
# lands its pre-aggregated (group, key, cnt) rows under batch_id=N
# (idempotent overwrite per batch — the exactly-once ledger shape the
# other sinks in this module use). The SHARE threshold is not
# distributive (it needs the group total), so it is applied at SERVE
# time after the merge — which is exactly how a realtime store serves
# frequent-items over segment-local partials.


def heavy_hitters_sink(out_dir: str, group_cols: list[str], key_col: str):
    """foreachBatch function landing each micro-batch's partial
    (group, key, cnt) counts under ``batch_id=N``."""
    import os

    def write_batch(df: DataFrame, batch_id: int) -> None:
        df.groupBy(*group_cols, key_col).agg(
            F.count(F.lit(1)).alias("cnt")
        ).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    return write_batch


def read_heavy_hitters(
    spark, out_dir: str, group_cols: list[str], key_col: str,
    min_share: float = 0.0015,
) -> DataFrame:
    """Serve exact heavy hitters (share of group traffic > threshold)
    from the maintained count partials — identical semantics and
    arithmetic (double share of exact int64 counts) to the batch q76.

    Scale shape: the merge is one map-side-combinable SUM keyed on
    (group, key); the share window partitions by group. Partials are
    #distinct-keys-per-batch rows, never event-grain."""
    from pyspark.sql.window import Window

    merged = (
        spark.read.parquet(out_dir)
        .groupBy(*group_cols, key_col)
        .agg(F.sum("cnt").alias("cnt"))
    )
    share = F.col("cnt").cast("double") / F.sum("cnt").over(
        Window.partitionBy(*group_cols)
    )
    return (
        merged.withColumn("share", share)
        .filter(F.col("share") > min_share)
        .select(*group_cols, key_col, "cnt", "share")
    )


# --- streaming interval maintenance (q180's stream twin) ---------------
#
# Peak-concurrency needs the full sweep, but the sweep's INPUT — one
# (order, start, end) interval per order — is exactly maintainable:
# per-order start is constant and the close is a MAX over shipment
# lines, so each micro-batch lands (okey, s_us, max-batch-ship)
# partials and the serve-time merge is a keyed MAX — the same
# summable-partial shape as the count/observation sinks above. The
# serve then runs q180's segmented-prefix sweep on the merged
# intervals, so streaming results are row-equal to the batch operator
# over the same lines (asserted by the differential test), even when
# one order's lines are split across micro-batches.


def interval_sweep_sink(out_dir: str):
    """foreachBatch function landing per-batch (okey, s_us, e_us)
    interval partials under ``batch_id=N``; e_us is the batch-local
    MAX ship time, s_us constant per order."""
    import os

    def write_batch(df: DataFrame, batch_id: int) -> None:
        df.groupBy("okey", "s_us").agg(
            F.max("ship_us").alias("e_us")
        ).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    return write_batch


def max_concurrency_sweep(iv: DataFrame) -> DataFrame:
    """Shared half-open interval sweep (delta-ASC tiebreak, segmented
    prefix sum): per-30-day-bucket peak concurrency with the earliest
    attaining instant. ``iv`` must carry (okey, s_us, e_us) with
    e_us > s_us. Batch q180 and the streaming serve path both call
    this, so their semantics cannot drift.

    Scan economics (r9 — the cold A/B VERDICT r8 #4 asked for): the
    r8 persist-and-materialize form cost ~2× cold (driver bench
    0.42→0.99s; a fresh-session A/B reproduced 9.1s vs 7.2s at sf0.1)
    because the two cache-population jobs paid more than they saved,
    while the naive no-persist form fans back out to 12 fact scans
    (the three ev consumers × run's two). This form needs NEITHER:
    everything derives from ONE pass over the exploded endpoints —

    - conc = carry_in(bucket) + within_sum, and carry_in is constant
      within a bucket, so the per-bucket peak and its earliest instant
      are computable from within_sum ALONE: argmax via
      max(struct(within_sum, -ts_us)) in the same groupBy;
    - the bucket total (sum of deltas) folds into that same groupBy,
      so the old triangular self-join + second aggregate disappear;
    - carry_in is then a running sum over the TINY per-bucket relation
      (#30-day-buckets rows — 84 at sf0.1), where a single-partition
      window is free by construction.

    Physical shape: one fact scan → one hash exchange on month_bucket
    (the ordered prefix-sum window; the following groupBy reuses that
    partitioning, no second event-sized shuffle) → a #buckets-row
    single-partition window. No persist, no cache-population job, no
    re-scan — the plan that survives 100× where both r8 variants
    don't."""
    from pyspark.sql.window import Window

    ev = (
        iv.select(
            "okey",
            F.explode(
                F.array(
                    F.struct(F.col("s_us").alias("ts_us"), F.lit(1).alias("delta")),
                    F.struct(F.col("e_us").alias("ts_us"), F.lit(-1).alias("delta")),
                )
            ).alias("e"),
        )
        .select("okey", "e.ts_us", "e.delta")
        .withColumn("month_bucket", F.expr("ts_us div 86400000000 div 30"))
    )
    w = Window.partitionBy("month_bucket").orderBy("ts_us", "delta", "okey")
    peaks = (
        ev.select(
            "month_bucket",
            "ts_us",
            "delta",
            F.sum("delta").over(w).alias("within_sum"),
        )
        .groupBy("month_bucket")
        .agg(
            F.max(
                F.struct(
                    F.col("within_sum"), (-F.col("ts_us")).alias("neg_ts")
                )
            ).alias("pk"),
            F.sum("delta").alias("tot"),
        )
    )
    # Single-partition ordered window over the #buckets-row aggregate
    # (84 rows at sf0.1) — free by construction, but an EMPTY partition
    # spec makes WindowExec log its degradation WARN on every
    # materialization (and Catalyst folds a literal partition key right
    # back to empty). `month_bucket % 1` is always 0 yet non-foldable,
    # so the spec stays non-empty, the rows still land in one
    # partition, and the bench tail stays WARN-free.
    wb = (
        Window.partitionBy(F.expr("month_bucket % 1"))
        .orderBy("month_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return peaks.select(
        "month_bucket",
        (
            F.coalesce(F.sum("tot").over(wb), F.lit(0))
            + F.col("pk.within_sum")
        ).alias("max_open"),
        (-F.col("pk.neg_ts")).alias("at_ts_us"),
    )


def read_max_concurrency(spark, out_dir: str) -> DataFrame:
    """Serve per-30-day-bucket peak concurrency from the maintained
    interval partials — identical sweep semantics and column names to
    batch q180 (both call :func:`max_concurrency_sweep`)."""
    iv = (
        spark.read.parquet(out_dir)
        .groupBy("okey", "s_us")
        .agg(F.max("e_us").alias("e_us"))
        .filter(F.col("e_us") > F.col("s_us"))
    )
    return max_concurrency_sweep(iv)
