"""Window functions, top-k, as-of join, sessionization.

All built on ``Window.partitionBy().orderBy()`` with explicit frames —
single shuffle per partitioning key, sort within partitions, no Python
in the hot path. Window orderings always carry a unique tie-break
column (event_id / orderkey / custkey) so results are deterministic and
oracle-comparable.

The as-of join is the union-merge pattern (not a per-row lookup): at
100 TB it costs one shuffle of both streams by key + a per-key sort —
the same plan a native ASOF JOIN (e.g. DuckDB's) executes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from pinot_pulsar_plugin_spark.operators.common import make_registry, t

QUERIES, ORACLE, query = make_registry()


@query(
    "q21_window_rank",
    """
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rn,
           CAST(RANK() OVER (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC) AS INTEGER) AS rk,
           CAST(DENSE_RANK() OVER (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC) AS INTEGER) AS drk
    FROM customer
    """,
)
def q21_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank per market segment."""
    c = t(spark, sf_dir, "customer")
    w_det = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    w_val = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"))
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w_det).alias("rn"),
        F.rank().over(w_val).alias("rk"),
        F.dense_rank().over(w_val).alias("drk"),
    )


@query(
    "q22_window_lag_lead",
    """
    SELECT event_id, user_id, value,
           LAG(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
           value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS delta_prev
    FROM events
    """,
)
def q22_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over per-user event time (unique tie-break on event_id)."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return e.select(
        "event_id",
        "user_id",
        "value",
        prev.alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - prev).alias("delta_prev"),
    )


@query(
    "q23_window_running_sum",
    """
    SELECT o_orderkey, o_custkey,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
             AS running_spend,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS order_seq
    FROM orders
    """,
)
def q23_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate with an explicit ROWS frame (fixed-point cents
    so the cumulative sum is order-exact on both engines)."""
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            )
            / 100.0
        ).alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


@query(
    "q24_window_range_frame",
    """
    SELECT o_orderkey, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_within_1k
    FROM orders
    """,
)
def q24_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: how many of the same customer's orders
    fall within 1000 below this order's price. Range frames are
    tie-order independent, so no tie-break is needed for determinism.

    Scale note: the window PARTITIONS by customer — a partition-less
    range frame would move the whole table to one task (Spark warns
    'No Partition Defined'), the classic global-window scale killer; a
    truly global range count belongs to a range join / band bucketing,
    not a window."""
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(
        -1000, W.currentRow
    )
    return o.select(
        "o_orderkey", "o_totalprice", F.count(F.lit(1)).over(w).alias("n_within_1k")
    )


@query(
    "q25_topk_per_group",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def q25_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the scalable per-group top-k (window
    rank + filter; Spark pushes a per-partition limit before shuffle)."""
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "q26_order_limit",
    """
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q26_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT → Spark runs TakeOrderedAndProject (per-
    partition top-N then merge on the driver — no full sort shuffle).
    Unique tie-break keeps the limit deterministic."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "q27_first_last_ntile",
    """
    SELECT c_custkey, c_mktsegment, c_acctbal,
           FIRST_VALUE(c_acctbal) OVER (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS seg_top_bal,
           LAST_VALUE(c_acctbal) OVER (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS seg_bottom_bal,
           CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS quartile
    FROM customer
    """,
)
def q27_first_last_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value over a full-partition frame + ntile."""
    c = t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.first("c_acctbal").over(w_full).alias("seg_top_bal"),
        F.last("c_acctbal").over(w_full).alias("seg_bottom_bal"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "q28_asof_join",
    """
    SELECT p.event_id, p.user_id, epoch_us(p.ts) AS purchase_us,
           epoch_us(v.ts) AS last_view_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
)
def q28_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest view at-or-before it.

    Spark lacks a native ASOF; the scalable composition is the
    union-merge: tag both streams, sort per user by (ts, kind), and take
    the last non-null view timestamp at each purchase row. One shuffle
    on user_id + per-user sort — identical asymptotics to a native
    as-of (DuckDB ASOF JOIN is the oracle)."""
    e = t(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("event_id"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("kind"), "event_id"
    )
    merged = views.unionByName(purchases)
    # views sort before purchases at equal ts (kind 0 < 1) → `<=` semantics
    w = W.partitionBy("user_id").orderBy("ts", "kind", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    view_ts = F.when(F.col("kind") == 0, F.col("ts"))
    return (
        merged.withColumn("last_view_ts", F.last(view_ts, ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("purchase_us"),
            F.unix_micros("last_view_ts").alias("last_view_us"),
        )
    )


@query(
    "q29_sessionize",
    """
    WITH marked AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800000000 OR
                  LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS is_new
      FROM events),
    sessions AS (
      SELECT user_id, event_id, ts_us,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      FROM marked)
    SELECT user_id, CAST(session_idx AS INTEGER) AS session_idx,
           COUNT(*) AS n_events,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) AS session_end_us,
           MAX(ts_us) - MIN(ts_us) AS duration_us
    FROM sessions
    GROUP BY user_id, session_idx
    """,
)
def q29_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min inactivity gap): lag-gap marking +
    running sum — the standard Spark composition; the streaming twin is
    ``session_window`` (streaming module). All time math in epoch
    micros (bigint) so both engines agree exactly."""
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap_us = 30 * 60 * 1_000_000
    prev = F.lag("ts_us").over(w)
    marked = e.withColumn(
        "is_new",
        F.when(prev.isNull() | ((F.col("ts_us") - prev) > gap_us), 1).otherwise(0),
    )
    sessions = marked.withColumn(
        "session_idx",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("int"),
    )
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )
