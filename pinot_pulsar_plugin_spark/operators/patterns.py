"""Composite OLAP patterns: MERGE-style upsert emulation, date-spine
densification, approximate quantiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pinot_pulsar_plugin_spark.operators.common import make_registry, t

QUERIES, ORACLE, query = make_registry()


@query(
    "q55_merge_upsert",
    """
    WITH updates AS (
      SELECT o_custkey AS c_custkey,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS spend
      FROM orders GROUP BY o_custkey)
    SELECT c.c_custkey, c.c_name,
           CASE WHEN u.c_custkey IS NOT NULL THEN 'updated' ELSE 'kept' END
             AS merge_action,
           COALESCE(u.spend, c.c_acctbal) AS new_balance
    FROM customer c LEFT JOIN updates u ON c.c_custkey = u.c_custkey
    """,
)
def q55_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation (no Delta in this environment): left join
    target←source, matched rows take the update, unmatched keep their
    value — the anti-join+union CDC pattern collapsed into one
    null-aware projection. At scale this is one shuffle join on the
    merge key; with Delta/Iceberg the same logical shape becomes a
    MERGE statement."""
    c = t(spark, sf_dir, "customer")
    updates = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("u_custkey"))
        .agg(
            (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0).alias(
                "spend"
            )
        )
    )
    joined = c.join(updates, c.c_custkey == updates.u_custkey, "left")
    return joined.select(
        "c_custkey",
        "c_name",
        F.when(F.col("u_custkey").isNotNull(), "updated").otherwise("kept").alias(
            "merge_action"
        ),
        F.coalesce(F.col("spend"), F.col("c_acctbal")).alias("new_balance"),
    )


@query(
    "q56_date_spine",
    """
    WITH spine AS (
      SELECT unnest(generate_series(DATE '1995-01-01', DATE '1995-12-01',
                                    INTERVAL 1 MONTH))::DATE AS month_start),
    per_month AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             COUNT(*) AS n_orders
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY 1)
    SELECT s.month_start, COALESCE(p.n_orders, 0) AS n_orders
    FROM spine s LEFT JOIN per_month p ON s.month_start = p.month_start
    """,
)
def q56_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine densification: generate a complete month series
    (sequence+explode) and left-join sparse aggregates onto it so gaps
    become explicit zeros — the time-series reporting staple."""
    spine = spark.range(1).select(
        F.explode(
            F.expr(
                "sequence(DATE '1995-01-01', DATE '1995-12-01', INTERVAL 1 MONTH)"
            )
        ).alias("month_start")
    )
    per_month = (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("pm"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return spine.join(per_month, spine.month_start == per_month.pm, "left").select(
        "month_start", F.coalesce("n_orders", F.lit(0)).alias("n_orders")
    )


@query(
    "q58_latest_per_key",
    """
    SELECT user_id, event_id AS latest_event_id, epoch_us(ts) AS ts_us, value
    FROM (
      SELECT e.*, ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events e)
    WHERE rn = 1
    """,
)
def q58_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest record per key — the batch/oracle twin of the compacted
    read (decode.compacted_view / the reference's readCompacted,
    PulsarPartitionLevelConsumer.java:68). One shuffle on the key; at
    scale Spark plans WindowGroupLimit so maps forward one row per key."""
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.unix_micros("ts").alias("ts_us"),
            "value",
        )
    )


@query("q57_approx_quantiles")  # sketch-based → rows-only check
def q57_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL-style sketch): mergeable quantile summary
    — with q13's HLL, the second Pinot-style sketch aggregate. Tests
    assert closeness to the exact percentiles (q43); no SQL oracle
    (sketch internals are engine-specific)."""
    li = t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 1000)").alias(
            "approx_p"
        ),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
    )
    # Project the sketch output to scalar columns: array columns are
    # unhashable for pandas-based canonicalizers (driver r2 err), and a
    # BI consumer wants named quantiles anyway.
    return agg.select(
        "l_returnflag",
        F.element_at("approx_p", 1).alias("p50"),
        F.element_at("approx_p", 2).alias("p90"),
        F.element_at("approx_p", 3).alias("p99"),
        "approx_parts",
    )


@query("q116_hll_sketch_merge")  # binary-sketch merge → rows-only check
def q116_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Datasketches ``hll_sketch_agg`` →
    ``hll_union_agg``): per-nation customer sketches built
    independently, then UNIONED into a global estimate — the
    Pinot-style segment workflow (each segment keeps a sketch; the
    broker merges registers, never re-reads rows). q13 scores the
    one-shot ``approx_count_distinct``; this entry scores the binary
    sketch column surviving an aggregate → union round-trip, which is
    what makes pre-aggregated rollups composable at 100 TB: the union
    cost is #groups × sketch-size, independent of row count.

    No SQL oracle (sketch bytes are engine-specific);
    ``tests/test_approx_quality.py`` pins the estimate inside HLL error
    bounds against the exact distinct count."""
    c = t(spark, sf_dir, "customer")
    per_nation = c.groupBy("c_nationkey").agg(
        F.expr("hll_sketch_agg(c_custkey, 12)").alias("sk"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    merged = per_nation.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est_global"),
        F.sum("n_rows").alias("total_rows"),
        F.count(F.lit(1)).alias("n_sketches"),
    )
    return merged.select(
        F.round(F.col("est_global")).cast("long").alias("est_distinct"),
        "total_rows",
        F.col("n_sketches").cast("long").alias("n_sketches"),
    )
