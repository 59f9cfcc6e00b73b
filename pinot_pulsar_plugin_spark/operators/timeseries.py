"""Time-series bars and fuzzy string matching.

q67: OHLC bars via ordered-argument aggregates (``min_by``/``max_by`` ≡
DuckDB ``arg_min``/``arg_max``) — the time-series rollup a realtime
OLAP store serves to dashboards. Event timestamps are globally unique
in this dataset (verified at every scale factor, µs-truncated), which
makes the arg-ordering deterministic; with tie-prone data the key
would be (ts, event_id).

q69: Levenshtein fuzzy-match pairs blocked by a cheap equality key —
the fuzzy flavor of dedup: never all-pairs, the block key bounds the
quadratic term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pinot_pulsar_plugin_spark.functions.exact import exact_sum, exact_sum_sql
from pinot_pulsar_plugin_spark.operators.common import make_registry, t

QUERIES, ORACLE, query = make_registry()


@query(
    "q67_ohlc_bars",
    f"""
    SELECT epoch_us(time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)))
             AS day_us,
           event_type,
           arg_min(value, CAST(ts AS TIMESTAMP)) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, CAST(ts AS TIMESTAMP)) AS close,
           COUNT(*) AS n_events,
           {exact_sum_sql("value", "volume", 2)}
    FROM events
    GROUP BY 1, 2
    """,
)
def q67_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC(V) bars per event type: one hash aggregate carrying
    first/last-by-time, min/max, count, and an exact-cents volume —
    shuffle is #bars-sized, never #events."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day"), "event_type")
        .agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            exact_sum(F.col("value"), "volume", 2),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("day_us"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
            "volume",
        )
    )


@query(
    "q69_levenshtein_pairs",
    """
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    """,
)
def q69_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy near-match pairs within a blocking key (brand): the edit-
    distance quadratic runs only inside blocks, the standard shape for
    fuzzy dedup at scale (block → compare → threshold)."""
    p = t(spark, sf_dir, "part")
    a = p.alias("a")
    b = p.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(
            F.col("a.p_partkey").alias("part_a"),
            F.col("b.p_partkey").alias("part_b"),
            dist.alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 4)
    )
