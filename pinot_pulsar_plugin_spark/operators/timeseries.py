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

q76: exact heavy-hitters (frequent items) per group.
q77: gap-fill with forward interpolation (LOCF) over a date spine.
"""

from __future__ import annotations

from pinot_pulsar_plugin_spark.caching import (
    persist_materialized,
    persist_once,
)

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
    WITH parts AS (
      SELECT p_partkey, p_name, p_brand,
             split_part(p_name, ' ', 1) AS tok_first,
             split_part(p_name, ' ', -1) AS tok_last
      FROM part),
    cand AS (
      SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
             a.p_name AS n_a, b.p_name AS n_b
      FROM parts a JOIN parts b
        ON a.p_brand = b.p_brand AND a.tok_first = b.tok_first
       AND a.p_partkey < b.p_partkey
      UNION
      SELECT a.p_partkey, b.p_partkey, a.p_name, b.p_name
      FROM parts a JOIN parts b
        ON a.p_brand = b.p_brand AND a.tok_last = b.tok_last
       AND a.p_partkey < b.p_partkey)
    SELECT part_a, part_b,
           CAST(levenshtein(n_a, n_b) AS INTEGER) AS edit_dist
    FROM cand
    WHERE levenshtein(n_a, n_b) <= 4
    """,
)
def q69_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy near-match pairs via multi-pass blocking: the standard
    scale shape for fuzzy dedup (block → compare → threshold), with the
    block key chosen to BOUND the per-block quadratic.

    Brand alone (~25 values) makes each block n/25 rows and the
    in-block Levenshtein O((n/25)²) — quadratic blow-up at 100× data
    (VERDICT r1). Here candidates are the union of two bounded blocking
    passes, (brand, first name token) and (brand, last name token),
    pair-deduped before the edit-distance compare. Each pass's key
    space multiplies brand by the token vocabulary, so blocks are an
    order of magnitude smaller (sf0.01: max block 20 vs 96 brand-only,
    asserted in test_scale_patterns); a pair is compared iff it shares
    a brand and either boundary token — the documented recall contract
    (pairs differing in BOTH tokens exceed the distance threshold for
    realistic vocabularies). The oracle implements identical blocking."""
    p = t(spark, sf_dir, "part")

    def blocked_pass(tok: F.Column) -> DataFrame:
        x = p.select("p_partkey", "p_name", "p_brand", tok.alias("blk"))
        a, b = x.alias("a"), x.alias("b")
        return a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        ).select(
            F.col("a.p_partkey").alias("part_a"),
            F.col("b.p_partkey").alias("part_b"),
            F.col("a.p_name").alias("n_a"),
            F.col("b.p_name").alias("n_b"),
        )

    cand = (
        blocked_pass(F.substring_index("p_name", " ", 1))
        .unionByName(blocked_pass(F.substring_index("p_name", " ", -1)))
        .dropDuplicates(["part_a", "part_b"])
    )
    return (
        cand.select(
            "part_a",
            "part_b",
            F.levenshtein("n_a", "n_b").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 4)
    )


@query(
    "q76_heavy_hitters",
    """
    WITH counts AS (
      SELECT event_type, user_id, COUNT(*) AS cnt
      FROM events GROUP BY event_type, user_id),
    shared AS (
      SELECT event_type, user_id, cnt,
             CAST(cnt AS DOUBLE) /
               SUM(cnt) OVER (PARTITION BY event_type) AS share
      FROM counts)
    SELECT event_type, user_id, cnt, share
    FROM shared WHERE share > 0.0015
    """,
)
def q76_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items / heavy-hitters per group: users contributing
    more than a share threshold of an event type's traffic — the exact
    form of the frequent-items query realtime OLAP stores serve (Pinot
    exposes it via FREQUENTLONGSSKETCH; here exact, since groupBy+window
    is cheap). Shuffle is #(type,user) pairs after map-side combine,
    then a #types-partition window — never row-sized."""
    e = t(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    counts = e.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("cnt"))
    share = F.col("cnt").cast("double") / F.sum("cnt").over(
        W.partitionBy("event_type")
    )
    return (
        counts.withColumn("share", share)
        .filter(F.col("share") > 0.0015)
        .select("event_type", "user_id", "cnt", "share")
    )


@query(
    "q77_forward_fill",
    """
    WITH daily AS (
      SELECT event_type,
             epoch_us(time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP))) AS day_us,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events
      WHERE CAST(value AS DOUBLE) > 99.0
      GROUP BY 1, 2),
    spine AS (
      SELECT t.event_type, d.day_us
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT DISTINCT epoch_us(time_bucket(INTERVAL '1 day',
                    CAST(ts AS TIMESTAMP))) AS day_us FROM events) d)
    SELECT s.event_type, s.day_us,
           last_value(daily.n IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.day_us
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_filled
    FROM spine s LEFT JOIN daily
      ON daily.event_type = s.event_type AND daily.day_us = s.day_us
    """,
)
def q77_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill with forward interpolation (LOCF): a sparse daily
    series (days where a rare filter matched) is joined onto the full
    date spine and missing days carry the last observation forward —
    the time-series gap-fill primitive dashboards expect
    (TimescaleDB's locf / Pinot gapfill). ``last(ignorenulls)`` over an
    unbounded-preceding frame is the Spark form; the window partitions
    by series key so filling never crosses series, and the only
    shuffles are the spine join key and the per-series window."""
    e = t(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    day = F.unix_micros(F.date_trunc("day", F.col("ts")))
    daily = (
        e.filter(F.col("value").cast("double") > 99.0)
        .groupBy("event_type", day.alias("day_us"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    spine = (
        e.select("event_type").distinct()
        .crossJoin(e.select(day.alias("day_us")).distinct())
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day_us")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(daily, ["event_type", "day_us"], "left")
        .select(
            "event_type",
            "day_us",
            F.last("n", ignorenulls=True).over(w).alias("n_filled"),
        )
    )


_IVL_BUCKET_US = 600_000_000  # 10-min bucket grid
_IVL_LEN_US = 1_800_000_000  # 30-min interval per user


@query(
    "q82_interval_bucket_join",
    f"""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
    ev AS (
      SELECT user_id, event_id, ts_us,
             CAST(FLOOR(ts_us / {_IVL_BUCKET_US}.0) AS BIGINT) AS bucket
      FROM e),
    iv AS (
      SELECT user_id AS i_user, MIN(ts_us) AS start_us,
             MIN(ts_us) + {_IVL_LEN_US} AS end_us
      FROM e GROUP BY user_id),
    ivb AS (
      SELECT i_user, start_us, end_us,
             unnest(generate_series(
               CAST(FLOOR(start_us / {_IVL_BUCKET_US}.0) AS BIGINT),
               CAST(FLOOR(end_us / {_IVL_BUCKET_US}.0) AS BIGINT))) AS bucket
      FROM iv)
    SELECT i.i_user, COUNT(*) AS n_events,
           COUNT(DISTINCT ev.user_id) AS n_users
    FROM ev JOIN ivb i ON i.bucket = ev.bucket
    WHERE ev.ts_us BETWEEN i.start_us AND i.end_us
    GROUP BY i.i_user
    """,
)
def q82_interval_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join done scale-safe: which events (any user)
    fall inside each user's first-30-minutes activity window.

    A naive interval join is a range theta join — quadratic and
    unshuffleable. Here both sides are mapped onto a fixed 10-min
    bucket grid: each event lands in exactly one bucket, each interval
    explodes to the <=4 buckets it covers (fan-out bounded by
    interval_len/bucket + 1, a constant), and the join is an EQUI-join
    on bucket with the exact range predicate as a post-join refine —
    so it hash-partitions/broadcasts like any other join, and each
    event-interval pair is produced exactly once (the event's single
    bucket). The grid constant is the tuning dial: coarser = fewer
    replicas, finer = tighter refine selectivity."""
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    ev = e.withColumn(
        "bucket", F.floor(F.col("ts_us") / float(_IVL_BUCKET_US)).cast("long")
    )
    iv = (
        e.groupBy("user_id")
        .agg(F.min("ts_us").alias("start_us"))
        .select(
            F.col("user_id").alias("i_user"),
            "start_us",
            (F.col("start_us") + _IVL_LEN_US).alias("end_us"),
        )
    )
    ivb = iv.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("start_us") / float(_IVL_BUCKET_US)).cast("long"),
                F.floor(F.col("end_us") / float(_IVL_BUCKET_US)).cast("long"),
            )
        ),
    )
    joined = ev.join(ivb, "bucket").filter(
        (F.col("ts_us") >= F.col("start_us")) & (F.col("ts_us") <= F.col("end_us"))
    )
    return joined.groupBy("i_user").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "q83_running_zscore",
    """
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events),
    r AS (
      SELECT user_id, event_id, v,
             COUNT(*) OVER w AS n,
             CAST(SUM(v) OVER w AS DOUBLE) AS s1,
             CAST(SUM(v * v) OVER w AS DOUBLE) AS s2
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT user_id, event_id,
           ROUND(CASE WHEN n >= 5 AND (s2 - s1 * s1 / n) / n > 0
                 THEN (v - s1 / n) / sqrt((s2 - s1 * s1 / n) / n)
                 ELSE NULL END, 6) AS z,
           CAST(n >= 5 AND (s2 - s1 * s1 / n) / n > 0
                AND (v - s1 / n) / sqrt((s2 - s1 * s1 / n) / n) > 2
                AS INTEGER) AS is_anomaly
    FROM r
    """,
)
def q83_running_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running z-score anomaly flag: each event scored against
    the running mean/std of that user's history so far (>=5-event
    warmup) — the batch twin of an online anomaly detector, and the
    q81 exact-moment technique applied to a window: the running sums
    are integer arithmetic over the fixed-point value (2-decimal
    domain), so the float z derives identically on both engines.
    One hash exchange on user_id; the three running aggregates share a
    single window spec."""
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    r = e.select(
        "user_id",
        "event_id",
        "v",
        F.count(F.lit(1)).over(w).alias("n"),
        # Σv cliffs only past ~1.8e14 events/user (v ≤ 1e5) — long is
        # fine; Σv² reaches int64 at ~3.7e9 events for a bot-grade hot
        # key (r11 audit, the q112-premise class), so it accumulates
        # in exact DECIMAL(38,0) and converts ONCE to double — the
        # same correctly-rounded conversion as the oracle's
        # int128-sum→double, so the z chain stays bit-identical. The
        # PER-ROW product stays long (cliff v > 3e9, i.e. value > 3e7
        # — 3e4× above the events value domain).
        F.sum("v").over(w).cast("double").alias("s1"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)"))
        .over(w)
        .cast("double")
        .alias("s2"),
    )
    n, s1, s2, v = F.col("n"), F.col("s1"), F.col("s2"), F.col("v")
    var_pop = (s2 - s1 * s1 / n) / n
    z = (v - s1 / n) / F.sqrt(var_pop)
    cond = (n >= 5) & (var_pop > 0)
    return r.select(
        "user_id",
        "event_id",
        F.round(F.when(cond, z), 6).alias("z"),
        (cond & (z > 2)).cast("int").alias("is_anomaly"),
    )


_GAPFILL_HOUR_US = 3_600_000_000


@query(
    "q92_gapfill_interpolate",
    f"""
    WITH obs AS (
      SELECT event_type,
             epoch_us(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)))
               AS bucket_us,
             COUNT(*) AS n_obs,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 / COUNT(*) AS v_avg
      FROM events WHERE value > 90.0
      GROUP BY 1, 2),
    mm AS (
      SELECT MIN(epoch_us(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)))) AS lo,
             MAX(epoch_us(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)))) AS hi
      FROM events),
    spine AS (
      SELECT t.event_type, g.bucket_us
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(lo, hi, {_GAPFILL_HOUR_US}))
                    AS bucket_us FROM mm) g),
    joined AS (
      SELECT s.event_type, s.bucket_us, o.n_obs, o.v_avg,
             last_value(o.v_avg IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.bucket_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN o.v_avg IS NOT NULL THEN s.bucket_us END
                        IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.bucket_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pu,
             first_value(o.v_avg IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.bucket_us
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN o.v_avg IS NOT NULL THEN s.bucket_us END
                         IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.bucket_us
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nu
      FROM spine s LEFT JOIN obs o
        ON o.event_type = s.event_type AND o.bucket_us = s.bucket_us)
    SELECT event_type, bucket_us,
           COALESCE(n_obs, 0) AS n_obs,
           (v_avg IS NULL) AS is_gap,
           ROUND(CASE
             WHEN v_avg IS NOT NULL THEN v_avg
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               pv + (nv - pv) * (CAST(bucket_us - pu AS DOUBLE)
                                 / CAST(nu - pu AS DOUBLE))
             ELSE COALESCE(pv, nv) END, 6) AS v_filled
    FROM joined
    """,
)
def q92_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill with LINEAR interpolation (TimescaleDB ``interpolate``
    to q77's ``locf``): a sparse hourly series of per-bucket averages
    is joined onto a GENERATED hour spine (sequence between the corpus
    min/max bucket — truly missing hours appear, unlike a
    distinct-observed spine) and each gap takes the straight line
    between its surrounding observations; leading/trailing gaps take
    the nearest observation.

    Exactness across engines: the bucket average is a fixed-point
    integer sum over 2-decimal values, and the interpolation is the
    identical IEEE expression (pv + (nv-pv)·frac with a bigint-derived
    frac) on both sides, rounded once at the end. Scale shape: the
    observation aggregate combines map-side; the spine is
    #types × #hours (tiny, broadcast-joined); the four fill windows
    share one (event_type, bucket) sort — at 100 TB cost is the
    observation scan plus a spine-sized window."""
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    hour = F.unix_micros(F.date_trunc("hour", F.col("ts")))
    obs = (
        e.filter(F.col("value") > 90.0)
        .groupBy("event_type", hour.alias("bucket_us"))
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
                / 100.0
                / F.count(F.lit(1))
            ).alias("v_avg"),
        )
    )
    mm = e.agg(
        F.min(hour).alias("lo"), F.max(hour).alias("hi")
    )
    hours = mm.select(
        F.explode(F.expr(f"sequence(lo, hi, {_GAPFILL_HOUR_US})")).alias("bucket_us")
    )
    spine = e.select("event_type").distinct().crossJoin(hours)
    back = (
        W.partitionBy("event_type")
        .orderBy("bucket_us")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy("event_type")
        .orderBy("bucket_us")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    obs_bucket = F.when(F.col("v_avg").isNotNull(), F.col("bucket_us"))
    j = (
        spine.join(obs, ["event_type", "bucket_us"], "left")
        .select(
            "event_type",
            "bucket_us",
            "n_obs",
            "v_avg",
            F.last("v_avg", ignorenulls=True).over(back).alias("pv"),
            F.last(obs_bucket, ignorenulls=True).over(back).alias("pu"),
            F.first("v_avg", ignorenulls=True).over(fwd).alias("nv"),
            F.first(obs_bucket, ignorenulls=True).over(fwd).alias("nu"),
        )
    )
    frac = (F.col("bucket_us") - F.col("pu")).cast("double") / (
        F.col("nu") - F.col("pu")
    ).cast("double")
    filled = (
        F.when(F.col("v_avg").isNotNull(), F.col("v_avg"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv") + (F.col("nv") - F.col("pv")) * frac,
        )
        .otherwise(F.coalesce("pv", "nv"))
    )
    return j.select(
        "event_type",
        "bucket_us",
        F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
        F.col("v_avg").isNull().alias("is_gap"),
        F.round(filled, 6).alias("v_filled"),
    )


# --- q147: time-weighted average (TWAP) per type ---------------------
#
# q67 gives OHLC bars (event-weighted extremes); q147 gives the
# TIME-weighted mean — the metric that is correct when observations
# are irregularly spaced (a sensor reading held for 50 minutes must
# weigh 50× one held for a minute; the plain AVG q67 reports is
# sampling-rate-biased). Each observation's weight is its HOLDING
# interval: the µs gap to the same type's next event (the final
# observation of a type has no successor and is excluded — its
# holding interval is open-ended; excluding it is the standard
# right-open TWAP convention).
#
# Exactness: weights are exact integer µs (lead-difference), values
# are 1e-2 fixed-point (the q100 convention), the weighted sum is an
# exact Σ(cents·dt_us) — order-independent — and the final TWAP is a
# pure double chain (no rounding step). Headroom (r11 audit): per-row
# terms cents·dt ≤ 3e16 stay int64, but the SUM is bounded only by
# max_cents·span (~3e21 for high-valued sparse series over a decade),
# so it accumulates in DECIMAL(38,0); DECIMAL→double is the same
# correctly-rounded conversion as the oracle's int128→double.

_Q147 = """
    WITH seq AS (
      SELECT event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             LEAD(epoch_us(ts)) OVER (PARTITION BY event_type
               ORDER BY epoch_us(ts), event_id) - epoch_us(ts) AS dt_us
      FROM events),
    agg AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_obs,
             SUM(CAST(cents AS HUGEINT) * dt_us) AS wsum,
             CAST(SUM(dt_us) AS BIGINT) AS span_us
      FROM seq WHERE dt_us IS NOT NULL
      GROUP BY event_type)
    SELECT event_type, n_obs, span_us,
           CAST(wsum AS DOUBLE) / CAST(span_us AS DOUBLE) / 100.0 AS twap
    FROM agg
"""


@query("q147_twap", _Q147)
def q147_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type time-weighted average value (see block comment):
    holding-interval weights via LEAD, exact integer weighted sums,
    double-chain final division.

    Scale shape: one type-keyed exchange for the LEAD window (ordered
    by the total (ts, event_id) key), then a combinable 4-integer
    aggregate — the q100 cost profile. The window state is one row
    (LEAD 1); nothing grows with history."""
    from pyspark.sql.window import Window

    e = t(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = Window.partitionBy("event_type").orderBy(us, "event_id")
    seq = e.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.lead(us).over(w) - us).alias("dt_us"),
    )
    agg = (
        seq.where(F.col("dt_us").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            # the PER-ROW product is decimal too: a year-long holding
            # gap (~3e13 µs) times high-valued cents passes int64 on a
            # single row — unlike the x·y regressions, dt is not bounded
            F.sum(F.col("cents").cast("decimal(38,0)") * F.col("dt_us")).alias(
                "wsum"
            ),
            F.sum("dt_us").alias("span_us"),
        )
    )
    return agg.select(
        "event_type",
        "n_obs",
        "span_us",
        (F.col("wsum").cast("double") / F.col("span_us").cast("double") / F.lit(100.0)).alias(
            "twap"
        ),
    )


# --- q150: per-group OLS trend slope (exact integer sufficient stats)
#
# The trend detector a metrics pipeline runs over every series it
# tracks ("is this brand's revenue growing?"): ordinary least squares
# over (day index, daily revenue), computed from the five sufficient
# statistics n, Σx, Σy, Σxy, Σx² — the classical distributed
# regression: one combinable aggregate, no iteration, merges across
# partitions/segments like any other partial agg (the same shape
# Pinot's COVAR/VAR family and Spark's regr_slope use internally).
# regr_slope itself is NOT used: both engines implement it with
# double-accumulated Σ terms whose accumulation ORDER is
# shuffle-dependent — irreproducible. Integer sufficient statistics
# are order-independent, so the slope is bit-identical across
# engines and shuffle schedules.
#
# Exactness: x = days since 1995-01-01 (int, ≤ ~2500), y = daily
# revenue in cents (presum: per-line ROUND before the integer sum).
# slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²), the division one double op;
# r² = cov²/(varx·vary) is a pure double chain on the same exact
# integers — deterministic cross-engine even where intermediates
# exceed 2^53 (identical IEEE ops on identical inputs). Overflow (r11
# audit): y is itself a per-day aggregate (~4e13/brand-day at 100 TB),
# so y·y overflows int64 PER ROW — the y-bearing products (y², x·y,
# and the Σx·Σy / Σy·Σy brackets) run in exact DECIMAL(38,0); the
# x-side stats are provably small and stay long. The DuckDB oracle is
# already int128-exact.

_Q150 = """
    WITH daily AS (
      SELECT p.p_brand,
             date_diff('day', DATE '1995-01-01',
                       CAST(l.l_shipdate AS DATE)) AS x,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                 * 100) AS BIGINT)) AS BIGINT) AS y
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2),
    stats AS (
      SELECT p_brand,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             SUM(x * y) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy
      FROM daily GROUP BY p_brand)
    SELECT p_brand, n,
           CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents_per_day,
           (CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
              * CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE))
             / (CAST(n * sxx - sx * sx AS DOUBLE)
                  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r2
    FROM stats WHERE n >= 2
"""


@query("q150_trend_slope", _Q150)
def q150_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS slope of daily revenue (cents/day) plus r², from
    exact integer sufficient statistics (see block comment — the
    order-independent alternative to double-accumulated regr_slope).

    Scale shape: one fact-volume combinable aggregate to day grain
    (the only big exchange; part is a broadcast dim), then a 25-group
    aggregate of five int64 partials — mergeable across segments the
    way a serving rollup is. Nothing iterates; adding a second metric
    is adding one more partial column."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    daily = (
        li.join(F.broadcast(p), p["p_partkey"] == li["l_partkey"])
        .groupBy(
            "p_brand",
            F.datediff(F.col("l_shipdate").cast("date"), F.lit("1995-01-01").cast("date")).alias("x"),
        )
        .agg(F.sum(cents).alias("y"))
    )
    yd = F.col("y").cast("decimal(38,0)")
    stats = daily.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * yd).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(yd * F.col("y")).alias("syy"),
    )
    num = (
        F.col("n") * F.col("sxy")
        - F.col("sx").cast("decimal(38,0)") * F.col("sy")
    ).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vary = F.col("n").cast("double") * F.col("syy").cast("double") - F.col(
        "sy"
    ).cast("double") * F.col("sy").cast("double")
    return stats.where(F.col("n") >= 2).select(
        "p_brand",
        "n",
        (num / den).alias("slope_cents_per_day"),
        ((num * num) / (den * vary)).alias("r2"),
    )


# --- q151: sliding-window distinct count (7-day active users) -------
#
# "Distinct users over the trailing 7 days, per day" — the WAU-style
# engagement series every event pipeline serves. A RANGE window can't
# compute it (COUNT(DISTINCT) isn't a supported window aggregate on
# either engine), and re-scanning 7 days per output day is 7× read
# amplification. The distributed form: reduce to the distinct
# (type, user, day) grain once, then each observation CONTRIBUTES to
# the ≤7 window-end days it falls in (explode of a 7-element day
# sequence — bounded fanout on the already-deduplicated relation,
# the standard contribute-then-count rotation), then one exact
# distinct count per (type, window-end day).
#
# Exactness: day = epoch-µs floor-div 86400e6 (positive, so Spark
# div ≡ DuckDB //); counts are integers. Window-end days with no
# event of their own still emit (the trailing tail after a type's
# last active day, ≤6 rows per type) — the honest "window ending at
# D" semantics; n_today distinguishes them.

_Q151 = """
    WITH obs AS (
      SELECT DISTINCT event_type, user_id,
             epoch_us(ts) // 86400000000 AS day
      FROM events),
    contrib AS (
      SELECT event_type, user_id, day AS obs_day,
             UNNEST(generate_series(day, day + 6)) AS wday
      FROM obs)
    SELECT event_type, CAST(wday AS BIGINT) AS wday,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_7d,
           CAST(COUNT(DISTINCT CASE WHEN obs_day = wday THEN user_id END)
                AS BIGINT) AS n_today
    FROM contrib GROUP BY event_type, wday
"""


@query("q151_sliding_distinct", _Q151)
def q151_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-7-day distinct users per (event_type, day) via
    the contribute-then-count rotation (see block comment), plus the
    same-day distinct count for reference.

    Scale shape: one combinable distinct to (type, user, day) grain —
    the only event-volume exchange — then a ×7 bounded explode on the
    REDUCED relation and one distinct-count keyed by (type, day).
    Nothing rescans raw events per output day; skew rides AQE. The
    window length is a constant in the sequence, so widening to 30
    days is a fanout knob, not a plan change."""
    e = t(spark, sf_dir, "events")
    obs = e.select(
        "event_type",
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).distinct()
    contrib = obs.select(
        "event_type",
        "user_id",
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("wday"),
    )
    # r13: the two distinct-counts split by grain — the dual
    # countDistinct planned as an Expand (×2 over the ×7 contribute
    # relation, 14×|obs| aggregate input); n_today needs no distinct
    # at all (obs is already (type, user, day)-distinct, so the
    # same-day distinct-user count is a plain COUNT), and the 7-day
    # count runs as a single-distinct aggregate (8×|obs| total).
    n7 = contrib.groupBy("event_type", "wday").agg(
        F.countDistinct("user_id").alias("n_users_7d")
    )
    ntoday = obs.groupBy("event_type", F.col("day").alias("wday")).agg(
        F.count(F.lit(1)).alias("nt")
    )
    return n7.join(ntoday, ["event_type", "wday"], "left").select(
        "event_type",
        "wday",
        "n_users_7d",
        F.coalesce("nt", F.lit(0).cast("long")).alias("n_today"),
    )


# --- q153: lagged cross-correlation between two daily series --------
#
# "Does event stream A lead stream B?" — the lead/lag diagnostic run
# before trusting one metric as an early-warning signal for another
# (and the feature-screening step of demand forecasting). For each
# lag L in [-3, +3], the Pearson correlation of (A[d], B[d+L]) over
# all days where both sides exist, computed — like q150 — from exact
# integer sufficient statistics so the result is order-independent
# and engine-portable, unlike double-accumulated corr().
#
# The series: daily event-count-weighted value sums (cents) of the
# two highest-volume event types, pinned by NAME ordering (not by
# volume rank, which could tie): the lexicographically first two
# types. Day join at shifted key d+L; n ≥ 3 overlapping days
# required per lag. r = (nΣxy − ΣxΣy) / sqrt((nΣxx − Σx²)(nΣyy −
# Σy²)): numerator int64-exact, denominator a double sqrt of exact
# int64s — one IEEE chain, bit-identical.

_Q153_LAGS = 3

_Q153 = f"""
    WITH t1 AS (SELECT MIN(event_type) AS ta FROM events),
    t2 AS (SELECT MIN(event_type) AS tb FROM events, t1
           WHERE event_type > ta),
    daily AS (
      SELECT CASE WHEN e.event_type = ta THEN 1 ELSE 2 END AS tr,
             epoch_us(e.ts) // 86400000000 AS day,
             CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events e CROSS JOIN t1 CROSS JOIN t2
      WHERE e.event_type = ta OR e.event_type = tb
      GROUP BY 1, 2),
    lags AS (SELECT UNNEST(generate_series(-{_Q153_LAGS}, {_Q153_LAGS})) AS lag),
    pairs AS (
      SELECT l.lag, a.cents AS x, b.cents AS y
      FROM daily a
      CROSS JOIN lags l
      JOIN daily b ON b.tr = 2 AND b.day = a.day + l.lag
      WHERE a.tr = 1),
    stats AS (
      SELECT lag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy
      FROM pairs GROUP BY lag)
    SELECT CAST(lag AS BIGINT) AS lag, n,
           CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                    * CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)) AS r
    FROM stats
    WHERE n >= 3 AND n * sxx > CAST(sx AS HUGEINT) * sx
      AND n * syy > CAST(sy AS HUGEINT) * sy
"""


@query("q153_lag_correlation", _Q153)
def q153_lag_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between the two lexicographically-first
    event types' daily value series at every lag in ±{lags} days,
    from exact integer sufficient statistics (see block comment).
    The two series are pinned by min / min-above-min scalar
    aggregates, not a global ROW_NUMBER — the partition-less-window
    gate applies to tiny relations too.

    Scale shape: one combinable day-grain aggregate over events (the
    only fact-volume exchange), then a 7-lag bounded explode of the
    tiny day-grain series and an equi-join on the shifted day key —
    day-grain data, thousands of rows regardless of event volume.
    Constant-degenerate lags (zero variance) are excluded on both
    engines rather than risking a 0/0."""
    e = t(spark, sf_dir, "events")
    m1 = e.agg(F.min("event_type").alias("ta"))
    m2 = (
        e.crossJoin(F.broadcast(m1))
        .where(F.col("event_type") > F.col("ta"))
        .agg(F.min("event_type").alias("tb"))
    )
    daily = (
        e.crossJoin(F.broadcast(m1))
        .crossJoin(F.broadcast(m2))
        .where((F.col("event_type") == F.col("ta")) | (F.col("event_type") == F.col("tb")))
        .groupBy(
            F.when(F.col("event_type") == F.col("ta"), 1).otherwise(2).alias("tr"),
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
        .transform(persist_once)
    )
    a = daily.where(F.col("tr") == 1).select(
        F.col("day").alias("a_day"), F.col("cents").alias("x")
    )
    b = daily.where(F.col("tr") == 2).select(
        F.col("day").alias("b_day"), F.col("cents").alias("y")
    )
    lags = spark.range(-_Q153_LAGS, _Q153_LAGS + 1).select(
        F.col("id").alias("lag")
    )
    pairs = a.crossJoin(F.broadcast(lags)).join(
        b, F.col("b_day") == F.col("a_day") + F.col("lag")
    )
    # x and y are per-day aggregates (~5e11 cents/day at 100 TB), so
    # every product — per-row AND bracket — runs in DECIMAL(38,0)
    # (r11 audit; the long forms overflow per row at scale)
    xd, yd2 = F.col("x").cast("decimal(38,0)"), F.col("y").cast("decimal(38,0)")
    stats = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(xd * F.col("y")).alias("sxy"),
        F.sum(xd * F.col("x")).alias("sxx"),
        F.sum(yd2 * F.col("y")).alias("syy"),
    )
    sxd = F.col("sx").cast("decimal(38,0)")
    syd = F.col("sy").cast("decimal(38,0)")
    num = (F.col("n") * F.col("sxy") - sxd * F.col("sy")).cast("double")
    varx = (F.col("n") * F.col("sxx") - sxd * F.col("sx"))
    vary = (F.col("n") * F.col("syy") - syd * F.col("sy"))
    return (
        stats.where((F.col("n") >= 3) & (varx > 0) & (vary > 0))
        .select(
            "lag",
            "n",
            (num / F.sqrt(varx.cast("double") * vary.cast("double"))).alias("r"),
        )
    )


# --- q155: CUSUM mean-shift detection (changepoint alarms) ----------
#
# q140 (KS test) compares two WHOLE distributions; q83 flags pointwise
# z-score outliers. The monitoring gap between them is the SEQUENTIAL
# drift detector: CUSUM (Page 1954), which accumulates small
# persistent deviations until they cross a decision threshold — the
# standard "this metric's mean has shifted" alarm a feed-health
# pipeline runs per series. The textbook recurrence
# s_d = max(0, s_{d-1} + (x_d − μ0 − k)) looks inherently sequential,
# but it has an exact closed form over prefix sums:
#   s_d = c_d − min(0, min_{j≤d} c_j),  c_d = Σ_{i≤d}(x_i − μ0 − k)
# — a running sum plus a running min, i.e. ONE window pass (the q142
# running-extremum trick, applied to control charts). The low-side
# chart is the mirrored prefix with a running max.
#
# Exactness: x is daily cents; μ0 is the per-type integer floor-mean
# (positive ⇒ Spark div ≡ DuckDB //), slack k = μ0 div 20 (±5%),
# decision threshold h = μ0 (one in-control day's worth of drift).
# Everything is int64 — no rounding anywhere.

_Q155 = """
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2),
    mu AS (
      SELECT event_type,
             CAST(SUM(cents) // COUNT(*) AS BIGINT) AS mu0
      FROM daily GROUP BY event_type),
    pre AS (
      SELECT d.event_type, d.day,
             SUM(d.cents - m.mu0 - m.mu0 // 20)
               OVER (PARTITION BY d.event_type ORDER BY d.day) AS c_hi,
             SUM(m.mu0 - m.mu0 // 20 - d.cents)
               OVER (PARTITION BY d.event_type ORDER BY d.day) AS c_lo,
             m.mu0
      FROM daily d JOIN mu m ON m.event_type = d.event_type),
    stat AS (
      SELECT event_type, day, mu0,
             c_hi - LEAST(0, MIN(c_hi) OVER
               (PARTITION BY event_type ORDER BY day)) AS s_hi,
             c_lo - LEAST(0, MIN(c_lo) OVER
               (PARTITION BY event_type ORDER BY day)) AS s_lo
      FROM pre)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN s_hi > mu0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarms_hi,
           CAST(SUM(CASE WHEN s_lo > mu0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarms_lo,
           CAST(MIN(CASE WHEN s_hi > mu0 THEN day END) AS BIGINT)
             AS first_alarm_hi_day,
           CAST(MAX(s_hi) AS BIGINT) AS max_s_hi,
           CAST(MAX(s_lo) AS BIGINT) AS max_s_lo
    FROM stat GROUP BY event_type
"""


@query("q155_cusum_changepoint", _Q155)
def q155_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM control chart per event_type daily value series
    (see block comment): the sequential recurrence computed exactly as
    prefix sum minus running minimum — one window pass, all int64.

    Scale shape: one combinable day-grain aggregate over events, then
    two window expressions sharing ONE type-keyed sort (same partition
    and order spec), then a per-type rollup. Day-grain data is tiny at
    any event volume; the fact-volume exchange is only the first
    aggregate. The closed form is what makes this distributable at
    all — the recurrence itself would demand a sequential scan."""
    from pyspark.sql.window import Window

    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.expr("unix_micros(ts) div 86400000000").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    mu = daily.groupBy("event_type").agg(
        F.expr("sum(cents) div count(*)").alias("mu0")
    )
    j = daily.join(F.broadcast(mu), "event_type")
    wcum = Window.partitionBy("event_type").orderBy("day")
    slack = F.expr("mu0 div 20")
    pre = j.select(
        "event_type",
        "day",
        "mu0",
        F.sum(F.col("cents") - F.col("mu0") - slack).over(wcum).alias("c_hi"),
        F.sum(F.col("mu0") - slack - F.col("cents")).over(wcum).alias("c_lo"),
    )
    stat = pre.select(
        "event_type",
        "day",
        "mu0",
        (F.col("c_hi") - F.least(F.lit(0), F.min("c_hi").over(wcum))).alias("s_hi"),
        (F.col("c_lo") - F.least(F.lit(0), F.min("c_lo").over(wcum))).alias("s_lo"),
    )
    return stat.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.when(F.col("s_hi") > F.col("mu0"), 1).otherwise(0)).alias(
            "n_alarms_hi"
        ),
        F.sum(F.when(F.col("s_lo") > F.col("mu0"), 1).otherwise(0)).alias(
            "n_alarms_lo"
        ),
        F.min(F.when(F.col("s_hi") > F.col("mu0"), F.col("day"))).alias(
            "first_alarm_hi_day"
        ),
        F.max("s_hi").alias("max_s_hi"),
        F.max("s_lo").alias("max_s_lo"),
    )


# --- q166: weekday seasonality index --------------------------------
#
# The calendar-profile diagnostic behind q155's alarms and q127's
# forecasts: how much does each weekday deviate from the series
# mean? index_ppm = (weekday mean) / (overall mean) in parts-per-
# million — 1e6 means "an average day". Computed per event_type.
#
# Exactness: day-of-week = (epoch_day + 3) % 7 with Monday=0
# (epoch day 0 was a Thursday, i.e. Monday=0 ⇒ Thursday=3 — the +3
# shift is spelled identically
# on both engines rather than relying on either engine's dow()
# convention); means are nested integer floor-divisions (positive ⇒
# Spark div ≡ DuckDB //). Overflow (r11 audit): the (type, dow) cent
# SUM reaches ~3e14 at 100 TB, so s·1e6 overflows int64, and the
# resulting avg_micro (≤ per-event cents·1e6 ~1e13) overflows again
# when re-multiplied by 1e6 — every product in the chain lifts to
# DECIMAL(38,0); the div results themselves stay ≤ ~1e13 (div on
# decimal narrows to BIGINT — safe only because each quotient is
# provably small, the q209 rule).

_Q166 = """
    WITH daily AS (
      SELECT event_type,
             epoch_us(ts) // 86400000000 AS day,
             CAST((epoch_us(ts) // 86400000000 + 3) % 7 AS BIGINT) AS dow,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events),
    wd AS (
      SELECT event_type, dow,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s
      FROM daily GROUP BY event_type, dow),
    tot AS (
      SELECT event_type,
             CAST(SUM(n) AS BIGINT) AS tn,
             CAST(SUM(s) AS BIGINT) AS ts_
      FROM wd GROUP BY event_type)
    SELECT w.event_type, w.dow, w.n,
           CAST((w.s * 1000000 // w.n) * 1000000
                // (t.ts_ * 1000000 // t.tn) AS BIGINT) AS index_ppm
    FROM wd w JOIN tot t ON t.event_type = w.event_type
"""


@query("q166_weekday_seasonality", _Q166)
def q166_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, weekday) seasonality index in ppm of the
    series mean (see block comment — portable Monday=0 weekday from
    epoch-day arithmetic, nested integer floor-divisions).

    Scale shape: one combinable (type, dow) aggregate — 7 rows per
    type out of any event volume — then a broadcast join against the
    per-type totals. Pure scan-speed arithmetic."""
    e = t(spark, sf_dir, "events")
    daily = e.select(
        "event_type",
        F.expr("CAST((unix_micros(ts) div 86400000000 + 3) % 7 AS BIGINT)").alias(
            "dow"
        ),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    wd = daily.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    tot = wd.groupBy("event_type").agg(
        F.sum("n").alias("tn"), F.sum("s").alias("ts_")
    )
    return wd.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "dow",
        "n",
        F.expr(
            "CAST((CAST(s AS DECIMAL(38,0)) * 1000000 div n) AS DECIMAL(38,0))"
            " * 1000000"
            " div (CAST(ts_ AS DECIMAL(38,0)) * 1000000 div tn)"
        ).alias("index_ppm"),
    )


# --- q176: semi-additive closing balance (last-in-period) -----------
#
# The measure class every finance/inventory mart has that plain SUM
# mis-aggregates: BALANCES add across accounts but NOT across time —
# the month value is the LAST observation, not the sum. Here the
# running inventory balance per brand (shipped quantity signed by
# return flag: returns come back in) is snapshotted at each month's
# close: running sum in event order, then last-per-(brand, month) via
# an argmax over the (day, orderkey, linenumber) total order — the
# standard two-window semi-additive pattern.
#
# Exactness: quantities are exact integers (l_quantity is integral in
# this corpus — ROUND pins it), the running sum is int64, and the
# argmax struct comparison is integer-lexicographic.

_Q176 = """
    WITH mv AS (
      SELECT p.p_brand,
             epoch_us(l.l_shipdate) // 86400000000 AS day,
             l.l_orderkey, l.l_linenumber,
             CAST(CASE WHEN l.l_returnflag = 'R' THEN -1 ELSE 1 END
                  * CAST(ROUND(l.l_quantity) AS BIGINT) AS BIGINT) AS qty
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    run AS (
      SELECT p_brand, day, l_orderkey, l_linenumber,
             day // 30 AS month_bucket,
             CAST(SUM(qty) OVER (PARTITION BY p_brand
               ORDER BY day, l_orderkey, l_linenumber) AS BIGINT) AS balance
      FROM mv),
    closing AS (
      SELECT p_brand, month_bucket, balance,
             ROW_NUMBER() OVER (PARTITION BY p_brand, month_bucket
               ORDER BY day DESC, l_orderkey DESC, l_linenumber DESC) AS rk
      FROM run)
    SELECT p_brand, CAST(month_bucket AS BIGINT) AS month_bucket,
           balance AS closing_balance
    FROM closing WHERE rk = 1
"""


@query("q176_closing_balance", _Q176)
def q176_closing_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-additive closing balance per (brand, 30-day bucket): the
    LAST running-balance observation of each period (see block
    comment), not a period sum.

    Scale shape: one brand-keyed sort feeds the running sum; the
    per-period close is a WindowGroupLimit top-1 on the SAME
    partitioning extended by the bucket. Periods with no movement
    emit nothing — the serving join forward-fills from the previous
    close (q77's carry pattern) rather than materializing empty
    periods here."""
    from pyspark.sql.window import Window

    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    qty = (
        F.when(F.col("l_returnflag") == "R", -1).otherwise(1)
        * F.round("l_quantity").cast("long")
    ).cast("long")
    mv = li.join(F.broadcast(p), p["p_partkey"] == li["l_partkey"]).select(
        "p_brand",
        F.expr("unix_micros(l_shipdate) div 86400000000").alias("day"),
        "l_orderkey",
        "l_linenumber",
        qty.alias("qty"),
    )
    wrun = Window.partitionBy("p_brand").orderBy(
        "day", "l_orderkey", "l_linenumber"
    )
    run = mv.select(
        "p_brand",
        "day",
        "l_orderkey",
        "l_linenumber",
        F.expr("day div 30").alias("month_bucket"),
        F.sum("qty").over(wrun).alias("balance"),
    )
    wclose = Window.partitionBy("p_brand", "month_bucket").orderBy(
        F.desc("day"), F.desc("l_orderkey"), F.desc("l_linenumber")
    )
    return (
        run.withColumn("rk", F.row_number().over(wclose))
        .where(F.col("rk") == 1)
        .select("p_brand", "month_bucket", F.col("balance").alias("closing_balance"))
    )


# --- q180: peak concurrency of open orders (interval sweep) ----------
#
# The interval-stabbing rollup behind "peak concurrent sessions /
# open tickets / active rentals" dashboards: an order is OPEN over
# [o_orderdate, last l_shipdate) (half-open, µs grain); per 30-day
# bucket, report the maximum number of simultaneously open orders and
# the earliest instant it is attained.
#
# Sweep semantics: each interval emits (+1 at start, -1 at end);
# concurrency is the running sum over the global (ts, delta, okey)
# order. delta ASC puts ends before starts at equal ts, which is
# exactly half-open intervals; within a tie group of equal (ts, delta)
# the running sum is monotone, so the per-bucket MAX and its earliest
# ts are invariant to okey order — the okey key only pins a total
# order for the window.
#
# A global running sum would trip the partition-less-window plan gate,
# so the Spark plan is a SEGMENTED PREFIX SUM — the scalable form of
# a global cumulative: within-bucket running sums (bucket-partitioned
# window) plus per-bucket carry-in offsets computed on the tiny
# bucket-totals relation via a triangular join (the q179 election
# pattern; #buckets rows, broadcast). This is the pattern a 100 TB
# global cumulative has to use anyway — no single-task sort ever
# materializes.

_Q180 = """
    WITH iv AS (
      SELECT o.o_orderkey AS okey,
             epoch_us(o.o_orderdate) AS s_us,
             MAX(epoch_us(l.l_shipdate)) AS e_us
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
      HAVING MAX(epoch_us(l.l_shipdate)) > epoch_us(o.o_orderdate)),
    ev AS (
      SELECT okey, s_us AS ts_us, 1 AS delta FROM iv
      UNION ALL
      SELECT okey, e_us AS ts_us, -1 AS delta FROM iv),
    run AS (
      SELECT ts_us // 86400000000 // 30 AS month_bucket, ts_us,
             CAST(SUM(delta) OVER (ORDER BY ts_us, delta, okey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS conc
      FROM ev),
    mm AS (
      SELECT month_bucket, MAX(conc) AS max_open
      FROM run GROUP BY 1)
    SELECT m.month_bucket, CAST(m.max_open AS BIGINT) AS max_open,
           CAST(MIN(r.ts_us) AS BIGINT) AS at_ts_us
    FROM mm m JOIN run r
      ON r.month_bucket = m.month_bucket AND r.conc = m.max_open
    GROUP BY 1, 2
"""


@query("q180_max_concurrency", _Q180)
def q180_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent open orders per 30-day bucket (see block
    comment for the sweep semantics and the segmented-prefix-sum
    rationale).

    Scale shape: the interval build pre-aggregates lineitem to its
    per-orderkey MAX ship date BEFORE the orders join (r14, guide §2.2
    — aggregate below the join: o_orderkey is unique in orders, so
    max-per-l_orderkey-then-join is exactly max-per-(okey, s_us)-
    after-join, and the join input drops from |lineitem| to |orders|
    rows); the sweep relation is 2 rows per order with 3 narrow int64
    columns. The running sum partitions by bucket — every task sorts
    only its bucket — and the cross-bucket carry-in is a #buckets-row
    triangular join, broadcast back. The argmin-ts resolution re-reads
    the persisted narrow (bucket, ts, conc) projection against the
    broadcast per-bucket maxima; nothing event-sized is ever globally
    sorted."""
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.expr("unix_micros(o_orderdate)").alias("s_us"),
    )
    li_max = (
        t(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey", F.expr("unix_micros(l_shipdate)").alias("ship_us")
        )
        .groupBy("l_orderkey")
        .agg(F.max("ship_us").alias("e_us"))
    )
    iv = (
        li_max.join(o, li_max["l_orderkey"] == o["okey"])
        .filter(F.col("e_us") > F.col("s_us"))
        .select("okey", "s_us", "e_us")
    )
    from pinot_pulsar_plugin_spark.functions.rollup import (
        max_concurrency_sweep,
    )

    return max_concurrency_sweep(iv)


# --- q181: ratio-to-moving-average seasonal indices -------------------
#
# Classical multiplicative seasonal decomposition, the BI form: the
# weekday seasonal index is the mean RATIO of each day's total to its
# centered 7-day moving trend, so a level shift in the series does not
# contaminate the seasonality estimate (q166's plain weekday means
# would). Only full 7-day windows contribute (edge days have no
# centered trend).
#
# Exactness: daily totals are exact cents; the ratio is
# cents·7e6 // trend_sum (the trend MEAN never materializes as a
# double — multiplying by 7 keeps the whole chain in int64, exact
# while daily cents < ~1.3e12, i.e. $13B/day/type); the per-weekday
# mean is a floored integer division of exact sums. Weekday uses
# (epoch_day + 3) % 7 pure integer arithmetic — Monday = 0, and epoch
# day 0 is a THURSDAY (the q166 anchor rule) — no engine date
# functions in the hot path.

_Q181 = """
    WITH daily AS (
      SELECT event_type,
             epoch_us(ts) // 86400000000 AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2),
    trend AS (
      SELECT event_type, day, cents,
             CAST(SUM(cents) OVER w AS BIGINT) AS trend_sum,
             COUNT(*) OVER w AS n_win
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    ratios AS (
      SELECT event_type, (day + 3) % 7 AS weekday,
             cents * 7000000 // trend_sum AS ratio_ppm
      FROM trend WHERE n_win = 7 AND trend_sum > 0)
    SELECT event_type, CAST(weekday AS BIGINT) AS weekday,
           CAST(SUM(ratio_ppm) // COUNT(*) AS BIGINT) AS seasonal_ppm,
           CAST(COUNT(*) AS BIGINT) AS n_obs
    FROM ratios GROUP BY 1, 2
"""


@query("q181_seasonal_decomposition", _Q181)
def q181_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonal indices per event type via ratio-to-centered-
    moving-average (see block comment).

    Scale shape: the fact collapses to (type, day) grain in one
    map-side-combinable aggregate before any window — the centered-MA
    window runs over #types × #days rows, partitioned by type (never
    partition-less), and the final index aggregate is 7 rows per type.
    Nothing event-grain ever reaches a sort."""
    from pyspark.sql.window import Window

    e = t(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    trend = daily.select(
        "event_type",
        "day",
        "cents",
        F.sum("cents").over(w).alias("trend_sum"),
        F.count(F.lit(1)).over(w).alias("n_win"),
    )
    ratios = trend.filter(
        (F.col("n_win") == 7) & (F.col("trend_sum") > 0)
    ).select(
        "event_type",
        ((F.col("day") + 3) % 7).alias("weekday"),
        # DECIMAL numerator (r11 audit): a (type, day) cent sum
        # reaches ~5e11 at 100 TB; ·7e6 would pass int64. The ratio
        # itself is ≤ 7e6 (cents is inside its own window sum).
        F.expr(
            "CAST(cents AS DECIMAL(38,0)) * 7000000 div trend_sum"
        ).alias("ratio_ppm"),
    )
    return ratios.groupBy("event_type", "weekday").agg(
        F.expr("sum(ratio_ppm) div count(1)").alias("seasonal_ppm"),
        F.count(F.lit(1)).alias("n_obs"),
    )


# --- q198: seasonality-adjusted daily anomalies ---------------------------
#
# q181's indices put to work: a day is anomalous when its ratio to the
# centered 7-day trend deviates from ITS WEEKDAY'S seasonal norm —
# flagging "low for a Monday" even when Mondays are always low. The
# whole chain stays integer: ratio_ppm = cents·7e6 // trend_sum
# (q181's ratio), seasonal_ppm = the weekday's floored mean ratio, and
# the deviation score anomaly_ppm = ratio·1e6 // seasonal; days with
# |anomaly − 1e6| > 100000 (±10% of the weekday norm — tight enough
# to be non-vacuous on the smooth synthetic corpus) surface. The
# ratio relation feeds both the index aggregate and the final join —
# persisted so the daily collapse runs once.

_Q198_DEV = 100_000

_Q198 = f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2),
    trend AS (
      SELECT event_type, day, cents,
             CAST(SUM(cents) OVER w AS BIGINT) AS trend_sum,
             COUNT(*) OVER w AS n_win
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    ratios AS (
      SELECT event_type, day, (day + 3) % 7 AS weekday, cents,
             cents * 7000000 // trend_sum AS ratio_ppm
      FROM trend WHERE n_win = 7 AND trend_sum > 0),
    idx AS (
      SELECT event_type, weekday,
             CAST(SUM(ratio_ppm) // COUNT(*) AS BIGINT) AS seasonal_ppm
      FROM ratios GROUP BY 1, 2)
    SELECT r.event_type, CAST(r.day AS BIGINT) AS day, r.cents,
           CAST(r.ratio_ppm AS BIGINT) AS ratio_ppm, i.seasonal_ppm,
           CAST(r.ratio_ppm * 1000000 // i.seasonal_ppm AS BIGINT)
             AS anomaly_ppm
    FROM ratios r JOIN idx i
      ON i.event_type = r.event_type AND i.weekday = r.weekday
    WHERE i.seasonal_ppm > 0
      AND abs(r.ratio_ppm * 1000000 // i.seasonal_ppm - 1000000)
            > {_Q198_DEV}
"""


@query("q198_seasonal_anomalies", _Q198)
def q198_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days deviating more than ±10% from their weekday's seasonal
    ratio norm (see block comment; q181's exact integer chain).

    Scale shape: the event volume collapses once to (type, day); the
    trend window partitions by type; the index is 7 rows per type and
    joins back BROADCAST onto the day-grain ratio relation (persisted
    — it feeds both the index and the final join). Nothing event-grain
    past the first aggregate."""
    from pyspark.sql.window import Window

    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    trend = daily.select(
        "event_type",
        "day",
        "cents",
        F.sum("cents").over(w).alias("trend_sum"),
        F.count(F.lit(1)).over(w).alias("n_win"),
    )
    ratios = trend.filter(
        (F.col("n_win") == 7) & (F.col("trend_sum") > 0)
    ).select(
        "event_type",
        "day",
        ((F.col("day") + 3) % 7).alias("weekday"),
        "cents",
        # DECIMAL numerator — the q181 r11 rule
        F.expr(
            "CAST(cents AS DECIMAL(38,0)) * 7000000 div trend_sum"
        ).alias("ratio_ppm"),
    ).transform(persist_once)
    idx = ratios.groupBy("event_type", "weekday").agg(
        F.expr("sum(ratio_ppm) div count(1)").alias("seasonal_ppm")
    )
    joined = ratios.join(F.broadcast(idx), ["event_type", "weekday"]).filter(
        F.col("seasonal_ppm") > 0
    )
    anomaly = F.expr("ratio_ppm * 1000000 div seasonal_ppm")
    return joined.filter(
        F.abs(anomaly - 1000000) > _Q198_DEV
    ).select(
        "event_type",
        "day",
        "cents",
        "ratio_ppm",
        "seasonal_ppm",
        anomaly.alias("anomaly_ppm"),
    )


# --- q201: overlapping same-customer order intervals ----------------------
#
# The interval-OVERLAP join primitive (distinct from q28's as-of,
# q82's point-in-bucket, and q180's sweep): pairs of the same
# customer's orders whose open intervals [orderdate, last-ship)
# genuinely overlap — the "parallel orders" audit that feeds both
# fraud review and fulfillment capacity planning. Standard overlap
# predicate s_a < e_b AND s_b < e_a on half-open µs intervals; the
# join is BLOCKED on the customer key, so the quadratic term is
# bounded by one customer's order count, and the overlap math is
# exact integer µs (overlap_us = min(e)−max(s)).

_Q201 = """
    WITH iv AS (
      SELECT o.o_custkey AS c, o.o_orderkey AS okey,
             epoch_us(o.o_orderdate) AS s_us,
             MAX(epoch_us(l.l_shipdate)) AS e_us
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2, 3
      HAVING MAX(epoch_us(l.l_shipdate)) > epoch_us(o.o_orderdate))
    SELECT a.c AS custkey, a.okey AS order_a, b.okey AS order_b,
           CAST(LEAST(a.e_us, b.e_us) - GREATEST(a.s_us, b.s_us) AS BIGINT)
             AS overlap_us
    FROM iv a JOIN iv b
      ON b.c = a.c AND a.okey < b.okey
     AND a.s_us < b.e_us AND b.s_us < a.e_us
"""


@query("q201_overlapping_orders", _Q201)
def q201_overlapping_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-customer order pairs with overlapping open intervals and
    their exact overlap duration (see block comment).

    Scale shape: the interval build pre-aggregates lineitem to its
    per-orderkey MAX ship date BEFORE the orders join (r14, guide
    §2.2 — o_orderkey is unique in orders so the aggregate commutes
    with the join exactly, and the join input drops from |lineitem|
    to |orders| rows), and the interval relation is persisted so the
    self-join's two legs share ONE lineage computation instead of
    re-reading and re-aggregating lineitem per leg; the pair join is
    an equi-join on the customer key with the overlap predicate
    inside the join's codegen — per-key fan-out is a customer's
    concurrent-order count, never orders²; AQE skew-split covers a
    pathological bulk buyer."""
    o = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c"),
        F.col("o_orderkey").alias("okey"),
        F.expr("unix_micros(o_orderdate)").alias("s_us"),
    )
    li_max = (
        t(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey", F.expr("unix_micros(l_shipdate)").alias("ship_us")
        )
        .groupBy("l_orderkey")
        .agg(F.max("ship_us").alias("e_us"))
    )
    iv = (
        li_max.join(o, li_max["l_orderkey"] == o["okey"])
        .filter(F.col("e_us") > F.col("s_us"))
        .select("c", "okey", "s_us", "e_us")
        .transform(persist_materialized)
    )
    a, b = iv.alias("a"), iv.alias("b")
    return a.join(
        b,
        (F.col("b.c") == F.col("a.c"))
        & (F.col("a.okey") < F.col("b.okey"))
        & (F.col("a.s_us") < F.col("b.e_us"))
        & (F.col("b.s_us") < F.col("a.e_us")),
    ).select(
        F.col("a.c").alias("custkey"),
        F.col("a.okey").alias("order_a"),
        F.col("b.okey").alias("order_b"),
        (
            F.least(F.col("a.e_us"), F.col("b.e_us"))
            - F.greatest(F.col("a.s_us"), F.col("b.s_us"))
        ).alias("overlap_us"),
    )
