"""Composite OLAP patterns: MERGE-style upsert emulation, date-spine
densification, approximate quantiles.
"""

from __future__ import annotations

from pinot_pulsar_plugin_spark.caching import persist_once

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


# --- q141: KMV theta sketch (oracle-checkable distinct sketch) ------
#
# q13 (HLL) and q116 (HLL merge) can only be rows-only checked: their
# sketch bytes are engine-specific. KMV (k minimum values — the
# bottom-k theta sketch of Pinot's DistinctCountThetaSketch family) is
# the sketch whose ENTIRE state is deterministic given the hash
# function, so with a portable hash both engines compute bit-identical
# sketches AND estimates — an oracle-backed member of the sketch
# family. Hash: first 60 bits of md5 (identical hex on both engines;
# Spark conv(hex,16,10) / DuckDB CAST('0x…'), both landing in int64).
#
# Per-group sketch = the k smallest distinct hashes; estimator
# (Bar-Yossef et al. / Beyer et al.): if the group holds fewer than k
# distinct values the sketch IS the exact set, else
# est = (k-1) * 2^60 / h_(k) with h_(k) the k-th smallest hash.
# Mergeability — the property that makes sketches worth their error at
# 100 TB — is demonstrated in-query: the '__all__' row re-sketches the
# UNION of the per-type sketches (distinct hashes, k smallest), never
# touching base rows again. Estimate math is a fixed chain of IEEE
# double ops on identical integers: bit-equal, no rounding step.

_KMV_K = 64
_KMV_DOM = 1 << 60

_Q141 = f"""
    WITH dv AS (
      SELECT DISTINCT event_type, user_id FROM events),
    h AS (
      SELECT event_type,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS h
      FROM dv),
    ranked AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS r
      FROM h),
    kept AS (SELECT event_type, h FROM ranked WHERE r <= {_KMV_K}),
    per_type AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_kept,
             CAST(MAX(h) AS BIGINT) AS h_k
      FROM kept GROUP BY event_type),
    est_t AS (
      SELECT event_type, n_kept,
             CASE WHEN n_kept < {_KMV_K} THEN CAST(n_kept AS DOUBLE)
                  ELSE CAST({_KMV_K - 1} AS DOUBLE) * {_KMV_DOM}
                       / CAST(h_k AS DOUBLE) END AS est_distinct
      FROM per_type),
    mh AS (SELECT DISTINCT h FROM kept),
    mkept AS (SELECT h FROM mh ORDER BY h LIMIT {_KMV_K}),
    est_u AS (
      SELECT '__all__' AS event_type,
             CAST(COUNT(*) AS BIGINT) AS n_kept,
             CASE WHEN COUNT(*) < {_KMV_K} THEN CAST(COUNT(*) AS DOUBLE)
                  ELSE CAST({_KMV_K - 1} AS DOUBLE) * {_KMV_DOM}
                       / CAST(MAX(h) AS DOUBLE) END AS est_distinct
      FROM mkept)
    SELECT event_type, n_kept, est_distinct FROM est_t
    UNION ALL
    SELECT event_type, n_kept, est_distinct FROM est_u
"""


@query("q141_kmv_theta_sketch", _Q141)
def q141_kmv_theta_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV bottom-k theta sketch of distinct users per event_type plus
    the MERGED union sketch (see block comment) — the oracle-backed
    sketch-family entry next to rows-only q13/q116.

    Scale shape: one distinct over (type, user) — combinable, the only
    event-volume exchange — then the per-type bottom-k runs as a
    rank-filtered window that Spark's WindowGroupLimit rewrites into
    map-side partial top-k (each shuffle partition forwards at most k
    rows per group, so the reducer sees #groups x k rows, independent
    of group size). The union sketch re-sketches k x #types hashes —
    broker-merge cost, never a second scan of events. The md5 hash is
    an in-row expression at scan speed."""
    from pyspark.sql.window import Window

    e = t(spark, sf_dir, "events")
    dv = e.select("event_type", "user_id").distinct()
    h = dv.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    w = Window.partitionBy("event_type").orderBy("h")
    kept = (
        h.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= _KMV_K)
        .drop("r")
        .transform(persist_once)
    )
    k1 = float(_KMV_K - 1)
    per_type = kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("h_k")
    )
    est_t = per_type.select(
        "event_type",
        "n_kept",
        F.when(F.col("n_kept") < _KMV_K, F.col("n_kept").cast("double"))
        .otherwise(F.lit(k1) * F.lit(float(_KMV_DOM)) / F.col("h_k").cast("double"))
        .alias("est_distinct"),
    )
    # union sketch: k smallest distinct hashes via orderBy+limit —
    # TakeOrderedAndProject (map-side partial top-k), NOT a global
    # window (the partition-less-window gate bans those)
    mkept = kept.select("h").distinct().orderBy("h").limit(_KMV_K)
    est_u = mkept.agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("h_k")
    ).select(
        F.lit("__all__").alias("event_type"),
        "n_kept",
        F.when(F.col("n_kept") < _KMV_K, F.col("n_kept").cast("double"))
        .otherwise(F.lit(k1) * F.lit(float(_KMV_DOM)) / F.col("h_k").cast("double"))
        .alias("est_distinct"),
    )
    return est_t.unionByName(est_u)


# --- q143: upsert view with delete markers (Pinot deleteRecordColumn)
#
# q58 is the plain latest-per-key compacted view; Pinot's upsert
# tables additionally honor a DELETE marker column
# (upsertConfig.deleteRecordColumn): a record flagged as a delete
# TOMBSTONES its key — the key disappears from the serving view until
# a later non-delete record revives it. The keyspace here is
# (user_id, event_type) and the marker is an op-code carried in the
# record payload (the deleteRecordColumn convention): props.k ≡ 0
# (mod 10) means "delete this key" — it fires on ~10% of records, so
# the tombstone path is genuinely exercised by the scored corpus
# (events.value is never NULL here, so a null-payload convention
# would make the delete branch vacuous).
#
# Same plan shape as q58 (one keyed exchange, WindowGroupLimit lowers
# the rank filter to map-side single-row forwarding); the tombstone is
# a post-filter on the already-elected winner, so deletes cost
# nothing extra.

_Q143 = """
    SELECT user_id, event_type, event_id AS latest_event_id,
           epoch_us(ts) AS ts_us, value
    FROM (
      SELECT e.*, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC) AS rn,
             CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 = 0
               AS is_delete
      FROM events e)
    WHERE rn = 1 AND NOT is_delete
"""


@query("q143_upsert_with_deletes", _Q143)
def q143_upsert_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-per-key upsert view with tombstone semantics (see block
    comment): elect the newest record per (user_id, event_type), then
    suppress keys whose newest record carries the delete op-code.
    ≡ Pinot upsertConfig.deleteRecordColumn applied to the compacted
    read the reference consumer serves
    (SRC/PulsarPartitionLevelConsumer.java:68 readCompacted)."""
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    is_delete = (
        F.get_json_object("props", "$.k").cast("int") % 10 == 0
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .withColumn("is_delete", is_delete)
        .filter((F.col("rn") == 1) & ~F.col("is_delete"))
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("latest_event_id"),
            F.unix_micros("ts").alias("ts_us"),
            "value",
        )
    )


# --- q152: theta-sketch SET OPERATIONS (intersect / A-not-B) --------
#
# q141 proves the KMV theta sketch and its UNION merge; q152 adds the
# other half of Pinot's DistinctCountThetaSketch surface: SET
# EXPRESSIONS over sketches ("users who did A and B", "did A but not
# B") answered from sketch state alone. Standard theta algebra
# (Dasgupta et al., the DataSketches paper): each sketch keeps its
# threshold θ (= k-th smallest hash, or the full domain when exact)
# and its sample S = {h < θ}; for a pair, θ∩ = min(θ_a, θ_b),
# M = |{h ∈ S_a ∩ S_b : h < θ∩}|, est = M·DOM/θ∩ — and the same
# filtered count over S_a \ S_b estimates the difference. The exact
# per-pair intersection (a user-keyed equi-join, q109-style bounded
# fanout) rides along as ground truth, making the entry its own
# accuracy report.
#
# Exactness: same 60-bit md5 hash as q141 (identical hex on both
# engines), integer counts, and one double division per estimate —
# bit-identical. Sketch state is ≤ k hashes/type, so every set
# expression runs on broker-merge-sized data.

_Q152 = f"""
    WITH dv AS (
      SELECT DISTINCT event_type, user_id FROM events),
    h AS (
      SELECT event_type,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS h
      FROM dv),
    ranked AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS r
      FROM h),
    kept AS (SELECT event_type, h FROM ranked WHERE r <= {_KMV_K}),
    theta AS (
      SELECT event_type,
             CASE WHEN COUNT(*) < {_KMV_K} THEN CAST({_KMV_DOM} AS BIGINT)
                  ELSE MAX(h) END AS theta
      FROM kept GROUP BY event_type),
    samp AS (
      SELECT k.event_type, k.h
      FROM kept k JOIN theta t ON t.event_type = k.event_type
      WHERE k.h < t.theta),
    pairs AS (
      SELECT a.event_type AS ta, b.event_type AS tb,
             LEAST(a.theta, b.theta) AS th
      FROM theta a JOIN theta b ON a.event_type < b.event_type),
    m AS (
      SELECT sa.event_type AS ta, sb.event_type AS tb,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM samp sa
      JOIN samp sb ON sb.h = sa.h AND sa.event_type < sb.event_type
      JOIN pairs p ON p.ta = sa.event_type AND p.tb = sb.event_type
                   AND sa.h < p.th
      GROUP BY 1, 2),
    anb AS (
      SELECT sa.event_type AS ta, p.tb,
             CAST(COUNT(*) AS BIGINT) AS n_a_only
      FROM samp sa
      JOIN pairs p ON p.ta = sa.event_type
      LEFT JOIN samp sb ON sb.event_type = p.tb AND sb.h = sa.h
      WHERE sa.h < p.th AND sb.h IS NULL
      GROUP BY 1, 2),
    ex AS (
      SELECT a.event_type AS ta, b.event_type AS tb,
             CAST(COUNT(*) AS BIGINT) AS n_exact
      FROM dv a JOIN dv b ON b.user_id = a.user_id
                         AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT p.ta, p.tb,
           COALESCE(m.n_common, 0) AS n_common,
           CAST(COALESCE(m.n_common, 0) AS DOUBLE) * {_KMV_DOM}
             / CAST(p.th AS DOUBLE) AS est_intersect,
           COALESCE(anb.n_a_only, 0) AS n_a_only,
           CAST(COALESCE(anb.n_a_only, 0) AS DOUBLE) * {_KMV_DOM}
             / CAST(p.th AS DOUBLE) AS est_a_not_b,
           COALESCE(ex.n_exact, 0) AS n_exact_intersect
    FROM pairs p
    LEFT JOIN m ON m.ta = p.ta AND m.tb = p.tb
    LEFT JOIN anb ON anb.ta = p.ta AND anb.tb = p.tb
    LEFT JOIN ex ON ex.ta = p.ta AND ex.tb = p.tb
"""


@query("q152_theta_sketch_setops", _Q152)
def q152_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch intersection and A-not-B estimates for every
    event-type pair, with the exact intersection as in-row ground
    truth (see block comment).

    Scale shape: the only event-volume work is the (type, user)
    distinct and the user-keyed exact-intersection join (bounded by
    per-user type combinations, the q109 shape); everything
    downstream — thresholds, samples, pair algebra — runs on ≤ k
    rows per type and broadcasts. At 100 TB the sketches come from
    segment-level partials merged at serve time (the q141 union
    path); the set expressions here never touch base data."""
    from pyspark.sql.window import Window

    e = t(spark, sf_dir, "events")
    dv = e.select("event_type", "user_id").distinct().transform(persist_once)
    h = dv.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    w = Window.partitionBy("event_type").orderBy("h")
    kept = (
        h.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= _KMV_K)
        .drop("r")
    )
    theta = kept.groupBy("event_type").agg(
        F.when(F.count(F.lit(1)) < _KMV_K, F.lit(_KMV_DOM).cast("long"))
        .otherwise(F.max("h"))
        .alias("theta")
    )
    samp = (
        kept.join(F.broadcast(theta), "event_type")
        .where(F.col("h") < F.col("theta"))
        .select("event_type", "h")
        .transform(persist_once)
    )
    ta = theta.alias("a")
    tb = theta.alias("b")
    pairs = ta.join(
        tb, F.col("a.event_type") < F.col("b.event_type")
    ).select(
        F.col("a.event_type").alias("ta"),
        F.col("b.event_type").alias("tb"),
        F.least("a.theta", "b.theta").alias("th"),
    )
    sa = samp.alias("sa")
    sb = samp.alias("sb")
    m = (
        sa.join(
            sb,
            (F.col("sb.h") == F.col("sa.h"))
            & (F.col("sa.event_type") < F.col("sb.event_type")),
        )
        .join(
            F.broadcast(pairs),
            (F.col("ta") == F.col("sa.event_type"))
            & (F.col("tb") == F.col("sb.event_type"))
            & (F.col("sa.h") < F.col("th")),
        )
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    anb = (
        sa.join(F.broadcast(pairs), F.col("ta") == F.col("sa.event_type"))
        .join(
            sb,
            (F.col("sb.event_type") == F.col("tb"))
            & (F.col("sb.h") == F.col("sa.h")),
            "left",
        )
        .where((F.col("sa.h") < F.col("th")) & F.col("sb.h").isNull())
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("n_a_only"))
    )
    da = dv.alias("da")
    db = dv.alias("db")
    ex = (
        da.join(
            db,
            (F.col("db.user_id") == F.col("da.user_id"))
            & (F.col("da.event_type") < F.col("db.event_type")),
        )
        .groupBy(
            F.col("da.event_type").alias("ta"), F.col("db.event_type").alias("tb")
        )
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    dom_d = float(_KMV_DOM)
    out = (
        pairs.join(m, ["ta", "tb"], "left")
        .join(anb, ["ta", "tb"], "left")
        .join(ex, ["ta", "tb"], "left")
        .select(
            "ta",
            "tb",
            F.coalesce("n_common", F.lit(0)).alias("n_common"),
            (
                F.coalesce("n_common", F.lit(0)).cast("double")
                * F.lit(dom_d)
                / F.col("th").cast("double")
            ).alias("est_intersect"),
            F.coalesce("n_a_only", F.lit(0)).alias("n_a_only"),
            (
                F.coalesce("n_a_only", F.lit(0)).cast("double")
                * F.lit(dom_d)
                / F.col("th").cast("double")
            ).alias("est_a_not_b"),
            F.coalesce("n_exact", F.lit(0)).alias("n_exact_intersect"),
        )
    )
    return out


# --- q162: TUPLE sketch (metric-carrying theta sketch) --------------
#
# The third member of the DataSketches theta family (Pinot
# DistinctCountTupleSketch / SUM_VALUES_INTEGER_TUPLE_SKETCH): each
# retained hash carries a VALUE, so the sketch answers "estimated
# TOTAL METRIC over distinct keys" (here: total purchase cents over
# distinct purchasing users per event type) from sketch state alone.
# Estimator: exact when the key set fits (n < k); otherwise the
# sampled entries h < θ scale by the inverse inclusion probability
# DOM/θ — the Horvitz-Thompson estimate the tuple sketch implements.
#
# Exactness: q141's portable 60-bit md5 hash; per-user metrics are
# presum int64 cents aggregated BEFORE sketching (the sketch stores
# one entry per key, so the value must already be the key's total);
# the estimate is one double chain on exact integers. The exact
# corpus total rides along as ground truth.

_Q162 = f"""
    WITH uv AS (
      SELECT event_type, user_id,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY event_type, user_id),
    h AS (
      SELECT event_type, cents,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS h
      FROM uv),
    ranked AS (
      SELECT event_type, cents, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS r
      FROM h),
    kept AS (SELECT event_type, cents, h FROM ranked WHERE r <= {_KMV_K}),
    st AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_kept,
             CAST(MAX(h) AS BIGINT) AS h_k,
             CAST(SUM(cents) AS BIGINT) AS kept_cents
      FROM kept GROUP BY event_type),
    samp AS (
      SELECT k.event_type, CAST(SUM(k.cents) AS BIGINT) AS samp_cents
      FROM kept k JOIN st ON st.event_type = k.event_type
      WHERE st.n_kept = {_KMV_K} AND k.h < st.h_k
      GROUP BY k.event_type),
    exact AS (
      SELECT event_type, CAST(SUM(cents) AS BIGINT) AS exact_cents,
             CAST(COUNT(*) AS BIGINT) AS exact_users
      FROM uv GROUP BY event_type)
    SELECT st.event_type, st.n_kept,
           CASE WHEN st.n_kept < {_KMV_K}
                THEN CAST(st.kept_cents AS DOUBLE)
                ELSE CAST(s.samp_cents AS DOUBLE) * {_KMV_DOM}
                     / CAST(st.h_k AS DOUBLE) END AS est_total_cents,
           e.exact_cents, e.exact_users
    FROM st
    LEFT JOIN samp s ON s.event_type = st.event_type
    JOIN exact e ON e.event_type = st.event_type
"""


@query("q162_tuple_sketch_sum", _Q162)
def q162_tuple_sketch_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tuple-sketch estimate of total purchase cents over distinct
    users per event type, exact totals in-row as ground truth (see
    block comment) — the metric-carrying member of the q141/q152
    theta-sketch family.

    Scale shape: one combinable (type, user) aggregate over events —
    the only fact-volume exchange (the sketch REQUIRES per-key totals,
    so this pass exists in any implementation) — then bottom-k via the
    WindowGroupLimit rank filter and sketch-sized arithmetic. Merge
    across segments = union entries, re-take bottom-k, re-sum
    (associative, the q141 property)."""
    from pyspark.sql.window import Window

    e = t(spark, sf_dir, "events")
    uv = e.groupBy("event_type", "user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    h = uv.select(
        "event_type",
        "cents",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    w = Window.partitionBy("event_type").orderBy("h")
    kept = (
        h.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= _KMV_K)
        .drop("r")
        .transform(persist_once)
    )
    st = kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("h_k"),
        F.sum("cents").alias("kept_cents"),
    )
    samp = (
        kept.join(F.broadcast(st), "event_type")
        .where((F.col("n_kept") == _KMV_K) & (F.col("h") < F.col("h_k")))
        .groupBy("event_type")
        .agg(F.sum("cents").alias("samp_cents"))
    )
    exact = uv.groupBy("event_type").agg(
        F.sum("cents").alias("exact_cents"), F.count(F.lit(1)).alias("exact_users")
    )
    dom = float(_KMV_DOM)
    return (
        st.join(samp, "event_type", "left")
        .join(exact, "event_type")
        .select(
            "event_type",
            "n_kept",
            F.when(F.col("n_kept") < _KMV_K, F.col("kept_cents").cast("double"))
            .otherwise(
                F.col("samp_cents").cast("double") * F.lit(dom)
                / F.col("h_k").cast("double")
            )
            .alias("est_total_cents"),
            "exact_cents",
            "exact_users",
        )
    )
