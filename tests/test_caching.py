"""Cache-entry ownership semantics (ADVICE r9 #2).

The CacheManager is plan-keyed: two DataFrames with equivalent
analyzed plans share ONE cache entry. ``persist_once`` silently reuses
such an entry; a call site that later unpersists unconditionally would
evict an entry some OTHER owner created. ``persist_scoped`` returns
whether THIS call created the entry so release sites can skip the
unpersist they don't own.
"""

from pyspark.sql import functions as F

from pinot_pulsar_plugin_spark.caching import persist_once, persist_scoped


def _cached(df) -> bool:
    lvl = df.storageLevel
    return lvl.useMemory or lvl.useDisk


def test_persist_once_is_idempotent(spark):
    df = spark.range(10).select(F.col("id") * 2)
    try:
        assert not _cached(df)
        persist_once(df)
        assert _cached(df)
        persist_once(df)  # no-op, no second entry, no WARN
        assert _cached(df)
    finally:
        df.unpersist()


def test_persist_scoped_reports_ownership(spark):
    a = spark.range(20).select((F.col("id") + 1).alias("v"))
    b = spark.range(20).select((F.col("id") + 1).alias("v"))  # same plan
    try:
        a2, owned_a = persist_scoped(a)
        assert owned_a and _cached(a2)
        # b's plan hits a's cache entry: not b's to own
        b2, owned_b = persist_scoped(b)
        assert not owned_b
        # the non-owner skipping its unpersist leaves a's entry alive
        if owned_b:
            b2.unpersist()
        assert _cached(a)
    finally:
        a.unpersist()


def test_scd2_write_batch_preserves_foreign_cache(spark, tmp_path):
    """Regression (ADVICE r9 #2): scd2's write_batch used to
    unconditionally unpersist its delta, evicting a plan-equivalent
    cache entry created by an outer owner."""
    from pinot_pulsar_plugin_spark.streaming.scd2 import scd2_sink

    rows = [(1, "view", 1_000_000, 10), (1, "buy", 2_000_000, 11)]
    schema = "user_id bigint, event_type string, ts_us bigint, event_id bigint"
    outer = spark.createDataFrame(rows, schema).withColumn(
        "ts", F.timestamp_micros(F.col("ts_us"))
    )
    try:
        outer.persist()
        outer.count()
        scd2_sink(str(tmp_path / "scd2"), n_buckets=4)(
            spark.createDataFrame(rows, schema).withColumn(
                "ts", F.timestamp_micros(F.col("ts_us"))
            ),
            0,
        )
        assert _cached(outer), "write_batch evicted the outer owner's cache"
    finally:
        outer.unpersist()


def test_persist_materialized_counts_only_when_owned(spark):
    """r13: persist_materialized materializes (counts) exactly when it
    CREATES the cache entry; a plan-equivalent later call must skip
    both the persist and the materializing count (the per-build cache
    re-scan it eliminates), and results are identical either way."""
    from unittest.mock import patch

    from pinot_pulsar_plugin_spark.caching import persist_materialized

    a = spark.range(30).select((F.col("id") * 3).alias("v"))
    b = spark.range(30).select((F.col("id") * 3).alias("v"))  # same plan
    try:
        with patch.object(
            type(a), "count", autospec=True, side_effect=type(a).count
        ) as counted:
            persist_materialized(a)
            assert _cached(a)
            assert counted.call_count == 1  # owner materializes
            persist_materialized(b)  # equivalent plan: already cached
            assert counted.call_count == 1  # non-owner skips the scan
        assert sorted(r.v for r in b.collect()) == [i * 3 for i in range(30)]
    finally:
        a.unpersist()
