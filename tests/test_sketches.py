"""Accuracy gates for sketch aggregates (no SQL oracle → bounded-error
tests against the exact computation, as promised in q13/q57)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pinot_pulsar_plugin_spark.catalog import load_table
from pinot_pulsar_plugin_spark.operators.patterns import q57_approx_quantiles
from pinot_pulsar_plugin_spark.operators.relational import q13_agg_approx_distinct

SF = "/root/testdata/sf0.01"


def test_hll_within_5pct_of_exact(spark):
    approx = {
        r.l_returnflag: (r.approx_parts, r.approx_orders)
        for r in q13_agg_approx_distinct(spark, SF).collect()
    }
    li = load_table(spark, SF, "lineitem")
    exact = {
        r.l_returnflag: (r.p, r.o)
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("p"), F.countDistinct("l_orderkey").alias("o"))
        .collect()
    }
    for k, (ep, eo) in exact.items():
        ap, ao = approx[k]
        assert abs(ap - ep) / ep < 0.05, (k, ap, ep)
        assert abs(ao - eo) / eo < 0.05, (k, ao, eo)


def test_approx_percentile_within_2pct_of_exact(spark):
    approx = {
        r.l_returnflag: (r.p50, r.p90, r.p99)
        for r in q57_approx_quantiles(spark, SF).collect()
    }
    li = load_table(spark, SF, "lineitem")
    exact = {
        r.l_returnflag: r.qs
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").alias("qs"))
        .collect()
    }
    for k, eq in exact.items():
        for a, e in zip(approx[k], eq):
            assert abs(a - e) / e < 0.02, (k, a, e)


def test_q116_hll_merge_within_error_bounds(spark):
    """The merged per-nation sketches estimate the global distinct
    within HLL lgK=12 bounds (3σ ≈ 2.4%), and the union preserves the
    sketch count."""
    from pinot_pulsar_plugin_spark.operators.common import t
    from pinot_pulsar_plugin_spark.operators.patterns import q116_hll_sketch_merge

    row = q116_hll_sketch_merge(spark, SF).collect()[0]
    exact = t(spark, SF, "customer").select("c_custkey").distinct().count()
    assert abs(row.est_distinct - exact) / exact < 0.024, (row.est_distinct, exact)
    n_nations = t(spark, SF, "customer").select("c_nationkey").distinct().count()
    assert row.n_sketches == n_nations
    assert row.total_rows == t(spark, SF, "customer").count()


def test_q141_kmv_estimate_within_error_and_exact_below_k(spark, tmp_path):
    """KMV accuracy: on the real events table every sketch estimate
    must land within 4x the theoretical RSE (1/sqrt(k-2), k=64 ->
    ~12.7%) of the exact distinct count; on a constructed corpus with
    a small group (< k distinct) the sketch must be EXACT (a KMV
    sketch below capacity IS the set)."""
    import math

    from pinot_pulsar_plugin_spark.operators.patterns import (
        _KMV_K,
        q141_kmv_theta_sketch,
    )

    ev = load_table(spark, SF, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["__all__"] = ev.select("user_id").distinct().count()
    rse = 1.0 / math.sqrt(_KMV_K - 2)
    for r in q141_kmv_theta_sketch(spark, SF).collect():
        want = exact[r.event_type]
        assert abs(r.est_distinct - want) <= 4 * rse * want, (
            r.event_type,
            r.est_distinct,
            want,
        )

    rows = [(i, "t_big" if i < 500 else "t_small", i % (400 if i < 500 else 7))
            for i in range(600)]
    spark.createDataFrame(
        rows, "event_id long, event_type string, user_id long"
    ).select(
        "event_id",
        F.timestamp_micros(F.lit(0) + F.col("event_id") * 1000000).alias("ts"),
        "user_id",
        "event_type",
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r.event_type: (r.n_kept, r.est_distinct)
        for r in q141_kmv_theta_sketch(spark, str(tmp_path)).collect()
    }
    assert got["t_small"] == (7, 7.0)  # below capacity -> exact
    assert got["t_big"][0] == _KMV_K
    assert abs(got["t_big"][1] - 400) <= 4 * rse * 400


def test_q152_setops_exact_when_sketches_are_exact(spark, tmp_path):
    """Below k distinct users per type the sketch IS the set: theta is
    the full domain, every estimate collapses to the exact count.
    A = users 1-10, B = users 6-15 -> intersect 5, A-not-B 5."""
    import datetime

    from pinot_pulsar_plugin_spark.operators.patterns import q152_theta_sketch_setops

    ts = datetime.datetime(2024, 1, 1)
    rows = [(i, ts, u, "A", 1.0, "{}") for i, u in enumerate(range(1, 11))] + [
        (100 + i, ts, u, "B", 1.0, "{}") for i, u in enumerate(range(6, 16))
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))

    rows = q152_theta_sketch_setops(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.ta, r.tb) == ("A", "B")
    assert (r.n_common, r.est_intersect) == (5, 5.0)
    assert (r.n_a_only, r.est_a_not_b) == (5, 5.0)
    assert r.n_exact_intersect == 5


def test_q162_tuple_sketch_exact_below_capacity(spark, tmp_path):
    """Below k distinct users the tuple sketch IS the keyed totals:
    est_total equals the exact corpus total bit-for-bit, and repeated
    events per user collapse into one entry (per-key presum)."""
    import datetime

    from pinot_pulsar_plugin_spark.operators.patterns import q162_tuple_sketch_sum

    ts = datetime.datetime(2024, 1, 1)
    rows = [(1, ts, 1, "A", 10.0, "{}"), (2, ts, 1, "A", 5.0, "{}"),
            (3, ts, 2, "A", 7.5, "{}")]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))

    r = q162_tuple_sketch_sum(spark, str(tmp_path)).collect()[0]
    assert (r.event_type, r.n_kept, r.exact_users) == ("A", 2, 2)
    assert r.exact_cents == 2250
    assert r.est_total_cents == 2250.0
