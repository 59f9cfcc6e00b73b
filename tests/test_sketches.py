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
