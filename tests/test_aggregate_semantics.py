

def test_q122_exact_corr_agrees_with_native_within_ulps(spark):
    """The integer-co-moment Pearson must agree with Spark's native
    streaming corr() to ~1e-12 (they compute the same statistic; only
    the accumulation order differs) while being bit-reproducible
    itself — and the slope must equal num/dx of the same moments."""
    from pyspark.sql import functions as F

    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q122_exact_corr_by_flag,
    )
    from pinot_pulsar_plugin_spark.operators.common import t

    sf = "/root/testdata/sf0.001"
    mine = {
        r.l_returnflag: (r.corr_qty_disc, r.slope_disc_per_qty)
        for r in q122_exact_corr_by_flag(spark, sf).collect()
    }
    li = t(spark, sf, "lineitem")
    native = {
        r.l_returnflag: r.c
        for r in li.groupBy("l_returnflag")
        .agg(
            F.corr(
                F.round("l_quantity"), F.round(F.col("l_discount") * 100)
            ).alias("c")
        )
        .collect()
    }
    for flag, (c, _s) in mine.items():
        assert abs(c - native[flag]) < 1e-12, (flag, c, native[flag])
        assert -1.0 <= c <= 1.0
