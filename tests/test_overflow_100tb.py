"""100-TB overflow-regime pins for the r11 arithmetic audit.

SCALING.md §7 audits every fixed-point product/sum in the registry at
the 100 TB design point (lineitem ~6e11 rows, events ~1e12,
users/parts ~1e10+, ids snowflake-scale). Sites whose all-BIGINT
arithmetic exceeds int64 there were lifted to exact DECIMAL(38,0)
(the q196 rule, 6e51bd7) or ring-reduced before multiplying (the hash
sites). These tests PIN the overflow regime itself: the lifted forms
return the exact value (checked against Python's arbitrary-precision
ints) on magnitudes where the original long form raises ANSI
ARITHMETIC_OVERFLOW.

Two test shapes, by reachability:

- Operators whose regime is reachable from SMALL synthetic inputs
  (huge ids, huge timestamps, huge planted values) drive the REAL
  registry operator end-to-end on a tmp-path table.
- Operators whose dangerous magnitudes only arise from huge ROW
  COUNTS (act/cnt are COUNT(*) results — q209) pin the exact
  expression the operator uses on a fabricated aggregate frame, the
  same precedent as test_q196_decimal_gini_survives_long_overflow;
  their end-to-end value identity is covered by the existing
  randomized fuzz differentials and the driver oracle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("spark")

KNUTH = 2654435761
KNUTH2 = 2246822519


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, event_type, user_id, ts_us, value)."""
    df = spark.createDataFrame(
        [(e, t_, u, v) for (e, t_, u, _ts, v) in rows],
        "event_id long, event_type string, user_id long, value double",
    )
    ts = {e: t_ for (e, _et, _u, t_, _v) in rows}
    m = F.create_map(
        *[x for e, t_ in ts.items() for x in (F.lit(e), F.lit(t_))]
    )
    df = (
        df.withColumn("ts", F.timestamp_micros(m[F.col("event_id")]))
        .withColumn("props", F.lit("{}"))
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


# --- hash-injection sites: ((k % B) * KNUTH) % B ≡ (k * KNUTH) % B ----------


def test_knuth_mod_reduce_identity_exhaustive():
    """The ring-homomorphism identity behind the r11 hash fix, checked
    in Python bigints across bucket counts and snowflake-scale keys."""
    for b in (32, 100, 1000, 1000003):
        for k in (0, 1, 7, b - 1, 3_470_000_000, 10**12, 2**62):
            assert ((k % b) * KNUTH) % b == (k * KNUTH) % b
            assert ((k % b) * KNUTH2) % b == (k * KNUTH2) % b


def test_q86_q189_hash_coords_survive_snowflake_ids(spark, tmp_path):
    """q86/q189's injected coordinates on ids past the 3.5e9 long
    cliff: the reduced form runs and lands on exactly the Python
    values; the original unreduced multiply raises under ANSI."""
    from pinot_pulsar_plugin_spark.operators.eventanalytics import (
        q86_geo_radius_join,
        q189_grid_hotspots,
    )

    ids = [10**12 + 7, 2**61 + 3, 4_000_000_001, 5]
    rows = [
        (eid, "click", uid, 1_000_000 * (i + 1), 1.0)
        for i, (eid, uid) in enumerate(zip(ids, reversed(ids)))
    ]
    _write_events(spark, tmp_path, rows)

    # the real operators complete without ARITHMETIC_OVERFLOW
    q86_geo_radius_join(spark, str(tmp_path)).collect()
    q189_grid_hotspots(spark, str(tmp_path)).collect()

    # and the coordinate expression lands on the Python value
    got = {
        (r.x, r.y)
        for r in spark.read.parquet(str(tmp_path / "events.parquet"))
        .select(
            F.pmod(F.pmod(F.col("user_id"), F.lit(1000)) * KNUTH, F.lit(1000)).alias("x"),
            F.pmod(F.pmod(F.col("event_id"), F.lit(1000)) * KNUTH2, F.lit(1000)).alias("y"),
        )
        .collect()
    }
    exp = {
        ((uid * KNUTH) % 1000, (eid * KNUTH2) % 1000)
        for (eid, _t, uid, _ts, _v) in rows
    }
    assert got == exp

    # the pre-fix form is the overflow (documents why the reduce exists)
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        spark.read.parquet(str(tmp_path / "events.parquet")).select(
            (F.col("user_id") * KNUTH).alias("boom")
        ).collect()


def test_q169_variant_assignment_survives_snowflake_ids(spark, tmp_path):
    """q169's control/treatment split on huge user ids: runs, and each
    user lands in the arm Python's exact arithmetic picks."""
    from pinot_pulsar_plugin_spark.operators.eventanalytics import (
        q169_abtest_ztest,
    )

    uids = [10**12 + k for k in range(8)] + [2**61, 5]
    rows = [
        (i, "purchase" if i % 2 else "view", u, 1_000_000 * (i + 1), 1.0)
        for i, u in enumerate(uids)
    ]
    _write_events(spark, tmp_path, rows)
    out = q169_abtest_ztest(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    exp_control = sum(1 for u in uids if (u * KNUTH) % 100 < 50)
    assert (r.n1 or 0) == exp_control
    assert (r.n2 or 0) == len(uids) - exp_control


# --- q100: Σx²/Σxy lifted to DECIMAL(38,0) ----------------------------------


def test_q100_drift_survives_extreme_hour_span(spark, tmp_path):
    """Timestamps ~1e9 hours apart make Σx² exceed int64 with a
    handful of rows; the decimal sums return the slope the Python
    bigint sufficient statistics imply (same IEEE double chain)."""
    from pinot_pulsar_plugin_spark.operators.eventanalytics import (
        q100_value_drift,
    )

    hour_us = 3_600_000_000
    # max ts stays < int64 µs; Σx² = 1.2e19 > int64 regardless
    xs = [0, 1_900_000_000, 2_000_000_000, 2_100_000_000]
    vals = [1.0, 2.5, 2.0, 4.0]
    rows = [
        (i, "click", 1, x * hour_us, v)
        for i, (x, v) in enumerate(zip(xs, vals))
    ]
    _write_events(spark, tmp_path, rows)

    out = q100_value_drift(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]

    ys = [round(v * 100) for v in vals]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    assert sxx > 2**63 - 1  # the long form would overflow
    exp_slope = (
        (float(n) * float(sxy) - float(sx) * float(sy))
        / (float(n) * float(sxx) - float(sx) * float(sx))
        / 100.0
    )
    assert r.n == n
    assert r.slope_per_hour == exp_slope
    assert r.mean_value == (float(sy) / float(n)) / 100.0


# --- q209: gini bracket lifted to DECIMAL(38,0) ------------------------------


def test_q209_gini_bracket_survives_long_overflow(spark):
    """The exact decimal expressions q209 applies to the
    value_histogram frame, on run sizes (cnt, cum ~1e10) where every
    stage of the long bracket exceeds int64 — result checked against
    Python bigints; the long form raises."""
    # fabricated histogram: 3 runs of ~5e9 users each at activities
    # 2, 3, 7 — cum in the e10 range, n_events ~3.2e10
    runs = [(2, 5_000_000_000), (3, 4_000_000_000), (7, 6_000_000_000)]
    rows, cum = [], 0
    for act, cnt in runs:
        cum += cnt
        rows.append(("t", act, cnt, cum))
    # Spark's `div` on DECIMAL operands narrows to BIGINT and silently
    # wraps past int64 even under ANSI — the reason q209 stores the
    # DOUBLED run contribution (no mid-chain halving div). Pin the
    # wrap so an upstream fix of it surfaces here.
    wrap = (
        spark.createDataFrame([(6_000_000_000, 15_000_000_000)], "cnt long, cum long")
        .select(
            F.expr(
                "CAST(cnt AS DECIMAL(38,0)) * (2 * cum - cnt + 1) div 2"
            ).alias("b")
        )
        .collect()[0]
        .b
    )
    assert wrap != 6_000_000_000 * (2 * 15_000_000_000 - 6_000_000_000 + 1) // 2

    h2 = (
        spark.createDataFrame(
            rows, "event_type string, act long, cnt long, cum long"
        )
        .withColumn(
            "s_run2",
            F.expr(
                "CAST(act AS DECIMAL(38,0))"
                " * (CAST(cnt AS DECIMAL(38,0)) * (2 * cum - cnt + 1))"
            ),
        )
    )
    got = (
        h2.groupBy("event_type")
        .agg(
            F.sum("cnt").alias("n_users"),
            F.sum(F.col("act") * F.col("cnt")).alias("n_events"),
            F.expr(
                "CAST((sum(s_run2)"
                " - (sum(cnt) + 1) * CAST(sum(act * cnt) AS DECIMAL(38,0))) * 1000"
                " div (sum(cnt) * CAST(sum(act * cnt) AS DECIMAL(38,0)))"
                " AS BIGINT)"
            ).alias("gini_milli"),
        )
        .collect()[0]
    )

    # Python bigint oracle over the expanded rank form
    s_runs, cum_py = [], 0
    for act, cnt in runs:
        cum_py += cnt
        s_runs.append(act * (cnt * (2 * cum_py - cnt + 1) // 2))
    n_users = sum(c for _a, c in runs)
    n_events = sum(a * c for a, c in runs)
    bracket = 2 * sum(s_runs) - (n_users + 1) * n_events
    exp = bracket * 1000 // (n_users * n_events)
    assert sum(s_runs) > 2**63 - 1  # long s_run sum overflows
    assert (n_users + 1) * n_events > 2**63 - 1  # long bracket overflows
    assert (got.n_users, got.n_events, got.gini_milli) == (
        n_users,
        n_events,
        exp,
    )

    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        spark.createDataFrame(
            rows, "event_type string, act long, cnt long, cum long"
        ).withColumn(
            "s_run", F.expr("act * (cnt * (2 * cum - cnt + 1) div 2)")
        ).groupBy("event_type").agg(
            F.expr(
                "(2 * sum(s_run) - (sum(cnt) + 1) * sum(act * cnt)) * 1000 "
                "div (sum(cnt) * sum(act * cnt))"
            ).alias("g")
        ).collect()


# --- Batch 2: aggregates2 monetary sums lifted to DECIMAL(38,0) --------------
#
# Each test drives the REAL registry operator on synthetic tables with
# planted revenue magnitudes from the 100-TB regime (per-group cent
# sums past 9.2e12 so ·1e6 exceeds int64, or product sums past int64
# directly) and checks the exact values Python bigints imply.


def _pq(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / f"{name}.parquet")
    )


def _orders(spark, tmp_path, rows):
    """rows: (o_orderkey, o_custkey, day_index, o_totalprice)."""
    df = spark.createDataFrame(
        [(k, c, d, p) for (k, c, d, p) in rows],
        "o_orderkey long, o_custkey long, day long, o_totalprice double",
    )
    df.select(
        "o_orderkey",
        "o_custkey",
        F.timestamp_micros(F.col("day") * 86_400_000_000).alias(
            "o_orderdate"
        ),
        "o_totalprice",
        F.lit("O").alias("o_orderstatus"),
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))


def test_q204_acquisition_ppm_survives_100tb_month_cents(spark, tmp_path):
    """Month cents past 9.2e12: new_revenue_ppm must come back as the
    exact floor Python computes (the long ·1e6 would overflow)."""
    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q204_acquisition_mix,
    )

    big = 2.0e11  # dollars -> 2e13 cents per order
    # customer 1: first order month 0, returns month 1; customer 2 new in month 1
    _orders(
        spark,
        tmp_path,
        [(1, 1, 0, big), (2, 1, 35, big), (3, 2, 36, big), (4, 2, 37, big)],
    )
    out = {r.month_bucket: r for r in q204_acquisition_mix(spark, str(tmp_path)).collect()}
    cents = round(big * 100)
    assert cents * 1_000_000 > 2**63 - 1  # the pre-fix numerator regime
    # month 0: all revenue new
    assert out[0].new_revenue_ppm == 1_000_000
    # month 1: customer 1 returning (1 order), customer 2 new (2 orders)
    exp = (2 * cents) * 1_000_000 // (3 * cents)
    assert out[1].new_revenue_ppm == exp
    assert out[1].new_orders == 2 and out[1].returning_orders == 1


def test_q187_shares_survive_100tb_nation_cents(spark, tmp_path):
    """Nation/region cent sums past 9.2e12: both ppm shares exact."""
    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q187_percent_of_parent,
    )

    _orders(spark, tmp_path, [(1, 1, 0, 3.0e11), (2, 2, 1, 1.0e11)])
    _pq(
        spark,
        tmp_path,
        "customer",
        [(1, 10), (2, 20)],
        "c_custkey long, c_nationkey long",
    )
    _pq(
        spark,
        tmp_path,
        "nation",
        [(10, 100, "ALPHA"), (20, 100, "BETA")],
        "n_nationkey long, n_regionkey long, n_name string",
    )
    _pq(
        spark,
        tmp_path,
        "region",
        [(100, "R1")],
        "r_regionkey long, r_name string",
    )
    out = {r.nation: r for r in q187_percent_of_parent(spark, str(tmp_path)).collect()}
    a, b = round(3.0e11 * 100), round(1.0e11 * 100)
    assert a * 1_000_000 > 2**63 - 1
    assert out["ALPHA"].share_of_region_ppm == a * 1_000_000 // (a + b)
    assert out["BETA"].share_of_region_ppm == b * 1_000_000 // (a + b)
    assert out["ALPHA"].region_share_of_total_ppm == 1_000_000


def test_q177_cr4_survives_100tb_type_cents(spark, tmp_path):
    """A type whose top-4 slice exceeds 9.2e12 cents: cr4_ppm exact."""
    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q177_market_concentration,
    )

    prices = [4.0e11, 3.0e11, 2.0e11, 1.0e11, 0.5e11, 0.25e11]
    _pq(
        spark,
        tmp_path,
        "lineitem",
        [(i + 1, i + 1, p, 0.0) for i, p in enumerate(prices)],
        "l_orderkey long, l_suppkey long, l_extendedprice double, l_discount double",
    )
    _pq(
        spark,
        tmp_path,
        "part",
        [(i + 1, "TYPE_A") for i in range(len(prices))],
        "p_partkey long, p_type string",
    )
    # join key is l_partkey — mirror suppkey as partkey
    spark.read.parquet(str(tmp_path / "lineitem.parquet")).withColumn(
        "l_partkey", F.col("l_orderkey")
    ).write.mode("overwrite").parquet(str(tmp_path / "li2.parquet"))
    import shutil

    shutil.rmtree(str(tmp_path / "lineitem.parquet"))
    shutil.move(str(tmp_path / "li2.parquet"), str(tmp_path / "lineitem.parquet"))

    out = q177_market_concentration(spark, str(tmp_path)).collect()
    cents = [round(p * 100) for p in prices]
    top4, tot = sum(sorted(cents, reverse=True)[:4]), sum(cents)
    assert top4 * 1_000_000 > 2**63 - 1
    r = out[0]
    assert r.cr4_ppm == top4 * 1_000_000 // tot
    shares = [c * 1_000_000 // tot for c in cents]
    assert r.hhi_points == float(sum(s * s for s in shares)) / 1e8


def test_q185_backtest_survives_100tb_month_cents(spark, tmp_path):
    """Monthly cents ~2e13: ape_ppm exact where the long form would
    overflow; mae is pure-long CENTS since r12 (the milli quotient
    itself passed int64 at design-point magnitudes — the
    decimal_div_quotient gate catch, pinned in test_overflow_gate)."""
    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q185_forecast_backtest,
    )

    # two months, naive-1 only (not enough history for MA-3)
    _orders(spark, tmp_path, [(1, 1, 5, 2.0e11), (2, 1, 35, 3.0e11)])
    out = {r.method: r for r in q185_forecast_backtest(spark, str(tmp_path)).collect()}
    c0, c1 = round(2.0e11 * 100), round(3.0e11 * 100)
    ae = abs(c1 - c0)
    assert ae * 1_000_000 > 2**63 - 1
    r = out["naive_1"]
    assert r.sum_abs_err_cents == ae
    assert r.mae_cents == ae
    assert r.mape_ppm == (ae * 1_000_000 // c1) // 1


def test_q81_moments_survive_100tb_sum_of_cubes(spark, tmp_path):
    """Σq³ past int64 from planted large quantities: the decimal
    moment sums land on the Python-bigint double chain."""
    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q81_stats_moments,
    )

    # per-row q³ must stay int64 (the operator's per-row products
    # are long by design — only the SUMS are decimal); three rows
    # near the per-row cap push Σq³ past int64
    quantities = [2.0e4, 2.0e4, 1.0e4]
    _pq(
        spark,
        tmp_path,
        "lineitem",
        [("N", q_, d_) for q_, d_ in zip(quantities, (0.04, 0.05, 0.06))],
        "l_returnflag string, l_quantity double, l_discount double",
    )
    out = q81_stats_moments(spark, str(tmp_path)).collect()[0]
    qs = [round(q_ * 100) for q_ in quantities]
    ds = [4, 5, 6]
    n = len(qs)
    s1, s2, s3 = sum(qs), sum(x * x for x in qs), sum(x**3 for x in qs)
    t1, t2 = sum(ds), sum(d * d for d in ds)
    x1 = sum(a * b for a, b in zip(qs, ds))
    assert s3 > 2**63 - 1
    nf = float(n)
    s1f, s2f, s3f = float(s1), float(s2), float(s3)
    exp_var = round((s2f - s1f * s1f / nf) / (nf - 1) / 10000.0, 6)
    assert out.var_qty == exp_var
    exp_mean = round(s1f / nf / 100.0, 6)
    assert out.mean_qty == exp_mean


def test_q179_q192_survive_100tb_brand_totals(spark, tmp_path):
    """Brand totals past int64 in 1e-4 fixed-point: the election and
    series both complete and land on Python values."""
    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q179_topn_others_rollup,
        q192_topk_drift,
    )

    # two brands; brand A's total fp ~1.2e19 > int64
    rows, parts = [], []
    for i in range(3):
        rows.append((i + 1, i + 1, 4.0e14, 0.0, i * 40))  # brand A rows
        parts.append((i + 1, "Brand#A"))
    rows.append((4, 4, 1.0e14, 0.0, 10))
    parts.append((4, "Brand#B"))
    df = spark.createDataFrame(
        [(k, pk, p, d) for (k, pk, p, d, _day) in rows],
        "l_orderkey long, l_partkey long, l_extendedprice double, l_discount double",
    )
    days = {k: day for (k, _pk, _p, _d, day) in rows}
    m = F.create_map(*[x for k, day in days.items() for x in (F.lit(k), F.lit(day))])
    df.withColumn(
        "l_shipdate", F.timestamp_micros(m[F.col("l_orderkey")] * 86_400_000_000)
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    _pq(spark, tmp_path, "part", parts, "p_partkey long, p_brand string")

    fps = {k: round(p * 10000) for (k, _pk, p, _d, _day) in rows}
    tot_a = fps[1] + fps[2] + fps[3]
    assert tot_a > 2**63 - 1  # per-brand total passes int64

    # q179: brand A is top-5 (so is B — only 2 brands); series sums per month
    out179 = q179_topn_others_rollup(spark, str(tmp_path)).collect()
    got = {(r.month_bucket, r.series): r.revenue for r in out179}
    assert got[(0, "Brand#A")] == float(fps[1]) / 10000.0
    assert got[(1, "Brand#A")] == float(fps[2]) / 10000.0

    # q192: halves split at mid-day; totals per (half, brand) exact
    out192 = {r.brand: r for r in q192_topk_drift(spark, str(tmp_path)).collect()}
    # mid = (0 + 80 + 1) div 2 = 40 -> half1 days 0,10; half2 days 40,80
    assert out192["Brand#A"].rev_fp_h1 == fps[1]
    assert out192["Brand#A"].rev_fp_h2 == fps[2] + fps[3]
    assert out192["Brand#B"].rev_fp_h1 == fps[4]


def test_q197_correlation_survives_100tb_price_squares(spark, tmp_path):
    """Σp² past int64 from planted large prices: the decimal
    sufficient statistics land on the Python-bigint double chain."""
    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q197_correlation_matrix,
    )

    # per-row p² must stay int64 (per-row products are long by
    # design; real prices are ~1e5 — the regime is the SUM): three
    # rows near the per-row cap push Σp² to ~1.9e19
    rows = [
        (10.0, 2.0e9, 0.05, 0.02),
        (20.0, 2.5e9, 0.06, 0.03),
        (30.0, 3.0e9, 0.04, 0.05),
    ]
    _pq(
        spark,
        tmp_path,
        "lineitem",
        rows,
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double",
    )
    out = q197_correlation_matrix(spark, str(tmp_path)).collect()[0]
    q_ = [round(r[0]) for r in rows]
    p_ = [round(r[1]) for r in rows]
    n = len(rows)
    pp = sum(x * x for x in p_)
    qp = sum(a * b for a, b in zip(q_, p_))
    sq, sp = sum(q_), sum(p_)
    qq = sum(x * x for x in q_)
    assert pp > 2**63 - 1
    num = float(n) * float(qp) - float(sq) * float(sp)
    den = (
        (float(n) * float(qq) - float(sq) * float(sq))
        * (float(n) * float(pp) - float(sp) * float(sp))
    ) ** 0.5
    assert out.r_qty_price == num / den


# --- Batch 3: timeseries arithmetic lifted to DECIMAL(38,0) ------------------


def test_q147_twap_survives_high_value_sparse_series(spark, tmp_path):
    """Σ(cents·dt) past int64 (bounded by max_cents·span, not rows):
    the decimal weighted sum lands on the Python-bigint TWAP chain."""
    from pinot_pulsar_plugin_spark.operators.timeseries import q147_twap

    day_us = 86_400_000_000
    # values ~5e9 dollars -> 5e11 cents; gaps ~11.6 days -> per-row
    # terms ~5e17 (int64-safe); four observations push the sum past it
    ts_us = [0, 10**15, 2 * 10**15, 3 * 10**15, 4 * 10**15]
    vals = [5.0e9, 6.0e9, 4.0e9, 7.0e9, 1.0]
    rows = [
        (i, "sensor", 1, t_, v) for i, (t_, v) in enumerate(zip(ts_us, vals))
    ]
    _write_events(spark, tmp_path, rows)
    out = q147_twap(spark, str(tmp_path)).collect()[0]
    cents = [round(v * 100) for v in vals]
    dts = [b - a for a, b in zip(ts_us, ts_us[1:])]
    wsum = sum(c * d for c, d in zip(cents, dts))
    span = sum(dts)
    assert wsum > 2**63 - 1
    assert out.n_obs == 4 and out.span_us == span
    assert out.twap == float(wsum) / float(span) / 100.0


def test_q150_slope_survives_100tb_daily_revenue(spark, tmp_path):
    """Per-day brand revenue ~1e14 cents: y², x·y and the ΣxΣy
    bracket all pass int64; the decimal chain lands on Python."""
    from pinot_pulsar_plugin_spark.operators.timeseries import (
        q150_trend_slope,
    )

    day_us = 86_400_000_000
    epoch_1995 = 9131  # days from 1970-01-01 to 1995-01-01
    days = [epoch_1995 + d for d in (10, 20, 30)]
    prices = [1.0e12, 2.0e12, 1.5e12]
    df = spark.createDataFrame(
        [(i + 1, i + 1, p, 0.0) for i, p in enumerate(prices)],
        "l_orderkey long, l_partkey long, l_extendedprice double, l_discount double",
    )
    m = F.create_map(
        *[
            x
            for k, d in zip((1, 2, 3), days)
            for x in (F.lit(k), F.lit(d))
        ]
    )
    df.withColumn(
        "l_shipdate", F.timestamp_micros(m[F.col("l_orderkey")] * day_us)
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    _pq(
        spark,
        tmp_path,
        "part",
        [(1, "B#1"), (2, "B#1"), (3, "B#1")],
        "p_partkey long, p_brand string",
    )
    out = q150_trend_slope(spark, str(tmp_path)).collect()[0]
    xs = [10, 20, 30]
    ys = [round(p * 100) for p in prices]
    n = 3
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    assert syy > 2**63 - 1
    num = float(n * sxy - sx * sy)
    den = float(n * sxx - sx * sx)
    assert out.slope_cents_per_day == num / den
    vary = float(n) * float(syy) - float(sy) * float(sy)
    assert out.r2 == (num * num) / (den * vary)


def test_q153_lag_corr_survives_100tb_daily_values(spark, tmp_path):
    """Two event types with ~5e11-cent days: all product sums pass
    int64 per row; r at lag 0 matches the Python double chain."""
    from pinot_pulsar_plugin_spark.operators.timeseries import (
        q153_lag_correlation,
    )

    day_us = 86_400_000_000
    a_vals = [5.0e9, 7.0e9, 6.0e9, 9.0e9]
    b_vals = [4.0e9, 6.5e9, 5.0e9, 8.0e9]
    rows = []
    for d, (av, bv) in enumerate(zip(a_vals, b_vals)):
        rows.append((2 * d, "alpha", 1, d * day_us + 1, av))
        rows.append((2 * d + 1, "beta", 2, d * day_us + 2, bv))
    _write_events(spark, tmp_path, rows)
    out = {r.lag: r for r in q153_lag_correlation(spark, str(tmp_path)).collect()}
    xs = [round(v * 100) for v in a_vals]
    ys = [round(v * 100) for v in b_vals]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    assert min(a * b for a, b in zip(xs, ys)) > 0
    assert sxx > 2**63 - 1  # per the pre-fix long sums
    num = float(n * sxy - sx * sy)
    den = (float(n * sxx - sx * sx) * float(n * syy - sy * sy)) ** 0.5
    assert out[0].n == n
    assert out[0].r == num / den


def test_q166_q181_q198_survive_100tb_cell_cents(spark, tmp_path):
    """(type, dow)/(type, day) cent sums past 9.2e12 reached the
    production way — many moderate events per day — so the seasonality
    chain's decimal products land on Python's nested floor divs while
    every intermediate quotient stays int64."""
    from pinot_pulsar_plugin_spark.operators.timeseries import (
        q166_weekday_seasonality,
        q181_seasonal_decomposition,
        q198_seasonal_anomalies,
    )

    day_us = 86_400_000_000
    n_days, per_day = 21, 10_000
    # every event of day d is worth (d+1)e7 dollars -> (d+1)e9 cents;
    # a day's sum is 1e13(d+1) — past the ·1e6 int64 cliff
    df = spark.range(n_days * per_day).select(
        F.col("id").alias("event_id"),
        F.lit("load").alias("event_type"),
        F.lit(1).alias("user_id"),
        F.timestamp_micros(
            F.expr(f"id div {per_day}") * day_us + F.pmod(F.col("id"), per_day)
        ).alias("ts"),
        ((F.expr(f"id div {per_day}") + 1) * 1.0e7).alias("value"),
        F.lit("{}").alias("props"),
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    day_cents = [per_day * (d + 1) * 10**9 for d in range(n_days)]
    assert max(day_cents) * 1_000_000 > 2**63 - 1

    from collections import defaultdict

    # q166: index_ppm per dow vs Python
    out166 = {
        r.dow: r for r in q166_weekday_seasonality(spark, str(tmp_path)).collect()
    }
    by_dow = defaultdict(list)
    for d, c in enumerate(day_cents):
        by_dow[(d + 3) % 7].extend([(d + 1) * 10**9] * per_day)
    tn, ts_ = n_days * per_day, sum(day_cents)
    for dow, cs in by_dow.items():
        avg_micro = sum(cs) * 1_000_000 // len(cs)
        exp = avg_micro * 1_000_000 // (ts_ * 1_000_000 // tn)
        assert out166[dow].index_ppm == exp, dow

    # q181: seasonal_ppm per weekday vs Python (7-day centered MA)
    out181 = {
        r.weekday: r
        for r in q181_seasonal_decomposition(spark, str(tmp_path)).collect()
    }
    ratios = defaultdict(list)
    for d in range(3, n_days - 3):
        trend = sum(day_cents[d - 3 : d + 4])
        ratios[(d + 3) % 7].append(day_cents[d] * 7_000_000 // trend)
    for wd, rs in ratios.items():
        assert out181[wd].seasonal_ppm == sum(rs) // len(rs), wd

    # q198 completes (its ratio rides the same decimal numerator)
    q198_seasonal_anomalies(spark, str(tmp_path)).collect()


# --- r11 second pass: exact.py wide accumulators, split hashes, products ---
#
# SCALING.md §7's registry-wide sweep (the q196-class audit extended to
# every module). Same two shapes as above: end-to-end where the regime
# is reachable from planted values/ids, expression-level on fabricated
# aggregate frames where the dangerous magnitudes are COUNT/SUM results.

SPLIT_MULT = 2654435761
SPLIT_MOD = 1 << 32


def test_exact_sum_wide_survives_fixed_grain_totals(spark):
    """The q01 class: d=4 fixed-point terms summing past int64. The
    wide accumulators land on the Python bigint value; plain
    exact_sum/exact_avg raise on the same frame."""
    from pinot_pulsar_plugin_spark.functions.exact import (
        exact_avg,
        exact_avg_wide,
        exact_sum,
        exact_sum_wide,
    )

    # integral doubles: ROUND(v·1e4) is exact on both engines, each
    # term ≈ 9.1e18 stays inside int64, the 3-term sum does not
    vals = [912_000_000_000_000.0, 905_000_000_000_000.0, 890_000_000_000_000.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    row = df.agg(
        exact_sum_wide(F.col("v"), "s"), exact_avg_wide(F.col("v"), "a")
    ).collect()[0]
    terms = [int(v) * 10_000 for v in vals]
    assert max(terms) < 2**63 - 1 and sum(terms) > 2**63 - 1
    assert row.s == float(sum(terms)) / 10_000.0
    assert row.a == float(sum(terms)) / float(len(vals)) / 10_000.0
    with pytest.raises(Exception, match="(?i)overflow"):
        df.agg(exact_sum(F.col("v"), "s")).collect()
    with pytest.raises(Exception, match="(?i)overflow"):
        df.agg(exact_avg(F.col("v"), "a")).collect()


def test_q01_pricing_summary_survives_100tb_magnitudes(spark, tmp_path):
    """The flagship end-to-end in its overflow regime: planted
    extendedprice magnitudes put the per-group d=4 sums past int64
    (the production way a 1e11-row fixed-grain group does); every
    aggregate lands on the Python-bigint-implied double."""
    import datetime

    from pinot_pulsar_plugin_spark.operators.relational import (
        q01_pricing_summary,
    )

    ship = datetime.datetime(1995, 6, 1)
    prices = [9.1e14, 9.05e14, 8.9e14]  # Σ ROUND(p·1e4) > int64
    rows = [
        ("R", "F", 10.0 * (i + 1), p, 0.0, 0.0, ship)
        for i, p in enumerate(prices)
    ]
    spark.createDataFrame(
        rows,
        "l_returnflag string, l_linestatus string, l_quantity double,"
        " l_extendedprice double, l_discount double, l_tax double,"
        " l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    out = q01_pricing_summary(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    terms = [int(p) * 10_000 for p in prices]
    assert sum(terms) > 2**63 - 1
    assert r.sum_base_price == float(sum(terms)) / 10_000.0
    assert r.avg_price == float(sum(terms)) / 3.0 / 10_000.0
    assert r.sum_qty == float(sum(int(10 * (i + 1)) * 10_000 for i in range(3))) / 10_000.0
    assert r.count_order == 3


def test_q133_promo_share_survives_100tb_magnitudes(spark, tmp_path):
    """Q14-shape global sums and the ppm numerator (sum·1e6) in their
    overflow regime, against Python bigints."""
    import datetime

    from pinot_pulsar_plugin_spark.operators.tpch_suite import (
        q133_promo_revenue_share,
    )

    ship = datetime.datetime(1997, 3, 15)
    li = [
        (1, 9.1e14, 0.0, ship),
        (2, 9.05e14, 0.0, ship),
        (1, 8.9e14, 0.0, ship),
    ]
    spark.createDataFrame(
        li,
        "l_partkey long, l_extendedprice double, l_discount double,"
        " l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, "PROMO"), (2, "STANDARD")], "p_partkey long, p_type string"
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))

    r = q133_promo_revenue_share(spark, str(tmp_path)).collect()[0]
    promo = (int(9.1e14) + int(8.9e14)) * 10_000
    tot = promo + int(9.05e14) * 10_000
    assert tot > 2**63 - 1
    assert r.promo_rev == float(promo) / 10_000.0
    assert r.total_rev == float(tot) / 10_000.0
    assert r.promo_ppm == promo * 1_000_000 // tot


def test_split_hash_sites_survive_snowflake_ids(spark, tmp_path):
    """The 2^32-modulus split hash (q74/q78/q80/q101): ring reduction
    is insufficient there, so the product runs in pure-long 16-bit
    limbs (functions/hashing.py::split_hash32). The real q74 lands
    every id in the bucket Python's exact arithmetic picks; the raw
    long multiply raises."""
    from pinot_pulsar_plugin_spark.operators.pipelines import q74_train_split

    ids = [10**12 + 7, 2**61 + 3, 4_000_000_001, 4_294_967_295, 5]
    spark.createDataFrame(
        [(i,) for i in ids], "doc_id long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {r.doc_id: (r.bucket, r.split) for r in q74_train_split(spark, str(tmp_path)).collect()}
    for i in ids:
        b = (i * SPLIT_MULT) % SPLIT_MOD % 1000
        exp = "train" if b < 800 else ("val" if b < 900 else "test")
        assert got[i] == (b, exp), i
    with pytest.raises(Exception, match="(?i)overflow"):
        spark.read.parquet(str(tmp_path / "documents.parquet")).select(
            (F.col("doc_id") * SPLIT_MULT).alias("boom")
        ).collect()


def test_q44_q95_prime_hash_sites_survive_snowflake_keys(spark, tmp_path):
    """The prime-modulus sites ring-reduce (the q86 rule): q44's ~10%
    sample keeps exactly the keys Python keeps; q95's PPS priority is
    the Python value for every snowflake doc id."""
    from pinot_pulsar_plugin_spark.operators.advanced import (
        q44_deterministic_sample,
    )
    from pinot_pulsar_plugin_spark.operators.curation import (
        _SP_MOD,
        _SP_MULT,
        q95_weighted_sample,
    )

    keys = [10**12 + k for k in range(40)] + [2**61 + 1, 3_470_000_001, 9]
    spark.createDataFrame(
        [(k, 100.0 + k % 7) for k in keys],
        "o_orderkey long, o_totalprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = {r.o_orderkey for r in q44_deterministic_sample(spark, str(tmp_path)).collect()}
    assert got == {k for k in keys if (k * 2654435761) % 100 < 10}

    docs = [(10**12 + d, "en", 50 + d) for d in range(6)] + [(2**62 + 11, "fr", 99)]
    spark.createDataFrame(
        docs, "doc_id long, lang string, n_chars int"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r.priority for r in q95_weighted_sample(spark, str(tmp_path)).collect()}
    for doc_id, _lang, n_chars in docs:
        u = (doc_id * _SP_MULT) % _SP_MOD + 1
        assert out[doc_id] == float(u) / float(n_chars), doc_id


def test_q171_bucket_ring_reduce_survives_snowflake_suppkeys(spark, tmp_path):
    """q171's skew-report bucket on huge supplier keys: runs, and each
    key hashes to Python's bucket."""
    from pinot_pulsar_plugin_spark.operators.maintenance import (
        _Q171_B,
        q171_shuffle_skew_report,
    )

    keys = [10**12 + 1, 2**61 + 5, 3_470_000_077, 13]
    spark.createDataFrame(
        [(k,) for k in keys for _ in range(2)], "l_suppkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = q171_shuffle_skew_report(spark, str(tmp_path)).collect()
    exp_buckets = {(k * 2654435761) % _Q171_B for k in keys}
    assert {r.bucket for r in out} <= exp_buckets and len(out) > 0


def test_count_product_lifts_match_python_bigints(spark):
    """Expression-level pins for the fabricated-frame sites (the q209
    precedent): t73's a·d−b·c, q110's n_x·n_y, q175/q195's Pareto
    cuts, q195's CV² bracket, and s57's wt² — each decimal form lands
    on the Python bigint value on magnitudes where the long form
    raises."""
    # t73: contingency counts at 1e12 doc scale
    a, b, c, d = 10**12, 3 * 10**11, 7 * 10**11, 10**12 + 17
    df = spark.createDataFrame([(a, b, c, d)], "a long, b long, c long, d long")
    got = df.select(
        (
            F.col("a").cast("decimal(38,0)") * F.col("d")
            - F.col("b").cast("decimal(38,0)") * F.col("c")
        ).cast("double").alias("diff")
    ).collect()[0].diff
    assert got == float(a * d - b * c)
    with pytest.raises(Exception, match="(?i)overflow"):
        df.select((F.col("a") * F.col("d")).alias("boom")).collect()

    # q110: marginal product at 1e10-customer scale
    nx, ny = 7 * 10**9, 6 * 10**9
    df2 = spark.createDataFrame([(nx, ny)], "n_x long, n_y long")
    got2 = df2.select(
        (F.col("n_x").cast("decimal(38,0)") * F.col("n_y"))
        .cast("double")
        .alias("p")
    ).collect()[0].p
    assert got2 == float(nx * ny)
    with pytest.raises(Exception, match="(?i)overflow"):
        df2.select((F.col("n_x") * F.col("n_y")).alias("boom")).collect()

    # q175/q195: Pareto cut on skewed type totals (~2e18 cents)
    cum, cents, tot = 2 * 10**18, 5 * 10**17, 2 * 10**18
    df3 = spark.createDataFrame(
        [(cum, cents, tot)], "cum long, cents long, tot long"
    )
    got3 = df3.select(
        (
            (F.col("cum") - F.col("cents")).cast("decimal(38,0)") * 100
            < F.col("tot").cast("decimal(38,0)") * 80
        ).alias("is_a")
    ).collect()[0].is_a
    assert got3 == ((cum - cents) * 100 < tot * 80)
    with pytest.raises(Exception, match="(?i)overflow"):
        df3.select(((F.col("cum") - F.col("cents")) * 100).alias("boom")).collect()

    # q195: CV² bracket on a hot part (qt² > int64)
    from decimal import Decimal

    mm, sq, qt = 84, 10**19 // 84 * 84, 25 * 10**9
    df4 = spark.createDataFrame(
        [(mm, Decimal(sq), qt)], "mm long, sq decimal(38,0), qt long"
    )
    got4 = df4.select(
        F.expr(
            "(mm * sq - CAST(qt AS DECIMAL(38,0)) * qt) * 1000"
            " div (CAST(qt AS DECIMAL(38,0)) * qt)"
        ).alias("cv2")
    ).collect()[0].cv2
    assert got4 == (mm * sq - qt * qt) * 1000 // (qt * qt)
    with pytest.raises(Exception, match="(?i)overflow"):
        df4.select((F.col("qt") * F.col("qt")).alias("boom")).collect()

    # s57: wt² sums at common-term/long-document scale
    wts = [2_800_000_000, 2_700_000_000, 2_600_000_000]
    df5 = spark.createDataFrame([(w,) for w in wts], "wt long")
    got5 = df5.agg(
        F.sum(F.col("wt").cast("decimal(38,0)") * F.col("wt")).alias("n2")
    ).collect()[0].n2
    assert int(got5) == sum(w * w for w in wts)
    with pytest.raises(Exception, match="(?i)overflow"):
        df5.agg(F.sum(F.col("wt") * F.col("wt")).alias("boom")).collect()


def test_wide_accumulators_match_long_forms_on_random_frames(spark):
    """Within the long form's own domain the wide accumulators are
    IDENTICAL (not just overflow-safe): random magnitudes, signs,
    nulls, and group sizes, exact equality on sums and avgs."""
    import random

    from pinot_pulsar_plugin_spark.functions.exact import (
        exact_avg,
        exact_avg_wide,
        exact_sum,
        exact_sum_wide,
    )

    for seed in (11, 1213, 990017):
        rng = random.Random(seed)
        rows = []
        for _ in range(300):
            g = rng.choice("abc")
            if rng.random() < 0.1:
                rows.append((g, None))
            else:
                mag = 10 ** rng.randint(0, 9)
                rows.append((g, rng.uniform(-mag, mag)))
        df = spark.createDataFrame(rows, "g string, v double")
        got = {
            r.g: r
            for r in df.groupBy("g")
            .agg(
                exact_sum(F.col("v"), "s_long"),
                exact_sum_wide(F.col("v"), "s_wide"),
                exact_avg(F.col("v"), "a_long"),
                exact_avg_wide(F.col("v"), "a_wide"),
                exact_sum(F.col("v"), "s2_long", 2),
                exact_sum_wide(F.col("v"), "s2_wide", 2),
            )
            .collect()
        }
        for g, r in got.items():
            assert r.s_long == r.s_wide, (seed, g)
            assert r.a_long == r.a_wide, (seed, g)
            assert r.s2_long == r.s2_wide, (seed, g)


def test_split_hash32_matches_python_on_random_keys(spark):
    """functions/hashing.py::split_hash32 ≡ (k·KNUTH) mod 2^32 for
    random 63-bit keys, checked against Python bigints in bulk."""
    import random

    from pinot_pulsar_plugin_spark.functions.hashing import (
        knuth_bucket,
        split_hash32,
    )

    rng = random.Random(20260816)
    keys = [rng.randrange(0, 2**63) for _ in range(1000)] + [
        0, 1, 2**32 - 1, 2**32, 2**63 - 1
    ]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r.k: (r.h32, r.b)
        for r in df.select(
            "k",
            split_hash32(F.col("k")).alias("h32"),
            knuth_bucket(F.col("k"), 1000003).alias("b"),
        ).collect()
    }
    for k in keys:
        assert got[k][0] == (k * SPLIT_MULT) % (1 << 32), k
        assert got[k][1] == (k * SPLIT_MULT) % 1000003, k


def test_q83_zscore_survives_hot_key_history(spark, tmp_path):
    """q83's running Σv² in its overflow regime: planted magnitudes
    put the window sum past int64 within one user's history (the
    production way a ~3.7e9-event bot does); every z matches the
    Python-bigint-exact double chain, and the long-form window sum
    raises on the same table."""
    from pinot_pulsar_plugin_spark.operators.timeseries import (
        q83_running_zscore,
    )

    # the production way into the regime: MANY moderate events (per-row
    # v² stays long-safe; only the accumulation crosses int64)
    import random

    rng = random.Random(83)
    vals = [float(rng.randrange(20_000_000, 29_000_001)) for _ in range(500)]
    df = spark.createDataFrame(
        [(i, "click", 7, float(x)) for i, x in enumerate(vals)],
        "event_id long, event_type string, user_id long, value double",
    ).select(
        "event_id",
        "event_type",
        "user_id",
        F.timestamp_micros(F.col("event_id") * 1_000_000 + 1).alias("ts"),
        "value",
        F.lit("{}").alias("props"),
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    vs = [int(x) * 100 for x in vals]
    assert max(v * v for v in vs) < 2**63 - 1  # per-row product: safe
    assert sum(v * v for v in vs) > 2**63 - 1  # the long SUM's cliff
    out = {r.event_id: r for r in q83_running_zscore(spark, str(tmp_path)).collect()}
    s1i = s2i = 0
    for i, v in enumerate(vs):
        s1i += v
        s2i += v * v
        n = i + 1
        s1, s2 = float(s1i), float(s2i)
        var = (s2 - s1 * s1 / n) / n
        exp = (
            round((v - s1 / n) / var**0.5, 6) if n >= 5 and var > 0 else None
        )
        got = out[i].z
        assert (got == exp) or (got is None and exp is None), (i, got, exp)
    with pytest.raises(Exception, match="(?i)overflow"):
        from pyspark.sql import Window as W

        w = (
            W.partitionBy("user_id")
            .orderBy("ts_us", "event_id")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        spark.read.parquet(str(tmp_path / "events.parquet")).select(
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("v"),
        ).select(
            F.sum(F.col("v") * F.col("v")).over(w).alias("boom")
        ).collect()


def test_streaming_zscore_bracket_survives_large_c1():
    """The streaming twin's variance bracket (streaming/anomaly.py
    _moments_pass) on state where c1 > 3e9: numpy's int64 c1·c1 WRAPS
    SILENTLY there (no ANSI net in pandas land) — the float64 bracket
    returns exactly the batch twin's double chain. Unit-level against
    the shared function, the same one transformWithStateInPandas
    rides."""
    import numpy as np
    import pandas as pd

    from pinot_pulsar_plugin_spark.streaming.anomaly import _moments_pass

    n0, s1_0, s2_0 = 100_000, 5_000_000_000, 260_000_000_000_000
    assert s1_0 * s1_0 > 2**63 - 1  # the silent-wrap regime
    assert np.int64(s1_0) * np.int64(s1_0) != s1_0 * s1_0  # wraps
    chunk = pd.DataFrame(
        {
            "ts_us": [10, 20, 30],
            "event_id": [1, 2, 3],
            "v": [52_000, 49_000, 51_500],
        }
    )
    frame, (n, s1, s2) = _moments_pass((7,), [chunk], n0, s1_0, s2_0)
    assert (n, s1, s2) == (
        n0 + 3,
        s1_0 + 152_500,
        s2_0 + 52_000**2 + 49_000**2 + 51_500**2,
    )
    for i, v in enumerate([52_000, 49_000, 51_500]):
        cn = n0 + i + 1
        c1 = s1_0 + sum([52_000, 49_000, 51_500][: i + 1])
        c2 = s2_0 + sum(x * x for x in [52_000, 49_000, 51_500][: i + 1])
        var = (float(c2) - float(c1) * float(c1) / float(cn)) / float(cn)
        exp_z = round((v - c1 / cn) / var**0.5, 6)
        assert frame.iloc[i]["z"] == exp_z, i


def test_streaming_zscore_state_cliff_fails_loudly():
    """ADVICE r11: the int64 running state (s2 + cumsum(v*v)) used to
    wrap SILENTLY past its documented ~9.2e18 cliff — a wrong-answer
    class with no runtime signal. The guard in _moments_pass must now
    raise OverflowError in both regimes: (a) a per-event v whose
    square passes int64, and (b) accumulated state crossing the cliff
    mid-batch. Normal-magnitude data must keep flowing untouched."""
    import pandas as pd
    import pytest

    from pinot_pulsar_plugin_spark.streaming.anomaly import _moments_pass

    # (a) |v| past the exact-square bound: v*v wraps per-element
    big_v = pd.DataFrame(
        {"ts_us": [10], "event_id": [1], "v": [3_100_000_000]}
    )
    with pytest.raises(OverflowError, match="exact-int64 square"):
        _moments_pass((1,), [big_v], 0, 0, 0)

    # (b) state one increment below the cliff: the next v*v wraps the
    # running chain — the monotonicity scan must catch it
    near_cliff = (2**63 - 1) - 10
    chunk = pd.DataFrame(
        {"ts_us": [10, 20], "event_id": [1, 2], "v": [50_000, 51_000]}
    )
    with pytest.raises(OverflowError, match="state cliff"):
        _moments_pass((1,), [chunk], 1_000_000, 50_000_000, near_cliff)

    # (b') ADVICE r12: wrap on the SECOND increment — c2[0] stays valid
    # so only the elementwise monotonicity scan can see it. np.diff's
    # wrapping subtraction recovered the positive increment here and
    # let the corrupted (negative) state through silently.
    below_cliff = 9_000_000_000_000_000_000
    chunk2 = pd.DataFrame(
        {
            "ts_us": [10, 20],
            "event_id": [1, 2],
            "v": [316_227_766, 600_000_000],
        }
    )
    assert below_cliff + 316_227_766**2 < 2**63  # first step valid
    assert below_cliff + 316_227_766**2 + 600_000_000**2 >= 2**63  # wraps
    with pytest.raises(OverflowError, match="state cliff"):
        _moments_pass((1,), [chunk2], 1_000_000, 50_000_000, below_cliff)

    # (a') ADVICE r12: v == int64 min — np.abs wraps (|-2^63| → -2^63)
    # so the old abs-based bound passed it and v*v evaluated to 0. The
    # both-ends check must reject it as out of the exact-square domain.
    int64_min = pd.DataFrame(
        {"ts_us": [10], "event_id": [1], "v": [-(2**63)]}
    )
    with pytest.raises(OverflowError, match="exact-int64 square"):
        _moments_pass((1,), [int64_min], 0, 0, 0)

    # sanity: typical magnitudes pass through and update state exactly
    frame, (n, s1, s2) = _moments_pass((1,), [chunk], 10, 500_000, 2**40)
    assert (n, s1, s2) == (12, 601_000, 2**40 + 50_000**2 + 51_000**2)
    assert len(frame) == 2


def test_r12_gate_lifts_match_python_bigints(spark):
    """Expression-level pins for the three sites the r12 MECHANICAL
    overflow gate (tools_overflowaudit.py) flagged out of the r11
    manual sweep's "documented, not guarded" bucket: q140's cum·n ECDF
    cross products, t84's Σtf² + VMR bracket, and t79's maxid·k
    milestone product. Each lifted form lands on the Python-bigint
    value on magnitudes where the long form raises."""
    from decimal import Decimal

    # q140: ECDF cross products at 1e12-events-per-type scale
    ce, cl, ne, nl = 4 * 10**11, 9 * 10**11, 5 * 10**11, 5 * 10**11 + 7
    df = spark.createDataFrame(
        [(ce, cl, ne, nl)], "ce long, cl long, ne long, nl long"
    )
    got = df.select(
        F.abs(
            F.col("ce").cast("decimal(38,0)") * F.col("nl")
            - F.col("cl").cast("decimal(38,0)") * F.col("ne")
        )
        .cast("double")
        .alias("d_num")
    ).collect()[0].d_num
    assert got == float(abs(ce * nl - cl * ne))
    with pytest.raises(Exception, match="(?i)overflow"):
        df.select((F.col("ce") * F.col("nl")).alias("boom")).collect()

    # t84: Σtf² for a head term (tf ~1e4 over ~1e11 docs) via the wide
    # accumulator, then the DECIMAL VMR bracket; quotient stays BIGINT
    from pinot_pulsar_plugin_spark.functions.exact import wide_fp_total

    fs = [9_999, 9_998, 9_997, 5]
    reps = 40_000  # Σf² ≈ 1.2e13 here; the BOUND check is the decimal bracket
    tf = spark.createDataFrame(
        [(f,) for f in fs * reps], "f long"
    )
    sq_got = tf.agg(wide_fp_total(F.col("f") * F.col("f")).alias("sq")).collect()[
        0
    ].sq
    assert int(sq_got) == sum(f * f for f in fs) * reps
    n_docs, sq, tf_total = 10**12, 97 * 10**17, 4 * 10**13
    df2 = spark.createDataFrame(
        [(n_docs, Decimal(sq), tf_total)],
        "n_docs long, sq decimal(38,0), tf_total long",
    )
    got2 = df2.select(
        F.expr(
            "cast((cast(n_docs as decimal(38,0)) * sq"
            " - cast(tf_total as decimal(38,0)) * tf_total) * 1000"
            " div (cast(n_docs as decimal(38,0)) * tf_total) as bigint)"
        ).alias("vmr_milli")
    ).collect()[0].vmr_milli
    assert got2 == (n_docs * sq - tf_total * tf_total) * 1000 // (
        n_docs * tf_total
    )
    with pytest.raises(Exception, match="(?i)overflow"):
        df2.select((F.col("tf_total") * F.col("tf_total")).alias("boom")).collect()

    # t79: milestone product on a snowflake-scale max doc id
    maxid = 2**62 + 12345
    df3 = spark.createDataFrame([(maxid, 7)], "maxid long, k long")
    got3 = df3.select(
        F.expr("cast(maxid as decimal(38,0)) * k div 10").alias("m")
    ).collect()[0].m
    assert got3 == maxid * 7 // 10
    with pytest.raises(Exception, match="(?i)overflow"):
        df3.select((F.col("maxid") * F.col("k")).alias("boom")).collect()
