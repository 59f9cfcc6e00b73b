

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


def test_q146_bitmap_distinct_is_exact_incl_bit63(spark, tmp_path):
    """The bitmap aggregate must equal COUNT(DISTINCT) exactly — on
    the real corpus AND on a constructed id set that exercises bit 63
    (ids 63, 127: the signed-MIN word bit) and multi-word sharding."""
    from pyspark.sql import functions as F

    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q146_bitmap_distinct,
    )
    from pinot_pulsar_plugin_spark.catalog import load_table

    sf = "/root/testdata/sf0.01"
    got = {
        r.event_type: r.distinct_users
        for r in q146_bitmap_distinct(spark, sf).collect()
    }
    want = {
        r.event_type: r.n
        for r in load_table(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want

    ids = [0, 1, 63, 63, 64, 127, 128, 200, 200, 201]
    spark.createDataFrame(
        [(i, uid, "t") for i, uid in enumerate(ids)],
        "event_id long, user_id long, event_type string",
    ).select(
        "event_id",
        F.timestamp_micros(F.lit(1) + F.col("event_id")).alias("ts"),
        "user_id",
        "event_type",
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    ).write.parquet(str(tmp_path / "events.parquet"))
    rows = q146_bitmap_distinct(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0].distinct_users == len(set(ids)) == 8
    assert rows[0].n_words == 4  # words 0, 1, 2, 3


def test_q151_sliding_distinct_window_membership(spark, tmp_path):
    """User 1 active on day 0, user 2 on day 3: day-3 window sees both,
    day 7 has fallen past user 1 (0 + 6 < 7) but still holds user 2,
    day 10 only trails user 2's activity (n_today 0)."""
    import datetime

    from pinot_pulsar_plugin_spark.operators.timeseries import q151_sliding_distinct

    def ts(day):
        return datetime.datetime(1970, 1, 1) + datetime.timedelta(days=day)

    rows = [(1, ts(0), 1, "click", 1.0, "{}"), (2, ts(3), 2, "click", 1.0, "{}")]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))

    got = {
        r.wday: (r.n_users_7d, r.n_today)
        for r in q151_sliding_distinct(spark, str(tmp_path)).collect()
    }
    assert got == {
        0: (1, 1), 1: (1, 0), 2: (1, 0),
        3: (2, 1), 4: (2, 0), 5: (2, 0), 6: (2, 0),
        7: (1, 0), 8: (1, 0), 9: (1, 0),
    }


def test_q177_hhi_and_cr4_known_market(spark, tmp_path):
    """One type, four suppliers with shares 50/30/15/5 (%): HHI =
    2500+900+225+25 = 3650 points exactly (ppm shares are exact here);
    CR4 = 100% with only four suppliers; a monopoly type scores
    10000 points."""
    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q177_market_concentration,
    )

    lines = [
        (1, 1, 50.0, 0.0), (2, 2, 30.0, 0.0), (3, 3, 15.0, 0.0),
        (4, 4, 5.0, 0.0),
        (5, 9, 42.0, 0.0),   # part 5 -> type M, single supplier
    ]
    spark.createDataFrame(
        lines,
        "l_partkey long, l_suppkey long, l_extendedprice double, "
        "l_discount double",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(k, "T") for k in range(1, 5)] + [(5, "M")],
        "p_partkey long, p_type string",
    ).write.parquet(str(tmp_path / "part.parquet"))

    got = {
        r.p_type: (r.n_suppliers, r.hhi_points, r.cr4_ppm)
        for r in q177_market_concentration(spark, str(tmp_path)).collect()
    }
    assert got == {"T": (4, 3650.0, 1000000), "M": (1, 10000.0, 1000000)}


def test_q179_topn_election_ties_and_others(spark, tmp_path):
    """Six brands with totals 10/20/30/30/50/67 (B3 and B4 tie at 30,
    broken by brand name): top-5 = B6,B5,B3,B4,B2; only B1 collapses
    into OTHERS, in both months it appears in."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q179_topn_others_rollup,
    )

    m0 = dt.datetime(1970, 1, 2)     # month_bucket 0
    m1 = dt.datetime(1970, 2, 15)    # day 45 -> month_bucket 1
    lines = [
        (1, 10.0, m0), (2, 20.0, m0), (3, 30.0, m0), (4, 30.0, m0),
        (5, 50.0, m0), (6, 60.0, m0),
        (1, 5.0, m1), (6, 7.0, m1),
    ]
    spark.createDataFrame(
        [(pk, pr, 0.0, ts) for pk, pr, ts in lines],
        "l_partkey long, l_extendedprice double, l_discount double, "
        "l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(k, f"B{k}") for k in range(1, 7)], "p_partkey long, p_brand string"
    ).write.parquet(str(tmp_path / "part.parquet"))

    got = {
        (r.month_bucket, r.series): r.revenue
        for r in q179_topn_others_rollup(spark, str(tmp_path)).collect()
    }
    assert got == {
        (0, "B6"): 60.0, (0, "B5"): 50.0, (0, "B4"): 30.0,
        (0, "B3"): 30.0, (0, "B2"): 20.0, (0, "OTHERS"): 10.0,
        (1, "B6"): 7.0, (1, "OTHERS"): 5.0,
    }


def test_q180_sweep_halfopen_and_carry_in(spark, tmp_path):
    """Intervals [Jan2,Jan6) [Jan3,Jan4) [Jan4,Feb5) [Feb10,Feb12):
    the Jan4 end fires BEFORE the Jan4 start (half-open), so bucket-0
    peaks at 2 (first attained Jan3), and bucket 1 needs the +1
    carry-in from bucket 0 for its Feb10 peak of 1 (without the carry
    the Feb5 end would drag it to 0). A zero-length order is dropped;
    MAX-shipdate (not any-shipdate) closes the interval."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.timeseries import (
        q180_max_concurrency,
    )

    d = lambda n: dt.datetime(1970, 1, 1) + dt.timedelta(days=n)
    spark.createDataFrame(
        [(1, d(1)), (2, d(2)), (3, d(3)), (4, d(40)), (5, d(9))],
        "o_orderkey long, o_orderdate timestamp",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        # order 1 has two lines -> interval closes at the MAX (day 5)
        [(1, d(2)), (1, d(5)), (2, d(3)), (3, d(35)), (4, d(42)),
         (5, d(9))],  # order 5: e == s -> zero-length, excluded
        "l_orderkey long, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))

    us = 86_400_000_000
    got = {
        r.month_bucket: (r.max_open, r.at_ts_us)
        for r in q180_max_concurrency(spark, str(tmp_path)).collect()
    }
    assert got == {0: (2, 2 * us), 1: (1, 40 * us)}


def test_q181_seasonal_ratio_to_ma(spark, tmp_path):
    """14 flat days of 7.00 with a 2x spike on day 6: ratios are exact
    ppm integer divisions of the centered 7-day window sums; only days
    3..10 (full windows) contribute; weekday = (day+3)%7; weekday 6
    averages its two observations with floor division. Day 0 arrives
    as two events (3.00 + 4.00) to pin the daily pre-aggregation."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.timeseries import (
        q181_seasonal_decomposition,
    )

    base = dt.datetime(1970, 1, 1)
    rows = [(base, "T", 3.0), (base, "T", 4.0)]
    for d in range(1, 14):
        rows.append((base + dt.timedelta(days=d), "T", 14.0 if d == 6 else 7.0))
    spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double"
    ).write.parquet(str(tmp_path / "events.parquet"))

    got = {
        r.weekday: (r.seasonal_ppm, r.n_obs)
        for r in q181_seasonal_decomposition(spark, str(tmp_path)).collect()
    }
    assert got == {
        0: (875000, 1), 1: (875000, 1), 2: (1750000, 1), 3: (875000, 1),
        4: (875000, 1), 5: (875000, 1), 6: (937500, 2),
    }


def test_q182_relaxation_prefers_strong_edges(spark, tmp_path):
    """Two routes from seed supplier 7 to customer 100: the direct
    1-order edge costs 1e9, while the 3-edge route through c200 and
    supplier 9 (250M + 200M + 500M = 950M) is cheaper despite the
    extra hops — Bellman-Ford must prefer it. Supplier 3 stays
    unreachable; node kinds and counts pin the reachable set."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.pipelines import (
        q182_cheapest_path_cost,
    )

    ts = dt.datetime(1995, 1, 1)
    # orders: key -> customer; lineitem links order -> supplier
    orders, lines = [], []
    ok = 0
    def link(cust, supp, n_orders):
        nonlocal ok
        for _ in range(n_orders):
            ok += 1
            orders.append((ok, cust, ts))
            lines.append((ok, supp))
    link(100, 7, 1)    # seed s7 -- c100: weight 1e9
    link(200, 7, 4)    # seed s7 -- c200: weight 250e6
    link(200, 9, 5)    # c200 -- s9:      weight 200e6
    link(100, 9, 2)    # s9 -- c100:      weight 500e6
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lines, "l_orderkey long, l_suppkey long"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(7,), (9,), (3,)], "s_suppkey long"  # only 7 seeds (7 % 7 = 0)
    ).write.parquet(str(tmp_path / "supplier.parquet"))

    got = {
        r.node_kind: (r.n_reached, r.min_cost, r.max_cost, r.total_cost)
        for r in q182_cheapest_path_cost(spark, str(tmp_path)).collect()
    }
    # suppliers: s7 at 0; s9 via c200 at 450M (not via c100 at 1.5e9)
    # customers: c200 at 250M; c100 at min(1e9 direct, 950M via s9) = 950M
    assert got == {
        "supplier": (2, 0, 450_000_000, 450_000_000),
        "customer": (2, 250_000_000, 950_000_000, 1_200_000_000),
    }


def test_q183_business_day_closed_form(spark, tmp_path):
    """Friday->Monday spans a weekend: 1 business day, not 3; a
    Thursday->Friday same-week lag is 1; a full 2-week span is 10.
    Epoch day 0 (1970-01-01) is a Thursday."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.scalars import (
        q183_business_day_lag,
    )

    d = lambda n: dt.datetime(1970, 1, 1) + dt.timedelta(days=n)
    # day 0 Thu, 1 Fri, 2 Sat, 3 Sun, 4 Mon
    orders = [
        (1, "A", d(1)),   # Fri -> Mon: 1 business day (Fri counted)
        (2, "A", d(0)),   # Thu -> Fri: 1
        (3, "B", d(0)),   # Thu -> Thu+14: 10
    ]
    lines = [(1, d(4)), (2, d(1)), (3, d(14)), (3, d(20))]  # min wins
    spark.createDataFrame(
        orders, "o_orderkey long, o_orderpriority string, o_orderdate timestamp"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lines, "l_orderkey long, l_shipdate timestamp"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))

    got = {
        r.o_orderpriority: (r.n_orders, r.avg_lag_milli, r.max_lag_bd)
        for r in q183_business_day_lag(spark, str(tmp_path)).collect()
    }
    assert got == {"A": (2, 1000, 1), "B": (1, 10000, 10)}


def test_q184_bridge_decomposition(spark, tmp_path):
    """Four customers across two months: A expands (+50), B churns
    (-200), C is new (+300), D is flat (no bucket, no count); month 0
    books everyone as new; the phantom month after the last observed
    one is cut."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q184_revenue_bridge,
    )

    m0, m1 = dt.datetime(1970, 1, 5), dt.datetime(1970, 2, 10)
    orders = [
        (1, 10, 1.00, m0), (2, 10, 1.50, m1),         # A: 100 -> 150
        (3, 20, 2.00, m0),                            # B: 200 -> gone
        (4, 30, 3.00, m1),                            # C: new 300
        (5, 40, 0.50, m0), (6, 40, 0.50, m1),         # D: flat 50
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp",
    ).write.parquet(str(tmp_path / "orders.parquet"))

    got = {
        r.month_bucket: (
            r.new_cents, r.churned_cents, r.expansion_cents,
            r.contraction_cents, r.n_new, r.n_churned,
        )
        for r in q184_revenue_bridge(spark, str(tmp_path)).collect()
    }
    assert got == {
        0: (350, 0, 0, 0, 3, 0),
        1: (300, -200, 50, 0, 1, 1),
    }
    # bridge identity: components reconcile to the net movement
    m0_total, m1_total = 350, 500
    n, c, e, k = got[1][:4]
    assert m0_total + n + c + e + k == m1_total


def test_q185_backtest_hand_series(spark, tmp_path):
    """Monthly cents 100/200/400/300: naive-1 scores months 1-3
    (AE 100,200,100 -> MAE 133333 milli); MA-3 scores only month 3
    (fc = 700//3 = 233, AE 67); APE floors per month before the mean."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q185_forecast_backtest,
    )

    base = dt.datetime(1970, 1, 2)
    months = {0: 1.00, 1: 2.00, 2: 4.00, 3: 3.00}
    spark.createDataFrame(
        [(m, v, base + dt.timedelta(days=30 * m)) for m, v in months.items()],
        "o_orderkey long, o_totalprice double, o_orderdate timestamp",
    ).write.parquet(str(tmp_path / "orders.parquet"))

    got = {
        r.method: (r.n_backtests, r.sum_abs_err_cents, r.mae_cents, r.mape_ppm)
        for r in q185_forecast_backtest(spark, str(tmp_path)).collect()
    }
    # naive: m1 |200-100|=100 ape 500000; m2 |400-200|=200 ape 500000;
    #        m3 |300-400|=100 ape 333333
    naive_mape = (500000 + 500000 + 333333) // 3
    # ma3: m3 fc=(100+200+400)//3=233, ae=67, ape=67*1e6//300=223333
    assert got == {
        "naive_1": (3, 400, 400 // 3, naive_mape),
        "ma_3": (1, 67, 67, 223333),
    }


def test_q186_division_count_match(spark, tmp_path):
    """Priorities {H,M,L}: customer 1 covers all three (complete),
    customer 2 covers two, customer 3 one (same nation as 1);
    per-nation ppm shares are exact floors."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q186_relational_division,
    )

    ts = dt.datetime(1995, 6, 1)
    orders = [
        (1, 1, "H", ts), (2, 1, "M", ts), (3, 1, "L", ts),
        (4, 2, "H", ts), (5, 2, "M", ts),
        (6, 3, "L", ts),
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderpriority string, "
        "o_orderdate timestamp",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, 10), (2, 20), (3, 10)], "c_custkey long, c_nationkey int"
    ).write.parquet(str(tmp_path / "customer.parquet"))

    got = {
        r.nationkey: (r.n_active_customers, r.n_complete, r.complete_ppm)
        for r in q186_relational_division(spark, str(tmp_path)).collect()
    }
    assert got == {10: (2, 1, 500000), 20: (1, 0, 0)}


def test_q187_shares_reconcile(spark, tmp_path):
    """Two regions, three nations, hand-set revenues: nation shares
    floor-divide against their region's exact sum, regions against the
    total; children reconcile to parents by construction."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q187_percent_of_parent,
    )

    ts = dt.datetime(1995, 1, 1)
    # nation 1,2 in region 10 (rev 100, 300); nation 3 in region 20 (600)
    spark.createDataFrame(
        [(1, 1, 1.00, ts), (2, 2, 3.00, ts), (3, 3, 6.00, ts)],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "c_custkey long, c_nationkey int"
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(1, "N1", 10), (2, "N2", 10), (3, "N3", 20)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).write.parquet(str(tmp_path / "nation.parquet"))
    spark.createDataFrame(
        [(10, "R1"), (20, "R2")], "r_regionkey int, r_name string"
    ).write.parquet(str(tmp_path / "region.parquet"))

    got = {
        r.nation: (r.nation_cents, r.share_of_region_ppm,
                   r.region_share_of_total_ppm)
        for r in q187_percent_of_parent(spark, str(tmp_path)).collect()
    }
    assert got == {
        "N1": (100, 250000, 400000),
        "N2": (300, 750000, 400000),
        "N3": (600, 1000000, 600000),
    }


def test_q188_blocking_and_window(spark, tmp_path):
    """Same customer, same cents, 3 days apart -> flagged; 9 days
    apart -> not; same amount different customer -> not; different
    cents same customer -> not. Pair orientation dedups on key order."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q188_duplicate_payments,
    )

    d = lambda n: dt.datetime(1970, 1, 1) + dt.timedelta(days=n)
    orders = [
        (1, 1, 9.99, d(0)), (2, 1, 9.99, d(3)),    # dup pair, gap 3
        (3, 1, 9.99, d(12)),                       # 9 > 7 from #2, 12 from #1
        (4, 2, 9.99, d(0)),                        # other customer
        (5, 1, 5.00, d(1)),                        # other amount
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp",
    ).write.parquet(str(tmp_path / "orders.parquet"))

    rows = q188_duplicate_payments(spark, str(tmp_path)).collect()
    assert [(r.custkey, r.cents, r.order_a, r.order_b, r.day_gap)
            for r in rows] == [(1, 999, 1, 2, 3)]


def test_q190_bounce_sessions(spark, tmp_path):
    """User 1: events at t0,t0+10m (one session, entry 'land', depth
    2), then t0+2h alone (bounce, entry 'solo'). User 2: one event
    (bounce, entry 'land'). Rates: land 1/2 bounces, solo 1/1."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.eventanalytics import (
        q190_bounce_rate,
    )

    t0 = dt.datetime(1995, 1, 1, 12, 0, 0)
    mins = lambda m: t0 + dt.timedelta(minutes=m)
    rows = [
        (1, 1, "land", mins(0)),
        (2, 1, "click", mins(10)),      # same session (gap 10m)
        (3, 1, "solo", mins(130)),      # new session (gap 120m)
        (4, 2, "land", mins(5)),
    ]
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    ).write.parquet(str(tmp_path / "events.parquet"))

    got = {
        r.entry_type: (r.n_sessions, r.n_bounces, r.bounce_ppm, r.depth_milli)
        for r in q190_bounce_rate(spark, str(tmp_path)).collect()
    }
    assert got == {
        "land": (2, 1, 500000, 1500),
        "solo": (1, 1, 1000000, 1000),
    }


def test_q191_conformance_verdicts(spark, tmp_path):
    """User journey view->click->purchase->purchase: the purchase->
    purchase hop is OFF-model (purchase may only return to view);
    view->click and click->purchase are legal. Counts and ppm are
    exact."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.eventanalytics import (
        q191_conformance_audit,
    )

    t0 = dt.datetime(1995, 1, 1)
    rows = [
        (1, 1, "view", t0),
        (2, 1, "click", t0 + dt.timedelta(minutes=1)),
        (3, 1, "purchase", t0 + dt.timedelta(minutes=2)),
        (4, 1, "purchase", t0 + dt.timedelta(minutes=3)),
        (5, 2, "view", t0),
        (6, 2, "view", t0 + dt.timedelta(minutes=1)),
    ]
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    ).write.parquet(str(tmp_path / "events.parquet"))

    got = {
        r.prev_type: (r.n_transitions, r.n_illegal, r.illegal_ppm)
        for r in q191_conformance_audit(spark, str(tmp_path)).collect()
    }
    assert got == {
        "view": (2, 0, 0),          # view->click, view->view
        "click": (1, 0, 0),         # click->purchase
        "purchase": (1, 1, 1000000),  # purchase->purchase illegal
    }


def test_q192_leaderboard_diff(spark, tmp_path):
    """Three brands, K=10 so all rank; B1 dominates half 1, B3 enters
    only in half 2 (NULL rank_h1), B1 exits half 2 (NULL rank_h2);
    the midpoint splits days [0, 10] at 5."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.aggregates2 import q192_topk_drift

    d = lambda n: dt.datetime(1970, 1, 1) + dt.timedelta(days=n)
    # (partkey, price, day): half1 days 0-4, half2 days 5-10
    lines = [
        (1, 100.0, 0), (1, 50.0, 2),    # B1: 150 in h1 only
        (2, 60.0, 1), (2, 40.0, 8),     # B2: 60 h1, 40 h2
        (3, 90.0, 9),                   # B3: h2 only
    ]
    spark.createDataFrame(
        [(pk, pr, 0.0, d(dy)) for pk, pr, dy in lines],
        "l_partkey long, l_extendedprice double, l_discount double, "
        "l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(k, f"B{k}") for k in (1, 2, 3)], "p_partkey long, p_brand string"
    ).write.parquet(str(tmp_path / "part.parquet"))

    got = {
        r.brand: (r.rank_h1, r.rank_h2, r.rev_fp_h1, r.rev_fp_h2)
        for r in q192_topk_drift(spark, str(tmp_path)).collect()
    }
    assert got == {
        "B1": (1, None, 1_500_000, None),
        "B2": (2, 2, 600_000, 400_000),
        "B3": (None, 1, None, 900_000),
    }


def test_q194_tier_matrix(spark, tmp_path):
    """Customer A upgrades T1->T2, B churns from T2, C is new into T1,
    D stays T1; band edges are integer cents (exactly $100 is T2)."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q194_tier_migration,
    )

    d = lambda n: dt.datetime(1970, 1, 1) + dt.timedelta(days=n)
    # midpoint of days [0, 10] is 5: h1 = days < 5
    orders = [
        (1, 10, 50.0, d(0)), (2, 10, 100.0, d(8)),    # A: T1 -> T2 (=\$100)
        (3, 20, 500.0, d(1)),                         # B: T2 -> CHURNED
        (4, 30, 20.0, d(9)),                          # C: NEW -> T1
        (5, 40, 10.0, d(2)), (6, 40, 15.0, d(7)),     # D: T1 -> T1
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp",
    ).write.parquet(str(tmp_path / "orders.parquet"))

    got = {
        (r.tier_before, r.tier_after): r.n_customers
        for r in q194_tier_migration(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("T1", "T2"): 1,
        ("T2", "CHURNED"): 1,
        ("NEW", "T1"): 1,
        ("T1", "T1"): 1,
    }


def test_q196_gini_known_distributions(spark, tmp_path):
    """Type E: two equal parts -> G = (2*(1*50+2*50) - 3*100)*1000 //
    (2*100) = 0. Type U: one part holds everything among two ->
    G = (2*(1*0+2*100) - 3*100)*1000 // 200 = 500 (the n=2 max).
    Zero-revenue parts participate via rank."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q196_revenue_gini,
    )

    ts = dt.datetime(1995, 1, 1)
    lines = [
        (1, 0.50, ts), (2, 0.50, ts),      # type E: 50/50 cents
        (3, 0.00, ts), (4, 1.00, ts),      # type U: 0/100 cents
    ]
    spark.createDataFrame(
        [(pk, pr, 0.0, t_) for pk, pr, t_ in lines],
        "l_partkey long, l_extendedprice double, l_discount double, "
        "l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, "E"), (2, "E"), (3, "U"), (4, "U")],
        "p_partkey long, p_type string",
    ).write.parquet(str(tmp_path / "part.parquet"))

    got = {
        r.p_type: (r.n_parts, r.total_cents, r.gini_milli)
        for r in q196_revenue_gini(spark, str(tmp_path)).collect()
    }
    assert got == {"E": (2, 100, 0), "U": (2, 100, 500)}


def test_q197_known_correlations(spark, tmp_path):
    """q and p are perfectly collinear (r=1), d anti-collinear with q
    (r=-1), t constructed orthogonal to q, p and d (r=0 exactly in the
    integer sufficient stats)."""
    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q197_correlation_matrix,
    )

    rows = [
        (1.0, 10.0, 0.03, 0.00),
        (2.0, 20.0, 0.02, 0.01),
        (3.0, 30.0, 0.01, 0.00),
    ]
    spark.createDataFrame(
        rows,
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))

    r = q197_correlation_matrix(spark, str(tmp_path)).collect()[0]
    assert r.n == 3
    assert r.r_qty_price == 1.0 and r.r_qty_disc == -1.0
    assert r.r_price_disc == -1.0
    assert r.r_qty_tax == 0.0 and r.r_price_tax == 0.0 and r.r_disc_tax == 0.0


def test_q198_flags_weekday_adjusted_outlier(spark, tmp_path):
    """A 21-day series of 7.00 with Mondays at 3.50 and ONE Monday
    spiked 8x (28.00): the spike day must be flagged with the highest
    anomaly score. (The spike also contaminates its own weekday norm
    and neighbors' trend windows, so OTHER Mondays may legitimately
    flag low — the assertion pins the spike, not exclusivity.) A
    spike-free control run flags nothing: steady weekday seasonality
    alone is never anomalous."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.timeseries import (
        q198_seasonal_anomalies,
    )

    base = dt.datetime(1970, 1, 1)  # Thursday, day 0
    spike_day = 11  # a Monday with a FULL centered window (3..17)

    def build(with_spike):
        rows = []
        for d in range(21):
            is_monday = (d + 3) % 7 == 0
            v = 3.5 if is_monday else 7.0
            if with_spike and d == spike_day:
                v = 28.0
            rows.append((base + dt.timedelta(days=d), "T", v))
        return rows

    clean_dir = str(tmp_path / "clean")
    spark.createDataFrame(
        build(False), "ts timestamp, event_type string, value double"
    ).write.parquet(clean_dir + "/events.parquet")
    assert q198_seasonal_anomalies(spark, clean_dir).count() == 0

    spike_dir = str(tmp_path / "spike")
    spark.createDataFrame(
        build(True), "ts timestamp, event_type string, value double"
    ).write.parquet(spike_dir + "/events.parquet")
    got = q198_seasonal_anomalies(spark, spike_dir).collect()
    by_day = {r.day: r.anomaly_ppm for r in got}
    assert spike_day in by_day
    assert by_day[spike_day] == max(by_day.values())
    assert by_day[spike_day] > 1_500_000


def test_q199_three_models_disagree(spark, tmp_path):
    """One purchase after view->click->click: first credits view,
    last credits click, linear splits 333333/666666; a second organic
    purchase (no touch in 3 days) appears in no model."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.eventanalytics import (
        q199_attribution_bakeoff,
    )

    t0 = dt.datetime(1995, 1, 10)
    h = lambda x: t0 + dt.timedelta(hours=x)
    rows = [
        (1, 1, "view", h(0)),
        (2, 1, "click", h(1)),
        (3, 1, "click", h(2)),
        (4, 1, "purchase", h(3)),
        (5, 2, "purchase", h(3)),            # organic
        (6, 2, "click", h(3 - 100 * 24)),    # far outside window
    ]
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    ).write.parquet(str(tmp_path / "events.parquet"))

    got = {
        r.touch_type: (r.n_touches, r.n_first_touch, r.n_last_touch,
                       r.linear_credit_fp)
        for r in q199_attribution_bakeoff(spark, str(tmp_path)).collect()
    }
    assert got == {
        "view": (1, 1, 0, 333333),
        "click": (2, 0, 1, 666666),
    }


def test_q201_overlap_pairs_and_duration(spark, tmp_path):
    """Customer 1: orders [d0,d10) and [d5,d8) overlap for 3 days;
    [d10,d12) is back-to-back with the first (half-open: NO overlap);
    customer 2's identical interval never pairs across customers."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.timeseries import (
        q201_overlapping_orders,
    )

    DAY = 86_400_000_000
    d = lambda n: dt.datetime(1970, 1, 1) + dt.timedelta(days=n)
    spark.createDataFrame(
        [(1, 1, d(0)), (2, 1, d(5)), (3, 1, d(10)), (4, 2, d(0))],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, d(10)), (2, d(8)), (3, d(12)), (4, d(10))],
        "l_orderkey long, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))

    rows = q201_overlapping_orders(spark, str(tmp_path)).collect()
    assert [(r.custkey, r.order_a, r.order_b, r.overlap_us) for r in rows] == [
        (1, 1, 2, 3 * DAY)
    ]


def test_q202_aging_buckets(spark, tmp_path):
    """Reference date = max order date (day 100, even if that order is
    closed): open orders at ages 10/45/100 land in 0-30 / 31-60 / 90+;
    the 'F' order is excluded from buckets but sets the clock."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.scalars import q202_ar_aging

    d = lambda n: dt.datetime(1970, 1, 1) + dt.timedelta(days=n)
    orders = [
        (1, "A", "O", 10.0, d(90)),    # age 10
        (2, "A", "O", 20.0, d(55)),    # age 45
        (3, "B", "O", 30.0, d(0)),     # age 100
        (4, "B", "F", 99.0, d(100)),   # closed: clock only
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_orderpriority string, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp",
    ).write.parquet(str(tmp_path / "orders.parquet"))

    got = {
        (r.o_orderpriority, r.age_bucket): (r.n_orders, r.open_cents)
        for r in q202_ar_aging(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("A", "0-30"): (1, 1000),
        ("A", "31-60"): (1, 2000),
        ("B", "90+"): (1, 3000),
    }


def test_q203_gap_profile(spark, tmp_path):
    """Customer 1 (seg A) orders on days 0/3/20: gaps 3 and 17 ->
    mean 10000 milli, one within 7d (500000 ppm); customer 2 (seg A)
    single order contributes nothing; customer 3 (seg B) days 5/6:
    gap 1."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.eventanalytics import (
        q203_interarrival_by_segment,
    )

    d = lambda n: dt.datetime(1970, 1, 1) + dt.timedelta(days=n)
    orders = [
        (1, 1, d(0)), (2, 1, d(3)), (3, 1, d(20)),
        (4, 2, d(9)),
        (5, 3, d(5)), (6, 3, d(6)),
    ]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B")], "c_custkey long, c_mktsegment string"
    ).write.parquet(str(tmp_path / "customer.parquet"))

    got = {
        r.segment: (r.n_gaps, r.mean_gap_milli, r.max_gap, r.within_7d_ppm)
        for r in q203_interarrival_by_segment(spark, str(tmp_path)).collect()
    }
    assert got == {"A": (2, 10000, 17, 500000), "B": (1, 1000, 1, 1000000)}


def test_q204_new_vs_returning(spark, tmp_path):
    """Customer 1 first orders in month 0 (two orders) and returns in
    month 1; customer 2 is new in month 1. Month 0: all new. Month 1:
    one new (200c) + one returning (100c) -> new share 666666 ppm."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q204_acquisition_mix,
    )

    m0, m1 = dt.datetime(1970, 1, 5), dt.datetime(1970, 2, 10)
    orders = [
        (1, 1, 0.50, m0), (2, 1, 0.50, m0),
        (3, 1, 1.00, m1),
        (4, 2, 2.00, m1),
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp",
    ).write.parquet(str(tmp_path / "orders.parquet"))

    got = {
        r.month_bucket: (
            r.new_orders, r.returning_orders,
            r.new_cents, r.returning_cents, r.new_revenue_ppm,
        )
        for r in q204_acquisition_mix(spark, str(tmp_path)).collect()
    }
    assert got == {
        0: (2, 0, 100, 0, 1000000),
        1: (1, 1, 200, 100, 666666),
    }


def test_q205_repeat_window_boundary(spark, tmp_path):
    """Cohort month 0: customer 1 repeats at exactly 60 days (counts),
    customer 2 repeats at 61 (does not), customer 3 never repeats;
    two same-day orders are one distinct day (no self-repeat)."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q205_cohort_repeat_rate,
    )

    d = lambda n: dt.datetime(1970, 1, 1) + dt.timedelta(days=n)
    orders = [
        (1, 1, d(0)), (2, 1, d(60)),
        (3, 2, d(1)), (4, 2, d(62)),
        (5, 3, d(2)), (6, 3, d(2)),   # same-day pair: one distinct day
    ]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    ).write.parquet(str(tmp_path / "orders.parquet"))

    got = {
        r.cohort_month: (r.n_customers, r.n_repeat_60d, r.repeat_ppm)
        for r in q205_cohort_repeat_rate(spark, str(tmp_path)).collect()
    }
    assert got == {0: (3, 1, 333333)}


def test_q206_effects_reconcile(spark, tmp_path):
    """Brand B1: h1 sells 10 units for 1000c, h2 sells 15 units for
    1800c -> volume effect (5*1000)//10 = 500, price/mix = 800-500 =
    300, summing exactly to the 800c delta. A floor case: B2 h1 3
    units/100c, h2 4 units/150c -> volume (1*100)//3 = 33, price/mix
    17, delta 50 — reconciles despite the floor. Exit brand B3 has
    NULL effects."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q206_price_volume_bridge,
    )

    d = lambda n: dt.datetime(1970, 1, 1) + dt.timedelta(days=n)
    # midpoint of [0, 10] is 5
    lines = [
        (1, 10.0, 10.00, 0), (1, 15.0, 18.00, 9),
        (2, 3.0, 1.00, 1), (2, 4.0, 1.50, 8),
        (3, 2.0, 5.00, 2),                        # h1 only
    ]
    spark.createDataFrame(
        [(pk, q, pr, 0.0, d(dy)) for pk, q, pr, dy in lines],
        "l_partkey long, l_quantity double, l_extendedprice double, "
        "l_discount double, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(k, f"B{k}") for k in (1, 2, 3)], "p_partkey long, p_brand string"
    ).write.parquet(str(tmp_path / "part.parquet"))

    got = {
        r.brand: (r.delta_cents, r.volume_effect, r.price_mix_effect)
        for r in q206_price_volume_bridge(spark, str(tmp_path)).collect()
    }
    assert got == {
        "B1": (800, 500, 300),
        "B2": (50, 33, 17),
        "B3": (-500, None, None),
    }
    for b in ("B1", "B2"):
        delta, vol, pm = got[b]
        assert vol + pm == delta


def test_q209_whale_detection(spark, tmp_path):
    """Type E: two users with 5 events each -> Gini 0. Type W: user 1
    has 9 events, user 2 has 1 -> Gini (2*(1*1+2*9) - 3*10)*1000 //
    (2*10) = 400."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.eventanalytics import (
        q209_engagement_gini,
    )

    t0 = dt.datetime(1995, 1, 1)
    rows = []
    eid = 0
    def emit(n, user, typ):
        nonlocal eid
        for _ in range(n):
            eid += 1
            rows.append((eid, user, typ, t0 + dt.timedelta(minutes=eid)))
    emit(5, 1, "E"); emit(5, 2, "E")
    emit(9, 1, "W"); emit(1, 2, "W")
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    ).write.parquet(str(tmp_path / "events.parquet"))

    got = {
        r.event_type: (r.n_users, r.n_events, r.gini_milli)
        for r in q209_engagement_gini(spark, str(tmp_path)).collect()
    }
    assert got == {"E": (2, 10, 0), "W": (2, 10, 400)}


def test_q210_wilson_orders_small_samples_down(spark, tmp_path):
    """The whole point of Wilson ranking: a 2-sample perfect return
    rate (p-hat 1.0, LB 0.342) ranks BELOW a solid 400/1000 (LB
    0.370). Values match the textbook formula computed in Python
    float arithmetic bit-for-bit."""
    import math

    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q210_wilson_return_ranking,
    )

    ts = dt.datetime(1995, 1, 1)
    lines = []
    # brand B1: 2 lines, both returns; brand B2: 1000 lines, 400 returns
    for i in range(2):
        lines.append((1, "R", ts))
    for i in range(1000):
        lines.append((2, "R" if i < 400 else "N", ts))
    spark.createDataFrame(
        [(pk, rf, 1.0, 0.0, t_) for pk, rf, t_ in lines],
        "l_partkey long, l_returnflag string, l_extendedprice double, "
        "l_discount double, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, "B1"), (2, "B2")], "p_partkey long, p_brand string"
    ).write.parquet(str(tmp_path / "part.parquet"))

    def wilson(k, n, z=1.96):
        ph = k / n
        return (ph + z * z / (2.0 * n)
                - z * math.sqrt((ph * (1.0 - ph) + z * z / (4.0 * n)) / n)
                ) / (1.0 + z * z / n)

    got = {
        r.brand: (r.n, r.k, r.wilson_lb)
        for r in q210_wilson_return_ranking(spark, str(tmp_path)).collect()
    }
    assert got["B1"] == (2, 2, wilson(2, 2))
    assert got["B2"] == (1000, 400, wilson(400, 1000))
    assert got["B2"][2] > got["B1"][2]  # solid sample outranks tiny one


def test_q211_nk_table(spark, tmp_path):
    """3 customers with 1 order, 2 with 2, 1 with 4: N_1=3, N_2=2,
    N_4=1; cumulative shares are exact floors of 6ths."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q211_freq_of_frequencies,
    )

    ts = dt.datetime(1995, 1, 1)
    orders, ok = [], 0
    for cust, n in [(1, 1), (2, 1), (3, 1), (4, 2), (5, 2), (6, 4)]:
        for _ in range(n):
            ok += 1
            orders.append((ok, cust, ts))
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    ).write.parquet(str(tmp_path / "orders.parquet"))

    got = {
        r.k: (r.n_k, r.n_le_k, r.cum_share_ppm)
        for r in q211_freq_of_frequencies(spark, str(tmp_path)).collect()
    }
    assert got == {
        1: (3, 3, 500000),
        2: (2, 5, 833333),
        4: (1, 6, 1000000),
    }


def test_q212_loyalty_profile(spark, tmp_path):
    """Customer 1 (seg A): 80/20 split across two brands -> top share
    800000, loyalist. Customer 2 (seg A): 50/50 -> exactly 500000, NOT
    a loyalist (strict >). Segment A: mean (800000+500000)//2, 500000
    loyalist share."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q212_share_of_wallet,
    )

    ts = dt.datetime(1995, 1, 1)
    lines = [
        (1, 1, 8.00), (1, 2, 2.00),     # cust 1 via order 1
        (2, 1, 3.00), (2, 2, 3.00),     # cust 2 via order 2
    ]
    spark.createDataFrame(
        [(ok, pk, pr, 0.0, ts) for ok, pk, pr in lines],
        "l_orderkey long, l_partkey long, l_extendedprice double, "
        "l_discount double, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, 1, ts), (2, 2, ts)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, "B1"), (2, "B2")], "p_partkey long, p_brand string"
    ).write.parquet(str(tmp_path / "part.parquet"))
    spark.createDataFrame(
        [(1, "A"), (2, "A")], "c_custkey long, c_mktsegment string"
    ).write.parquet(str(tmp_path / "customer.parquet"))

    got = {
        r.segment: (r.n_customers, r.mean_top_share_ppm, r.loyalist_ppm)
        for r in q212_share_of_wallet(spark, str(tmp_path)).collect()
    }
    assert got == {"A": (2, 650000, 500000)}


def test_q213_crossing_count(spark, tmp_path):
    """Type T revenues 50/30/15/5 (pre-cum shares 0/50/80/95): parts
    with pre-cum strictly below 80% are p1 and p2 (p3's pre-cum sits
    exactly AT 80% and is excluded), so n_for_80 = 2 of 4 parts
    (500000 ppm of the catalog)."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q213_pareto_crossing,
    )

    ts = dt.datetime(1995, 1, 1)
    lines = [(1, 0.50), (2, 0.30), (3, 0.15), (4, 0.05)]
    spark.createDataFrame(
        [(pk, pr, 0.0, ts) for pk, pr in lines],
        "l_partkey long, l_extendedprice double, l_discount double, "
        "l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(k, "T") for k in (1, 2, 3, 4)], "p_partkey long, p_type string"
    ).write.parquet(str(tmp_path / "part.parquet"))

    r = q213_pareto_crossing(spark, str(tmp_path)).collect()[0]
    assert (r.p_type, r.n_parts, r.n_for_80, r.catalog_share_ppm) == (
        "T", 4, 2, 500000,
    )


def test_q214_tenure_buckets(spark, tmp_path):
    """Customer 1 orders at tenure 0, 30 (boundary: 00-30), 91
    (boundary: 91-180), 200 (180+); customer 2 only at tenure 0.
    Buckets count exactly."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q214_tenure_revenue_mix,
    )

    d = lambda n: dt.datetime(1970, 1, 1) + dt.timedelta(days=n)
    orders = [
        (1, 1, 1.00, d(10)), (2, 1, 2.00, d(40)),   # tenure 0, 30
        (3, 1, 3.00, d(101)), (4, 1, 4.00, d(210)),  # tenure 91, 200
        (5, 2, 5.00, d(50)),                         # tenure 0
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp",
    ).write.parquet(str(tmp_path / "orders.parquet"))

    got = {
        r.tenure_bucket: (r.n_orders, r.cents)
        for r in q214_tenure_revenue_mix(spark, str(tmp_path)).collect()
    }
    assert got == {
        "00-30": (3, 100 + 200 + 500),
        "91-180": (1, 300),
        "180+": (1, 400),
    }


def test_q216_novelty_decay(spark, tmp_path):
    """Month 0: all 3 lines first-time (1e6). Month 1: customer rebuys
    part 1 (repeat) and first-buys part 3 -> 500000; same-day repeat
    lines of a first day BOTH count first-time (documented tie)."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q216_purchase_novelty,
    )

    d = lambda n: dt.datetime(1970, 1, 1) + dt.timedelta(days=n)
    orders = [(1, 1, d(0)), (2, 1, d(40)), (3, 2, d(1))]
    lines = [
        (1, 1), (1, 1),      # cust 1 month 0: part 1 twice SAME day
        (3, 2),              # cust 2 month 0: part 2
        (2, 1), (2, 3),      # cust 1 month 1: repeat part 1 + new part 3
    ]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lines, "l_orderkey long, l_partkey long"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))

    got = {
        r.month_bucket: (r.n_lines, r.n_first_time, r.novelty_ppm)
        for r in q216_purchase_novelty(spark, str(tmp_path)).collect()
    }
    assert got == {0: (3, 3, 1000000), 1: (2, 1, 500000)}


def test_q217_peak_election(spark, tmp_path):
    """Type T: hour 3 and hour 20 both have 4 events (tie) -> peak
    hour is the EARLIEST (3); trough is hour 7's single event; ratio
    4000 milli."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.eventanalytics import (
        q217_load_curve,
    )

    base = dt.datetime(1970, 1, 1)
    rows, eid = [], 0
    def emit(hour, k):
        nonlocal eid
        for i in range(k):
            eid += 1
            rows.append((eid, 1, "T",
                         base + dt.timedelta(days=i, hours=hour, minutes=eid % 50)))
    emit(3, 4); emit(20, 4); emit(7, 1)
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    ).write.parquet(str(tmp_path / "events.parquet"))

    r = q217_load_curve(spark, str(tmp_path)).collect()[0]
    assert (r.event_type, r.peak_hour, r.peak_n, r.trough_n, r.n_hours,
            r.peak_to_trough_milli) == ("T", 3, 4, 1, 3, 4000)


def test_q218_tiering_and_repeat(spark, tmp_path):
    """Customer 1: two same-day first orders (total $150 = 15000c ->
    T2), repeats day 30 -> counted. Customer 2: first basket $50 =
    5000c (T1), never repeats. Customer 3: $200 = 20000c (T2),
    repeats at day 61 -> NOT counted (boundary is <= 60)."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q218_first_value_retention,
    )

    d = lambda n: dt.datetime(1970, 1, 1) + dt.timedelta(days=n)
    orders = [
        (1, 1, 100.0, d(0)), (2, 1, 50.0, d(0)), (3, 1, 10.0, d(30)),
        (4, 2, 50.0, d(5)),
        (5, 3, 200.0, d(2)), (6, 3, 10.0, d(63)),
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp",
    ).write.parquet(str(tmp_path / "orders.parquet"))

    got = {
        r.first_value_tier: (r.n_customers, r.n_repeat_60d, r.repeat_ppm)
        for r in q218_first_value_retention(spark, str(tmp_path)).collect()
    }
    # cust1 first cents 15000 -> T2 band? 15000 >= 10000 -> T2;
    # cust2 5000 -> T1; cust3 20000 -> T2
    assert got == {
        "T1": (1, 0, 0),
        "T2": (2, 1, 500000),
    }


def test_q219_ladder_rungs(spark, tmp_path):
    """Customers with 1/1/2/4 orders: at k=1, 2 of 4 went past
    (500000); at k=2, 1 of 2 went past even though k=3 is UNOBSERVED
    (the 4-order customer counts — the histogram-gap case); at k=4
    nobody (0)."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q219_repeat_ladder,
    )

    ts = dt.datetime(1995, 1, 1)
    orders, ok = [], 0
    for cust, n in [(1, 1), (2, 1), (3, 2), (4, 4)]:
        for _ in range(n):
            ok += 1
            orders.append((ok, cust, ts))
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    ).write.parquet(str(tmp_path / "orders.parquet"))

    got = {
        r.k: (r.n_ge_k, r.n_gt_k, r.continue_ppm)
        for r in q219_repeat_ladder(spark, str(tmp_path)).collect()
    }
    assert got == {
        1: (4, 2, 500000),
        2: (2, 1, 500000),
        4: (1, 0, 0),
    }
