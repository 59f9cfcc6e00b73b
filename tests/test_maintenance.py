"""Semantic invariants for the storage-maintenance operators
(operators/maintenance.py): the bin-pack plan must actually be a valid
compaction plan, and the zone-map audit must reconcile with a direct
evaluation of the predicate."""

from __future__ import annotations

from pyspark.sql import functions as F

from pinot_pulsar_plugin_spark.catalog import load_table
from pinot_pulsar_plugin_spark.operators import maintenance as mt

SF = "/root/testdata/sf0.01"


def test_q137_binpack_is_a_valid_plan(spark):
    rows = mt.QUERIES["q137_compaction_binpack"](spark, SF).collect()
    by_group: dict[int, dict[int, tuple[int, int]]] = {}
    for r in rows:
        by_group.setdefault(r.group_id, {})[r.bin_id] = (r.n_files, r.bin_rows)
    li = load_table(spark, SF, "lineitem")
    total = li.count()
    # conservation: every input row lands in exactly one bin
    assert sum(b[1] for g in by_group.values() for b in g.values()) == total
    for g, bins in by_group.items():
        # bins are densely numbered from 0 (next-fit never skips)
        assert sorted(bins) == list(range(len(bins))), (g, sorted(bins))
        for bin_id, (n_files, bin_rows) in bins.items():
            # the offset rule starts a new bin once the running offset
            # crosses the target, so a bin overshoots by at most one
            # file; a single file can't be split below target
            if n_files > 1:
                assert bin_rows < 2 * mt._TARGET_ROWS, (g, bin_id, bin_rows)
        # all but the final bin of a group are at/above a half-full
        # floor only when multiple files exist — weak check: non-final
        # bins are non-empty and the plan is contiguous by bin id
        assert all(b[1] > 0 for b in bins.values())


def test_q138_audit_reconciles_with_direct_predicate(spark):
    """rows_scanned must be >= the true matching rows for both layouts
    (zone maps can only over-approximate), and the date-clustered
    layout must scan no more than the natural layout (the point of
    the operator)."""
    out = {
        r.layout: r
        for r in mt.QUERIES["q138_zonemap_prune_audit"](spark, SF).collect()
    }
    o = load_table(spark, SF, "orders")
    true_match = o.filter(
        (F.col("o_orderdate") >= F.lit(mt._LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(mt._HI).cast("timestamp"))
    ).count()
    total = o.count()
    for layout in ("natural", "clustered"):
        r = out[layout]
        assert r.rows_scanned >= true_match, (layout, r.rows_scanned, true_match)
        assert r.n_pruned + r.n_full + r.n_partial == r.n_segments
        assert 0 < r.scan_ppm <= 1_000_000
    assert out["clustered"].rows_scanned <= out["natural"].rows_scanned
    # the clustered layout should actually prune on this data: the
    # 3-month predicate covers ~4% of a 6.8-year span, so per-year
    # date-sorted segments must skip most rows
    assert out["clustered"].rows_scanned < total


def test_q139_delta_algebra_equals_full_recompute(spark):
    """The incremental path (base + three delta joins) must equal a
    direct full-join recompute row-for-row — the in-Spark differential
    that guards the delta algebra independent of the oracle."""
    out = mt.QUERIES["q139_incremental_join_view"](spark, SF)
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    amt = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    direct = (
        li.join(o, o["o_orderkey"] == li["l_orderkey"])
        .select("o_custkey", amt.alias("amt_fp"))
        .groupBy("o_custkey")
        .agg(
            (F.sum("amt_fp") / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    got = {r.o_custkey: (r.revenue, r.n_lines) for r in out.collect()}
    want = {r.o_custkey: (r.revenue, r.n_lines) for r in direct.collect()}
    assert got == want
    # the simulated micro-batch must actually contribute (non-trivial
    # delta terms — all three flag combinations occur)
    assert any(r.delta_contrib > 0 for r in out.collect())


def test_q137_binpack_rule_matches_sequential_reference(spark):
    """Property check on random manifests: the distributed window
    formula bin = (running − n_rows) div target must equal a plain
    sequential next-fit-by-offset walk, per group, for arbitrary file
    sizes (including files larger than the target)."""
    import random

    for seed in range(5):
        rng = random.Random(4200 + seed)
        files = [
            (gid, fid, rng.randrange(1, 3000))
            for gid in range(3)
            for fid in range(rng.randrange(1, 12))
        ]
        target = 2048
        df = spark.createDataFrame(
            files, "group_id int, file_id int, n_rows long"
        )
        from pyspark.sql import Window as W

        w = (
            W.partitionBy("group_id")
            .orderBy("file_id")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        got = {
            (r.group_id, r.file_id): r.bin_id
            for r in df.withColumn("running", F.sum("n_rows").over(w))
            .selectExpr(
                "group_id", "file_id", f"(running - n_rows) div {target} AS bin_id"
            )
            .collect()
        }
        # sequential reference: walk each group's files in id order,
        # assigning by cumulative start offset
        want = {}
        for gid in range(3):
            offset = 0
            for g, fid, n in sorted(f for f in files if f[0] == gid):
                want[(g, fid)] = offset // target
                offset += n
        assert got == want, (seed, got, want)


def test_q144_bands_on_constructed_ledger(spark, tmp_path):
    """Reconciliation bands on a hand-built header/detail pair: exact
    match -> lt_1pct, 5% off -> lt_10pct, 50% off -> gt_10pct, header
    without details -> no_lines carrying the full header value."""
    from pyspark.sql import functions as F

    from pinot_pulsar_plugin_spark.operators.maintenance import (
        q144_order_reconciliation_audit,
    )

    orders = [
        (1, 100.0),   # exact
        (2, 100.0),   # details sum to 95 -> 5% dev
        (3, 100.0),   # details sum to 50 -> 50% dev
        (4, 80.0),    # no details
    ]
    lines = [
        (1, 100.0, 0.0, 0.0),
        (2, 95.0, 0.0, 0.0),
        (3, 25.0, 0.0, 0.0),
        (3, 25.0, 0.0, 0.0),
    ]
    spark.createDataFrame(
        orders, "o_orderkey long, o_totalprice double"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lines,
        "l_orderkey long, l_extendedprice double, l_discount double, l_tax double",
    ).select("*", F.lit(1.0).alias("l_quantity")).write.parquet(
        str(tmp_path / "lineitem.parquet")
    )

    got = {
        r.band: (r.n_orders, r.sum_abs_dev_cents)
        for r in q144_order_reconciliation_audit(spark, str(tmp_path)).collect()
    }
    assert got == {
        "lt_1pct": (1, 0),
        "lt_10pct": (1, 500),
        "gt_10pct": (1, 5000),
        "no_lines": (1, 8000),
    }


def test_q148_snapshot_diff_classifies_all_change_kinds(spark, tmp_path):
    """Hand-built snapshot pair: key 5 exists only in the new snapshot
    (insert), key 3 only in the old (delete), key 7 is price-bumped
    (update, net +250 cents), key 1 is identical (excluded), and key
    135 (both mod-rules fire) is in neither snapshot."""
    import datetime

    from pinot_pulsar_plugin_spark.operators.maintenance import q148_snapshot_diff

    d = datetime.datetime(2024, 1, 1)
    rows = [
        (1, 10, "O", 100.00, d, "1-URGENT"),
        (3, 10, "F", 50.00, d, "1-URGENT"),
        (5, 10, "O", 75.00, d, "1-URGENT"),
        (7, 10, "O", 20.00, d, "1-URGENT"),
        (135, 10, "O", 99.00, d, "1-URGENT"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))

    got = {
        r.change: (r.n_keys, r.net_cents, r.min_key, r.max_key)
        for r in q148_snapshot_diff(spark, str(tmp_path)).collect()
    }
    assert got == {
        "insert": (1, 7500, 5, 5),
        "delete": (1, -5000, 3, 3),
        "update": (1, 250, 7, 7),
    }


def test_q171_skew_report_finds_the_hot_key(spark, tmp_path):
    """A fact with one hot supplier (80 of 100 rows) must report that
    key as its bucket's hottest with the right counts and share."""
    from pyspark.sql import functions as F

    from pinot_pulsar_plugin_spark.operators.maintenance import (
        _Q171_B,
        q171_shuffle_skew_report,
    )

    # key 7 appears 81 times total (80 hot + once from the 1..20 range)
    rows = [(7,)] * 80 + [(k,) for k in range(1, 21)]
    spark.createDataFrame(rows, "l_suppkey long").write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    out = {r.bucket: r for r in q171_shuffle_skew_report(spark, str(tmp_path)).collect()}
    hot_bucket = (7 * 2654435761) % _Q171_B
    r = out[hot_bucket]
    assert r.hottest_key == 7 and r.hottest_n == 81
    assert r.n_rows >= 81 and r.share_ppm >= 810000
    assert sum(b.n_rows for b in out.values()) == 100


def test_q178_benford_digits_and_chi2(spark, tmp_path):
    """90 orders whose cent-values' first digits follow counts
    10,20,...: digit extraction, ppm shares, and the chi-square term
    must match hand arithmetic; a digit with obs*1e6 == N*ppm exactly
    contributes 0."""
    from pinot_pulsar_plugin_spark.operators.maintenance import (
        _BENFORD_PPM,
        q178_benford_audit,
    )

    # 50 orders starting with digit 1, 30 with digit 2, 20 with 9;
    # one non-positive row that must be filtered out entirely.
    vals = [1.23] * 50 + [25.0] * 30 + [999.99] * 20 + [0.0]
    spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "o_orderkey long, o_totalprice double"
    ).write.parquet(str(tmp_path / "orders.parquet"))

    rows = {r.digit: r for r in q178_benford_audit(spark, str(tmp_path)).collect()}
    assert set(rows) == {1, 2, 9}
    n = 100
    assert rows[1].obs == 50 and rows[1].obs_ppm == 500000
    assert rows[2].obs == 30 and rows[2].obs_ppm == 300000
    assert rows[9].obs == 20 and rows[9].obs_ppm == 200000
    for d in (1, 2, 9):
        ppm = _BENFORD_PPM[d - 1]
        num = float(rows[d].obs * 1_000_000 - n * ppm)
        assert rows[d].chi2_contrib == num * num / (n * ppm * 1_000_000.0)
        assert rows[d].exp_ppm == ppm


def test_q193_lifecycle_lags(spark, tmp_path):
    """Order 1 (prio A): placed day 0, ships days 2 and 10 -> start
    lag 2, span 8, total 10, within 30d. Order 2 (prio A): placed day
    0, ships day 40 -> total 40, outside. Milli means floor."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.tpch_suite import (
        q193_accumulating_snapshot,
    )

    d = lambda n: dt.datetime(1970, 1, 1) + dt.timedelta(days=n)
    spark.createDataFrame(
        [(1, "A", d(0)), (2, "A", d(0))],
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, d(2)), (1, d(10)), (2, d(40))],
        "l_orderkey long, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))

    rows = {
        r.o_orderpriority: r
        for r in q193_accumulating_snapshot(spark, str(tmp_path)).collect()
    }
    r = rows["A"]
    assert (r.n_orders, r.avg_start_lag_milli, r.avg_span_milli,
            r.max_total_lag, r.within_30d_ppm) == (2, 21000, 4000, 40, 500000)


def test_q207_wave_profile(spark, tmp_path):
    """Order 1 ships 3 lines over 2 distinct days (two on one day);
    order 2 ships 1 line in 1 wave: priority A profile has mean lines
    2000 milli, mean waves 1500, single-wave share 500000, max 2."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.tpch_suite import (
        q207_split_shipments,
    )

    d = lambda n: dt.datetime(1970, 1, 1) + dt.timedelta(days=n)
    spark.createDataFrame(
        [(1, "A", d(0)), (2, "A", d(0))],
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, d(2)), (1, d(2)), (1, d(5)), (2, d(3))],
        "l_orderkey long, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))

    r = {
        x.o_orderpriority: x
        for x in q207_split_shipments(spark, str(tmp_path)).collect()
    }["A"]
    assert (r.n_orders, r.mean_lines_milli, r.mean_waves_milli,
            r.single_wave_ppm, r.max_waves) == (2, 2000, 1500, 500000, 2)


def test_q208_scorecard_blend(spark, tmp_path):
    """Supplier 1: 2 lines, 1 on-time (day 10), 1 late (day 40),
    qty 30 of corpus 40 -> on_time 500000, volume 750000, composite
    (7*500000 + 3*750000)//10 = 575000. Supplier 2: all on-time, qty
    10 -> composite (7*1000000 + 3*250000)//10 = 775000."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.tpch_suite import (
        q208_supplier_scorecard,
    )

    d = lambda n: dt.datetime(1970, 1, 1) + dt.timedelta(days=n)
    spark.createDataFrame(
        [(1, d(0)), (2, d(0))], "o_orderkey long, o_orderdate timestamp"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, 1, 20.0, d(10)), (1, 1, 10.0, d(40)), (2, 2, 10.0, d(5))],
        "l_orderkey long, l_suppkey long, l_quantity double, "
        "l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, "S1"), (2, "S2")], "s_suppkey long, s_name string"
    ).write.parquet(str(tmp_path / "supplier.parquet"))

    got = {
        r.s_suppkey: (r.n_lines, r.on_time_ppm, r.volume_ppm,
                      r.composite_score)
        for r in q208_supplier_scorecard(spark, str(tmp_path)).collect()
    }
    assert got == {
        1: (2, 500000, 750000, 575000),
        2: (1, 1000000, 250000, 775000),
    }


def test_q215_width_buckets(spark, tmp_path):
    """Order 1 repeats one part across 3 lines (width 1); order 2 has
    3 distinct parts (2-3); order 3 has 7 (7+). Revenue rides the
    bucket exactly."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.tpch_suite import (
        q215_basket_width,
    )

    ts = dt.datetime(1970, 1, 5)
    lines = []
    for _ in range(3):
        lines.append((1, 7, 1.00))
    for pk in (1, 2, 3):
        lines.append((2, pk, 2.00))
    for pk in range(10, 17):
        lines.append((3, pk, 0.50))
    spark.createDataFrame(
        [(ok, pk, pr, 0.0, ts) for ok, pk, pr in lines],
        "l_orderkey long, l_partkey long, l_extendedprice double, "
        "l_discount double, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, "A", ts), (2, "A", ts), (3, "A", ts)],
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp",
    ).write.parquet(str(tmp_path / "orders.parquet"))

    got = {
        r.width_bucket: (r.n_orders, r.cents)
        for r in q215_basket_width(spark, str(tmp_path)).collect()
    }
    assert got == {"1": (1, 300), "2-3": (1, 600), "7+": (1, 350)}


def test_q136_only_late_shipper_edge_cases(spark, tmp_path):
    """Constructed Q21 edges pinning the r10 folded form (|late| = 1 ∧
    |suppliers| ≥ 2) beyond the fixture data: order 100 — supplier 1
    late on TWO lines + on-time co-supplier → counts ONCE; order 200 —
    two late suppliers → counts for neither; order 300 — sole-supplier
    late order → not multi-supplier, no count; order 400 — open status
    'O' → excluded; order 500 — supplier 2 the only late of two →
    counts; order 600 — supplier 5 ships at EXACTLY +60 days (the
    threshold is strict >) → not late, no count. Expect S1:1, S2:1
    and nothing else."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.tpch_suite import (
        q136_sole_late_suppliers,
    )

    d0 = dt.datetime(1997, 1, 1)
    late, ontime = d0 + dt.timedelta(days=61), d0 + dt.timedelta(days=10)
    boundary = d0 + dt.timedelta(days=60)
    lines = [
        (100, 1, late), (100, 1, late), (100, 2, ontime),
        (200, 1, late), (200, 2, late), (200, 3, ontime),
        (300, 3, late),
        (400, 1, late), (400, 2, ontime),
        (500, 2, late), (500, 4, ontime),
        (600, 5, boundary), (600, 4, ontime),
    ]
    spark.createDataFrame(
        lines, "l_orderkey long, l_suppkey long, l_shipdate timestamp"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(ok, "O" if ok == 400 else "F", d0) for ok in (100, 200, 300, 400, 500, 600)],
        "o_orderkey long, o_orderstatus string, o_orderdate timestamp",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(k, f"S{k}") for k in (1, 2, 3, 4, 5)],
        "s_suppkey long, s_name string",
    ).write.parquet(str(tmp_path / "supplier.parquet"))

    got = {
        r.s_name: r.numwait
        for r in q136_sole_late_suppliers(spark, str(tmp_path)).collect()
    }
    assert got == {"S1": 1, "S2": 1}
