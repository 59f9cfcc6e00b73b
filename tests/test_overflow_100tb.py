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
    for b in (100, 1000, 1000003):
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
