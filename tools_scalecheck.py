#!/usr/bin/env python
"""Empirical scale-slope check for the headline relational plans.

SCALING.md argues each operator's 100-TB shape analytically (shuffle
counts, broadcast sides, map-side combines) and the plan gates pin the
shapes; this tool adds the MEASUREMENT: replicate the sf0.1 FACT
tables N-fold with re-keyed order keys / event ids (dimensions stay
fixed — the realistic growth shape: more orders per customer, more
events per user, same catalog), run the headline relational queries at
1x and Nx through identical parquet layouts, and report the normalized
wall-clock slope

    slope = wall(Nx) / (N * wall(1x))

Slope <= ~1 means at-or-below-linear scaling on local[32]; a slope
well above 1 flags a superlinear term (candidate explosion, driver
materialization, NDV-sensitive shuffle) that the analytic story
missed. The dedup family is deliberately OUT of scope here:
replicating documents N-fold makes every document an N-way exact
duplicate, so pair output grows ~N^2 per duplicate group BY
CONSTRUCTION — a property of the synthetic replication, not of the
operators (their collision-join cost model is covered by
SCALING.md section 2 and the d58 band sweep's measured candidate
counts instead).

Usage: python tools_scalecheck.py [N] [outdir]
Prints one JSON line per query plus a summary line; ~3 min at N=20.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from pinot_pulsar_plugin_spark.registry import all_queries
from pinot_pulsar_plugin_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Facts grow; everything else is a dimension and stays fixed. The key
# stride keeps replica order keys disjoint (sf0.1 max o_orderkey is
# 600k; int64 headroom to N ~ 9e11). user_id is deliberately NOT
# re-keyed (review r10): the docstring's growth shape is more orders
# per customer and more EVENTS PER USER — shifting user_id per replica
# would grow the user count instead and make the per-key sequence
# queries (q29/q88/q90) blind to exactly the per-key growth this tool
# exists to measure.
FACT_KEYS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
}
STRIDE = 10_000_000

# Relational headliners whose cost model SCALING.md claims is linear in
# fact volume: scan+agg, order-key self-join baskets, one-scan
# multi-DISTINCT profile (o_orderkey NDV grows with N — the Expand's
# worst case), broadcast star join, per-order bridge, the
# interval-sweep concurrency rollup, a partitioned window, and the
# per-key sequence family (sessionize / decayed rollup / SCD2).
QUERIES = [
    "q01_pricing_summary",
    "q109_basket_cooccurrence",
    "q119_column_profile",
    "q126_local_supplier_volume",
    "q184_revenue_bridge",
    "q180_max_concurrency",
    "q23_window_running_sum",
    "q29_sessionize",
    "q88_decayed_engagement",
    "q90_scd2_intervals",
    # r10 histogram rewrites — slopes should stay flat (their old
    # sorted forms measured ~15x slower at 100x; ROUND10_NOTES §9)
    "q91_trimmed_mean",
    "q106_equidepth_bins",
    "q209_engagement_gini",
    # r11 kept-rank windows — their docstrings claim the per-type sort
    # input is the part-grain aggregate (dimension-bounded), so fact
    # growth should cost only the combinable aggregate stage
    "q196_revenue_gini",
    "q175_abc_classification",
    # r12 overflow-gate lifts on fact tables — slopes should stay in
    # the sublinear band (lifted products price per histogram/month
    # row, not per fact row) and the run doubles as the 100x
    # ARITHMETIC_OVERFLOW smoke for the new decimal forms (t84/t79
    # are documents-side and out of scalecheck scope by design)
    "q140_ks_drift_test",
    "q185_forecast_backtest",
]


def build(spark, n: int, src: str, dst: str) -> None:
    """Write a re-keyed n-fold replica of the fact tables (and a
    same-writer copy of the dims) so 1x and Nx share file layout."""
    os.makedirs(dst, exist_ok=True)
    tables = [
        f[: -len(".parquet")]
        for f in sorted(os.listdir(src))
        if f.endswith(".parquet")
    ]
    for name in tables:
        df = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
        if name in FACT_KEYS and n > 1:
            reps = []
            for r in range(n):
                rep = df
                for k in FACT_KEYS[name]:
                    rep = rep.withColumn(k, F.col(k) + F.lit(r * STRIDE))
                reps.append(rep)
            out = reps[0]
            for rep in reps[1:]:
                out = out.unionAll(rep)
        else:
            out = df
        out.write.mode("overwrite").parquet(os.path.join(dst, f"{name}.parquet"))


def measure(spark, queries, sf_dir: str) -> dict[str, float]:
    times: dict[str, float] = {}
    # warm-up amortizes codegen/session boot, mirroring bench.py
    queries["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in QUERIES:
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(time.perf_counter() - t0)
        times[name] = round(min(samples), 3)
        spark.catalog.clearCache()
    return times


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scalecheck"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(f"scalecheck-local[{cpus}]", driver_memory="24g")
    d1, dn = os.path.join(outdir, "x1"), os.path.join(outdir, f"x{n}")
    if os.path.isdir(outdir):
        shutil.rmtree(outdir)
    build(spark, 1, SF_DIR, d1)
    build(spark, n, SF_DIR, dn)
    queries = all_queries()
    t1 = measure(spark, queries, d1)
    tn = measure(spark, queries, dn)
    rows = {
        q: {
            "t_1x": t1[q],
            f"t_{n}x": tn[q],
            "slope": round(tn[q] / (n * t1[q]), 3),
        }
        for q in QUERIES
    }
    print(json.dumps({"n": n, "sf_dir": SF_DIR, "queries": rows}))


if __name__ == "__main__":
    main()
