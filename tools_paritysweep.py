#!/usr/bin/env python
"""Registry-wide DuckDB parity sweep at an arbitrary scale factor.

The driver's correctness gate runs at sf0.01; this tool reruns the
SAME comparison over every oracle-backed entry at any SF directory —
the deep-verification pass that catches scale-dependent divergence
(rounding half-boundaries, overflow, join-order-sensitive floats) the
small-SF gate can't see. The sf0.1 run of this sweep found t61's
ROUND half-boundary bug (3 of 5000 docs).

Usage: ``python tools_paritysweep.py [sf_dir]`` (default sf0.1).
Prints one line per mismatch and a final summary; exit code 1 on any
mismatch. Expect the heavy dedup/component oracles (d47, d49, d51,
q94) to dominate wall time at sf0.1 — that is DuckDB-side recursive
CTE / quadratic-oracle cost, not engine cost.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pinot_pulsar_plugin_spark import registry
from pinot_pulsar_plugin_spark.session import get_spark
from tests.oracle_harness import compare, duck_connection


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("paritysweep", driver_memory="16g")
    qs, osql = registry.all_queries(), registry.all_oracle_sql()
    con = duck_connection(sf_dir)
    bad = 0
    t0 = time.time()
    for name in sorted(osql):
        t1 = time.time()
        try:
            problems = compare(
                name,
                qs[name](spark, sf_dir),
                con.sql(osql[name]).arrow().to_pandas(date_as_object=True),
            )
        except Exception as exc:
            problems = [f"EXC {type(exc).__name__}: {str(exc)[:200]}"]
        if problems:
            bad += 1
            print(f"MISMATCH {name}: {problems[:2]}", flush=True)
        dt = time.time() - t1
        if dt > 30:
            print(f"slow (oracle-side at this SF): {name} {dt:.0f}s", flush=True)
    print(
        f"swept {len(osql)} oracles at {sf_dir} in {time.time() - t0:.0f}s; "
        f"mismatches: {bad}",
        flush=True,
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
