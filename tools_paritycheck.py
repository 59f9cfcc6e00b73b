#!/usr/bin/env python
"""Single-entry DuckDB parity check at one or more SFs.

Usage: ``python tools_paritycheck.py NAME [NAME...] [--sf sf0.001,sf0.01]``
Runs the same compare as tools_paritysweep.py but only for the named
registry entries — the fast inner loop while authoring a new operator.
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
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sfs = ["sf0.001", "sf0.01"]
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sfs = a[5:].split(",")
    spark = get_spark("paritycheck", driver_memory="8g")
    qs, osql = registry.all_queries(), registry.all_oracle_sql()
    bad = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        con = duck_connection(sf_dir)
        for name in names:
            t0 = time.time()
            if name not in osql:
                n = qs[name](spark, sf_dir).count()
                print(f"{sf} {name}: rows-only, {n} rows ({time.time()-t0:.1f}s)")
                continue
            try:
                problems = compare(
                    name,
                    qs[name](spark, sf_dir),
                    con.sql(osql[name]).arrow().to_pandas(date_as_object=True),
                )
            except Exception as exc:
                problems = [f"EXC {type(exc).__name__}: {str(exc)[:300]}"]
            tag = "OK" if not problems else f"MISMATCH {problems[:2]}"
            if problems:
                bad += 1
            print(f"{sf} {name}: {tag} ({time.time()-t0:.1f}s)", flush=True)
        con.close()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
