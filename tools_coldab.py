#!/usr/bin/env python
"""Cold A/B harness (VERDICT r12 #1): fresh-process min-of-N timings.

Each sample is a brand-new Python process (new JVM, new codegen cache,
new file-listing cache) that boots the bench session, runs the q01
warm-up exactly like bench.py, then times ONE execution of the target
query against the noop sink. This isolates "driver-host load" from
"plan/code drift": bench.py's in-session min-of-3 shares JVM state
across queries, so a cold regression that bench.py can't see (e.g. a
Spark-version re-plan that only bites on first execution) shows up
here, and a host-load story predicts elevated AND variable samples
across fresh processes while a code story predicts flat-elevated ones.

Usage: python tools_coldab.py q119_column_profile q149_bfs_reachability
       [--samples=5] [--sf-dir=/root/testdata/sf0.1]
Prints one JSON object: per-query sample lists, min/median, loadavg
before each sample.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pinot_pulsar_plugin_spark.registry import all_queries
from pinot_pulsar_plugin_spark.session import get_spark

spark = get_spark("coldab", driver_memory="24g")
queries = all_queries()
sf_dir = {sf_dir!r}

def run(name):
    t0 = time.perf_counter()
    queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

run("q01_pricing_summary")  # identical warm-up to bench.py
ts = [run({name!r}) for _ in range({inproc})]
print("COLDAB_RESULT " + json.dumps(ts), flush=True)
"""


def _loadavg() -> list[str]:
    try:
        with open("/proc/loadavg") as f:
            return f.read().split()[:3]
    except OSError:
        return []


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(
        a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--")
    )
    samples = int(opts.get("samples", "5"))
    # in-process runs per sample: 1 = pure cold (first execution);
    # 3 = bench.py-comparable (its per-query metric is in-session
    # min-of-3, which amortizes JIT/codegen warm-up the first run pays)
    inproc = int(opts.get("inproc", "1"))
    sf_dir = opts.get("sf-dir", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.abspath(__file__))
    out: dict[str, dict] = {}
    for name in names:
        rows = []
        for i in range(samples):
            load_before = _loadavg()
            child = _CHILD.format(
                repo=repo, sf_dir=sf_dir, name=name, inproc=inproc
            )
            proc = subprocess.run(
                [sys.executable, "-c", child],
                capture_output=True,
                text=True,
                cwd="/tmp",  # non-repo cwd, same as the driver
            )
            ts = None
            for line in proc.stdout.splitlines():
                if line.startswith("COLDAB_RESULT "):
                    ts = json.loads(line.split(" ", 1)[1])
            if ts is None:
                rows.append(
                    {
                        "error": proc.stderr.strip().splitlines()[-3:],
                        "loadavg": load_before,
                    }
                )
            else:
                row = {
                    "t": round(min(ts), 3),
                    "first": round(ts[0], 3),
                    "loadavg": load_before,
                }
                if len(ts) > 1:
                    row["runs"] = [round(x, 3) for x in ts]
                rows.append(row)
            print(
                f"  {name} sample {i + 1}/{samples}: "
                f"{rows[-1].get('t', 'ERROR')} load={load_before}",
                file=sys.stderr,
                flush=True,
            )
        ts = [r["t"] for r in rows if "t" in r]
        out[name] = {
            "samples": rows,
            "min": round(min(ts), 3) if ts else None,
            "median": round(sorted(ts)[len(ts) // 2], 3) if ts else None,
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
