#!/usr/bin/env python
"""Regenerate the SURVEY.md §8 coverage-ledger table in place.

One row per registry entry: name → implementation file:line → oracle
status → the driver rounds whose CORRECTNESS_r*.json verified it →
whether it sits in the CURRENT scored window. The table is generated
from the registry and the artifacts themselves (VERDICT r7 #6: the
hand-maintained narrative went stale at 209/203 while the repo was at
311/305), so re-running this after adding operators or after a driver
round keeps §8 exact: ``python tools_ledger.py``.

The table is written between the ``<!-- LEDGER:BEGIN -->`` /
``<!-- LEDGER:END -->`` markers; everything outside them is untouched.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ROOT = os.path.dirname(os.path.abspath(__file__))
BEGIN = "<!-- LEDGER:BEGIN -->"
END = "<!-- LEDGER:END -->"


def _rounds_by_name() -> dict[str, list[str]]:
    """name → sorted driver rounds with a verified row (hash-green, or
    rows-only with err in (None, 'no_oracle'))."""
    out: dict[str, set[str]] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")].lstrip("0")
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") or (
                row.get("spark_rows") is not None
                and row.get("err") in (None, "no_oracle")
            ):
                out.setdefault(name, set()).add(rnd)
    return {n: sorted(rs, key=int) for n, rs in out.items()}


def build_table() -> str:
    from pinot_pulsar_plugin_spark.registry import (
        all_oracle_sql,
        all_queries,
        priority_window,
    )

    queries = all_queries()
    oracle = all_oracle_sql()
    window = set(priority_window())
    rounds = _rounds_by_name()

    lines = [
        "| entry | implementation | oracle | driver rounds | in window |",
        "|---|---|---|---|---|",
    ]
    for name in sorted(queries):
        fn = queries[name]
        mod = fn.__module__.removeprefix("pinot_pulsar_plugin_spark.")
        loc = f"`{mod.replace('.', '/')}.py:{fn.__code__.co_firstlineno}`"
        okind = "sql" if name in oracle else "rows-only"
        rs = rounds.get(name)
        drounds = ", ".join(f"r{r}" for r in rs) if rs else "—"
        lines.append(
            f"| {name} | {loc} | {okind} | {drounds} | "
            f"{'yes' if name in window else ''} |"
        )

    n_oracle = sum(1 for n in queries if n in oracle)
    verified = sum(1 for n in queries if n in rounds)
    header = (
        f"Registry: **{len(queries)} queries / {n_oracle} oracle-backed**; "
        f"driver-verified union **{verified}/{len(queries)}** "
        f"(from CORRECTNESS_r*.json; rows-only-by-design entries count "
        f"via their clean rows-only row). \"in window\" = among the 50 "
        f"entries the next driver run scores (self-derived, "
        f"registry.derive_priority). Regenerate with "
        f"`python tools_ledger.py`.\n"
    )
    return header + "\n" + "\n".join(lines) + "\n"


def main() -> None:
    path = os.path.join(ROOT, "SURVEY.md")
    with open(path) as fh:
        text = fh.read()
    if BEGIN not in text or END not in text:
        raise SystemExit("SURVEY.md is missing the LEDGER markers")
    pre, rest = text.split(BEGIN, 1)
    _, post = rest.split(END, 1)
    with open(path, "w") as fh:
        fh.write(pre + BEGIN + "\n" + build_table() + END + post)
    print("SURVEY.md ledger regenerated")


if __name__ == "__main__":
    main()
