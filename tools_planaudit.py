#!/usr/bin/env python
"""Registry-wide physical-plan audit → PLAN_AUDIT.json.

Compiles every registry query (no execution) and records the
scale-relevant plan facts the gates assert piecemeal — shuffle count,
shuffle keys, broadcast/cartesian/nested-loop joins, Python eval nodes,
WindowGroupLimit, pushed filters — as one machine-readable artifact.
Run after operator changes: ``python tools_planaudit.py``.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pinot_pulsar_plugin_spark.plans.explain import formatted_plan
from pinot_pulsar_plugin_spark.registry import all_oracle_sql, all_queries
from pinot_pulsar_plugin_spark.session import get_spark

SF = "/root/testdata/sf0.001"

# Triage ledger for repeated_scan_suspects (VERDICT r9 #6: every new
# suspect gets a triage note THE ROUND IT APPEARS). A suspect is a
# cache-free plan scanning one table >= 3x in COLD lineage; each entry
# names why the repeated pruned re-read is the intended 100-TB shape
# (or points at the recorded measurement that rejected a persist).
# tests/test_plan_quality.py::test_every_repeated_scan_suspect_triaged
# fails the suite when a suspect is missing here — a new re-derivation
# cannot land untriaged. Flags are session-dependent by construction
# (has_cache reflects plan-keyed entries persisted by ANY earlier
# query), so regen from a fresh chained session (ROUND10_NOTES §5).
_SUSPECT_TRIAGE = {
    # measured-and-reverted cheap-lineage persists (r8 §8 A/Bs): the
    # re-scan of a page-cached pruned parquet column beat the extra
    # materialization job locally and a pruned columnar re-read beats
    # cache memory pressure at scale.
    "q77_forward_fill": "cheap-lineage re-scan; persist A/B'd and reverted (r8)",
    "q79_mixture_weights": "cheap-lineage re-scan; persist A/B'd and reverted (r8)",
    "q80_domain_resample": "doc-side broadcast + cheap pruned re-scan (r8)",
    "q92_gapfill_interpolate": "cheap-lineage re-scan; persist A/B'd and reverted (r8)",
    "q101_split_balance_audit": "per-split pruned audit branches; cheap lineage (r8)",
    "q103_large_volume_customers": "decorrelated subquery re-reads pruned cols (r8)",
    "q139_incremental_join_view": "delta algebra joins base+delta legs; cheap pruned reads (r8)",
    "q156_cohort_ltv": "cohort spine + fact legs, each column-pruned (r8)",
    "q158_largest_remainder_alloc": "cheap-lineage re-scan; persist A/B'd and reverted (r8: 0.83->1.04)",
    "q164_cohort_retention_curve": "cohort spine + fact legs, each column-pruned (r8)",
    "q165_quota_sample_execution": "cheap-lineage re-scan; persist A/B'd and reverted (r8: 0.85->1.17)",
    "q168_survivorship_merge": "source-precedence legs over pruned reads (r8)",
    "q171_shuffle_skew_report": "cheap-lineage re-scan; persist A/B'd and reverted (r8: 0.46->0.93)",
    # multi-pass blocking / per-branch audit (documented in docstrings)
    "q69_levenshtein_pairs": "length-band blocking passes re-read pruned columns (docstring)",
    "q85_referential_audit": "per-branch pruned re-reads beat a fused wide-shuffle pass (docstring)",
    # multi-grain token statistics: each grain is a pruned re-scan of
    # one text column; fusing grains would shuffle wide token relations
    "t61_token_surprisal": "multi-grain token stats over one pruned text column",
    "t63_bigram_surprisal": "multi-grain token stats over one pruned text column",
    "t68_top_keywords": "corpus-df leg + per-doc leg over one pruned text column",
    "t69_bm25_search": "df/len/tf legs over one pruned text column",
    "t73_chi2_term_assoc": "per-class term counts over one pruned text column",
    "t79_vocab_growth": "per-prefix vocab legs over one pruned text column",
    # similarity/dedup: corpus-wide vector caching is the anti-goal;
    # legs re-read column-pruned embeddings bounded by broadcast sides
    "d48_embedding_neardup_lsh": "signature self-join + two POST-dedup vector rejoins (r10 triage)",
    "d56_chunk_rewrite_dedup": "chunk manifest + rewrite legs over pruned doc columns",
    "s50_ann_ivf_topk": "centroid/assignment/probe legs over pruned reads, K-row broadcast bound (r10 triage)",
    "s53_kmeans_step": "assignment + update legs over pruned embedding reads",
    "s55_pq_adc_topk": "codebook build + ADC legs; codebook broadcast, no corpus shuffle",
    "s59_mips_norm_augmented": "norm-augment + probe legs over pruned embedding reads",
    "s61_ndcg_eval": "ranked + ideal legs re-read pruned embeddings (ground-truth comparison)",
}


def _hashpartitioning_args(plan: str) -> list[str]:
    """Full argument text of every hashpartitioning(...) in the plan,
    scanned to the MATCHING close paren (review r11 #3: a non-greedy
    or first-paren regex drops key columns that follow an
    expression-wrapped key)."""
    out = []
    marker = "hashpartitioning("
    i = plan.find(marker)
    while i != -1:
        j = i + len(marker)
        depth = 1
        while j < len(plan) and depth:
            if plan[j] == "(":
                depth += 1
            elif plan[j] == ")":
                depth -= 1
            j += 1
        out.append(plan[i + len(marker) : j - 1])
        i = plan.find(marker, j)
    return out


def audit_plan(plan: str) -> dict:
    node_ids = re.findall(r"\(\d+\) (\w+)", plan)
    row = {
        "exchanges": node_ids.count("Exchange"),
        # ALL column names inside each hashpartitioning's argument list
        # (balanced-paren scan, so keys wrapped in expressions — casts,
        # knownfloatingpointnormalized — don't truncate the capture),
        # as one sorted set. The old first-column-only capture wobbled
        # between regens on multi-distinct Expand plans, where
        # Catalyst's distinct-group ordering is not stable across JVMs
        # (q119: o_orderkey vs o_totalprice leading the same
        # partitioning).
        "shuffle_keys": sorted(
            {
                col
                for args in _hashpartitioning_args(plan)
                for col in re.findall(r"(\w+)#\d+", args)
            }
        ),
        "range_partitioning": "rangepartitioning" in plan,
        "broadcast_hash_joins": node_ids.count("BroadcastHashJoin"),
        "sort_merge_joins": node_ids.count("SortMergeJoin"),
        "bnlj": node_ids.count("BroadcastNestedLoopJoin"),
        "cartesian": node_ids.count("CartesianProduct"),
        "window_group_limit": "WindowGroupLimit" in plan,
        "take_ordered": "TakeOrderedAndProject" in plan,
        "python_eval": bool(
            re.search(r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|FlatMapCoGroupsInPandas|ArrowAggregatePython|ArrowWindowPython|MapInArrow|PythonUDTF", plan)
        ),
        "expand": "Expand" in node_ids,
        "generate": "Generate" in node_ids,
        "pushed_filters": len(re.findall(r"PushedFilters: \[[^\]\[]", plan)),
        "scans": node_ids.count("Scan"),
    }
    # Recursive CTEs (WITH RECURSIVE → UnionLoop) keep their loop body
    # LOGICAL until runtime: no Exchange/Scan/CartesianProduct physical
    # nodes exist to count, so the physical fields above are vacuously
    # zero and the cartesian/python gates cannot see inside (VERDICT
    # r6 #5 / r7 #5). Mark the row honestly and record the logical
    # body's node census so the row is non-vacuous: LogicalRelation =
    # table scans per iteration, Join = per-iteration joins (physical
    # strategy chosen at runtime per iteration).
    if "UnionLoop" in node_ids:
        row["recursive"] = True
        row["unaudited"] = True
        row["logical_scans"] = node_ids.count("LogicalRelation")
        row["logical_joins"] = node_ids.count("Join")
        row["logical_aggregates"] = node_ids.count("Aggregate")
    # Re-derivation telltale (r8 scan-economics program): the same
    # table scanned >= 3 times in one plan WITHOUT any cache present
    # usually means a shared relation is recomputed per consumer
    # (self-union legs, unmaterialized persist races). With a cache in
    # the plan the count is inflated by rendered build lineage, so the
    # heuristic only fires on cache-free plans. Informational, not a
    # gate — multi-pass designs (q69 blocking, q85 pruned-column
    # audits) legitimately re-scan.
    tables = re.findall(r"Location:.*?(\w+)\.parquet", plan)
    counts: dict[str, int] = {}
    for t in tables:
        counts[t] = counts.get(t, 0) + 1
    row["max_same_table_scans"] = max(counts.values(), default=0)
    row["has_cache"] = "InMemoryRelation" in plan
    return row


def _without_cached_subtrees(plan: str) -> str:
    """Drop every InMemoryRelation subtree from a tree-rendered plan
    string. The cache's BUILD lineage (exchanges, FileScans) renders
    inside the InMemoryRelation block but does not execute when the
    cache is read — counting it would double-charge cached plans."""
    kept = []
    skip_col = None
    for line in plan.split("\n"):
        col = len(line) - len(line.lstrip(" :+-="))
        if skip_col is not None:
            if line.strip() and col > skip_col:
                continue
            skip_col = None
        if "InMemoryRelation" in line:
            skip_col = col
            continue
        kept.append(line)
    return "\n".join(kept)


def audit_recursive_execution(df) -> dict:
    """VERDICT r8 #6: a UnionLoop body stays LOGICAL at compile time,
    so the static gates can't see inside. EXECUTE the query (recursive
    registry entries are bounded at sf0.001) and pin the loop body's
    physical facts from the executed plan: the body must join the
    UnionLoopRef frontier against the CACHE (InMemoryRelation), and no
    FileScan may execute outside a cache-build subtree — i.e. no
    per-iteration fact re-scan."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    stripped = _without_cached_subtrees(plan)
    return {
        "unaudited": False,
        "executed": True,
        "loop_refs": len(re.findall(r"UnionLoopRef", stripped)),
        "loop_body_joins": len(re.findall(r"\bJoin \w+", stripped)),
        "body_reads_cache": "InMemoryRelation" in plan,
        "scans_outside_cache": len(
            re.findall(r"FileScan|Scan parquet", stripped)
        ),
    }


def main() -> None:
    spark = get_spark("planaudit")
    queries = all_queries()
    oracles = all_oracle_sql()
    out = {}
    failed = []
    for name, fn in queries.items():
        try:
            plan = formatted_plan(fn(spark, SF))
        except Exception as exc:  # iterative ops that materialize internally
            failed.append((name, str(exc)[:100]))
            continue
        row = audit_plan(plan)
        row["oracle"] = name in oracles
        if row.get("unaudited"):
            try:
                row.update(audit_recursive_execution(fn(spark, SF)))
            except Exception as exc:
                row["executed_audit_error"] = str(exc)[:100]
        out[name] = row
    summary = {
        "n_queries": len(queries),
        "n_planned": len(out),
        "n_oracle_backed": sum(1 for r in out.values() if r["oracle"]),
        "with_cartesian": sorted(n for n, r in out.items() if r["cartesian"]),
        "with_python_eval": sorted(n for n, r in out.items() if r["python_eval"]),
        # Rows the physical gates can NOT vouch for (recursive loop
        # bodies planned at runtime) — any reader of the cartesian /
        # python gates must treat these as out of scope, not clean.
        "unaudited": sorted(n for n, r in out.items() if r.get("unaudited")),
        "repeated_scan_suspects": sorted(
            n
            for n, r in out.items()
            if r.get("max_same_table_scans", 0) >= 3 and not r.get("has_cache")
        ),
        "untriaged_suspects": sorted(
            n
            for n, r in out.items()
            if r.get("max_same_table_scans", 0) >= 3
            and not r.get("has_cache")
            and n not in _SUSPECT_TRIAGE
        ),
        "suspect_triage": {
            n: _SUSPECT_TRIAGE[n]
            for n, r in out.items()
            if r.get("max_same_table_scans", 0) >= 3
            and not r.get("has_cache")
            and n in _SUSPECT_TRIAGE
        },
        "max_exchanges": max((r["exchanges"], n) for n, r in out.items()),
        "plan_failures": failed,
    }
    artifact = {"summary": summary, "queries": out}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PLAN_AUDIT.json")
    with open(path, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
    print("PLAN_AUDIT.json:", summary)


if __name__ == "__main__":
    main()
