#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans of the headline
queries with the scale-review commentary. Run after changing any
headline operator: ``python tools_plansnap.py``."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pinot_pulsar_plugin_spark.plans.explain import formatted_plan
from pinot_pulsar_plugin_spark.registry import all_queries
from pinot_pulsar_plugin_spark.session import get_spark

SF = "/root/testdata/sf0.01"

COMMENTARY = {
    "q01_pricing_summary": (
        "Scan with the shipdate predicate in PushedFilters and a pruned "
        "ReadSchema → partial HashAggregate before the exchange (map-side "
        "combine: shuffle volume is #groups·#partitions) → final agg → "
        "tiny sort. One data shuffle. At 100 TB nothing changes: the scan "
        "parallelism grows, the shuffle stays #groups-sized."
    ),
    "q08_join_broadcast_agg": (
        "part (dim) is broadcast — the lineitem fact never shuffles for "
        "the join; the only exchange is the per-brand aggregate. At 1000 "
        "executors the dim ships once per executor, not per task."
    ),
    "q09_join_multiway": (
        "region→nation→customer collapse into one broadcast dim; "
        "orders⋈lineitem is the single shuffle join (AQE splits skewed "
        "partitions at runtime); aggregation is partial+final."
    ),
    "q25_topk_per_group": (
        "Window rank with a per-partition top-k filter: Spark inserts "
        "WindowGroupLimit before the exchange, so each map task forwards "
        "at most k rows per key — shuffle is bounded by k·#keys, not "
        "#rows."
    ),
    "q45_shipping_priority": (
        "Filtered star join: both timestamp filters reach PushedFilters; "
        "customer broadcasts; TakeOrderedAndProject replaces a global "
        "sort — each task keeps 10 rows, the driver merges."
    ),
    "d44_ngram_jaccard_pairs": (
        "Candidate pairs come from an equi-join keyed on the shingle "
        "itself — work tracks shingle collisions, never n². The persisted "
        "distinct-shingle stage is cached PRE-PARTITIONED on the shingle "
        "hash (r13) so the stop-list aggregation and both self-join legs "
        "reuse the cached partitioning — the corpus-sized relation "
        "shuffles once at materialization, not per consumer; stop-"
        "shingles (df > 10% of the corpus — the hot keys whose collisions "
        "are quadratic) are removed by a broadcast LeftAnti join before "
        "the self-join."
    ),
    "s48_cosine_topk": (
        "The 10-query side is broadcast; the corpus is scanned once, "
        "scored with a codegen'd fold, and per-query top-k is a bounded "
        "window. No corpus shuffle."
    ),
    "d48_embedding_neardup_lsh": (
        "Exact-rerank ANN dedup: bit-sampling signatures are a per-row "
        "map; the self-join shuffles only (vec_id, tbl, 5-bit bucket); "
        "the 64-dim vectors rejoin AFTER pair-dedup so wide rows move "
        "only for true candidates. Replaces d47's all-pairs nested loop "
        "at scale."
    ),
    "q75_sequence_packing": (
        "One hash exchange on the packing lane, a lane-local sort, and a "
        "running-sum window — no global sort / rangepartitioning. Lane "
        "count scales with the cluster; each lane packs independently."
    ),
    "d50_contamination": (
        "The benchmark shingle set (small by definition) is broadcast; "
        "the corpus shingle table streams map-side through the left "
        "join, and the only exchange is the per-doc aggregation."
    ),
    "s50_ann_ivf_topk": (
        "IVF: cell assignment is a broadcast product vs the K-row "
        "coarse-quantizer table (fan-out bounded by K, never data x "
        "data) folded into one map-side-combinable argmax agg; probing "
        "joins the broadcast query/probe table on cell id only, so the "
        "exact rerank touches ~nprobe/K of the corpus per query. At "
        "100 TB raise K toward sqrt(n) — assignment stays a scan-side "
        "map, candidates shrink."
    ),
    "q80_domain_resample": (
        "The per-source probability table (#domains rows, computed by "
        "one map-side-combined agg) is broadcast; the corpus is then "
        "filtered in place by a deterministic hash compare — the "
        "document side never shuffles, so the resample is scan-speed "
        "at any corpus size."
    ),
    "q84_bloom_semi_prune": (
        "Runtime-filter analog: the dim side reduces to a 1 KiB literal "
        "bitset via a distributed bit_or aggregate; the probe predicate "
        "runs in the FACT SCAN's codegen'd Filter, so at 100 TB "
        "~24/25ths of the fact rows die before the semi-join shuffle. "
        "False positives (~0.4%) are removed by the broadcast semi join "
        "that follows — result identical to the plain join."
    ),
    "t60_pii_redaction": (
        "Pure regexp_count/regexp_replace column expressions — the "
        "whole redaction pass is one codegen'd scan projection; no "
        "UDF, no shuffle, no driver involvement at any corpus size."
    ),
    "t61_token_surprisal": (
        "One explode, a map-side-combinable document-frequency "
        "aggregate keyed on token, an equi-join back on token, and the "
        "per-doc aggregate — every exchange keyed and combinable. The "
        "per-token idf is fixed-point BEFORE the sum, so the aggregate "
        "is an order-independent integer sum (engine-portable)."
    ),
    "q85_referential_audit": (
        "Seven anti-join branches unioned into one summary: each "
        "branch broadcasts the smaller distinct-key side where "
        "possible and reduces to a partial-aggregated scalar. One "
        "column-pruned single-key scan per BRANCH (lineitem 5x) — "
        "deliberately kept over a fused single pass, which would ship "
        "the full fact through three differently-keyed exchanges; "
        "pruned re-reads beat wide re-shuffles at 100 TB."
    ),
    "d52_prefix_filter_jaccard": (
        "Exactly three narrow shuffles (gated): document frequency "
        "(groupBy h), per-doc rarity-sorted arrays (groupBy doc_id), "
        "candidate dedup (doc_a, doc_b). The prefix self-join carries "
        "bare (doc_id, bigint-hash) pairs; full arrays rejoin only for "
        "deduplicated candidates and the exact intersection is a "
        "per-row array_intersect. Indexing only rarity-first prefixes "
        "is EXACT pruning (AllPairs/PPJoin proof in the docstring) — "
        "hot shingles land in suffixes and never generate candidates."
    ),
    "q87_bloom_subquery_prune": (
        "The scalable runtime-filter shape: the 2^20-bit bitset is "
        "built fully distributed (range-join densification, no driver "
        "collect), persisted, and probed through a scalar subquery at "
        "the orders scan — plan text stays constant-size at any "
        "m_bits, and non-matching rows drop inside codegen before the "
        "join shuffle. False positives are removed by the broadcast "
        "semi join that follows."
    ),
    "t62_top_ngram_coverage": (
        "ZERO-shuffle narrow map (r13): the top gram is found by an "
        "in-row sorted-run champion fold over each row's 3-gram array "
        "— the old explode → count exchange → per-doc window → spine "
        "join collapsed into the scan projection. Tie-break preserved "
        "structurally (runs visited in ascending gram order, strict-> "
        "replacement). No exchange at any corpus size, no Python."
    ),
    "d53_dup_span_fraction": (
        "Span hashes are computed in-row (xxhash64 over the token slice, "
        "multiplicity kept) → one map-side-combinable count on the 8-byte "
        "hash → the span table rejoins that count on h (both sides already "
        "hash-partitioned on h; AQE skew-split covers boilerplate spans) → "
        "per-doc combinable count → broadcast-sized left join back to the "
        "doc spine. No pair formation anywhere: a hot span costs its "
        "occurrence count linearly, unlike a similarity self-join."
    ),
    "q90_scd2_intervals": (
        "The whole SCD2 build — lag change-detection, collapse filter, "
        "lead validity stamp — shares one user_id hash partition: Catalyst "
        "plans exactly ONE exchange (a filter preserves distribution and "
        "order). At 100 TB this is the same exchange budget as a bare "
        "lag() window."
    ),
    "q91_trimmed_mean": (
        "Rank window and per-group count share the event_type exchange; "
        "the final aggregate reuses the same partitioning, so the exact "
        "rank-trim costs ONE exchange plus the per-group sort that "
        "exactness inherently requires. The mean is a fixed-point integer "
        "sum — partial_sum combines map-side."
    ),
    "d54_winnow_neardup_pairs": (
        "Winnowing selects ~1/(w/2) of the rolling hashes IN-ROW (no "
        "explode before the fingerprint table), then d44's pair shape "
        "runs over the smaller input: per-doc counts, fingerprint "
        "equi-join, Jaccard filter. Narrow keys only (f, doc_id, doc_a)."
    ),
    "s52_knn_label_accuracy": (
        "The probe set broadcasts (eval sets stay small by design); the "
        "corpus never shuffles for the scoring join. Rank-1 argmin is a "
        "WindowGroupLimit: each task forwards one row per probe before "
        "the exchange. Cost is #probes x corpus - a linear scoring scan."
    ),
    "q92_gapfill_interpolate": (
        "Observation aggregate combines map-side; the hour spine is "
        "broadcast one-row min/max x distinct types (tiny cross); all "
        "four fill windows (prev/next value and bucket) collapse into "
        "ONE Window operator over one (event_type, bucket) sort."
    ),
    "q93_mad_outliers": (
        "Two exact interpolated medians, each broadcast back onto the "
        "event scan - the events table shuffles never; every exchange "
        "keys on event_type and combines map-side."
    ),
    "st61_interval_join": (
        "Equi-join on user_id with the 2-hour bound as a join "
        "post-filter - never a nested loop over the range predicate. "
        "In streaming the same bound expires the join state."
    ),
    "q94_pareto_frontier": (
        "Both dominance RANGE frames (strict and inclusive running max) "
        "collapse into ONE Window over ONE lang exchange and one sort - "
        "the O(n log n) skyline sweep; the oracle's quadratic NOT EXISTS "
        "never appears in the engine plan."
    ),
    "q95_weighted_sample": (
        "Sequential-Poisson priorities are a per-row integer-hash map; "
        "rank-then-filter lowers to WindowGroupLimit so each map task "
        "forwards at most K rows per language before the single lang "
        "exchange. At 100 TB the shuffle is K x #strata, not the corpus."
    ),
    "q96_rollup_serving": (
        "ONE fact scan feeds Expand (the grouping-set multiplier) with "
        "partial aggregation before the single exchange; the serving "
        "filter (_gid = 1) runs on the #groups-sized cube output - the "
        "fact table is never rescanned per query. In production the cube "
        "lands as a summary table refreshed incrementally per micro-batch."
    ),
    "q97_blocking_supplier": (
        "The EXISTS / NOT EXISTS pair decorrelates to LeftSemi + LeftAnti "
        "hash joins on l_orderkey (broadcast at this scale, shuffled at "
        "100 TB) - per-row subquery re-execution never happens; the final "
        "count aggregates on s_suppkey only."
    ),
    "q98_dominant_part_supplier": (
        "The correlated scalar aggregate inside HAVING becomes a "
        "standalone per-partkey aggregate joined back on the group key; "
        "the IN becomes a semi join. Three hash aggregates, zero nested "
        "loops, shuffles only on l_partkey/l_suppkey/s_suppkey."
    ),
    "st63_window_topk": (
        "Combinable count keyed (window, type) - vocabulary-sized - then "
        "WindowGroupLimit keeps <=k rows per window map-side before the "
        "window exchange. The streaming form ranks inside foreachBatch: "
        "append-mode watermarked windows close exactly once, so per-batch "
        "ranking is globally correct with zero cross-batch merge state."
    ),
    "t64_doc_chunking": (
        "sequence + posexplode + substring inside whole-stage codegen: "
        "zero exchanges at any corpus size, ReadSchema pruned to "
        "(doc_id, text, n_chars). Chunk offsets keep provenance for "
        "downstream dedup/citation."
    ),
    "t65_top_bigrams": (
        "In-row bigram arrays (transform over the token array - no "
        "shuffle), one map-side-combinable count on the bigram, then "
        "TakeOrderedAndProject: each task forwards only its local top-K "
        "and the driver merges K-sized heaps - no global sort ever."
    ),
    "s53_kmeans_step": (
        "Centroids broadcast as a conditionless K-row product (bounded "
        "fan-out, the s50 quantizer shape); distances computed map-side; "
        "argmin lowers to WindowGroupLimit before the vec_id exchange; "
        "the recompute is one hash aggregate keyed (cluster, dim). "
        "Vector payloads never shuffle - only ids and k x dim sums."
    ),
    "d55_incremental_dedup": (
        "Delta-vs-corpus only: the exact screen broadcasts the corpus "
        "signature set; the shingle equi-join pairs delta x corpus "
        "(never corpus x corpus - the quadratic term a full re-dedup "
        "pays). In production the corpus shingle index is the persisted "
        "side and incremental cost is |delta|-driven."
    ),
    "q99_weighted_median": (
        "Cumulative and total windows plus the pick aggregate share ONE "
        "hash exchange on the group key; the selection (cumw*2 >= totw) "
        "is pure integer arithmetic. The per-group sort is the inherent "
        "cost of an exact quantile - q57's sketch is the approximate path."
    ),
    "q100_value_drift": (
        "Global min reduced map-side, broadcast back as one row; then a "
        "single combinable aggregate on event_type carrying five integer "
        "sufficient statistics. Slope/intercept are driver-free column "
        "arithmetic on the aggregate output - same exchange budget as a "
        "count."
    ),
    "q104_inactive_high_balance": (
        "TPC-H Q22 shape: the positive-balance average is a one-row "
        "aggregate broadcast into the filter (bounded product); the NOT "
        "EXISTS is a LeftAnti hash join with orders pruned to o_custkey "
        "at the scan; the per-nation rollup combines map-side. The "
        "threshold compares exact integer cents (bal·n > sum), so no "
        "boundary customer can flip on a last-ulp AVG difference."
    ),
    "d56_chunk_rewrite_dedup": (
        "Rewriting dedup with the text kept off the wide exchanges: "
        "winner election is a map-side-combinable min over (xxhash64, "
        "doc_id, pos) triples — ≤24-byte rows through the h exchange — "
        "then the winner set joins back on (doc_id, pos) and the rebuild "
        "groups on doc_id with an in-row sorted array_join. Chunk text "
        "crosses the wire exactly twice, the unavoidable data motion of "
        "any rewrite."
    ),
    "q105_pagerank_transactions": (
        "Pregel-on-SQL: the (src, dst, deg) adjacency is built once — "
        "symmetric doubling is an in-row explode, not a self-union (a "
        "union of the unpersisted pair relation recomputed the "
        "order⋈lineitem distinct per leg: 12 fact scans before r8) — "
        "then persisted AND materialized, so the rank seed and both "
        "iterations read InMemoryTableScan and each fact is scanned "
        "once. Each iteration is one hash join of the #nodes-sized "
        "rank table plus one combinable dst-keyed sum. Integer "
        "micro-unit ranks (r div deg, damping in integer arithmetic) "
        "make the output independent of shuffle schedule — the "
        "determinism float PageRank lacks. Hubs are AQE skew-split "
        "cases, not plan changes."
    ),
    "s56_silhouette_by_label": (
        "The k-row fixed-point centroid table broadcasts back onto the "
        "scan; each point's a/b distances are a conditional min over its "
        "k co-located candidate rows, so partial aggregation collapses "
        "every point to ONE narrow row before the vec_id exchange; the "
        "per-label mean is a floored integer micro-unit division — no "
        "ROUND-on-quotient hazard."
    ),
    "t67_token_entropy": (
        "Entire entropy computation is an in-row expression over a "
        "column-pruned scan: per-token counts from the sorted-run fold "
        "(r13 — O(n log n) per row, was O(distinct·n) filter scans), "
        "per-term fixed-pointing (presum), integer division at the "
        "end. Zero exchanges at any corpus size."
    ),
    "q106_equidepth_bins": (
        "One event_type exchange; row_number and the partition count "
        "share a single Window stack over one sort; bin assignment is "
        "exact integer rank arithmetic (((rk-1)·B) div n) with a unique "
        "tiebreak, so boundaries are bit-deterministic. The per-group "
        "sort is the inherent cost of exact quantiles; q57's sketch is "
        "the unbounded-cardinality path."
    ),
    "q107_purchase_attribution": (
        "All three IGNORE NULLS carries (ts, id, type) share one "
        "strictly-preceding ROWS frame over ONE user-keyed Window — the "
        "event volume shuffles once, on user_id, and never again; the "
        "purchase filter and the 3-day integer-microsecond credit window "
        "are post-projections."
    ),
    "t68_top_keywords": (
        "tf and df are map-side-combinable aggregates; the token-keyed "
        "df join is the only vocabulary-sized exchange; the per-doc "
        "top-3 lowers to WindowGroupLimit so each map task forwards ≤3 "
        "rows per document; the corpus count is a broadcast one-row "
        "product. Scores are integer micro-units (presum), so ranking "
        "ties break identically cross-engine."
    ),
    "m60_phash_neardup_candidates": (
        "The 64-bit aHash is an in-row integer expression; the persisted "
        "hash table (materialization barrier — without it the "
        "interpreted higher-order expression re-evaluates inside the "
        "join condition per candidate pair, measured 80s→9.3s) feeds a "
        "16-bit band equi-join carrying (doc_id, ahash) only; exact "
        "xor/bit_count rerank. Payload text never shuffles."
    ),
    "q108_journey_paths": (
        "WITH RECURSIVE over the aggregated transition graph: events pay "
        "one user-keyed exchange for the lag edges, and the edge "
        "aggregate is persisted+materialized BEFORE the recursion — a "
        "CTE referenced inside UnionLoop is re-planned per iteration, "
        "so the inlined form re-scanned and re-windowed the fact every "
        "step (r8 fix: 2.26s → 0.87s at sf0.1). The recursion then "
        "iterates joins against the cached #event_types²-row relation — "
        "the frontier grows with path count, never with event volume; "
        "depth bound terminates cycles; integer path scores are "
        "schedule-independent."
    ),
    "q111_zorder_layout_audit": (
        "The Morton code is pure in-row bit arithmetic (5 mask-shift "
        "rounds per dimension inside codegen); the only exchange is the "
        "combinable bucket aggregate, so the audit costs one narrow "
        "shuffle of (bucket, partial-minmax) rows at any corpus size. "
        "The layout it validates gives 2-D row-group pruning on the "
        "subsequent reads."
    ),
    "q112_salted_supplier_revenue": (
        "Salted-join demo in the beyond-broadcast regime: the fact side "
        "carries a deterministic 8-way salt computed in-row, the "
        "supplier side replicates 8×, and both exchanges hash on "
        "(l_suppkey, _salt) into a ShuffledHashJoin — a hot supplier "
        "spreads over 8 tasks. Revenue is the fixed-point presum; the "
        "plain unsalted join is the oracle, so salting is proven "
        "row-invisible."
    ),
    "q113_disjunctive_revenue": (
        "OR-of-ANDs predicate split by Catalyst into per-side residues: "
        "the lineitem scan sees the union of quantity bounds, the part "
        "scan sees brand/size — both in PushedFilters, so the broadcast "
        "join probes only candidate rows. The cross-clause residual "
        "evaluates post-join inside codegen."
    ),
    "q114_top_revenue_supplier": (
        "Quarter filter at the scan; per-supplier revenue is a "
        "combinable integer aggregate persisted once (#suppliers rows), "
        "so the fact scans a single time; the scalar MAX joins back as "
        "a one-row broadcast and the tie-exact equality is integer "
        "fixed-point; supplier dim broadcasts."
    ),
    "q117_order_count_distribution": (
        "Aggregate of an aggregate: the join-condition filter keeps "
        "zero-order customers on the null-extended rows; the inner "
        "count pays one custkey exchange (map-side partial), the outer "
        "histogram exchange is #distinct-counts-sized — both shrink "
        "before they shuffle."
    ),
    "q118_nation_pair_volume": (
        "The nation dim joins twice under different aliases; all four "
        "dims broadcast so the fact pays only the orders join exchange "
        "plus the tiny final aggregate; shipdate bounds push to the "
        "scan and the symmetric pair predicate evaluates post-broadcast."
    ),
    "q119_column_profile": (
        "Whole-table profile from ONE parquet scan (r13 shape): each "
        "row explodes in-row into five typed (column, value) lanes, "
        "then a two-phase aggregate — per-(column, value) counts (the "
        "only data-volume exchange, sized by the columns' distinct "
        "cardinalities) and a #columns rollup. No multi-DISTINCT "
        "Expand (the r12 form's x6 row multiplication through a "
        "25-buffer aggregate; 2.29s -> 0.66s at sf0.1) — swap in HLL "
        "sketches (q116) to drop the distinct shuffle when estimates "
        "suffice. Numeric min/max aggregate on values (the double "
        "lane stays raw; cents conversion happens after min/max, "
        "which commutes because ROUND(x*100) is monotonic), never on "
        "string representations."
    ),
    "q121_incremental_rollup_merge": (
        "Materialized-view refresh algebra: each side partial-"
        "aggregates before the union, so the merge aggregate sees "
        "2 x #groups rows — history re-aggregation never happens; avg "
        "is derived from merged integer sums, never merged itself."
    ),
    "q122_exact_corr_by_flag": (
        "Five integer co-moments in ONE map-side-combinable exchange; "
        "Pearson/slope is a projection over the #flags-row result — "
        "bit-reproducible at any cluster size where native streaming "
        "corr() drifts by accumulation order."
    ),
    "q123_supplier_triangles": (
        "Motif counting: pair fanout is bounded by suppliers-per-part "
        "squared via the part-keyed self equi-join; the median cutoff "
        "is a one-row broadcast; u<v orientation counts each triangle "
        "once and keeps wedge extension one-directional; the persisted "
        "edge set feeds the two closure joins and both totals."
    ),
    "q124_min_cost_supplier": (
        "Q2 decorrelation over a DERIVED relation: the per-pair cost "
        "table is persisted once for both its consumers (the min "
        "aggregate and the equality join-back); the part filter "
        "pushes to its scan before any join; supplier and nation "
        "broadcast; integer-cents floor division keeps the MIN "
        "equality exact."
    ),
    "q120_pandas_grouped_agg": (
        "Grouped-aggregate pandas UDF: each group's column crosses to "
        "Python ONCE as an Arrow batch and returns a scalar, so the "
        "plan stays a normal two-phase aggregate around the Python "
        "eval — the bounded-group caveat of q53 applies, and the JVM "
        "percentile (q43) is the production spelling when expressible."
    ),
    "q115_udtf_installments": (
        "Python UDTF (the slow-path escape hatch, demonstrated like "
        "q54): the price filter reaches the parquet scan so only "
        "qualifying rows cross into Python, and the expansion factor is "
        "a constant 4. The same expansion is expressible JVM-side via "
        "explode(sequence(...)) — the entry exists to score the Spark 4 "
        "table-function surface end-to-end."
    ),
    "q126_local_supplier_volume": (
        "TPC-H Q5: four BroadcastExchanges (customer/supplier/nation/"
        "region) around ONE fact exchange (lineitem⋈orders SMJ on "
        "orderkey); the s_nationkey=c_nationkey cross-dimension equality "
        "evaluates as a post-broadcast residual where both keys are in "
        "hand. Final aggregate is ≤5 groups. At 100 TB the fact shuffle "
        "is the whole cost; dims stay MiB-scale."
    ),
    "q127_forecast_revenue": (
        "TPC-H Q6: shipdate/discount/quantity all in PushedFilters, "
        "4-column ReadSchema, partial aggregate → single 1-row exchange. "
        "The I/O-bound canary: if pushdown breaks anywhere, this plan "
        "shows it first (gated)."
    ),
    "q130_returned_item_customers": (
        "TPC-H Q10: returnflag+date filters cut the fact pre-exchange; "
        "customer/nation broadcast; TakeOrderedAndProject on the exact "
        "fixed-point revenue = per-partition top-20 then a 20-row merge "
        "— no global sort at any scale (gated)."
    ),
    "q136_sole_late_suppliers": (
        "TPC-H Q21 faithful form: the (orderkey, suppkey, is_late) "
        "projection persists once (InMemoryTableScan feeds all probes); "
        "EXISTS → LeftSemi and NOT-EXISTS → LeftAnti, both EQUI on "
        "orderkey with the suppkey<> residual post-match; supplier "
        "broadcasts. The wide fact is scanned once and never rides an "
        "exchange after the projection (gated)."
    ),
    "q137_compaction_binpack": (
        "File-grain aggregate (one exchange to file_id grain) → window "
        "partitioned BY COMPACTION GROUP (running sum, no global sort) → "
        "bin aggregate. Planning cost scales with #files not bytes; each "
        "group's plan is independent = shardable like a real table "
        "service."
    ),
    "q138_zonemap_prune_audit": (
        "Two segment-grain branches united: natural = key-derived "
        "segment aggregate (one exchange); clustered = year-partitioned "
        "row_number then segment aggregate. The audit output is "
        "metadata-sized; at 100 TB both branches stay "
        "one-exchange-per-layout."
    ),
    "s57_tfidf_similar_docs": (
        "Inverted index: (doc, term, tf) computed IN-ROW by the "
        "sorted-run fold (r13 — the token stream never explodes into "
        "an exchange), df aggregates, integer micro-unit weights "
        "persisted (computed once for postings AND norms), probe side "
        "broadcast into a TERM-keyed equi-join — fanout is Σ probe-term "
        "df, linear in corpus, never docs². Norm join is broadcast "
        "(probe) + keyed (candidate); final per-probe top-5 is a "
        "partitioned window."
    ),
    "s58_int8_quantized_topk": (
        "Quantization is a per-row JVM higher-order expression (no "
        "Python, no shuffle); probes broadcast (BNLJ against ≤8 rows — "
        "the bounded product class); integer dot folds stay in codegen; "
        "per-probe top-5 is a partitioned window. Corpus never "
        "shuffles."
    ),
    "t72_source_kl_divergence": (
        "The token stream collapses to per-(source, term) counts in one "
        "combinable aggregate — the only event-volume exchange; source "
        "totals, vocab size, and the pair table are tiny broadcasts; "
        "the term-keyed left join costs |counts|·(S−1) with S = "
        "#sources. Per-term fixed-point ln contributions enter an "
        "order-independent integer sum; the /n_a normalization is a "
        "pure double chain (never integer floor div — terms can be "
        "negative)."
    ),
    "q140_ks_drift_test": (
        "Events collapse to the per-(type, value) HISTOGRAM first (one "
        "combinable aggregate; value is 1e-2 fixed-point so histogram "
        "cardinality is value-range-bounded, not row-bounded); the "
        "cumulative window runs over histogram rows partitioned by "
        "type; min/max midpoint is a one-row broadcast. D's numerator "
        "is exact int64 rational arithmetic; only the final statistic "
        "and threshold are (bit-equal) doubles."
    ),
    "q141_kmv_theta_sketch": (
        "One distinct over (type, user) then per-type bottom-k as a "
        "rank-filtered window — WindowGroupLimit forwards at most k "
        "rows per group per map task, so the reducer sees #groups·k "
        "rows regardless of group size. The union sketch re-sketches "
        "k·#types hashes via TakeOrderedAndProject (broker-merge cost, "
        "no second scan). The md5 hash is an in-row expression at scan "
        "speed."
    ),
    "q142_negated_sequence_conversion": (
        "ONE user-keyed exchange and one ordered window pass: the "
        "running MAX over preceding rows of click/error timestamps is "
        "the entire CEP state (two longs), turning the per-pair "
        "'exists an event in the interval' probe into O(events) work — "
        "how a CEP engine compiles the NFA. Final per-user rollup is "
        "combinable."
    ),
    "q145_label_propagation": (
        "The (src, dst) edge relation (in-row explode doubling, "
        "persisted AND materialized — r8; with self-loops, the "
        "bipartite-oscillation damper) is reused by both LPA rounds; "
        "each round is one node-keyed join, one combinable (node, "
        "label) count, and a WindowGroupLimit argmax (map-side top-1 "
        "per node). Label payloads are node-id strings of bounded "
        "width; hub nodes are an AQE skew-split case, not a plan "
        "change."
    ),
    "s60_mmr_diversified_topk": (
        "The corpus is touched exactly once: the broadcast relevance "
        "scan (s48's shape — corpus never shuffles). The top-m "
        "shortlist carries its embeddings so the m² sims self-join "
        "never re-reads the corpus. The inherently-sequential greedy "
        "runs as FlatMapCoGroupsInPandas over (shortlist, sims) "
        "cogrouped by query — parallel across queries, zero driver "
        "loops, one Arrow batch per query."
    ),
    "q148_snapshot_diff": (
        "Each snapshot collapses to (key, fp, cents) at scan time — 32 "
        "bytes/row regardless of table width — then ONE key-keyed full "
        "outer SortMergeJoin; the unchanged-key filter runs before the "
        "output projection so the result is changelog-sized. With both "
        "snapshots bucketed by key the exchanges disappear; the final "
        "rollup is 3 combinable rows."
    ),
    "q149_bfs_reachability": (
        "The symmetric edge list is built once (distinct over the "
        "order⋈lineitem key projection, in-row explode doubling) and "
        "persisted+materialized (r8); each of the K "
        "rounds is one equi-join frontier⋈edges plus one anti-join "
        "against the visited set — all hash-partitioned on the node "
        "key, so AQE reuses the edge exchange across rounds. Frontier "
        "and visited stay node-grain. Fixed K keeps the whole "
        "traversal one declarative DAG."
    ),
    "q151_sliding_distinct": (
        "One combinable distinct to (type, user, day) grain is the only "
        "event-volume exchange; the ×7 window-membership explode runs "
        "on the REDUCED relation; the 7-day count is a single-distinct "
        "aggregate and the same-day count a plain COUNT on the already-"
        "distinct relation (r13 — no Expand, aggregate input 8×|obs| "
        "not 14×). No per-day rescans; window length is a fanout "
        "constant, not a plan change."
    ),
    "q152_theta_sketch_setops": (
        "14 exchanges, but all except the first distinct and the exact "
        "ground-truth join operate on ≤ k-row-per-type sketch state "
        "(thresholds, samples, pair algebra — broadcast joins). The "
        "exact intersection is a user-keyed equi-join bounded by "
        "per-user type combinations (the q109 shape). At 100 TB the "
        "sketches come from merged segment partials; the set "
        "expressions never touch base data."
    ),
    "q154_window_funnel": (
        "ONE user-keyed sort feeds both reversed-running-min window "
        "passes (same partition+order spec — Spark plans a single "
        "Window chain), then a combinable per-user max and a 3-row "
        "rollup. The naive per-anchor self-join is gone entirely; cost "
        "is linear in events/user, a power user is an AQE skew case."
    ),
    "q157_activity_streaks": (
        "One combinable distinct to (user, day) grain, then the island "
        "window, the streak group-by, and the best-streak "
        "WindowGroupLimit all share the SAME user-keyed exchange. "
        "Per-user state is its active-day count."
    ),
    "s61_ndcg_eval": (
        "Probes broadcast against the corpus (the s48 pattern — the "
        "corpus never shuffles); per-probe top-k is a partitioned "
        "window with map-side partial top-k; label totals are a tiny "
        "broadcast dim; the discount table is a literal array lookup "
        "inside codegen."
    ),
    "d57_minhash_estimate": (
        "Probe-bounded by construction (doc_id < 40): the signature "
        "build is one combinable (doc, slot) min-aggregate; pair joins "
        "are equi-joins on slot / shingle. On the full corpus the "
        "identical signature plan is constant-width per doc and pair "
        "cost moves to d45's band join — this entry is the estimator's "
        "oracle-checked accuracy instrument."
    ),
    "t73_chi2_term_assoc": (
        "One distinct (doc, source, term) projection feeds both counts "
        "(combinable); marginals (per-term df, per-source totals, N) "
        "are broadcast dims, so the cell join never reshuffles the "
        "corpus-volume relation. The statistic is a pure double chain "
        "on exact int64 cells inside codegen."
    ),
    "q178_benford_audit": (
        "The first digit is a scan-time expression, so the 9-group "
        "aggregate is map-side partial all the way; the corpus total is "
        "a one-row broadcast. Zero wide exchanges at any scale — the "
        "quality audit costs one pass over the fact column."
    ),
    "q179_topn_others_rollup": (
        "Fact joins the broadcast part dim and aggregates ONCE on "
        "(brand, month); the persisted small aggregate feeds the brand "
        "totals, the count-of-better top-5 election (a ~25-row "
        "triangular join), and the OTHERS regroup — the fact is scanned "
        "exactly once and nothing fact-sized shuffles twice."
    ),
    "q180_max_concurrency": (
        "Segmented prefix sum, one pass (r9): the sweep relation (an "
        "in-row explode, 2 narrow rows per order) gets its "
        "bucket-partitioned running sum, and the SAME groupBy elects "
        "the per-bucket peak+instant via max(struct(within_sum, -ts)) "
        "AND folds the bucket total — conc = carry_in + within_sum "
        "with carry_in bucket-constant, so no join back to the "
        "event-sized relation exists at all. Cross-bucket carry-ins "
        "are a running sum over the #buckets-row aggregate. One fact "
        "pass, one event-sized exchange, zero persists (the r8 "
        "materialized form cost ~2x cold; the naive form re-derived "
        "the interval aggregate 6x) — the shape a 100 TB running "
        "total must take."
    ),
    "q181_seasonal_decomposition": (
        "Event grain collapses to (type, day) in one combinable "
        "aggregate BEFORE any window; the centered-MA window runs over "
        "#types×#days rows partitioned by type; the index aggregate is "
        "7 rows per type. All-integer ppm ratio chain inside codegen."
    ),
    "t79_vocab_growth": (
        "First-occurrence election (term-keyed MIN, map-side "
        "combinable) replaces the non-summable running COUNT(DISTINCT); "
        "token counts never explode (size on the split array); both "
        "milestone probes are 10-row broadcast inequality joins with "
        "bounded ×10 fan-out."
    ),
    "t80_crosscorpus_ngram_recall": (
        "Per-doc-distinct shingle hashes explode once (array_distinct "
        "in-row, no dedup shuffle); the probe equi-joins a DISTINCT "
        "train set on 8-byte keys — a hot shingle contributes one train "
        "row × its test occurrences, linear where d44's self-join form "
        "would be quadratic; one doc-keyed count closes it."
    ),
    "t81_rake_keyphrases": (
        "Everything partitions by doc_id — the stopword-segmentation "
        "window, both stat aggregates, and the winner election — so the "
        "operator is embarrassingly parallel over documents; shuffles "
        "carry (doc, pnum/token) grains. The occurrence relation is "
        "persisted for its two consumers (word stats, phrase scores)."
    ),
    "q182_cheapest_path_cost": (
        "Bounded Bellman-Ford: the weighted symmetric edge list comes "
        "from one (c,s)-keyed count aggregate and ONE in-row explode "
        "(a unionAll of two projections would race the cache and "
        "recompute the fact join), cached hash-partitioned on src so "
        "every relaxation round reuses the layout. Each round is an "
        "equi-join plus a node-keyed combinable MIN; state stays "
        "node-grain, the only shape that survives dense paths at scale."
    ),
    "q183_business_day_lag": (
        "First-ship is a combinable MIN per order; the lag is the "
        "closed-form weekday count — whole-stage-codegen integer "
        "arithmetic, no calendar spine, no explode; the rollup is a "
        "handful of priority groups."
    ),
    "q184_revenue_bridge": (
        "Fact collapses to (customer, month) once; the bridge is a "
        "self full-outer equi-join of that aggregate on (customer, "
        "month±1) — both legs hash-partition on the customer key; the "
        "persisted aggregate also feeds the max-month scalar. The "
        "monthly rollup is #months rows."
    ),
    "d58_lsh_band_sweep": (
        "Probe-bounded audit: the dup-marker filter pushes to the "
        "scan; signatures are a (doc, slot)-keyed combinable MIN, band "
        "values a (doc, config, band)-keyed ordered hash, candidates "
        "an equi-join on (config, band, hash) — the exact physical "
        "shape d45 ships at corpus scale, never all-pairs."
    ),
    "d59_dedup_savings": (
        "d43's 16-byte digest aggregate plus one equi-join back on "
        "(digest, keeper) to price the kept copy; only digests and "
        "n_chars ride exchanges, the text never moves; output is a "
        "constant-size histogram."
    ),
    "t83_heldout_lm_surprisal": (
        "In-row bigram formation, two map-side-combinable train count "
        "tables, string-keyed LEFT equi-joins back onto test bigrams "
        "(COALESCE(0) smoothing fallback), one-row V broadcast — t63's "
        "shape with a split predicate pushed to the scan."
    ),
    "q190_bounce_rate": (
        "One user-keyed sort feeds both the lag marking and the "
        "running session index (same exchange); per-session collapse "
        "is a combinable aggregate carrying a min_by; the rollup is "
        "#entry-types rows."
    ),
    "q192_topk_drift": (
        "ONE fact pass builds the (half, brand) aggregate with the "
        "date midpoint as a broadcast scalar; the count-of-better "
        "election, top-k cut, and full-outer diff all run on the "
        "~2x#brands-row aggregate."
    ),
    "q197_correlation_matrix": (
        "ONE map-side-combinable aggregate carries all 15 integer "
        "sufficient sums; the matrix arithmetic runs on the single "
        "result row — no joins, no windows, no second pass."
    ),
    "q199_attribution_bakeoff": (
        "One user-keyed self equi-join with the 3-day window predicate "
        "inside the join's codegen; first/last/linear all derive from "
        "the SAME persisted (purchase, touch) relation at purchase "
        "grain — three models, one fact cost."
    ),
    "q200_curation_funnel": (
        "All quality signals are in-row array expressions over one "
        "scan; dedup is d43's 16-byte digest aggregate within the "
        "persisted survivor set; the three stage rows are unioned "
        "scalar aggregates — the corpus is scanned once for the whole "
        "funnel."
    ),
    "q201_overlapping_orders": (
        "Interval build is a combinable per-order MAX; the pair join "
        "is customer-blocked with the overlap predicate in codegen — "
        "fan-out bounded by per-customer concurrency, AQE covers bulk "
        "buyers."
    ),
    "s67_ivf_efficiency": (
        "The IVF side is s50's plan verbatim; the exhaustive side is "
        "the deliberate probe-bounded ground-truth product (10 "
        "queries), documented as verification cost. Output joins run "
        "at query grain."
    ),
}


def main() -> None:
    spark = get_spark("plansnap")
    queries = all_queries()
    out = [
        "# PLANS — physical-plan review of headline queries",
        "",
        "Regenerated by `python tools_plansnap.py` (sf0.01 inputs; plans are",
        "scale-invariant in shape). The commentary is the 100 TB design",
        "review each plan passed; `tests/test_plan_quality.py` pins the",
        "load-bearing properties in CI.",
        "",
    ]
    for name, note in COMMENTARY.items():
        plan = formatted_plan(queries[name](spark, SF))
        out += [f"## {name}", "", note, "", "```", plan.strip(), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print("PLANS.md written:", len(COMMENTARY), "plans")


if __name__ == "__main__":
    main()
