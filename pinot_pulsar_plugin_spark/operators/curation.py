"""Corpus-curation operators: Pareto-frontier document selection,
weight-proportional sampling, and rollup-cube serving.

These are the selection/serving steps of a training-data pipeline that
sit between the dedup family (``dedup.py``) and the mixture/packing
family (``pipelines.py``): pick the non-dominated documents on
competing quality axes (q94), draw a reproducible size-weighted sample
(q95), and answer group-by queries from a pre-aggregated cube instead
of the fact scan (q96 — the Pinot star-tree serving idea, SURVEY.md §0,
via :mod:`pinot_pulsar_plugin_spark.functions.rollup`).

All three are pure DataFrame compositions with engine-exact arithmetic
(integer keys, IEEE-exact divisions, fixed-point sums) so every one is
oracle-checked against DuckDB.
"""

from __future__ import annotations

from pinot_pulsar_plugin_spark.caching import persist_once

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pinot_pulsar_plugin_spark.functions.exact import (
    exact_sum_sql,
    exact_sum_wide,
)
from pinot_pulsar_plugin_spark.functions.hashing import knuth_bucket
from pinot_pulsar_plugin_spark.operators.common import make_registry, t

QUERIES, ORACLE, query = make_registry()


# ---------------------------------------------------------------------------
# q94: 2-D Pareto frontier (skyline) per language
# ---------------------------------------------------------------------------
#
# Keep the documents not dominated on (length, lexical diversity): doc d
# is dominated iff another doc in the same language is >= on both axes
# and strictly > on at least one. The oracle states dominance directly
# as NOT EXISTS (quadratic — fine at oracle scale); the engine plan is
# the O(n log n) sweep: sort by length descending and compare each doc's
# diversity against the running max over strictly-longer docs. Two RANGE
# frames over ONE sort order resolve both tie cases exactly:
#
#   m_strict = max(y) over x' >  x   (frame: unbounded .. -1 on -x asc)
#   m_incl   = max(y) over x' >= x   (frame: unbounded .. current row)
#
#   dominated  <=>  m_strict >= y  OR  m_incl > y
#
# (m_incl includes the row itself, so m_incl > y iff some doc with
# x' >= x has strictly larger y — exactly the second dominance clause.)

_UNIQ_RATIO = (
    "CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)"
    " / len(string_split(text, ' '))"
)


@query(
    "q94_pareto_frontier",
    f"""
    WITH m AS (
      SELECT doc_id, lang, n_chars, {_UNIQ_RATIO} AS uniq_ratio
      FROM documents)
    SELECT d.doc_id, d.lang, d.n_chars, d.uniq_ratio
    FROM m d
    WHERE NOT EXISTS (
      SELECT 1 FROM m o
      WHERE o.lang = d.lang
        AND ((o.n_chars >  d.n_chars AND o.uniq_ratio >= d.uniq_ratio)
          OR (o.n_chars >= d.n_chars AND o.uniq_ratio >  d.uniq_ratio))
    )
    """,
)
def q94_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Pareto frontier on (n_chars, distinct-token ratio):
    the multi-objective keep set of a curation pass — no document on the
    frontier can be improved on one axis without losing on the other.

    Scale shape: ONE hash exchange on lang + one sort serves both RANGE
    frames (Catalyst collapses them into a single Window operator); cost
    is O(n log n) per language vs the oracle's quadratic NOT EXISTS. The
    diversity ratio is a small-int division (IEEE-exact, identical
    across engines)."""
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    m = d.select(
        "doc_id",
        "lang",
        "n_chars",
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "uniq_ratio"
        ),
    )
    # Ascending sort on -n_chars makes "strictly longer" a clean
    # integer RANGE bound: nx' <= nx - 1  <=>  x' >= x + 1.
    nx = (-F.col("n_chars")).alias("nx")
    base = Window.partitionBy("lang").orderBy("nx")
    m_strict = F.max("uniq_ratio").over(
        base.rangeBetween(Window.unboundedPreceding, -1)
    )
    m_incl = F.max("uniq_ratio").over(
        base.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    y = F.col("uniq_ratio")
    dominated = (F.coalesce(m_strict >= y, F.lit(False))) | (m_incl > y)
    return (
        m.withColumn("nx", nx)
        .withColumn("_dom", dominated)
        .filter(~F.col("_dom"))
        .select("doc_id", "lang", "n_chars", "uniq_ratio")
    )


# ---------------------------------------------------------------------------
# q95: weight-proportional sample (sequential Poisson / Ohlsson) per language
# ---------------------------------------------------------------------------

_SP_MULT = 2654435761  # Knuth multiplicative hash (same constant as q44)
_SP_MOD = 1000003  # prime — uniform-ish u in [1, _SP_MOD]
_SP_KEEP = 40  # docs kept per language


@query(
    "q95_weighted_sample",
    f"""
    WITH pr AS (
      SELECT doc_id, lang, n_chars,
             CAST(((doc_id % {_SP_MOD}) * {_SP_MULT}) % {_SP_MOD} + 1 AS DOUBLE)
               / CAST(n_chars AS DOUBLE) AS priority
      FROM documents),
    ranked AS (
      SELECT doc_id, lang, n_chars, priority,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY priority, doc_id
             ) AS INTEGER) AS pick_rank
      FROM pr)
    SELECT doc_id, lang, n_chars, priority, pick_rank
    FROM ranked WHERE pick_rank <= {_SP_KEEP}
    """,
)
def q95_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-weighted sampling without replacement (sequential Poisson
    sampling, Ohlsson 1998): each doc gets priority u/w with u a
    deterministic hash-uniform and w = n_chars; the {_SP_KEEP} smallest
    priorities per language are the sample. Inclusion probability is
    ~proportional to length — the "sample by token mass, not by row"
    draw a mixture builder needs — and fully reproducible (no RNG
    state), unlike TABLESAMPLE.

    Engine-exactness: u and w are small ints, u/w is one IEEE-exact
    double division — identical bits on both engines, no transcendental
    math (the classic A-ES key u^(1/w) is order-equivalent but its
    pow/log would not be cross-engine stable).

    Scale shape: identical to q78 — rank-then-filter lowers to
    WindowGroupLimit, so each map task forwards at most K rows per
    language before the single hash exchange on lang."""
    d = t(spark, sf_dir, "documents")
    # r11 audit: ring-reduce the id before the Knuth multiply
    # (functions/hashing.py) — ((k % B)·M) % B ≡ (k·M) % B exactly,
    # where the raw product overflows past id ~3.47e9 on BOTH engines
    # (DuckDB's BIGINT multiply is overflow-checked too, so the oracle
    # carries the same reduction).
    u = knuth_bucket(F.col("doc_id"), _SP_MOD) + 1
    priority = (u.cast("double") / F.col("n_chars").cast("double")).alias(
        "priority"
    )
    w = Window.partitionBy("lang").orderBy("priority", "doc_id")
    return (
        d.select("doc_id", "lang", "n_chars", priority)
        .withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= _SP_KEEP)
    )


# ---------------------------------------------------------------------------
# q96: serve a group-by from the materialized rollup cube (star-tree analog)
# ---------------------------------------------------------------------------


@query(
    "q96_rollup_serving",
    f"""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           {exact_sum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q96_rollup_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Answer a group-by from the pre-aggregated CUBE instead of the
    fact scan — the Spark-native form of Pinot's star-tree serving
    (functions/rollup.py; the reference feeds realtime segments whose
    query-side acceleration is exactly this idea). One pass computes
    every grouping set of (l_returnflag, l_linestatus) with re-aggregable
    measures; the "query" then selects the grouping set where
    l_linestatus is aggregated away (grouping_id bit 0 set -> _gid = 1)
    — a #groups-sized filter, no second fact scan. The oracle is the
    direct GROUP BY, proving cube-served == scan-served.

    At 100 TB the cube lands as a tiny summary table refreshed with
    ingestion; every dim-subset group-by thereafter reads the summary,
    not the fact table. Measures are associative by construction
    (counts and fixed-point integer sums — exact.py rationale)."""
    from pinot_pulsar_plugin_spark.functions.rollup import (
        GID,
        materialize_rollup,
    )

    li = t(spark, sf_dir, "lineitem")
    cube = materialize_rollup(
        li,
        ["l_returnflag", "l_linestatus"],
        {
            "n_items": F.count(F.lit(1)),
            "sum_qty": F.sum(F.round(F.col("l_quantity")).cast("long")),
            # (flag, status) + rollup grand total are FIXED grain —
            # the d=4 revenue sum passes int64 at 100 TB (the q01
            # finding) → wide accumulator (r11 audit)
            "revenue": exact_sum_wide(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
        },
    )
    return cube.filter(F.col(GID) == 1).select(
        "l_returnflag", "n_items", "sum_qty", "revenue"
    )


# ---------------------------------------------------------------------------
# q119: one-scan column profile (data-quality audit)
# ---------------------------------------------------------------------------
# (column, kind). min/max AGGREGATE on the native/numeric value (a
# string representation would order "100" < "99" lexicographically)
# and are represented as strings only AFTER aggregation — doubles are
# fixed-pointed to cents pre-aggregation so neither ordering nor
# formatting ever touches a float.
_Q119_COLS = [
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "cents"),
    ("o_orderpriority", "str"),
]


def _q119_val_sql(c: str, kind: str) -> str:
    return f"CAST(ROUND({c} * 100) AS BIGINT)" if kind == "cents" else c


def _q119_rep_sql(agg: str, kind: str) -> str:
    return agg if kind == "str" else f"CAST({agg} AS VARCHAR)"


_Q119 = " UNION ALL ".join(
    f"""
    SELECT '{c}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           {_q119_rep_sql(f"MIN({_q119_val_sql(c, k)})", k)} AS min_repr,
           {_q119_rep_sql(f"MAX({_q119_val_sql(c, k)})", k)} AS max_repr
    FROM orders
    """
    for c, k in _Q119_COLS
)


@query("q119_column_profile", _Q119)
def q119_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan column profiler (the Deequ-style data-quality audit):
    per-column row/null/exact-distinct counts and portable min/max
    representations for the whole table in a SINGLE pass — the oracle
    spells it as one scan per column (fine for DuckDB duty), the Spark
    side computes every column's aggregates in one aggregate over one
    parquet scan (plan-gated), then unpivots the single wide row with
    an in-row explode. At 100 TB the profile costs one read; the naive
    per-column loop costs five.

    r13 shape — still ONE scan, but no Expand: each row explodes
    IN-ROW into five (col_name, value) entries (integers in a long
    lane, doubles in an UNROUNDED double lane — cents conversion
    happens only after min/max, see _entry — strings in a string
    lane, exactly one lane non-null for a non-null source
    value), then a two-phase aggregate: per-(column, value) counts
    (the only data-volume exchange — Σ per-column distinct
    cardinality, the same bytes the multi-DISTINCT Expand shuffled),
    then a #columns-sized rollup where n_rows = Σcnt, n_null = the
    all-null lane's cnt, n_distinct = the non-null group count, and
    min/max fold per lane. The r12 fused multi-countDistinct form
    planned as one Expand (×6 row multiplication through a 25-buffer
    aggregate) and measured 3.4s at sf0.1; a distinct+stats two-pass
    halved that but read the table TWICE (loses at 100 TB where the
    scan is the budget); this form keeps the single read AND drops
    the Expand (measured vs the fused form in OPTIMIZATION_r13.md).
    When estimates suffice, approx_count_distinct / HLL sketches
    (q13, q116) drop the distinct shuffle entirely. Min/max aggregate
    on the native/long value (never the string representation) so
    ordering is numeric and no engine-specific float formatting can
    diverge."""
    o = t(spark, sf_dir, "orders")

    def _entry(c: str, kind: str) -> str:
        # one lane per type family; the DISTINCT must count the RAW
        # value (the oracle spells COUNT(DISTINCT c)), so the double
        # column rides a double lane unrounded — cents conversion
        # happens AFTER min/max (ROUND(x·100) is monotonic, so
        # min/max commute with it)
        vl = f"CAST({c} AS BIGINT)" if kind == "int" else "CAST(NULL AS BIGINT)"
        vd = f"CAST({c} AS DOUBLE)" if kind == "cents" else "CAST(NULL AS DOUBLE)"
        vs = c if kind == "str" else "CAST(NULL AS STRING)"
        return (
            f"named_struct('col_name', '{c}', 'val_long', {vl}, "
            f"'val_dbl', {vd}, 'val_str', CAST({vs} AS STRING))"
        )

    entries_sql = (
        "array(" + ", ".join(_entry(c, k) for c, k in _Q119_COLS) + ")"
    )
    pairs = o.select(F.explode(F.expr(entries_sql)).alias("p")).select("p.*")
    g1 = pairs.groupBy("col_name", "val_long", "val_dbl", "val_str").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    has_val = (
        F.col("val_long").isNotNull()
        | F.col("val_dbl").isNotNull()
        | F.col("val_str").isNotNull()
    )

    def _cents_repr(agg: F.Column) -> F.Column:
        return F.round(agg * 100).cast("long").cast("string")

    prof = g1.groupBy("col_name").agg(
        F.sum("cnt").alias("n_rows"),
        F.sum(F.when(~has_val, F.col("cnt")).otherwise(F.lit(0))).alias("n_null"),
        F.count(F.when(has_val, F.lit(1))).alias("n_distinct"),
        # exactly one lane is populated per column, so the coalesce
        # picks that lane's (natively ordered) representation
        F.coalesce(
            F.min("val_long").cast("string"),
            _cents_repr(F.min("val_dbl")),
            F.min("val_str"),
        ).alias("min_repr"),
        F.coalesce(
            F.max("val_long").cast("string"),
            _cents_repr(F.max("val_dbl")),
            F.max("val_str"),
        ).alias("max_repr"),
    )
    # Totality on an EMPTY table: the oracle's per-column global
    # aggregates emit one zero-count row per column even over zero
    # input rows, but the explode above emits nothing — so a column
    # group can only go missing when the table is empty. A 5-row
    # literal skeleton left-joined over the 5-row profile restores
    # those rows (broadcast, #columns-sized — free at any scale).
    skeleton = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(c) for c, _ in _Q119_COLS])
        ).alias("col_name")
    )
    zero = F.lit(0).cast("long")
    return skeleton.join(prof, "col_name", "left").select(
        "col_name",
        F.coalesce("n_rows", zero).alias("n_rows"),
        F.coalesce("n_null", zero).alias("n_null"),
        F.coalesce("n_distinct", zero).alias("n_distinct"),
        "min_repr",
        "max_repr",
    )


# --- q172: decile lift / gains table --------------------------------
#
# The scoring-model readout (next to q169's experiment readout):
# rank customers by a score — acctbal stands in for a model score —
# into DECILES, and report each decile's response rate (customer
# placed ≥1 order) against the base rate: lift_ppm > 1e6 means the
# score concentrates responders at the top. Deciles are computed
# WITHIN market segment (the natural partition — and a global NTILE
# would be the partition-less-window scale killer the plan gate
# bans).
#
# Exactness: decile = (rank-1)*10 // n via ROW_NUMBER with
# (score, key) total order — NTILE's remainder-distribution rule is
# engine-identical too, but the explicit floor form keeps the
# arithmetic in the proven div/// class; rates and lift are integer
# ppm floor-divisions; nested floor-divs are identical on both
# engines.

_Q172 = """
    WITH resp AS (
      SELECT c.c_mktsegment AS segment, c.c_custkey,
             CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS score_cents,
             CAST(CASE WHEN EXISTS (SELECT 1 FROM orders o
                                    WHERE o.o_custkey = c.c_custkey)
                       THEN 1 ELSE 0 END AS BIGINT) AS responded
      FROM customer c),
    ranked AS (
      SELECT segment, responded, score_cents,
             ROW_NUMBER() OVER (PARTITION BY segment
               ORDER BY score_cents DESC, c_custkey) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY segment) AS BIGINT) AS n_seg,
             CAST(SUM(responded) OVER (PARTITION BY segment) AS BIGINT)
               AS n_resp_seg
      FROM resp),
    cells AS (
      SELECT segment, (rk - 1) * 10 // n_seg AS decile,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(responded) AS BIGINT) AS n_resp,
             MAX(n_seg) AS n_seg, MAX(n_resp_seg) AS n_resp_seg
      FROM ranked GROUP BY 1, 2)
    SELECT segment, CAST(decile AS BIGINT) AS decile, n, n_resp,
           CAST(n_resp * 1000000 // n AS BIGINT) AS rate_ppm,
           CAST((n_resp * 1000000 // n) * 1000000
                // (n_resp_seg * 1000000 // n_seg) AS BIGINT) AS lift_ppm
    FROM cells WHERE n_resp_seg > 0
"""


@query("q172_decile_lift", _Q172)
def q172_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment decile lift table of the acctbal 'score' against
    order response (see block comment) — the gains chart every scoring
    model ships with, in exact integer ppm.

    Scale shape: response is a semi-join flag (one key-partitioned
    EXISTS probe against order keys); ranking and segment totals share
    one segment-keyed sort; the rollup is 10 rows per segment. The
    score column swaps for a real model score with no plan change."""
    from pyspark.sql.window import Window

    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").select("o_custkey").distinct()
    resp = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .select(
            F.col("c_mktsegment").alias("segment"),
            "c_custkey",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("score_cents"),
            F.when(F.col("o_custkey").isNotNull(), 1)
            .otherwise(0)
            .cast("long")
            .alias("responded"),
        )
    )
    wr = Window.partitionBy("segment").orderBy(
        F.desc("score_cents"), F.asc("c_custkey")
    )
    wseg = Window.partitionBy("segment")
    ranked = resp.select(
        "segment",
        "responded",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wseg).alias("n_seg"),
        F.sum("responded").over(wseg).alias("n_resp_seg"),
    )
    cells = ranked.groupBy(
        "segment", F.expr("(rk - 1) * 10 div n_seg").alias("decile")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("responded").alias("n_resp"),
        F.max("n_seg").alias("n_seg"),
        F.max("n_resp_seg").alias("n_resp_seg"),
    )
    return cells.where(F.col("n_resp_seg") > 0).select(
        "segment",
        "decile",
        "n",
        "n_resp",
        F.expr("n_resp * 1000000 div n").alias("rate_ppm"),
        F.expr(
            "(n_resp * 1000000 div n) * 1000000"
            " div (n_resp_seg * 1000000 div n_seg)"
        ).alias("lift_ppm"),
    )


# --- q173: RFM segmentation (recency / frequency / monetary) --------
#
# The classic customer-value segmentation: per customer, recency =
# days since last order (vs the corpus max date — a deterministic
# "as-of"), frequency = order count, monetary = total cents; each
# scored 1-5 by SEGMENT-RELATIVE quintile (the q172 rank-floor form;
# a global NTILE would be the partition-less-window scale killer),
# 5 = best (most recent / most frequent / highest spend). Output is
# the (segment, r, f, m) cell histogram — the table a campaign
# planner reads.
#
# Exactness: integer days/counts/cents; quintile = rank-floor
# arithmetic with (metric, custkey) total orders; recency ranks
# ASCENDING days (fewer days = better) so score 5 is the most recent.

_Q173 = """
    WITH cust AS (
      SELECT o_custkey,
             CAST(MAX(epoch_us(o_orderdate)) AS BIGINT) AS last_us,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey),
    nowt AS (SELECT MAX(last_us) AS now_us FROM cust),
    base AS (
      SELECT c.c_mktsegment AS segment, c.c_custkey,
             (a.now_us - u.last_us) // 86400000000 AS rec_days,
             u.n_orders, u.cents
      FROM cust u
      JOIN customer c ON c.c_custkey = u.o_custkey
      CROSS JOIN nowt a),
    scored AS (
      SELECT segment, c_custkey, rec_days, n_orders, cents,
             5 - (ROW_NUMBER() OVER (PARTITION BY segment
                    ORDER BY rec_days, c_custkey) - 1) * 5
                 // COUNT(*) OVER (PARTITION BY segment) AS r_score,
             1 + (ROW_NUMBER() OVER (PARTITION BY segment
                    ORDER BY n_orders, c_custkey) - 1) * 5
                 // COUNT(*) OVER (PARTITION BY segment) AS f_score,
             1 + (ROW_NUMBER() OVER (PARTITION BY segment
                    ORDER BY cents, c_custkey) - 1) * 5
                 // COUNT(*) OVER (PARTITION BY segment) AS m_score
      FROM base)
    SELECT segment, CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM scored GROUP BY 1, 2, 3, 4
"""


@query("q173_rfm_segmentation", _Q173)
def q173_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM cell histogram: segment-relative quintile scores for
    recency, frequency, and monetary value (see block comment).

    Scale shape: one order-volume combinable aggregate to customer
    grain, a customer-dim join, then three quintile rankings sharing
    the segment partitioning (three sort orders — the unavoidable
    cost of three independent rank dimensions) and a ≤125-cell
    rollup per segment. The as-of scalar broadcasts."""
    from pyspark.sql.window import Window

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    cust = o.groupBy("o_custkey").agg(
        F.max(F.unix_micros("o_orderdate")).alias("last_us"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
    )
    asof = cust.agg(F.max("last_us").alias("now_us"))
    base = (
        cust.join(c, c["c_custkey"] == cust["o_custkey"])
        .crossJoin(F.broadcast(asof))
        .select(
            F.col("c_mktsegment").alias("segment"),
            "c_custkey",
            F.expr("(now_us - last_us) div 86400000000").alias("rec_days"),
            "n_orders",
            "cents",
        )
    )
    wseg = Window.partitionBy("segment")
    n_seg = F.count(F.lit(1)).over(wseg)
    rk_r = F.row_number().over(
        Window.partitionBy("segment").orderBy("rec_days", "c_custkey")
    )
    rk_f = F.row_number().over(
        Window.partitionBy("segment").orderBy("n_orders", "c_custkey")
    )
    rk_m = F.row_number().over(
        Window.partitionBy("segment").orderBy("cents", "c_custkey")
    )
    # integer floor-div quintiles (the proven div ≡ // class), never a
    # double divide-then-floor
    scored = base.select(
        "segment",
        "cents",
        rk_r.alias("rk_r"),
        rk_f.alias("rk_f"),
        rk_m.alias("rk_m"),
        n_seg.alias("n_seg"),
    ).select(
        "segment",
        "cents",
        F.expr("5 - (rk_r - 1) * 5 div n_seg").cast("long").alias("r_score"),
        F.expr("1 + (rk_f - 1) * 5 div n_seg").cast("long").alias("f_score"),
        F.expr("1 + (rk_m - 1) * 5 div n_seg").cast("long").alias("m_score"),
    )
    return scored.groupBy("segment", "r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"), F.sum("cents").alias("sum_cents")
    )


# --- q175: ABC (Pareto) classification ------------------------------
#
# Inventory's 80/20 rule as an operator: within each product type,
# rank parts by revenue and classify A (first parts covering 80% of
# the type's revenue), B (to 95%), C (rest) — the classification a
# catalog pipeline runs to pick storage/indexing tiers (hot parts
# get the zone-mapped fast path, C parts archive). Per-type, not
# global: the natural partition, and the partition-less-window gate.
#
# Exactness: revenue is presum cents; the class thresholds compare
# integer cumulative sums against scaled totals (cum*100 vs
# total*80/95 — integer products, no division at all). A part
# straddling the 80% boundary is A (its cum first crosses the line —
# the standard inclusive convention).

_Q175 = """
    WITH rev AS (
      SELECT p.p_type, l.l_partkey,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                 * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_type, l.l_partkey),
    ranked AS (
      SELECT p_type, l_partkey, cents,
             CAST(SUM(cents) OVER (PARTITION BY p_type
               ORDER BY cents DESC, l_partkey) AS BIGINT) AS cum_cents,
             CAST(SUM(cents) OVER (PARTITION BY p_type) AS BIGINT)
               AS type_cents
      FROM rev),
    classed AS (
      SELECT p_type, l_partkey, cents,
             CASE WHEN (cum_cents - cents) * 100 < type_cents * 80 THEN 'A'
                  WHEN (cum_cents - cents) * 100 < type_cents * 95 THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked)
    SELECT p_type, abc,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS class_cents
    FROM classed GROUP BY p_type, abc
"""


@query("q175_abc_classification", _Q175)
def q175_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type ABC Pareto classes by cumulative revenue share (see
    block comment): A covers the first 80%, B to 95%, C the tail —
    pure integer cumulative-sum comparisons, no divisions.

    Scale shape: one fact-volume combinable aggregate to part grain
    (part is a broadcast dim), then a type-partitioned running sum
    and a ≤3-cell-per-type rollup. The class boundary reads the
    PRE-row cumulative (cum − own), so a part straddling 80% is A —
    deterministic under the (cents DESC, partkey) total order.

    Kept-rank bound (ROUND10_NOTES §9 / VERDICT r10 #5): both windows
    share one sort whose input is the PART-GRAIN aggregate — a per-type
    task holds ≤ #parts-of-that-type DIMENSION rows (|part|/150 under
    TPC-H type uniformity), never fact rows. An ABC cut NEEDS the
    descending total order (the boundary is positional), so the
    histogram rewrite does not apply; the bound is the dimension size.
    Gated by
    tests/test_plan_quality.py::test_q175_rank_window_over_part_grain."""
    from pyspark.sql.window import Window

    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (
        li.join(F.broadcast(p), p["p_partkey"] == li["l_partkey"])
        .groupBy("p_type", "l_partkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("cents")
        )
    )
    wcum = Window.partitionBy("p_type").orderBy(F.desc("cents"), F.asc("l_partkey"))
    wtyp = Window.partitionBy("p_type")
    ranked = rev.select(
        "p_type",
        "l_partkey",
        "cents",
        F.sum("cents").over(wcum).alias("cum_cents"),
        F.sum("cents").over(wtyp).alias("type_cents"),
    )
    # r11 audit: the Pareto-cut comparisons run in DECIMAL(38,0) —
    # type-grain cent totals reach ~1.4e16 at 100 TB under type
    # uniformity (×100 ≈ 1.4e18, only ~6× inside int64) and pass it
    # outright under revenue skew; the comparison itself is exact
    # either way, so values are unchanged.
    pre_cum = (F.col("cum_cents") - F.col("cents")).cast("decimal(38,0)") * 100
    tot_dec = F.col("type_cents").cast("decimal(38,0)")
    abc = (
        F.when(pre_cum < tot_dec * 80, "A")
        .when(pre_cum < tot_dec * 95, "B")
        .otherwise("C")
    )
    return (
        ranked.select("p_type", abc.alias("abc"), "cents")
        .groupBy("p_type", "abc")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("cents").alias("class_cents"),
        )
    )


# --- q195: ABC x XYZ inventory classification ---------------------------
#
# The two-axis classification supply-chain planners run before
# deciding stocking policy: ABC = value concentration (q175's exact
# integer Pareto cut per product type) crossed with XYZ = demand
# STABILITY, where variability is the squared coefficient of
# variation over monthly demand including zero months —
# CV² = (M·Σq² − (Σq)²) / (Σq)², computed as an exact integer milli
# ratio (no sqrt, no doubles): X < 0.25 (steady), Y < 1.0, Z above.
# M (the corpus month count) is a broadcast scalar, so zero-demand
# months need no spine join.

_Q195 = """
    WITH li AS (
      SELECT l.l_partkey, p.p_type,
             epoch_us(l.l_shipdate) // 86400000000 // 30 AS m,
             CAST(ROUND(l.l_quantity) AS BIGINT) AS q,
             CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                  AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    months AS (SELECT CAST(COUNT(DISTINCT m) AS BIGINT) AS mm FROM li),
    pm AS (
      SELECT p_type, l_partkey, m, CAST(SUM(q) AS BIGINT) AS q,
             CAST(SUM(cents) AS BIGINT) AS cents
      FROM li GROUP BY 1, 2, 3),
    per_part AS (
      SELECT p_type, l_partkey,
             CAST(SUM(q) AS BIGINT) AS qt,
             SUM(CAST(q AS HUGEINT) * q) AS sq,
             CAST(SUM(cents) AS BIGINT) AS cents
      FROM pm GROUP BY 1, 2),
    xyz AS (
      SELECT p.p_type, p.l_partkey, p.cents,
             CAST((n.mm * p.sq - CAST(p.qt AS HUGEINT) * p.qt) * 1000
                  // (CAST(p.qt AS HUGEINT) * p.qt) AS BIGINT)
               AS cv2_milli
      FROM per_part p CROSS JOIN months n),
    ranked AS (
      SELECT p_type, l_partkey, cents, cv2_milli,
             SUM(cents) OVER (PARTITION BY p_type
               ORDER BY cents DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(cents) OVER (PARTITION BY p_type) AS tot
      FROM xyz)
    SELECT p_type,
           CASE WHEN (cum - cents) * 100 < tot * 80 THEN 'A'
                WHEN (cum - cents) * 100 < tot * 95 THEN 'B'
                ELSE 'C' END AS abc_class,
           CASE WHEN cv2_milli < 250 THEN 'X'
                WHEN cv2_milli < 1000 THEN 'Y'
                ELSE 'Z' END AS xyz_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM ranked GROUP BY 1, 2, 3
"""


@query("q195_abc_xyz_matrix", _Q195)
def q195_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC x XYZ part classification per product type (see block
    comment).

    Scale shape: the fact collapses to (type, part, month) then
    (type, part) in combinable aggregates; the month count is a
    one-row broadcast; the Pareto cut is q175's type-partitioned
    running sum; the matrix is ≤ 9 cells per type.

    The month count used to share the fact projection via persist —
    a LINEITEM-SIZED cache held only so a one-column countDistinct
    could reuse the scan. At 100 TB that cache is a multi-TB spill
    liability; a second scan column-pruned to (l_partkey, l_shipdate)
    reads a few percent of the table instead (semi-join against the
    broadcast part keys, so the count matches the oracle's joined
    relation without resting on referential integrity). Cold A/B at
    sf0.1 (fresh process, min of 3): persist 4.40s vs pruned re-scan
    4.13s — the persist bought nothing even locally, so dropping it
    is free here and a clear win at scale (SCALING.md)."""
    from pyspark.sql.window import Window

    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    base = li.join(F.broadcast(p), p["p_partkey"] == li["l_partkey"]).select(
        "p_type",
        "l_partkey",
        F.expr("unix_micros(l_shipdate) div 86400000000 div 30").alias("m"),
        F.round("l_quantity").cast("long").alias("q"),
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        ).cast("long").alias("cents"),
    )
    pk = p.select("p_partkey")
    months = (
        li.select("l_partkey", "l_shipdate")
        .join(F.broadcast(pk), pk["p_partkey"] == li["l_partkey"], "left_semi")
        .agg(
            F.countDistinct(
                F.expr("unix_micros(l_shipdate) div 86400000000 div 30")
            ).alias("mm")
        )
    )
    pm = base.groupBy("p_type", "l_partkey", "m").agg(
        F.sum("q").alias("q"), F.sum("cents").alias("cents")
    )
    # r11 audit: the CV² bracket runs in DECIMAL(38,0) — per-part
    # monthly demand is bounded only by per-key fan-in, and a hot part
    # (1e9 lines) puts q² and qt² past int64; the milli quotient is
    # ≤ mm·1000 so the IntegralDivide's long result cannot wrap.
    per_part = pm.groupBy("p_type", "l_partkey").agg(
        F.sum("q").alias("qt"),
        F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias("sq"),
        F.sum("cents").alias("cents"),
    )
    xyz = per_part.crossJoin(F.broadcast(months)).select(
        "p_type",
        "l_partkey",
        "cents",
        F.expr(
            "(mm * sq - CAST(qt AS DECIMAL(38,0)) * qt) * 1000"
            " div (CAST(qt AS DECIMAL(38,0)) * qt)"
        ).alias("cv2_milli"),
    )
    wcum = Window.partitionBy("p_type").orderBy(
        F.desc("cents"), F.asc("l_partkey")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wtyp = Window.partitionBy("p_type")
    ranked = xyz.select(
        "p_type",
        "cents",
        "cv2_milli",
        F.sum("cents").over(wcum).alias("cum"),
        F.sum("cents").over(wtyp).alias("tot"),
    )
    # same DECIMAL(38,0) Pareto-cut lift as q175 (r11 audit)
    pre_cum = (F.col("cum") - F.col("cents")).cast("decimal(38,0)") * 100
    tot_dec = F.col("tot").cast("decimal(38,0)")
    abc = (
        F.when(pre_cum < tot_dec * 80, "A")
        .when(pre_cum < tot_dec * 95, "B")
        .otherwise("C")
    )
    xyz_cls = (
        F.when(F.col("cv2_milli") < 250, "X")
        .when(F.col("cv2_milli") < 1000, "Y")
        .otherwise("Z")
    )
    return ranked.groupBy(
        "p_type", abc.alias("abc_class"), xyz_cls.alias("xyz_class")
    ).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("cents").alias("cents"),
    )
