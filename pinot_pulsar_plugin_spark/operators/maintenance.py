"""Storage-layout maintenance operators: compaction planning and
zone-map pruning audit.

The ingestion side of this engine (sources/pulsarlike.py) lands
micro-batch files the way the reference's Pinot tables land segments;
keeping a 100 TB table healthy then requires exactly two recurring
layout jobs, and both are expressible as pure DataFrame plans over
table metadata-grain relations:

- q137: small-file COMPACTION planning (Pinot's SegmentMergeRollup
  task / Iceberg rewrite_data_files): assign input files to
  target-size output segments with a per-partition running-sum
  bin-pack — the plan is computed distributively, one window per
  table partition, never a driver loop.
- q138: ZONE-MAP pruning audit (Pinot segment pruning on time range /
  parquet row-group min-max): measure how many segments a time
  predicate can skip under the CURRENT layout vs a DATE-CLUSTERED
  layout — the quantified justification for sorting segments by event
  time before flushing them.

Both are exact-integer computations (counts, fixed keys, microsecond
comparisons), so they carry full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pinot_pulsar_plugin_spark.functions.hashing import knuth_bucket_sql

from pinot_pulsar_plugin_spark.operators.common import make_registry, t

QUERIES, ORACLE, query = make_registry()

# q137 knobs: ~64 orders per input "file", 32 files per table
# partition (the compaction group), 2048 rows per target output
# segment. At real scale these come from the table's file manifest;
# here the fact stands in for its own metadata.
_FILE_SPAN = 64
_FILES_PER_GROUP = 32
_TARGET_ROWS = 2048

_Q137 = f"""
    WITH files AS (
      SELECT l_orderkey // {_FILE_SPAN} AS file_id,
             (l_orderkey // {_FILE_SPAN}) // {_FILES_PER_GROUP} AS group_id,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem
      GROUP BY 1, 2),
    packed AS (
      SELECT group_id, file_id, n_rows,
             CAST((SUM(n_rows) OVER (PARTITION BY group_id ORDER BY file_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_rows) // {_TARGET_ROWS} AS BIGINT) AS bin_id
      FROM files)
    SELECT group_id, bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n_rows) AS BIGINT) AS bin_rows,
           CAST(CAST(SUM(n_rows) AS BIGINT) * 1000000
                // {_TARGET_ROWS} AS BIGINT) AS fill_ppm
    FROM packed
    GROUP BY group_id, bin_id
"""


@query("q137_compaction_binpack", _Q137)
def q137_compaction_binpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction planning: pack contiguous small files into
    target-size output segments via the offset rule bin = (running_sum
    − n_rows) div target — the deterministic next-fit-by-offset plan
    every table-maintenance service runs (Iceberg bin-packing, Pinot
    segment merge).

    Scale shape: the plan works on the FILE-GRAIN relation (one row
    per file, not per data row), windowed PER COMPACTION GROUP — the
    partition column every real manifest has — so planning 10M files
    is a 10M-row windowed aggregate sharded by group, not a global
    sort and not a driver loop. Contiguity within a group is what
    keeps compaction rewrite-local (only neighboring files merge)."""
    li = t(spark, sf_dir, "lineitem")
    files = (
        li.select(
            F.expr(f"l_orderkey div {_FILE_SPAN}").alias("file_id"),
            F.expr(
                f"(l_orderkey div {_FILE_SPAN}) div {_FILES_PER_GROUP}"
            ).alias("group_id"),
        )
        .groupBy("file_id", "group_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    w = (
        W.partitionBy("group_id")
        .orderBy("file_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = files.withColumn("running", F.sum("n_rows").over(w)).select(
        "group_id",
        "file_id",
        "n_rows",
        F.expr(f"(running - n_rows) div {_TARGET_ROWS}").alias("bin_id"),
    )
    return packed.groupBy("group_id", "bin_id").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("n_rows").alias("bin_rows"),
        F.expr(f"(sum(n_rows) * 1000000) div {_TARGET_ROWS}").alias("fill_ppm"),
    )


# q138 knobs: 512 orders per segment; the audited predicate is a
# 3-month window.
_SEG_ROWS = 512
_LO = "1997-03-01 00:00:00"
_HI = "1997-06-01 00:00:00"

_Q138 = f"""
    WITH nat_seg AS (
      SELECT o_orderkey // {_SEG_ROWS} AS seg,
             MIN(o_orderdate) AS zmin, MAX(o_orderdate) AS zmax,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM orders GROUP BY 1),
    clustered AS (
      SELECT yr, (rn - 1) // {_SEG_ROWS} AS seg,
             MIN(o_orderdate) AS zmin, MAX(o_orderdate) AS zmax,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM (
        SELECT o_orderdate,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
               ROW_NUMBER() OVER (
                 PARTITION BY CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER)
                 ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders)
      GROUP BY 1, 2),
    audit AS (
      SELECT 'natural' AS layout,
             CASE WHEN zmax < TIMESTAMP '{_LO}'
                    OR zmin >= TIMESTAMP '{_HI}' THEN 'pruned'
                  WHEN zmin >= TIMESTAMP '{_LO}'
                   AND zmax < TIMESTAMP '{_HI}' THEN 'full'
                  ELSE 'partial' END AS verdict,
             n_rows
      FROM nat_seg
      UNION ALL
      SELECT 'clustered' AS layout,
             CASE WHEN zmax < TIMESTAMP '{_LO}'
                    OR zmin >= TIMESTAMP '{_HI}' THEN 'pruned'
                  WHEN zmin >= TIMESTAMP '{_LO}'
                   AND zmax < TIMESTAMP '{_HI}' THEN 'full'
                  ELSE 'partial' END AS verdict,
             n_rows
      FROM clustered)
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN verdict = 'pruned' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pruned,
           CAST(SUM(CASE WHEN verdict = 'full' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_full,
           CAST(SUM(CASE WHEN verdict = 'partial' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_partial,
           CAST(SUM(CASE WHEN verdict = 'pruned' THEN 0 ELSE n_rows END)
                AS BIGINT) AS rows_scanned,
           CAST(CAST(SUM(CASE WHEN verdict = 'pruned' THEN 0 ELSE n_rows END)
                     AS BIGINT) * 1000000
                // CAST(SUM(n_rows) AS BIGINT) AS BIGINT) AS scan_ppm
    FROM audit
    GROUP BY layout
"""


@query("q138_zonemap_prune_audit", _Q138)
def q138_zonemap_prune_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map pruning audit: for a 3-month time predicate, how many
    segments can be SKIPPED from min/max zone maps under (a) the
    natural ingestion-order layout vs (b) a date-clustered layout
    (rows re-segmented in orderdate order within each year partition).
    The output is the business case for sort-before-flush: scan_ppm is
    the fraction of rows a zone-map-aware scan must still read.

    Scale shape: both layouts reduce to segment-grain aggregates (one
    shuffle each — the natural one keyed by a key-derived segment id,
    the clustered one a year-partitioned window then a segment
    aggregate); the audit itself then runs on thousands of metadata
    rows. Spark's own parquet row-group pruning does exactly this
    with the same min/max stats — the operator makes the win
    measurable before committing a rewrite."""
    o = t(spark, sf_dir, "orders")
    lo = F.lit(_LO).cast("timestamp")
    hi = F.lit(_HI).cast("timestamp")

    natural = (
        o.select(
            F.expr(f"o_orderkey div {_SEG_ROWS}").alias("seg"), "o_orderdate"
        )
        .groupBy("seg")
        .agg(
            F.min("o_orderdate").alias("zmin"),
            F.max("o_orderdate").alias("zmax"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .withColumn("layout", F.lit("natural"))
    )
    yr = F.year("o_orderdate").cast("int")
    wseq = W.partitionBy("yr").orderBy("o_orderdate", "o_orderkey")
    clustered = (
        o.select("o_orderdate", "o_orderkey", yr.alias("yr"))
        .withColumn("rn", F.row_number().over(wseq))
        .select("yr", F.expr(f"(rn - 1) div {_SEG_ROWS}").alias("seg"), "o_orderdate")
        .groupBy("yr", "seg")
        .agg(
            F.min("o_orderdate").alias("zmin"),
            F.max("o_orderdate").alias("zmax"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .withColumn("layout", F.lit("clustered"))
        .drop("yr")
    )
    segs = natural.unionByName(clustered)
    verdict = (
        F.when((F.col("zmax") < lo) | (F.col("zmin") >= hi), "pruned")
        .when((F.col("zmin") >= lo) & (F.col("zmax") < hi), "full")
        .otherwise("partial")
    )
    audited = segs.select("layout", verdict.alias("verdict"), "n_rows")
    return audited.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(F.when(F.col("verdict") == "pruned", 1).otherwise(0)).alias("n_pruned"),
        F.sum(F.when(F.col("verdict") == "full", 1).otherwise(0)).alias("n_full"),
        F.sum(F.when(F.col("verdict") == "partial", 1).otherwise(0)).alias(
            "n_partial"
        ),
        F.sum(
            F.when(F.col("verdict") == "pruned", 0).otherwise(F.col("n_rows"))
        ).alias("rows_scanned"),
        F.expr(
            "(sum(CASE WHEN verdict = 'pruned' THEN 0 ELSE n_rows END)"
            " * 1000000) div sum(n_rows)"
        ).alias("scan_ppm"),
    )


# --- q139: incremental JOIN-view maintenance ------------------------
# The micro-batch "delta" is simulated deterministically and
# INDEPENDENTLY of the join key (flags derived from the key itself
# would make the cross terms vacuously empty): late-arriving lineitems
# are l_linenumber ≡ 0 (mod 3), late orders are o_custkey ≡ 0 (mod 7)
# — both engines carve identical partitions and all three delta terms
# are non-trivial.
_Q139 = """
    WITH amounts AS (
      SELECT l.l_orderkey, o.o_custkey,
             CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                  AS BIGINT) AS amt_fp,
             CAST(l.l_linenumber % 3 = 0 AS INTEGER) AS l_delta,
             CAST(o.o_custkey % 7 = 0 AS INTEGER) AS o_delta
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
    pieces AS (
      SELECT o_custkey, amt_fp, 'base' AS piece FROM amounts
      WHERE l_delta = 0 AND o_delta = 0
      UNION ALL
      SELECT o_custkey, amt_fp, 'delta' AS piece FROM amounts
      WHERE l_delta = 1 OR o_delta = 1)
    SELECT o_custkey,
           CAST(SUM(amt_fp) AS BIGINT) / 10000.0 AS revenue,
           CAST(SUM(CASE WHEN piece = 'delta' THEN amt_fp ELSE 0 END)
                AS BIGINT) / 10000.0 AS delta_contrib,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM pieces
    GROUP BY o_custkey
"""


@query("q139_incremental_join_view", _Q139)
def q139_incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view: the per-customer revenue
    view over lineitem⋈orders is refreshed from a micro-batch delta by
    the join-delta algebra Δ(L⋈O) = ΔL⋈O_old ∪ L_old⋈ΔO ∪ ΔL⋈ΔO —
    never by re-joining the full base. q121 maintains a SINGLE-TABLE
    rollup incrementally; this entry covers the 2-relation case every
    streaming-ETL serving view needs (Pinot upsert tables / Delta
    MERGE-based silver views refresh exactly this way).

    The operator COMPUTES via the incremental path (three delta joins
    merged with the old view's partial aggregate) while the oracle
    computes the direct full join — hash equality proves the delta
    algebra, not just the arithmetic. Fixed-point amounts make the
    merge exact.

    Scale shape: the three delta joins each pair a MICRO-BATCH-sized
    relation against a base (or another delta), so per-refresh cost is
    O(|Δ| + matched base rows) — at 100 TB the base view is never
    rescanned; the old view's partial sums merge by key (combinable
    int64), the same property that makes the rollup mergeable across
    segments."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    amt = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    l_old = li.filter(F.expr("l_linenumber % 3 != 0"))
    l_new = li.filter(F.expr("l_linenumber % 3 = 0"))
    o_old = o.filter(F.expr("o_custkey % 7 != 0"))
    o_new = o.filter(F.expr("o_custkey % 7 = 0"))

    def piece(ldf, odf, label):
        return (
            ldf.join(odf, odf["o_orderkey"] == ldf["l_orderkey"])
            .select(
                "o_custkey",
                amt.alias("amt_fp"),
                F.lit(label).alias("piece"),
            )
        )

    # the maintained base (computed once at view creation; only its
    # per-key partial sums would persist in a real deployment)...
    base = piece(l_old, o_old, "base")
    # ...plus the three delta terms of the refresh — pairwise
    # disjoint by their (l_delta, o_delta) flag combinations
    # (1,0)/(0,1)/(1,1), so UNION ALL is exact, no dedup pass.
    deltas = (
        piece(l_new, o_old, "delta")
        .unionByName(piece(l_old, o_new, "delta"))
        .unionByName(piece(l_new, o_new, "delta"))
    )
    merged = base.unionByName(deltas)
    return merged.groupBy("o_custkey").agg(
        (F.sum("amt_fp") / 10000.0).alias("revenue"),
        (
            F.sum(F.when(F.col("piece") == "delta", F.col("amt_fp")).otherwise(0))
            / 10000.0
        ).alias("delta_contrib"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --- q144: cross-table value reconciliation audit -------------------
#
# q85 audits REFERENTIAL integrity (orphan keys); q144 audits VALUE
# integrity: does the order header's o_totalprice agree with the
# total derivable from its lineitems (Σ extprice·(1−disc)·(1+tax))?
# On a healthy TPC-H corpus the bands collapse to 'lt_1pct'; on this
# driver-generated corpus they do not — which is precisely what the
# audit exists to report. The per-band deviation distribution is the
# continuous data-quality gate a 100 TB ingest pipeline runs after
# every load (the "is the CDC feed dropping lines" alarm).
#
# Exactness: both sides are fixed-point cents (ROUND per line BEFORE
# the integer sum — presum), deviation is |header − derived| in int64
# cents, and band thresholds are integer ppm floor-divisions
# (positive, so Spark div ≡ DuckDB //). Headroom: cents ≤ 1e9/order,
# ppm product ≤ 1e15 < int64.

_Q144 = """
    WITH derived AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                 * (1 + l_tax) * 100) AS BIGINT))
                  AS BIGINT) AS line_cents,
             CAST(COUNT(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY l_orderkey),
    j AS (
      SELECT o.o_orderkey,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS hdr_cents,
             d.line_cents, d.n_lines
      FROM orders o LEFT JOIN derived d ON o.o_orderkey = d.l_orderkey),
    graded AS (
      SELECT o_orderkey,
             CASE WHEN line_cents IS NULL THEN 'no_lines'
                  WHEN ABS(hdr_cents - line_cents) * 1000000
                         // hdr_cents < 10000  THEN 'lt_1pct'
                  WHEN ABS(hdr_cents - line_cents) * 1000000
                         // hdr_cents < 100000 THEN 'lt_10pct'
                  ELSE 'gt_10pct' END AS band,
             CASE WHEN line_cents IS NULL THEN hdr_cents
                  ELSE ABS(hdr_cents - line_cents) END AS abs_dev_cents
      FROM j)
    SELECT band,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(abs_dev_cents) AS BIGINT) AS sum_abs_dev_cents
    FROM graded GROUP BY band
"""


@query("q144_order_reconciliation_audit", _Q144)
def q144_order_reconciliation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-detail value reconciliation (see block comment):
    orders bucketed by the ppm deviation between o_totalprice and the
    lineitem-derived total; 'no_lines' catches headers with no detail
    rows at all.

    Scale shape: one combinable per-order aggregate over lineitem
    (the fact-volume exchange), one equi-join on the order key — both
    partitioned the same way, so AQE coalesces them — and a final
    4-row band rollup that is map-side combined. No broadcast needed:
    both sides are order-grain after the first aggregate."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    derived = li.groupBy("l_orderkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 100
            ).cast("long")
        ).alias("line_cents"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    j = o.select(
        "o_orderkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("hdr_cents")
    ).join(derived, o.o_orderkey == derived.l_orderkey, "left")
    dev_ppm = F.expr("abs(hdr_cents - line_cents) * 1000000 div hdr_cents")
    graded = j.select(
        F.when(F.col("line_cents").isNull(), "no_lines")
        .when(dev_ppm < 10000, "lt_1pct")
        .when(dev_ppm < 100000, "lt_10pct")
        .otherwise("gt_10pct")
        .alias("band"),
        F.when(
            F.col("line_cents").isNull(), F.col("hdr_cents")
        ).otherwise(F.abs(F.col("hdr_cents") - F.col("line_cents"))).alias(
            "abs_dev_cents"
        ),
    )
    return graded.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("abs_dev_cents").alias("sum_abs_dev_cents"),
    )


# --- q148: snapshot diff (CDC changelog reconstruction) -------------
#
# q139 maintains a view FROM a known delta; q148 solves the inverse
# maintenance problem: given two whole-table SNAPSHOTS and no
# changelog, reconstruct the changelog (the Iceberg `changes` /
# Delta CDF backfill job, and the audit every migration runs to prove
# a copied 100 TB table matches its source). The two snapshots are
# carved deterministically from orders — membership mod-rules give
# inserts and deletes, a price bump on o_orderkey ≡ 0 (mod 7) gives
# updates — using moduli independent of each other so all three
# change kinds are non-trivially populated.
#
# The mechanism is the production one: compare ROW FINGERPRINTS, not
# columns one by one — md5 over a canonical rendering of the full
# row, so the diff plan is the same regardless of schema width and a
# wide table ships one 16-byte hash through the join, not every
# column. Portability: every fingerprinted field renders identically
# on both engines (int64 cents, int64 epoch-µs, plain VARCHARs —
# never raw doubles, whose text rendering differs).
#
# Scale shape: one full outer hash join keyed on the primary key —
# with both snapshots bucketed by key (the layout q137's compactor
# maintains) this is a zero-shuffle sort-merge; unchanged keys (the
# overwhelming majority at 100 TB) are filtered before the output
# projection, so the result is changelog-sized, not table-sized.

_Q148 = """
    WITH snap AS (
      SELECT o_orderkey,
             o_custkey,
             o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             epoch_us(o_orderdate) AS odate_us,
             o_orderpriority
      FROM orders),
    old AS (
      SELECT o_orderkey,
             md5(concat_ws('|', CAST(o_custkey AS VARCHAR), o_orderstatus,
                           CAST(cents AS VARCHAR), CAST(odate_us AS VARCHAR),
                           o_orderpriority)) AS fp,
             cents
      FROM snap WHERE o_orderkey % 13 <> 5),
    new AS (
      SELECT o_orderkey,
             md5(concat_ws('|', CAST(o_custkey AS VARCHAR), o_orderstatus,
                           CAST(cents + CASE WHEN o_orderkey % 7 = 0
                                             THEN 250 ELSE 0 END AS VARCHAR),
                           CAST(odate_us AS VARCHAR),
                           o_orderpriority)) AS fp,
             cents + CASE WHEN o_orderkey % 7 = 0 THEN 250 ELSE 0 END AS cents
      FROM snap WHERE o_orderkey % 11 <> 3),
    diff AS (
      SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                  WHEN n.o_orderkey IS NULL THEN 'delete'
                  ELSE 'update' END AS change,
             o.cents AS old_cents,
             n.cents AS new_cents
      FROM old o FULL OUTER JOIN new n ON n.o_orderkey = o.o_orderkey
      WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL OR o.fp <> n.fp)
    SELECT change,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(COALESCE(new_cents, 0) - COALESCE(old_cents, 0))
                AS BIGINT) AS net_cents,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM diff GROUP BY change
"""


@query("q148_snapshot_diff", _Q148)
def q148_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconstruct an insert/update/delete changelog from two table
    snapshots by full-outer-joining row FINGERPRINTS on the primary
    key (see block comment), then summarize per change kind.

    Scale shape: each snapshot is scanned once into (key, fp, cents)
    — 32 bytes/row regardless of table width — then one key-keyed
    full outer join; unchanged keys drop before the projection so the
    output is changelog-sized. Bucketed-by-key snapshots make the
    join shuffle-free; the summary is a 3-row combinable rollup."""
    o = t(spark, sf_dir, "orders")
    snap = o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.unix_micros("o_orderdate").alias("odate_us"),
        "o_orderpriority",
    )

    def fingerprinted(df, bumped: bool):
        cents = F.col("cents") + (
            F.when(F.expr("o_orderkey % 7 = 0"), F.lit(250)).otherwise(F.lit(0))
            if bumped
            else F.lit(0)
        )
        return df.select(
            "o_orderkey",
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("o_custkey").cast("string"),
                    F.col("o_orderstatus"),
                    cents.cast("string"),
                    F.col("odate_us").cast("string"),
                    F.col("o_orderpriority"),
                )
            ).alias("fp"),
            cents.alias("cents"),
        )

    old = fingerprinted(snap.where("o_orderkey % 13 != 5"), bumped=False)
    new = fingerprinted(snap.where("o_orderkey % 11 != 3"), bumped=True)
    j = old.alias("o").join(
        new.alias("n"), F.col("n.o_orderkey") == F.col("o.o_orderkey"), "full_outer"
    )
    diff = j.where(
        F.col("o.o_orderkey").isNull()
        | F.col("n.o_orderkey").isNull()
        | (F.col("o.fp") != F.col("n.fp"))
    ).select(
        F.coalesce("o.o_orderkey", "n.o_orderkey").alias("o_orderkey"),
        F.when(F.col("o.o_orderkey").isNull(), "insert")
        .when(F.col("n.o_orderkey").isNull(), "delete")
        .otherwise("update")
        .alias("change"),
        F.col("o.cents").alias("old_cents"),
        F.col("n.cents").alias("new_cents"),
    )
    return diff.groupBy("change").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(
            F.coalesce("new_cents", F.lit(0)) - F.coalesce("old_cents", F.lit(0))
        ).alias("net_cents"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


# --- q171: shuffle-skew report (pre-join key diagnosis) -------------
#
# The diagnosis a pipeline owner runs BEFORE a big keyed join to
# decide between plain hash join, AQE skew-split, and q112-style
# salting: model the B-way hash partitioning of the join key and
# report each bucket's load plus its hottest key. The modeled
# partitioner is a multiplicative hash mod B spelled identically on
# both engines (Spark's internal Murmur3 isn't portable to the
# oracle; the DIAGNOSIS — relative bucket loads under a uniform hash
# — is the same). Key grain: lineitem.l_suppkey, the key q112 salts.
#
# Exactness: pure integer counts and ppm floor-divisions; hottest
# key per bucket via rank with key tie-break.

_Q171_B = 32

_Q171 = f"""
    WITH keyed AS (
      SELECT l_suppkey AS k,
             ((l_suppkey % {_Q171_B}) * 2654435761) % {_Q171_B} AS bucket
      FROM lineitem),
    per_key AS (
      SELECT bucket, k, CAST(COUNT(*) AS BIGINT) AS n
      FROM keyed GROUP BY bucket, k),
    hot AS (
      SELECT bucket, k AS hottest_key, n AS hottest_n,
             ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY n DESC, k) AS rk
      FROM per_key),
    per_bucket AS (
      SELECT bucket,
             CAST(SUM(n) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys
      FROM per_key GROUP BY bucket),
    tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total FROM per_bucket)
    SELECT b.bucket, b.n_rows, b.n_keys,
           CAST(b.n_rows * 1000000 // t.total AS BIGINT) AS share_ppm,
           h.hottest_key, h.hottest_n
    FROM per_bucket b
    JOIN hot h ON h.bucket = b.bucket AND h.rk = 1
    CROSS JOIN tot t
"""


@query("q171_shuffle_skew_report", _Q171)
def q171_shuffle_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket load and hottest key under a modeled {b}-way hash
    partitioning of lineitem.l_suppkey (see block comment) — the
    skew diagnosis read before choosing salting (q112) vs AQE
    skew-join.

    Scale shape: one combinable (bucket, key) count over the fact —
    the same exchange the diagnosed join would pay — then bucket-grain
    arithmetic with a broadcast total and a WindowGroupLimit top-1.
    Reading this table at 100 TB costs one aggregate; acting on it
    saves the straggler task that would otherwise dominate the job."""
    from pyspark.sql.window import Window

    li = t(spark, sf_dir, "lineitem")
    keyed = li.select(
        F.col("l_suppkey").alias("k"),
        # r11 audit: ring-reduce before the Knuth multiply (the q44
        # fix, functions/hashing.py) — values unchanged for every key
        F.expr(knuth_bucket_sql("l_suppkey", _Q171_B)).alias("bucket"),
    )
    per_key = keyed.groupBy("bucket", "k").agg(F.count(F.lit(1)).alias("n"))
    wh = Window.partitionBy("bucket").orderBy(F.desc("n"), F.asc("k"))
    hot = (
        per_key.withColumn("rk", F.row_number().over(wh))
        .where(F.col("rk") == 1)
        .select(
            "bucket",
            F.col("k").alias("hottest_key"),
            F.col("n").alias("hottest_n"),
        )
    )
    per_bucket = per_key.groupBy("bucket").agg(
        F.sum("n").alias("n_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    tot = per_bucket.agg(F.sum("n_rows").alias("total"))
    return (
        per_bucket.join(hot, "bucket")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_rows",
            "n_keys",
            F.expr("n_rows * 1000000 div total").alias("share_ppm"),
            "hottest_key",
            "hottest_n",
        )
    )


# ---------------------------------------------------------------------------
# q178: Benford first-digit audit
# ---------------------------------------------------------------------------

# round(log10(1 + 1/d) * 1e6) for d = 1..9; the rounded ppm values sum
# to exactly 1_000_000, so expected counts partition N without drift.
# Embedded as INTEGER LITERALS on both engines (the s61 rule: a
# query-time log10 risks a 1-ulp ROUND flip between libm builds).
_BENFORD_PPM = [301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757]

_Q178 = f"""
    WITH cents AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
      FROM orders
      WHERE o_totalprice > 0),
    digits AS (
      SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit,
             CAST(COUNT(*) AS BIGINT) AS obs
      FROM cents GROUP BY 1),
    tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM digits)
    SELECT d.digit, d.obs,
           CAST(d.obs * 1000000 // t.n AS BIGINT) AS obs_ppm,
           CAST(({_BENFORD_PPM})[d.digit] AS BIGINT) AS exp_ppm,
           CAST(d.obs * 1000000 - t.n * ({_BENFORD_PPM})[d.digit] AS DOUBLE)
             * CAST(d.obs * 1000000 - t.n * ({_BENFORD_PPM})[d.digit] AS DOUBLE)
             / (CAST(t.n * ({_BENFORD_PPM})[d.digit] AS DOUBLE) * 1000000.0)
             AS chi2_contrib
    FROM digits d CROSS JOIN tot t
"""


@query("q178_benford_audit", _Q178)
def q178_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit over order totals — the
    classic anomaly / fabrication screen a data-quality pipeline runs
    on monetary fact columns (Pinot users run the same shape as a
    scheduled quality query). Per digit: observed count, observed
    share in ppm, the Benford expectation in ppm, and the chi-square
    contribution ((obs·1e6 − N·ppm)² / (N·ppm·1e6)).

    Exactness: digit extraction is string-on-integer-cents (no log10
    at query time); expected shares are integer ppm literals summing
    to exactly 1e6; the chi-square term is a pure double chain on
    exact int64s (products stay < 2^53 before the square, and the
    square/divide are single IEEE ops — identical on both engines).

    Scale shape: one combinable 9-group aggregate over a scan (the
    digit is a scan-time expression, so this is map-side partial all
    the way), then a one-row total broadcast. Zero wide exchanges at
    any scale."""
    o = t(spark, sf_dir, "orders")
    arr = F.array(*[F.lit(p) for p in _BENFORD_PPM])
    digits = (
        o.filter(F.col("o_totalprice") > 0)
        .select(
            F.substring(
                F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
                1,
                1,
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    tot = digits.agg(F.sum("obs").alias("n"))
    exp_ppm = F.element_at(arr, F.col("digit"))
    chi_num = (F.col("obs") * 1000000 - F.col("n") * exp_ppm).cast("double")
    return digits.crossJoin(F.broadcast(tot)).select(
        "digit",
        "obs",
        F.expr("obs * 1000000 div n").alias("obs_ppm"),
        exp_ppm.cast("long").alias("exp_ppm"),
        (
            chi_num
            * chi_num
            / ((F.col("n") * exp_ppm).cast("double") * F.lit(1000000.0))
        ).alias("chi2_contrib"),
    )
