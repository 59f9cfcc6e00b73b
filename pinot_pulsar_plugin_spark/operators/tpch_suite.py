"""TPC-H completion suite (Q4/Q5/Q6/Q8/Q9/Q10/Q11/Q12/Q14/Q16/Q20/Q21
shapes) — the remaining canonical decision-support patterns the
registry didn't yet cover as first-class entries.

The testdata is TPC-H-ish but reduced (no partsupp table; no
receipt/commit dates, ship modes, or comments), so each query keeps the
REFERENCE SHAPE — the join topology, subquery structure, and aggregate
pattern that make the original query a stress test — with predicates
adapted to the columns that exist (the established q113/q117/q118/q124
convention). Money aggregates use the fixed-point presum
(functions/exact.py) so every output is bit-identical cross-engine;
ratio outputs use integer ppm floor-division on positive sums (the t63
rule) instead of ROUND-of-quotient.

Reference relevance: these are the query shapes a Pinot user runs
against ingested segments (SURVEY.md §2.B joins/aggregations/subqueries
rows); the reference plugin feeds exactly this kind of serving table
(reelevant-tech/pinot-pulsar-plugin README: ingestion for analytical
serving).
"""

from __future__ import annotations

from pinot_pulsar_plugin_spark.caching import persist_once

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pinot_pulsar_plugin_spark.functions.exact import (
    exact_sum_sql,
    exact_sum_wide,
    wide_fp_total,
)
from pinot_pulsar_plugin_spark.operators.common import make_registry, t

QUERIES, ORACLE, query = make_registry()

_US_PER_DAY = 86_400_000_000


# --- q125: TPC-H Q4 shape (order priority checking, EXISTS) ---------
_Q125 = """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY)
    GROUP BY o_orderpriority
"""


@query("q125_late_order_priority", _Q125)
def q125_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): count orders per
    priority that had at least one LATE line (shipped >45 days after
    order placement — standing in for Q4's commitdate<receiptdate,
    which this schema lacks). The EXISTS becomes a LEFT-SEMI join, so
    multi-late orders count once without a distinct pass.

    Scale shape: the quarter filter prunes orders at the scan; the
    semi join is the only fact-fact exchange and its probe side
    carries just (orderkey, shipdate); the final groupBy has 5 keys."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --- q126: TPC-H Q5 shape (local supplier volume) -------------------
_Q126 = f"""
    SELECT n.n_name, {exact_sum_sql("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
"""


@query("q126_local_supplier_volume", _Q126)
def q126_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): revenue where the
    supplier and the ordering customer share a nation, restricted to
    one region — the classic 6-way star join whose supplier join
    carries an EXTRA cross-dimension equality (s_nationkey =
    c_nationkey) that can't be pushed to either scan alone.

    Scale shape: customer/supplier/nation/region all broadcast, so the
    fact pays exactly one exchange (lineitem⋈orders on orderkey); the
    nation-match refine evaluates post-broadcast where both sides'
    nationkeys are in hand; the final aggregate has ≤5 groups."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (s["s_suppkey"] == li["l_suppkey"])
            & (s["s_nationkey"] == c["c_nationkey"]),
        )
        .join(F.broadcast(n), n["n_nationkey"] == s["s_nationkey"])
        .join(F.broadcast(r), r["r_regionkey"] == n["n_regionkey"])
    )
    # nation is FIXED grain — ~9e16 per group in d=4 fixed point at
    # 100 TB → wide accumulator (r11 audit, SCALING.md §7)
    return joined.groupBy("n_name").agg(
        exact_sum_wide(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
        )
    )


# --- q127: TPC-H Q6 shape (forecast revenue, pure scan) -------------
_Q127 = f"""
    SELECT {exact_sum_sql("l_extendedprice * l_discount", "revenue")},
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@query("q127_forecast_revenue", _Q127)
def q127_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): a pure
    filter+aggregate with NO join — the canonical scan-efficiency
    probe. All three predicates push to the parquet scan
    (PushedFilters on shipdate/discount/quantity), the projection
    prunes to 4 columns, and the single-row aggregate is a map-side
    partial + one tiny exchange. At 100 TB this query is I/O-bound by
    design; anything beyond one scan + one 1-row exchange is a plan
    regression (gated in test_plan_quality)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            # single global group: ~2.2e17 post-filter in d=4 fixed
            # point at 100 TB — inside int64 but within the audit's
            # 1e16-9e18 lift band → wide accumulator (r11 audit)
            exact_sum_wide(
                F.col("l_extendedprice") * F.col("l_discount"), "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- q128: TPC-H Q8 shape (national market share) -------------------
# share_ppm = nation_fp * 1e6 // total_fp: integer floor-division of
# POSITIVE fixed-point sums (the t63 rule) — a ROUND(x/y, 6) here
# would be the cross-engine half-boundary hazard. Headroom: nation_fp
# ≤ ~1e12 at sf0.1, ×1e6 = 1e18 < int64 max; at the 100 TB point the
# share would be computed in double (a 1-ulp-tolerant consumer), the
# fixed-point path is what makes the oracle comparison exact.
_Q128 = """
    WITH all_volume AS (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
             CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                  AS BIGINT) AS vol_fp,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n1.n_regionkey
      JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_12' THEN vol_fp
                         ELSE 0 END) AS BIGINT) / 10000.0 AS nation_rev,
           CAST(SUM(vol_fp) AS BIGINT) / 10000.0 AS total_rev,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_12' THEN vol_fp
                              ELSE 0 END) AS BIGINT) * 1000000
                // CAST(SUM(vol_fp) AS BIGINT) AS BIGINT) AS share_ppm
    FROM all_volume
    GROUP BY o_year
"""


@query("q128_national_market_share", _Q128)
def q128_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): the fraction of a
    region's PROMO-part purchase volume supplied by one nation, by
    year — an 8-way join where the SAME dim (nation) joins twice with
    different roles and the answer is a conditional-sum ratio.

    Scale shape: part/supplier/customer/nation×2/region broadcast;
    the fact pays the lineitem⋈orders exchange plus a 2-row final
    aggregate. The numerator rides a CASE inside the same aggregate —
    never a second scan or a self-join of aggregates."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol_fp = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    av = (
        li.join(F.broadcast(p), p["p_partkey"] == li["l_partkey"])
        .join(F.broadcast(s), s["s_suppkey"] == li["l_suppkey"])
        .join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(c), c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(n1), F.col("n1_key") == c["c_nationkey"])
        .join(F.broadcast(r), r["r_regionkey"] == F.col("n1_region"))
        .join(F.broadcast(n2), F.col("n2_key") == s["s_nationkey"])
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol_fp.alias("vol_fp"),
            "supp_nation",
        )
    )
    # 100-TB arithmetic (r11 audit): o_year is FIXED grain — the d=4
    # per-year sums measure ~1.8e18 (int64 edge) and the ppm numerator
    # sum·1e6 ~1.8e24 → exact DECIMAL(38,0) accumulators; the ppm
    # quotient (≤1e6) and output types stay as before.
    agg = av.groupBy("o_year").agg(
        wide_fp_total(
            F.when(F.col("supp_nation") == "NATION_12", F.col("vol_fp"))
            .otherwise(0)
        ).alias("nation_fp"),
        wide_fp_total(F.col("vol_fp")).alias("tot_fp"),
    )
    return agg.select(
        "o_year",
        (F.col("nation_fp").cast("double") / 10000.0).alias("nation_rev"),
        (F.col("tot_fp").cast("double") / 10000.0).alias("total_rev"),
        F.expr("(nation_fp * 1000000) div tot_fp").alias("share_ppm"),
    )


# --- q129: TPC-H Q9 shape (product type profit) ---------------------
# No partsupp → supply cost modeled as 60% of the part's retail price
# per unit; profit = revenue − cost can go NEGATIVE, which the
# fixed-point presum handles exactly (term-rounding then signed int64
# sum — no division anywhere).
_Q129 = f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
           {exact_sum_sql(
               "l.l_extendedprice * (1 - l.l_discount)"
               " - 0.6 * p.p_retailprice * l.l_quantity",
               "profit",
           )}
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER)
"""


@query("q129_product_type_profit", _Q129)
def q129_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product type profit): profit by supplier nation
    and order year over parts matching a name substring — the join
    whose grouping keys come from THREE different tables (nation name,
    order year, lineitem amounts), forcing the full star to assemble
    before the aggregate.

    Scale shape: the part-name filter prunes the broadcast side first
    (LIKE evaluates on the 2k-row dim, never the fact); orders⋈lineitem
    is the one big exchange; the aggregate is ~nations×years rows."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    joined = (
        li.join(F.broadcast(p), p["p_partkey"] == li["l_partkey"])
        .join(F.broadcast(s), s["s_suppkey"] == li["l_suppkey"])
        .join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(n), n["n_nationkey"] == s["s_nationkey"])
    )
    return (
        joined.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            profit.alias("amount"),
        )
        .groupBy("nation", "o_year")
        # (nation, year) is FIXED grain — ~5e17 per group in d=4
        # fixed point at 100 TB → wide accumulator (r11 audit)
        .agg(exact_sum_wide(F.col("amount"), "profit"))
    )


# --- q130: TPC-H Q10 shape (returned item reporting, top 20) --------
# The top-20 cut orders on the FIXED-POINT revenue (exact integer), so
# the boundary cannot move cross-engine; c_custkey breaks exact ties.
_Q130 = """
    WITH per_cust AS (
      SELECT c.c_custkey, c.c_name, n.n_name,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                  * 10000) AS BIGINT)) AS BIGINT) AS rev_fp
      FROM customer c
      JOIN orders o   ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
      WHERE l.l_returnflag = 'R'
        AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      GROUP BY c.c_custkey, c.c_name, n.n_name)
    SELECT c_custkey, c_name, n_name, rev_fp / 10000.0 AS revenue
    FROM per_cust
    ORDER BY rev_fp DESC, c_custkey
    LIMIT 20
"""


@query("q130_returned_item_customers", _Q130)
def q130_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned item reporting): top-20 customers by
    revenue lost to returns in a half-year window — star join, group
    by a customer-grained composite key, then a global top-k.

    Scale shape: the returnflag+date filters cut the fact before the
    orderkey exchange; customer/nation broadcast; the final ORDER BY
    ... LIMIT 20 plans as TakeOrderedAndProject (per-partition top-20
    then a 20-row merge — no global sort)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    rev_fp = F.sum(
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast(
            "long"
        )
    ).alias("rev_fp")
    per_cust = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), n["n_nationkey"] == c["c_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(rev_fp)
    )
    return (
        per_cust.orderBy(F.desc("rev_fp"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            (F.col("rev_fp") / 10000.0).alias("revenue"),
        )
    )


# --- q131: TPC-H Q11 shape (important stock, HAVING vs global) ------
_Q131 = """
    WITH pv AS (
      SELECT l.l_partkey,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS value_fp
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name IN ('NATION_3', 'NATION_17')
      GROUP BY l.l_partkey)
    SELECT l_partkey, value_fp / 100.0 AS part_value
    FROM pv
    WHERE value_fp > (SELECT CAST(SUM(value_fp) AS BIGINT) // 1000 FROM pv)
"""


@query("q131_important_parts", _Q131)
def q131_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): parts whose
    shipped value from two nations' suppliers exceeds 0.1% of the
    total — an aggregate filtered against a SCALAR AGGREGATE OF
    ITSELF. The threshold is integer floor-division of the exact
    fixed-point total, so the cut is bit-stable.

    Scale shape: the per-part aggregate shuffles once on partkey; the
    global total is a 1-row re-aggregate of the SAME grouped relation
    (persisted, so the lineitem scan isn't paid twice) broadcast into
    the filter — never a second fact scan.

    Persist KEPT after the r10 cold A/B (fresh process, min of 3 at
    sf0.1): persist 2.09s vs no-persist 1.92s. The ~8% local cost is
    cache-fill overhead against a page-cached sf0.1 scan; at 100 TB
    the cached relation is a ≤#parts-row aggregate while the
    no-persist form re-runs the full lineitem scan + join + aggregate
    for the threshold row — structural fan-out (scalar aggregate of
    itself) with expensive lineage, so the s67/s57 rule says persist
    (SCALING.md)."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_17")
    )
    pv = (
        li.join(F.broadcast(s), s["s_suppkey"] == li["l_suppkey"])
        .join(F.broadcast(n), n["n_nationkey"] == s["s_nationkey"])
        .groupBy("l_partkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "value_fp"
            )
        )
        .transform(persist_once)
    )
    thr = pv.agg(F.expr("sum(value_fp) div 1000").alias("thr"))
    return (
        pv.crossJoin(F.broadcast(thr))
        .filter(F.col("value_fp") > F.col("thr"))
        .select("l_partkey", (F.col("value_fp") / 100.0).alias("part_value"))
    )


# --- q132: TPC-H Q12 shape (shipping delay vs priority) -------------
# No l_shipmode/receiptdate → the "mode" is the shipping-delay bucket
# (FAST ≤30d, MEDIUM ≤60d, SLOW >60d), classified by pure integer
# microsecond comparisons — no division, no date arithmetic to
# diverge.
_Q132 = """
    SELECT CASE WHEN epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)
                     > 60 * 86400000000 THEN 'SLOW'
                WHEN epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)
                     > 30 * 86400000000 THEN 'MEDIUM'
                ELSE 'FAST' END AS delay_bucket,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
"""


@query("q132_delay_bucket_priority", _Q132)
def q132_delay_bucket_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes and order priority): line
    counts by priority class across shipping-delay buckets — the
    conditional-sum pivot over a fact-fact join.

    Scale shape: one orderkey exchange; both CASE sums ride the same
    aggregate (single pass); the delay bucket derives from integer
    microsecond arithmetic computed post-join, grouped into 3 keys."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders")
    delay_us = F.unix_micros("l_shipdate") - F.unix_micros("o_orderdate")
    bucket = (
        F.when(delay_us > 60 * _US_PER_DAY, "SLOW")
        .when(delay_us > 30 * _US_PER_DAY, "MEDIUM")
        .otherwise("FAST")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, o["o_orderkey"] == li["l_orderkey"])
        .select(bucket.alias("delay_bucket"), high.alias("is_high"))
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(F.col("is_high"), 0).otherwise(1)).alias("low_line_count"),
        )
    )


# --- q133: TPC-H Q14 shape (promotion effect, ppm ratio) ------------
_Q133 = """
    SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                      * 10000) AS BIGINT) ELSE 0 END) AS BIGINT)
               / 10000.0 AS promo_rev,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                * 10000) AS BIGINT)) AS BIGINT) / 10000.0 AS total_rev,
           CAST(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                  THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                       * 10000) AS BIGINT) ELSE 0 END) AS BIGINT) * 1000000
                // CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                     * 10000) AS BIGINT)) AS BIGINT) AS BIGINT) AS promo_ppm
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
"""


@query("q133_promo_revenue_share", _Q133)
def q133_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): the share of one month's
    revenue from PROMO-type parts, as parts-per-million of the exact
    fixed-point sums (integer floor-division — the Q8/t63 rule; Q14's
    textbook 100*sum/sum division is the exact half-boundary hazard
    the ratchet test exists to block).

    Scale shape: the month filter prunes the fact scan; part
    broadcasts; numerator and denominator ride ONE aggregate pass.

    100-TB arithmetic (r11 audit): one month of the corpus is ~7e9
    rows → the global d=4 sums measure ~2.4e18 (int64 edge) and the
    ppm numerator sum·1e6 ~2.4e24 — both accumulate in exact
    DECIMAL(38,0); the ppm quotient (≤1e6) and output types stay as
    before."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    fp = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast(
        "long"
    )
    joined = li.join(F.broadcast(p), p["p_partkey"] == li["l_partkey"]).select(
        fp.alias("vol_fp"), (F.col("p_type") == "PROMO").alias("is_promo")
    )
    agg = joined.agg(
        wide_fp_total(
            F.when(F.col("is_promo"), F.col("vol_fp")).otherwise(0)
        ).alias("promo_fp"),
        wide_fp_total(F.col("vol_fp")).alias("tot_fp"),
    )
    return agg.select(
        (F.col("promo_fp").cast("double") / 10000.0).alias("promo_rev"),
        (F.col("tot_fp").cast("double") / 10000.0).alias("total_rev"),
        F.expr("(promo_fp * 1000000) div tot_fp").alias("promo_ppm"),
    )


# --- q134: TPC-H Q16 shape (supplier variety, NOT IN blacklist) -----
_Q134 = """
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#3'
      AND p.p_type NOT IN ('PROMO', 'ECONOMY')
      AND p.p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
      AND l.l_suppkey NOT IN (
        SELECT s.s_suppkey FROM supplier s WHERE s.s_acctbal < 1000)
    GROUP BY p.p_brand, p.p_type, p.p_size
"""


@query("q134_part_supplier_variety", _Q134)
def q134_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): how many
    DISTINCT suppliers ship each qualifying (brand, type, size)
    combination, excluding a blacklisted supplier set via NOT IN — the
    null-aware anti-join + multi-column distinct aggregate.

    Scale shape: the part predicates prune the broadcast dim; the
    blacklist subquery broadcasts as an anti join (s_suppkey is
    non-null, so the null-aware check degenerates to a plain anti);
    COUNT(DISTINCT) shuffles once on the 3-part group key with the
    suppkey as the dedup column."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & ~F.col("p_type").isin("PROMO", "ECONOMY")
        & F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40)
    )
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 1000).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(F.broadcast(p), p["p_partkey"] == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --- q135: TPC-H Q20 shape (excess shipment, nested correlated) -----
# No partsupp.availqty → the "excess" condition compares a supplier's
# recent-year shipped quantity of pattern-matching parts against half
# their all-time quantity: 2*recent > total in exact integers
# (quantities are integral doubles; ROUND makes them int64).
_Q135 = """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_7'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        WHERE l.l_partkey IN (
          SELECT p.p_partkey FROM part p WHERE p.p_name LIKE 'red%')
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING 2 * CAST(SUM(CASE WHEN l.l_shipdate >=
                     TIMESTAMP '2000-01-01 00:00:00'
                   THEN CAST(ROUND(l.l_quantity) AS BIGINT)
                   ELSE 0 END) AS BIGINT)
               > CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT))
"""


@query("q135_excess_recent_shippers", _Q135)
def q135_excess_recent_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers in one
    nation with at least one pattern-named part whose RECENT shipped
    quantity exceeds half that part's all-time volume (the per-part
    grain of Q20's availqty condition) — the nested IN-chain
    (supplier ← grouped lineitem ← part) with a HAVING over
    conditional aggregates. q98 exercises the same IN-chain with a
    correlated-scalar HAVING (share of a part's total); this entry is
    the Q20 variant whose HAVING compares two CONDITIONAL sums of the
    same group — decorrelation without a second correlated subquery.

    Scale shape: the part-pattern IN becomes a broadcast semi-join
    pruning lineitem BEFORE its suppkey aggregate (one exchange);
    the qualifying-supplier set is tiny and broadcasts into the final
    semi-join; nation broadcasts. The 2*recent>total comparison is
    pure int64 — no 0.5 factor to round."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    red = t(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    li = t(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity")).cast("long")
    recent = F.when(
        F.col("l_shipdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"), qty
    ).otherwise(0)
    qual = (
        li.join(F.broadcast(red), red["p_partkey"] == li["l_partkey"], "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(recent).alias("recent_qty"), F.sum(qty).alias("total_qty"))
        .filter(2 * F.col("recent_qty") > F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), n["n_nationkey"] == s["s_nationkey"])
        .join(F.broadcast(qual), qual["l_suppkey"] == s["s_suppkey"], "left_semi")
        .select("s_suppkey", "s_name")
    )


# --- q136: TPC-H Q21 shape (sole late supplier, EXISTS+NOT EXISTS) --
_Q136 = """
    WITH flagged AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CAST(epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)
                  > 60 * 86400000000 AS INTEGER) AS is_late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'),
    late AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM flagged WHERE is_late = 1)
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM flagged l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
"""


@query("q136_sole_late_suppliers", _Q136)
def q136_sole_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21, faithful form (suppliers who kept orders waiting):
    per supplier, the number of finished multi-supplier orders where
    THEY were the only LATE shipper — the EXISTS + NOT-EXISTS double
    correlated self-join, the hardest decorrelation pattern in the
    TPC-H suite. q97 covers the same decorrelation plan with a
    different business rule ("closed the order": nobody shipped
    later); this entry keeps Q21's actual lateness semantics (a
    threshold predicate defines `late`, the probes correlate against
    the LATE subset, not all lines), which changes the plan too: the
    anti-join probes the small filtered relation, not the full fact.

    Scale shape (r10 restructure): the EXISTS + NOT-EXISTS pair is
    FOLDABLE — "S is the only late shipper of a multi-supplier order"
    is a per-order aggregate fact: |late suppliers| = 1 AND
    |suppliers| >= 2, with S = that single late supplier. So instead
    of persisting the flagged relation and probing it with semi/anti
    self-joins (r9 form: one persist + two probe joins), fold to a
    (orderkey, suppkey) dedup aggregate then a per-order aggregate —
    zero persists, zero self-joins, nothing fact-sized held in cache
    at 100 TB. In the big-fact regime where li⋈o is a shuffle join,
    hashpartitioning(orderkey) satisfies BOTH grouping distributions
    (subset rule), so the whole query pays the join's one orderkey
    exchange; in the broadcast regime (test scale) the pair aggregate
    pays the only fact-sized shuffle and the per-order aggregate
    reshuffles already-combined pair rows. Cold A/B at sf0.1 (fresh
    process, min of 3): persist + self-joins 3.68s, bare no-persist
    self-joins 2.38s, folded form 2.30s (SCALING.md). The pair dedup
    keeps a supplier with two late lines in one order counting that
    order once, as before."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = t(spark, sf_dir, "supplier")
    is_late = (
        F.unix_micros("l_shipdate") - F.unix_micros("o_orderdate")
        > 60 * _US_PER_DAY
    ).cast("int")
    pair = (
        li.join(o, o["o_orderkey"] == li["l_orderkey"])
        .select("l_orderkey", "l_suppkey", is_late.alias("is_late"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("is_late").alias("late"))
    )
    per_order = pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("late").alias("n_late"),
        F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    waiting = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
    )
    return (
        waiting.join(F.broadcast(s), s["s_suppkey"] == F.col("late_supp"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --- q193: accumulating-snapshot lifecycle fact -------------------------
#
# Kimball's accumulating-snapshot pattern: one row per order carrying
# its lifecycle milestones — placement, first shipment, final shipment
# — and the lags between them, then rolled up per priority into the
# funnel-velocity profile (mean lag in floored milli-days, max lag,
# and the share of orders fully shipped within 30 days of placement).
# All lags are integer epoch-day arithmetic; shares are floor ppm.

_Q193 = """
    WITH ship AS (
      SELECT l_orderkey,
             MIN(epoch_us(l_shipdate)) // 86400000000 AS first_ship,
             MAX(epoch_us(l_shipdate)) // 86400000000 AS last_ship,
             CAST(COUNT(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY 1),
    snap AS (
      SELECT o.o_orderpriority,
             s.first_ship - epoch_us(o.o_orderdate) // 86400000000
               AS start_lag,
             s.last_ship - s.first_ship AS ship_span,
             s.last_ship - epoch_us(o.o_orderdate) // 86400000000
               AS total_lag,
             s.n_lines
      FROM orders o JOIN ship s ON s.l_orderkey = o.o_orderkey)
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(start_lag) * 1000 // COUNT(*) AS BIGINT)
             AS avg_start_lag_milli,
           CAST(SUM(ship_span) * 1000 // COUNT(*) AS BIGINT)
             AS avg_span_milli,
           CAST(MAX(total_lag) AS BIGINT) AS max_total_lag,
           CAST(SUM(CASE WHEN total_lag <= 30 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS within_30d_ppm
    FROM snap GROUP BY 1
"""


@query("q193_accumulating_snapshot", _Q193)
def q193_accumulating_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-lifecycle accumulating snapshot rolled up per priority
    (see block comment).

    Scale shape: the milestone collapse is one combinable MIN/MAX/
    COUNT per order; the order join is key-to-key; the profile is a
    handful of priority groups — the snapshot build is exactly two
    exchanges at any scale."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    ship = li.groupBy("l_orderkey").agg(
        F.expr("min(unix_micros(l_shipdate)) div 86400000000").alias("first_ship"),
        F.expr("max(unix_micros(l_shipdate)) div 86400000000").alias("last_ship"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    snap = o.join(ship, ship["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority",
        (
            F.col("first_ship")
            - F.expr("unix_micros(o_orderdate) div 86400000000")
        ).alias("start_lag"),
        (F.col("last_ship") - F.col("first_ship")).alias("ship_span"),
        (
            F.col("last_ship")
            - F.expr("unix_micros(o_orderdate) div 86400000000")
        ).alias("total_lag"),
    )
    return snap.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr("sum(start_lag) * 1000 div count(1)").alias("avg_start_lag_milli"),
        F.expr("sum(ship_span) * 1000 div count(1)").alias("avg_span_milli"),
        F.max("total_lag").alias("max_total_lag"),
        F.expr(
            "sum(case when total_lag <= 30 then 1 else 0 end) * 1000000 "
            "div count(1)"
        ).alias("within_30d_ppm"),
    )


# --- q207: split-shipment profile -----------------------------------------
#
# The fulfillment-efficiency read behind q193's lifecycle lags: how
# many distinct shipment WAVES (distinct ship days) does an order
# take, per priority — multi-wave orders cost extra handling, so the
# profile reports the wave-count distribution's head (share shipping
# in one wave) alongside mean lines and waves in floored milli. Pure
# integer day/count arithmetic, one order-grain aggregate.

_Q207 = """
    WITH per_order AS (
      SELECT l_orderkey,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(COUNT(DISTINCT epoch_us(l_shipdate) // 86400000000)
                  AS BIGINT) AS n_waves
      FROM lineitem GROUP BY 1)
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(p.n_lines) * 1000 // COUNT(*) AS BIGINT)
             AS mean_lines_milli,
           CAST(SUM(p.n_waves) * 1000 // COUNT(*) AS BIGINT)
             AS mean_waves_milli,
           CAST(SUM(CASE WHEN p.n_waves = 1 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS single_wave_ppm,
           CAST(MAX(p.n_waves) AS BIGINT) AS max_waves
    FROM orders o JOIN per_order p ON p.l_orderkey = o.o_orderkey
    GROUP BY 1
"""


@query("q207_split_shipments", _Q207)
def q207_split_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipment-wave profile per priority (see block comment).

    Scale shape: one order-keyed aggregate (the distinct-day count is
    per-key bounded by an order's line count), a key-to-key order
    join, and a priority rollup — two exchanges total."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.countDistinct(
            F.expr("unix_micros(l_shipdate) div 86400000000")
        ).alias("n_waves"),
    )
    return (
        o.join(per_order, per_order["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr("sum(n_lines) * 1000 div count(1)").alias("mean_lines_milli"),
            F.expr("sum(n_waves) * 1000 div count(1)").alias("mean_waves_milli"),
            F.expr(
                "sum(case when n_waves = 1 then 1 else 0 end) * 1000000 "
                "div count(1)"
            ).alias("single_wave_ppm"),
            F.max("n_waves").alias("max_waves"),
        )
    )


# --- q208: supplier delivery scorecard --------------------------------------
#
# The procurement vendor scorecard: per supplier, on-time share (line
# shipped within 30 days of order placement), delivered volume share
# of the corpus, and a fixed-weight composite
#     score = (7·on_time_ppm + 3·volume_share_ppm) // 10
# — integer blend of integer ppms (weights are policy literals, so
# the floor is the same policy on both engines). One fact join, one
# supplier-keyed aggregate, one corpus-total broadcast.

_Q208 = """
    WITH lines AS (
      SELECT l.l_suppkey,
             CAST(CASE WHEN epoch_us(l.l_shipdate) // 86400000000
                            - epoch_us(o.o_orderdate) // 86400000000 <= 30
                       THEN 1 ELSE 0 END AS BIGINT) AS on_time,
             CAST(ROUND(l.l_quantity) AS BIGINT) AS q
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
    per_s AS (
      SELECT l_suppkey,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(on_time) AS BIGINT) AS n_on_time,
             CAST(SUM(q) AS BIGINT) AS qty
      FROM lines GROUP BY 1),
    tot AS (SELECT CAST(SUM(qty) AS BIGINT) AS total_qty FROM per_s)
    SELECT s.s_suppkey, s.s_name, p.n_lines,
           CAST(p.n_on_time * 1000000 // p.n_lines AS BIGINT) AS on_time_ppm,
           CAST(p.qty * 1000000 // t.total_qty AS BIGINT) AS volume_ppm,
           CAST((7 * (p.n_on_time * 1000000 // p.n_lines)
                 + 3 * (p.qty * 1000000 // t.total_qty)) // 10 AS BIGINT)
             AS composite_score
    FROM per_s p
    JOIN supplier s ON s.s_suppkey = p.l_suppkey
    CROSS JOIN tot t
"""


@query("q208_supplier_scorecard", _Q208)
def q208_supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-time share, volume share, and the fixed-weight composite per
    supplier (see block comment).

    Scale shape: the order join is key-to-key; the scorecard is one
    supplier-keyed combinable aggregate plus a one-row total and a
    broadcast supplier dim — two exchanges."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    sup = t(spark, sf_dir, "supplier")
    lines = li.join(o, o["o_orderkey"] == li["l_orderkey"]).select(
        "l_suppkey",
        F.when(
            F.expr(
                "unix_micros(l_shipdate) div 86400000000 "
                "- unix_micros(o_orderdate) div 86400000000"
            )
            <= 30,
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("on_time"),
        F.round("l_quantity").cast("long").alias("q"),
    )
    per_s = lines.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("on_time").alias("n_on_time"),
        F.sum("q").alias("qty"),
    )
    tot = per_s.agg(F.sum("qty").alias("total_qty"))
    return (
        per_s.crossJoin(F.broadcast(tot))
        .join(F.broadcast(sup), sup["s_suppkey"] == per_s["l_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            "n_lines",
            F.expr("n_on_time * 1000000 div n_lines").alias("on_time_ppm"),
            F.expr("qty * 1000000 div total_qty").alias("volume_ppm"),
            F.expr(
                "(7 * (n_on_time * 1000000 div n_lines) "
                "+ 3 * (qty * 1000000 div total_qty)) div 10"
            ).alias("composite_score"),
        )
    )


# --- q215: basket width profile ----------------------------------------------
#
# The merchandising basket-width read next to q207's shipment waves:
# how many DISTINCT parts does an order carry, histogrammed per
# priority (width 1 / 2-3 / 4-6 / 7+), with exact order counts and
# revenue cents per cell — the input to bundle and cross-sell
# decisions. One order-keyed aggregate, one key-to-key join, a
# 4-bucket rollup.

_Q215 = """
    WITH per_order AS (
      SELECT l_orderkey,
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS width,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY 1)
    SELECT o.o_orderpriority,
           CASE WHEN p.width = 1 THEN '1'
                WHEN p.width <= 3 THEN '2-3'
                WHEN p.width <= 6 THEN '4-6'
                ELSE '7+' END AS width_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(p.cents) AS BIGINT) AS cents
    FROM orders o JOIN per_order p ON p.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
"""


@query("q215_basket_width", _Q215)
def q215_basket_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-part basket width histogram per priority (see block
    comment).

    Scale shape: the distinct-part count is per-order bounded; the
    profile is two exchanges (order aggregate, priority rollup) with
    a key-to-key order join between them."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_partkey").alias("width"),
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("long")
        ).alias("cents"),
    )
    bucket = (
        F.when(F.col("width") == 1, "1")
        .when(F.col("width") <= 3, "2-3")
        .when(F.col("width") <= 6, "4-6")
        .otherwise("7+")
    )
    return (
        o.join(per_order, per_order["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority", bucket.alias("width_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("cents"),
        )
    )
