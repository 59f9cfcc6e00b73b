"""Second-wave aggregates and scalar functions: boolean/bitwise
aggregates, extended string family, percent_rank/cume_dist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pinot_pulsar_plugin_spark.operators.common import make_registry, t

QUERIES, ORACLE, query = make_registry()


@query(
    "q70_bool_bit_aggs",
    """
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_totalprice > 400000) AS any_over_400k,
           CAST(bit_and(o_custkey) AS BIGINT) AS band,
           CAST(bit_or(o_custkey) AS BIGINT) AS bor,
           CAST(bit_xor(o_custkey) AS BIGINT) AS bxor
    FROM orders GROUP BY o_orderstatus
    """,
)
def q70_bool_bit_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean (every/some) and bitwise (and/or/xor) aggregates — all
    commutative-associative, so partial aggregation applies and results
    are partition-order independent by construction."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.every(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.some(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.bit_and("o_custkey").alias("band"),
        F.bit_or("o_custkey").alias("bor"),
        F.bit_xor("o_custkey").alias("bxor"),
    )


@query(
    "q71_string_funcs_2",
    """
    SELECT p_partkey,
           translate(p_name, 'aeiou', '01234') AS name_translated,
           CAST(strpos(p_name, 'widget') AS INTEGER) AS widget_pos,
           repeat(p_brand, 2) AS brand_twice,
           reverse(p_type) AS type_rev,
           left(p_name, 4) AS name_l4,
           right(p_name, 4) AS name_r4,
           CAST(contains(p_name, 'bolt') AS INTEGER) AS has_bolt,
           CAST(starts_with(p_type, 'PRO') AS INTEGER) AS is_promo,
           CAST(ends_with(p_brand, '3') AS INTEGER) AS brand_ends_3
    FROM part
    """,
)
def q71_string_funcs_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string family: translate, position, repeat, reverse,
    left/right, contains/starts/ends (booleans cast to int so the
    value-hash sees identical primitive types)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.translate("p_name", "aeiou", "01234").alias("name_translated"),
        F.instr("p_name", "widget").alias("widget_pos"),
        F.repeat("p_brand", 2).alias("brand_twice"),
        F.reverse("p_type").alias("type_rev"),
        F.expr("left(p_name, 4)").alias("name_l4"),
        F.expr("right(p_name, 4)").alias("name_r4"),
        F.contains("p_name", F.lit("bolt")).cast("int").alias("has_bolt"),
        F.startswith("p_type", F.lit("PRO")).cast("int").alias("is_promo"),
        F.endswith("p_brand", F.lit("3")).cast("int").alias("brand_ends_3"),
    )


@query(
    "q73_multi_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS d_parts,
           COUNT(DISTINCT l_suppkey) AS d_supps,
           COUNT(DISTINCT l_orderkey) AS d_orders,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q73_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several COUNT(DISTINCT) over different columns in one aggregate —
    Catalyst plans this with an Expand node (one row replicated per
    distinct-column group), the multi-distinct strategy that avoids N
    separate scans."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("d_parts"),
        F.countDistinct("l_suppkey").alias("d_supps"),
        F.countDistinct("l_orderkey").alias("d_orders"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q72_percent_rank_cume",
    """
    SELECT c_custkey, c_mktsegment,
           ROUND(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal), 9) AS pr,
           ROUND(CUME_DIST() OVER (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal), 9) AS cd
    FROM customer
    """,
)
def q72_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist analytic functions (rounded at 9 digits:
    both engines compute (rank-1)/(n-1) and rank/n in double — identical
    division, rounding only guards the formatting)."""
    from pyspark.sql import Window as W

    c = t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 9).alias("pr"),
        F.round(F.cume_dist().over(w), 9).alias("cd"),
    )
