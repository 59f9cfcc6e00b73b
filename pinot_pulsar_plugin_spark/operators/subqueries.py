"""Correlated scalar subquery, LATERAL join, grouping_id — the last
subquery/grouping-set surface (Catalyst rewrites all three to joins or
expand nodes; no iterative per-row execution anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pinot_pulsar_plugin_spark.operators.common import make_registry, t

QUERIES, ORACLE, query = make_registry()

_Q62 = """
    SELECT c.c_custkey, c.c_name,
           (SELECT MAX(o.o_totalprice) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS max_order
    FROM customer c
"""


@query("q62_correlated_scalar_subquery", _Q62)
def q62_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst de-correlates it into a
    left outer aggregate join (one shuffle on the key), so per-row
    re-execution never happens at any scale."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q62)


_Q63 = """
    SELECT c.c_custkey, top2.o_orderkey, top2.o_totalprice
    FROM customer c
    JOIN LATERAL (
      SELECT o.o_orderkey, o.o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o.o_totalprice DESC, o.o_orderkey
      LIMIT 2
    ) AS top2 ON true
"""


@query("q63_lateral_topk", _Q63)
def q63_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT (top-2 orders
    per customer) — the SQL spelling of q25's window top-k."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q63)


_Q64 = """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("q64_grouping_id", _Q64)
def q64_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() indicators distinguish real NULL keys from rollup
    subtotal rows — required for correct OLAP subtotal rendering."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q64)
