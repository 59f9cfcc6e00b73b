"""Set operators: UNION ALL / UNION / INTERSECT / EXCEPT ALL.

UNION ALL is shuffle-free (plan concatenation); the distinct variants
cost one hash-dedup shuffle — Catalyst plans them as aggregates, so
map-side partial dedup keeps shuffle volume at #distinct, not #rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pinot_pulsar_plugin_spark.operators.common import make_registry, t

QUERIES, ORACLE, query = make_registry()


def _cust_nk(spark, sf_dir):
    return t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))


def _supp_nk(spark, sf_dir):
    return t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))


@query(
    "q30_union_all",
    """
    SELECT c_nationkey AS nk FROM customer
    UNION ALL
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def q30_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nk(spark, sf_dir).unionAll(_supp_nk(spark, sf_dir))


@query(
    "q31_union_distinct",
    """
    SELECT c_nationkey AS nk FROM customer
    UNION
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def q31_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nk(spark, sf_dir).union(_supp_nk(spark, sf_dir)).distinct()


@query(
    "q32_intersect",
    """
    SELECT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def q32_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nk(spark, sf_dir).intersect(_supp_nk(spark, sf_dir))


@query(
    "q65_intersect_all",
    """
    SELECT c_nationkey AS nk FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def q65_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics INTERSECT ALL (min of multiplicities)."""
    return _cust_nk(spark, sf_dir).intersectAll(_supp_nk(spark, sf_dir))


@query(
    "q66_nulls_ordering",
    """
    SELECT n.n_nationkey, s.s_suppkey
    FROM nation n FULL OUTER JOIN supplier s ON n.n_nationkey = s.s_nationkey
    ORDER BY s.s_suppkey NULLS FIRST, n.n_nationkey NULLS LAST
    LIMIT 8
    """,
)
def q66_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST/LAST placement under LIMIT (the ordering
    semantics only observable through a deterministic top-N)."""
    n = t(spark, sf_dir, "nation")
    s = t(spark, sf_dir, "supplier")
    return (
        n.join(s, n.n_nationkey == s.s_nationkey, "full_outer")
        .select("n_nationkey", "s_suppkey")
        .orderBy(F.col("s_suppkey").asc_nulls_first(), F.col("n_nationkey").asc_nulls_last())
        .limit(8)
    )


@query(
    "q33_except_all",
    """
    SELECT c_nationkey AS nk FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def q33_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics EXCEPT ALL (multiplicity-aware anti difference)."""
    return _cust_nk(spark, sf_dir).exceptAll(_supp_nk(spark, sf_dir))
