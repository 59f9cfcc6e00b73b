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
