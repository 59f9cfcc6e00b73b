"""Shared registry plumbing for operator modules.

Every operator is a function ``(spark, sf_dir) -> DataFrame`` registered
with the :func:`query` decorator; when an ANSI-SQL oracle exists it is
registered alongside so the driver can differential-test against DuckDB
(SURVEY.md §5). Ops without a SQL-expressible oracle (approx sketches,
LSH candidates) register with ``oracle=None`` → driver does a weaker
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pinot_pulsar_plugin_spark.catalog import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


def make_registry():
    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}

    def query(name: str, oracle_sql: str | None = None):
        def deco(fn: QueryFn) -> QueryFn:
            queries[name] = fn
            if oracle_sql is not None:
                oracle[name] = oracle_sql
            return fn

        return deco

    return queries, oracle, query


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand table loader."""
    return load_table(spark, sf_dir, name)


def value_histogram(
    df: DataFrame, keys: list, vals: list, weight=None
) -> DataFrame:
    """The shared scaffold of the r10 histogram rewrites (q91, q106,
    q209, weighted_median_bucketed): collapse rows to per-(keys, vals)
    totals, then attach the within-key cumulative total (ordered by
    vals, Spark null/NaN ordering) and the key total.

    Returns df[keys + vals + (cnt, cum, n)] where cnt is the row count
    (or ``sum(weight)`` when a weight column name/Column is given),
    cum the running total ordered by vals inclusive of the current
    row, and n the per-key total. All exact-rank selections downstream
    (trim ranges, bin intervals, Gini rank runs, median crossings) are
    integer arithmetic over (cnt, cum, n) — fixing the mechanism here
    fixes every rewrite at once."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    agg = (
        F.count(F.lit(1))
        if weight is None
        else F.sum(F.col(weight) if isinstance(weight, str) else weight)
    )
    h = df.groupBy(*keys, *vals).agg(agg.alias("cnt"))
    wv = W.partitionBy(*keys).orderBy(*vals)
    return h.withColumn(
        "cum",
        F.sum("cnt").over(wv.rowsBetween(W.unboundedPreceding, W.currentRow)),
    ).withColumn("n", F.sum("cnt").over(W.partitionBy(*keys)))
