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
