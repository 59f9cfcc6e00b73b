"""Differential correctness: every oracle-backed registry query must
match DuckDB exactly (the driver's t2 gate, SURVEY.md §5.2)."""

from __future__ import annotations

import pytest

from pinot_pulsar_plugin_spark import registry
from tests.oracle_harness import compare, duck_connection

_QUERIES = registry.all_queries()
_ORACLE = registry.all_oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_ORACLE))
def test_oracle_parity(name, spark, sf_dir, duck):
    df = _QUERIES[name](spark, sf_dir)
    # arrow round-trip keeps DATE as datetime.date (like Spark toPandas)
    expected = duck.sql(_ORACLE[name]).arrow().to_pandas(date_as_object=True)
    problems = compare(name, df, expected)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLE)))
def test_rows_only_queries_run(name, spark, sf_dir):
    """Queries without a SQL oracle still must run and be deterministic
    in row count across two executions."""
    n1 = _QUERIES[name](spark, sf_dir).count()
    n2 = _QUERIES[name](spark, sf_dir).count()
    assert n1 == n2
