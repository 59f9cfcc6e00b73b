"""Merged query/oracle registry across all operator modules.

The driver contract (__spark_entry__.py) calls :func:`all_queries` and
:func:`all_oracle_sql`; tests iterate the same registry so local
differential checks exercise exactly what the driver will score.
"""

from __future__ import annotations

import importlib

from pinot_pulsar_plugin_spark.operators.common import QueryFn

# Operator modules that expose QUERIES / ORACLE dicts. Extended as
# modules land (SURVEY.md §7 build plan).
_MODULES = [
    "pinot_pulsar_plugin_spark.operators.relational",
    "pinot_pulsar_plugin_spark.operators.windows",
    "pinot_pulsar_plugin_spark.operators.setops",
    "pinot_pulsar_plugin_spark.operators.scalars",
    "pinot_pulsar_plugin_spark.operators.dedup",
    "pinot_pulsar_plugin_spark.operators.similarity",
    "pinot_pulsar_plugin_spark.operators.textops",
    "pinot_pulsar_plugin_spark.operators.multimodal",
    "pinot_pulsar_plugin_spark.operators.streaming_batch",
    "pinot_pulsar_plugin_spark.operators.advanced",
    "pinot_pulsar_plugin_spark.operators.udfs",
    "pinot_pulsar_plugin_spark.operators.patterns",
    "pinot_pulsar_plugin_spark.operators.eventanalytics",
    "pinot_pulsar_plugin_spark.operators.subqueries",
    "pinot_pulsar_plugin_spark.operators.timeseries",
    "pinot_pulsar_plugin_spark.operators.aggregates2",
]


def _load():
    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}
    for modname in _MODULES:
        try:
            mod = importlib.import_module(modname)
        except ModuleNotFoundError:
            continue  # module not built yet (earlier phases)
        for name, fn in mod.QUERIES.items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} in {modname}")
            queries[name] = fn
        oracle.update(mod.ORACLE)
    return queries, oracle


def all_queries() -> dict[str, QueryFn]:
    return _load()[0]


def all_oracle_sql() -> dict[str, str]:
    return _load()[1]
