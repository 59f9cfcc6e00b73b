"""Local differential harness mirroring the driver's correctness gate.

Runs a registry query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, schema-shape (column
names), and values after sorting columns by name and rows by value —
i.e. the same order-insensitive comparison the driver hashes. Values are
compared EXACTLY (floats included): the engine's oracle-checked queries
are designed to be bit-reproducible (see functions/exact.py), so any
non-exact float here is a real portability bug to fix, not noise.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import numpy as np
import pandas as pd

from pinot_pulsar_plugin_spark.catalog import TABLES, table_path


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return ("null",)
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return ("nan",)
        return ("f", repr(f))
    if isinstance(v, (np.integer, int, bool)):
        return ("i", int(v))
    if isinstance(v, (np.datetime64, pd.Timestamp)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ("t", ts.isoformat())
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return ("t", v.isoformat())
    if isinstance(v, _dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("a", tuple(_norm_cell(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return ("b", bytes(v).hex())
    if isinstance(v, pd.core.arrays.masked.BaseMaskedArray):  # pragma: no cover
        return ("a", tuple(_norm_cell(x) for x in v))
    if v is pd.NA or v is pd.NaT:
        return ("null",)
    return ("s", str(v))


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in row))
    out.sort()
    return out


def compare(name: str, spark_df, duck_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(duck_df.columns):
        problems.append(
            f"{name}: column mismatch spark={sorted(sp.columns)} duck={sorted(duck_df.columns)}"
        )
        return problems
    if len(sp) != len(duck_df):
        problems.append(f"{name}: row count spark={len(sp)} duck={len(duck_df)}")
    a, b = normalize(sp), normalize(duck_df)
    if a != b:
        diff_a = [r for r in a if r not in set(b)][:3]
        diff_b = [r for r in b if r not in set(a)][:3]
        problems.append(
            f"{name}: value mismatch; spark-only={diff_a} duck-only={diff_b}"
        )
    return problems
