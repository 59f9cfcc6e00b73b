"""Empty-input totality: every registry operator must behave
correctly on an empty corpus with the production schemas — run to
completion AND (when an oracle exists) produce exactly what the SQL
semantics say an empty input produces (global aggregates legitimately
emit one NULL/zero row; keyed ops emit nothing).

Real pipelines hit empty inputs constantly — a fresh partition, a
filter that matched nothing, the first micro-batch — and the failure
modes are operator-specific engine edge cases: sequence(1, 0) DESCENDS
in Spark, list folds over empty arrays, min/max going NULL into
arithmetic, windows over zero rows. One differential sweep pins all of
them."""

from __future__ import annotations

import pytest

from pinot_pulsar_plugin_spark.catalog import TABLES
from pinot_pulsar_plugin_spark.registry import all_oracle_sql, all_queries
from tests.oracle_harness import compare, duck_connection

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("empty_sf")
    for name in TABLES:
        # single 0-row FILE with the source's exact physical schema
        # (both engines read files; Spark's dir-writer would break
        # DuckDB's path glob)
        schema = pq.read_schema(f"{SRC}/{name}.parquet")
        pq.write_table(schema.empty_table(), str(root / f"{name}.parquet"))
    return str(root)


@pytest.fixture(scope="module")
def empty_con(empty_dir):
    con = duck_connection(empty_dir)
    yield con
    con.close()


# Known cross-engine divergence, found BY this sweep and pinned here:
# on an EMPTY relation, the SQL standard (and DuckDB/Postgres) says
# ROLLUP/CUBE/GROUPING SETS still emit the grand-total () grouping-set
# row (COUNT 0, NULL keys) — a grouping set behaves like a global
# aggregate. Spark emits NOTHING (grouping-set expansion happens after
# the scan, so zero input rows expand to zero). Non-empty inputs agree
# (the main parity suite); the divergence exists only at exactly zero
# rows. Pinned rather than patched: injecting a synthetic grand-total
# row would complicate every hot plan to serve a degenerate input.
_EMPTY_GROUPING_SET_DIVERGENCE = {
    "q14_agg_rollup",
    "q15_agg_cube",
    "q16_grouping_sets",
    "q64_grouping_id",
}


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_runs_on_empty_corpus(name, spark, empty_dir, empty_con):
    fn = all_queries()[name]
    oracle = all_oracle_sql()
    sdf = fn(spark, empty_dir)
    if name in _EMPTY_GROUPING_SET_DIVERGENCE:
        # Spark: no rows; DuckDB: the grand-total row. Pin both sides
        # so a behavior change in either engine surfaces here.
        assert sdf.count() == 0
        assert len(empty_con.sql(oracle[name]).arrow()) >= 1
        return
    if name in oracle:
        expected = empty_con.sql(oracle[name]).arrow().to_pandas(
            date_as_object=True
        )
        problems = compare(name, sdf, expected)
        assert not problems, "\n".join(problems)
    else:
        sdf.count()  # rows-only ops: must not crash


def test_chunked_scale_paths_reject_nonpositive_params():
    """The chunked/histogram scale paths must fail loudly on
    non-positive chunk/bucket/bin parameters (a zero would otherwise
    produce silent null chunks and empty output)."""
    import pytest as _pytest

    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        weighted_median_bucketed,
    )
    from pinot_pulsar_plugin_spark.operators.eventanalytics import (
        equidepth_bins_hist,
        scd2_chunked,
    )
    from pinot_pulsar_plugin_spark.operators.windows import sessionize_chunked

    with _pytest.raises(ValueError):
        sessionize_chunked(None, chunk_us=0)
    with _pytest.raises(ValueError):
        scd2_chunked(None, chunk_us=-5)
    with _pytest.raises(ValueError):
        weighted_median_bucketed(None, "g", "v", "wt", bucket_width=0.0)
    with _pytest.raises(ValueError):
        equidepth_bins_hist(None, bins=0)
