"""Scale-pattern correctness + plan shape: salted joins, bucketed
shuffle-free joins, availableNow trigger, streaming differential vs the
batch table."""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import functions as F

from pinot_pulsar_plugin_spark.catalog import load_table
from pinot_pulsar_plugin_spark.functions.skew import salted_join
from pinot_pulsar_plugin_spark.plans.explain import formatted_plan
from pinot_pulsar_plugin_spark.sources.decode import decode_json
from pinot_pulsar_plugin_spark.sources.fakebroker import TopicWriter
from pinot_pulsar_plugin_spark.sources.pulsarlike import read_stream

SF = "/root/testdata/sf0.001"


def test_salted_join_matches_plain_join(spark):
    """Salting must be a pure physical rewrite: row-identical output."""
    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer").withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(cust, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, cust, "o_custkey", n_salts=8).select(
        "o_orderkey", "c_name"
    )
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must land in multiple salt groups."""
    skewed = spark.range(10_000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame([(7, "hot")], "k long, label string")
    out = salted_join(skewed, dim, "k", n_salts=8)
    assert out.count() == 10_000
    # salt distribution: recompute the salt the helper uses
    salts = (
        skewed.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("k"), F.col("payload")), F.lit(8))
        )
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts == 8


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key removes the exchange — the
    co-located-join strategy for repeated 100 TB fact-fact joins."""
    import shutil

    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    for stale in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"/tmp/spark_graft_warehouse/{stale}", ignore_errors=True)
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_lineitem")
    # force the SMJ path (at test scale Catalyst would broadcast; at
    # 100 TB neither side broadcasts and bucketing is what saves the
    # shuffle — that's the plan under test)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # bucket co-location: no shuffle
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_available_now_trigger(spark, tmp_path):
    """Trigger.AvailableNow: each run snapshots its end offsets once
    (one admission window with our capped latestOffset), drains to the
    snapshot, and stops — so a scheduled loop of availableNow runs
    consumes the backlog incrementally through the shared checkpoint,
    which is exactly the batch-catchup deployment pattern."""
    root = str(tmp_path / "b")
    w = TopicWriter(root, "ev", partitions=1)
    for i in range(25):
        w.append(0, json.dumps({"event_id": i}))

    out = str(tmp_path / "out")

    def drain_once() -> int:
        df = decode_json(read_stream(spark, root, "ev", maxmsgs=10), "event_id bigint")
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive  # availableNow stops by itself
        return spark.read.parquet(out).count()

    seen = [drain_once() for _ in range(3)]
    # cumulative counts: each run drains one 10-cap admission window
    # through the shared checkpoint
    assert seen == [10, 20, 25]
    ids = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert ids == list(range(25))


def test_streaming_decode_differential_vs_table(spark, tmp_path):
    """FIXTURES.md §B.1: a topic whose payloads serialize the events
    table must decode back to EXACTLY the table rows — the streaming
    path's differential correctness against the batch path."""
    events = load_table(spark, SF, "events")
    pdf = events.toPandas()
    root = str(tmp_path / "b")
    w = TopicWriter(root, "events", partitions=3, rollover_every=100)
    for i, row in pdf.iterrows():
        payload = json.dumps(
            {
                "event_id": int(row.event_id),
                "ts": pd.Timestamp(row.ts).strftime("%Y-%m-%d %H:%M:%S.%f"),
                "user_id": int(row.user_id),
                "event_type": row.event_type,
                "value": float(row.value),
                "props": row.props,
            }
        )
        w.append(int(row.event_id) % 3, payload)

    decoded = decode_json(
        read_stream(spark, root, "events"),
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
        keep_cols=(),
    )
    q = (
        decoded.writeStream.format("memory")
        .queryName("t_diff")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = spark.sql("SELECT * FROM t_diff")
    assert streamed.count() == events.count()
    # exact row-set equality both directions
    assert events.exceptAll(streamed).count() == 0
    assert streamed.exceptAll(events).count() == 0


def test_salted_join_rejects_unsafe_how(spark):
    """Replicating the small side once per salt would emit unmatched
    small-side rows n_salts times under right/full joins — those hows
    must raise instead of silently duplicating."""
    import pytest as _pytest

    df = spark.range(4).withColumnRenamed("id", "k")
    for how in ("right", "full", "full_outer", "rightouter"):
        with _pytest.raises(ValueError):
            salted_join(df, df, "k", how=how)


def test_q69_composite_blocks_bounded(spark):
    """The fuzzy-match blocking key must bound block size well below
    brand-only blocking (whose in-block quadratic blows up at 100x):
    each pass's largest block is >=4x smaller than the largest brand
    block at sf0.01."""
    from pyspark.sql import functions as F

    p = spark.read.parquet("/root/testdata/sf0.01/part.parquet")
    brand_max = p.groupBy("p_brand").count().agg(F.max("count")).first()[0]
    for tok in (
        F.substring_index("p_name", " ", 1),
        F.substring_index("p_name", " ", -1),
    ):
        m = (
            p.groupBy("p_brand", tok.alias("blk"))
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        assert m * 4 <= brand_max, (m, brand_max)


def test_materialized_rollup_serves_every_grouping(spark, tmp_path):
    """Star-tree analog: ONE cube materialization of lineitem answers
    group-bys over every dim subset — served results equal direct
    aggregation, and the serve plan scans only the tiny summary table
    (pre-aggregation turns a 100 TB scan into a summary lookup)."""
    from pinot_pulsar_plugin_spark.functions.exact import exact_sum
    from pinot_pulsar_plugin_spark.functions.rollup import (
        materialize_rollup,
        serve_group_by,
    )

    li = load_table(spark, SF, "lineitem")
    dims = ["l_returnflag", "l_linestatus"]
    measures = {
        "n": F.count(F.lit(1)),
        "sum_qty": exact_sum(F.col("l_quantity"), "sum_qty"),
    }
    out = str(tmp_path / "rollup.parquet")
    materialize_rollup(li, dims, measures).write.parquet(out)
    rollup = spark.read.parquet(out)

    for subset in ([], ["l_returnflag"], ["l_linestatus"], dims):
        served = serve_group_by(rollup, dims, subset, ["n", "sum_qty"]).toPandas()
        direct = (
            li.groupBy(*subset)
            .agg(measures["n"].alias("n"), measures["sum_qty"].alias("sum_qty"))
            .toPandas()
        )
        cols = sorted(served.columns)
        served = served[cols].sort_values(cols).reset_index(drop=True)
        direct = direct[cols].sort_values(cols).reset_index(drop=True)
        assert served.equals(direct), subset

    plan = formatted_plan(serve_group_by(rollup, dims, ["l_returnflag"], ["n"]))
    assert "lineitem" not in plan  # summary lookup, never a fact scan
    assert "HashAggregate" not in plan  # no query-time aggregation


def test_sequence_packing_invariants(spark):
    """Packing correctness properties the value-hash oracle can't state
    directly: every document appears exactly once; within each shard
    the preceding-docs token sum stayed under budget (the shard index
    is floor(cumulative_before/budget), so equal shard ⇒ the docs
    before it fit); shards are contiguous per lane."""
    from pinot_pulsar_plugin_spark.operators.pipelines import (
        _PACK_BUDGET,
        q75_sequence_packing,
    )

    out = q75_sequence_packing(spark, SF).toPandas()
    docs = load_table(spark, SF, "documents").toPandas()
    # every doc packed exactly once
    assert sorted(out["doc_id"]) == sorted(docs["doc_id"])
    for (_, shard), grp in out.groupby(["pack_group", "shard"]):
        grp = grp.sort_values("doc_id")
        # tokens BEFORE each doc in its shard fit the budget
        before = grp["n_tokens"].cumsum() - grp["n_tokens"]
        assert (before < _PACK_BUDGET).all()
    # shards contiguous and non-decreasing along each lane's doc order
    for _, lane in out.groupby("pack_group"):
        shards = lane.sort_values("doc_id")["shard"].to_numpy()
        assert (shards[1:] >= shards[:-1]).all()


def test_zorder_morton_reference(spark):
    """The JVM-side Morton spread matches a bit-by-bit Python
    reference, including 32-bit extremes."""
    from pinot_pulsar_plugin_spark.functions.zorder import zorder2

    def ref(a, b):
        z = 0
        for i in range(31):
            z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return z  # 31 bits per dim -> 62-bit code, always positive

    cases = [(0, 0), (1, 0), (0, 1), (3, 5), (12345, 67890),
             (0x7FFFFFFF, 0), (0, 0x7FFFFFFF), (0x7FFFFFFF, 0x7FFFFFFF)]
    df = spark.createDataFrame(cases, "a long, b long").select(
        "a", "b", zorder2("a", "b").alias("z")
    )
    for r in df.collect():
        assert r.z == ref(r.a, r.b), (r.a, r.b, r.z, ref(r.a, r.b))


def test_zorder_write_prunes_2d_box(spark, tmp_path):
    """Row-group skipping for a 2-D box predicate: a z-ordered write
    keeps min/max bounding boxes tight in BOTH dimensions, so far fewer
    row groups intersect the box than under a single-column sort —
    and the rows read back are identical."""
    import pyarrow.parquet as pq

    from pinot_pulsar_plugin_spark.functions.zorder import zorder2

    # 200k rows over a 1024x1024 key space, uncorrelated dims
    base = spark.range(200_000).selectExpr(
        "pmod(id * 2654435761, 1024) AS u", "pmod(id * 2246822519, 1024) AS v"
    )
    sorted_dir, z_dir = str(tmp_path / "by_u"), str(tmp_path / "by_z")
    rg = {"parquet.block.size": 64 * 1024}  # many small row groups
    (base.repartitionByRange(4, "u").sortWithinPartitions("u")
         .write.options(**rg).parquet(sorted_dir))
    z = zorder2("u", "v")
    (base.repartitionByRange(4, z).sortWithinPartitions(z)
         .write.options(**rg).parquet(z_dir))

    def groups_hit(d, lo, hi):
        total = hit = 0
        for piece in __import__("pathlib").Path(d).glob("*.parquet"):
            md = pq.ParquetFile(piece).metadata
            cols = {md.row_group(0).column(i).path_in_schema: i
                    for i in range(md.num_columns)}
            for g in range(md.num_row_groups):
                total += 1
                su = md.row_group(g).column(cols["u"]).statistics
                sv = md.row_group(g).column(cols["v"]).statistics
                if su.min <= hi and su.max >= lo and sv.min <= hi and sv.max >= lo:
                    hit += 1
        return hit, total

    lo, hi = 256, 383  # 12.5% selectivity per dimension
    hit_u, total_u = groups_hit(sorted_dir, lo, hi)
    hit_z, total_z = groups_hit(z_dir, lo, hi)
    assert total_u > 20 and total_z > 20, (total_u, total_z)
    # sorted-by-u prunes u but not v -> ~12.5% of groups; z-order
    # bounds both dims -> must hit strictly fewer groups
    assert hit_z < hit_u, (hit_z, total_z, hit_u, total_u)
    # and the data read back under the box predicate is identical
    pred = f"u BETWEEN {lo} AND {hi} AND v BETWEEN {lo} AND {hi}"
    a = sorted(map(tuple, spark.read.parquet(sorted_dir).filter(pred).collect()))
    b = sorted(map(tuple, spark.read.parquet(z_dir).filter(pred).collect()))
    assert a == b and len(a) > 0


def test_partition_pruning_on_date_partitioned_layout(spark, tmp_path):
    """The 100 TB layout contract (SCALING.md §3): a table written
    partitioned by date serves a date-filtered query by reading ONLY
    the matching partition directories — the filter must appear as a
    PartitionFilters entry at the scan (pruning happens at planning,
    before any file is opened), and the scanned file count must equal
    one partition's files, not the table's."""
    from pyspark.sql import functions as F

    from pinot_pulsar_plugin_spark.catalog import load_table
    from pinot_pulsar_plugin_spark.plans.explain import formatted_plan

    out = str(tmp_path / "events_by_day")
    ev = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "event_date", F.to_date("ts")
    )
    ev.write.partitionBy("event_date").parquet(out)
    n_days = ev.select("event_date").distinct().count()
    assert n_days > 1  # layout actually split

    one_day = ev.select(F.max("event_date")).first()[0]
    q = (
        spark.read.parquet(out)
        .filter(F.col("event_date") == F.lit(one_day))
        .select("event_id", "value")
    )
    plan = formatted_plan(q)
    assert "PartitionFilters" in plan and "event_date" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0], plan

    # pruning is visible in the files actually read
    files = {r[0] for r in q.select(F.input_file_name()).distinct().collect()}
    assert all(f"event_date={one_day}" in f for f in files), files


def test_aqe_skew_join_split_engages(spark):
    """The session enables AQE skew-join splitting (session.py); prove
    it actually ENGAGES: a 200k-row fact with one hot key joined to a
    tiny dim (broadcast disabled to force the shuffle join) must show
    skew=true in the finalized adaptive plan — the hot partition was
    split across tasks instead of serializing on one."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        fact = spark.range(200_000).select(
            F.when(F.col("id") % 20 == 0, F.col("id") % 50)
            .otherwise(7)
            .alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
        j = fact.join(dim, "k")
        assert j.count() == 200_000
        j.collect()  # finalize THIS query's adaptive plan
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_observation_metrics_piggyback_on_action(spark):
    """``df.observe`` (Observation API): pipeline health metrics —
    row count, null count, fixed-point sum — computed DURING the
    action, not by a second scan. The audit-while-you-write pattern:
    at 100 TB a separate validation pass doubles the read; observe()
    attaches combinable aggregates to the existing plan for free."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from pinot_pulsar_plugin_spark.operators.common import t

    li = t(spark, "/root/testdata/sf0.001", "lineitem")
    obs = Observation("ingest_audit")
    audited = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").isNull().cast("int")).alias("null_qty"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "price_cents"
        ),
    )
    written = audited.filter(F.col("l_quantity") > 0).count()
    m = obs.get
    assert m["n_rows"] == li.count()  # observed BEFORE the filter
    assert m["null_qty"] == 0
    exact = li.agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
    ).collect()[0][0]
    assert m["price_cents"] == exact
    assert written <= m["n_rows"]


def test_dynamic_partition_overwrite_backfill(spark, tmp_path):
    """Idempotent backfill: with partitionOverwriteMode=dynamic an
    INSERT OVERWRITE replaces ONLY the partitions present in the new
    data — the pattern that makes a re-run of one day's pipeline safe
    at 100 TB (static mode would wipe the whole table). Re-running the
    same backfill is a no-op on every other partition."""
    from pyspark.sql import functions as F

    from pinot_pulsar_plugin_spark.operators.common import t

    path = str(tmp_path / "bydate")
    ev = t(spark, "/root/testdata/sf0.001", "events").withColumn(
        "day", F.to_date("ts")
    )
    ev.write.partitionBy("day").parquet(path)
    before = spark.read.parquet(path)
    n_total = before.count()
    days = [r.day for r in before.select("day").distinct().collect()]
    target = sorted(days)[0]

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patched = (
            ev.filter(F.col("day") == F.lit(target))
            .withColumn("value", F.col("value") * 2)
        )
        patched.write.mode("overwrite").partitionBy("day").parquet(path)
        after = spark.read.parquet(path)
        # every other partition untouched, row count preserved
        assert after.count() == n_total
        untouched = after.filter(F.col("day") != F.lit(target))
        base_untouched = before.filter(F.col("day") != F.lit(target))
        assert untouched.exceptAll(base_untouched).count() == 0
        assert base_untouched.exceptAll(untouched).count() == 0
        # the target partition carries the patch
        got = (
            after.filter(F.col("day") == F.lit(target))
            .agg(F.sum(F.round(F.col("value") * 100).cast("long")))
            .collect()[0][0]
        )
        want = (
            patched.agg(F.sum(F.round(F.col("value") * 100).cast("long")))
            .collect()[0][0]
        )
        assert got == want
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")


def test_cbo_table_stats_drive_size_estimates(spark, tmp_path):
    """Cost-based optimization needs statistics: ANALYZE TABLE COMPUTE
    STATISTICS records row count and size, and the optimizer's size
    estimate for the analyzed table reflects them — at 100 TB, stats
    (not guesses) decide broadcast-vs-shuffle for tables near the
    broadcast threshold. File-scan relations fall back to file size;
    this pins the catalog-stats path end-to-end."""
    from pyspark.sql import functions as F

    from pinot_pulsar_plugin_spark.operators.common import t

    spark.sql("DROP TABLE IF EXISTS cbo_nation")
    t(spark, "/root/testdata/sf0.001", "nation").write.saveAsTable("cbo_nation")
    try:
        spark.sql("ANALYZE TABLE cbo_nation COMPUTE STATISTICS")
        desc = {
            r.col_name: r.data_type
            for r in spark.sql("DESCRIBE TABLE EXTENDED cbo_nation").collect()
        }
        stats = desc.get("Statistics", "")
        assert "25 rows" in stats, desc
        # rowCount propagates into plan estimates only under CBO
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            est = (
                spark.table("cbo_nation")
                ._jdf.queryExecution()
                .optimizedPlan()
                .stats()
            )
            assert est.rowCount().isDefined()
            assert est.rowCount().get() == 25
        finally:
            spark.conf.set("spark.sql.cbo.enabled", "false")
    finally:
        spark.sql("DROP TABLE IF EXISTS cbo_nation")


def test_fuzz_salted_join_row_identical_all_safe_hows(spark):
    """salted_join claims row-identity with the plain join for every
    allowed join type; only inner was compared. Randomized multiset
    differential across inner/left/semi/anti with NULL keys and
    duplicate keys on BOTH sides (replication must preserve join
    multiplicity; null keys must not match anything yet survive a left
    join exactly once, not once per salt)."""
    import random

    from pinot_pulsar_plugin_spark.functions.skew import salted_join

    rng = random.Random(4400)
    for case in range(3):
        big_rows = [
            (rng.choice([None, 1, 2, 3, 7, 7, 7]), i)
            for i in range(rng.randrange(5, 60))
        ]
        small_rows = [
            (rng.choice([None, 1, 2, 7, 7, 9]), 100 + j)
            for j in range(rng.randrange(1, 12))
        ]
        big = spark.createDataFrame(big_rows, "k long, v long")
        small = spark.createDataFrame(small_rows, "k long, w long")
        for how in ["inner", "left", "semi", "anti"]:
            plain = big.join(small, "k", how)
            salted = salted_join(big, small, "k", n_salts=5, how=how)
            assert salted.columns == plain.columns, (case, how)
            diff = plain.exceptAll(salted).count() + salted.exceptAll(plain).count()
            assert diff == 0, (case, how)
