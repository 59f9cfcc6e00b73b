"""Streaming window/dedup/sink operators over the pulsarlike source
(SURVEY.md §7 phase 3d)."""

from __future__ import annotations

import json

from pinot_pulsar_plugin_spark.sources.decode import decode_json
from pinot_pulsar_plugin_spark.sources.fakebroker import TopicWriter
from pinot_pulsar_plugin_spark.sources.pulsarlike import read_stream
from pinot_pulsar_plugin_spark.streaming.sinks import start_exactly_once_query
from pinot_pulsar_plugin_spark.streaming.windows import (
    dedup_within_watermark,
    session_counts,
    tumbling_counts,
)

SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
BASE_US = 1_699_999_200_000_000  # fixed epoch anchor, hour-aligned (22:00:00Z)


def _ts(minutes: float) -> str:
    import datetime as dt

    t0 = dt.datetime.fromtimestamp(BASE_US / 1e6, dt.timezone.utc)
    return (t0 + dt.timedelta(minutes=minutes)).strftime("%Y-%m-%d %H:%M:%S")


def _topic(tmp_path, rows):
    root = str(tmp_path / "broker")
    w = TopicWriter(root, "ev", partitions=1)
    for r in rows:
        w.append(0, json.dumps(r))
    return root


def _event(i, minutes, etype="view", user=1, value=1.0):
    return {
        "event_id": i,
        "ts": _ts(minutes),
        "user_id": user,
        "event_type": etype,
        "value": value,
    }


def _run_to_memory(df, spark, tmp_path, name, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_with_watermark(spark, tmp_path):
    rows = [_event(i, m) for i, m in enumerate([1, 5, 59, 61, 125])]
    root = _topic(tmp_path, rows)
    decoded = decode_json(read_stream(spark, root, "ev"), SCHEMA)
    agg = tumbling_counts(decoded, size="1 hour", watermark="1 hour")
    out = _run_to_memory(agg, spark, tmp_path, "t_tumble", mode="append").collect()
    got = {(r.window_start.minute + r.window_start.hour * 60) % 180: r.n_events for r in out}
    # three 1-hour windows: [0,60) has 3 events, [60,120) 1, [120,180) closed?
    # append mode only emits windows the watermark has passed; the last
    # window may be open — assert the closed ones.
    assert any(n == 3 for n in got.values())


def test_session_window_stream(spark, tmp_path):
    # user 1: events at 0,10 (one session), 50 (new session, gap>30)
    rows = [
        _event(0, 0),
        _event(1, 10),
        _event(2, 50),
        _event(3, 200),  # watermark pusher
    ]
    root = _topic(tmp_path, rows)
    decoded = decode_json(read_stream(spark, root, "ev"), SCHEMA)
    agg = session_counts(decoded, gap="30 minutes", watermark="10 minutes")
    out = _run_to_memory(agg, spark, tmp_path, "t_sess", mode="append").collect()
    sizes = sorted(r.n_events for r in out)
    assert sizes[:2] == [1, 2]  # the two closed sessions


def test_dedup_within_watermark(spark, tmp_path):
    rows = [
        _event(1, 0),
        _event(1, 1),  # duplicate event_id within watermark → dropped
        _event(2, 2),
        _event(3, 300),
    ]
    root = _topic(tmp_path, rows)
    decoded = decode_json(read_stream(spark, root, "ev"), SCHEMA)
    dedup = dedup_within_watermark(decoded, watermark="1 hour", keys=("event_id",))
    out = _run_to_memory(dedup, spark, tmp_path, "t_dedup").collect()
    ids = sorted(r.event_id for r in out)
    assert ids == [1, 2, 3]


def test_chained_stateful_operators(spark, tmp_path):
    """Two stateful operators in ONE streaming query (Spark 3.4+):
    dropDuplicatesWithinWatermark → tumbling window count. Replayed
    duplicates vanish before they can double-count a window."""
    rows = [
        _event(1, 0),
        _event(1, 1),  # duplicate id (redelivery) — must not count twice
        _event(2, 10),
        _event(3, 70),
        _event(4, 300),  # watermark pusher
    ]
    root = _topic(tmp_path, rows)
    decoded = decode_json(read_stream(spark, root, "ev"), SCHEMA)
    dedup = dedup_within_watermark(decoded, watermark="2 hours", keys=("event_id",))
    agg = tumbling_counts(dedup, size="1 hour", watermark=None)  # inherit
    out = _run_to_memory(agg, spark, tmp_path, "t_chain", mode="append").collect()
    counts = {r.window_start.hour: r.n_events for r in out}
    assert counts.get(22) == 2  # events 1,2 (dup removed), not 3


def test_exactly_once_foreach_batch_sink(spark, tmp_path):
    rows = [_event(i, i) for i in range(20)]
    root = _topic(tmp_path, rows)
    out_dir = str(tmp_path / "out")
    decoded = decode_json(read_stream(spark, root, "ev", maxmsgs=5), SCHEMA)
    q = start_exactly_once_query(decoded, out_dir, str(tmp_path / "ck_eo"))
    q.processAllAvailable()
    q.stop()
    result = spark.read.parquet(out_dir)
    assert result.count() == 20
    assert result.select("event_id").distinct().count() == 20
    # multiple micro-batches landed as separate idempotent partitions
    assert result.select("batch_id").distinct().count() >= 2
