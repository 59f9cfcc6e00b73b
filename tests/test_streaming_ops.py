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
    """Differential batch↔stream sessionization (VERDICT r3 #5): the
    streaming session_window aggregation and the batch lag-gap +
    running-sum composition (q29's algorithm) are independent
    implementations of the same 30-minute-gap semantics — on identical
    events every closed streaming session must equal a batch session
    exactly. Mapping: streaming session_end = last event + gap, so the
    batch side compares against max(ts) + gap."""
    import datetime as dt

    import random as _random
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    rng = _random.Random(77)
    rows = []
    i = 0
    for user in (1, 2, 3):
        m = rng.randrange(0, 5)
        for _ in range(rng.randrange(3, 6)):  # sessions per user
            for _ in range(rng.randrange(1, 5)):  # events per session
                rows.append(_event(i, m, user=user))
                i += 1
                m += rng.choice([0, 1, 7, 29])  # intra-session gaps ≤ 30
            m += rng.choice([31, 45, 120])  # inter-session gap > 30
        rows.append(_event(i, 5000, user=user))  # watermark pusher
        i += 1
    root = _topic(tmp_path, rows)
    decoded = decode_json(read_stream(spark, root, "ev"), SCHEMA)
    agg = session_counts(decoded, gap="30 minutes", watermark="10 minutes")
    out = _run_to_memory(agg, spark, tmp_path, "t_sess", mode="append").collect()
    cutoff = dt.datetime.fromtimestamp(BASE_US / 1e6) + dt.timedelta(minutes=4000)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in out
        if r.session_start < cutoff  # pusher sessions may still be open
    }

    # batch twin: q29's lag-gap composition over the SAME rows
    batch = spark.createDataFrame(
        [(r["event_id"], r["ts"], r["user_id"]) for r in rows],
        "event_id long, ts string, user_id long",
    ).select("event_id", "user_id", F.to_timestamp("ts").alias("ts"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr("INTERVAL 30 MINUTES")
    prev = F.lag("ts").over(w)
    sess = (
        batch.withColumn(
            "is_new",
            F.when(prev.isNull() | (F.col("ts") > prev + gap), 1).otherwise(0),
        )
        .withColumn(
            "sid",
            F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            (F.max("ts") + gap).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    expected = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sess.collect()
        if r.session_start < cutoff
    }
    assert got == expected and len(expected) >= 9


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


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """Differential batch↔stream interval join (st61): the watermarked
    stream-stream join and the batch equi-join-plus-range-filter are
    independent implementations of 'purchase within 2h after view by
    the same user' — on identical events every emitted streaming pair
    must equal the batch pairs exactly (inner interval joins emit
    eagerly, so no open-state cutoff is needed)."""
    import random as _random

    from pyspark.sql import functions as F

    from pinot_pulsar_plugin_spark.streaming.windows import interval_join

    rng = _random.Random(61)
    rows = []
    i = 0
    for user in (1, 2, 3, 4):
        m = rng.randrange(0, 10)
        for _ in range(rng.randrange(8, 16)):
            etype = rng.choice(["view", "purchase", "click"])
            rows.append(_event(i, m, etype=etype, user=user))
            i += 1
            m += rng.choice([1, 5, 30, 90, 150])
    root = _topic(tmp_path, rows)
    decoded_v = decode_json(read_stream(spark, root, "ev"), SCHEMA)
    decoded_p = decode_json(read_stream(spark, root, "ev"), SCHEMA)
    joined = interval_join(
        decoded_v.where(F.col("event_type") == "view"),
        decoded_p.where(F.col("event_type") == "purchase"),
        max_delay="2 hours",
    )
    out = _run_to_memory(joined, spark, tmp_path, "t_ivj").collect()
    got = {
        (r.user_id, r.view_event_id, r.purchase_event_id, r.delay_us) for r in out
    }

    batch = spark.createDataFrame(
        [(r["event_id"], r["ts"], r["user_id"], r["event_type"]) for r in rows],
        "event_id long, ts string, user_id long, event_type string",
    ).select("event_id", "user_id", "event_type", F.to_timestamp("ts").alias("ts"))
    v = batch.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_event_id"), F.col("ts").alias("v_ts")
    )
    p = batch.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_event_id"),
        F.col("ts").alias("p_ts"),
    )
    expected = {
        (r.user_id, r.view_event_id, r.purchase_event_id, r.delay_us)
        for r in v.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("v_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 2 HOURS")),
        )
        .select(
            "user_id",
            "view_event_id",
            "purchase_event_id",
            (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("delay_us"),
        )
        .collect()
    }
    assert got == expected and len(expected) >= 5


def test_interval_join_drops_late_purchase_after_watermark(spark, tmp_path):
    """State-expiry semantics of the stream-stream interval join: once
    both sides' watermarks pass view_ts + max_delay, the buffered view
    state is evicted and a too-late matching purchase produces NO pair
    — the bound that keeps join state O(in-flight window) at
    100 TB/day. First batch: an in-window match emits; watermark
    pushers then advance both sides far past the join window; second
    batch: a purchase 60 min after the old view (in-window by time
    arithmetic, but far behind the watermark) must be dropped."""
    import json as _json

    from pyspark.sql import functions as F

    from pinot_pulsar_plugin_spark.sources.fakebroker import TopicWriter
    from pinot_pulsar_plugin_spark.streaming.windows import interval_join

    root = str(tmp_path / "broker")
    w = TopicWriter(root, "ev", partitions=1)
    first = [
        _event(0, 0, etype="view", user=1),
        _event(1, 30, etype="purchase", user=1),  # in-window match
        _event(2, 9000, etype="view", user=9),  # watermark pushers
        _event(3, 9000, etype="purchase", user=9),
    ]
    for r in first:
        w.append(0, _json.dumps(r))
    decoded_v = decode_json(read_stream(spark, root, "ev"), SCHEMA)
    decoded_p = decode_json(read_stream(spark, root, "ev"), SCHEMA)
    joined = interval_join(
        decoded_v.where(F.col("event_type") == "view"),
        decoded_p.where(F.col("event_type") == "purchase"),
        max_delay="2 hours",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ivj_late")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_late"))
        .start()
    )
    q.processAllAvailable()
    got1 = {
        (r.user_id, r.view_event_id, r.purchase_event_id)
        for r in spark.sql("SELECT * FROM t_ivj_late").collect()
    }
    assert got1 == {(1, 0, 1)}

    # a purchase 60 min after the user-1 view: inside the 2 h window by
    # arithmetic, but hours behind the watermark — state is gone, row
    # is late; nothing may emit
    w.append(0, _json.dumps(_event(4, 60, etype="purchase", user=1)))
    q.processAllAvailable()
    q.stop()
    got2 = {
        (r.user_id, r.view_event_id, r.purchase_event_id)
        for r in spark.sql("SELECT * FROM t_ivj_late").collect()
    }
    assert got2 == got1, f"late purchase leaked into output: {got2 - got1}"


def test_interval_join_state_survives_restart(spark, tmp_path):
    """The buffered view state of the stream-stream interval join must
    live in the checkpointed state store, not in memory: a view
    ingested before a stop must still match a purchase ingested after
    the restart, and the pair must emit exactly once."""
    import json as _json

    from pyspark.sql import functions as F

    from pinot_pulsar_plugin_spark.sources.fakebroker import TopicWriter
    from pinot_pulsar_plugin_spark.streaming.windows import interval_join

    root = str(tmp_path / "broker")
    w = TopicWriter(root, "ev", partitions=1)
    w.append(0, _json.dumps(_event(0, 0, etype="view", user=1)))

    def build():
        dv = decode_json(read_stream(spark, root, "ev"), SCHEMA)
        dp = decode_json(read_stream(spark, root, "ev"), SCHEMA)
        return interval_join(
            dv.where(F.col("event_type") == "view"),
            dp.where(F.col("event_type") == "purchase"),
            max_delay="2 hours",
        )

    ck = str(tmp_path / "ck_restart")
    out = str(tmp_path / "out_restart")

    def run_once():
        q = (
            build().writeStream.format("parquet")
            .outputMode("append").option("path", out)
            .option("checkpointLocation", ck).start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    assert spark.read.parquet(out).count() == 0  # no purchase yet

    w.append(0, _json.dumps(_event(1, 30, etype="purchase", user=1)))
    run_once()
    rows = [
        (r.user_id, r.view_event_id, r.purchase_event_id, r.delay_us)
        for r in spark.read.parquet(out).collect()
    ]
    assert rows == [(1, 0, 1, 1800_000_000)], rows


def test_interval_join_outer_stream_matches_batch(spark, tmp_path):
    """Differential batch↔stream LEFT OUTER interval join (st62):
    matched pairs emit eagerly; unmatched views emit with NULL
    purchase columns only after the watermark proves their 2-hour
    window closed. Watermark pushers close every real view's window,
    so the streaming output restricted to pre-pusher views must equal
    the batch LEFT JOIN over the same rows exactly — including which
    views are NULL rows."""
    import random as _random

    from pyspark.sql import functions as F

    from pinot_pulsar_plugin_spark.streaming.windows import interval_join

    rng = _random.Random(62)
    rows = []
    i = 0
    for user in (1, 2, 3, 4, 5):
        m = rng.randrange(0, 10)
        for _ in range(rng.randrange(6, 12)):
            etype = rng.choice(["view", "purchase", "click", "view"])
            rows.append(_event(i, m, etype=etype, user=user))
            i += 1
            m += rng.choice([1, 5, 30, 90, 150])
    cutoff_minutes = 20000
    rows.append(_event(i, cutoff_minutes, etype="view", user=99)); i += 1
    rows.append(_event(i, cutoff_minutes, etype="purchase", user=99)); i += 1
    root = _topic(tmp_path, rows)
    decoded_v = decode_json(read_stream(spark, root, "ev"), SCHEMA)
    decoded_p = decode_json(read_stream(spark, root, "ev"), SCHEMA)
    joined = interval_join(
        decoded_v.where(F.col("event_type") == "view"),
        decoded_p.where(F.col("event_type") == "purchase"),
        max_delay="2 hours",
        how="leftOuter",
    )
    out = _run_to_memory(joined, spark, tmp_path, "t_ivjo").collect()
    pusher_ids = {i - 2, i - 1}
    got = {
        (r.user_id, r.view_event_id, r.purchase_event_id, r.delay_us)
        for r in out
        if r.view_event_id not in pusher_ids
    }

    batch = spark.createDataFrame(
        [(r["event_id"], r["ts"], r["user_id"], r["event_type"]) for r in rows[:-2]],
        "event_id long, ts string, user_id long, event_type string",
    ).select("event_id", "user_id", "event_type", F.to_timestamp("ts").alias("ts"))
    v = batch.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_event_id"), F.col("ts").alias("v_ts")
    )
    p = batch.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_event_id"),
        F.col("ts").alias("p_ts"),
    )
    expected = {
        (r.user_id, r.view_event_id, r.purchase_event_id, r.delay_us)
        for r in v.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("v_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 2 HOURS")),
            "left",
        )
        .select(
            "user_id",
            "view_event_id",
            "purchase_event_id",
            (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("delay_us"),
        )
        .collect()
    }
    assert got == expected
    assert any(pe is None for (_, _, pe, _) in expected)  # NULL rows exercised


def test_windowed_topk_stream_matches_batch(spark, tmp_path):
    """Differential batch↔stream per-window top-k: tumbling counts with
    a watermark ranked in foreachBatch (append mode closes each window
    exactly once, so per-batch ranking is globally correct) must equal
    the st63 batch-twin algorithm on the same events — for every window
    the watermark closed."""
    import random as _random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from pinot_pulsar_plugin_spark.streaming.sinks import topk_per_window_sink

    rng = _random.Random(123)
    rows = []
    i = 0
    for hour in range(4):
        for etype, lo, hi in (("view", 3, 9), ("click", 1, 7), ("purchase", 0, 5)):
            for _ in range(rng.randrange(lo, hi + 1)):
                rows.append(_event(i, hour * 60 + rng.randrange(0, 60), etype=etype))
                i += 1
    rows.append(_event(i, 50_000))  # watermark pusher closes all 4 hours
    root = _topic(tmp_path, rows)
    decoded = decode_json(read_stream(spark, root, "ev"), SCHEMA)
    agg = tumbling_counts(decoded, size="1 hour", watermark="30 minutes")
    out_dir = str(tmp_path / "topk")
    q = (
        agg.writeStream.foreachBatch(topk_per_window_sink(out_dir, k=2))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_topk"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.window_start, r.event_type, r.n_events, r.rnk)
        for r in spark.read.parquet(out_dir).collect()
    }
    # batch twin on the same rows (exclude the pusher's own open window)
    batch = spark.createDataFrame(
        [(r["ts"], r["event_type"]) for r in rows], "ts string, event_type string"
    ).select(F.to_timestamp("ts").alias("ts"), "event_type")
    c = batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    wspec = W.partitionBy("w").orderBy(F.desc("n_events"), F.asc("event_type"))
    want = {
        (r.w.start.replace(tzinfo=None), r.event_type, r.n_events, r.rnk)
        for r in c.withColumn("rnk", F.row_number().over(wspec))
        .filter(F.col("rnk") <= 2)
        .collect()
    }
    want_closed = {
        t for t in want if any(g[0] == t[0] for g in got)
    }  # pusher window never closes
    got_norm = {(ws.replace(tzinfo=None), e, n, r) for ws, e, n, r in got}
    assert got_norm == want_closed
    assert len({t[0] for t in got_norm}) == 4  # all four hours closed


def test_windowed_topk_sink_exactly_once_across_restart(spark, tmp_path):
    """topk_per_window_sink's exactly-once contract under a
    stop/restart: batches land as batch_id=N overwrites, so restarting
    the query against the same checkpoint (with more data arrived)
    must never duplicate a (window, rank) cell and the final table
    must equal the batch twin over all closed windows."""
    import random as _random

    from pyspark.sql import functions as F

    from pinot_pulsar_plugin_spark.streaming.sinks import topk_per_window_sink

    rng = _random.Random(7)
    root = str(tmp_path / "broker2")
    w = TopicWriter(root, "ev", partitions=1)
    i = 0

    def emit(hours):
        nonlocal i
        for hour in hours:
            for etype in ("view", "click", "purchase"):
                for _ in range(rng.randrange(1, 6)):
                    w.append(0, json.dumps(_event(i, hour * 60 + rng.randrange(60),
                                                  etype=etype)))
                    i += 1

    out_dir = str(tmp_path / "topk2")

    def run():
        decoded = decode_json(read_stream(spark, root, "ev"), SCHEMA)
        agg = tumbling_counts(decoded, size="1 hour", watermark="30 minutes")
        q = (
            agg.writeStream.foreachBatch(topk_per_window_sink(out_dir, k=2))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .start()
        )
        q.processAllAvailable()
        q.stop()

    emit([0, 1])
    w.append(0, json.dumps(_event(i, 10_000)))  # closes hours 0-1
    i += 1
    run()
    emit([200])  # a new hour beyond the pusher
    w.append(0, json.dumps(_event(i, 50_000)))  # closes hour 200
    i += 1
    run()

    rows = spark.read.parquet(out_dir).collect()
    cells = [(r.window_start, r.rnk) for r in rows]
    assert len(cells) == len(set(cells))  # no duplicate (window, rank)
    # hours 0, 1, 200 all closed (the first pusher's own window also
    # closes once run 2's data advances the watermark past it)
    closed = {r.window_start.replace(tzinfo=None) for r in rows}
    import datetime as dt

    t0 = dt.datetime.fromtimestamp(BASE_US / 1e6, dt.timezone.utc).replace(tzinfo=None)
    for hour in (0, 1, 200):
        assert t0 + dt.timedelta(hours=hour) in closed, (hour, closed)
    for r in rows:
        assert 1 <= r.rnk <= 2


def test_streaming_ingest_dedup_vs_corpus_matches_batch(spark, tmp_path):
    """d55's streaming form: incoming documents stream through the
    pulsarlike source and are screened in-flight — a stream-static
    LEFT ANTI join drops docs whose normalized content hash already
    exists in the landed corpus, and dropDuplicatesWithinWatermark on
    the same hash removes replays WITHIN the stream. The landed result
    must equal the batch computation of the same keep-set (corpus
    anti-join + first-per-hash) over the identical arrival order."""
    import pyspark.sql.functions as F

    corpus_rows = [
        (100, "alpha beta gamma"),
        (101, "delta epsilon zeta"),
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    fp = F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")))
    corpus_hashes = corpus.select(fp.alias("fp")).distinct()

    # the incoming delta: one corpus dup (exact text of 100), one
    # in-stream replay (7 twice), whitespace-variant dup of 101, and
    # two genuinely new docs
    delta = [
        {"doc_id": 7, "ts": _ts(0), "text": "new document one"},
        {"doc_id": 8, "ts": _ts(1), "text": "alpha beta gamma"},     # corpus dup
        {"doc_id": 7, "ts": _ts(2), "text": "new document one"},     # replay
        {"doc_id": 9, "ts": _ts(3), "text": "  Delta   epsilon ZETA "},  # corpus dup (normalized)
        {"doc_id": 10, "ts": _ts(4), "text": "new document two"},
    ]
    root = str(tmp_path / "broker")
    w = TopicWriter(root, "docs", partitions=1)
    for r in delta:
        w.append(0, json.dumps(r))

    schema = "doc_id bigint, ts timestamp, text string"
    decoded = decode_json(read_stream(spark, root, "docs"), schema)
    screened = (
        decoded.withColumn("fp", fp)
        .join(corpus_hashes, "fp", "left_anti")
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["fp"])
    )
    got = sorted(
        r.doc_id
        for r in _run_to_memory(screened, spark, tmp_path, "t_ingest_dedup").collect()
    )

    # batch twin over the same arrival sequence
    batch = spark.createDataFrame(
        [(r["doc_id"], i, r["text"]) for i, r in enumerate(delta)],
        "doc_id long, arrival long, text string",
    ).withColumn("fp", fp)
    kept = (
        batch.join(corpus_hashes, "fp", "left_anti")
        .groupBy("fp")
        .agg(F.min_by("doc_id", "arrival").alias("doc_id"))
    )
    want = sorted(r.doc_id for r in kept.collect())
    assert got == want == [7, 10]


def test_streaming_observed_metrics_per_batch(spark, tmp_path):
    """``observe()`` on a stream: per-micro-batch health metrics (row
    count, malformed-value count) surface in StreamingQueryProgress
    without a second pass over the data — the monitoring hook a
    production ingest pipeline attaches before the sink."""
    from pyspark.sql import functions as F

    rows = [_event(i, i, value=float(i)) for i in range(6)]
    rows[3]["value"] = None  # one bad record
    root = _topic(tmp_path, rows)
    decoded = decode_json(read_stream(spark, root, "ev"), SCHEMA)
    audited = decoded.observe(
        "ingest_audit",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").isNull().cast("int")).alias("n_null_value"),
    )
    q = (
        audited.writeStream.format("memory")
        .queryName("t_observe")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_observe"))
        .start()
    )
    q.processAllAvailable()
    progresses = [json.loads(p.json) for p in q.recentProgress]
    q.stop()
    metrics = [
        p["observedMetrics"]["ingest_audit"]
        for p in progresses
        if p.get("observedMetrics", {}).get("ingest_audit")
    ]
    assert metrics, progresses
    assert sum(m["n_rows"] for m in metrics) == 6
    assert sum(m["n_null_value"] for m in metrics) == 1


def test_stateful_ops_under_rocksdb_state_store(spark, tmp_path):
    """The production state backend: at 100 TB the default in-memory
    HDFS-backed store OOMs on large keyed state — RocksDB spills to
    local disk with changelog checkpointing. The same windowed
    aggregation must produce identical results under both providers
    (provider choice is a deployment knob, never a semantics knob)."""
    rows = [_event(i, i * 3, user=i % 3, value=float(i)) for i in range(20)]

    def run(provider_suffix, use_rocksdb):
        root = _topic(tmp_path / provider_suffix, rows)
        old = spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", None
        )
        if use_rocksdb:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            )
        try:
            decoded = decode_json(read_stream(spark, root, "ev"), SCHEMA)
            agg = (
                decoded.withWatermark("ts", "10 minutes")
                .groupBy(F.window("ts", "15 minutes"), "user_id")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                        "cents"
                    ),
                )
            )
            out = _run_to_memory(
                agg, spark, tmp_path / provider_suffix, f"t_{provider_suffix}",
                mode="append",
            ).collect()
            return sorted(
                (r.window.start, r.user_id, r.n, r.cents) for r in out
            )
        finally:
            if use_rocksdb:
                if old is None:
                    spark.conf.unset(
                        "spark.sql.streaming.stateStore.providerClass"
                    )
                else:
                    spark.conf.set(
                        "spark.sql.streaming.stateStore.providerClass", old
                    )

    from pyspark.sql import functions as F  # noqa: F811

    default_out = run("hdfs", False)
    rocks_out = run("rocks", True)
    assert default_out == rocks_out
    assert len(rocks_out) > 0


def test_q174_lateness_measured_against_arrival_highwater(spark, tmp_path):
    """Arrival order (event_id) carries an out-of-order event: ids
    1,2,3 with event times 10:00, 10:02, 10:01 -> the third event is
    60s late (inside le_1m); the first two are on time; a second type
    with monotone times is all on_time."""
    import datetime

    from pinot_pulsar_plugin_spark.operators.streaming_batch import (
        q174_lateness_audit,
    )

    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)

    def ts(mins):
        return t0 + datetime.timedelta(minutes=mins)

    rows = [
        (1, ts(0), 1, "a", 1.0, "{}"),
        (2, ts(2), 1, "a", 1.0, "{}"),
        (3, ts(1), 1, "a", 1.0, "{}"),   # 60s behind the high-water mark
        (4, ts(0), 1, "b", 1.0, "{}"),
        (5, ts(5), 1, "b", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))

    got = {
        (r.event_type, r.bucket): (r.n, r.max_late_us, r.share_ppm)
        for r in q174_lateness_audit(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("a", "on_time"): (2, 0, 666666),
        ("a", "le_1m"): (1, 60_000_000, 333333),
        ("b", "on_time"): (2, 0, 1000000),
    }
