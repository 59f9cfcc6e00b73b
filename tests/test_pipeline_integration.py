"""Capstone integration: the reference's whole purpose, end to end.

Pulsar-shaped topic → pulsarlike streaming source → decode-or-drop →
event-time window aggregation → exactly-once foreachBatch sink →
OLAP queries over the served table — and the served numbers must equal
the same computation done purely in batch over the original table.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import functions as F

from pinot_pulsar_plugin_spark.catalog import load_table
from pinot_pulsar_plugin_spark.functions.exact import exact_sum
from pinot_pulsar_plugin_spark.sources.decode import decode_json
from pinot_pulsar_plugin_spark.sources.fakebroker import TopicWriter
from pinot_pulsar_plugin_spark.sources.pulsarlike import read_stream
from pinot_pulsar_plugin_spark.streaming.sinks import exactly_once_parquet_sink

SF = "/root/testdata/sf0.001"
SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def test_pulsar_to_olap_pipeline(spark, tmp_path):
    events = load_table(spark, SF, "events")
    pdf = events.toPandas()

    # 1. produce the topic (3 partitions, ledger rollovers, 3% malformed)
    root = str(tmp_path / "broker")
    w = TopicWriter(root, "events", partitions=3, rollover_every=150)
    for i, row in pdf.iterrows():
        if i % 33 == 0:
            w.append(i % 3, b"\x00garbage not json")
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

    # 2. stream → decode → tumbling day aggregate → exactly-once sink
    decoded = decode_json(
        read_stream(spark, root, "events", maxmsgs=200), SCHEMA, keep_cols=()
    )
    agg = (
        decoded.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            F.col("window.start").cast("date").alias("day"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )
    served = str(tmp_path / "served")
    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(exactly_once_parquet_sink(served))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # 3. OLAP over the served table (append mode only emits closed
    #    windows; the last day stays open) vs the pure-batch truth
    served_df = spark.read.parquet(served).drop("batch_id")
    batch_truth = (
        events.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
    )
    max_closed_day = served_df.agg(F.max("day")).first()[0]
    truth_closed = batch_truth.filter(F.col("day") <= max_closed_day)
    assert served_df.count() == truth_closed.count()
    assert truth_closed.exceptAll(served_df).count() == 0
    assert served_df.exceptAll(truth_closed).count() == 0

    # 4. the served table answers OLAP queries like any other relation
    top = (
        served_df.groupBy("event_type")
        .agg(exact_sum(F.col("value_cents") / 100.0, "total", 2))
        .orderBy(F.desc("total"))
        .first()
    )
    assert top.total > 0


def test_llm_corpus_pipeline(spark, tmp_path):
    """Training-corpus capstone: documents stream in through the
    pulsarlike source (with injected duplicates and malformed payloads),
    land exactly-once as a parquet table, and the LLM-pipeline registry
    ops (quality filter, PII redaction, split, packing, near-dup
    keeper, span dedup, winnowed pairs, surprisal, Pareto frontier,
    weighted sample, incremental dedup, chunking, feature hashing,
    chunk-rewrite dedup, token entropy, keyword tagging) run
    over the LANDED table — their outputs must equal the same ops over the pristine
    batch table after exact dedup removes the replayed copies."""
    from pinot_pulsar_plugin_spark.operators.pipelines import (
        d51_cluster_keeper_quality,
        q74_train_split,
        q75_sequence_packing,
    )
    from pinot_pulsar_plugin_spark.operators.textops import (
        t56_quality_filter,
        t60_pii_redaction,
    )
    from pinot_pulsar_plugin_spark.streaming.sinks import start_exactly_once_query

    docs = load_table(spark, SF, "documents")
    pdf = docs.toPandas()

    root = str(tmp_path / "broker")
    w = TopicWriter(root, "docs", partitions=2, rollover_every=120)
    for i, row in pdf.iterrows():
        payload = json.dumps(
            {
                "doc_id": int(row.doc_id),
                "text": row.text,
                "lang": row.lang,
                "source": row.source,
                "n_chars": int(row.n_chars),
            }
        )
        w.append(int(row.doc_id) % 2, payload)
        if i % 10 == 0:  # duplicate ingestion (replays / double sends)
            w.append(int(row.doc_id) % 2, payload)
        if i % 37 == 0:  # malformed payloads must drop, not fail
            w.append(i % 2, b"{not json")

    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    decoded = decode_json(
        read_stream(spark, root, "docs", maxmsgs=128), schema, keep_cols=()
    )
    landed_dir = str(tmp_path / "landed")
    q = start_exactly_once_query(
        decoded, f"{landed_dir}/documents_raw.parquet", str(tmp_path / "ck")
    )
    q.processAllAvailable()
    q.stop()

    # exact dedup by normalized-content fingerprint (t53's key), then
    # serve the deduped corpus as a catalog-shaped table
    raw = spark.read.parquet(f"{landed_dir}/documents_raw.parquet")
    fp = F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")))
    deduped = raw.withColumn("fp", fp).dropDuplicates(["fp"]).drop("fp")
    assert deduped.count() == len(pdf)  # replays removed, garbage dropped
    deduped.write.mode("overwrite").parquet(f"{landed_dir}/documents.parquet")

    def frames(sf_dir):
        from pinot_pulsar_plugin_spark.operators.dedup import (
            d53_dup_span_fraction,
            d54_winnow_neardup_pairs,
        )
        from pinot_pulsar_plugin_spark.operators.curation import (
            q94_pareto_frontier,
            q95_weighted_sample,
        )
        from pinot_pulsar_plugin_spark.operators.dedup import (
            d55_incremental_dedup,
        )
        from pinot_pulsar_plugin_spark.operators.dedup import (
            d56_chunk_rewrite_dedup,
        )
        from pinot_pulsar_plugin_spark.operators.textops import (
            t63_bigram_surprisal,
            t64_doc_chunking,
            t66_feature_hashing,
            t67_token_entropy,
            t68_top_keywords,
        )

        return [
            t56_quality_filter(spark, sf_dir).toPandas(),
            t60_pii_redaction(spark, sf_dir).toPandas(),
            q74_train_split(spark, sf_dir).toPandas(),
            q75_sequence_packing(spark, sf_dir).toPandas(),
            d51_cluster_keeper_quality(spark, sf_dir).toPandas(),
            d53_dup_span_fraction(spark, sf_dir).toPandas(),
            d54_winnow_neardup_pairs(spark, sf_dir).toPandas(),
            t63_bigram_surprisal(spark, sf_dir).toPandas(),
            # continuation-2 curation stages over the landed corpus
            q94_pareto_frontier(spark, sf_dir).toPandas(),
            q95_weighted_sample(spark, sf_dir).toPandas(),
            d55_incremental_dedup(spark, sf_dir).toPandas(),
            t64_doc_chunking(spark, sf_dir).toPandas(),
            t66_feature_hashing(spark, sf_dir).toPandas(),
            # continuation-3 stages: rewrite dedup + entropy screen +
            # keyword tagging
            d56_chunk_rewrite_dedup(spark, sf_dir).toPandas(),
            t67_token_entropy(spark, sf_dir).toPandas(),
            t68_top_keywords(spark, sf_dir).toPandas(),
        ]

    for got, want in zip(frames(landed_dir), frames(SF)):
        cols = sorted(got.columns)
        got = got[cols].sort_values(cols).reset_index(drop=True)
        want = want[cols].sort_values(cols).reset_index(drop=True)
        assert got.equals(want)


def test_t60_redaction_removes_all_injected_pii(spark):
    """Every injected PII instance is counted and redacted: no email/
    phone/IP survives in the redacted text, placeholders appear exactly
    where counts say they should, and docs with no injection pass
    through byte-identical."""
    import re

    from pinot_pulsar_plugin_spark.operators.textops import (
        _EMAIL_RE,
        _IP_RE,
        _PHONE_RE,
        t60_pii_redaction,
    )

    rows = t60_pii_redaction(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.n_emails == (1 if r.doc_id % 3 == 0 else 0), r
        assert r.n_phones == (1 if r.doc_id % 5 == 0 else 0), r
        assert r.n_ips == (1 if r.doc_id % 7 == 0 else 0), r
        for pat in (_EMAIL_RE, _PHONE_RE, _IP_RE):
            assert not re.search(pat, r.redacted), (r.doc_id, r.redacted)
        assert r.redacted.count("<EMAIL>") == r.n_emails
        assert r.redacted.count("<PHONE>") == r.n_phones
        assert r.redacted.count("<IP>") == r.n_ips


def test_q89_transition_probabilities_normalize(spark):
    """Markov invariants: per prev_type the probabilities sum to 1
    (within one ulp-scale tolerance of the exact bigint ratio) and the
    transition counts sum to exactly #events − #users-with-events
    (every event except each user's first contributes one bigram)."""
    from pinot_pulsar_plugin_spark.operators.eventanalytics import (
        q89_markov_transitions,
    )

    sf = "/root/testdata/sf0.001"
    rows = q89_markov_transitions(spark, sf).collect()
    by_prev = {}
    for r in rows:
        by_prev.setdefault(r.prev_type, []).append(r)
    for prev, grp in by_prev.items():
        assert abs(sum(r.p for r in grp) - 1.0) < 1e-9, prev
    from pinot_pulsar_plugin_spark.catalog import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, sf, "events")
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    assert sum(r.n for r in rows) == n_events - n_users


def test_q90_scd2_matches_brute_force_on_dup_heavy_sequences(spark, tmp_path):
    """SCD2 compaction against a Python reference on an adversarial
    stream: long runs of the same state (must collapse to one row),
    alternating flips (must all survive), and ts ties broken by
    event_id. Validity intervals must chain exactly — each row's
    valid_to equals the next change's valid_from, and only the last
    state per user is current."""
    import random as _random

    from pinot_pulsar_plugin_spark.catalog import load_table  # noqa: F401
    from pinot_pulsar_plugin_spark.operators.eventanalytics import q90_scd2_intervals

    rng = _random.Random(90)
    rows = []
    eid = 0
    base = 1_700_000_000_000_000
    for user in range(1, 9):
        ts = base
        state = None
        for _ in range(rng.randrange(10, 40)):
            if rng.random() < 0.6 and state is not None:
                new = state  # long duplicate runs
            else:
                new = rng.choice(["a", "b", "c"])
            state = new
            rows.append((eid, ts, user, new))
            eid += 1
            ts += rng.choice([0, 1, 1000, 60_000_000])  # incl. exact ties
    # brute force over (ts, event_id) order
    expected = set()
    by_user = {}
    for e, ts, u, st in rows:
        by_user.setdefault(u, []).append((ts, e, st))
    for u, seq in by_user.items():
        seq.sort()
        changes = []
        prev = None
        for ts, e, st in seq:
            if prev is None or st != prev:
                changes.append((ts, e, st))
            prev = st
        for i, (ts, e, st) in enumerate(changes):
            nxt = changes[i + 1][0] if i + 1 < len(changes) else None
            expected.add((u, st, ts, nxt, nxt is None))

    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["event_id", "ts_us", "user_id", "event_type"])
    pdf["ts"] = pd.to_datetime(pdf["ts_us"], unit="us")
    pdf["value"] = 0.0
    pdf["props"] = "{}"
    out_dir = str(tmp_path / "evdir")
    spark.createDataFrame(
        pdf[["event_id", "ts", "user_id", "event_type", "value", "props"]]
    ).write.parquet(out_dir + "/events.parquet")
    got = {
        (r.user_id, r.event_type, r.valid_from_us, r.valid_to_us, r.is_current)
        for r in q90_scd2_intervals(spark, out_dir).collect()
    }
    assert got == expected


def test_q105_pagerank_matches_integer_reference(spark):
    """q105 vs an independent pure-Python PageRank with the identical
    integer micro-unit arithmetic — verifies the distributed join/agg
    loop (and its shuffle schedule) computes exactly the sequential
    recurrence, node for node."""
    import duckdb

    from pinot_pulsar_plugin_spark.operators.pipelines import (
        _PR_ITERS,
        _PR_R0,
        q105_pagerank_transactions,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    e0 = con.execute(
        f"""
        SELECT DISTINCT o.o_custkey, l.l_suppkey
        FROM read_parquet('{sf}/orders.parquet') o
        JOIN read_parquet('{sf}/lineitem.parquet') l
          ON l.l_orderkey = o.o_orderkey
        """
    ).fetchall()
    adj: dict[str, list[str]] = {}
    for c, s in e0:
        adj.setdefault(f"c:{c}", []).append(f"s:{s}")
        adj.setdefault(f"s:{s}", []).append(f"c:{c}")
    rank = {n: _PR_R0 for n in adj}
    for _ in range(_PR_ITERS):
        contrib: dict[str, int] = {}
        for src, dsts in adj.items():
            c = rank[src] // len(dsts)
            for d in dsts:
                contrib[d] = contrib.get(d, 0) + c
        rank = {n: 150000 + (85 * s) // 100 for n, s in contrib.items()}

    got = {r.node: r.rank_micro for r in q105_pagerank_transactions(spark, sf).collect()}
    assert got == rank


def test_q200_funnel_reconciles(spark, tmp_path):
    """Constructed corpus: 3 good unique docs, 1 exact duplicate of a
    good doc (dies at dedup), 1 too-short doc (dies at quality), 1
    repetitive doc (dies at quality). Stage rows reconcile: raw 6 ->
    quality 4 -> dedup 3, tokens tracking each survivor set."""
    from pinot_pulsar_plugin_spark.operators.pipelines import (
        q200_curation_funnel,
    )

    good1 = " ".join(f"w{i}" for i in range(25))            # 25 tokens
    good2 = " ".join(f"x{i}" for i in range(30))            # 30
    good3 = " ".join(f"y{i}" for i in range(20))            # 20
    docs = [
        (0, good1), (1, good2), (2, good3),
        (3, good1.upper()),            # normalized duplicate of 0
        (4, "too short"),              # fails length
        (5, "r r " * 15),              # 30 tokens, 1 distinct: fails
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r.stage_id: (r.stage, r.n_docs, r.n_tokens)
        for r in q200_curation_funnel(spark, str(tmp_path)).collect()
    }
    raw_tokens = 25 + 30 + 20 + 25 + 2 + 31  # trailing split token on doc 5
    assert got[0] == ("raw", 6, raw_tokens)
    assert got[1] == ("quality", 4, 25 + 30 + 20 + 25)
    assert got[2] == ("dedup", 3, 25 + 30 + 20)
