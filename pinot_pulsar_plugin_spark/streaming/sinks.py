"""Sinks: exactly-once ``foreachBatch`` parquet writer.

Spark's checkpoint gives at-least-once batch delivery to foreachBatch;
idempotent overwrite-by-batch-id upgrades it to exactly-once — the
end-to-end story the reference plugin explicitly does NOT have (its ack
is advisory and replays duplicate into Pinot; consumer:154-162).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def exactly_once_parquet_sink(out_dir: str):
    """Return a foreachBatch function writing each micro-batch to
    ``out_dir/batch_id=N`` with overwrite — replays of batch N replace,
    never duplicate. Readers see exactly-once data via
    ``spark.read.parquet(out_dir)`` (partition column ``batch_id``)."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    return write_batch


def start_exactly_once_query(stream_df: DataFrame, out_dir: str, checkpoint: str):
    return (
        stream_df.writeStream.foreachBatch(exactly_once_parquet_sink(out_dir))
        .option("checkpointLocation", checkpoint)
        .start()
    )


def keyed_upsert_sink(out_dir: str, key_col: str):
    """Streaming upsert into a keyed parquet serving table via DYNAMIC
    partition overwrite on the key: each update-mode micro-batch
    rewrites only the key partitions it touches, leaving every other
    key intact — the no-table-format equivalent of MERGE for a
    latest-state serving layer. Replays rewrite the same partitions
    with the same cumulative state, so delivery is effectively-once.

    Partitioning must be by the key itself (update mode emits only the
    changed keys, so any coarser partition would drop its unchanged
    siblings on overwrite). That caps key cardinality at what a
    directory layout tolerates (~1e5); beyond that, use a read-merge-
    write per bucket or a real table format's MERGE — same logical
    shape, both noted in ROUND1_NOTES.md.
    """

    def write_batch(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            df.write.mode("overwrite").partitionBy(key_col).parquet(out_dir)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return write_batch


def topk_per_window_sink(out_dir: str, k: int = 2):
    """Streaming per-window top-k via rank-in-foreachBatch.

    Window-function ranking is not allowed inside a streaming query,
    but it doesn't need to be: with a WATERMARKED tumbling aggregate
    upstream in APPEND mode, every (window, key) group is emitted
    exactly once — in the micro-batch where the watermark passes the
    window end — and all groups of a window close together. Ranking
    INSIDE the micro-batch (plain batch window function) is therefore
    globally correct with no cross-batch merge state. Batches are
    written to ``batch_id=N`` partitions with overwrite, so foreachBatch
    replays stay exactly-once like :func:`exactly_once_parquet_sink`.

    Expects the ``tumbling_counts`` schema (window_start, keys...,
    n_events); ties break on event_type for determinism. The batch twin
    (same semantics, DuckDB-verified) is
    ``operators/streaming_batch.py::st63_window_topk``.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def write_batch(df: DataFrame, batch_id: int) -> None:
        if df.isEmpty():
            return
        w = Window.partitionBy("window_start").orderBy(
            F.desc("n_events"), F.asc("event_type")
        )
        (
            df.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch_id={batch_id}"))
        )

    return write_batch
