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
