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
