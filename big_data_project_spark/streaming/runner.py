"""Micro-batch execution helpers for the streaming surface.

Pattern: a file-source stream + ``trigger(availableNow=True)`` with a
persistent checkpoint gives *scripted*, deterministic micro-batches — write
batch-1 files, run to completion (watermark state saved in the checkpoint),
write batch-2 files, run again (watermark restored). This is how
tests/test_streaming.py drives late-data semantics without wall-clock
waits, and it is exactly the incremental-recompute pattern a production
100 TB backfill uses (repeated availableNow runs over a growing directory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)

EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])


def stream_events_from_dir(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of events micro-batch files."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)


def run_available_now(
    df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
    foreach_batch=None,
) -> None:
    """Run one availableNow pass to completion (blocking)."""
    writer = df.writeStream.outputMode(output_mode).option(
        "checkpointLocation", checkpoint_dir
    ).trigger(availableNow=True)
    if foreach_batch is not None:
        q = writer.foreachBatch(foreach_batch).start()
    else:
        q = writer.format("parquet").option("path", out_dir).start()
    q.awaitTermination()
