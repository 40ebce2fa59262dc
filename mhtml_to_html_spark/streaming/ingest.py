"""Structured Streaming operators.

A crawl at 10^10 URLs is naturally a stream: fetched archives arrive
continuously and the decode stage should not wait for a round barrier.
These operators are the streaming shape of the batch pipeline:

- ``stream_split_archives``: the SAME mapInPandas split stage as the
  batch path, applied to a streaming DataFrame of archives — the UDF is
  stateless, so batch/stream parity is structural, not re-implemented.
- ``stream_events_windowed``: watermarked tumbling-window aggregation
  (late data handled by the watermark, not by reprocessing).
- ``stream_dedup_events``: exactly-once-style dedup within the
  watermark, the streaming analogue of the frontier's seen-set.

Tested with file sources + Trigger.AvailableNow against the batch
equivalents (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.split import PARTS_SCHEMA, _split_batches


def stream_split_archives(archives_stream: DataFrame) -> DataFrame:
    """Streaming archive → parts: identical kernel to the batch stage
    (operators/split.py); Spark plans it as a stateless streaming map."""
    return archives_stream.select("archive_id", "content").mapInPandas(
        _split_batches, schema=PARTS_SCHEMA
    )


def stream_events_windowed(
    events_stream: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window per-type aggregation with a watermark bounding
    state for late data."""
    # watermarks require TIMESTAMP (parquet may carry TIMESTAMP_NTZ)
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_dedup_events(events_stream: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Dedup on event_id within the watermark horizon — bounded state,
    the streaming seen-set."""
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return events_stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
