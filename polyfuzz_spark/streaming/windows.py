"""Watermarked tumbling-window event rollup — the streaming twin of the
batch ``queries.q_events_hourly`` aggregation (engine extension; the
reference has no streaming semantics, SURVEY.md §2.9).

One definition runs on BOTH batch and streaming DataFrames (Spark's unified
contract). On a stream the watermark bounds the aggregation state and
defines late-data semantics: in append output mode a window row is emitted
exactly once, when the watermark passes the window end — so with a finite
``availableNow`` drain the trailing windows (within ``watermark`` of the
max event time) stay in state and are NOT emitted, which the tests assert
against the batch twin filtered by the same cutoff.

``countDistinct`` is not available in streaming aggregations; the rollup
keeps exact count/sum (integer cents) so batch and stream rows compare
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """(window_start, window_end, event_type, n_events, sum_cents) over
    1-hour tumbling windows. ``events`` needs (ts: timestamp, event_type,
    value); batch or streaming."""
    e = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        e.select(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("w", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("cents").alias("sum_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_cents",
        )
    )


def stream_hourly_rollup_parquet(
    spark,
    input_dir: str,
    schema: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
):
    """File-source deployment: watch ``input_dir`` for event parquet,
    aggregate with the watermark, append closed windows to ``output_dir``
    exactly-once via the checkpoint. ``availableNow`` drains then stops."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    rolled = hourly_rollup(stream, watermark)
    return (
        rolled.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
