"""Structured Streaming operators.

The reference is a *bounded* streaming dataflow (fetch->mosaic->write
over bounded channels, /root/reference/src/pipeline/stages.rs:1-22) —
no event time. These operators are the unbounded extensions a
training-data pipeline needs: windowed aggregation with watermarked
late-data handling, and sessionization, over an event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string")


def read_event_stream(spark: SparkSession, input_dir: str,
                      max_files_per_trigger: int = 1) -> DataFrame:
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def tumbling_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts per event_type; late rows
    beyond the watermark are dropped, windows finalize incrementally."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def sliding_avg(events: DataFrame, window: str = "1 hour",
                slide: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.round(F.avg("value"), 4).alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "avg_value")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "2 hours") -> DataFrame:
    """Native session windows (F.session_window) keyed by user."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "user_id", "n_events")
    )


def run_to_memory(stream_df: DataFrame, name: str, timeout_s: int = 120):
    """Drain a bounded file-backed stream into an in-memory table
    (complete mode) and return the rows — test/bench harness helper."""
    q = (
        stream_df.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(timeout_s)
    return q
