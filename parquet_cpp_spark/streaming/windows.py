"""Event-time windowed aggregation with watermarks over the events stream.

Standard Structured Streaming pattern (watermark bounds state; late events
beyond it are dropped): per (1-hour window, event_type) counts. Used by the
tests to show watermark/window semantics match the batch equivalent when
the stream is drained with availableNow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EVENTS_SCHEMA = ("event_id bigint, ts timestamp, user_id bigint, "
                 "event_type string, value double, props string")


def windowed_event_counts(stream_df: DataFrame,
                          watermark: str = "2 hours",
                          window: str = "1 hour") -> DataFrame:
    return (stream_df
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.min("event_id").alias("first_event"))
            .select(F.col("w.start").cast("string").alias("window_start"),
                    "event_type", "n", "first_event"))


def batch_event_counts(df: DataFrame, window: str = "1 hour") -> DataFrame:
    """Batch equivalent for parity checks."""
    return (df.groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.min("event_id").alias("first_event"))
            .select(F.col("w.start").cast("string").alias("window_start"),
                    "event_type", "n", "first_event"))
