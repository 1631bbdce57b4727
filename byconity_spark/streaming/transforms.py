"""Streaming transforms: watermarked tumbling/sliding/session windows.

ByConity's streaming model is ingestion-centric (no event-time operator
algebra exists in the reference — SURVEY §2.11); watermarks and window
aggregations are the Spark-native extension the north-star asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_counts(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour event counts per type, tolerating `watermark` of
    event-time disorder before finalizing a window."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("hour"), "event_type", "n")
    )


def sliding_value_sums(
    stream: DataFrame, length: str = "1 hour", slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", length, slide).alias("w"))
        .agg(F.sum("value").alias("total"))
        .select(F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"), "total")
    )


def session_windows(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user (gap-based) — the streaming counterpart of
    the batch sessionSplit UDAF."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
