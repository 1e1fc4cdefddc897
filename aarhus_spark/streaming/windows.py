"""Windowed event aggregations (SURVEY.md §2.11 X1-X3).

The reference stack has no streaming (aarhus is a one-shot batch bulk
load); these are the batch analogs over the ``events`` table, written
so the SAME transformation functions run under Structured Streaming:
each takes a DataFrame that may be a ``readStream`` source — the
batch/streaming split is only in the caller (see ``stream_events`` +
tests/test_streaming.py, which runs them with availableNow triggers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """X1: tumbling window counts by event_type."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
                "event_type", "n", "sum_value")
    )


def sliding_counts(events: DataFrame, width: str = "1 hour",
                   slide: str = "15 minutes") -> DataFrame:
    """X2: sliding window counts."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
                "event_type", "n")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """X3: session windows per user (session = events separated by less
    than ``gap``; window end = last event + gap, Spark semantics)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select("user_id",
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("sess_start"),
                F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("sess_end"),
                "n")
    )


def stream_events(spark: SparkSession, src_dir: str, schema: str) -> DataFrame:
    """readStream source over a parquet directory (file micro-batches).
    With ``withWatermark('ts', '1 hour')`` the same window aggs above
    handle late data under continuous ingestion."""
    return (
        spark.readStream.schema(schema).parquet(src_dir)
        .withWatermark("ts", "1 hour")
    )


def run_stream_to_memory(stream_df: DataFrame, agg_fn, name: str) -> DataFrame:
    """Execute a windowed agg over a stream with an availableNow trigger
    into an in-memory sink; returns the completed result table."""
    q = (
        agg_fn(stream_df)
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)
