"""Structured Streaming ingest of the events stream.

The reference has NO streaming operators (daily cron batch —
SURVEY §2.9); the crawl loop is deliberately incremental-batch for
deterministic parity. This module covers the streaming axis of the
engine's API surface for continuous event/metrics ingest: file-source
→ watermark → windowed aggregation → sink, runnable with the
``availableNow`` trigger so tests are batch-deterministic.

At cluster scale the same plan reads Kafka (swap ``readStream.format``)
and writes an Iceberg sink; nothing else changes — that is the point of
expressing it as a Structured Streaming plan instead of a custom loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-source stream over a directory of events parquet files.
    Event time is normalized to TIMESTAMP (watermarks reject NTZ)."""
    df = spark.readStream.schema(schema).parquet(path)
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window per-type counts + value sums with late-data
    handling via watermark. Pure built-in stateful aggregation —
    incremental state store, no custom state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n"),
             # integer-cents sum (same rule as operators/sessions.py):
             # a raw double sum's value depends on partial-sum order,
             # which differs between the incremental state store and
             # the batch hash agg — a .005-boundary sum would round
             # differently stream-vs-batch (r5 review)
             (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
              / 100.0).alias("sum_value"))
        .select(F.col("win.start").alias("win_start"),
                F.col("win.end").alias("win_end"), "event_type", "n", "sum_value")
    )


def sessionize(events: DataFrame, gap: str = "30 minutes",
               watermark: str = "2 hours") -> DataFrame:
    """Session windows per user (gap-based) — the built-in session
    window operator; state is managed by the engine's state store."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count("*").alias("n_events"),
             (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
              / 100.0).alias("sum_value"))  # cents: see windowed counts
        .select(F.col("sess.start").alias("sess_start"),
                F.col("sess.end").alias("sess_end"), "user_id", "n_events", "sum_value")
    )


def run_available_now(stream_df: DataFrame, checkpoint: str, out_path: str) -> None:
    """Drain everything currently available then stop — deterministic
    for tests; the same query with a processing-time trigger is the
    production continuous mode."""
    q = (stream_df.writeStream.format("parquet")
         .option("checkpointLocation", checkpoint)
         .option("path", out_path)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
