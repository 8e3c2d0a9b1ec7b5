"""Gap-based sessionization over the ``events`` table — the batch
form of the engine's streaming session analytics (streaming/events.py
covers the continuous form via Structured Streaming session windows;
this is the deterministic, oracle-checkable batch equivalent a
backfill or reprocessing job runs over historical parquet).

Scale shape: ONE hash shuffle on the session key + an in-partition
sort — the canonical sessionize plan. The cumulative-sum window never
re-shuffles (same partitioning as the lag window), and the session
aggregate is a hash agg on (key, session_idx), map-side combinable.
A pathologically hot key funnels through one reducer like any
partitionBy window; at that point pre-splitting the key by time range
is the standard mitigation (not needed for user-keyed event data).

The reference has no event analytics; its nearest analog is the
consensus histogram (api/src/etl/krx/transformer.py:210-219) — a
grouped summary derived in-engine rather than per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_session_ids(events: DataFrame, key_col: str, ts_col: str,
                     order_tiebreak: str, gap_seconds: int) -> DataFrame:
    """Assign ``session_idx`` (1-based per key): a new session starts
    when the gap to the previous event exceeds ``gap_seconds``.
    Deterministic total order: (ts, tiebreak) — equal timestamps can't
    flip session assignment between runs or engines. Event time is
    compared in epoch microseconds (``_us`` column kept for the
    aggregate), portable across Spark TIMESTAMP_NTZ and DuckDB."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy("_us", order_tiebreak)
    brk = F.when(
        F.lag("_us").over(w).isNull()
        | ((F.col("_us") - F.lag("_us").over(w)) > gap_seconds * 1_000_000),
        F.lit(1)).otherwise(F.lit(0))
    cum = Window.partitionBy(key_col).orderBy("_us", order_tiebreak) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (events.withColumn("_us", us)
            .withColumn("_brk", brk)
            .withColumn("session_idx", F.sum("_brk").over(cum).cast("long"))
            .drop("_brk"))


def session_stats(events: DataFrame, key_col: str, ts_col: str,
                  order_tiebreak: str, gap_seconds: int,
                  value_col: str | None = None) -> DataFrame:
    """One row per (key, session): event count, start/end in epoch
    micros, duration. ``value_col`` (if given) is summed in integer
    cents — exact integer addition, so the result is independent of
    partial-sum order (a double sum here would make cross-engine value
    hashes probabilistically flaky)."""
    s = with_session_ids(events, key_col, ts_col, order_tiebreak, gap_seconds)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min("_us").alias("t_start_us"),
        F.max("_us").alias("t_end_us"),
        (F.max("_us") - F.min("_us")).alias("duration_us"),
    ]
    if value_col is not None:
        cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
        aggs.append(F.sum(cents).alias("value_cents"))
    return s.groupBy(F.col(key_col), F.col("session_idx")).agg(*aggs)
