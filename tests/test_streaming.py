"""Structured Streaming: windowed counts + sessionization over the
events table via availableNow (deterministic drain)."""

import glob
import shutil

from pyspark.sql import functions as F

from hyperion_crawler_spark.streaming.events import (
    read_events_stream,
    run_available_now,
    sessionize,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def _stage_events(spark, tmp_path):
    src = f"{SF_DIR}/events.parquet"
    dst = str(tmp_path / "in")
    (tmp_path / "in").mkdir()
    shutil.copy(src, dst + "/events.parquet")
    return dst


def test_windowed_counts_match_batch(spark, tmp_path):
    indir = _stage_events(spark, tmp_path)
    batch = spark.read.parquet(indir).withColumn("ts", F.col("ts").cast("timestamp"))
    schema = spark.read.parquet(indir).schema

    stream = read_events_stream(spark, indir, schema)
    agg = windowed_event_counts(stream, window="1 day", watermark="0 seconds")
    run_available_now(agg, str(tmp_path / "ckpt"), str(tmp_path / "out"))

    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() > 0
    # every emitted (window, type) row must equal the batch computation
    want = (batch.groupBy(F.window("ts", "1 day").alias("win"), "event_type")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("win.start").alias("win_start"), "event_type", "n", "sum_value"))
    w = {(r["win_start"], r["event_type"]): (r["n"], r["sum_value"]) for r in want.collect()}
    for r in got.collect():
        assert w[(r["win_start"], r["event_type"])] == (r["n"], r["sum_value"])


def test_sessionize_runs(spark, tmp_path):
    indir = _stage_events(spark, tmp_path)
    schema = spark.read.parquet(indir).schema
    stream = read_events_stream(spark, indir, schema)
    sess = sessionize(stream, gap="1 hour", watermark="0 seconds")
    run_available_now(sess, str(tmp_path / "ckpt2"), str(tmp_path / "out2"))
    got = spark.read.parquet(str(tmp_path / "out2"))
    assert got.count() > 0
    assert set(got.columns) == {"sess_start", "sess_end", "user_id", "n_events", "sum_value"}
