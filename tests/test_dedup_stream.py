"""Streaming stateful dedup: within-batch and across-restart dedup with
state persisted in the checkpoint."""

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from hyperion_crawler_spark.config import CrawlConfig
from hyperion_crawler_spark.streaming.dedup_stream import dedup_url_stream

CFG = CrawlConfig(n_shards=4, bloom_bits_per_shard=1 << 14)
SCHEMA = "shard int, urlhash long, url string"


def _write_batch(dirpath, name, hashes):
    rows = {
        "shard": [int(h % CFG.n_shards) for h in hashes],
        "urlhash": [int(h) for h in hashes],
        "url": [f"http://h/{h}" for h in hashes],
    }
    pq.write_table(
        pa.table(rows, schema=pa.schema([
            pa.field("shard", pa.int32()), pa.field("urlhash", pa.int64()),
            pa.field("url", pa.string())])),
        f"{dirpath}/{name}.parquet")


def _drain(spark, indir, ckpt, outdir):
    stream = spark.readStream.schema(SCHEMA).parquet(indir)
    out = dedup_url_stream(stream, CFG)
    q = (out.writeStream.format("parquet")
         .option("checkpointLocation", ckpt)
         .option("path", outdir)
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.read.parquet(outdir)


def test_stream_dedup_within_and_across_batches(spark, tmp_path):
    indir, ckpt, outdir = str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "out")
    (tmp_path / "in").mkdir()
    # batch 1 contains an internal duplicate (7 twice)
    _write_batch(indir, "b1", [1, 2, 3, 7, 7, 8])
    got = _drain(spark, indir, ckpt, outdir)
    assert sorted(r["urlhash"] for r in got.collect()) == [1, 2, 3, 7, 8]

    # restart with new data overlapping history: only 9/10 are new
    _write_batch(indir, "b2", [2, 7, 9, 10])
    got2 = _drain(spark, indir, ckpt, outdir)
    assert sorted(r["urlhash"] for r in got2.collect()) == [1, 2, 3, 7, 8, 9, 10]


def test_stream_dedup_state_is_per_shard(spark, tmp_path):
    indir, ckpt, outdir = str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "out")
    (tmp_path / "in").mkdir()
    # same residue class → same shard; distinct hashes must all pass
    hashes = [4, 8, 12, 16]
    _write_batch(indir, "b1", hashes)
    got = _drain(spark, indir, ckpt, outdir)
    rows = got.collect()
    assert sorted(r["urlhash"] for r in rows) == hashes
    assert {r["shard"] for r in rows} == {0}
