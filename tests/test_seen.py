"""Sharded Bloom seen-filter: no false negatives, exact-parity at test
scale, blob carry-forward, within-one-pass update."""

import numpy as np
from pyspark.sql import functions as F

from hyperion_crawler_spark.config import CrawlConfig
from hyperion_crawler_spark.state.seen import probe_and_update


def _cands(spark, hashes, cfg):
    rows = [(int(h) % cfg.n_shards, int(h), f"http://h/{h}", "h", f"img{h}", 0.5)
            for h in hashes]
    return spark.createDataFrame(
        rows, "shard int, urlhash long, url string, host string, image_id string, priority double")


def test_probe_empty_state_passes_all(spark, crawl_cfg):
    empty = spark.createDataFrame([], "shard int, filter_bytes binary, n_items long")
    unseen, filters, _c = probe_and_update(_cands(spark, range(100), crawl_cfg), empty, crawl_cfg)
    assert unseen.count() == 100
    f = filters.collect()
    assert sum(r["n_items"] for r in f) == 100
    assert all(len(r["filter_bytes"]) == crawl_cfg.bloom_bits_per_shard // 8 for r in f)


def test_no_false_negatives_and_exact_parity(spark, crawl_cfg):
    empty = spark.createDataFrame([], "shard int, filter_bytes binary, n_items long")
    first = list(range(0, 500))
    _, filters, _c = probe_and_update(_cands(spark, first, crawl_cfg), empty, crawl_cfg)
    filters = filters.persist()
    # re-probe same keys: ALL must be seen (no false negatives)
    again, _, _c2 = probe_and_update(_cands(spark, first, crawl_cfg), filters, crawl_cfg)
    assert again.count() == 0
    # fresh keys: at this scale bloom must agree with exact set (FPR ~0)
    fresh = list(range(10_000, 10_500))
    unseen2, _, _c3 = probe_and_update(_cands(spark, fresh, crawl_cfg), filters, crawl_cfg)
    assert unseen2.count() == len(fresh)
    filters.unpersist()


def test_untouched_shard_not_rewritten_but_survives_merge(spark, crawl_cfg, tmp_path):
    from hyperion_crawler_spark.sources.tables import Catalog

    empty = spark.createDataFrame([], "shard int, filter_bytes binary, n_items long")
    seen_t = Catalog(str(tmp_path)).table("seen_filters", "shard")
    # round A: keys only in shard 0
    keys0 = [h for h in range(2000) if h % crawl_cfg.n_shards == 0][:50]
    _, f1, _c4 = probe_and_update(_cands(spark, keys0, crawl_cfg), empty, crawl_cfg)
    seen_t.merge(spark, f1, ["shard"])
    blob0 = {r["shard"]: (bytes(r["filter_bytes"]), r["n_items"])
             for r in seen_t.read(spark).collect()}
    # round B: keys only in shard 1 — the probe must NOT emit a carry
    # row for shard 0 (no rewrite), yet the merged table keeps its blob
    keys1 = [h for h in range(2000) if h % crawl_cfg.n_shards == 1][:50]
    current = seen_t.read(spark)
    _, f2, _c5 = probe_and_update(_cands(spark, keys1, crawl_cfg), current, crawl_cfg)
    emitted = {r["shard"] for r in f2.collect()}
    assert emitted == {1}, "untouched shards must not be re-emitted"
    seen_t.merge(spark, f2, ["shard"])
    blobs2 = {r["shard"]: (bytes(r["filter_bytes"]), r["n_items"])
              for r in seen_t.read(spark).collect()}
    assert blobs2[0] == blob0[0]
    assert blobs2[1][1] == 50


def test_within_batch_duplicates_survive_probe(spark, crawl_cfg):
    # probe dedups ACROSS rounds only; batch dedup is the caller's
    # first-wins row_number (reference: loader.py:188-209)
    empty = spark.createDataFrame([], "shard int, filter_bytes binary, n_items long")
    unseen, _, _c6 = probe_and_update(_cands(spark, [7, 7], crawl_cfg), empty, crawl_cfg)
    assert unseen.count() >= 1
