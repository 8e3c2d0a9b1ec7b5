"""Sharded Bloom URL-seen set — applyInPandas state kernel (SURVEY §2.9).

The reference dedups with an in-memory ``seen_keys`` set, first
occurrence wins (/root/reference/api/src/etl/base/loader.py:188-209).
At a 10^10-URL frontier an exact set is ~80 GB of raw keys — the
north_rule replaces it with a sharded Bloom filter:

* shard = ``pmod(urlhash, n_shards)`` — same key the frontier table is
  partitioned by, so the probe's shuffle co-locates with the frontier
  MERGE.
* state = one bitset blob per shard, stored as a BinaryType column in
  the ``seen_filters`` table, committed per round (checkpointable,
  resumable).
* probe+update runs as ONE ``cogroup(...).applyInPandas`` pass:
  candidates grouped by shard meet their shard's blob; bit math is
  numpy-vectorized over the whole Arrow batch (no per-row Python).
  The kernel emits two row kinds in one output schema — surviving
  (unseen) candidates and the updated filter blob — so no second
  shuffle is needed.

Bloom guarantees: no false negatives ever (a seen URL is never
re-crawled); false-positive rate at the design point (10^6 keys/shard,
m=2^24, k=7) ≈ 1e-3 — a dropped-though-new URL, the standard crawl
trade-off. At test scale (hundreds of keys, m=2^20) the FPR is ~1e-25,
so exact-parity tests against the oracle are sound; an exact shadow set
(``seen_exact`` table) is additionally asserted equal in tests
(SURVEY §7 Phase 2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..functions.hashing import bloom_positions_vec

PROBE_OUT_SCHEMA = (
    "shard int, kind string, urlhash long, url string, host string, "
    "image_id string, priority double, filter_bytes binary, n_items long"
)


def empty_filter(cfg: CrawlConfig) -> bytes:
    return bytes(cfg.bloom_bits_per_shard // 8)


def _probe_kernel(cfg: CrawlConfig):
    m, k = cfg.bloom_bits_per_shard, cfg.bloom_k

    def fn(cands: pd.DataFrame, state: pd.DataFrame) -> pd.DataFrame:
        if len(cands) == 0:
            # shard untouched this round: emit NOTHING — the MERGE keeps
            # unmatched target rows, so the stored blob survives without
            # a rewrite (at 2^14 shards most are untouched per round;
            # emitting carries would rewrite the whole seen table)
            return pd.DataFrame(columns=["shard", "kind", "urlhash", "url", "host",
                                         "image_id", "priority", "filter_bytes", "n_items"])
        shard = int(cands["shard"].iloc[0])
        if len(state) > 0:
            bits = np.unpackbits(np.frombuffer(state["filter_bytes"].iloc[0], dtype=np.uint8))
            n_items = int(state["n_items"].iloc[0])
        else:
            bits = np.zeros(m, dtype=np.uint8)
            n_items = 0
        hashes = cands["urlhash"].to_numpy(dtype=np.int64)
        pos = bloom_positions_vec(hashes, m, k)          # (n, k)
        seen = bits[pos.astype(np.int64)].all(axis=1)    # all k bits set
        fresh = cands.loc[~seen].copy()
        if len(fresh) > 0:
            bits[pos[~seen].astype(np.int64).ravel()] = 1
            n_items += len(fresh)
        fresh["kind"] = "url"
        fresh["filter_bytes"] = None
        fresh["n_items"] = np.int64(0)
        out_cols = ["shard", "kind", "urlhash", "url", "host", "image_id",
                    "priority", "filter_bytes", "n_items"]
        filt_row = pd.DataFrame([{
            "shard": shard, "kind": "filter", "urlhash": 0, "url": None, "host": None,
            "image_id": None, "priority": 0.0,
            "filter_bytes": np.packbits(bits).tobytes(), "n_items": n_items,
        }])
        return pd.concat([fresh[out_cols], filt_row[out_cols]], ignore_index=True)

    return fn


def probe_and_update(candidates: DataFrame, filters: DataFrame, cfg: CrawlConfig
                     ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns (unseen_candidates, updated_filters, cached_handle).

    ``candidates`` must carry (shard, urlhash, url, host, image_id,
    priority) and be pre-deduped within the batch (first-wins — the
    kernel dedups *across* rounds only). The result DataFrames both
    derive from one persisted cogroup pass — splitting by ``kind`` does
    not recompute the kernel.
    """
    cand = candidates.select("shard", "urlhash", "url", "host", "image_id", "priority")
    out = (
        cand.groupBy("shard")
        .cogroup(filters.select("shard", "filter_bytes", "n_items").groupBy("shard"))
        .applyInPandas(_probe_kernel(cfg), PROBE_OUT_SCHEMA)
    ).persist()
    unseen = out.filter(F.col("kind") == "url").select(
        "shard", "urlhash", "url", "host", "image_id", "priority")
    new_filters = out.filter(F.col("kind") == "filter").select("shard", "filter_bytes", "n_items")
    # caller must unpersist the returned handle after its writes commit
    return unseen, new_filters, out
