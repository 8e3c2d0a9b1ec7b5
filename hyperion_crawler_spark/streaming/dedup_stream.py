"""Streaming URL-seen dedup — custom stateful operator via
``applyInPandasWithState``.

The batch engine maintains the Bloom seen-set through snapshot-committed
cogroup passes (state/seen.py); this is the same kernel expressed as a
Structured Streaming stateful operator for continuous ingest: URLs
arrive on a stream, are grouped by ``shard = pmod(urlhash, K)``, and
each shard's Bloom blob lives in the streaming state store (checkpoint
directory = resumable state, managed by the engine). Unseen URLs are
emitted; duplicates — within a microbatch or across the stream's entire
history — are dropped with no false negatives.

Mirrors the reference's in-memory ``seen_keys`` dedup
(/root/reference/api/src/etl/base/loader.py:188-209) lifted to
unbounded streams.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..config import CrawlConfig
from ..functions.hashing import bloom_positions_vec

OUT_SCHEMA = "shard int, urlhash long, url string"
STATE_SCHEMA = "filter_bytes binary, n_items long"


def _kernel(cfg: CrawlConfig):
    m, k = cfg.bloom_bits_per_shard, cfg.bloom_k

    def fn(key, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            blob, n_items = state.get
            bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8))
        else:
            bits = np.zeros(m, dtype=np.uint8)
            n_items = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            hashes = pdf["urlhash"].to_numpy(np.int64)
            pos = bloom_positions_vec(hashes, m, k)
            # two-tier probe (r5 review; same shape as state/seen.py):
            # the cross-history membership test is one vectorized fancy
            # index over ALL rows; only rows that pass it — new URLs
            # plus possible intra-batch duplicates — fall through to
            # the sequential first-wins loop, which at crawl batch
            # sizes is orders of magnitude smaller than the batch
            keep = np.zeros(len(pdf), dtype=bool)
            maybe_new = ~bits[pos.astype(np.int64)].all(axis=1)
            for i in np.flatnonzero(maybe_new):
                p = pos[i].astype(np.int64)
                if not bits[p].all():
                    keep[i] = True
                    bits[p] = 1
                    n_items += 1
            out = pdf.loc[keep, ["shard", "urlhash", "url"]]
            if len(out):
                yield out
        state.update((np.packbits(bits).tobytes(), n_items))

    return fn


def dedup_url_stream(urls: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """urls: streaming DataFrame with (shard int, urlhash long,
    url string). Returns the never-seen-before rows."""
    return urls.groupBy("shard").applyInPandasWithState(
        _kernel(cfg), OUT_SCHEMA, STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout,
    )
