"""Sequence packing — assemble documents into fixed-size token windows
(the GPT/T5 pretraining packing step that turns a deduped corpus into
training sequences with minimal padding waste).

Exact global first-fit-decreasing (FFD) is inherently sequential, so
the distributed shape buckets documents by a portable hash of their id
(reproducible on any partitioning or cluster size) and runs FFD
independently per bucket in one ``applyInPandas`` pass:

    docs → pmod(hash(id), n_buckets) → groupBy(bucket)
         → per-bucket FFD (sort len DESC, id ASC; first-fit over open
           bins) → one row per emitted pack

Bucket count trades packing quality against parallelism: within a
bucket the result IS textbook FFD (≤ 11/9·OPT + 1 bins); across
buckets the loss is at most one under-filled tail bin per bucket, so
keep buckets ≫ window/mean_len documents. Documents longer than
``window`` become singleton packs with ``fill_frac > 1`` — surfaced,
never silently truncated; the caller splits or drops them.

Determinism: bucket assignment and the in-bucket order are pure
functions of (id, length), so the emitted packs are byte-identical
across runs, partitionings, and cluster sizes — the property every
resume/repro path in this repo requires. No SQL oracle: a stateful
greedy fold has no tractable ANSI-SQL mirror (same class as the
streaming operators); correctness is pinned by invariant tests
(tests/test_packing.py): exact partition of the doc set, no bin
overflow, determinism, and an FFD-vs-lower-bound fill ratio.

Scale shape: ONE shuffle on the bucket id; the FFD kernel sees only
(id, length) pairs — document text/payload never moves. Reattach
content by joining the exploded pack membership back to the corpus
(broadcast the membership when packs ≪ corpus).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash60

PACK_SCHEMA = ("bucket int, pack_id string, doc_ids array<string>, "
               "n_docs int, fill long, fill_frac double")


def _ffd_kernel(window: int):
    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_len", "_id"], ascending=[False, True],
                              kind="mergesort")
        bucket = int(pdf["_bucket"].iloc[0])
        bins: list[tuple[int, list[str]]] = []  # (used, ids)
        for _id, ln in zip(pdf["_id"], pdf["_len"]):
            ln = int(ln)
            placed = False
            if ln <= window:
                for i, (used, ids) in enumerate(bins):
                    if used + ln <= window:
                        bins[i] = (used + ln, ids + [_id])
                        placed = True
                        break
            if not placed:  # new bin; oversized docs become singletons
                bins.append((ln, [_id]))
        return pd.DataFrame({
            "bucket": [bucket] * len(bins),
            "pack_id": [f"{bucket}-{i}" for i in range(len(bins))],
            "doc_ids": [ids for _used, ids in bins],
            "n_docs": [len(ids) for _used, ids in bins],
            "fill": [used for used, _ids in bins],
            "fill_frac": [used / window for used, _ids in bins],
        })

    return pack


def pack_sequences(df: DataFrame, id_col: str, len_col: str,
                   window: int, n_buckets: int = 256,
                   salt: str = "") -> DataFrame:
    """Pack documents into ``window``-token bins (see module docstring).

    ``len_col`` is the per-document token count (precompute with
    functions/text.token_count or a tokenizer of choice). Returns one
    row per pack: (bucket, pack_id, doc_ids, n_docs, fill, fill_frac).
    """
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    h = portable_hash60(F.concat(F.lit(salt), F.lit("|"),
                                 F.col(id_col).cast("string")))
    keyed = df.select(
        F.col(id_col).cast("string").alias("_id"),
        F.col(len_col).cast("long").alias("_len"),
        F.pmod(h, F.lit(n_buckets)).cast("int").alias("_bucket"))
    return keyed.groupBy("_bucket").applyInPandas(
        _ffd_kernel(window), PACK_SCHEMA)


def explode_pack_membership(packs: DataFrame) -> DataFrame:
    """(pack_id, doc_id) membership rows — the join key set for
    reattaching document content to packs (broadcast this side when
    packs ≪ corpus)."""
    return packs.select(
        "pack_id", F.explode("doc_ids").alias("doc_id"))
