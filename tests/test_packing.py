"""Sequence packing invariants (operators/packing.py) — no SQL oracle
exists for a stateful greedy fold, so correctness is pinned by exact
invariants instead: partition of the doc set, no overflow, cross-
partitioning determinism, and an FFD fill bound."""

import pytest
from pyspark.sql import functions as F

from hyperion_crawler_spark.operators.packing import (
    explode_pack_membership,
    pack_sequences,
)


def _docs(spark, n=500, seed=3):
    import numpy as np

    rng = np.random.default_rng(seed)
    lens = rng.integers(20, 900, size=n)
    rows = [(f"d{i:04d}", int(l)) for i, l in enumerate(lens)]
    return spark.createDataFrame(rows, "doc_id string, n_tok long"), dict(rows)


def test_pack_partition_and_no_overflow(spark):
    df, lens = _docs(spark)
    packs = pack_sequences(df, "doc_id", "n_tok", window=1024,
                           n_buckets=8).collect()
    seen = [d for r in packs for d in r["doc_ids"]]
    assert sorted(seen) == sorted(lens), "packs must partition the docs"
    for r in packs:
        assert r["fill"] == sum(lens[d] for d in r["doc_ids"])
        assert r["fill"] <= 1024, "bin overflow"
        assert r["n_docs"] == len(r["doc_ids"])
        assert r["fill_frac"] == pytest.approx(r["fill"] / 1024)


def test_pack_determinism_across_partitionings(spark):
    df, _ = _docs(spark)
    a = {(r["pack_id"], tuple(r["doc_ids"]))
         for r in pack_sequences(df, "doc_id", "n_tok", 1024,
                                 n_buckets=8).collect()}
    b = {(r["pack_id"], tuple(r["doc_ids"]))
         for r in pack_sequences(df.repartition(17), "doc_id", "n_tok", 1024,
                                 n_buckets=8).collect()}
    assert a == b


def test_pack_fill_beats_naive_and_oversized_surface(spark):
    df, lens = _docs(spark)
    packs = pack_sequences(df, "doc_id", "n_tok", window=1024,
                           n_buckets=4).collect()
    # FFD with 4 big buckets: average fill must beat one-doc-per-bin
    # (~0.45 here) by a wide margin
    avg_fill = sum(r["fill"] for r in packs) / (1024 * len(packs))
    assert avg_fill > 0.8, avg_fill
    # an oversized doc becomes a visible singleton, never truncated
    over = spark.createDataFrame([("big", 5000), ("small", 10)],
                                 "doc_id string, n_tok long")
    rows = {r["doc_ids"][0]: r
            for r in pack_sequences(over, "doc_id", "n_tok", 1024,
                                    n_buckets=1).collect()}
    assert rows["big"]["n_docs"] == 1 and rows["big"]["fill_frac"] > 1.0
    assert rows["small"]["fill"] == 10


def test_pack_membership_explode(spark):
    df, lens = _docs(spark, n=60)
    packs = pack_sequences(df, "doc_id", "n_tok", 1024, n_buckets=4)
    mem = explode_pack_membership(packs)
    joined = mem.join(df, "doc_id").groupBy("pack_id") \
        .agg(F.sum("n_tok").alias("fill"))
    got = {r["pack_id"]: r["fill"] for r in joined.collect()}
    want = {r["pack_id"]: r["fill"] for r in packs.collect()}
    assert got == want
