"""Multimodal plumbing over the synthetic image corpus."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hyperion_crawler_spark.functions.images import decode, make_pixels
from hyperion_crawler_spark.operators import multimodal as MM


def test_image_stats(spark, fixture_dfs):
    corpus = fixture_dfs["corpus"].limit(50)
    stats = MM.image_stats(corpus).collect()
    assert len(stats) == 50
    by_id = {r["image_id"]: r for r in stats}
    for r in corpus.select("image_id", "w", "h").limit(5).collect():
        px = make_pixels(r["image_id"], r["w"], r["h"]).astype(np.float64)
        got = by_id[r["image_id"]]
        # lossy codec shifts means by < q/2
        assert abs(got["brightness"] - px.mean()) < 2.5
        assert got["w"] == r["w"] and got["h"] == r["h"]


def test_resize_shapes_and_determinism(spark, fixture_dfs):
    corpus = fixture_dfs["corpus"].limit(20)
    out = MM.resize(corpus, 8, 8).collect()
    assert all(r["w"] == 8 and r["h"] == 8 for r in out)
    for r in out[:3]:
        px = decode(bytes(r["bytes"]))
        assert px.shape == (8, 8, 3)
    again = {r["image_id"]: bytes(r["bytes"]) for r in MM.resize(corpus, 8, 8).collect()}
    assert all(bytes(r["bytes"]) == again[r["image_id"]] for r in out)


def test_image_embedding_normalized(spark, fixture_dfs):
    corpus = fixture_dfs["corpus"].limit(30)
    out = MM.image_embedding(corpus, dim=64).collect()
    assert len(out) == 30
    for r in out[:5]:
        v = np.array(r["embedding"], dtype=np.float64)
        assert v.shape == (64,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5


def test_video_audio_stubbed(spark, fixture_dfs):
    with pytest.raises(NotImplementedError):
        MM.frame_sample(fixture_dfs["corpus"])
    with pytest.raises(NotImplementedError):
        MM.audio_features(fixture_dfs["corpus"])


def test_bytes_pruned_from_stats_output(spark, fixture_dfs):
    out = MM.image_stats(fixture_dfs["corpus"].limit(5))
    assert "bytes" not in out.columns


def test_block_means_match_naive_loop():
    """The integral-image fast path must reproduce the looped block
    means bit-for-bit (exact-integer partial sums in float64)."""
    rng = np.random.Generator(np.random.PCG64(7))
    for (h, w, oh, ow) in [(16, 16, 8, 8), (17, 23, 8, 8), (9, 31, 4, 6), (32, 16, 8, 8)]:
        px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        got = MM._block_means(px, oh, ow)
        ys = (np.arange(oh + 1) * h) // oh
        xs = (np.arange(ow + 1) * w) // ow
        want = np.empty((oh, ow, 3))
        for i in range(oh):
            for j in range(ow):
                want[i, j] = px[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].astype(np.float64).mean(axis=(0, 1))
        assert np.array_equal(got, want), (h, w, oh, ow)
