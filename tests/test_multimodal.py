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


def test_image_stats_vectorized_bit_identical(spark, fixture_dfs):
    """The stacked (per-shape batched) stats kernel must reproduce the
    row-at-a-time math bit-for-bit: exact-integer channel sums make the
    means order-independent, and _phash64_stack applies the identical
    per-frame reshape/mean/packbits pipeline (r7 optimization)."""
    from hyperion_crawler_spark.functions.images import phash64
    from hyperion_crawler_spark.operators.multimodal import _phash64_stack

    corpus = fixture_dfs["corpus"].limit(40)
    got = {r["image_id"]: r for r in MM.image_stats(corpus).collect()}
    for r in corpus.collect():
        px = decode(bytes(r["bytes"])).astype(np.float64)
        means = px.mean(axis=(0, 1))
        g = got[r["image_id"]]
        assert g["mean_r"] == round(float(means[0]), 4)
        assert g["mean_g"] == round(float(means[1]), 4)
        assert g["mean_b"] == round(float(means[2]), 4)
        assert g["brightness"] == round(float(means.mean()), 4)
        assert g["phash"] == phash64(px.astype(np.uint8))
    # direct stack-vs-scalar equality on mixed content, incl. odd sizes
    for w, h in [(16, 16), (32, 16), (24, 8)]:
        st = np.stack([make_pixels(f"img{i:010d}", w, h)
                       for i in range(7)]).astype(np.float64)
        want = [phash64(st[i].astype(np.uint8)) for i in range(7)]
        assert list(_phash64_stack(st)) == want


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


def test_real_format_decode_still_stubbed():
    """Only the real-codec hooks stay gated (no ffmpeg/soundfile in
    the container); the HY-codec operator paths are live."""
    from hyperion_crawler_spark.functions import audio as A
    from hyperion_crawler_spark.functions import video as V

    with pytest.raises(NotImplementedError):
        V.decode_real(b"\x00")
    with pytest.raises(NotImplementedError):
        A.decode_real(b"\x00")


def test_video_codec_roundtrip_and_frame_sample(spark):
    from hyperion_crawler_spark.functions import video as V
    from hyperion_crawler_spark.functions.images import decode, make_pixels

    vid = V.make_video("v1", w=16, h=12, n_frames=7, fps=5)
    frames, fps = V.decode_video(vid)
    assert fps == 5 and frames.shape == (7, 12, 16, 3)
    assert np.array_equal(frames[3], make_pixels("v1:3", 16, 12))  # bit-exact

    df = spark.createDataFrame([("v1", bytearray(vid)), ("v2", bytearray(
        V.make_video("v2", w=8, h=8, n_frames=4)))], "video_id string, bytes binary")
    out = MM.frame_sample(df, every_n=3).collect()
    got = {(r["video_id"], r["frame_idx"]) for r in out}
    assert got == {("v1", 0), ("v1", 3), ("v1", 6), ("v2", 0), ("v2", 3)}
    by_key = {(r["video_id"], r["frame_idx"]): r for r in out}
    r = by_key[("v1", 3)]
    assert (r["w"], r["h"], r["fmt"]) == (16, 12, "hypng")
    # sampled frame re-encoded losslessly → decodes to the exact frame
    assert np.array_equal(decode(bytes(r["bytes"])), frames[3])


def test_frame_sample_composes_with_image_stats(spark):
    from hyperion_crawler_spark.functions import video as V

    vid = V.make_solid_video([10, 200, 30, 40], w=8, h=8)
    df = spark.createDataFrame([("v", bytearray(vid))], "video_id string, bytes binary")
    frames = MM.frame_sample(df, every_n=2).withColumnRenamed("video_id", "image_id")
    stats = {r["image_id"]: r for r in MM.image_stats(frames).collect()}
    # solid frames → brightness is exactly the level; frame 0 picked
    assert stats["v"]["brightness"] in (10.0, 30.0)


def test_audio_codec_roundtrip_and_window_stats(spark):
    from hyperion_crawler_spark.functions import audio as A

    sq = A.make_square_wave(amplitude=500, half_period=10, n=1024)
    b = A.encode_audio(sq, sample_rate=8000)
    samples, sr = A.decode_audio(b)
    assert sr == 8000 and np.array_equal(samples, sq)

    df = spark.createDataFrame([("a1", bytearray(b))], "audio_id string, bytes binary")
    rows = MM.audio_window_stats(df, window=256).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["mean_abs"] == 500.0 and r["max_abs"] == 500.0
        assert r["duration_s"] == 1024 / 8000
        # closed form: multiples of hp in [start+1, start+window-1]
        s = r["window_idx"] * 256
        assert r["zero_crossings"] == (s + 255) // 10 - s // 10

    # noise clip: stats vs direct numpy over the same decoded samples
    nb = A.make_audio("n1", n=700, sample_rate=4000)
    ns, _ = A.decode_audio(nb)
    df2 = spark.createDataFrame([("n1", bytearray(nb))], "audio_id string, bytes binary")
    got = MM.audio_window_stats(df2, window=512).collect()
    assert len(got) == 1  # trailing partial window dropped
    seg = ns[:512].astype(np.int64)
    assert got[0]["mean_abs"] == float(np.abs(seg).sum()) / 512
    assert got[0]["max_abs"] == float(np.abs(seg).max())
    assert got[0]["zero_crossings"] == int(np.count_nonzero(seg[:-1] * seg[1:] < 0))


def test_audio_features_array_contract(spark):
    from hyperion_crawler_spark.functions import audio as A

    b = A.encode_audio(A.make_square_wave(300, 7, 1024), sample_rate=16000)
    df = spark.createDataFrame([("a", bytearray(b))], "audio_id string, bytes binary")
    out = MM.audio_features(df, window=512).collect()
    assert len(out) == 1
    r = out[0]
    assert r["duration_s"] == 1024 / 16000
    f = list(r["features"])
    assert len(f) == 2 * 3  # two windows × (mean_abs, max_abs, zc)
    assert f[0] == 300.0 and f[1] == 300.0


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


def test_phash_near_dup_pairs_via_hamming(spark, fixture_dfs):
    """Image near-dup detection is simhash's operator reused on pHash:
    image_stats → hamming_pairs on the 64-bit phash column. A lightly
    perturbed re-encode of an image must pair with its original; an
    inverted copy must not."""
    from hyperion_crawler_spark.functions.images import encode
    from hyperion_crawler_spark.operators.dedup import hamming_pairs

    rows = fixture_dfs["corpus"].limit(6).collect()
    rng = np.random.default_rng(11)
    variants = []
    for r in rows[:3]:
        px = make_pixels(r["image_id"], r["w"], r["h"]).astype(np.int32)
        px = np.clip(px + rng.integers(-4, 5, size=px.shape), 0, 255)
        variants.append((r["image_id"] + "_v", encode(px.astype(np.uint8), r["fmt"]),
                         r["w"], r["h"], r["fmt"], r["caption"], 0))
    base = [(r["image_id"], r["bytes"], r["w"], r["h"], r["fmt"],
             r["caption"], r["phash"]) for r in rows]
    # negative control: an inverted copy is visually opposite, so its
    # block-mean phash must be far from the original's (fixture images
    # share a gradient base, so distinct ORIGINALS can legitimately be
    # near each other — the control has to be constructed)
    r0 = rows[0]
    px0 = make_pixels(r0["image_id"], r0["w"], r0["h"])
    variants.append((r0["image_id"] + "_inv", encode(255 - px0, r0["fmt"]),
                     r0["w"], r0["h"], r0["fmt"], r0["caption"], 0))
    corpus = spark.createDataFrame(base + variants,
                                   fixture_dfs["corpus"].schema)
    stats = MM.image_stats(corpus)
    pairs = {(r["id1"], r["id2"]) for r in
             hamming_pairs(stats, "image_id", "phash", max_dist=6).collect()}
    for r in rows[:3]:
        a, b = sorted((r["image_id"], r["image_id"] + "_v"))
        assert (a, b) in pairs, f"variant of {r['image_id']} not paired"
    a, b = sorted((r0["image_id"], r0["image_id"] + "_inv"))
    assert (a, b) not in pairs, "inverted image paired with its original"
