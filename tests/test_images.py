"""HY codec, PSNR gate, perceptual hash determinism."""

import numpy as np
import pytest

from hyperion_crawler_spark.functions.images import (
    decode,
    encode,
    make_pixels,
    phash64,
    psnr_db,
)


def test_lossless_roundtrip_exact():
    px = make_pixels("img0000000001", 32, 16)
    assert np.array_equal(decode(encode(px, "hypng")), px)


def test_lossy_roundtrip_psnr_above_gate():
    for i in range(5):
        px = make_pixels(f"img{i:010d}", 64, 64)
        p = psnr_db(decode(encode(px, "hyjpg")), px)
        assert 40.0 <= p < 60.0


def test_psnr_identical_is_inf():
    px = make_pixels("imgx", 16, 16)
    assert psnr_db(px, px) == float("inf")


def test_pixels_deterministic():
    a = make_pixels("img0000000042", 32, 32)
    b = make_pixels("img0000000042", 32, 32)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, make_pixels("img0000000043", 32, 32))


def test_phash_stable_under_lossy():
    for i in range(10):
        px = make_pixels(f"img{i:010d}", 32, 32)
        assert phash64(decode(encode(px, "hyjpg"))) == phash64(px)


def test_phash_is_signed_64():
    px = make_pixels("img0000000007", 64, 32)
    v = phash64(px)
    assert -(1 << 63) <= v < (1 << 63)


def test_decode_real_is_stubbed_without_pil():
    pytest.importorskip_reason = None
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; stub not exercised")
    except ImportError:
        pass
    from hyperion_crawler_spark.functions.images import decode_real

    with pytest.raises(NotImplementedError):
        decode_real(b"\x89PNG\r\n\x1a\n....")
