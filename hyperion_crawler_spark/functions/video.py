"""HY video codec — deterministic synthetic container for the video
multimodal operators (same role the HY image codec in
``functions/images.py`` plays for image ops).

The container has no video libraries (no ffmpeg/pyav), so REAL-format
decode stays stubbed exactly as the reference stubs unfinished sources
(/root/reference/api/src/etl/dart/extractor.py:19-50 — returns empty
with a TODO). What IS real: the container format below, its
encode/decode round-trip, and the Spark-side plumbing
(``operators/multimodal.frame_sample``) — mapInPandas batch iteration,
frame-stride explode, per-frame re-encode into the HY image codec so
every downstream image operator (stats/resize/embedding/phash)
composes on sampled frames.

Layout: b"HYVI" + fps(u8) + w(u16 LE) + h(u16 LE) + n_frames(u16 LE)
+ zlib(raw uint8 RGB frames, shape (n, h, w, 3) C-order). Lossless —
decode is bit-exact, like ``hypng``.

Two deterministic generators:

* ``make_video(video_id, w, h, n)`` — per-frame gradient+noise via
  ``images.make_pixels(f"{video_id}:{i}")``; content-rich frames for
  phash/embedding tests.
* ``make_solid_video(colors, w, h)`` — one solid RGB level per frame.
  A solid frame's channel means equal its level EXACTLY, so aggregate
  queries over sampled frames have closed-form values an SQL oracle
  can compute without any codec (the q51 value oracle).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .images import make_pixels

_MAGIC = b"HYVI"
_HEADER = struct.Struct("<4sBHHH")  # magic, fps, w, h, n_frames


def encode_video(frames: np.ndarray, fps: int = 10) -> bytes:
    """frames: uint8 (n, h, w, 3) → HYVI bytes (lossless)."""
    n, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    return _HEADER.pack(_MAGIC, fps, w, h, n) + zlib.compress(
        frames.tobytes(), level=1)


def decode_video(b: bytes) -> tuple[np.ndarray, int]:
    """HYVI bytes → (uint8 (n, h, w, 3) frames, fps). Bit-exact."""
    magic, fps, w, h, n = _HEADER.unpack_from(b)
    if magic != _MAGIC:
        raise ValueError("not an HYVI payload")
    raw = zlib.decompress(b[_HEADER.size:])
    return np.frombuffer(raw, dtype=np.uint8).reshape(n, h, w, 3), fps


def make_video(video_id: str, w: int, h: int, n_frames: int,
               fps: int = 10) -> bytes:
    """Deterministic content-rich video: frame i = the HY synthetic
    image of ``f"{video_id}:{i}"`` (seeded gradient+noise)."""
    frames = np.stack([make_pixels(f"{video_id}:{i}", w, h)
                       for i in range(n_frames)])
    return encode_video(frames, fps=fps)


def make_solid_video(colors: list[int], w: int, h: int,
                     fps: int = 10) -> bytes:
    """One solid (c, c, c) frame per level in ``colors`` — frame means
    are exactly the levels (closed-form for SQL oracles)."""
    frames = np.stack([
        np.full((h, w, 3), int(c) & 0xFF, dtype=np.uint8) for c in colors])
    return encode_video(frames, fps=fps)


def decode_real(b: bytes):  # pragma: no cover - stub by design
    """Real mp4/webm decode — requires a codec library absent from this
    container; the HYVI path above exercises all Spark-side plumbing."""
    raise NotImplementedError(
        "real video decode needs ffmpeg/pyav; use the HYVI codec")
