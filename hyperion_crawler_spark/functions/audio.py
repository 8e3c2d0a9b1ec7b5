"""HY audio codec — deterministic synthetic PCM container for the
audio multimodal operators (the audio sibling of the HY image/video
codecs; same stub discipline as the reference's unfinished sources,
/root/reference/api/src/etl/dart/extractor.py:19-50).

Layout: b"HYAU" + sample_rate(u32 LE) + n_samples(u32 LE)
+ zlib(int16 LE mono PCM). Lossless — decode is bit-exact.

Deterministic generators:

* ``make_square_wave(amplitude, half_period, n)`` — s[i] = +a when
  ``(i // half_period)`` is even else −a. Every sample is ±a, and the
  sign flips exactly at multiples of ``half_period``, so windowed
  stats have CLOSED FORMS an SQL oracle can compute without the codec
  (mean_abs = max_abs = a; zero crossings per window =
  ⌊(end−1)/hp⌋ − ⌊start/hp⌋) — the q52 value oracle.
* ``make_audio(audio_id, n, sr)`` — seeded noise PCM for
  content-dependent tests (feature pinning, round-trips).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .hashing import xxh64

_MAGIC = b"HYAU"
_HEADER = struct.Struct("<4sII")  # magic, sample_rate, n_samples


def encode_audio(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """samples: int16 1-D mono PCM → HYAU bytes (lossless)."""
    assert samples.dtype == np.int16 and samples.ndim == 1
    return _HEADER.pack(_MAGIC, sample_rate, samples.size) + zlib.compress(
        samples.tobytes(), level=1)


def decode_audio(b: bytes) -> tuple[np.ndarray, int]:
    """HYAU bytes → (int16 samples, sample_rate). Bit-exact."""
    magic, sr, n = _HEADER.unpack_from(b)
    if magic != _MAGIC:
        raise ValueError("not an HYAU payload")
    raw = zlib.decompress(b[_HEADER.size:])
    out = np.frombuffer(raw, dtype="<i2")
    assert out.size == n
    return out, sr


def make_square_wave(amplitude: int, half_period: int, n: int) -> np.ndarray:
    """±amplitude square wave, sign flip every ``half_period`` samples."""
    i = np.arange(n)
    sign = 1 - 2 * ((i // half_period) % 2)
    return (sign * int(amplitude)).astype(np.int16)


def make_audio(audio_id: str, n: int, sample_rate: int = 8000) -> bytes:
    """Deterministic noise PCM seeded from the id (no global RNG)."""
    seed = xxh64(audio_id.encode("utf-8"), seed=0)
    rng = np.random.Generator(np.random.PCG64(seed))
    samples = rng.integers(-20000, 20000, size=n, dtype=np.int16)
    return encode_audio(samples, sample_rate)


def decode_real(b: bytes):  # pragma: no cover - stub by design
    """Real wav/mp3/flac decode — needs an audio library absent from
    this container; the HYAU path exercises all Spark-side plumbing."""
    raise NotImplementedError(
        "real audio decode needs soundfile/librosa; use the HYAU codec")
