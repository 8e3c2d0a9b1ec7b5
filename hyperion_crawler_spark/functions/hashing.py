"""64-bit hashing kernels.

The engine's URL identity key is ``xxhash64(canonical_url)`` computed
JVM-side with the Spark builtin (``F.xxhash64`` — whole-stage codegen,
seed 42). This module provides a bit-exact pure-Python mirror of that
builtin so the single-threaded parity oracle (tests/oracle.py) can
reproduce the engine's hashes without a SparkSession, plus the derived
double-hashing scheme used by the sharded Bloom seen-filter.

XXH64 is the public xxHash algorithm (Yann Collet, BSD-2); the mirror is
implemented from the published spec. Parity with the Spark builtin is
asserted in tests/test_hashing.py.

Reference parity note: the reference engine has no content hashing at
all (dedup is an in-memory ``seen_keys`` set of key tuples —
/root/reference/api/src/etl/base/loader.py:194-209); hashing is the
scale substitute demanded by BASELINE.json north_rule.
"""

from __future__ import annotations

import numpy as np

MASK64 = 0xFFFFFFFFFFFFFFFF

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_XXHASH64_SEED = 42  # Spark's fixed seed for F.xxhash64


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & MASK64
    acc = _rotl(acc, 31)
    return (acc * _P1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & MASK64


def xxh64(data: bytes, seed: int = SPARK_XXHASH64_SEED) -> int:
    """Standard XXH64 of ``data`` (unsigned 64-bit result)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & MASK64
        v2 = (seed + _P2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - _P1) & MASK64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & MASK64
    h = (h + n) & MASK64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & MASK64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & MASK64
        h = (_rotl(h, 23) * _P2 + _P3) & MASK64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & MASK64
        h = (_rotl(h, 11) * _P1) & MASK64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & MASK64
    h ^= h >> 29
    h = (h * _P3) & MASK64
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = SPARK_XXHASH64_SEED) -> int:
    """XXH64 reinterpreted as a signed 64-bit int — bit-identical to the
    value Spark's ``F.xxhash64(string_col)`` produces for the same UTF-8
    bytes (Spark longs are signed)."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64_str(s: str) -> int:
    """Mirror of ``F.xxhash64(lit(s))`` for a non-null string column."""
    return xxh64_signed(s.encode("utf-8"))


def bloom_positions(urlhash: int, m_bits: int, k: int) -> np.ndarray:
    """Double-hashing bit positions for a 64-bit key.

    ``g_i = h1 + i*h2 (mod m)`` with h1/h2 derived from the key by a
    splitmix64 finalizer — no second hash pass over the URL bytes needed.
    Vector-friendly: the applyInPandas shard kernel calls the array
    variant below; this scalar form is for the oracle/tests.
    """
    h = urlhash & MASK64
    # splitmix64 finalization to decorrelate h1/h2 from raw key bits
    z = (h + 0x9E3779B97F4A7C15) & MASK64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK64
    h1 = (z ^ (z >> 31)) & MASK64
    h2 = ((h1 >> 33) | 1) & MASK64  # odd => full-period stepping
    return np.array([(h1 + i * h2) % m_bits for i in range(k)], dtype=np.uint64)


def bloom_positions_vec(urlhashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Vectorized double-hashing positions: shape (n, k) uint64."""
    h = urlhashes.astype(np.uint64)
    with np.errstate(over="ignore"):
        z = h + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h1 = z ^ (z >> np.uint64(31))
        h2 = (h1 >> np.uint64(33)) | np.uint64(1)
        i = np.arange(k, dtype=np.uint64)
        pos = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)
    return pos
