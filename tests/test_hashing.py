"""Golden-vector + parity tests for the hashing kernels."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hyperion_crawler_spark.functions.hashing import (
    bloom_positions,
    bloom_positions_vec,
    spark_xxhash64_str,
    xxh64,
)


def test_xxh64_reference_vectors():
    # spot values stable across runs (self-golden; Spark parity below is
    # the authoritative check)
    assert xxh64(b"", seed=0) == 0xEF46DB3751D8E999
    assert xxh64(b"xxhash", seed=0) == 0x32DD38952C4BC720


@pytest.mark.parametrize("n", [0, 1, 3, 4, 7, 8, 31, 32, 33, 100])
def test_xxh64_lengths_vs_spark(spark, n):
    s = "u" * n + "₩"  # non-ascii tail to exercise UTF-8 path
    got = spark.createDataFrame([(s,)], "v string").select(F.xxhash64("v")).first()[0]
    assert got == spark_xxhash64_str(s)


def test_xxh64_bulk_vs_spark(spark):
    import random

    random.seed(7)
    strs = ["".join(random.choice("abc:/._-?=&가") for _ in range(random.randint(0, 60)))
            for _ in range(300)]
    rows = spark.createDataFrame([(s,) for s in strs], "v string") \
        .select("v", F.xxhash64("v").alias("h")).collect()
    for r in rows:
        assert r["h"] == spark_xxhash64_str(r["v"])


def test_bloom_positions_vec_matches_scalar():
    hashes = np.array([0, 1, -1, 2**63 - 1, -2**63, 123456789], dtype=np.int64)
    m, k = 1 << 16, 7
    vec = bloom_positions_vec(hashes, m, k)
    for i, h in enumerate(hashes):
        np.testing.assert_array_equal(vec[i], bloom_positions(int(h), m, k))


def test_bloom_positions_spread():
    m, k = 1 << 16, 7
    pos = bloom_positions_vec(np.arange(1000, dtype=np.int64), m, k)
    # distinct keys should not collide on all k positions
    assert len({tuple(p) for p in pos.tolist()}) == 1000


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.lists(st.integers(min_value=-2**63, max_value=2**63 - 1),
                min_size=1, max_size=200))
@settings(max_examples=50, deadline=None)
def test_bloom_never_false_negative_property(keys):
    import numpy as np

    from hyperion_crawler_spark.functions.hashing import bloom_positions_vec

    m, k = 1 << 14, 7
    bits = np.zeros(m, dtype=np.uint8)
    pos = bloom_positions_vec(np.array(keys, dtype=np.int64), m, k)
    bits[pos.astype(np.int64).ravel()] = 1
    # every inserted key must probe positive
    assert bits[pos.astype(np.int64)].all(axis=1).all()
