"""Shared fixtures: one SparkSession per test run, one synthetic crawl
fixture (seed=42) shared by the engine and the parity oracle — the
reference's shared-golden-fixture pattern
(/root/reference/tests/conftest.py:113-148)."""

from __future__ import annotations

import pytest

from hyperion_crawler_spark.config import CrawlConfig, get_spark
from hyperion_crawler_spark.synth import SynthConfig, gen_fixture, write_fixture_parquet


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="hyperion-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def crawl_cfg() -> CrawlConfig:
    return CrawlConfig(n_shards=8, bloom_bits_per_shard=1 << 17, salt_buckets=4)


@pytest.fixture(scope="session")
def fixture_pdf():
    return gen_fixture(SynthConfig())


@pytest.fixture(scope="session")
def fixture_dir(fixture_pdf, tmp_path_factory):
    d = tmp_path_factory.mktemp("fixture")
    write_fixture_parquet(fixture_pdf, str(d))
    return str(d)


@pytest.fixture(scope="session")
def fixture_dfs(spark, fixture_dir):
    from hyperion_crawler_spark import schemas as S

    return {
        "corpus": spark.read.schema(S.CORPUS).parquet(f"{fixture_dir}/corpus.parquet"),
        "seeds": spark.read.schema(S.SEEDS).parquet(f"{fixture_dir}/seeds.parquet"),
        "links": spark.read.schema(S.LINKS).parquet(f"{fixture_dir}/links.parquet"),
        "robots": spark.read.schema(S.ROBOTS).parquet(f"{fixture_dir}/robots.parquet"),
    }
