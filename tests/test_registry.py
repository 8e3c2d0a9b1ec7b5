"""YAML source registry: env substitution, multi-source dispatch,
per-phase API envelopes, quality gates (VERDICT r1 'What's missing'
#1/#2/#4/#5)."""

import os

from pyspark.sql import functions as F

from hyperion_crawler_spark.etl import ETLPipeline, LoadMode, MarketDataSource
from hyperion_crawler_spark.registry import (
    FilingsSource,
    build_pipeline,
    load_config,
    substitute_env,
)


def test_substitute_env_full_string_only(monkeypatch):
    monkeypatch.setenv("HCS_TEST_KEY", "sekrit")
    monkeypatch.delenv("HCS_UNSET", raising=False)
    tree = {
        "a": "${HCS_TEST_KEY}",
        "b": "prefix-${HCS_TEST_KEY}",   # partial: NOT substituted (reference semantics)
        "c": ["${HCS_UNSET}", 3],
        "d": {"e": "${HCS_TEST_KEY}"},
    }
    out = substitute_env(tree)
    assert out["a"] == "sekrit"
    assert out["b"] == "prefix-${HCS_TEST_KEY}"
    assert out["c"] == ["${HCS_UNSET}", 3]   # unset keeps literal
    assert out["d"]["e"] == "sekrit"


def test_build_pipeline_registers_enabled_sources(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("FILINGS_API_KEY", "k-123")
    pipe = build_pipeline(spark, str(tmp_path))
    assert set(pipe.sources) == {"market", "filings"}
    assert isinstance(pipe.sources["market"], MarketDataSource)
    assert isinstance(pipe.sources["filings"], FilingsSource)
    assert pipe.sources["filings"].api_key == "k-123"       # env substituted
    assert pipe.default_modes["market"] == LoadMode.UPSERT
    assert pipe.quality_thresholds["market"] == 0.95


def test_disabled_source_is_skipped(spark, tmp_path):
    cfg = load_config()
    cfg["sources"]["filings"]["enabled"] = False
    pipe = build_pipeline(spark, str(tmp_path), config=cfg)
    assert set(pipe.sources) == {"market"}


def test_filings_pipeline_end_to_end(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("FILINGS_API_KEY", "k")
    pipe = build_pipeline(spark, str(tmp_path))
    res = pipe.run_full_pipeline("filings", {"stub_rows": 40})
    assert res.loaded == 40 and res.failed == 0 and res.quality_ok
    t = pipe.cat.table("filings_metadata", None).read(spark)
    assert t.count() == 40
    row = t.orderBy("filing_id").first()
    assert row["filing_date"] is not None and row["range_start"] == row["range_end"]
    # upsert is idempotent on the conflict key
    pipe.run_full_pipeline("filings", {"stub_rows": 40})
    assert pipe.cat.table("filings_metadata", None).read(spark).count() == 40


def test_phase_api_envelopes(spark, tmp_path):
    pipe = ETLPipeline(spark, str(tmp_path))
    pipe.register(MarketDataSource(n_tickers=30))
    ext = pipe.extract_data("market", {"trade_date": "2024-01-05", "round": 7})
    assert ext["status"] == "success" and ext["record_count"] == 30
    assert ext["task_id"] == "market_extract_7"
    tr = pipe.transform_data("market", ext["data"], {"round": 7})
    assert "data" in tr and "quarantine" in tr
    ld = pipe.load_data("market", tr["data"], tr["quarantine"], params={"round": 7})
    assert ld["status"] == "success" and ld["result"].loaded > 0
    assert ld["task_id"] == "market_load_7"
    assert pipe.cat.table("market_daily_prices", None).read(spark).count() == ld["result"].loaded
    # lineage row and envelope agree on the task id
    lin = pipe.cat.table("etl_lineage", None).read(spark)
    assert lin.filter(F.col("task_id") == "market_load_7").count() == 1


def test_phase_api_quality_gate_trips_like_full_pipeline(spark, tmp_path):
    """The per-phase path must hit the SAME quality gate: a lousy source
    driven phase-by-phase (with its quarantine frame passed through)
    reports quality_failed, matching run_full_pipeline."""
    pipe = ETLPipeline(spark, str(tmp_path))
    pipe.register(_LousySource(n_tickers=100))
    ext = pipe.extract_data("lousy", {"trade_date": "2024-01-05"})
    tr = pipe.transform_data("lousy", ext["data"], {"trade_date": "2024-01-05"})
    ld = pipe.load_data("lousy", tr["data"], tr["quarantine"],
                        params={"trade_date": "2024-01-05"})
    assert ld["status"] == "quality_failed" and not ld["result"].quality_ok
    assert ld["result"].failed > 0


class _LousySource(MarketDataSource):
    """Adapter whose validity gate rejects ~90% of rows → quality gate trips."""

    name = "lousy"
    target_table = "lousy_prices"

    def transform(self, df, dim):
        valid, _ = super().transform(df, dim)
        return (valid.filter(F.col("volume") % 10 == 0),
                valid.filter(F.col("volume") % 10 != 0))


def test_quality_gate_flags_low_success_rate(spark, tmp_path):
    pipe = ETLPipeline(spark, str(tmp_path))
    pipe.register(_LousySource(n_tickers=100))
    res = pipe.run_full_pipeline("lousy", {"trade_date": "2024-01-05"})
    assert res.loaded + res.failed == 100
    assert res.success_rate < 0.95 and not res.quality_ok
    lin = pipe.cat.table("etl_lineage", None).read(spark).filter(F.col("source") == "lousy")
    row = lin.first()
    assert row["status"] == "quality_failed"
    assert abs(row["success_rate"] - res.success_rate) < 1e-12


def test_quality_gate_passes_and_records_lineage(spark, tmp_path):
    pipe = ETLPipeline(spark, str(tmp_path))
    pipe.register(MarketDataSource(n_tickers=50))
    res = pipe.run_full_pipeline("market", {"trade_date": "2024-01-08"})
    assert res.quality_ok
    lin = pipe.cat.table("etl_lineage", None).read(spark)
    assert lin.filter((F.col("source") == "market") & (F.col("status") == "success")).count() == 1
