"""E→T→L pipeline facade — the reference's service API surface
re-expressed over DataFrames (SURVEY §3).

Reference shape being mirrored:
* ``ETLService.extract_data/transform_data/load_data/run_full_pipeline``
  — /root/reference/api/src/services/etl_service.py:92-227
* OO source registry (extractor/transformer/loader classes per source,
  YAML-configured) — etl_service.py:68-90, etl_config.yaml:4-136
* ``LoadMode`` INSERT/UPDATE/UPSERT/REPLACE/APPEND dispatch —
  api/src/etl/base/loader.py:15-21, krx/loader.py:62-70
* ``LoadResult`` tallies (loaded/updated/failed/skipped, success_rate)
  — api/src/etl/base/loader.py:24-59

Differences by design: phases hand DataFrames (lazy plans) to each
other instead of serializing row payloads through HTTP/JSON (the
reference's scalability ceiling — workflows/krx_etl_workflow.yaml:105,
177); validation quarantines via one predicate + anti-split instead of
per-row Python; the asset-master lookup-or-create is a broadcast join +
deterministic hash id instead of a DB round-trip per new symbol
(krx/transformer.py:151-195).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.scalars import clean_numeric, change_amount, trading_value, weekend_roll
from .operators.relational import first_wins_dedup, lookup_or_create
from .sources.tables import Catalog


class LoadMode(str, Enum):
    APPEND = "append"      # reference INSERT/APPEND
    UPSERT = "upsert"      # reference UPSERT (ON CONFLICT DO UPDATE)
    REPLACE = "replace"    # reference REPLACE (delete partition + insert)


@dataclass
class LoadResult:
    """Mirror of the reference's LoadResult counters
    (api/src/etl/base/loader.py:24-59)."""
    loaded: int = 0
    skipped: int = 0
    failed: int = 0

    @property
    def success_rate(self) -> float:
        total = self.loaded + self.skipped + self.failed
        return self.loaded / total if total else 1.0


class SourceAdapter(Protocol):
    """One registered source = extract + transform + sink contract
    (reference: BaseExtractor/Transformer/Loader ABC triple)."""

    name: str
    target_table: str
    conflict_keys: list[str]
    partition_col: str | None

    def extract(self, spark: SparkSession, params: dict) -> DataFrame: ...
    def transform(self, df: DataFrame) -> tuple[DataFrame, DataFrame]: ...


class MarketDataSource:
    """Demo adapter with the reference KRX source's semantics over a
    deterministic synthetic frame (the analog of the golden ``mock_pykrx``
    fixture — /root/reference/tests/conftest.py:113-148).

    extract: per-ticker OHLCV+cap rows for a trade date (KRXExtractor —
    api/src/etl/krx/extractor.py:20-99), generated JVM-side.
    transform: clean_numeric/change_amount/trading_value scalar derivations
    (F2-F4), price-logic validity gate (transformer.py:197-231) with
    quarantine split, asset-uuid lookup-or-create (J4).
    """

    name = "market"
    target_table = "market_daily_prices"
    conflict_keys = ["uuid", "trade_date"]
    partition_col = None

    def __init__(self, n_tickers: int = 100, dim_fraction_known: int = 3):
        self.n_tickers = n_tickers
        self.dim_mod = dim_fraction_known

    def extract(self, spark: SparkSession, params: dict) -> DataFrame:
        date = params.get("trade_date", "2024-01-05")
        t = spark.range(self.n_tickers)
        base = (F.pmod(F.xxhash64(F.col("id"), F.lit(date)), F.lit(90000)) + 10000) / 100.0
        vol = F.pmod(F.xxhash64(F.col("id"), F.lit(date), F.lit(1)), F.lit(1_000_000))
        return t.select(
            F.lpad(F.col("id").cast("string"), 6, "0").alias("ticker"),
            F.lit(date).cast("date").alias("trade_date"),
            F.concat(F.lit("₩"), F.floor(base * 100).cast("string")).alias("close_raw"),
            (base * 1.01).alias("high"),
            (base * 0.99).alias("low"),
            base.alias("open"),
            vol.alias("volume"),
            (F.pmod(F.xxhash64("id", F.lit(date), F.lit(2)), F.lit(900)) / 100.0 - 4.5).alias("change_rate"),
        )

    def asset_master(self, spark: SparkSession) -> DataFrame:
        """Known dimension rows (a subset — the rest exercise J4's
        create-on-miss)."""
        return spark.range(self.n_tickers).filter(F.col("id") % self.dim_mod == 0).select(
            F.lpad(F.col("id").cast("string"), 6, "0").alias("ticker"),
            F.concat(F.lit("uuid-"), F.col("id").cast("string")).alias("uuid"),
        )

    def transform(self, df: DataFrame, dim: DataFrame) -> tuple[DataFrame, DataFrame]:
        cleaned = df.withColumn("close", clean_numeric(F.col("close_raw")) / 100.0)
        derived = (
            cleaned
            .withColumn("change_amount", change_amount(F.col("close"), F.col("change_rate")))
            .withColumn("trading_value", trading_value(F.col("close"), F.col("volume")))
            .withColumn("trade_date", weekend_roll(F.col("trade_date")))
        )
        # P7 validity gate (transformer.py:197-231)
        valid_pred = (
            F.col("close").isNotNull()
            & (F.col("high") >= F.greatest("open", "low", "close"))
            & (F.col("low") <= F.least("open", "high", "close"))
            & (F.col("volume") >= 0)
        )
        valid = derived.filter(valid_pred)
        quarantine = derived.filter(~valid_pred)
        # J4 lookup-or-create with deterministic generated id
        gen = F.concat(F.lit("gen-"), F.substring(F.sha2(F.col("ticker"), 256), 1, 16))
        enriched = lookup_or_create(valid, dim, ["ticker"], "uuid", gen)
        out = enriched.select("uuid", "ticker", "trade_date", "open", "high", "low",
                              "close", "volume", "change_rate", "change_amount",
                              "trading_value")
        return out, quarantine


class ETLPipeline:
    """run_full_pipeline analog (etl_service.py:197-227): E→T→L in one
    lazy plan, sink committed atomically per run."""

    def __init__(self, spark: SparkSession, store_dir: str):
        self.spark = spark
        self.cat = Catalog(store_dir)
        self.sources: dict[str, MarketDataSource] = {}

    def register(self, source: MarketDataSource) -> None:
        self.sources[source.name] = source

    def run_full_pipeline(self, source_name: str, params: dict | None = None,
                          mode: LoadMode = LoadMode.UPSERT) -> LoadResult:
        src = self.sources[source_name]
        params = params or {}
        raw = src.extract(self.spark, params)
        dim = src.asset_master(self.spark)
        valid, quarantine = src.transform(raw, dim)
        # first-wins dedup on the conflict key (A4 — loader.py:188-209)
        valid = first_wins_dedup(valid, src.conflict_keys,
                                 [F.col(c) for c in valid.columns if c not in src.conflict_keys])

        table = self.cat.table(src.target_table, src.partition_col)
        # LoadResult tallies ride the load action itself via observe()
        # (named accumulators on the plan) instead of separate count()
        # jobs — SURVEY §2.1 S10 mapping of the reference's LoadResult
        # counters (base/loader.py:24-59)
        from pyspark.sql import Observation

        obs = Observation()
        valid = valid.observe(obs, F.count(F.lit(1)).alias("loaded"))
        if mode == LoadMode.APPEND:
            table.append(valid)
        elif mode == LoadMode.UPSERT:
            table.merge(self.spark, valid, src.conflict_keys)  # merge persists internally
        elif mode == LoadMode.REPLACE:
            assert src.partition_col, "REPLACE needs a partition column"
            parts = [r[0] for r in valid.select(src.partition_col).distinct().collect()]
            table.overwrite_partitions(self.spark, valid, parts)
        n_valid = obs.get["loaded"]
        n_quar = quarantine.count()
        # quarantine table mirrors drop-with-warning (transformer.py:86-89)
        if n_quar:
            self.cat.table(f"{src.target_table}_quarantine", None).append(quarantine)
        return LoadResult(loaded=n_valid, failed=n_quar)
