"""YAML source registry with env-var substitution (SURVEY §2.1 S4).

Mirrors the reference's config-driven component bootstrap:
* YAML tree ``sources.<name>.{enabled, extractor.class, extractor.params,
  loader.target_table, loader.default_mode, monitoring.alerts}`` —
  /root/reference/api/src/config/etl_config.yaml:4-155
* ``${ENV_VAR}`` substitution on full-string values, falling back to the
  literal when the variable is unset —
  /root/reference/api/src/services/etl_service.py:56-66
* class-name dispatch per source (``_initialize_components`` —
  etl_service.py:68-90); disabled sources are skipped.

The adapter *classes* live in ``etl.py`` (MarketDataSource) and here
(FilingsSource, the DART-stub shape); the registry maps YAML
``extractor.class`` names onto them, proving the SourceAdapter Protocol
hosts more than one source.
"""

from __future__ import annotations

import os

import yaml
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .etl import ETLPipeline, LoadMode, MarketDataSource
from .functions.scalars import extract_filing_metadata, filing_date_range


def substitute_env(node):
    """Recursive ``${VAR}`` substitution on full-string values only —
    byte-for-byte the reference's `_substitute_env_vars` semantics
    (etl_service.py:56-66): unset variables keep the literal string."""
    if isinstance(node, dict):
        return {k: substitute_env(v) for k, v in node.items()}
    if isinstance(node, list):
        return [substitute_env(v) for v in node]
    if isinstance(node, str) and node.startswith("${") and node.endswith("}"):
        return os.getenv(node[2:-1], node)
    return node


def load_config(path: str | None = None) -> dict:
    """Load + env-substitute the ETL YAML (default: packaged config)."""
    if path is None:
        path = os.path.join(os.path.dirname(__file__), "etl_config.yaml")
    with open(path, encoding="utf-8") as f:
        return substitute_env(yaml.safe_load(f))


class FilingsSource:
    """Second registered adapter — the reference's DART source shape.

    The reference's DARTExtractor is a stub that returns ``[]`` with a
    TODO (/root/reference/api/src/etl/dart/extractor.py:19-50) but its
    registry slot, config (api_key via ``${DART_API_KEY}``, report
    types), and transformer contract (filing metadata + XBRL) are real.
    Mirrored here: extract yields a deterministic miniature filing feed
    (empty when ``stub_rows=0``, the reference's literal behavior), and
    transform exercises F10/F14/F15 — date-range dispatch, metadata
    extraction, and the XBRL stub map.
    """

    name = "filings"
    target_table = "filings_metadata"
    conflict_keys = ["filing_id"]
    partition_col = None

    def __init__(self, api_key: str = "", report_types: list[str] | None = None,
                 stub_rows: int = 0):
        self.api_key = api_key
        self.report_types = report_types or ["A001"]
        self.stub_rows = stub_rows

    def extract(self, spark: SparkSession, params: dict) -> DataFrame:
        n = int(params.get("stub_rows", self.stub_rows))
        base = spark.range(n)
        rt = self.report_types
        rtype = F.element_at(
            F.array(*[F.lit(x) for x in rt]), (F.pmod("id", F.lit(len(rt))) + 1).cast("int"))
        return base.select(
            F.concat(F.lit("fil-"), F.col("id").cast("string")).alias("filing_id"),
            F.to_json(F.struct(
                F.date_format(F.date_add(F.lit("2024-01-01").cast("date"),
                                         F.pmod("id", F.lit(300)).cast("int")),
                              "yyyy-MM-dd").alias("filing_date"),
                rtype.alias("document_type"),
                F.concat(F.lit("corp-"), F.pmod("id", F.lit(50)).cast("string")).alias("company_name"),
                F.concat(F.lit("http://filings.example/"), F.col("id").cast("string")).alias("filing_url"),
            )).alias("filing_json"),
            F.lit(None).cast("string").alias("start_date"),
            F.lit(None).cast("string").alias("end_date"),
            F.date_format(F.date_add(F.lit("2024-01-01").cast("date"),
                                     F.pmod("id", F.lit(300)).cast("int")), "yyyyMMdd").alias("date"),
        )

    def transform(self, df: DataFrame, dim: DataFrame | None = None
                  ) -> tuple[DataFrame, DataFrame]:
        md = extract_filing_metadata(F.col("filing_json"))
        rng = filing_date_range(F.col("start_date"), F.col("end_date"), F.col("date"),
                                F.lit("2024-06-30").cast("date"))
        out = df.select(
            "filing_id", md.alias("md"), rng.alias("rng"),
        ).select(
            "filing_id",
            F.col("md.filing_date").alias("filing_date"),
            F.col("md.document_type").alias("document_type"),
            F.col("md.company_name").alias("company_name"),
            F.col("md.filing_url").alias("filing_url"),
            F.col("rng.range_start").alias("range_start"),
            F.col("rng.range_end").alias("range_end"),
        )
        valid = out.filter(F.col("filing_date").isNotNull())
        quarantine = out.filter(F.col("filing_date").isNull())
        return valid, quarantine

    def asset_master(self, spark: SparkSession) -> DataFrame | None:
        return None


_ADAPTER_CLASSES = {
    "MarketDataSource": MarketDataSource,
    "FilingsSource": FilingsSource,
}


def build_pipeline(spark: SparkSession, store_dir: str,
                   config: dict | None = None,
                   config_path: str | None = None) -> ETLPipeline:
    """Instantiate an ETLPipeline with every ENABLED source from the
    YAML tree (etl_service.py:68-90 analog). ``extractor.params`` feeds
    the adapter constructor; ``loader.target_table``/``default_mode``
    and the data_quality alert threshold override class defaults."""
    cfg = config if config is not None else load_config(config_path)
    pipe = ETLPipeline(spark, store_dir)
    common = cfg.get("common", {})
    pipe.quality_threshold = float(
        common.get("data_quality", {}).get("min_success_rate",
                                           pipe.quality_threshold))
    for name, scfg in cfg.get("sources", {}).items():
        if not scfg.get("enabled", False):
            continue
        cls_name = scfg.get("extractor", {}).get("class")
        if cls_name not in _ADAPTER_CLASSES:
            raise ValueError(
                f"source {name!r}: unknown extractor class {cls_name!r}; "
                f"registered: {sorted(_ADAPTER_CLASSES)}")
        cls = _ADAPTER_CLASSES[cls_name]
        src = cls(**scfg.get("extractor", {}).get("params", {}))
        src.name = name
        loader = scfg.get("loader", {})
        if loader.get("target_table"):
            src.target_table = loader["target_table"]
        if loader.get("update_latest_prices"):
            # reference krx loader option (etl_config.yaml:31,
            # krx/loader.py:76-77): maintain the latest-per-key slice
            src.update_latest = True
        mode = loader.get("default_mode")
        pipe.register(src, default_mode=LoadMode(mode) if mode else None)
        for alert in scfg.get("monitoring", {}).get("alerts", []):
            if alert.get("type") == "data_quality":
                pipe.quality_thresholds[name] = float(alert["threshold"])
            elif alert.get("type") == "latency":
                # reference etl_config.yaml:42-43 — run must finish
                # within the budget or the lineage row records
                # status=latency_exceeded
                pipe.latency_thresholds[name] = float(alert["threshold"])
    return pipe
