"""Golden tests for the reference scalar library (functions/scalars.py
F1-F16) not already covered by the DuckDB oracle queries."""

import datetime

from pyspark.sql import functions as F

from hyperion_crawler_spark.functions import scalars as S


def _one(spark, expr):
    return spark.range(1).select(expr.alias("v")).first()["v"]


def test_normalize_date(spark):
    df = spark.createDataFrame([("20240105",), ("garbage",), (None,)], "d string")
    out = [r["v"] for r in df.select(S.normalize_date(F.col("d"), "yyyyMMdd").alias("v")).collect()]
    assert out == ["2024-01-05", None, None]  # null-on-failure (transformer.py:61-76)


def test_clean_numeric(spark):
    df = spark.createDataFrame([("₩1,234.5",), ("$99",), ("abc",)], "s string")
    out = [r["v"] for r in df.select(S.clean_numeric(F.col("s")).alias("v")).collect()]
    assert out == [1234.5, 99.0, None]


def test_change_amount_and_trading_value(spark):
    assert _one(spark, S.change_amount(F.lit(200.0), F.lit(2.5))) == 5.0
    assert _one(spark, S.trading_value(F.lit(10.5), F.lit(3))) == 31.5


def test_normalize_market_cap(spark):
    # below threshold → scaled by 1e8 (억원 units, transformer.py:156-169)
    assert _one(spark, S.normalize_market_cap(F.lit(5.0))) == 5.0e8
    assert _one(spark, S.normalize_market_cap(F.lit(2.0e9))) == 2.0e9
    # falsy contract: 0 and NULL → NULL (`if not value: return None`,
    # same quirk family as F8 normalize_target_price)
    assert _one(spark, S.normalize_market_cap(F.lit(0.0))) is None
    assert _one(spark, S.normalize_market_cap(
        F.lit(None).cast("double"))) is None


def test_normalize_identifier(spark):
    assert _one(spark, S.normalize_identifier(F.lit("krx005"), "ticker")) == "KRX005"
    assert _one(spark, S.normalize_identifier(F.lit("123"), "cik")) == "0000000123"
    assert _one(spark, S.normalize_identifier(F.lit("42"), "corp_code")) == "00000042"


def test_normalize_rating(spark):
    m = {"strong_buy": "buy"}
    assert _one(spark, S.normalize_rating(F.lit("Strong Buy"), m)) == "buy"
    assert _one(spark, S.normalize_rating(F.lit("Hold-Now"), m)) == "hold_now"


def test_weekend_roll(spark):
    df = spark.createDataFrame(
        [(datetime.date(2024, 1, 6),),   # Saturday → Friday
         (datetime.date(2024, 1, 7),),   # Sunday → Friday
         (datetime.date(2024, 1, 8),)],  # Monday stays
        "d date")
    out = [r["v"].isoformat() for r in df.select(S.weekend_roll(F.col("d")).alias("v")).collect()]
    assert out == ["2024-01-05", "2024-01-05", "2024-01-08"]


def test_parse_symbols(spark):
    out = _one(spark, S.parse_symbols(F.lit(" aapl, msft ,tsla")))
    assert out == ["AAPL", "MSFT", "TSLA"]
    # falsy contract: '' and NULL → [] (extractor.py:126-137), not ['']
    assert _one(spark, S.parse_symbols(F.lit(""))) == []
    assert _one(spark, S.parse_symbols(F.lit(None).cast("string"))) == []


def test_task_id_deterministic(spark):
    assert _one(spark, S.task_id("krx", "daily", F.lit(7))) == "krx_daily_7"


def test_json_field(spark):
    assert _one(spark, S.json_field(F.lit('{"k": 42}'), "$.k")) == "42"


def test_add_metadata(spark):
    df = S.add_metadata(spark.range(2), "krx", F.lit(3))
    row = df.first()
    assert row["created_round"] == 3 and row["data_source"] == "krx"
