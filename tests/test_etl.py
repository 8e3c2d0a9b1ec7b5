"""E→T→L facade: mode dispatch, upsert idempotence, lookup-or-create,
LoadResult accounting (reference service semantics)."""

from pyspark.sql import functions as F

from hyperion_crawler_spark.etl import ETLPipeline, LoadMode, MarketDataSource


def _pipeline(spark, tmp_path):
    p = ETLPipeline(spark, str(tmp_path))
    p.register(MarketDataSource(n_tickers=60))
    return p


def test_full_pipeline_upsert(spark, tmp_path):
    p = _pipeline(spark, tmp_path)
    res = p.run_full_pipeline("market", {"trade_date": "2024-01-05"})
    assert res.loaded == 60 and res.success_rate == 1.0
    t = p.cat.table("market_daily_prices", None).read(spark)
    assert t.count() == 60
    # uuid: known dim rows keep their uuid, misses get generated ids
    known = t.filter(F.col("uuid").startswith("uuid-")).count()
    gen = t.filter(F.col("uuid").startswith("gen-")).count()
    assert known == 20 and gen == 40


def test_upsert_idempotent(spark, tmp_path):
    p = _pipeline(spark, tmp_path)
    p.run_full_pipeline("market", {"trade_date": "2024-01-05"})
    first = sorted(tuple(r) for r in p.cat.table("market_daily_prices", None).read(spark).collect())
    p.run_full_pipeline("market", {"trade_date": "2024-01-05"})
    again = sorted(tuple(r) for r in p.cat.table("market_daily_prices", None).read(spark).collect())
    assert first == again, "re-running the same day must not duplicate rows"


def test_two_days_accumulate(spark, tmp_path):
    p = _pipeline(spark, tmp_path)
    p.run_full_pipeline("market", {"trade_date": "2024-01-05"})
    p.run_full_pipeline("market", {"trade_date": "2024-01-08"})
    t = p.cat.table("market_daily_prices", None).read(spark)
    assert t.count() == 120
    assert t.select("trade_date").distinct().count() == 2


def test_weekend_rolls_to_friday(spark, tmp_path):
    p = _pipeline(spark, tmp_path)
    p.run_full_pipeline("market", {"trade_date": "2024-01-06"})  # Saturday
    t = p.cat.table("market_daily_prices", None).read(spark)
    days = [r[0].isoformat() for r in t.select("trade_date").distinct().collect()]
    assert days == ["2024-01-05"], "Saturday batch must land on Friday"


def test_append_mode_duplicates(spark, tmp_path):
    p = _pipeline(spark, tmp_path)
    p.run_full_pipeline("market", {"trade_date": "2024-01-05"}, mode=LoadMode.APPEND)
    p.run_full_pipeline("market", {"trade_date": "2024-01-05"}, mode=LoadMode.APPEND)
    assert p.cat.table("market_daily_prices", None).read(spark).count() == 120
