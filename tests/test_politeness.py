"""Two-phase skew-safe top-k == naive single-window top-k; robots
exclusion; budget semantics."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from hyperion_crawler_spark.config import CrawlConfig
from hyperion_crawler_spark.operators.politeness import schedule_round, topk_per_host, with_robots


def _frontier(spark, n=500, n_hosts=5):
    # skew: host0 owns half the rows
    return spark.range(n).select(
        F.col("id").alias("urlhash"),
        F.concat(F.lit("http://h"),
                 F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.pmod("id", F.lit(n_hosts))).cast("string"),
                 F.lit(".ex/p/"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("h"),
                 F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.pmod("id", F.lit(n_hosts))).cast("string"),
                 F.lit(".ex")).alias("host"),
        F.concat(F.lit("img"), F.col("id").cast("string")).alias("image_id"),
        F.pmod("id", F.lit(8)).cast("int").alias("shard"),
        (F.pmod(F.xxhash64("id"), F.lit(1000)) / 1000.0).alias("priority"),
        F.lit("queued").alias("status"),
        F.lit(0).alias("retry_count"),
        F.lit(0).cast("long").alias("next_fetch_ts"),
        F.lit(0).alias("discovered_round"),
    )


def test_two_phase_equals_naive(spark, crawl_cfg):
    df = _frontier(spark).withColumn("budget", F.lit(7).cast("long"))
    got = topk_per_host(df, crawl_cfg).select("host", "urlhash")
    w = Window.partitionBy("host").orderBy(F.col("priority").desc(), F.col("urlhash").asc())
    want = (df.withColumn("rn", F.row_number().over(w)).filter("rn <= budget")
            .select("host", "urlhash"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_budget_cap_per_host(spark, crawl_cfg):
    df = _frontier(spark).withColumn("budget", F.lit(3).cast("long"))
    counts = topk_per_host(df, crawl_cfg).groupBy("host").count().collect()
    assert all(r["count"] <= 3 for r in counts)


def test_robots_exclusion_and_delay_budget(spark, crawl_cfg):
    frontier = spark.createDataFrame(
        [(1, "http://a.ex/private/x", "a.ex", "i1", 0, 0.9, "queued", 0, 0, 0),
         (2, "http://a.ex/ok/x", "a.ex", "i2", 0, 0.8, "queued", 0, 0, 0),
         (3, "http://b.ex/ok/y", "b.ex", "i3", 0, 0.7, "queued", 0, 0, 0)],
        "urlhash long, url string, host string, image_id string, shard int, priority double,"
        "status string, retry_count int, next_fetch_ts long, discovered_round int")
    robots = spark.createDataFrame(
        [("a.ex", ["/private"], 0.0, 10), ("b.ex", [], 5.0, 100)],
        "host string, disallow_prefixes array<string>, crawl_delay_s double, max_per_round int")
    scheduled, excluded = schedule_round(frontier, robots, crawl_cfg)
    assert [r["urlhash"] for r in excluded.collect()] == [1]
    assert sorted(r["urlhash"] for r in scheduled.collect()) == [2, 3]
    # delay 5s → budget floor(60/5)=12 beats max_per_round=100
    ann = with_robots(frontier.filter("host = 'b.ex'"), robots, crawl_cfg)
    assert ann.first()["budget"] == 12


def test_unknown_host_gets_default_budget(spark, crawl_cfg):
    frontier = spark.createDataFrame(
        [(9, "http://zz.ex/a", "zz.ex", "i9", 0, 0.5, "queued", 0, 0, 0)],
        "urlhash long, url string, host string, image_id string, shard int, priority double,"
        "status string, retry_count int, next_fetch_ts long, discovered_round int")
    robots = spark.createDataFrame(
        [("a.ex", ["/private"], 0.0, 10)],
        "host string, disallow_prefixes array<string>, crawl_delay_s double, max_per_round int")
    ann = with_robots(frontier, robots, crawl_cfg)
    row = ann.first()
    assert row["robots_allowed"] is True
    assert row["budget"] == crawl_cfg.default_host_budget


def test_schedule_round_excludes_traps_when_enabled(spark, fixture_dfs, crawl_cfg):
    """Trap guards route URLs through the same excluded path robots
    denials use; thresholds 0 (default) leave scheduling untouched."""
    import dataclasses

    from hyperion_crawler_spark.plans.round import canonical_url_rows

    deep = spark.createDataFrame(
        [("https://h0.example.com/" + "a/b/" * 10 + "leaf", "img_trap", 0.5)],
        "url string, image_id string, priority double")
    seeds = fixture_dfs["seeds"].select("url", "image_id", "priority").unionByName(deep)
    frontier = canonical_url_rows(
        seeds, "url", "image_id", "priority", crawl_cfg, [F.col("image_id")]) \
        .withColumn("retry_count", F.lit(0)) \
        .withColumn("discovered_round", F.lit(0)) \
        .withColumn("status", F.lit("queued")) \
        .withColumn("next_fetch_ts", F.lit(0).cast("long"))

    base_sched, base_excl = schedule_round(frontier, fixture_dfs["robots"], crawl_cfg)
    cfg_trap = dataclasses.replace(crawl_cfg, max_url_depth=8)
    trap_sched, trap_excl = schedule_round(frontier, fixture_dfs["robots"], cfg_trap)

    assert base_sched.filter(F.col("image_id") == "img_trap").count() == 1
    assert trap_sched.filter(F.col("image_id") == "img_trap").count() == 0
    assert trap_excl.filter(F.col("image_id") == "img_trap").count() == 1
    # everything else is untouched by the guard
    assert (sorted(r["urlhash"] for r in trap_sched.collect())
            == sorted(r["urlhash"] for r in
                      base_sched.filter(F.col("image_id") != "img_trap").collect()))
