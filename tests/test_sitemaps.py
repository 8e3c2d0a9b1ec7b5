"""Sitemap discovery kernels + profile operator."""

from pyspark.sql import functions as F

from hyperion_crawler_spark.functions.sitemaps import (
    seeds_from_sitemap_xml,
    sitemap_urls_from_robots,
    urls_from_sitemap_xml,
)


def test_sitemap_lines_from_robots(spark):
    txt = ("User-agent: *\nDisallow: /private\n"
           "Sitemap: https://a.com/sitemap.xml\n"
           "sitemap:   https://a.com/s2.xml\nAllow: /")
    got = spark.createDataFrame([(txt,)], "txt string").select(
        sitemap_urls_from_robots(F.col("txt")).alias("s")).first()["s"]
    assert got == ["https://a.com/sitemap.xml", "https://a.com/s2.xml"]


def test_loc_extraction_trims_whitespace(spark):
    xml = ("<urlset><url><loc>https://a.com/1</loc></url>"
           "<url><loc>\n  https://a.com/2  \n</loc></url>"
           "<url><loc></loc></url></urlset>")
    got = spark.createDataFrame([(xml,)], "xml string").select(
        urls_from_sitemap_xml(F.col("xml")).alias("u")).first()["u"]
    assert got == ["https://a.com/1", "https://a.com/2"]


def test_seeds_from_sitemap_schema_and_image_id(spark):
    xml = ("<urlset><url><loc>https://h1.example.com/img_007</loc></url>"
           "<url><loc>https://h2.example.com/a/img_008?x=1</loc></url></urlset>")
    seeds = seeds_from_sitemap_xml(
        spark.createDataFrame([(xml,)], "xml string"), "xml", priority=0.7)
    rows = sorted(map(tuple, seeds.collect()))
    assert rows == [
        ("https://h1.example.com/img_007", "img_007", 0.7),
        ("https://h2.example.com/a/img_008?x=1", "img_008", 0.7),
    ]
    assert seeds.columns == ["url", "image_id", "priority"]


def test_sitemap_to_frontier_end_to_end(spark, tmp_path):
    """sitemap XML → seeds → streaming ingest → frontier rows."""
    import os

    from hyperion_crawler_spark.config import CrawlConfig
    from hyperion_crawler_spark.sources.tables import Catalog
    from hyperion_crawler_spark.streaming.seed_ingest import ingest_seed_stream

    xml = ("<urlset><url><loc>https://h1.example.com/img_a</loc></url>"
           "<url><loc>https://h1.example.com/img_b</loc></url></urlset>")
    seeds = seeds_from_sitemap_xml(
        spark.createDataFrame([(xml,)], "xml string"), "xml")
    seed_dir = str(tmp_path / "seeds")
    os.makedirs(seed_dir)
    seeds.coalesce(1).write.mode("append").parquet(seed_dir)
    cat = Catalog(str(tmp_path / "store"))
    out = ingest_seed_stream(spark, cat, CrawlConfig(n_shards=4),
                             seed_dir, str(tmp_path / "ckpt"))
    assert out["new_urls"] == 2
    fr = cat.table("frontier", "shard").read(spark)
    assert sorted(r["image_id"] for r in fr.collect()) == ["img_a", "img_b"]


def test_profile_numeric_single_scan(spark):
    from hyperion_crawler_spark.operators.profile import profile_numeric

    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, None), (3.0, 30.0), (4.0, 40.0)],
        "a double, b double")
    prof = profile_numeric(df, ["a", "b"])
    got = {r["col_name"]: r for r in prof.collect()}
    assert got["a"]["n"] == 4 and got["a"]["n_null"] == 0
    assert got["a"]["mean_c"] == 2.5 and got["a"]["p50"] == 2.5
    assert got["b"]["n"] == 3 and got["b"]["n_null"] == 1
    assert got["b"]["min_v"] == 10.0 and got["b"]["max_v"] == 40.0
    assert got["b"]["p50"] == 30.0
    # one scan total: a single aggregate feeding one 1-row exchange
    plan = prof._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]  # AQE prints final + initial trees
    assert final.count("Scan ") == 1


def test_sitemap_robots_bare_line_and_cdata(spark):
    """r5 review: a bare 'Sitemap:' line must not swallow the next
    line's first token; CDATA-wrapped <loc> values unwrap; seeds drop
    fragment/trailing-slash noise and bare hosts."""
    from hyperion_crawler_spark.functions.sitemaps import (
        seeds_from_sitemap_xml,
        sitemap_urls_from_robots,
        urls_from_sitemap_xml,
    )

    df = spark.createDataFrame(
        [("Sitemap:\nUser-agent: *\nSitemap: https://h.ex/s.xml\n",)],
        "txt string")
    got = df.select(sitemap_urls_from_robots(F.col("txt")).alias("u")).first()["u"]
    assert got == ["https://h.ex/s.xml"]

    xml = ("<urlset><url><loc><![CDATA[https://h.ex/img_1]]></loc></url>"
           "<url><loc> https://h.ex/img_2 </loc></url></urlset>")
    xdf = spark.createDataFrame([(xml,)], "xml string")
    urls = xdf.select(urls_from_sitemap_xml(F.col("xml")).alias("u")).first()["u"]
    assert urls == ["https://h.ex/img_1", "https://h.ex/img_2"]

    seed_xml = ("<urlset>"
                "<url><loc>https://h.ex/img_3#frag</loc></url>"
                "<url><loc>https://h.ex/dir/</loc></url>"
                "<url><loc>https://h.ex</loc></url>"
                "<url><loc>https://h.ex/img_4?v=2</loc></url>"
                "</urlset>")
    sdf = spark.createDataFrame([(seed_xml,)], "xml string")
    seeds = {r["url"]: r["image_id"]
             for r in seeds_from_sitemap_xml(sdf, "xml").collect()}
    assert seeds == {"https://h.ex/img_3#frag": "img_3",
                     "https://h.ex/dir/": "dir",
                     "https://h.ex/img_4?v=2": "img_4"}  # bare host dropped
