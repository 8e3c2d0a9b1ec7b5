"""Kill/resume: a crawl stopped after round k and resumed must produce a
final state identical to an uninterrupted run (north_rule checkpoint
clause). Compares logical table contents, not file layout."""

from pyspark.sql import functions as F

from hyperion_crawler_spark.plans.loop import run_crawl
from hyperion_crawler_spark.sources.tables import Catalog

N_ROUNDS = 4


def _state(spark, store):
    cat = Catalog(store)
    out = {}
    for name, part in [("frontier", "shard"), ("archive", "shard"),
                       ("seen_exact", "shard"), ("results", "round")]:
        df = cat.table(name, part).read(spark)
        out[name] = sorted(tuple(r) for r in df.collect())
    # seen_filters blobs must match bit-for-bit
    f = cat.table("seen_filters", "shard").read(spark)
    out["seen_filters"] = sorted(
        (r["shard"], bytes(r["filter_bytes"]), r["n_items"]) for r in f.collect())
    return out


def test_resume_bit_identical(spark, fixture_dfs, crawl_cfg, tmp_path_factory):
    kw = dict(corpus=fixture_dfs["corpus"], links=fixture_dfs["links"],
              robots=fixture_dfs["robots"], seeds=fixture_dfs["seeds"])

    full_store = str(tmp_path_factory.mktemp("full"))
    run_crawl(spark, full_store, crawl_cfg, n_rounds=N_ROUNDS, **kw)

    part_store = str(tmp_path_factory.mktemp("partial"))
    run_crawl(spark, part_store, crawl_cfg, n_rounds=N_ROUNDS, stop_after_round=2, **kw)
    assert Catalog(part_store).last_round() == 2
    # resume picks up at round 3
    resumed = run_crawl(spark, part_store, crawl_cfg, n_rounds=N_ROUNDS, **kw)
    assert [m["round"] for m in resumed] == [3, 4]

    assert _state(spark, part_store) == _state(spark, full_store)


def test_resume_is_noop_when_complete(spark, fixture_dfs, crawl_cfg, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("noop"))
    kw = dict(corpus=fixture_dfs["corpus"], links=fixture_dfs["links"],
              robots=fixture_dfs["robots"], seeds=fixture_dfs["seeds"])
    run_crawl(spark, store, crawl_cfg, n_rounds=2, **kw)
    before = _state(spark, store)
    again = run_crawl(spark, store, crawl_cfg, n_rounds=2, **kw)
    assert again == []
    assert _state(spark, store) == before
