"""Kill/resume: a crawl stopped after round k and resumed must produce a
final state identical to an uninterrupted run (north_rule checkpoint
clause). Compares logical table contents, not file layout."""

from pyspark.sql import functions as F

from hyperion_crawler_spark.plans.loop import run_crawl
from hyperion_crawler_spark.sources.tables import Catalog

N_ROUNDS = 4


def _state(spark, store):
    cat = Catalog(store)
    base = cat.base_versions()
    out = {}
    for name, part in [("frontier", "shard"), ("archive", "shard"),
                       ("seen_exact", "shard"), ("results", "round")]:
        df = cat.table(name, part).read(spark, version=base.get(name))
        out[name] = sorted(tuple(r) for r in df.collect())
    # seen_filters blobs must match bit-for-bit
    f = cat.table("seen_filters", "shard").read(spark, version=base.get("seen_filters"))
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


def test_mid_round_crash_redo_is_exact(spark, fixture_dfs, crawl_cfg, tmp_path_factory):
    """A crash AFTER some table snapshots but BEFORE the round
    checkpoint must leave no trace: the redo binds to the checkpointed
    versions and orphans the crashed attempt's files."""
    from pyspark.sql import functions as F

    kw = dict(corpus=fixture_dfs["corpus"], links=fixture_dfs["links"],
              robots=fixture_dfs["robots"], seeds=fixture_dfs["seeds"])

    full_store = str(tmp_path_factory.mktemp("mr_full"))
    run_crawl(spark, full_store, crawl_cfg, n_rounds=3, **kw)

    crash_store = str(tmp_path_factory.mktemp("mr_crash"))
    run_crawl(spark, crash_store, crawl_cfg, n_rounds=3, stop_after_round=2, **kw)
    # simulate a crashed round-3 attempt: results append + frontier
    # merge landed, then the job died before commit_round(3). The junk
    # must carry the crawl's own writer identity — that is what the
    # rebase walk orphans; an anonymous/foreign writer's commits are
    # (correctly) carried as concurrent work (see test_concurrency).
    cat = Catalog(crash_store, writer="crawl")
    junk_results = cat.table("results", "round").read(spark) \
        .limit(5).withColumn("round", F.lit(3))
    cat.table("results", "round").append(junk_results)
    junk_frontier = cat.table("frontier", "shard").read(spark).limit(3) \
        .withColumn("priority", F.lit(0.123456))
    cat.table("frontier", "shard").merge(spark, junk_frontier, ["urlhash"])
    assert cat.last_round() == 2  # checkpoint log untouched by the crash

    resumed = run_crawl(spark, crash_store, crawl_cfg, n_rounds=3, **kw)
    assert [m["round"] for m in resumed] == [3]
    assert _state(spark, crash_store) == _state(spark, full_store)


def test_resume_with_seen_folding(spark, fixture_dfs, crawl_cfg, tmp_path_factory):
    """In-crawl seen-state folding (cfg.fold_seen_every) keeps resumes
    bit-identical: the fold is part of the round checkpoint, so a full
    run and a stop/resume run fold the same deltas at the same rounds
    and land on identical folded rows. Also pins that the fold actually
    compacts: after the round-4 fold, each shard holds exactly ONE
    blob row."""
    import dataclasses

    cfg = dataclasses.replace(crawl_cfg, fold_seen_every=2)
    kw = dict(corpus=fixture_dfs["corpus"], links=fixture_dfs["links"],
              robots=fixture_dfs["robots"], seeds=fixture_dfs["seeds"])

    full_store = str(tmp_path_factory.mktemp("fold_full"))
    run_crawl(spark, full_store, cfg, n_rounds=4, **kw)

    part_store = str(tmp_path_factory.mktemp("fold_part"))
    run_crawl(spark, part_store, cfg, n_rounds=4, stop_after_round=3, **kw)
    resumed = run_crawl(spark, part_store, cfg, n_rounds=4, **kw)
    assert [m["round"] for m in resumed] == [4]
    assert _state(spark, part_store) == _state(spark, full_store)

    cat = Catalog(full_store)
    rows = cat.table("seen_filters", "shard").read(spark).collect()
    shards = [r["shard"] for r in rows]
    assert len(shards) == len(set(shards)), "fold left >1 row per shard"
