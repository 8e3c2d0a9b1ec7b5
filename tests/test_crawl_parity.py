"""Golden end-to-end: Spark engine crawl vs single-threaded exact oracle.

Parity clauses (BASELINE.json north_rule): per-round crawl ordering
(priority DESC, urlhash ASC over each round's scheduled set), final
URL-seen membership, frontier status machine, and the per-row payload
invariant (PSNR ≥ 40 dB lossy / exact lossless + caption equality +
phash match) — all under the identical seed list + politeness budget.
"""

import pytest
from pyspark.sql import functions as F

from hyperion_crawler_spark.functions.images import LOSSY_FMTS
from hyperion_crawler_spark.plans.loop import run_crawl
from hyperion_crawler_spark.sources.tables import Catalog

from .oracle import run_oracle

N_ROUNDS = 5


@pytest.fixture(scope="module")
def crawl_run(spark, fixture_dfs, fixture_pdf, crawl_cfg, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("crawl_store"))
    metrics = run_crawl(
        spark, store, crawl_cfg,
        corpus=fixture_dfs["corpus"], links=fixture_dfs["links"],
        robots=fixture_dfs["robots"], seeds=fixture_dfs["seeds"],
        n_rounds=N_ROUNDS,
    )
    oracle = run_oracle(fixture_pdf, crawl_cfg, N_ROUNDS)
    return store, metrics, oracle


def _full_state(spark, store):
    """frontier (pending) ∪ archive (terminal) — every URL ever enqueued."""
    cat = Catalog(store)
    fr = cat.table("frontier", "shard").read(spark)
    ar = cat.table("archive", "shard").read(spark)
    cols = ["urlhash", "url", "host", "image_id", "shard", "priority",
            "status", "retry_count", "next_fetch_ts", "discovered_round"]
    out = fr.select(*cols)
    if ar is not None:
        out = out.unionByName(ar.select(*cols))
    return out


def test_crawl_order_parity(spark, crawl_run):
    store, _, oracle = crawl_run
    results = Catalog(store).table("results", "round").read(spark)
    state = _full_state(spark, store).select("urlhash", F.col("priority").alias("p"))
    for rnd in range(1, N_ROUNDS + 1):
        got = [
            r["urlhash"]
            for r in results.filter(F.col("round") == rnd)
            .join(state, "urlhash")
            .orderBy(F.col("p").desc(), F.col("urlhash").asc())
            .collect()
        ]
        assert got == oracle.crawl_order[rnd - 1], f"round {rnd} order mismatch"


def test_seen_membership_parity(spark, crawl_run):
    store, _, oracle = crawl_run
    seen = Catalog(store).table("seen_exact", "shard").read(spark)
    got = {r["urlhash"] for r in seen.select("urlhash").collect()}
    assert got == oracle.seen


def test_frontier_status_parity(spark, crawl_run):
    store, _, oracle = crawl_run
    st = _full_state(spark, store)
    got = {r["urlhash"]: r["status"] for r in st.collect()}
    want = {h: row["status"] for h, row in oracle.frontier.items()}
    assert got == want
    # the frontier table itself must hold ONLY pending work
    fr = Catalog(store).table("frontier", "shard").read(spark)
    assert {r[0] for r in fr.select("status").distinct().collect()} <= {"queued"}


def test_result_status_parity(spark, crawl_run):
    store, _, oracle = crawl_run
    res = Catalog(store).table("results", "round").read(spark)
    got = {(r["round"], r["urlhash"]): r["status"] for r in res.collect()}
    want = {(r["round"], r["urlhash"]): r["status"] for r in oracle.results}
    assert got == want


def test_payload_invariants(spark, crawl_run, fixture_dfs):
    store, _, _ = crawl_run
    res = Catalog(store).table("results", "round").read(spark).filter("status = 'fetched'")
    joined = res.join(
        fixture_dfs["corpus"].select("image_id", F.col("fmt"),
                                     F.col("caption").alias("want_caption"),
                                     F.col("phash").alias("want_phash")),
        "image_id")
    rows = joined.collect()
    assert rows
    for r in rows:
        dist = bin((r["phash"] ^ r["want_phash"]) & ((1 << 64) - 1)).count("1")
        if r["fmt"] in LOSSY_FMTS:
            assert r["psnr_db"] >= 40.0
            assert dist <= 2
        else:
            assert r["psnr_db"] >= 99.0  # lossless sentinel (bit-exact)
            assert dist == 0
        assert r["caption"] == r["want_caption"]
        assert r["caption_ok"]


def test_bloom_agrees_with_exact_shadow(spark, crawl_run, crawl_cfg):
    store, _, _ = crawl_run
    cat = Catalog(store)
    n_exact = cat.table("seen_exact", "shard").read(spark).select("urlhash").distinct().count()
    n_bloom = sum(r["n_items"] for r in cat.table("seen_filters", "shard").read(spark).collect())
    assert n_bloom == n_exact


def test_metrics_progression(crawl_run):
    _, metrics, _ = crawl_run
    fetch_rounds = [m for m in metrics if "scheduled" in m]
    assert len(fetch_rounds) == N_ROUNDS
    assert fetch_rounds[0]["scheduled"] > 0
    assert any(m["deduped"] > 0 for m in fetch_rounds), "dup links must be deduped"
    assert any(m["new_urls"] > 0 for m in fetch_rounds), "frontier must grow"
    assert any(m["failed"] > 0 for m in fetch_rounds), "transient failures must occur"


def test_allow_override_exercised_and_parity(spark, crawl_run, fixture_pdf):
    """The fixture must actually contain /private/open URLs fetched on a
    DISALLOWING host whose Allow overrides it (guards against the Allow
    path silently not being exercised), and the engine/oracle agree on
    every /private* decision (covered by the status-parity test; this
    asserts the interesting subset is non-empty both ways)."""
    store, _, _ = crawl_run
    robots = fixture_pdf["robots"]
    allowing_hosts = set(robots[robots["allow_prefixes"].map(len) > 0]["host"])
    assert allowing_hosts, "fixture lost its Allow rules"
    res = Catalog(store).table("results", "round").read(spark)
    fetched_open = res.filter(
        (F.col("status") == "fetched") & F.col("url").contains("/private/open/")
    ).filter(F.col("host").isin(list(allowing_hosts)))
    assert fetched_open.count() > 0, "no Allow-overridden URL was ever fetched"
    # and plain /private (non-open) on disallowing hosts must be excluded
    ar = Catalog(store).table("archive", "shard").read(spark)
    excluded_private = ar.filter(
        (F.col("status") == "excluded") & F.col("url").contains("/private/")
        & ~F.col("url").contains("/private/open/"))
    assert excluded_private.count() > 0


def test_robots_rules_produced_in_engine_match_prebuilt(
        spark, fixture_dfs, fixture_pdf, crawl_cfg, tmp_path_factory):
    """Crawl with rules DERIVED from raw robots.txt documents inside the
    engine == crawl with the prebuilt rules table (same texts)."""
    from hyperion_crawler_spark.functions.robots import rules_from_robots

    robots_pdf = fixture_pdf["robots"]

    def txt(row):
        lines = ["User-agent: hyperion"]
        lines += [f"Disallow: {p}" for p in row["disallow_prefixes"]]
        lines += [f"Allow: {p}" for p in row["allow_prefixes"]]
        if row["crawl_delay_s"] > 0:
            lines.append(f"Crawl-delay: {row['crawl_delay_s']}")
        return "\n".join(lines)

    raw = spark.createDataFrame(
        [(r["host"], txt(r)) for _, r in robots_pdf.iterrows()],
        "host string, robots_txt string")
    # prebuilt side: same rules but max_per_round pinned to the default
    # the parser applies (robots.txt cannot express a request budget)
    prebuilt = fixture_dfs["robots"].withColumn(
        "max_per_round", F.lit(crawl_cfg.default_host_budget))

    s1 = str(tmp_path_factory.mktemp("rb_txt"))
    s2 = str(tmp_path_factory.mktemp("rb_pre"))
    run_crawl(spark, s1, crawl_cfg, corpus=fixture_dfs["corpus"],
              links=fixture_dfs["links"], robots=None, seeds=fixture_dfs["seeds"],
              n_rounds=2, robots_txt=raw)
    run_crawl(spark, s2, crawl_cfg, corpus=fixture_dfs["corpus"],
              links=fixture_dfs["links"], robots=prebuilt, seeds=fixture_dfs["seeds"],
              n_rounds=2)
    r1 = sorted(tuple(r) for r in Catalog(s1).table("results", "round").read(spark)
                .select("round", "urlhash", "status").collect())
    r2 = sorted(tuple(r) for r in Catalog(s2).table("results", "round").read(spark)
                .select("round", "urlhash", "status").collect())
    assert r1 == r2 and r1


def test_bucketed_corpus_crawl_equals_dataframe_corpus(
        spark, fixture_dfs, crawl_cfg, tmp_path_factory):
    """The pruned bucketed-corpus fetch path must produce the exact same
    crawl as the plain DataFrame corpus (pruning is a plan change, not a
    semantics change)."""
    from hyperion_crawler_spark.plans.fetch import write_bucketed_corpus

    s1 = str(tmp_path_factory.mktemp("bk_tbl"))
    s2 = str(tmp_path_factory.mktemp("bk_df"))
    ctab = Catalog(s1).table("corpus", "img_bucket")
    write_bucketed_corpus(ctab, fixture_dfs["corpus"], 16)
    run_crawl(spark, s1, crawl_cfg, corpus=None, links=fixture_dfs["links"],
              robots=fixture_dfs["robots"], seeds=fixture_dfs["seeds"], n_rounds=2,
              corpus_table=ctab, corpus_buckets=16)
    run_crawl(spark, s2, crawl_cfg, corpus=fixture_dfs["corpus"],
              links=fixture_dfs["links"], robots=fixture_dfs["robots"],
              seeds=fixture_dfs["seeds"], n_rounds=2)
    cols = ["round", "urlhash", "status", "phash", "caption_ok"]
    r1 = sorted(tuple(r) for r in Catalog(s1).table("results", "round").read(spark)
                .select(*cols).collect())
    r2 = sorted(tuple(r) for r in Catalog(s2).table("results", "round").read(spark)
                .select(*cols).collect())
    assert r1 == r2 and r1


def test_drained_frontier_idle_rounds(spark, crawl_cfg, tmp_path_factory):
    """A crawl whose frontier fully drains must keep running idle
    rounds (scheduled=0), keep committing checkpoints, and still match
    the oracle — an empty frontier table reads as None in the snapshot
    store and used to crash the next round."""
    from hyperion_crawler_spark.synth import SynthConfig, gen_fixture

    from .oracle import run_oracle

    # tiny fixture with no links: the seed set exhausts in a few rounds
    fx = gen_fixture(SynthConfig(n_urls=30, n_seeds=30, n_hosts=3,
                                 max_fanout=0, private_frac=0.0))
    store = str(tmp_path_factory.mktemp("drain"))
    d = tmp_path_factory.mktemp("drain_fix")
    from hyperion_crawler_spark.synth import write_fixture_parquet
    write_fixture_parquet(fx, str(d))
    from hyperion_crawler_spark import schemas as S
    dfs = {n: spark.read.schema(getattr(S, n.upper())).parquet(f"{d}/{n}.parquet")
           for n in ["corpus", "seeds", "links", "robots"]}
    n_rounds = 10
    metrics = run_crawl(spark, store, crawl_cfg, corpus=dfs["corpus"],
                        links=dfs["links"], robots=dfs["robots"],
                        seeds=dfs["seeds"], n_rounds=n_rounds)
    fetch_rounds = [m for m in metrics if "scheduled" in m]
    assert len(fetch_rounds) == n_rounds, "idle rounds must not abort the loop"
    assert fetch_rounds[-1]["scheduled"] == 0, "frontier should have drained"
    cat = Catalog(store)
    assert cat.last_round() == n_rounds
    oracle = run_oracle(fx, crawl_cfg, n_rounds)
    res = cat.table("results", "round").read(spark)
    got = {(r["round"], r["urlhash"]): r["status"] for r in res.collect()}
    want = {(r["round"], r["urlhash"]): r["status"] for r in oracle.results}
    assert got == want


def test_image_neardup_pass_across_rounds(spark, tmp_path, crawl_cfg):
    """cfg.image_neardup_dist: fetched images pair against the round's
    own batch AND the crawl-wide pHash index. Planted: rounds fetch
    images with IDENTICAL pixels (dist 0) — two inside one round, one
    in a later round (cross-round via the index). The evidence table
    and the per-round stat record exactly those pairs; the phash index
    keeps the FIRST image as representative."""
    import dataclasses

    import pandas as pd

    from hyperion_crawler_spark import schemas as S
    from hyperion_crawler_spark.functions.images import (encode,
                                                         make_pixels,
                                                         phash64)
    from hyperion_crawler_spark.plans.loop import run_crawl
    from hyperion_crawler_spark.sources.tables import Catalog

    # The fetch gate forces honest content: ids must be the img\d{10}
    # shape, captions the exact "caption of <id> in <lang>" form
    # (_CAPTION_RE, plans/fetch.py), and lossless pixels must EQUAL
    # make_pixels(image_id) — so near-dups cannot be planted with
    # shared pixels under distinct ids (the r6 fixture's mistake:
    # every image quarantined, the pass saw zero rows). Instead the
    # dups are ids whose HONEST 32×32 images share a pHash: the
    # average-hash is gradient-dominated and the id-seeded noise never
    # flips a 4×4-block cell for these ids (dist 0 verified below);
    # the solo ids sit ≥ 3 bits away from everything else here.
    DUP1, DUP2, DUP3 = "img0000000005", "img0000000006", "img0000000012"
    SOLO1, SOLO2 = "img0000000003", "img0000000004"
    px = {iid: make_pixels(iid, 32, 32)
          for iid in (DUP1, DUP2, DUP3, SOLO1, SOLO2)}
    assert phash64(px[DUP1]) == phash64(px[DUP2]) == phash64(px[DUP3])
    corp_rows = [
        (iid, encode(p, "hypng"), 32, 32, "hypng",
         f"caption of {iid} in en", phash64(p))
        for iid, p in px.items()]
    corpus = spark.createDataFrame(
        pd.DataFrame(corp_rows, columns=["image_id", "bytes", "w", "h",
                                         "fmt", "caption", "phash"]),
        schema=S.CORPUS)
    # seeds fetch the three r1 images; r1 pages link to the r2 images
    seeds = spark.createDataFrame(
        [(f"https://h0.example/{s}", iid, 0.9)
         for s, iid in [("dup1", DUP1), ("dup2", DUP2), ("solo", SOLO1)]],
        "url string, image_id string, priority double")
    links = spark.createDataFrame(
        [(f"https://h0.example/dup1", f"https://h0.example/r2-{s}",
          iid, 0.5) for s, iid in [("dup3", DUP3), ("solo", SOLO2)]],
        "src_url string, dst_url string, dst_image_id string, "
        "dst_priority double")
    robots = spark.createDataFrame([], S.ROBOTS)

    cfg = dataclasses.replace(crawl_cfg, image_neardup_dist=2)
    store = str(tmp_path / "store")
    metrics = run_crawl(spark, store, cfg, corpus, links, robots,
                        seeds, n_rounds=2)
    per_round = {m["round"]: m for m in metrics if m["round"] > 0}
    assert per_round[1]["image_neardups"] == 1      # dup1 × dup2
    assert per_round[2]["image_neardups"] == 1      # dup3 × index rep

    cat = Catalog(store)
    nd = {(r["image_id"], r["dup_of"], r["dist"], r["round"])
          for r in cat.table("image_neardups").read(spark).collect()}
    assert (DUP1, DUP2, 0, 1) in nd
    assert (DUP3, DUP1, 0, 2) in nd                 # first-wins rep
    assert len(nd) == 2
    idx = {r["h"]: r["image_id"]
           for r in cat.table("phash_index").read(spark).collect()}
    assert idx[phash64(px[DUP1])] == DUP1           # rep never replaced
    assert len(idx) == 3                            # three distinct hashes
