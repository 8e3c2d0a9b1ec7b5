"""Physical-plan quality gates (SURVEY §7 'no per-row Python' +
pushdown/broadcast discipline). These are the .explain() properties the
engine is designed around; regressions here are scale bugs even when
results stay correct."""

import glob
import re

from pyspark.sql import functions as F

from hyperion_crawler_spark.config import CrawlConfig
from hyperion_crawler_spark.plans.round import canonical_url_rows
from hyperion_crawler_spark.synth import gen_frontier_distributed

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    df = (spark.read.parquet(f"{SF}/lineitem.parquet")
          .filter(F.col("l_shipdate") < "1996-01-01")
          .select("l_orderkey", "l_quantity"))
    p = _plan(df)
    assert "PushedFilters" in p and "l_shipdate" in p.split("PushedFilters", 1)[1][:200]


def test_column_pruning_reaches_scan(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_quantity")
    m = re.search(r"ReadSchema: struct<([^>]*)>", _plan(df))
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_orderkey", "l_quantity"}, f"scan reads {cols}"


def test_fk_check_uses_broadcast_join(spark):
    import __spark_entry__ as E

    p = _plan(E.q13_fk_semi_anti(spark, SF))
    assert "BroadcastHashJoin" in p


def test_scheduling_plan_has_no_row_python(spark, crawl_cfg):
    fr = gen_frontier_distributed(spark, 1000, 50)
    cand = canonical_url_rows(fr, "url", "image_id", "priority", crawl_cfg,
                              [F.col("image_id")])
    p = _plan(cand)
    assert "BatchEvalPython" not in p, "row-at-a-time Python UDF in the hot path"
    # canonicalizer is Arrow-vectorized and only on the messy branch
    assert "ArrowEvalPython" in p


def test_dedup_is_single_exchange_hash_agg(spark, crawl_cfg):
    fr = gen_frontier_distributed(spark, 1000, 50)
    cand = canonical_url_rows(fr, "url", "image_id", "priority", crawl_cfg,
                              [F.col("image_id")])
    p = _plan(cand)
    assert p.count("Exchange") == 1, "first-wins dedup must be one shuffle"
    # min_by over a struct value lowers to SortAggregate — what matters
    # is the MAP-SIDE PARTIAL aggregation before the exchange (narrow
    # shuffle) and that no global Window sort crept back in
    assert "partial_min_by" in p, "map-side combine missing"
    assert "Window" not in p, "dedup regressed to a window sort"


def test_no_row_udfs_in_source_tree():
    """The reference transforms per-row in Python (its whole
    transformer.py); this engine bans that: no F.udf / @udf outside
    pandas_udf in the package."""
    bad = []
    for path in glob.glob("hyperion_crawler_spark/**/*.py", recursive=True):
        src = open(path).read()
        for i, line in enumerate(src.splitlines(), 1):
            if re.search(r"\bF\.udf\(|@udf\b|\budf\(lambda", line):
                bad.append(f"{path}:{i}")
    assert not bad, f"row-at-a-time UDFs found: {bad}"


def test_embedding_topk_broadcasts_queries(spark):
    """q20's scoring must never shuffle the corpus by a pair key: the
    query set rides to the executors as a broadcast — a task broadcast
    into the scoring kernel on the dim-known path (r7; plan shows
    MapInPandas and no join at all), or a broadcast join relation on
    the fold path. A SortMergeJoin/ShuffledHashJoin here is the
    scale bug this gate exists for."""
    import __spark_entry__ as E
    from hyperion_crawler_spark.operators import similarity as SIM

    p = _plan(E.q20_embedding_topk(spark, SF))
    assert "MapInPandas" in p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    # the dim-agnostic fold form keeps the broadcast-NL-join shape
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    pf = _plan(SIM.brute_force_topk(e.filter(F.col("vec_id") % 100 == 0), e))
    assert "BroadcastNestedLoopJoin" in pf or "BroadcastHashJoin" in pf


def _formatted_plan(df) -> str:
    jvm = df.sparkSession.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def _scheduled_shape(fixture_dfs):
    seeds = fixture_dfs["seeds"]
    return seeds.select(
        F.xxhash64("url").alias("urlhash"), "url",
        F.lower(F.regexp_extract("url", r"://([^/:]+)", 1)).alias("host"),
        "image_id", F.lit(0).alias("retry_count"), "priority",
        F.lit(0).alias("shard"), F.lit(0).alias("discovered_round"))


def test_fetch_plan_never_shuffles_corpus(spark, fixture_dfs):
    """The 100 TB gate: the corpus payload (BinaryType ``bytes``) must
    never cross an Exchange — the schedule is broadcast into an inner
    BroadcastHashJoin and the anti-join projects only image_id."""
    from hyperion_crawler_spark.plans.fetch import fetch_and_validate

    df = fetch_and_validate(_scheduled_shape(fixture_dfs), fixture_dfs["corpus"])
    p = _formatted_plan(df)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    for block in p.split("\n\n"):
        first = block.strip().splitlines()[0] if block.strip() else ""
        if re.match(r"\(\d+\) .*Exchange", first):
            assert "bytes#" not in block, f"payload crosses an Exchange:\n{block}"


def test_bucketed_corpus_read_prunes_files(spark, fixture_dfs, tmp_path):
    """Storage-partition pruning: a schedule touching a few buckets must
    read only those buckets' payload files from the corpus table."""
    from hyperion_crawler_spark.plans import fetch as FT
    from hyperion_crawler_spark.sources.tables import SnapshotTable

    n_buckets = 16
    t = SnapshotTable(str(tmp_path), "corpus", "img_bucket")
    FT.write_bucketed_corpus(t, fixture_dfs["corpus"], n_buckets)
    sched = fixture_dfs["corpus"].select("image_id").orderBy("image_id").limit(5)
    touched = {r[0] for r in sched.select(
        FT.corpus_bucket(F.col("image_id"), n_buckets).alias("b")).distinct().collect()}
    pruned = FT.read_corpus_for_schedule(spark, t, sched, n_buckets)
    files = pruned.inputFiles()
    all_files = t.read(spark).inputFiles()
    assert files and len(files) < len(all_files), "no file skipping happened"
    for f in files:
        m = re.search(r"_pv=(\d+)", f)
        assert m and int(m.group(1)) in touched, f"cold file read: {f}"
    assert pruned.join(sched, "image_id", "left_semi").count() == 5


def test_bucketed_corpus_modulus_is_persisted_and_guarded(spark, fixture_dfs, tmp_path):
    """The bucket modulus lives in the snapshot meta: a resume that
    passes a different --corpus-buckets must hard-error (mispruning
    would silently quarantine scheduled URLs), and omitting it derives
    the stored value."""
    import pytest

    from hyperion_crawler_spark.plans import fetch as FT
    from hyperion_crawler_spark.sources.tables import SnapshotTable

    t = SnapshotTable(str(tmp_path), "corpus", "img_bucket")
    FT.write_bucketed_corpus(t, fixture_dfs["corpus"], 16)
    assert FT.corpus_bucket_count(t) == 16
    sched = fixture_dfs["corpus"].select("image_id").orderBy("image_id").limit(3)
    assert FT.read_corpus_for_schedule(spark, t, sched).count() > 0      # derived
    assert FT.read_corpus_for_schedule(spark, t, sched, 16).count() > 0  # matching
    with pytest.raises(ValueError, match="bucketed with 16"):
        FT.read_corpus_for_schedule(spark, t, sched, 8)
    # un-bucketed table (no meta) is rejected up front
    t2 = SnapshotTable(str(tmp_path), "plain", "img_bucket")
    t2.overwrite(fixture_dfs["corpus"].withColumn(
        "img_bucket", FT.corpus_bucket(F.col("image_id"), 4)))
    with pytest.raises(ValueError, match="no corpus_buckets meta"):
        FT.read_corpus_for_schedule(spark, t2, sched)


def test_exact_dedup_is_minby_agg_not_window(spark):
    """VERDICT r2 #8: exact_dedup must use the single-exchange min_by
    hash-agg shape (digests are mostly unique — a window sorts the
    whole corpus for nothing)."""
    from hyperion_crawler_spark.operators.dedup import exact_dedup

    docs = spark.createDataFrame(
        [(i, f"text {i % 7}") for i in range(100)], "doc_id long, text string")
    p = _plan(exact_dedup(docs, "doc_id", "text"))
    assert "Window" not in p, "exact_dedup regressed to a window sort"
    assert "partial_min_by" in p, "map-side combine missing"


def test_fetch_broadcast_guard_falls_back_to_shuffle(spark, fixture_dfs, crawl_cfg):
    """ADVICE r2: above the row cap the schedule must NOT be broadcast
    (Spark's 8GB/512M-row broadcast hard limit would hard-fail the
    round) — and the fallback must produce identical results."""
    from hyperion_crawler_spark.plans.fetch import fetch_and_validate
    from hyperion_crawler_spark.plans.round import canonical_url_rows
    from hyperion_crawler_spark.operators.politeness import schedule_round

    frontier = canonical_url_rows(
        fixture_dfs["seeds"], "url", "image_id", "priority", crawl_cfg,
        [F.col("image_id")]).withColumn("retry_count", F.lit(0)) \
        .withColumn("discovered_round", F.lit(0)) \
        .withColumn("status", F.lit("queued")) \
        .withColumn("next_fetch_ts", F.lit(0).cast("long"))
    sched, _ = schedule_round(frontier, fixture_dfs["robots"], crawl_cfg)
    sched = sched.persist()
    try:
        normal = fetch_and_validate(sched, fixture_dfs["corpus"])
        fallback = fetch_and_validate(sched, fixture_dfs["corpus"],
                                      broadcast_row_cap=0)
        # the fallback drops the explicit broadcast hint (AQE may still
        # auto-broadcast a small schedule at test scale — the guard is
        # about not FORCING a broadcast past the hard limit); results
        # must be identical either way
        assert sorted(map(tuple, normal.collect())) == \
            sorted(map(tuple, fallback.collect()))
    finally:
        sched.unpersist()
