"""One crawl round — the engine's core logical plan (SURVEY §3 mapping).

round k: load frontier snapshot → filter eligible (P9) → robots +
salted per-host top-k (W2) → fetch/validate (mapInPandas over the
image+caption corpus) → link expansion → canonicalize+hash new URLs
(F17) → first-wins batch dedup (A4) → Bloom seen probe+update
(applyInPandas) → MERGE frontier / append seen_filters delta blobs /
append results + lineage → snapshot commit = checkpoint.

This replaces the reference's E→T→L HTTP round trip
(/root/reference/workflows/krx_etl_workflow.yaml:30-189 — the full row
payload is serialized as JSON between phases, its main scalability
ceiling): here data stays on executors across all stages; rows cross
node boundaries only at the two explicit shuffles (host top-k window;
seen-shard cogroup) plus the corpus join.

Timeline: 1 round = 60 s of politeness budget (ROUND_SECONDS);
``next_fetch_ts`` is in these synthetic seconds. Retry backoff
``5·2^retries`` s with ≤3 retries mirrors the reference workflow
(/root/reference/workflows/krx_etl_workflow.yaml:43-47).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..operators.politeness import ROUND_SECONDS, schedule_round
from ..state.seen import probe_and_update
from ..functions.urls import canonicalize_df, host_expr
from .fetch import fetch_and_validate

FRONTIER_COLS = ["urlhash", "url", "host", "image_id", "shard", "priority",
                 "status", "retry_count", "next_fetch_ts", "discovered_round"]


def canonical_url_rows(raw: DataFrame, url_col: str, image_col: str, priority_col: str,
                       cfg: CrawlConfig, dedup_order: list) -> DataFrame:
    """Canonicalize → hash → shard → first-wins dedup on urlhash.

    First-wins semantics mirror the reference's batch dedup
    (/root/reference/api/src/etl/base/loader.py:188-209: first
    occurrence of the key tuple wins) with a deterministic total order
    (``dedup_order`` — priority always descends first, remaining
    tiebreaks ascend) replacing arrival order, so results are identical
    under any partitioning.

    Scale shape: canonicalization takes the JVM fast path for
    already-canonical rows (canonicalize_df); dedup is a ``min_by``
    HASH AGGREGATE on urlhash — map-side combinable, one shuffle — not
    a window (a row_number window over a mostly-unique key sorts the
    whole frontier for nothing; measured 6× slower at 2M URLs).

    ``dedup_order``: list of Columns; the FIRST must be the priority
    column (descending semantics), the rest ascending tiebreaks.
    """
    canon = canonicalize_df(raw.withColumn("url", F.col(url_col)), "url")
    keyed = canon.select(
        F.xxhash64("url").alias("urlhash"),
        F.col("url"),
        host_expr(F.col("url")).alias("host"),
        F.pmod(F.xxhash64("url"), F.lit(cfg.n_shards)).cast("int").alias("shard"),
        F.col(image_col).alias("image_id"),
        F.col(priority_col).alias("priority"),
        F.struct((-F.col(priority_col)).alias("_o0"),
                 *[c.alias(f"_o{i+1}") for i, c in enumerate(dedup_order)]).alias("_ord"),
    )
    picked = keyed.groupBy("urlhash").agg(
        F.min_by(F.struct("url", "host", "shard", "image_id", "priority"), F.col("_ord")).alias("_r")
    )
    return picked.select("urlhash", "_r.url", "_r.host", "_r.image_id", "_r.shard", "_r.priority")


def _frontier_table(cat):
    """Frontier = the priority queue, materialized SORTED within each
    shard file by (priority DESC, urlhash ASC) — Iceberg sort-order
    analog (north_rule). Sort Columns built lazily (needs a live
    SparkContext).

    Merge-on-read: a round's frontier MERGE appends O(changed-rows)
    delta files (new/retried URLs + tombstones for retired ones)
    instead of rewriting the whole pending queue — at a 10^10-row
    queue CoW wrote 10^10 rows to change ~10^5. Deltas fold into
    fresh sorted base files every ``compact_after`` rounds, which also
    re-materializes the queue in priority order. The shard partition
    column is pmod(urlhash, n_shards) — a pure function of the merge
    key, as merge-on-read pruning requires."""
    return cat.table("frontier", "shard",
                     sort_cols=[F.col("priority").desc(), F.col("urlhash").asc()],
                     merge_on_read=True)


def init_frontier(spark: SparkSession, cat, cfg: CrawlConfig, seeds: DataFrame) -> dict:
    """Round -1 bootstrap: seeds → canonical frontier rows, all marked
    seen (a URL is 'seen' once it enters the frontier — never re-added).

    Seeds MERGE ONTO the store's current state (probed against the
    current seen filters) rather than overwriting it, so a store the
    continuous ingest daemon already streamed seeds into is extended,
    not clobbered — the daemon may legally start before the crawl's
    first round (r5; before, the bootstrap overwrote and therefore had
    to refuse any pre-existing state). On a virgin store the merge IS
    the first write, byte-identical to the old overwrite. The round-0
    entry carries a ``_seeded`` marker so ``run_crawl`` can tell a
    bootstrapped store from one that only ever saw daemon ingestion.

    Still refuses on a store with committed CRAWL work (a crawled
    round, or a prior bootstrap): re-seeding those is a caller bug."""
    rounds = cat.completed_rounds()
    if rounds and (max(rounds) > 0 or rounds.get(0, {}).get("_seeded")):
        raise ValueError(
            "init_frontier on a store with committed crawl rounds "
            f"(last_round={cat.last_round()}); it would re-seed the "
            "existing frontier/seen state. Resume with run_crawl, or "
            "point at a fresh store directory.")
    frontier_t = _frontier_table(cat)
    seen_t = cat.table("seen_filters", "shard")
    seen_exact_t = cat.table("seen_exact", "shard")
    base = cat.base_versions()

    cand = canonical_url_rows(
        seeds, "url", "image_id", "priority", cfg, [F.col("image_id")],
    )
    current = seen_t.read(spark, version=base.get("seen_filters"))
    if current is None:
        current = spark.createDataFrame(
            [], "shard int, filter_bytes binary, n_items long")
    unseen, filters, probe_cache = probe_and_update(cand, current, cfg)
    rows = (
        unseen.withColumn("status", F.lit("queued"))
        .withColumn("retry_count", F.lit(0))
        .withColumn("next_fetch_ts", F.lit(0).cast("long"))
        .withColumn("discovered_round", F.lit(0))
        .select(*FRONTIER_COLS)
    )
    versions = {
        "frontier": frontier_t.merge(spark, rows, ["urlhash"],
                                     base_version=base.get("frontier")),
        "seen_filters": seen_t.append(filters,
                                      base_version=base.get("seen_filters", 0)),
        "_seeded": 1,
    }
    if cfg.exact_seen_shadow:
        versions["seen_exact"] = seen_exact_t.append(
            unseen.select("urlhash", "shard"),
            base_version=base.get("seen_exact", 0))
    cat.commit_round(0, versions, fold=True)
    n = rows.count()
    probe_cache.unpersist()
    return {"round": 0, "seeded": n}


def run_round(spark: SparkSession, cat, cfg: CrawlConfig, round_idx: int,
              corpus: DataFrame | None, links: DataFrame, robots: DataFrame,
              corpus_table=None, corpus_buckets: int = 0) -> dict:
    """Execute crawl round ``round_idx`` (≥1) and commit its snapshot.

    ``corpus`` may be a plain DataFrame (test scale), or pass
    ``corpus_table`` (a SnapshotTable partitioned by ``img_bucket``,
    written via ``fetch.write_bucketed_corpus``) + ``corpus_buckets``:
    the fetch then reads ONLY payload files whose bucket the round's
    schedule touches — manifest-level pruning of the 100 TB table."""
    frontier_t = _frontier_table(cat)
    seen_t = cat.table("seen_filters", "shard")
    seen_exact_t = cat.table("seen_exact", "shard")
    results_t = cat.table("results", "round")
    lineage_t = cat.table("lineage", "round", schema_evolving=True)

    timing: dict[str, float] = {}

    def _mark(label, t0):
        timing[label] = round(time.perf_counter() - t0, 2)
        return time.perf_counter()

    t_round0 = time.perf_counter()
    t = t_round0
    # bind ALL reads and write-bases to the last checkpointed versions:
    # a redo after a mid-round crash must not see (or compound) the
    # crashed attempt's uncheckpointed snapshots
    base = cat.base_versions()
    round_ts = int(round_idx * ROUND_SECONDS)
    frontier = frontier_t.read(spark, version=base.get("frontier"))
    if frontier is None:
        # fully-drained frontier (every URL terminal): the round is
        # idle but must still run — retries may be waiting in later
        # rounds after a redo, and the checkpoint must advance
        from .. import schemas as S

        frontier = spark.createDataFrame([], S.FRONTIER)
    eligible = frontier.filter(
        (F.col("status") == "queued") & (F.col("next_fetch_ts") <= round_ts)
    )

    scheduled, excluded = schedule_round(eligible, robots, cfg)
    scheduled = scheduled.persist()

    if corpus_table is not None:
        from .fetch import read_corpus_for_schedule

        corpus = read_corpus_for_schedule(spark, corpus_table, scheduled,
                                          corpus_buckets or None)
    results = fetch_and_validate(scheduled, corpus).persist()
    fetched = results.filter(F.col("status") == "fetched")

    # --- link expansion → new frontier candidates -------------------
    discoveries_raw = fetched.select("url").join(
        links, fetched["url"] == links["src_url"], "inner"
    ).select(
        F.col("dst_url").alias("_raw_url"),
        F.col("dst_image_id").alias("_image_id"),
        F.col("dst_priority").alias("_priority"),
        F.col("src_url").alias("_src"),
    )
    cand = canonical_url_rows(
        discoveries_raw, "_raw_url", "_image_id", "_priority", cfg,
        [F.col("_src"), F.col("_image_id")],
    ).persist()

    current_filters = seen_t.read(spark, version=base.get("seen_filters"))
    if current_filters is None:
        current_filters = spark.createDataFrame([], "shard int, filter_bytes binary, n_items long")
    unseen, new_filters, probe_cache = probe_and_update(cand, current_filters, cfg)
    unseen = unseen.persist()

    # --- frontier state transitions ----------------------------------
    # The frontier holds PENDING work only (the 10^10-scale invariant:
    # each round's MERGE cost ∝ active queue, not all-URLs-ever).
    # Terminal rows — fetched, quarantined, retry-exhausted, robots-
    # excluded — are DELETEd from the frontier and appended to the
    # append-only `archive`; the seen filter already guarantees they
    # can never re-enter.
    backoff = (F.lit(cfg.backoff_initial)
               * F.pow(F.lit(float(cfg.backoff_multiplier)), F.col("retry_count"))).cast("long")
    res_updates = results.select(
        "urlhash", "url", "host", "image_id", "shard", "priority",
        F.when(F.col("status") == "fetched", F.lit("fetched"))
         .when(F.col("status") == "quarantined", F.lit("quarantined"))
         .when(F.col("retry_count") + 1 > cfg.max_retries, F.lit("failed"))
         .otherwise(F.lit("queued")).alias("status"),
        F.when(F.col("status") == "failed", F.col("retry_count") + 1)
         .otherwise(F.col("retry_count")).alias("retry_count"),
        F.when(F.col("status") == "failed", F.lit(round_ts) + backoff)
         .otherwise(F.lit(round_ts)).cast("long").alias("next_fetch_ts"),
        "discovered_round",
    ).persist()
    excl_updates = excluded.select(
        "urlhash", "url", "host", "image_id", "shard", "priority",
        F.lit("excluded").alias("status"), "retry_count",
        "next_fetch_ts", "discovered_round",
    )
    new_rows = unseen.select(
        "urlhash", "url", "host", "image_id", "shard", "priority",
        F.lit("queued").alias("status"), F.lit(0).alias("retry_count"),
        F.lit(0).cast("long").alias("next_fetch_ts"), F.lit(round_idx).alias("discovered_round"),
    )
    retry_rows = res_updates.filter(F.col("status") == "queued")
    terminal_rows = (res_updates.filter(F.col("status") != "queued")
                     .unionByName(excl_updates.select(*FRONTIER_COLS)))
    # merge() persists its source internally; archive_rows stays pinned
    # here because it also feeds the archive append below
    frontier_merge = (
        retry_rows.select(*FRONTIER_COLS)
        .unionByName(new_rows.select(*FRONTIER_COLS))
    )
    archive_rows = terminal_rows.select(*FRONTIER_COLS) \
        .withColumn("archived_round", F.lit(round_idx)).persist()

    # --- metrics: ONE scan of the results cache produces BOTH the
    # per-partition lineage rows (collected — bounded by partition
    # count) and, summed driver-side, the round totals. This is the
    # action that materializes the fetch/validate cache, so it runs
    # alone; the discovery-side counts live in the commit phase below,
    # overlapped with the results commit.
    t = _mark("plan_build", t)
    lin_rows = (
        results.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count("*").alias("urls_scheduled"),
            F.sum(F.when(F.col("status") == "fetched", 1).otherwise(0)).alias("fetched"),
            F.sum(F.when(F.col("status") == "failed", 1).otherwise(0)).alias("failed"),
        ).collect()
    )
    n_sched = sum(r["urls_scheduled"] for r in lin_rows)
    n_fetched = sum(r["fetched"] for r in lin_rows)
    n_failed = sum(r["failed"] for r in lin_rows)
    t = _mark("compute_metrics", t)

    # --- optional image near-dup pass (cfg.image_neardup_dist) ------
    # This round's fetched pHashes pair against each other AND the
    # crawl-wide (phash → first image_id) index within Hamming
    # distance N — the LAION-style image-dedup step as CRAWL STATE:
    # work per round ∝ this round's images × block collisions, never
    # a rescan of all images ever fetched. The index is merge-on-read
    # keyed by phash (O(new) delta appends); pairs are evidence rows
    # in `image_neardups`, committed inside the round checkpoint so a
    # redo reproduces them exactly.
    nd_rows = None
    n_neardups = 0
    if cfg.image_neardup_dist > 0:
        from ..operators.dedup import hamming_join, hamming_pairs

        phash_t = cat.table("phash_index", "shard", merge_on_read=True)
        neardups_t = cat.table("image_neardups", "round")
        new_ph = results.filter(F.col("status") == "fetched") \
            .select(F.col("image_id").alias("id"), F.col("phash").alias("h"))
        nd_handles: list = []
        intra = hamming_pairs(new_ph, "id", "h",
                              max_dist=cfg.image_neardup_dist,
                              handles=nd_handles) \
            .select(F.col("id1").alias("image_id"),
                    F.col("id2").alias("dup_of"), "dist")
        idx_df = phash_t.read(spark, version=base.get("phash_index", 0))
        if idx_df is not None:
            # hamming_join reads (id, h) on both sides; the index
            # stores (h, shard, image_id) — present it under those
            # names
            cross = hamming_join(
                new_ph,
                idx_df.select(F.col("image_id").alias("id"), "h"),
                max_dist=cfg.image_neardup_dist,
                id_col="id", hash_col="h", handles=nd_handles) \
                .withColumnRenamed("left_id", "image_id") \
                .withColumnRenamed("right_id", "dup_of")
            intra = intra.unionByName(cross)
        nd_rows = (intra.withColumn("round", F.lit(round_idx))
                   .select("image_id", "dup_of",
                           F.col("dist").cast("int").alias("dist"), "round")
                   .persist())
        n_neardups = nd_rows.count()
        for h in nd_handles:
            h.unpersist()

    # --- commits (snapshot per table; round commit = checkpoint) ----
    # Independent tables commit IN PARALLEL: every input cache is
    # materialized above, so the five jobs only scan caches, and Spark
    # schedules them concurrently across the executor cores a single
    # sequential job leaves idle (measured ~1.6x on the full round at
    # sf0.1). Each table still gets exactly one deterministic commit —
    # resume/redo semantics are untouched; the optimistic commit
    # protocol makes concurrent versioning safe by construction.
    from concurrent.futures import ThreadPoolExecutor

    versions = {}

    def _commit_results():
        return results_t.append(
            results.select("urlhash", "url", "host", "image_id",
                           F.lit(round_idx).alias("round"), "status",
                           "psnr_db", "caption_ok", "phash", "caption"),
            base_version=base.get("results", 0))

    def _commit_frontier():
        # retries/new rows and terminal rows partition one result set
        # (status != 'queued' exactly complements), and archive_rows
        # carries one row per urlhash — both merge fast-path flags hold
        return frontier_t.merge(
            spark, frontier_merge, ["urlhash"],
            delete_keys=archive_rows.select("urlhash", "shard"),
            base_version=base.get("frontier"),
            disjoint_delete_keys=True, unique_delete_keys=True)

    def _commit_archive():
        return cat.table("archive", "shard").append(
            archive_rows, base_version=base.get("archive", 0))

    def _commit_seen():
        # append-only delta blobs (state/seen.py r5): commutes with a
        # concurrent ingest batch's append at the file level, so no
        # writer's bloom bits can be lost to a row-level last-writer-
        # wins replacement
        return seen_t.append(new_filters,
                             base_version=base.get("seen_filters", 0))

    def _commit_seen_exact():
        return seen_exact_t.append(
            unseen.select("urlhash", "shard"),
            base_version=base.get("seen_exact", 0))

    jobs = {"frontier": _commit_frontier,
            "archive": _commit_archive, "seen_filters": _commit_seen}
    if cfg.exact_seen_shadow:
        jobs["seen_exact"] = _commit_seen_exact
    if cfg.image_neardup_dist > 0:
        def _commit_phash_index():
            # first-wins: an already-indexed phash keeps its original
            # representative (source rows win on match, so restrict to
            # hashes the index hasn't seen — the left_anti keeps the
            # merge source ∝ genuinely-new hashes)
            new_idx = (results.filter(F.col("status") == "fetched")
                       .groupBy(F.col("phash").alias("h"))
                       .agg(F.min("image_id").alias("image_id"))
                       .withColumn("shard", F.pmod(F.xxhash64("h"),
                                                   F.lit(cfg.n_shards))
                                   .cast("int")))
            prior = phash_t.read(spark, version=base.get("phash_index", 0))
            if prior is not None:
                new_idx = new_idx.join(prior.select("h"), "h", "left_anti")
            return phash_t.merge(spark, new_idx.select("h", "shard",
                                                       "image_id"), ["h"],
                                 base_version=base.get("phash_index", 0))

        def _commit_neardups():
            return neardups_t.append(nd_rows,
                                     base_version=base.get("image_neardups",
                                                           0))

        jobs["phash_index"] = _commit_phash_index
        jobs["image_neardups"] = _commit_neardups
    with ThreadPoolExecutor(max_workers=1 + len(jobs)) as pool:
        # the results commit only scans the results cache (materialized
        # by lin_rows above), so it runs IN PARALLEL with the discovery-
        # side aggregate that materializes every cache the remaining
        # commits read (cand, probe/unseen, res_updates via
        # archive_rows) — the commit hides under the probe's shadow.
        # (r7 note: submitting the frontier merge — the commit phase's
        # long pole — ahead of this aggregate was measured and NOT
        # kept: both then compute the same un-materialized cached
        # partitions concurrently and the duplicated work beat the
        # overlap, 6.7 → 7.7 s commit phase.)
        fut_results = pool.submit(_commit_results)
        mrow = (cand.agg(F.count("*").alias("n_cand"))
                .crossJoin(unseen.agg(F.count("*").alias("n_unseen")))
                .crossJoin(archive_rows.agg(F.count("*").alias("n_arch"))).first())
        n_cand, n_unseen = mrow["n_cand"], mrow["n_unseen"]
        futs = {name: pool.submit(fn) for name, fn in jobs.items()}
        versions["results"] = fut_results.result()
        for name, fut in futs.items():
            versions[name] = fut.result()
    t = _mark("commit_tables", t)
    lineage = spark.createDataFrame(
        [(round_idx, r["partition_id"], "success", r["urls_scheduled"],
          r["fetched"], r["failed"], int(n_cand - n_unseen))
         for r in lin_rows],
        "round int, partition_id int, status string, urls_scheduled long, "
        "fetched long, failed long, deduped long")
    if cfg.rescore_every:
        # Incremental fetched-source set (seen-filter pattern): each
        # round APPENDS its fetched URLs (a URL is fetched in exactly
        # one round — terminal status — so the table is a set). The
        # rescore below reads THIS small set, never the full results
        # history: the round-2 verdict's unbounded
        # `results_t.read(all rounds)` scan per rescore is gone.
        fetched_srcs_t = cat.table("fetched_srcs", "round")
        fetched_now = fetched.select(F.col("url").alias("src_url"),
                                     F.lit(round_idx).alias("round"))
        # coverage watermark: each append records the highest round it
        # covers in the manifest meta. If rescoring was disabled for
        # any earlier span (enabled mid-crawl, OR toggled off and on
        # again), the gap between the watermark and this round is
        # backfilled once from the results history — otherwise
        # known_links would silently lose those rounds' fetched URLs.
        fs_ver = base.get("fetched_srcs", 0)
        covered = 0
        if fs_ver:
            covered = (fetched_srcs_t._manifest(fs_ver)
                       .get("meta", {}).get("upto_round", 0))
        if covered < round_idx - 1 and base.get("results", 0) > 0:
            prev = results_t.read(spark, version=base.get("results", 0))
            if prev is not None:
                fetched_now = (prev.filter((F.col("status") == "fetched")
                                           & (F.col("round") > covered))
                               .select(F.col("url").alias("src_url"), "round")
                               .unionByName(fetched_now))
        versions["fetched_srcs"] = fetched_srcs_t.append(
            fetched_now, meta={"upto_round": round_idx}, base_version=fs_ver)
    if cfg.rescore_every and round_idx % cfg.rescore_every == 0:
        # PageRank priority re-scoring over the ENGINE-KNOWN link graph
        # (edges whose src this crawl has fetched). Committed as part of
        # THIS round's checkpoint: a crash before commit_round orphans
        # the rescored snapshot and the redo reproduces it exactly.
        from ..operators.graph import rescore_frontier_delta

        fetched_srcs = fetched_srcs_t.read(
            spark, version=versions["fetched_srcs"])
        if fetched_srcs is None:
            fetched_srcs = spark.createDataFrame([], "src_url string, round int")
        known_links = links.join(fetched_srcs.select("src_url").distinct(), "src_url")
        fr_now = frontier_t.read(spark, version=versions["frontier"])
        if fr_now is not None:
            # Commit ONLY the rows the blend moved, through the
            # merge-on-read frontier merge — O(known-graph) delta
            # bytes per rescore instead of rewriting the whole
            # pending queue (a 10^10-row table must not be rewritten
            # to change the graph-adjacent slice). Compaction re-sorts
            # the queue as usual.
            pinned: list = []
            moved = rescore_frontier_delta(
                fr_now, known_links, iters=2, weight=cfg.rescore_weight,
                handles=pinned)
            versions["frontier"] = frontier_t.merge(
                spark, moved.select(*FRONTIER_COLS), ["urlhash"],
                base_version=versions["frontier"])
            for h in pinned:  # merge() materialized the blend
                h.unpersist()
        t = _mark("rescore_priority", t)
    if cfg.fold_seen_every and round_idx % cfg.fold_seen_every == 0:
        # OR-compact the append-only seen deltas back to one blob per
        # shard (state/seen.py) so the probe's read stays O(shards).
        # Committed inside THIS round's checkpoint: a crash before
        # commit_round orphans the folded snapshot and the redo
        # reproduces it (fold of the same deltas is deterministic).
        from ..state.seen import fold_filters

        fv = fold_filters(spark, seen_t)
        if fv is not None:
            versions["seen_filters"] = fv
        t = _mark("fold_seen", t)
    # task-log timing (reference CrawlerTaskLog start/end/execution_time,
    # api/src/models/task_log.py:21-23): round wall time + the per-phase
    # seconds measured so far, stamped into the lineage row at append
    # time. Lineage is operational telemetry — it is NOT part of the
    # bit-identical resume contract (test_resume compares frontier/
    # archive/seen/results, never lineage).
    import json as _json

    exec_time = round(time.perf_counter() - t_round0, 3)
    lineage_row = (lineage
                   .withColumn("execution_time", F.lit(float(exec_time)))
                   .withColumn("params", F.lit(_json.dumps(
                       {"round": round_idx, "phase_seconds": timing},
                       sort_keys=True))))
    versions["lineage"] = lineage_t.append(lineage_row, base_version=base.get("lineage", 0))
    t = _mark("write_lineage", t)
    cat.commit_round(round_idx, versions)

    for df in (scheduled, results, cand, unseen, probe_cache,
               res_updates, archive_rows):
        df.unpersist()
    if nd_rows is not None:
        nd_rows.unpersist()
    out = {
        "round": round_idx, "scheduled": n_sched, "fetched": n_fetched,
        "failed": n_failed, "discovered": n_cand, "new_urls": n_unseen,
        "deduped": n_cand - n_unseen, "timing": timing,
    }
    if cfg.image_neardup_dist > 0:
        out["image_neardups"] = n_neardups
    return out
