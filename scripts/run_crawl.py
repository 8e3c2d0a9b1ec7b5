"""CLI crawl driver — the spark-submit entry point (north_rule ship
vehicle).

Usage::

    spark-submit --py-files hyperion_crawler_spark.zip scripts/run_crawl.py \
        --fixture-dir /path/to/fixture --store /path/to/store --rounds 5

    # or synthesize the fixture on the fly:
    python scripts/run_crawl.py --synth-urls 400 --store /tmp/store --rounds 5

Prints one JSON metrics line per round. Re-running with the same
--store resumes from the last committed round (no-op if complete).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hyperion_crawler_spark import schemas as S  # noqa: E402
from hyperion_crawler_spark.config import CrawlConfig, get_spark  # noqa: E402
from hyperion_crawler_spark.plans.loop import run_crawl  # noqa: E402
from hyperion_crawler_spark.synth import SynthConfig, gen_fixture, write_fixture_parquet  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture-dir", help="dir with corpus/seeds/links/robots parquet")
    ap.add_argument("--synth-urls", type=int, default=0,
                    help="generate a fixture of N urls instead of --fixture-dir")
    ap.add_argument("--store", required=True, help="table-store root (checkpointed state)")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--shards", type=int, default=32)
    ap.add_argument("--master", default=None)
    ap.add_argument("--gc-keep-rounds", type=int, default=0,
                    help="after the crawl, expire snapshots not reachable "
                         "from the last N round checkpoints (0 = no GC)")
    ap.add_argument("--rewrite-small-mb", type=int, default=0,
                    help="with --gc-keep-rounds: before expiring, bin-pack "
                         "each table's base files smaller than this many MiB "
                         "into one file per partition value (append-table "
                         "file-count maintenance; 0 = off)")
    ap.add_argument("--corpus-buckets", type=int, default=0,
                    help="materialize the corpus as a bucketed SnapshotTable "
                         "with N buckets; each round prunes cold payload files")
    ap.add_argument("--rescore-every", type=int, default=0,
                    help="every N rounds, re-score frontier priority with "
                         "link-graph PageRank (checkpointed inside the round)")
    ap.add_argument("--fold-seen-every", type=int, default=16,
                    help="every N rounds, OR-compact the append-only seen "
                         "Bloom deltas to one blob per shard (0 = only the "
                         "GC pass folds)")
    ap.add_argument("--trap-max-depth", type=int, default=0,
                    help="exclude URLs with more than N path segments (0 = off)")
    ap.add_argument("--trap-max-params", type=int, default=0,
                    help="exclude URLs with more than N query params (0 = off)")
    ap.add_argument("--trap-max-repeat", type=int, default=0,
                    help="exclude URLs repeating one path segment more than "
                         "N times — loop/calendar-trap signal (0 = off)")
    args = ap.parse_args()

    spark = get_spark(app="hyperion-crawl", master=args.master)
    cfg = CrawlConfig(n_shards=args.shards, rescore_every=args.rescore_every,
                      fold_seen_every=args.fold_seen_every,
                      max_url_depth=args.trap_max_depth,
                      max_query_params=args.trap_max_params,
                      max_segment_repeat=args.trap_max_repeat)

    fixture_dir = args.fixture_dir
    if args.synth_urls:
        fixture_dir = tempfile.mkdtemp(prefix="hyperion_fixture_")
        fx = gen_fixture(SynthConfig(n_urls=args.synth_urls))
        if args.synth_urls >= 10_000:
            # the image encodes dominate big fixtures — generate the
            # corpus in parallel on executors instead of driver pandas
            from hyperion_crawler_spark.synth import gen_corpus_distributed

            del fx["corpus"]
            gen_corpus_distributed(spark, args.synth_urls).write.mode("overwrite") \
                .parquet(f"{fixture_dir}/corpus.parquet")
        write_fixture_parquet(fx, fixture_dir)
        print(json.dumps({"event": "fixture", "dir": fixture_dir, "n_urls": args.synth_urls}))
    if not fixture_dir:
        ap.error("need --fixture-dir or --synth-urls")

    dfs = {
        name: spark.read.schema(getattr(S, name.upper())).parquet(f"{fixture_dir}/{name}.parquet")
        for name in ["corpus", "seeds", "links", "robots"]
    }
    corpus_table = None
    corpus_buckets = 0
    if args.corpus_buckets:
        from hyperion_crawler_spark.plans.fetch import (
            corpus_bucket_count,
            write_bucketed_corpus,
        )
        from hyperion_crawler_spark.sources.tables import Catalog

        corpus_table = Catalog(args.store).table("corpus", "img_bucket")
        if corpus_table.is_empty():
            write_bucketed_corpus(corpus_table, dfs["corpus"], args.corpus_buckets)
        # a resumed store's table wins over the flag: pruning with a
        # different modulus than the files were written with would
        # silently turn scheduled URLs into corpus misses
        corpus_buckets = corpus_bucket_count(corpus_table)
        print(json.dumps({"event": "corpus_bucketed", "buckets": corpus_buckets,
                          "requested": args.corpus_buckets}))

    metrics = run_crawl(spark, args.store, cfg, dfs["corpus"], dfs["links"],
                        dfs["robots"], dfs["seeds"], n_rounds=args.rounds,
                        corpus_table=corpus_table, corpus_buckets=corpus_buckets)
    for m in metrics:
        print(json.dumps({"event": "round", **m}))
    if not metrics:
        print(json.dumps({"event": "resume_noop", "last_round": args.rounds}))
    if args.gc_keep_rounds:
        from hyperion_crawler_spark.sources.tables import Catalog
        from hyperion_crawler_spark.state.seen import fold_filters

        cat_gc = Catalog(args.store, writer="maintenance")
        seen_fold_v = fold_filters(spark, cat_gc.table("seen_filters", "shard"),
                                   require_checkpointed=True)
        if seen_fold_v is not None:
            # fold back to one blob per shard and fold the version into
            # the round log so resumes bind to the compacted snapshot.
            # require_checkpointed: a dirty head (crashed-attempt or
            # in-flight deltas) skips the fold — baking unlogged bits
            # into a logged blob would lose those URLs forever
            cat_gc.commit_round(cat_gc.last_round() or 0,
                                {"seen_filters": seen_fold_v}, fold=True)
        stats = cat_gc.expire(
            keep_rounds=args.gc_keep_rounds,
            spark=spark if args.rewrite_small_mb else None,
            rewrite_small_bytes=args.rewrite_small_mb << 20 or None)
        print(json.dumps({"event": "gc", "keep_rounds": args.gc_keep_rounds,
                          "rewrite_small_mb": args.rewrite_small_mb, "tables": {
            k: {"removed_manifests": len(v["removed_manifests"]),
                "removed_files": v["removed_files"]} for k, v in stats.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
