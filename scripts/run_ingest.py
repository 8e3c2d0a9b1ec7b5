"""CLI for the streaming seed/discovery ingest — the spark-submit
entry for feeding a LIVE crawl store between rounds.

    spark-submit --py-files hyperion_crawler_spark.zip scripts/run_ingest.py \
        --store /path/to/store --seed-dir /path/to/seed-drops \
        [--checkpoint /path/to/ckpt] [--shards 32]

Drains all currently-available seed parquet files (columns
``url string, image_id string, priority double``) into the store's
frontier + Bloom seen-set, exactly-once across the Spark streaming
checkpoint AND the engine round log (see streaming/seed_ingest.py).
Re-running is always safe: processed files are skipped via the
streaming checkpoint, replays dedup to no-ops via the seen-set.
Prints one JSON line with counters.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hyperion_crawler_spark.config import CrawlConfig, get_spark  # noqa: E402
from hyperion_crawler_spark.sources.tables import Catalog  # noqa: E402
from hyperion_crawler_spark.streaming.seed_ingest import ingest_seed_stream  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True, help="crawl table-store root")
    ap.add_argument("--seed-dir", required=True,
                    help="directory watched for seed parquet drops")
    ap.add_argument("--checkpoint", default=None,
                    help="streaming checkpoint dir (default <store>/_ingest_ckpt)")
    ap.add_argument("--shards", type=int, default=32)
    ap.add_argument("--master", default=None)
    ap.add_argument("--continuous", default=None, metavar="INTERVAL",
                    help="run as a daemon with a processingTime trigger "
                         "(e.g. '5 seconds'); Ctrl-C / SIGTERM stops "
                         "cleanly after the in-flight batch commits")
    args = ap.parse_args()

    spark = get_spark(app="hyperion-ingest", master=args.master)
    cfg = CrawlConfig(n_shards=args.shards)
    cat = Catalog(args.store, writer="seed_ingest")
    ckpt = args.checkpoint or os.path.join(args.store, "_ingest_ckpt")
    if args.continuous:
        from hyperion_crawler_spark.streaming.seed_ingest import (
            start_seed_ingest_daemon,
        )

        import signal

        q, totals = start_seed_ingest_daemon(
            spark, cat, cfg, args.seed_dir, ckpt,
            processing_time=args.continuous)
        print(json.dumps({"event": "ingest_daemon_started",
                          "seed_dir": args.seed_dir,
                          "interval": args.continuous}), flush=True)
        # Graceful shutdown: the handler only flips a flag — calling
        # into the JVM (q.stop / cancelAllJobs, PySpark's default
        # SIGINT behavior) from signal context hits a py4j reentrancy
        # error mid-read. The main thread polls awaitTermination with
        # a timeout and stops the query itself; the in-flight batch
        # finishes its round-log fold first (exactly-once stop point).
        stop_flag: list = []
        for sig in (signal.SIGINT, signal.SIGTERM):
            signal.signal(sig, lambda *_a: stop_flag.append(1))
        try:
            while not stop_flag and q.isActive:
                q.awaitTermination(1)
            q.stop()
            q.awaitTermination()
        except Exception:
            if not stop_flag:
                # No shutdown was requested: this is a REAL streaming
                # failure (corrupt seed file, merge error) — surface
                # it and exit nonzero; swallowing it would report a
                # clean stop while ingestion has silently died.
                raise
            # A signal was requested and reached the JVM first: its
            # shutdown hook tore the context down before this driver
            # could stop the query (spark-submit routes signals to the
            # JVM). An abrupt stop is still exactly-once by
            # construction: the round log folds LAST per batch and
            # replays are Bloom no-ops
            # (test_seed_stream_replay_is_idempotent).
        print(json.dumps({"event": "ingest_daemon_stopped", **totals}),
              flush=True)
    else:
        out = ingest_seed_stream(spark, cat, cfg, args.seed_dir, ckpt)
        print(json.dumps({"event": "ingest", "seed_dir": args.seed_dir, **out}))
    try:
        spark.stop()
    except Exception:
        pass  # JVM may already be down after a signal-driven shutdown


if __name__ == "__main__":
    main()
