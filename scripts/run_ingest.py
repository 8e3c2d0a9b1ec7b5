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
    args = ap.parse_args()

    spark = get_spark(app="hyperion-ingest", master=args.master)
    cfg = CrawlConfig(n_shards=args.shards)
    cat = Catalog(args.store)
    ckpt = args.checkpoint or os.path.join(args.store, "_ingest_ckpt")
    out = ingest_seed_stream(spark, cat, cfg, args.seed_dir, ckpt)
    print(json.dumps({"event": "ingest", "seed_dir": args.seed_dir, **out}))
    spark.stop()


if __name__ == "__main__":
    main()
