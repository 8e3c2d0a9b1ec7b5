"""Merge write-amplification evidence: copy-on-write vs merge-on-read.

Builds an N-row frontier-shaped table (uniform urlhash scatter over all
shards — the access pattern that makes CoW rewrite every shard file),
applies one round-shaped MERGE (upserts + delete-key tombstones, ~1.5%
of the table), and reports the bytes and wall time of that commit for
both table modes. Appends a section to BENCH/BASELINE.md.

Run AFTER scaling_bench.py (which rewrites BENCH/BASELINE.md).

    python scripts/mor_bench.py --rows 2000000 --changed 30000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hyperion_crawler_spark.config import get_spark  # noqa: E402
from hyperion_crawler_spark.sources.tables import Catalog  # noqa: E402


def _commit_bytes(t, ver):
    prev = {f["path"] for f in t._live_files(ver - 1)}
    new = [f for f in t._live_files(ver) if f["path"] not in prev]
    return sum(os.path.getsize(os.path.join(t.dir, f["path"])) for f in new)


def run_one(spark, mor: bool, n_rows: int, n_upsert: int, n_delete: int) -> dict:
    cat = Catalog(tempfile.mkdtemp(prefix="morbench_"))
    t = cat.table("frontier", "shard", merge_on_read=mor)
    if mor:
        t.compact_ratio = 0  # measure the steady delta path, not a fold
    base = spark.range(n_rows).select(
        F.col("id").alias("urlhash"),
        F.pmod("id", F.lit(32)).cast("int").alias("shard"),
        F.concat(F.lit("https://h"), F.pmod("id", F.lit(997)).cast("string"),
                 F.lit(".example.com/p/"), F.col("id").cast("string")).alias("url"),
        (F.pmod("id", F.lit(1000)) / 1000.0).alias("priority"),
        F.lit("queued").alias("status"))
    t.append(base)
    base_bytes = sum(os.path.getsize(os.path.join(t.dir, f["path"]))
                     for f in t._live_files())
    ups = spark.range(n_rows, n_rows + n_upsert).select(
        F.col("id").alias("urlhash"),
        F.pmod("id", F.lit(32)).cast("int").alias("shard"),
        F.concat(F.lit("https://hnew.example.com/p/"),
                 F.col("id").cast("string")).alias("url"),
        F.lit(0.9).alias("priority"), F.lit("queued").alias("status"))
    dels = spark.range(0, n_delete * 50, 50).select(
        F.col("id").alias("urlhash"),
        F.pmod("id", F.lit(32)).cast("int").alias("shard"))
    t0 = time.perf_counter()
    ver = t.merge(spark, ups, ["urlhash"], delete_keys=dels)
    sec = round(time.perf_counter() - t0, 2)
    return {"mode": "merge_on_read" if mor else "copy_on_write",
            "base_bytes": base_bytes,
            "commit_bytes": _commit_bytes(t, ver),
            "merge_sec": sec,
            "rows_after": t.read(spark).count()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--changed", type=int, default=30_000)
    args = ap.parse_args()
    n_up, n_del = args.changed * 2 // 3, args.changed // 3
    spark = get_spark(app="mor-bench")
    cow = run_one(spark, False, args.rows, n_up, n_del)
    mor = run_one(spark, True, args.rows, n_up, n_del)
    assert cow["rows_after"] == mor["rows_after"], "modes diverged"
    ratio = round(cow["commit_bytes"] / max(mor["commit_bytes"], 1), 1)
    print(json.dumps({"rows": args.rows, "changed": args.changed,
                      "cow": cow, "mor": mor, "write_amplification_ratio": ratio}))

    md = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "BENCH", "BASELINE.md")
    with open(md, "a") as f:
        f.write(f"""

## Frontier MERGE write amplification: copy-on-write vs merge-on-read

One round-shaped MERGE ({n_up:,} upserts + {n_del:,} deletes,
~{100 * args.changed / args.rows:.1f}% of a {args.rows:,}-row frontier whose
urlhash keys scatter uniformly over all 32 shards — the pattern that
forces CoW to touch every shard file). Identical results
({cow['rows_after']:,} rows) from both modes.

| mode | bytes written by the commit | wall sec |
|---|---|---|
| copy-on-write | {cow['commit_bytes']:,} | {cow['merge_sec']} |
| merge-on-read (engine default for the frontier) | {mor['commit_bytes']:,} | {mor['merge_sec']} |

Merge-on-read writes **{ratio}× less** per commit — O(changed rows)
instead of O(queue). At the 10^10-row design point a CoW round rewrites
the entire pending queue to change ~10^5 rows; the delta commit stays
proportional to the change. Reads apply deltas as
`base ANTI-JOIN broadcast(delta keys)` (the base never shuffles), and
compaction folds deltas when they reach 20% of the base bytes, keeping
TOTAL write amplification bounded by a constant multiple of churn.

Reproduce: `python scripts/mor_bench.py --rows {args.rows} --changed {args.changed}`
""")
    spark.stop()


if __name__ == "__main__":
    main()
