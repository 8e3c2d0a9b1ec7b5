"""PageRank-rescore commit write amplification: full-frontier
overwrite (the round-3 shape) vs changed-rows delta merge (the engine
path since round 4).

Builds an N-row merge-on-read frontier, a small link graph over a
``graph_nodes``-URL slice (the "engine-known" graph — URLs this crawl
has fetched), and commits one priority rescore both ways:

* overwrite: blend priorities for the whole queue and rewrite every
  row (``rescore_frontier_priority`` + ``overwrite()``).
* delta:     blend ONLY the rows the graph moved and merge them
  through the MoR frontier (``rescore_frontier_delta`` + ``merge()``).

Identical read-back priorities from both (asserted). Appends a section
to BENCH/BASELINE.md — run AFTER scaling_bench.py (which rewrites it).

    python scripts/rescore_bench.py --rows 2000000 --graph-nodes 20000
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
from hyperion_crawler_spark.operators.graph import (  # noqa: E402
    rescore_frontier_delta,
    rescore_frontier_priority,
)
from hyperion_crawler_spark.sources.tables import Catalog  # noqa: E402

COLS = ["urlhash", "url", "host", "image_id", "shard", "priority",
        "status", "retry_count", "next_fetch_ts", "discovered_round"]


def _frontier(spark, n_rows: int):
    return spark.range(n_rows).select(
        F.col("id").alias("urlhash"),
        F.concat(F.lit("https://h"), F.pmod("id", F.lit(997)).cast("string"),
                 F.lit(".example.com/p/"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("h"), F.pmod("id", F.lit(997)).cast("string")).alias("host"),
        F.concat(F.lit("img"), F.col("id").cast("string")).alias("image_id"),
        F.pmod("id", F.lit(32)).cast("int").alias("shard"),
        (F.pmod("id", F.lit(1000)) / 1000.0).alias("priority"),
        F.lit("queued").alias("status"),
        F.lit(0).cast("int").alias("retry_count"),
        F.lit(0).cast("long").alias("next_fetch_ts"),
        F.lit(0).cast("int").alias("discovered_round"))


def _links(spark, graph_nodes: int):
    # chain+skip graph over the first graph_nodes frontier URLs
    return spark.range(graph_nodes - 1).select(
        F.concat(F.lit("https://h"), F.pmod("id", F.lit(997)).cast("string"),
                 F.lit(".example.com/p/"), F.col("id").cast("string")).alias("src_url"),
        F.concat(F.lit("https://h"), F.pmod(F.col("id") + 1, F.lit(997)).cast("string"),
                 F.lit(".example.com/p/"),
                 (F.col("id") + 1).cast("string")).alias("dst_url"))


def _commit_bytes(t, ver):
    prev = {f["path"] for f in t._live_files(ver - 1)}
    new = [f for f in t._live_files(ver) if f["path"] not in prev]
    return sum(os.path.getsize(os.path.join(t.dir, f["path"])) for f in new)


def run_one(spark, delta: bool, n_rows: int, graph_nodes: int) -> dict:
    cat = Catalog(tempfile.mkdtemp(prefix="rescorebench_"))
    t = cat.table("frontier", "shard", merge_on_read=True)
    t.compact_ratio = 0
    v0 = t.overwrite(_frontier(spark, n_rows))
    links = _links(spark, graph_nodes)
    fr = t.read(spark, version=v0)
    handles: list = []
    t0 = time.perf_counter()
    if delta:
        moved = rescore_frontier_delta(fr, links, iters=2, weight=0.5,
                                       handles=handles)
        ver = t.merge(spark, moved.select(*COLS), ["urlhash"],
                      base_version=v0)
    else:
        blended = rescore_frontier_priority(fr, links, iters=2, weight=0.5,
                                            handles=handles)
        ver = t.overwrite(blended.select(*COLS))
    sec = round(time.perf_counter() - t0, 2)
    for h in handles:
        h.unpersist()
    check = (t.read(spark, version=ver)
             .agg(F.count("*").alias("n"),
                  F.floor(F.sum("priority") * 1e6 + F.lit(0.5)).alias("psum"))
             .first())
    return {"mode": "delta_merge" if delta else "full_overwrite",
            "commit_bytes": _commit_bytes(t, ver), "rescore_sec": sec,
            "rows": check["n"], "priority_sum_1e6": check["psum"]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--graph-nodes", type=int, default=20_000)
    args = ap.parse_args()
    spark = get_spark(app="rescore-bench")
    full = run_one(spark, False, args.rows, args.graph_nodes)
    delta = run_one(spark, True, args.rows, args.graph_nodes)
    assert full["rows"] == delta["rows"], "modes diverged on row count"
    assert full["priority_sum_1e6"] == delta["priority_sum_1e6"], \
        "modes diverged on blended priorities"
    ratio = round(full["commit_bytes"] / max(delta["commit_bytes"], 1), 1)
    print(json.dumps({"rows": args.rows, "graph_nodes": args.graph_nodes,
                      "full": full, "delta": delta,
                      "write_amplification_ratio": ratio}))

    md = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "BENCH", "BASELINE.md")
    with open(md, "a") as f:
        f.write(f"""

## PageRank-rescore commit: full overwrite vs changed-rows delta

One priority rescore over a {args.rows:,}-row merge-on-read frontier
with a {args.graph_nodes:,}-node engine-known link graph
({100 * args.graph_nodes / args.rows:.1f}% of the queue is
graph-adjacent; the blend leaves every other row untouched). Both
modes read back identical priorities (count + 1e-6-scaled priority
sum asserted equal).

| mode | bytes written by the commit | wall sec |
|---|---|---|
| full-frontier overwrite (round-3 shape) | {full['commit_bytes']:,} | {full['rescore_sec']} |
| changed-rows delta merge (engine path) | {delta['commit_bytes']:,} | {delta['rescore_sec']} |

The delta commit writes **{ratio}× less** — O(known graph) instead of
O(queue). At the 10^10-row design point a rescore round must not
rewrite the pending queue to bump the ~10^6 graph-adjacent rows; the
delta folds into the next MoR compaction like any other round delta.

Reproduce: `python scripts/rescore_bench.py --rows {args.rows} \\
  --graph-nodes {args.graph_nodes}`
""")
    spark.stop()


if __name__ == "__main__":
    main()
