"""Hot-host skew evidence: the two-phase salted per-host top-k at two
salt settings (SURVEY §7 Phase 4 promise; VERDICT r1 next-step #8).

Runs the politeness top-k over a power-law frontier whose hottest host
holds a large fraction of all rows, once with ``salt_buckets=1`` (the
unsalted shape: the hot host funnels through ONE reducer) and once with
the engine default, in fresh JVMs, interleaved. Reports wall time plus
the max window-partition row count (the reducer a single task must
sort) under each setting, and appends a section to BENCH/BASELINE.md.

Usage: python scripts/skew_bench.py [--urls 4000000] [--hosts 200]
       [--salts 1 8] [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from hyperion_crawler_spark.config import CrawlConfig, get_spark
from hyperion_crawler_spark.operators.politeness import topk_per_host
from hyperion_crawler_spark.synth import gen_frontier_distributed
from pyspark.sql import functions as F
spark = get_spark(app="skew-bench", master="local[8]", shuffle_partitions=8)
cfg = CrawlConfig(salt_buckets={salt})
fr = gen_frontier_distributed(spark, {urls}, {hosts}).select(
    F.xxhash64("url").alias("urlhash"), "url",
    F.regexp_extract("url", r"://([^/]+)/", 1).alias("host"),
    "priority").withColumn("budget", F.lit(50).cast("long")).persist()
fr.count()
# max rows any single phase-1 window partition must sort = the skew a
# single reducer task absorbs
mx = fr.groupBy("host", F.pmod(F.col("urlhash"), F.lit(cfg.salt_buckets))) \
       .count().agg(F.max("count")).first()[0]
hot = fr.groupBy("host").count().agg(F.max("count")).first()[0]
best = None
for _ in range({repeats}):
    t0 = time.perf_counter()
    n = topk_per_host(fr, cfg).count()
    dt = time.perf_counter() - t0
    best = dt if best is None or dt < best else best
print("RESULT " + json.dumps({{"salt": {salt}, "sec": round(best, 3),
    "scheduled": n, "max_window_rows": mx, "hot_host_rows": hot}}))
spark.stop()
"""


def run_level(salt: int, urls: int, hosts: int, repeats: int) -> dict:
    code = _CHILD.format(repo=REPO, salt=salt, urls=urls, hosts=hosts, repeats=repeats)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True,
                         timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT for salt={salt}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--urls", type=int, default=4_000_000)
    ap.add_argument("--hosts", type=int, default=200)
    ap.add_argument("--salts", type=int, nargs=2, default=[1, 8])
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    s_lo, s_hi = args.salts
    r_lo = r_hi = None
    for _ in range(args.rounds):   # interleave vs background-load noise
        a = run_level(s_lo, args.urls, args.hosts, args.repeats)
        b = run_level(s_hi, args.urls, args.hosts, args.repeats)
        r_lo = a if r_lo is None or a["sec"] < r_lo["sec"] else r_lo
        r_hi = b if r_hi is None or b["sec"] < r_hi["sec"] else r_hi
    assert r_lo["scheduled"] == r_hi["scheduled"], "salting changed results!"
    report = {"urls": args.urls, "hosts": args.hosts,
              "unsalted": r_lo, "salted": r_hi,
              "speedup": round(r_lo["sec"] / r_hi["sec"], 3),
              "reducer_rows_ratio": round(r_lo["max_window_rows"] / r_hi["max_window_rows"], 2)}
    print(json.dumps(report))

    md = f"""

## Hot-host skew: salting evidence

Per-host top-k over a {args.urls:,}-URL frontier on {args.hosts} hosts
(power-law; hottest host holds {r_lo['hot_host_rows']:,} rows —
{100.0 * r_lo['hot_host_rows'] / args.urls:.0f}% of the frontier).
Same workload, fresh JVM per setting, interleaved, best of
{args.repeats}×{args.rounds}; identical output row counts
({r_lo['scheduled']:,} scheduled) — salting changes the plan, never the
answer (also property-tested in tests/test_politeness.py).

| setting | max rows one reducer sorts | wall sec |
|---|---|---|
| salt_buckets={s_lo} (unsalted) | {r_lo['max_window_rows']:,} | {r_lo['sec']} |
| salt_buckets={s_hi} (engine default) | {r_hi['max_window_rows']:,} | {r_hi['sec']} |

Salting divides the hot host's single-reducer load by
{report['reducer_rows_ratio']}× ({r_lo['max_window_rows']:,} →
{r_hi['max_window_rows']:,} rows) for a {report['speedup']}× wall-clock
win at local[8]. At cluster scale the unsalted shape is a straggler
wall — one task sorts the whole hot host while every other reducer
idles — so the row-spread column is the number that matters at 100 TB.

Reproduce: `python scripts/skew_bench.py --urls {args.urls} --hosts {args.hosts}`
"""
    # idempotent: replace any previous skew section instead of stacking
    # duplicates on re-runs
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    marker = "\n\n## Hot-host skew"
    existing = ""
    if os.path.exists(path):
        with open(path) as f:
            existing = f.read()
        cut = existing.find(marker)
        if cut != -1:
            existing = existing[:cut]
    with open(path, "w") as f:
        f.write(existing + md)


if __name__ == "__main__":
    main()
