"""Per-query isolation bench (guide §1.4) — NOT the frozen driver bench.

Times individual declared queries with the noop sink after one warm-up
pass, optionally dumping .explain("formatted") per query. Used to
attribute time operator-by-operator during the optimization round;
bench.py remains the only measurement of record.

  python bench_extra.py --sf /root/testdata/sf1.0 --queries q20_embedding_topk,q22_text_quality \
      --repeats 2 --explain plans/r07 --suffix before
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hyperion_crawler_spark.config import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--explain", default="")
    ap.add_argument("--suffix", default="")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app="hyperion-bench-extra")
    import __spark_entry__ as E

    qs = E.queries()
    names = [n for n in args.queries.split(",") if n] or sorted(qs)
    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        df = qs[name](spark, args.sf)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            sfx = f"_{args.suffix}" if args.suffix else ""
            with open(os.path.join(args.explain, f"{name}{sfx}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        if not args.no_warmup:
            df.write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf": args.sf, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
