"""Deterministic synthetic crawl fixtures (FIXTURES.md §1-4).

Seed-stable generation (seed=42 convention, matching /root/testdata):
every value derives from a counter + seeded PCG64 — no wall clock, no
unseeded RNG. The same pandas frames feed BOTH the Spark engine (written
to parquet) and the single-threaded parity oracle, mirroring how the
reference's tests share one golden fixture between the mocked source and
the assertions (/root/reference/tests/conftest.py:113-148 — the fixed
2-ticker pykrx frame).

Host distribution is Zipf-skewed so the salted host-hash repartition is
actually exercised (FIXTURES.md §2); URLs include messy variants
(uppercase host, :80, #fragment, utm params) to exercise
canonicalization; links include duplicate and already-seen targets to
exercise first-wins dedup (reference semantics:
/root/reference/api/src/etl/base/loader.py:188-209).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from .functions.images import encode, make_pixels, phash64

_LANGS = ["en", "ko", "de", "ja", "fr"]


@dataclass(frozen=True)
class SynthConfig:
    n_urls: int = 400          # total fetchable URLs (corpus rows)
    n_hosts: int = 20
    n_seeds: int = 60
    seed: int = 42
    zipf_a: float = 1.4        # host skew
    messy_frac: float = 0.35   # fraction of *referenced* URLs that appear messy
    private_frac: float = 0.10 # fraction of URLs under /private (robots test)
    max_fanout: int = 5
    img_dims: tuple = (16, 32, 64)


def _mess_up(url: str, r: int) -> str:
    """Deterministic messy variant r∈{0..3} of a canonical URL."""
    scheme, rest = url.split("://", 1)
    host, path = rest.split("/", 1)
    if r == 0:
        return f"{scheme}://{host.upper()}/{path}"
    if r == 1:
        return f"{scheme}://{host}:80/{path}"
    if r == 2:
        return f"{scheme}://{host}/{path}#frag{r}"
    sep = "&" if "?" in path else "?"
    return f"{scheme}://{host}/{path}{sep}utm_source=synth&utm_medium=t"


def gen_fixture(cfg: SynthConfig = SynthConfig()) -> dict[str, pd.DataFrame]:
    """Returns pandas frames: corpus, seeds, links, robots.

    ``seeds.url`` / ``links.dst_url`` may be messy variants; the
    canonical URL for image i is ``canon_urls[i]``.
    """
    rng = np.random.Generator(np.random.PCG64(cfg.seed))
    n = cfg.n_urls

    # Zipf-skewed host ids
    hosts_raw = rng.zipf(cfg.zipf_a, size=n)
    host_ids = (hosts_raw - 1) % cfg.n_hosts
    is_private = rng.random(n) < cfg.private_frac
    # half of the private URLs live under /private/open — reachable only
    # where an Allow: /private/open overrides the Disallow: /private
    # (RFC 9309 longest-match precedence, exercised in parity tests)
    is_open = rng.random(n) < 0.5

    image_ids = [f"img{i:010d}" for i in range(n)]

    def _sub(i: int) -> str:
        if not is_private[i]:
            return ""
        return "private/open/" if is_open[i] else "private/"

    canon_urls = [
        f"http://host{host_ids[i]:04d}.example/{_sub(i)}p/{i}"
        for i in range(n)
    ]

    # corpus
    dims = rng.choice(cfg.img_dims, size=(n, 2))
    fmts = rng.choice(["hypng", "hyjpg"], size=n)
    langs = rng.choice(_LANGS, size=n)
    rows = []
    for i in range(n):
        w, h = int(dims[i, 0]), int(dims[i, 1])
        px = make_pixels(image_ids[i], w, h)
        rows.append(
            (image_ids[i], encode(px, fmts[i]), w, h, fmts[i],
             f"caption of {image_ids[i]} in {langs[i]}", phash64(px))
        )
    corpus = pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"])
    corpus["w"] = corpus["w"].astype("int32")
    corpus["h"] = corpus["h"].astype("int32")
    corpus["phash"] = corpus["phash"].astype("int64")

    def maybe_messy(i: int, u: float, r: int) -> str:
        return _mess_up(canon_urls[i], r) if u < cfg.messy_frac else canon_urls[i]

    # seeds: first n_seeds image indices, shuffled deterministically
    n_seeds = min(cfg.n_seeds, n)
    seed_idx = rng.permutation(n)[:n_seeds]
    seed_mess_u = rng.random(n_seeds)
    seed_mess_r = rng.integers(0, 4, n_seeds)
    seeds = pd.DataFrame({
        "url": [maybe_messy(seed_idx[j], seed_mess_u[j], seed_mess_r[j]) for j in range(n_seeds)],
        "image_id": [image_ids[i] for i in seed_idx],
        "priority": np.round(rng.random(n_seeds), 6),
    })

    # links: per URL fan-out 0..max_fanout, duplicate targets allowed
    srcs, dsts, dst_imgs, dst_pri = [], [], [], []
    fanouts = rng.integers(0, cfg.max_fanout + 1, n)
    for i in range(n):
        for _ in range(fanouts[i]):
            t = int(rng.integers(0, n))
            u, r = float(rng.random()), int(rng.integers(0, 4))
            srcs.append(canon_urls[i])
            dsts.append(maybe_messy(t, u, r))
            dst_imgs.append(image_ids[t])
            dst_pri.append(round(float(rng.random()), 6))
    links = pd.DataFrame({
        "src_url": srcs, "dst_url": dsts, "dst_image_id": dst_imgs, "dst_priority": dst_pri,
    })

    # robots: one row per host; ~70% of disallowing hosts also carry an
    # Allow for the /private/open subtree (longest-match override)
    hosts = [f"host{hid:04d}.example" for hid in range(cfg.n_hosts)]
    disallow = [["/private"] if rng.random() < 0.5 else [] for _ in hosts]
    allow = [["/private/open"] if (d and rng.random() < 0.7) else [] for d in disallow]
    robots = pd.DataFrame({
        "host": hosts,
        "disallow_prefixes": disallow,
        "allow_prefixes": allow,
        "crawl_delay_s": rng.choice([0.0, 1.0, 5.0], size=cfg.n_hosts),
        "max_per_round": rng.choice([1, 2, 5, 10], size=cfg.n_hosts).astype("int32"),
    })

    return {"corpus": corpus, "seeds": seeds, "links": links, "robots": robots}


def write_fixture_parquet(fixture: dict[str, pd.DataFrame], outdir: str) -> None:
    """Write fixture frames as parquet (pyarrow; no Spark needed).

    The robots frame's list columns get an explicit arrow schema: a
    tiny fixture where every prefix list is empty would otherwise make
    pyarrow infer ``list<int32>`` and Spark's string-typed read fail."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    robots_schema = pa.schema([
        ("host", pa.string()),
        ("disallow_prefixes", pa.list_(pa.string())),
        ("allow_prefixes", pa.list_(pa.string())),
        ("crawl_delay_s", pa.float64()),
        ("max_per_round", pa.int32()),
    ])
    for name, pdf in fixture.items():
        schema = robots_schema if name == "robots" else None
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False, schema=schema),
                       f"{outdir}/{name}.parquet")


def gen_corpus_distributed(spark, n_images: int, dims=(16, 32), fmts=("hypng", "hyjpg")):
    """Bench-scale corpus generator: image encode runs as a mapInPandas
    kernel so the (Python) codec parallelizes across cores — corpus
    synthesis stays off the measured path but must not take minutes
    either. Deterministic per image_id (same codec as gen_fixture)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from . import schemas as S

    def kernel(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                image_id = f"img{i:010d}"
                w = dims[i % len(dims)]
                h = dims[(i // len(dims)) % len(dims)]
                fmt = fmts[i % len(fmts)]
                px = make_pixels(image_id, w, h)
                rows.append((image_id, encode(px, fmt), w, h, fmt,
                             f"caption of {image_id} in en", phash64(px)))
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt",
                                              "caption", "phash"])

    return spark.range(n_images).repartition(64).mapInPandas(
        kernel, S.CORPUS)


def gen_links_distributed(spark, n_urls: int, n_hosts: int = 1000, fanout: int = 2):
    """JVM-side link graph over the distributed frontier's URL space:
    each URL links to ``fanout`` deterministic targets (hash-derived,
    duplicates possible across sources → dedup + seen-probe exercise)."""
    from pyspark.sql import functions as F

    base = gen_frontier_distributed(spark, n_urls, n_hosts).select("url")
    edges = base.select(
        F.col("url").alias("src_url"),
        F.explode(F.array(*[
            F.pmod(F.xxhash64("url", F.lit(j)), F.lit(n_urls)).alias(f"t{j}")
            for j in range(fanout)
        ])).alias("tid"),
    )
    # rebuild target url/image/priority deterministically from tid with
    # the same hash formulas gen_frontier_distributed uses for id=tid,
    # so target urlhashes align with the frontier's
    return edges.select(
        "src_url",
        F.concat(F.lit("http://host"),
                 F.lpad(F.floor(F.lit(n_hosts) * F.pow(
                     F.pmod(F.xxhash64("tid"), F.lit(10**9)) / 1e9, F.lit(4.0)))
                     .cast("int").cast("string"), 5, "0"),
                 F.lit(".example/p/"), F.col("tid").cast("string")).alias("dst_url"),
        F.concat(F.lit("img"), F.lpad(F.col("tid").cast("string"), 10, "0")).alias("dst_image_id"),
        (F.pmod(F.xxhash64("tid", F.lit(1)), F.lit(10**6)) / 1e6).alias("dst_priority"),
    )


def gen_frontier_distributed(spark, n_urls: int, n_hosts: int = 1000, n_seen: int = 0):
    """Bench-scale frontier generator — pure Catalyst (spark.range +
    builtin functions, zero Python), so generating 10^7+ candidate URLs
    is not the bottleneck when measuring URLs-scheduled/sec.

    Host skew: host_id = floor(n_hosts * u^4) with u uniform from a hash
    — power-law concentration near host 0 (hot hosts), same shape the
    Zipf fixture exercises.
    """
    from pyspark.sql import functions as F

    df = spark.range(n_urls).withColumn("u", (F.pmod(F.xxhash64("id"), F.lit(10**9)) / 1e9))
    df = df.select(
        F.col("id"),
        F.floor(F.lit(n_hosts) * F.pow("u", F.lit(4.0))).cast("int").alias("host_id"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10**6)) / 1e6).alias("priority"),
    )
    return df.select(
        F.concat(F.lit("http://host"), F.lpad(F.col("host_id").cast("string"), 5, "0"),
                 F.lit(".example/p/"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("img"), F.lpad(F.col("id").cast("string"), 10, "0")).alias("image_id"),
        F.col("priority"),
    )
