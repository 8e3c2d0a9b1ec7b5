"""Single-threaded exact parity oracle (FIXTURES.md §"Golden-run oracle").

A pure-Python, order-explicit implementation of the crawl rules —
canonicalize → first-wins dedup → robots → per-host budget → priority
order → deterministic transient failures → retry/backoff → link
expansion — over the same synthetic fixture the Spark engine reads.
This is the analog of the reference's mocked-source unit tests
(/root/reference/tests/conftest.py:113-148 — one golden fixture shared
by mock and assertions). The engine must match the oracle's per-round
crawl ordering and final URL-seen membership exactly
(BASELINE.json north_rule parity clause).

Shares the scalar kernels (canonicalize_one, spark_xxhash64_str) whose
equivalence to the Spark-side vectorized/builtin forms is itself
asserted in test_urls.py / test_hashing.py — so oracle parity composes
from independently verified pieces.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import pandas as pd

from hyperion_crawler_spark.config import CrawlConfig
from hyperion_crawler_spark.functions.hashing import spark_xxhash64_str
from hyperion_crawler_spark.functions.robots import is_path_allowed
from hyperion_crawler_spark.functions.urls import canonicalize_one, host_of_one

ROUND_SECONDS = 60
FAIL_MOD = 17
MASK64 = (1 << 64) - 1


@dataclass
class OracleState:
    frontier: dict[int, dict] = field(default_factory=dict)  # urlhash -> row
    seen: set[int] = field(default_factory=set)
    crawl_order: list[list[int]] = field(default_factory=list)  # per round: urlhash list
    results: list[dict] = field(default_factory=list)


def _path_of(url: str) -> str:
    rest = url.split("://", 1)[1]
    i = rest.find("/")
    return rest[i:].split("?")[0] if i >= 0 else "/"


def _mk_candidates(rows: list[tuple[str, str, float, tuple]], cfg: CrawlConfig) -> list[dict]:
    """rows: (raw_url, image_id, priority, tiebreak) → canonical dedup'd
    candidate dicts. First-wins under sort by (-priority, *tiebreak)."""
    cands = []
    for raw, img, pri, tb in rows:
        url = canonicalize_one(raw)
        h = spark_xxhash64_str(url)
        cands.append({
            "urlhash": h, "url": url, "host": host_of_one(url), "image_id": img,
            "shard": h % cfg.n_shards, "priority": pri, "_tb": tb,
        })
    cands.sort(key=lambda c: (-c["priority"],) + c["_tb"])
    out, taken = [], set()
    for c in cands:
        if c["urlhash"] not in taken:
            taken.add(c["urlhash"])
            del c["_tb"]
            out.append(c)
    return out


def transient_fail(urlhash: int, retry: int) -> bool:
    u = urlhash & MASK64
    return ((u + 131 * retry) & MASK64) % FAIL_MOD == 0


def run_oracle(fixture: dict[str, pd.DataFrame], cfg: CrawlConfig, n_rounds: int) -> OracleState:
    st = OracleState()
    robots = {
        r["host"]: r for _, r in fixture["robots"].iterrows()
    }
    links_by_src: dict[str, list] = {}
    for _, r in fixture["links"].iterrows():
        links_by_src.setdefault(r["src_url"], []).append(r)
    corpus_ids = set(fixture["corpus"]["image_id"])

    # --- init: seeds ------------------------------------------------
    seed_rows = [
        (r["url"], r["image_id"], float(r["priority"]), (r["image_id"],))
        for _, r in fixture["seeds"].iterrows()
    ]
    for c in _mk_candidates(seed_rows, cfg):
        st.seen.add(c["urlhash"])
        st.frontier[c["urlhash"]] = {
            **c, "status": "queued", "retry_count": 0, "next_fetch_ts": 0,
            "discovered_round": 0,
        }

    # --- rounds -------------------------------------------------------
    for rnd in range(1, n_rounds + 1):
        round_ts = rnd * ROUND_SECONDS
        eligible = [
            row for row in st.frontier.values()
            if row["status"] == "queued" and row["next_fetch_ts"] <= round_ts
        ]
        # robots (longest-prefix-wins Allow/Disallow — RFC 9309 §2.2.2)
        allowed, excluded = [], []
        for row in eligible:
            rb = robots.get(row["host"])
            prefixes = list(rb["disallow_prefixes"]) if rb is not None else []
            allows = (list(rb["allow_prefixes"])
                      if rb is not None and "allow_prefixes" in rb.index else [])
            p = _path_of(row["url"])
            (allowed if is_path_allowed(p, prefixes, allows) else excluded).append(row)
        for row in excluded:
            row["status"] = "excluded"
        # per-host budget + top-k
        byhost: dict[str, list] = {}
        for row in allowed:
            byhost.setdefault(row["host"], []).append(row)
        scheduled = []
        for host, rows in byhost.items():
            rb = robots.get(host)
            if rb is None:
                budget = cfg.default_host_budget
            else:
                budget = int(rb["max_per_round"])
                delay = float(rb["crawl_delay_s"])
                if delay > 0:
                    budget = min(budget, int(ROUND_SECONDS / delay))
            rows.sort(key=lambda r: (-r["priority"], r["urlhash"]))
            scheduled.extend(rows[:budget])
        scheduled.sort(key=lambda r: (-r["priority"], r["urlhash"]))
        st.crawl_order.append([r["urlhash"] for r in scheduled])

        # fetch + transitions
        fetched_urls = []
        for row in scheduled:
            if transient_fail(row["urlhash"], row["retry_count"]):
                old = row["retry_count"]
                if old + 1 > cfg.max_retries:
                    row["status"] = "failed"
                    row["retry_count"] = old + 1
                    row["next_fetch_ts"] = round_ts + cfg.backoff_initial * cfg.backoff_multiplier**old
                else:
                    row["retry_count"] = old + 1
                    row["next_fetch_ts"] = round_ts + cfg.backoff_initial * cfg.backoff_multiplier**old
                st.results.append({"round": rnd, "urlhash": row["urlhash"], "status": "failed"})
            elif row["image_id"] not in corpus_ids:
                row["status"] = "quarantined"
                row["next_fetch_ts"] = round_ts
                st.results.append({"round": rnd, "urlhash": row["urlhash"], "status": "quarantined"})
            else:
                row["status"] = "fetched"
                row["next_fetch_ts"] = round_ts
                st.results.append({"round": rnd, "urlhash": row["urlhash"], "status": "fetched"})
                fetched_urls.append(row["url"])

        # link expansion
        disc_rows = []
        for src in fetched_urls:
            for link in links_by_src.get(src, []):
                disc_rows.append(
                    (link["dst_url"], link["dst_image_id"], float(link["dst_priority"]),
                     (link["src_url"], link["dst_image_id"]))
                )
        for c in _mk_candidates(disc_rows, cfg):
            if c["urlhash"] in st.seen:
                continue
            st.seen.add(c["urlhash"])
            st.frontier[c["urlhash"]] = {
                **c, "status": "queued", "retry_count": 0, "next_fetch_ts": 0,
                "discovered_round": rnd,
            }
    return st
