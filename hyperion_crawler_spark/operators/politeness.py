"""Per-host politeness scheduling — skew-safe top-k (SURVEY §2.5 W2, §2.9).

Semantics (deterministic, mirrored by the parity oracle):

* robots: a URL whose path starts with any of its host's
  ``disallow_prefixes`` is excluded (reference analog: market allow-list
  filter — /root/reference/api/src/etl/krx/extractor.py:113-115).
* budget per host per round =
  ``min(robots.max_per_round, floor(60 / crawl_delay_s))`` (delay 0 → no
  delay cap), mirroring the reference's 60 req/min rate limit
  (/root/reference/api/.env.example:27) and per-source politeness.
* pick the top-``budget`` eligible URLs per host ordered by
  ``priority DESC, urlhash ASC`` — the frontier priority queue's total
  order (north_rule; ties broken by hash so crawl order is reproducible
  under any partitioning — SURVEY §7 "what's hard" #1).

Skew: a Zipf-hot host would funnel its entire frontier slice through
one reducer in a naive ``Window.partitionBy(host)``. The two-phase
top-k bounds that: phase 1 partitions by ``(host, salt)`` with
``salt = pmod(urlhash, salt_buckets)`` and keeps a local top-``budget``
per salt bucket (each reducer sees ~1/salt_buckets of the hot host);
phase 2 runs the exact window on the ≤ ``salt_buckets × budget``
survivors per host. Result is exactly equal to the single-phase top-k
(any global top-budget row is also top-budget within its salt bucket)
at a fraction of the skew cost. Robots rules are a broadcast join —
the dimension is one row per host (reference analog: in-memory asset
cache — /root/reference/api/src/etl/krx/transformer.py:24,153-156).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import CrawlConfig

ROUND_SECONDS = 60.0  # politeness window per round (60 req/min analog)


def path_expr(url_col):
    """Path component of a canonical URL (Catalyst-only, codegen'd)."""
    return F.regexp_extract(url_col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+(/[^?#]*)", 1)


def with_robots(frontier: DataFrame, robots: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """Broadcast-join robots rules; adds ``robots_allowed`` and
    ``budget`` columns. Unknown host → allowed, default budget.

    Allow/Disallow precedence is RFC 9309 §2.2.2: the LONGEST matching
    prefix wins, ties (and no-match) resolve to allowed — so an
    ``Allow: /private/open`` overrides ``Disallow: /private`` for paths
    under /private/open. Pure Catalyst (filter + transform + array_max
    higher-order functions), codegen'd per row against the broadcast
    dimension. Rules tables without an ``allow_prefixes`` column are
    accepted (treated as allow-nothing-extra) for compatibility."""
    sel = [F.col("host"), F.col("disallow_prefixes"),
           (F.col("allow_prefixes") if "allow_prefixes" in robots.columns
            else F.array().cast("array<string>")).alias("allow_prefixes"),
           F.col("crawl_delay_s"), F.col("max_per_round")]
    r = F.broadcast(robots.select(*sel))
    df = frontier.join(r, "host", "left")
    path = path_expr(F.col("url"))

    def rule_hit(p):
        # RFC 9309 §2.2.3: '*' matches any sequence, a TRAILING '$'
        # anchors the path end; plain rules keep the cheap prefix test
        # (the overwhelmingly common case — the regex branch only runs
        # for rules that carry a special char). Mirrors
        # functions/robots.rule_matches exactly (fuzz-bridged).
        # Java replacement strings treat '$' as a group ref and '\' as
        # an escape: '\\\$' emits the two chars '\$', '\$' emits '$'
        esc = F.regexp_replace(p, r"([\\.\^\+\?\(\)\{\}\[\]\|])", r"\\$1")
        esc = F.regexp_replace(esc, r"\*", ".*")
        esc = F.regexp_replace(esc, r"\$", r"\\\$")
        esc = F.regexp_replace(esc, r"\\\$$", r"\$")
        return F.when(p.contains("*") | p.endswith("$"),
                      F.regexp_like(path, F.concat(F.lit("^"), esc))) \
                .otherwise(path.startswith(p))

    def longest_match(col):
        prefixes = F.coalesce(col, F.array().cast("array<string>"))
        return F.coalesce(
            F.array_max(F.transform(
                F.filter(prefixes, rule_hit),
                lambda p: F.length(p))),
            F.lit(0))

    disallowed = longest_match(F.col("disallow_prefixes")) > longest_match(F.col("allow_prefixes"))
    delay_cap = F.when(
        F.coalesce(F.col("crawl_delay_s"), F.lit(0.0)) > 0.0,
        F.floor(F.lit(ROUND_SECONDS) / F.col("crawl_delay_s")),
    ).otherwise(F.lit(2**31 - 1))
    budget = F.least(
        F.coalesce(F.col("max_per_round"), F.lit(cfg.default_host_budget)).cast("long"),
        delay_cap,
    )
    return (
        df.withColumn("robots_allowed", ~disallowed)
        .withColumn("budget", budget)
        .drop("disallow_prefixes", "allow_prefixes", "crawl_delay_s", "max_per_round")
    )


def topk_per_host(eligible: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """Exact per-host top-``budget`` by (priority DESC, urlhash ASC),
    two-phase to break hot-host skew. Input needs columns
    (host, urlhash, priority, budget)."""
    order = [F.col("priority").desc(), F.col("urlhash").asc()]
    local = Window.partitionBy("host", F.pmod(F.col("urlhash"), F.lit(cfg.salt_buckets))).orderBy(*order)
    pruned = (
        eligible.withColumn("_rn_local", F.row_number().over(local))
        .filter(F.col("_rn_local") <= F.col("budget"))
        .drop("_rn_local")
    )
    final = Window.partitionBy("host").orderBy(*order)
    return (
        pruned.withColumn("_rn", F.row_number().over(final))
        .filter(F.col("_rn") <= F.col("budget"))
        .drop("_rn")
    )


def schedule_round(frontier_eligible: DataFrame, robots: DataFrame, cfg: CrawlConfig
                   ) -> tuple[DataFrame, DataFrame]:
    """Returns (scheduled, robots_excluded). ``scheduled`` keeps frontier
    columns + budget; ``robots_excluded`` rows leave the frontier with
    status 'excluded' (reference analog: drop-with-warning —
    /root/reference/api/src/etl/krx/transformer.py:86-89)."""
    annotated = with_robots(frontier_eligible, robots, cfg)
    # crawler-trap guard (depth / query-param / repeated-segment caps,
    # functions/urls.py): tripped URLs are excluded exactly like robots
    # denials. Constant-false when every threshold is 0 (the default),
    # so the predicate folds away and parity runs are untouched.
    from ..functions.urls import is_probable_trap

    trap = is_probable_trap(F.col("url"), cfg.max_url_depth,
                            cfg.max_query_params, cfg.max_segment_repeat)
    keep = F.col("robots_allowed") & ~trap
    excluded = annotated.filter(~keep).drop("robots_allowed", "budget")
    allowed = annotated.filter(keep).drop("robots_allowed")
    return topk_per_host(allowed, cfg).drop("budget"), excluded
