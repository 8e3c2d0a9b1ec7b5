"""The crawl driver loop — resumable incremental-batch rounds.

Replaces the reference's Cloud Scheduler → GCP Workflow orchestration
(/root/reference/workflows/krx_etl_workflow.yaml;
/root/reference/scripts/deploy-scheduler.sh:10): each round is one
Catalyst job graph ending in snapshot commits; the ``rounds.json``
checkpoint log is the workflow-status analog
(/root/reference/api/src/models/task_log.py:11-46).

Resume contract (north_rule): ``run_crawl`` first consults
``Catalog.last_round()``; a killed job re-enters at the first
uncommitted round. Because every table read binds to the snapshot
versions of the last *committed* round and all operators are
deterministic (stable sort keys, seeded kernels, no wall clock), the
resumed run's final state is identical to an uninterrupted run —
asserted in tests/test_resume.py.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..config import CrawlConfig
from ..sources.tables import Catalog
from .round import init_frontier, run_round


def run_crawl(spark: SparkSession, store_dir: str, cfg: CrawlConfig,
              corpus, links, robots, seeds, n_rounds: int,
              stop_after_round: int | None = None,
              robots_txt=None, agent: str = "hyperion",
              corpus_table=None, corpus_buckets: int = 0) -> list[dict]:
    """Run (or resume) a crawl of ``n_rounds`` fetch rounds.

    ``stop_after_round`` simulates a kill for resume tests. Returns the
    per-round metric dicts produced by this invocation.

    ``robots_txt``: optional raw ``(host, robots_txt string)`` frame —
    the politeness rules dimension is then PRODUCED inside the engine
    (functions/robots.rules_from_robots) instead of handed in, the way
    a real crawl derives rules from fetched /robots.txt documents.
    Overrides ``robots`` when given.

    ``corpus_table``/``corpus_buckets``: read the payload corpus from a
    bucketed SnapshotTable with per-round file pruning (see run_round).
    """
    cat = Catalog(store_dir, writer="crawl")
    if robots_txt is not None:
        from ..functions.robots import rules_from_robots

        robots = rules_from_robots(robots_txt, agent=agent,
                                   default_max_per_round=cfg.default_host_budget)
    metrics: list[dict] = []
    rounds = cat.completed_rounds()
    last = max(rounds) if rounds else None
    # bootstrap unless the store was already SEEDED (``_seeded`` marker
    # from init_frontier): a round-0 entry created only by the ingest
    # daemon's folds means seeds were streamed in but the crawl's own
    # seed list was never planted — init merges it on top (r5)
    if last is None or (last == 0 and not rounds.get(0, {}).get("_seeded")):
        metrics.append(init_frontier(spark, cat, cfg, seeds))
        last = 0
    for r in range(last + 1, n_rounds + 1):
        metrics.append(run_round(spark, cat, cfg, r, corpus, links, robots,
                                 corpus_table=corpus_table,
                                 corpus_buckets=corpus_buckets))
        if stop_after_round is not None and r >= stop_after_round:
            break
    return metrics
