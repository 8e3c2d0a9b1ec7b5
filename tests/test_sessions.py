"""Gap-based sessionization (operators/sessions.py)."""

import datetime as dt

from pyspark.sql import functions as F

from hyperion_crawler_spark.operators.sessions import session_stats, with_session_ids


def _events(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: two sessions (gap 3600s > 1800s threshold)
        (1, 1, t0, 10.0),
        (2, 1, t0 + dt.timedelta(seconds=100), 5.5),
        (3, 1, t0 + dt.timedelta(seconds=100 + 3700), 1.0),
        # user 2: one session, equal timestamps tie-broken by event_id
        (4, 2, t0, 2.25),
        (5, 2, t0, 2.25),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")


def test_session_boundaries_and_stats(spark):
    out = {(r["user_id"], r["session_idx"]): r
           for r in session_stats(_events(spark), "user_id", "ts", "event_id",
                                  gap_seconds=1800, value_col="value").collect()}
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    s11 = out[(1, 1)]
    assert s11["n_events"] == 2 and s11["duration_us"] == 100_000_000
    assert s11["value_cents"] == 1550
    s12 = out[(1, 2)]
    assert s12["n_events"] == 1 and s12["duration_us"] == 0
    assert out[(2, 1)]["n_events"] == 2 and out[(2, 1)]["value_cents"] == 450


def test_session_ids_deterministic_on_ties(spark):
    s = with_session_ids(_events(spark), "user_id", "ts", "event_id", 1800)
    got = {r["event_id"]: r["session_idx"] for r in s.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}


def test_sessionize_single_shuffle(spark):
    """Both windows and the final aggregate must reuse ONE hash
    partitioning on the session key — a second exchange would double
    the sessionize cost at 100 TB."""
    plan = session_stats(_events(spark), "user_id", "ts", "event_id", 1800) \
        ._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
