"""As-of and range joins (operators/temporal.py)."""

from pyspark.sql import functions as F

from hyperion_crawler_spark.operators.temporal import asof_join, range_join

LEFT = [(1, "k1", 100, "L100"), (2, "k1", 205, "L205"), (3, "k1", 50, "L50"),
        (4, "k2", 500, "L500"), (5, "k3", 10, "Lk3")]
RIGHT = [("k1", 100, "R100"), ("k1", 200, "R200"), ("k2", 499, "R499"),
         ("k2", 500, "R500"), ("k9", 1, "R-other")]


def _dfs(spark):
    l = spark.createDataFrame(LEFT, "id long, k string, ts long, lv string")
    r = spark.createDataFrame(RIGHT, "k string, ts long, rv string")
    return l, r


def _brute(tolerance=None):
    out = {}
    for (i, k, lts, _lv) in LEFT:
        cand = [(rts, rv) for (rk, rts, rv) in RIGHT
                if rk == k and rts <= lts
                and (tolerance is None or rts >= lts - tolerance)]
        out[i] = max(cand)[1] if cand else None
    return out


def test_asof_matches_brute_force(spark):
    l, r = _dfs(spark)
    got = {row["id"]: row["rv"]
           for row in asof_join(l, r, "k", "ts").collect()}
    assert got == _brute()
    # spot semantics: equal ts IS visible (id=1 → R100, id=4 → R500);
    # no earlier row → null (id=3, id=5)
    assert got[1] == "R100" and got[4] == "R500"
    assert got[3] is None and got[5] is None


def test_asof_tolerance_drops_stale_matches(spark):
    l, r = _dfs(spark)
    got = {row["id"]: row["rv"]
           for row in asof_join(l, r, "k", "ts", tolerance=5).collect()}
    assert got == _brute(tolerance=5)
    assert got[2] == "R200"   # 205-200 ≤ 5 still in
    assert got[1] == "R100"   # exact match always in


def test_asof_right_tie_is_deterministic(spark):
    l = spark.createDataFrame([(1, "k", 10)], "id long, k string, ts long")
    r = spark.createDataFrame([("k", 10, "a"), ("k", 10, "b")],
                              "k string, ts long, rv string")
    for _ in range(3):
        got = asof_join(l, r, "k", "ts").collect()[0]["rv"]
        assert got == "b"  # max struct under deterministic order


def test_asof_single_exchange(spark):
    l, r = _dfs(spark)
    plan = asof_join(l, r, "k", "ts") \
        ._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert final.count("Exchange hashpartitioning") == 1, \
        "asof must be one shuffle on the key"


def test_range_join_equi_shape_and_results(spark):
    pts = spark.createDataFrame(
        [(1, "k1", 15), (2, "k1", 100), (3, "k2", 15)],
        "id long, k string, p long")
    iv = spark.createDataFrame(
        [("k1", 10, 20, "A"), ("k1", 12, 16, "B"), ("k2", 0, 5, "C")],
        "k string, lo long, hi long, tag string")
    out = range_join(pts, iv, "k", "p", "lo", "hi", granule=8)
    got = sorted((r["id"], r["tag"]) for r in out.collect())
    assert got == [(1, "A"), (1, "B")]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_null_keys_never_match(spark):
    l = spark.createDataFrame([(1, None, 10), (2, "k", 10)],
                              "id long, k string, ts long")
    r = spark.createDataFrame([(None, 5, "phantom"), ("k", 5, "real")],
                              "k string, ts long, rv string")
    got = {row["id"]: row["rv"] for row in asof_join(l, r, "k", "ts").collect()}
    assert got == {1: None, 2: "real"}
