"""BM25 relevance ranking (operators/ranking.py)."""

import math

import pytest
from pyspark.sql import functions as F

from hyperion_crawler_spark.operators.ranking import bm25_scores, bm25_topk

DOCS = [
    (1, "spark merge table"),
    (2, "spark spark spark spark spark"),
    (3, "pelican feathers and entirely other words"),
    (4, "table scan table scan merge vector spark"),
    (5, ""),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def _ref_bm25(query, k1=1.2, b=0.75):
    """Single-threaded reference implementation."""
    toks = {i: [t for t in txt.lower().split(" ") if t] for i, txt in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in query}
    out = {}
    for i, v in toks.items():
        s = 0.0
        for t in query:
            tf = v.count(t)
            if not tf:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            c = idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * len(v) / avgdl))
            s += math.floor(c * 1e9 + 0.5) / 1e9
        out[i] = math.floor(s * 1e6 + 0.5) / 1e6
    return out


def test_bm25_matches_reference(spark, docs):
    q = ["spark", "merge"]
    got = {r["doc_id"]: r["score"] for r in bm25_scores(docs, "doc_id", "text", q).collect()}
    assert got == _ref_bm25(q)


def test_bm25_no_hit_docs_score_zero_but_present(spark, docs):
    got = {r["doc_id"]: r["score"]
           for r in bm25_scores(docs, "doc_id", "text", ["zebra"]).collect()}
    assert got == {1: 0.0, 2: 0.0, 3: 0.0, 4: 0.0, 5: 0.0}


def test_bm25_term_saturation(spark, docs):
    """5× repetition must score higher than 1× but far less than 5×
    (the k1 saturation that separates BM25 from raw tf)."""
    got = {r["doc_id"]: r["score"]
           for r in bm25_scores(docs, "doc_id", "text", ["spark"]).collect()}
    assert got[2] > got[1] > 0
    assert got[2] < 3 * got[1]


def test_bm25_topk_order_and_plan(spark, docs):
    top = bm25_topk(docs, "doc_id", "text", ["spark", "table"], k=2)
    rows = top.collect()
    assert [r["doc_id"] for r in rows] == sorted(
        [r["doc_id"] for r in rows],
        key=lambda i: next(-x["score"] for x in rows if x["doc_id"] == i))
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, "global top-k must not global-sort"
    assert "BatchEvalPython" not in plan


def test_bm25_plan_broadcasts_dims(spark, docs):
    plan = bm25_scores(docs, "doc_id", "text", ["spark"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
