"""Model-based quality filter (operators/quality.py): the LMS trainer
is a deterministic DataFrame job (bit-identical weights on any
partitioning), separates a labeled synthetic set, and the logistic
variant calibrates; scoring is a pure shuffle-free projection."""

import pytest
from pyspark.sql import functions as F

from hyperion_crawler_spark.operators import quality as Q

SF = "/root/testdata/sf0.001"


def _labeled_fixture(spark):
    """Even doc_ids keep their text (label 1); odd are degraded into
    the classic low-quality shape — all caps + punctuation spam
    (label 0). Linearly separable in the quality features."""
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    m = F.col("doc_id") % 2
    txt = (F.when(m == 1, F.concat(F.upper(F.col("text")),
                                   F.lit(" !!! !!! !!! !!! !!!")))
           .otherwise(F.col("text")))
    y = F.when(m == 1, F.lit(0.0)).otherwise(F.lit(1.0))
    return d.select("doc_id", txt.alias("qtxt"), y.alias("y"))


def test_lms_weights_bit_identical_across_partitionings(spark):
    fix = _labeled_fixture(spark)
    w1 = Q.train_quality_linear(fix, "qtxt", F.col("y"), iters=3, lr=1.0)
    w2 = Q.train_quality_linear(fix.repartition(13), "qtxt", F.col("y"),
                                iters=3, lr=1.0)
    w3 = Q.train_quality_linear(fix.coalesce(1), "qtxt", F.col("y"),
                                iters=3, lr=1.0)
    assert w1 == w2 == w3  # fixed-point gradient sums: exact equality


def test_lms_classifier_separates_labeled_set(spark):
    """Accuracy + per-class recall on the hand-labeled synthetic set
    (round-4 verdict item #8's acceptance test)."""
    fix = _labeled_fixture(spark)
    w = Q.train_quality_linear(fix, "qtxt", F.col("y"), iters=3, lr=1.0)
    scored = Q.score_quality(fix, "qtxt", w)
    agg = scored.agg(
        F.avg((F.col("q_keep").cast("double") == F.col("y"))
              .cast("double")).alias("acc"),
        F.avg(F.when(F.col("y") == 1.0,
                     F.col("q_keep").cast("double"))).alias("recall_good"),
        F.avg(F.when(F.col("y") == 0.0,
                     (~F.col("q_keep")).cast("double"))).alias("recall_bad"),
    ).collect()[0]
    assert agg["acc"] >= 0.95, agg
    assert agg["recall_good"] >= 0.9 and agg["recall_bad"] >= 0.9, agg


def test_logistic_variant_separates_too(spark):
    fix = _labeled_fixture(spark)
    w = Q.train_quality_lr(fix, "qtxt", F.col("y"), iters=8, lr=1.0)
    # logistic decision boundary: p > 0.5 ⇔ z = w·x > 0
    acc = (Q.score_quality(fix, "qtxt", w, threshold=0.0)
           .agg(F.avg((F.col("q_keep").cast("double") == F.col("y"))
                      .cast("double"))).collect()[0][0])
    assert acc >= 0.9
    # scalar mirror agrees with the DataFrame scorer's sign
    assert Q.predict_lr(w, [1.0, 0.5, 0.2, 0.01, 0.02, 0.3]) == pytest.approx(
        1.0 / (1.0 + __import__("math").exp(
            -sum(a * b for a, b in zip(
                w, [1.0, 0.5, 0.2, 0.01, 0.02, 0.3])))))


def test_scoring_is_shuffle_free_projection(spark):
    """The scorer must not shuffle or call Python: weights are inlined
    literals over Catalyst feature expressions."""
    fix = _labeled_fixture(spark)
    w = [0.1] * len(Q.FEATURE_NAMES)
    plan = Q.score_quality(fix, "qtxt", w)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan and "ArrowEval" not in plan


def test_empty_training_set_returns_zero_weights(spark):
    fix = _labeled_fixture(spark).filter(F.lit(False))
    assert Q.train_quality_linear(fix, "qtxt", F.col("y")) == [0.0] * 6
