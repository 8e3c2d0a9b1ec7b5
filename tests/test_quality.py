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


def test_repetition_profile_planted(spark):
    from hyperion_crawler_spark.operators.quality import repetition_profile

    docs = [
        (1, "spark shuffle " * 10 + "end"),        # heavy bigram repeat
        (2, "a b c d e f g h"),                    # all bigrams unique
        (3, "solo"),                               # < n tokens -> still a row
        (4, "x y x y z"),                          # partial repeat
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           repetition_profile(df, "doc_id", "text", n=2).collect()}
    assert len(out) == 4

    t1 = docs[0][1]
    assert out[1]["top_gram"] == "spark shuffle"
    # 10 occurrences x len('spark shuffle')=13 chars over the full text
    assert abs(out[1]["top_gram_frac"] - 10 * 13 / len(t1)) < 1e-9
    # bigram occurrences: 'spark shuffle' x10, 'shuffle spark' x9,
    # 'shuffle end' x1 -> 19 of 20 are repeats
    assert abs(out[1]["dup_gram_frac"] - 19 / 20) < 1e-9

    assert out[2]["dup_gram_frac"] == 0.0 and out[2]["top_gram_frac"] > 0.0

    # single-token doc: no bigrams, NULL top_gram, zero fractions
    assert out[3]["top_gram"] is None
    assert out[3]["top_gram_frac"] == 0.0 and out[3]["dup_gram_frac"] == 0.0

    # 'x y' x2, 'y x' x1, 'y z' x1 -> top='x y' (2*3 chars over 9), dup 2/4
    assert out[4]["top_gram"] == "x y"
    assert abs(out[4]["top_gram_frac"] - 2 * 3 / 9) < 1e-9
    assert abs(out[4]["dup_gram_frac"] - 0.5) < 1e-9


def test_repetition_profile_tiebreak_deterministic(spark):
    """Equal-count grams must break ties to the lexicographically
    greatest gram on ANY partitioning (max over (count, gram) struct)."""
    from hyperion_crawler_spark.operators.quality import repetition_profile

    df = spark.createDataFrame([(1, "b a b a c")], "doc_id long, text string")
    # bigrams: 'b a' x2? -> tokens b,a,b,a,c: 'b a' x2, 'a b' x1, 'a c' x1
    row = repetition_profile(df, "doc_id", "text", n=2).collect()[0]
    assert row["top_gram"] == "b a"
    df2 = spark.createDataFrame([(1, "a b c a b d")], "doc_id long, text string")
    # 'a b' x2 beats everything; among count-1 grams none competes
    row2 = repetition_profile(df2.repartition(8), "doc_id", "text", n=2).collect()[0]
    assert row2["top_gram"] == "a b"
