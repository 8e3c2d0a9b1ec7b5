"""Dataset selection/mixing + decontamination + repetition-scrub
operators (training-data pipeline)."""

from pyspark.sql import functions as F

from hyperion_crawler_spark.operators.dedup import (
    decontaminate,
    dedup_repeated_spans,
)
from hyperion_crawler_spark.operators.selection import (
    hash_sample,
    stratified_mix,
)


def test_hash_sample_deterministic_and_order_independent(spark):
    df = spark.range(2000).select(F.col("id").alias("k"))
    a = sorted(r["k"] for r in hash_sample(df, "k", 0.25).collect())
    b = sorted(r["k"] for r in
               hash_sample(df.repartition(13), "k", 0.25).collect())
    assert a == b, "sampling decision must not depend on partitioning"
    # rate is approximately honored (hash uniformity)
    assert 0.2 < len(a) / 2000 < 0.3
    # salt derives an independent sample
    c = sorted(r["k"] for r in hash_sample(df, "k", 0.25, salt="s2").collect())
    assert c != a
    # nested rates: a lower-rate sample is a subset of a higher-rate one
    d = set(r["k"] for r in hash_sample(df, "k", 0.1).collect())
    assert d <= set(a)


def test_stratified_mix_rates_per_source(spark):
    df = spark.range(4000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("src"))
    out = stratified_mix(df, "src", "k", {"s0": 1.0, "s1": 0.5, "s2": 0.0},
                         default_rate=0.25)
    by_src = {r["src"]: r["n"] for r in
              out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert by_src["s0"] == 1000          # rate 1.0 keeps everything
    assert "s2" not in by_src            # rate 0.0 keeps nothing
    assert 400 < by_src["s1"] < 600      # ~0.5
    assert 150 < by_src.get("s3", 0) < 350  # default 0.25


def test_decontaminate_drops_overlapping_docs(spark):
    corpus = spark.createDataFrame([
        (1, "a b c d e f g h i j k l"),      # contains the bench 8-gram
        (2, "z y x w v u t s r q p o"),      # clean
        (3, "m a b c d e f g h n o p"),      # contains it shifted
    ], "doc_id long, text string")
    bench = spark.createDataFrame([("a b c d e f g h",)], "text string")
    kept = sorted(r["doc_id"] for r in
                  decontaminate(corpus, bench, "doc_id", "text", n=8).collect())
    assert kept == [2]
    # n larger than any shared run → nothing dropped
    kept2 = sorted(r["doc_id"] for r in
                   decontaminate(corpus, bench, "doc_id", "text", n=9).collect())
    assert kept2 == [1, 2, 3]


def test_dedup_repeated_spans_scrubs_exact_repeats(spark):
    base = " ".join(f"w{i}" for i in range(20))       # two exact chunks
    doc = f"{base} {base} tail0 tail1"                # chunks 3+4 repeat 1+2
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    r = dedup_repeated_spans(df, "doc_id", "text", span_tokens=10).first()
    assert r["n_chunks"] == 5 and r["n_kept"] == 3
    assert r["text_clean"] == f"{base} tail0 tail1"
    # a doc with no repeats is untouched
    df2 = spark.createDataFrame([(2, base)], "doc_id long, text string")
    r2 = dedup_repeated_spans(df2, "doc_id", "text", span_tokens=10).first()
    assert r2["text_clean"] == base and r2["n_kept"] == r2["n_chunks"] == 2


def test_hash_sample_matches_stratified_mix_rows(spark):
    """Same rate ⇒ same rows from both APIs (raw-double threshold;
    0.3·10000 is not exactly representable — the truncation trap)."""
    df = spark.range(3000).select(
        F.col("id").alias("k"), F.lit("s").alias("src"))
    a = sorted(r["k"] for r in hash_sample(df, "k", 0.3).collect())
    b = sorted(r["k"] for r in
               stratified_mix(df, "src", "k", {"s": 0.3}).collect())
    assert a == b


def test_temperature_mix_rates_and_determinism(spark):
    """alpha=0.5 flattening: the head source is down-sampled, the tail
    keeps (up to) everything; the kept set is exactly the per-source
    hash sample at the closed-form rates, on any partitioning."""
    import math

    from hyperion_crawler_spark.operators.selection import (
        SAMPLE_MOD, hash_sample_keep, temperature_mix)

    sizes = {"big": 6400, "mid": 1600, "tiny": 100}
    rows = [(f"{s}-{i}", s) for s, n in sizes.items() for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id string, source string")

    out = temperature_mix(df, "source", "doc_id",
                          alpha=0.5, target_fraction=0.5)
    got = {s: 0 for s in sizes}
    for r in out.collect():
        got[r["source"]] += 1

    # closed-form rates
    tw = sum(math.sqrt(n) for n in sizes.values())
    tn = sum(sizes.values())
    rates = {s: min(1.0, (0.5 * tn * (math.sqrt(n) / tw)) / n)
             for s, n in sizes.items()}
    assert rates["tiny"] == 1.0          # tail capped at keep-everything
    assert rates["big"] < rates["mid"] < 1.0
    # exact expected counts: replay the same hash decision in Spark
    for s, n in sizes.items():
        sub = df.filter(F.col("source") == s)
        want = sub.filter(hash_sample_keep(F.col("doc_id"), rates[s])).count()
        assert got[s] == want, (s, got[s], want)

    # partition-independence: same kept set after a repartition
    ids = {r["doc_id"] for r in out.collect()}
    ids2 = {r["doc_id"] for r in
            temperature_mix(df.repartition(16), "source", "doc_id",
                            alpha=0.5, target_fraction=0.5).collect()}
    assert ids == ids2
