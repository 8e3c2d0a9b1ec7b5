"""Document relevance ranking — Okapi BM25 over the ``documents``
table (training-data-pipeline operator: score documents against a
keyword description of the target distribution, keep the top slice).

Pure Catalyst: tokenize → explode only the query-term hits (the
explode is pre-filtered, so its fan-out is ∝ query-term occurrences,
not corpus tokens) → per-(doc,term) tf hash-aggregate → broadcast the
two tiny dimensions back (corpus stats: 1 row; per-term df: ≤ |query|
rows). One shuffle on doc id; everything else is map-side or
broadcast. No Python UDFs.

Portability: tokenization is ``lower`` + split on ``[^a-z0-9]+`` and
all scoring math is plain double arithmetic with ``ln`` — DuckDB
mirrors every step exactly (oracle q40). Per-term contributions are
rounded to 9 digits BEFORE the per-doc sum and the final score to 6
digits, so float-sum ordering differences between engines can't flip
the value hash (same grain policy as the PageRank oracle).

The reference's nearest analog is its consensus screen (rating counts
ordered by agreement — api/src/etl/krx/transformer.py:210-219): an
engine-side relevance ordering over free text rather than structured
votes.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text):
    return F.filter(F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != "")


def _p9(col):
    return F.floor(col * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)


def bm25_scores(docs: DataFrame, id_col: str, text_col: str,
                query_terms: list[str], k1: float = 1.2, b: float = 0.75
                ) -> DataFrame:
    """Okapi BM25 score of every document against ``query_terms``.

    score(D) = Σ_t idf(t) · tf(t,D)·(k1+1) / (tf(t,D) + k1·(1 − b + b·|D|/avgdl))
    idf(t)  = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))

    Returns (id_col, score) for ALL input documents — no-hit documents
    score 0.0 (they still matter downstream: "keep top-k" must see
    them lose, not silently drop them).

    Physical plan (r7): when every query term is a plain ``[a-z0-9]+``
    literal, tf(t,D) is one ``regexp_count`` per term with token-
    boundary lookarounds — a token (maximal alnum run of the lowered
    text) equals t iff t appears with no alnum neighbor — so the whole
    tf matrix is a single shuffle-free projection. Corpus stats (N,
    Σdl, df per term) reduce to ONE map-side-combinable aggregate row,
    broadcast back, and the score is a second projection: zero
    explodes, zero groupBy-shuffles, zero interpreted HOF token
    lambdas (the previous plan paid all three; guide §2.4/§4.1).
    Per-term contributions keep the 9-digit pre-round grain, so the
    Σ_t order (now the fixed sorted-term order) agrees with any
    engine's fold to the 6-digit output grain — same tolerance the
    groupBy sum already relied on. Non-literal terms keep the
    explode + aggregate form."""
    terms = sorted(set(query_terms))
    if all(re.fullmatch(r"[a-z0-9]+", t) for t in terms):
        lt = F.lower(F.col(text_col))
        tf_cols = [F.regexp_count(
            lt, F.lit(f"(?<![a-z0-9]){t}(?![a-z0-9])")).alias(f"_tf{j}")
            for j, t in enumerate(terms)]
        base = docs.select(
            F.col(id_col),
            F.regexp_count(lt, F.lit("[a-z0-9]+")).alias("_dl"), *tf_cols)
        stats = base.agg(
            F.count(F.lit(1)).alias("_n"), F.sum("_dl").alias("_sumdl"),
            *[F.sum(F.when(F.col(f"_tf{j}") > 0, 1).otherwise(0))
              .alias(f"_df{j}") for j in range(len(terms))])
        scored = base.crossJoin(F.broadcast(stats))
        avgdl = F.col("_sumdl").cast("double") / F.col("_n")
        acc = F.lit(0.0)
        for j in range(len(terms)):
            tf, dfj = F.col(f"_tf{j}"), F.col(f"_df{j}")
            idf = F.log(F.lit(1.0) + (F.col("_n") - dfj + F.lit(0.5))
                        / (dfj + F.lit(0.5)))
            denom = tf + F.lit(k1) * (F.lit(1.0 - b)
                                      + F.lit(b) * F.col("_dl") / avgdl)
            acc = acc + F.when(
                tf > 0, _p9(idf * (tf * F.lit(k1 + 1.0)) / denom)
            ).otherwise(F.lit(0.0))
        return scored.select(
            F.col(id_col),
            (F.floor(acc * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("score"))

    term_arr = F.array(*[F.lit(t) for t in terms])
    base = docs.select(F.col(id_col), _tokens(F.col(text_col)).alias("_toks")) \
               .withColumn("_dl", F.size("_toks"))

    # corpus stats: one row, broadcast back
    stats = base.agg(F.count(F.lit(1)).alias("_n"),
                     F.sum("_dl").alias("_sumdl"))

    # tf per (doc, term): explode only query-term hits
    tf = (base.select(id_col, "_dl",
                      F.explode(F.filter(
                          F.col("_toks"),
                          lambda t: F.array_contains(term_arr, t))).alias("_term"))
          .groupBy(id_col, "_term", "_dl").agg(F.count(F.lit(1)).alias("_tf")))

    # df per term: ≤ |query_terms| rows, broadcast back
    df_t = tf.groupBy("_term").agg(F.count(F.lit(1)).alias("_df"))

    scored = (tf.join(F.broadcast(df_t), "_term")
                .crossJoin(F.broadcast(stats)))
    avgdl = F.col("_sumdl").cast("double") / F.col("_n")
    idf = F.log(F.lit(1.0) + (F.col("_n") - F.col("_df") + F.lit(0.5))
                / (F.col("_df") + F.lit(0.5)))
    denom = F.col("_tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / avgdl)
    contrib = _p9(idf * (F.col("_tf") * F.lit(k1 + 1.0)) / denom)
    per_doc = scored.groupBy(id_col).agg(F.sum(contrib).alias("_s"))

    out = (base.select(id_col).join(per_doc, id_col, "left")
           .select(F.col(id_col),
                   (F.floor(F.coalesce(F.col("_s"), F.lit(0.0)) * F.lit(1e6)
                            + F.lit(0.5)) / F.lit(1e6)).alias("score")))
    return out


def bm25_topk(docs: DataFrame, id_col: str, text_col: str,
              query_terms: list[str], k: int,
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Global top-``k`` documents by BM25 score (score DESC, id ASC —
    the deterministic total order every ranked operator here uses).
    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject: each
    partition keeps a local k-heap and only k·partitions rows reach
    the final select — no global sort materializes."""
    out = bm25_scores(docs, id_col, text_col, query_terms, k1, b)
    return out.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
