"""Deterministic byte-pair-encoding subword tokenizer, trained as a
DataFrame job (round-5 verdict 'Next round' #2).

Training follows Sennrich et al. '16 ("Neural Machine Translation of
Rare Words with Subword Units"): start from characters, repeatedly
merge the corpus-wide most frequent adjacent symbol pair. The trainer
is the same job shape as ``operators/quality.py``'s LMS loop — per
merge round ONE map-side-combinable aggregation and O(1) driver state
(the merge list) — and it runs over the DISTINCT-WORD frame: the one
corpus-scale shuffle happens up front (``word_counts``), after which
every round costs O(|distinct words|) regardless of corpus size, the
standard trainer factorization (HuggingFace tokenizers does the same).

Determinism: pair counts are exact integer sums (any partitioning),
and the argmax tie-breaks on (count DESC, left ASC, right ASC) via a
single ``min(struct(-count, left, right))`` — same merges, bit for
bit, on any cluster. That makes the merge table and every derived
token count DuckDB-mirrorable (the q56 oracle unrolls the training
rounds as CTEs, like q59 does for LMS).

Physical trick: symbol sequences live in a DELIMITED-STRING form —
each symbol wrapped as ``D<sym>D`` with D = chr(31) (sanitized from
input), so a word is ``concat_ws('', 'D'+c+'D' per char)``. Applying
merge (a, b) is then ONE JVM string replace of ``DaDDbD`` with
``DabD``: SQL ``replace`` scans left-to-right non-overlapping, which
is exactly the greedy BPE merge order, and because every symbol keeps
its own delimiters on both sides, adjacent matches never share
characters (no lost second occurrence) and a symbol boundary can never
match inside another symbol. No arrays, no explode, no UDF — encoding
with n merges is an n-deep chain of codegen'd string replaces.

Reference analog: the reference normalizes/tokenizes text fields in
its transform stage (api/src/etl/krx/transformer.py:40-78); real
subword counts are what a pretraining pipeline budgets and packs by
(SURVEY §2 LLM-extension surface). ``operators/packing.py`` and the
token-stats queries accept these counts behind a flag.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

D = "\x1f"          # symbol delimiter (ASCII unit separator)
DD = D + D

# Explicit whitespace class, IDENTICAL in Java regex (Spark) and RE2
# (DuckDB oracles): Java's \s includes \x0B but RE2's does not, so a
# bare \s+ tokenizes 'foo\x0Bbar' differently across engines and the
# merge tables diverge (review r6). Java \s == this class exactly.
WS = r"[ \t\n\x0B\f\r]+"


def _delim_word(word: Column) -> Column:
    """word → its initial character-level delimited form ``DcDDcD…``.
    chr(31) is stripped from the input first — the delimiter may not
    occur inside a symbol (it never does in real text; the scrub makes
    it a guarantee rather than an assumption)."""
    clean = F.regexp_replace(word, D, "")
    return F.regexp_replace(clean, "(.)", D + "$1" + D)


def _seq(delimited: Column) -> Column:
    """Delimited string → array<string> of symbols."""
    return F.split(F.btrim(delimited, F.lit(D)), DD)


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the corpus — the single corpus-scale shuffle
    of the whole trainer (map-side-combinable hash agg on the word)."""
    w = F.explode(F.split(F.col(text_col), WS)).alias("word")
    return (df.select(w).filter(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def bpe_train(df: DataFrame, text_col: str, n_merges: int = 64
              ) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the
    ordered merge list [(left, right), …]. Stops early when no
    adjacent pair remains (every word fused to one symbol).

    Per round: pairs are ``arrays_zip(slice(syms,1,n-1),
    slice(syms,2,n-1))`` exploded (generator evaluates the array once
    per row — no HOF re-inline hazard), summed by (a, b) with word
    frequency as weight, and the argmax collected as ONE row. Each
    round's words frame is ``localCheckpoint``ed (eager — the round's
    aggregation materializes it anyway): persist alone caches DATA but
    leaves the LOGICAL plan nested one level per round, and driver-side
    plan processing on the nested InMemoryRelations measured ~2× cost
    PER ROUND from round ~10 (0.5 s → 11 s by round 14 on sf0.1) —
    the same iterative-plan blowup dup_clusters hit; checkpointing
    flattens each round to a LogicalRDD so round cost stays constant."""
    wc = word_counts(df, text_col).select(
        _delim_word(F.col("word")).alias("_s"), "freq")
    merges: list[tuple[str, str]] = []
    # lazy checkpoints (r7): each round's PAIR AGGREGATION touches every
    # partition and therefore materializes the checkpoint as a side
    # effect — an eager checkpoint paid one extra full pass per round
    # just to materialize before aggregating. Plans stay flat either
    # way; the merge list is unchanged.
    cur = wc.localCheckpoint(eager=False)   # flat plan, upstream runs once
    for _ in range(n_merges):
        a = F.col("_a")
        n = F.size(a)
        pairs_arr = F.arrays_zip(
            F.slice(a, 1, n - 1).alias("a"),
            F.slice(a, 2, n - 1).alias("b"))
        best = (cur.select("freq", _seq(F.col("_s")).alias("_a"))
                .select("freq", F.explode(pairs_arr).alias("_p"))
                .groupBy(F.col("_p.a").alias("a"),
                         F.col("_p.b").alias("b"))
                .agg(F.sum("freq").alias("cnt"))
                .select(F.min(F.struct(
                    (-F.col("cnt")).alias("nc"),
                    F.col("a"), F.col("b"))).alias("m"))
                ).collect()[0]["m"]
        if best is None:                # no pairs anywhere: done
            break
        left, right = best["a"], best["b"]
        merges.append((left, right))
        cur = cur.select(
            F.replace(F.col("_s"),
                      F.lit(D + left + DD + right + D),
                      F.lit(D + left + right + D)).alias("_s"),
            "freq").localCheckpoint(eager=False)
    return merges


def apply_merges(delimited: Column, merges: list[tuple[str, str]]) -> Column:
    """Chain the learned merges (in training order) over a delimited
    symbol string — n literal JVM string replaces, pure Catalyst."""
    out = delimited
    for left, right in merges:
        out = F.replace(out, F.lit(D + left + DD + right + D),
                        F.lit(D + left + right + D))
    return out


def encode_word(word: Column, merges: list[tuple[str, str]]) -> Column:
    """word → array<string> of its BPE tokens."""
    return _seq(apply_merges(_delim_word(word), merges))


def bpe_tokens(text: Column, merges: list[tuple[str, str]]) -> Column:
    """Whitespace-pretokenized BPE segmentation of a text column →
    array<string>. The merge chain sits inside a transform lambda, so
    it runs once per WORD (single-reference chain — no HOF-CSE
    blowup)."""
    words = F.filter(F.split(text, WS), lambda w: w != F.lit(""))
    return F.flatten(F.transform(words, lambda w: encode_word(w, merges)))


def bpe_token_count(text: Column, merges: list[tuple[str, str]]) -> Column:
    """Number of BPE tokens in ``text`` — the real packing/budgeting
    unit (whitespace ``token_count`` stays the cheap default)."""
    return F.size(bpe_tokens(text, merges))


def merges_df(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """The merge table as a DataFrame (step, left, right, merged) —
    the persistable artifact a pipeline ships with its checkpoints."""
    rows = [(i + 1, a, b, a + b) for i, (a, b) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "step int, left string, right string, merged string")
