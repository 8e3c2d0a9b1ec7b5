"""functions/bpe.py — the deterministic DataFrame-job BPE trainer
(round-5 verdict 'Next round' #2): merges must equal the classic
Sennrich '16 algorithm bit-for-bit, on any partitioning; encoding must
equal the trainer's own final word states; packing accepts BPE
lengths."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from hyperion_crawler_spark.functions import bpe as B
from hyperion_crawler_spark.operators.packing import pack_sequences


def ref_train(words: list[str], n: int) -> list[tuple[str, str]]:
    """Pure-python Sennrich trainer: most frequent adjacent pair, ties
    broken lexicographically, greedy left-to-right merge application."""
    vocab: dict[tuple, int] = {}
    for w, c in Counter(words).items():
        vocab[tuple(w)] = vocab.get(tuple(w), 0) + c
    out = []
    for _ in range(n):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        out.append(best)
        nxt: dict[tuple, int] = {}
        for syms, c in vocab.items():
            s, i, r = list(syms), 0, []
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    r.append(s[i] + s[i + 1])
                    i += 2
                else:
                    r.append(s[i])
                    i += 1
            nxt[tuple(r)] = nxt.get(tuple(r), 0) + c
        vocab = nxt
    return out


def ref_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    s = list(word)
    for a, b in merges:
        i, r = 0, []
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                r.append(a + b)
                i += 2
            else:
                r.append(s[i])
                i += 1
        s = r
    return s


CORPUS = ("low low low low low lower lower newest newest newest "
          "newest newest newest widest widest widest")


def test_trainer_matches_sennrich_reference(spark):
    df = spark.createDataFrame([(CORPUS,)], "text string")
    got = B.bpe_train(df, "text", n_merges=10)
    want = ref_train(CORPUS.split(), 10)
    assert got == want
    # the classic example's early merges
    assert got[:4] == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]


def test_trainer_deterministic_across_partitionings(spark):
    rows = [(f"doc {i % 7} alpha beta beta gamma{i % 3} delta delta "
             f"epsilon zeta eta theta{i % 5}",) for i in range(200)]
    df = spark.createDataFrame(rows, "text string")
    m1 = B.bpe_train(df, "text", n_merges=12)
    m2 = B.bpe_train(df.repartition(13), "text", n_merges=12)
    m3 = B.bpe_train(df.coalesce(1), "text", n_merges=12)
    assert m1 == m2 == m3
    words = [w for r in rows for w in r[0].split()]
    assert m1 == ref_train(words, 12)


def test_encode_matches_reference_and_trainer_state(spark):
    df = spark.createDataFrame([(CORPUS,)], "text string")
    merges = B.bpe_train(df, "text", n_merges=6)
    out = df.select(B.bpe_tokens(F.col("text"), merges).alias("t"),
                    B.bpe_token_count(F.col("text"), merges).alias("n")
                    ).collect()[0]
    want = [tok for w in CORPUS.split() for tok in ref_encode(w, merges)]
    assert list(out["t"]) == want
    assert out["n"] == len(want)
    # greedy overlap semantics: merge (a,a) on 'aaaa' → ['aa','aa'],
    # on 'aaa' → ['aa','a'] (left-to-right non-overlapping)
    e = spark.createDataFrame([("aaaa aaa",)], "text string").select(
        B.bpe_tokens(F.col("text"), [("a", "a")]).alias("t")).collect()[0]
    assert list(e["t"]) == ["aa", "aa", "aa", "a"]


def test_encode_strips_delimiter_and_handles_whitespace(spark):
    # chr(31) in input is scrubbed, not a crash or a fake symbol;
    # repeated/leading whitespace yields no empty words
    df = spark.createDataFrame([("ab\x1fc   d  ",)], "text string")
    out = df.select(B.bpe_tokens(F.col("text"), [("a", "b")]).alias("t")
                    ).collect()[0]
    assert list(out["t"]) == ["ab", "c", "d"]


def test_merges_df_shape(spark):
    mdf = B.merges_df(spark, [("e", "s"), ("es", "t")])
    assert [tuple(r) for r in mdf.collect()] == [
        (1, "e", "s", "es"), (2, "es", "t", "est")]


def test_pack_sequences_on_bpe_lengths(spark):
    """The packing invariant suite holds when lengths are BPE token
    counts (the verdict's 'switch packing to BPE behind a flag' —
    pack_sequences takes any len_col; this pins the BPE route)."""
    rows = [(i, "lowest newest widest low " * (1 + i % 4))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    merges = B.bpe_train(df, "text", n_merges=8)
    lens = df.select("doc_id",
                     B.bpe_token_count(F.col("text"), merges).alias("n_bpe"))
    packs = pack_sequences(lens, "doc_id", "n_bpe", window=64).collect()
    by_id = {r["doc_id"]: r["n_bpe"] for r in lens.collect()}
    seen = []
    for p in packs:
        assert p["fill"] == sum(by_id[int(d)] for d in p["doc_ids"])
        assert p["fill"] <= 64 or p["n_docs"] == 1   # oversized singleton
        seen.extend(int(d) for d in p["doc_ids"])
    assert sorted(seen) == list(range(40))           # every doc exactly once


def test_trainer_early_stop_when_fully_fused(spark):
    df = spark.createDataFrame([("ab ab ab",)], "text string")
    merges = B.bpe_train(df, "text", n_merges=10)
    assert merges == [("a", "b")]                    # then no pairs remain
