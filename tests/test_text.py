"""Text-analysis kernels: two-tier language ID (Unicode-script
pre-classifier over the Latin stopword argmax)."""

from pyspark.sql import functions as F

from hyperion_crawler_spark.functions.text import lang_id, lang_id_scripted


def _guess(spark, fn, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r["g"] for r in
            df.select(fn(F.col("text")).alias("g")).collect()]


def test_script_tier_routes_non_latin(spark):
    texts = [
        "これは 日本語 の テキスト です",      # kana-dominant → ja
        "这是一段中文文本没有假名",            # ideographs only → zh
        "한국어 텍스트 입니다",                # hangul → ko
        "это русский текст привет мир",        # cyrillic → ru
        "هذا نص عربي قصير",                    # arabic → ar
        "αυτό είναι ελληνικό κείμενο",         # greek → el
    ]
    assert _guess(spark, lang_id_scripted, texts) == \
        ["ja", "zh", "ko", "ru", "ar", "el"]
    # the Latin-only heuristic answers 'unknown' for ALL of these —
    # the graceful-degradation gap the script tier closes
    assert _guess(spark, lang_id, texts) == ["unknown"] * 6


def test_latin_text_falls_through_to_stopword_argmax(spark):
    texts = [
        "the cat sat on the mat and it is warm",        # en
        "der Hund und die Katze ist ein Tier",          # de
        "qwzx qqq zzz",                                 # no evidence
    ]
    assert _guess(spark, lang_id_scripted, texts) == ["en", "de", "unknown"]


def test_mixed_script_below_dominance_uses_stopwords(spark):
    # a Latin document quoting a few foreign words must NOT be claimed
    # by the quoted script (30% dominance bar)
    t = "привет the cat sat on the mat and it is a very warm mat today"
    assert _guess(spark, lang_id_scripted, [t]) == ["en"]
    # ...but a mostly-Cyrillic doc with a couple Latin words IS Russian
    t2 = "это очень длинный русский текст ok да привет мир снова"
    assert _guess(spark, lang_id_scripted, [t2]) == ["ru"]


def test_japanese_beats_cjk_when_kana_present(spark):
    # Japanese text is kana+kanji; routing order must not call it zh
    t = "日本語のテキストですこれはとても良いです"
    assert _guess(spark, lang_id_scripted, [t]) == ["ja"]


def test_pii_redaction_and_counts(spark):
    from hyperion_crawler_spark.functions.text import pii_counts, redact_pii

    rows = [
        (1, "mail bob.smith+x@sub.example.co.uk now"),
        (2, "server at 10.0.0.1 and 192.168.1.255 up"),
        (3, "call +1 415-555-0199 or +44 20 7946 0958"),
        (4, "plain text with no identifiers at all"),
        (5, "mixed a@b.io on 8.8.8.8 dial +33 1 23 45 67 89"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", *pii_counts(F.col("text")),
        redact_pii(F.col("text")).alias("red")).collect()}
    assert out[1]["n_email"] == 1 and "<EMAIL>" in out[1]["red"]
    assert "bob" not in out[1]["red"]
    assert out[2]["n_ipv4"] == 2 and out[2]["red"].count("<IP>") == 2
    assert out[3]["n_phone"] == 2 and out[3]["red"].count("<PHONE>") == 2
    assert out[4]["n_email"] == out[4]["n_ipv4"] == out[4]["n_phone"] == 0
    assert out[4]["red"] == rows[3][1]
    assert (out[5]["n_email"], out[5]["n_ipv4"], out[5]["n_phone"]) == (1, 1, 1)
    assert out[5]["red"] == "mixed <EMAIL> on <IP> dial <PHONE>"
