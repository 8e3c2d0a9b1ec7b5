"""Negative fetch paths: corrupted payloads, caption mismatches, and
missing corpus rows must quarantine — mirroring the reference's
drop-with-warning on invalid rows (transformer.py:86-89) without
poisoning the retry loop."""

from pyspark.sql import functions as F

from hyperion_crawler_spark.functions.images import encode, make_pixels
from hyperion_crawler_spark.plans.fetch import fetch_and_validate


def _scheduled(spark, rows):
    return spark.createDataFrame(
        rows,
        "urlhash long, url string, host string, image_id string, shard int, priority double,"
        "status string, retry_count int, next_fetch_ts long, discovered_round int")


def _corpus(spark, rows):
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long")


def _mk(image_id, w=16, h=16, fmt="hypng"):
    from hyperion_crawler_spark.functions.images import phash64

    px = make_pixels(image_id, w, h)
    return (image_id, bytearray(encode(px, fmt)), w, h, fmt,
            f"caption of {image_id} in en", phash64(px))


def _sched_row(h, image_id):
    # urlhash=1 would hit the deterministic transient-failure rule
    # ((h + 131*r) % 17 == 0); pick hashes that don't
    return (h, f"http://a.ex/{image_id}", "a.ex", image_id, 0, 0.5, "queued", 0, 0, 0)


def test_good_row_fetches(spark):
    sched = _scheduled(spark, [_sched_row(3, "img0000000001")])
    corpus = _corpus(spark, [_mk("img0000000001")])
    out = fetch_and_validate(sched, corpus).collect()
    assert out[0]["status"] == "fetched"


def test_corrupted_bytes_quarantined(spark):
    row = list(_mk("img0000000002"))
    row[1] = bytearray(b"\x00garbage payload")
    out = fetch_and_validate(_scheduled(spark, [_sched_row(3, "img0000000002")]),
                             _corpus(spark, [tuple(row)])).collect()
    assert out[0]["status"] == "quarantined"


def test_wrong_pixels_quarantined(spark):
    # bytes of a DIFFERENT image under this image_id → PSNR/phash fail
    wrong = list(_mk("img0000000099"))
    wrong[0] = "img0000000003"
    wrong[5] = "caption of img0000000003 in en"
    out = fetch_and_validate(_scheduled(spark, [_sched_row(3, "img0000000003")]),
                             _corpus(spark, [tuple(wrong)])).collect()
    assert out[0]["status"] == "quarantined"


def test_caption_mismatch_quarantined(spark):
    row = list(_mk("img0000000004"))
    row[5] = "caption of img0000000005 in en"  # wrong id inside caption
    out = fetch_and_validate(_scheduled(spark, [_sched_row(3, "img0000000004")]),
                             _corpus(spark, [tuple(row)])).collect()
    assert out[0]["status"] == "quarantined"
    assert out[0]["caption_ok"] is False


def test_missing_corpus_row_quarantined(spark):
    out = fetch_and_validate(_scheduled(spark, [_sched_row(3, "img0000000404")]),
                             _corpus(spark, [_mk("img0000000001")])).collect()
    assert out[0]["status"] == "quarantined"


def test_transient_failure_rule(spark):
    # urlhash 17 with retry 0: (17 + 0) % 17 == 0 → transient failure
    sched = _scheduled(spark, [_sched_row(17, "img0000000001")])
    corpus = _corpus(spark, [_mk("img0000000001")])
    out = fetch_and_validate(sched, corpus).collect()
    assert out[0]["status"] == "failed"
