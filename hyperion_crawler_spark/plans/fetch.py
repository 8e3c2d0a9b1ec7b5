"""Fetch + per-row validation — mapInPandas kernel (SURVEY §2.1 S1).

The reference's extract phase is an off-thread HTTP fetch per batch
(/root/reference/api/src/etl/krx/extractor.py:39-59 — run_in_executor +
pykrx network call). Here the "fetch" is a join against the image+
caption corpus table (the synthetic web), and the per-row validity gate
(reference: /root/reference/api/src/etl/krx/transformer.py:197-231 —
close non-null, high ≥ all, low ≤ all …) becomes the input_hint's
invariant: decoded-pixel allclose vs ground truth (PSNR ≥ 40 dB for
lossy formats, bit-exact for lossless), recomputed phash == stored
phash, and exact caption equality.

Transient failures are simulated deterministically —
``(urlhash + 131·retry_count) mod 17 == 0`` (unsigned) — so the
retry/backoff machinery (reference workflow retry blocks:
/root/reference/workflows/krx_etl_workflow.yaml:43-47,266-271) is
exercised reproducibly and the parity oracle can mirror it exactly.

Statuses: ``fetched`` (valid) / ``failed`` (transient, retryable) /
``quarantined`` (validation failure, never retried — mirrors the
reference's drop-with-warning, transformer.py:86-89).

The kernel iterates Arrow batches; pixel math is numpy. The only
per-row loop is over variable-size binary blobs (unavoidable for opaque
payloads); ``bytes`` is projected into the plan ONLY here — every other
stage prunes it (SURVEY §7 "what's hard" #4).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions.images import LOSSY_FMTS, decode, make_pixels, phash64, psnr_db

FETCH_OUT_SCHEMA = (
    "urlhash long, url string, host string, image_id string, retry_count int, "
    "priority double, shard int, discovered_round int, "
    "status string, psnr_db double, caption_ok boolean, phash long, caption string"
)

_CAPTION_RE = re.compile(r"^caption of (img\d{10}) in (en|ko|de|ja|fr)$")
PSNR_GATE_DB = 40.0
FAIL_MOD = 17


def transient_failure_mask(urlhash: np.ndarray, retry: np.ndarray) -> np.ndarray:
    """Deterministic simulated fetch failure (uint64 arithmetic)."""
    u = urlhash.astype(np.uint64)
    with np.errstate(over="ignore"):
        v = u + np.uint64(131) * retry.astype(np.uint64)
    return (v % np.uint64(FAIL_MOD)) == 0


def _fetch_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        n = len(pdf)
        if n == 0:
            continue
        status = np.empty(n, dtype=object)
        psnr = np.full(n, np.nan)
        cap_ok = np.zeros(n, dtype=bool)
        phash_out = np.zeros(n, dtype=np.int64)

        fail = transient_failure_mask(
            pdf["urlhash"].to_numpy(np.int64), pdf["retry_count"].to_numpy(np.int64)
        )
        blobs = pdf["bytes"].to_numpy(object)
        img_ids = pdf["image_id"].to_numpy(object)
        ws = pdf["w"].to_numpy(np.int64)
        hs = pdf["h"].to_numpy(np.int64)
        fmts = pdf["fmt"].to_numpy(object)
        caps = pdf["caption"].to_numpy(object)
        stored_ph = pdf["phash"].to_numpy(np.int64)

        for i in range(n):
            if fail[i]:
                status[i] = "failed"
                continue
            try:
                px = decode(bytes(blobs[i]))
            except Exception:
                status[i] = "quarantined"
                continue
            truth = make_pixels(str(img_ids[i]), int(ws[i]), int(hs[i]))
            p = psnr_db(px, truth)
            psnr[i] = p if np.isfinite(p) else 99.0
            lossy = fmts[i] in LOSSY_FMTS
            pixels_ok = (p >= PSNR_GATE_DB) if lossy else np.array_equal(px, truth)
            ph = phash64(px)
            phash_out[i] = ph
            # perceptual hashes are compared by hamming distance: lossy
            # re-encoding may flip borderline cells (≤2 tolerated);
            # lossless must match exactly
            dist = bin((ph ^ int(stored_ph[i])) & ((1 << 64) - 1)).count("1")
            phash_ok = dist <= (2 if lossy else 0)
            m = _CAPTION_RE.match(str(caps[i]))
            cap_ok[i] = bool(m and m.group(1) == str(img_ids[i]))
            status[i] = "fetched" if (pixels_ok and cap_ok[i] and phash_ok) else "quarantined"

        out = pdf[["urlhash", "url", "host", "image_id", "retry_count", "priority",
                   "shard", "discovered_round", "caption"]].copy()
        out["status"] = status
        out["psnr_db"] = psnr
        out["caption_ok"] = cap_ok
        out["phash"] = phash_out
        yield out[["urlhash", "url", "host", "image_id", "retry_count", "priority",
                   "shard", "discovered_round", "status", "psnr_db", "caption_ok",
                   "phash", "caption"]]


def fetch_and_validate(scheduled: DataFrame, corpus: DataFrame) -> DataFrame:
    """scheduled(frontier cols) ⨝ corpus(image_id) → validated results.

    The corpus side carries the BinaryType payload; Catalyst prunes it
    from every other stage because only this join selects ``bytes``.
    """
    payload = scheduled.join(
        corpus.select("image_id", "bytes", "w", "h", "fmt", "caption", "phash"),
        "image_id",
        "left",
    )
    return payload.mapInPandas(_fetch_kernel, FETCH_OUT_SCHEMA)
