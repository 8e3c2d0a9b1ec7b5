"""Dataset selection / mixing operators — deterministic hash-based
sampling for training-data pipelines.

A training mix ("40% of source A, 10% of source B, …") must be
REPRODUCIBLE and cluster-order-independent: ``df.sample()`` seeds per
partition, so a repartition, an AQE re-plan, or a resume changes which
rows survive. The standard fix is content-hash Bernoulli sampling:
keep a row iff ``hash(key) mod M < rate·M``. The decision depends only
on the row's key — stable across runs, partitionings, and engines, and
(with the portable 60-bit SHA-256 hash this repo uses for its DuckDB
oracles) mirrorable in ANSI SQL (q53) — PROVIDED the mirror computes
the ``rate * M`` threshold in IEEE double like this module does. A
mirror that evaluates it in DECIMAL arithmetic diverges by one
boundary bucket for rates not exactly representable in binary
(0.3 · 10000 → 2999.999… in double vs 3000 in decimal); either write
the SQL threshold as a double expression (DuckDB: ``0.3e0 * 10000``)
or pre-round the threshold to an integer on BOTH sides (ADVICE r4).

Scale shape: pure Catalyst filter — no shuffle, no RNG state, pushes
down past column pruning; the per-source rate lookup is a literal CASE
(broadcast-free). Reference analog: the crawl scheduler's deterministic
transient-failure mask uses the same keyed-hash trick
(plans/fetch.py); ``salt`` gives independent resamples.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash60

SAMPLE_MOD = 10_000  # rate resolution 0.01% — matches the SQL mirror


def hash_sample_keep(key: Column, rate: float, salt: str = "") -> Column:
    """Boolean keep-decision: deterministic Bernoulli(rate) on the key.
    ``salt`` derives an independent sample from the same keys.

    The threshold is the RAW double ``rate * SAMPLE_MOD`` — identical
    to ``stratified_mix`` and the q53 SQL mirror, so the same rate
    always selects the same rows across all three (an ``int()``
    truncation here would drop boundary buckets for rates not exactly
    representable at 1/SAMPLE_MOD, e.g. 0.3·10000 → 2999.999… → 2999,
    diverging from the mix operator by one bucket)."""
    h = portable_hash60(F.concat(F.lit(salt), F.lit("|"), key.cast("string")))
    return F.pmod(h, F.lit(SAMPLE_MOD)) < F.lit(rate * SAMPLE_MOD)


def hash_sample(df: DataFrame, key_col: str, rate: float,
                salt: str = "") -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows by key hash."""
    return df.filter(hash_sample_keep(F.col(key_col), rate, salt))


def stratified_mix(df: DataFrame, source_col: str, key_col: str,
                   rates: dict[str, float], default_rate: float = 0.0,
                   salt: str = "") -> DataFrame:
    """Dataset mixing: per-source deterministic sampling rates (the
    "epochs per source" knob of a pretraining mix). Sources absent
    from ``rates`` get ``default_rate``. One Catalyst filter; no
    shuffle; reproducible row-for-row across runs and engines."""
    rate = None
    for src, r in sorted(rates.items()):
        cond = F.col(source_col) == src
        rate = (F.when(cond, F.lit(float(r))) if rate is None
                else rate.when(cond, F.lit(float(r))))
    rate = (rate.otherwise(F.lit(float(default_rate))) if rate is not None
            else F.lit(float(default_rate)))
    h = portable_hash60(F.concat(F.lit(salt), F.lit("|"),
                                 F.col(key_col).cast("string")))
    return df.filter(F.pmod(h, F.lit(SAMPLE_MOD)) < rate * SAMPLE_MOD)


def temperature_mix(df: DataFrame, source_col: str, key_col: str,
                    alpha: float = 0.5, target_fraction: float = 0.5,
                    salt: str = "") -> DataFrame:
    """Temperature-weighted dataset mixing — the multilingual /
    domain-balancing ``n_i^alpha`` reweighting (XLM-R / mC4 / GPT-3
    style): group sizes ``n_i`` flatten to weights
    ``w_i = n_i^alpha / Σ_j n_j^alpha`` and each group keeps
    ``rate_i = least(1, (target_fraction · N · (w_i/Σw)) / n_i)``, so
    the sample totals ≈ ``target_fraction·N`` rows distributed by the
    temperature weights — head domains down-sampled, tail domains
    keeping a larger share than their natural frequency.

    Determinism/oracle: ``alpha=0.5`` routes through ``sqrt()``, which
    IEEE-754 requires to be CORRECTLY ROUNDED — bit-identical in Spark
    and DuckDB, so the q53 value oracle holds exactly. Other alphas use
    ``pow()``, whose last ulp is libm-specific; a cross-engine mirror
    could then flip one boundary hash bucket (same class as the
    ADVICE-r4 threshold note in this module's docstring).

    Scale shape: one map-side-combinable count per group, a 1-row
    totals aggregate, and a broadcast rate lookup over the corpus scan
    — corpus rows never shuffle; the keep-decision is the same
    portable_hash60 Bernoulli as hash_sample/stratified_mix, so the
    kept set is reproducible row-for-row across runs, partitionings,
    and engines."""
    counts = df.groupBy(source_col).agg(F.count("*").alias("_n"))
    wexpr = (F.sqrt(F.col("_n").cast("double")) if alpha == 0.5
             else F.pow(F.col("_n").cast("double"), F.lit(float(alpha))))
    w = counts.select(F.col(source_col), F.col("_n"), wexpr.alias("_w"))
    tot = w.agg(F.sum("_w").alias("_tw"), F.sum("_n").alias("_tn"))
    rates = (w.crossJoin(F.broadcast(tot))
              .select(F.col(source_col),
                      F.least(
                          F.lit(1.0),
                          (F.lit(float(target_fraction)) * F.col("_tn")
                           * (F.col("_w") / F.col("_tw"))) / F.col("_n"))
                       .alias("_rate")))
    h = portable_hash60(F.concat(F.lit(salt), F.lit("|"),
                                 F.col(key_col).cast("string")))
    # null-safe join: a NULL source is a legitimate group (groupBy
    # emitted a rate row for it); a plain equi-join would silently drop
    # every NULL-source row — neither sampled nor counted — where
    # stratified_mix's CASE gives them default_rate
    r2 = rates.withColumnRenamed(source_col, "_rate_src")
    return (df.join(F.broadcast(r2),
                    F.col(source_col).eqNullSafe(F.col("_rate_src")))
              .filter(F.pmod(h, F.lit(SAMPLE_MOD)) < F.col("_rate") * F.lit(SAMPLE_MOD))
              .drop("_rate", "_rate_src"))
