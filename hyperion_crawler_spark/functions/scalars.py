"""Reference scalar-function library re-expressed as Catalyst Column
expressions (SURVEY §2.8 F1-F16) — JVM-side, whole-stage-codegen'd; the
reference computes each per-row in interpreted Python.

Each function cites its reference implementation; semantics (null on
parse failure, currency-symbol stripping, weekend roll, etc.) follow
the reference exactly and are cross-checked against the DuckDB oracle
in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_date(col: Column, fmt: str = "yyyy-MM-dd") -> Column:
    """F1 — parse string/date → 'yyyy-MM-dd' string, null on failure.
    ``try_to_date`` keeps the reference's None-on-parse-error contract
    under Spark 4 ANSI mode (which makes plain to_date throw).
    Ref: normalize_date, api/src/etl/base/transformer.py:61-76."""
    return F.date_format(F.try_to_timestamp(col, F.lit(fmt)).cast("date"), "yyyy-MM-dd")


def clean_numeric(col: Column) -> Column:
    """F2 — strip currency symbols/commas → double, null on failure
    (try_cast for ANSI-mode null-on-error semantics).
    Ref: clean_numeric, api/src/etl/base/transformer.py:78-95."""
    return F.regexp_replace(col.cast("string"), r"[,$₩]", "").try_cast("double")


def change_amount(close: Column, rate: Column) -> Column:
    """F3 — round(close*rate/100, 2).
    Ref: calculate_change_amount, api/src/etl/base/transformer.py:144-148."""
    return F.round(close * rate / 100.0, 2)


def trading_value(price: Column, volume: Column) -> Column:
    """F4 — round(price*volume, 2).
    Ref: calculate_trading_value, api/src/etl/base/transformer.py:150-154."""
    return F.round(price * volume, 2)


def normalize_market_cap(value: Column, unit_threshold: float = 1e8,
                         unit_scale: float = 1e8) -> Column:
    """F5 — values below the unit threshold are in 억원-style units and
    get scaled up by the FIXED unit conversion; falsy input (0 or NULL)
    is NULL, the reference's ``if not value: return None`` contract
    (same quirk as F8 normalize_target_price). Threshold and scale are
    independent constants — the reference detects with < 1e8 and scales
    by exactly 1e8 regardless (r5 review: the old single param
    conflated them and 0 passed through as 0.0).
    Ref: normalize_market_cap, api/src/etl/base/transformer.py:156-169."""
    scaled = F.when(value < unit_threshold, value * unit_scale).otherwise(value)
    return F.when(value.isNull() | (value == 0),
                  F.lit(None).cast("double")).otherwise(scaled.cast("double"))


def normalize_identifier(col: Column, id_type: str = "ticker") -> Column:
    """F6 — uppercase ticker / zero-pad CIK(10) / corp_code(8).
    Ref: normalize_company_identifier, api/src/etl/base/transformer.py:192-201."""
    if id_type == "ticker":
        return F.upper(col)
    if id_type == "cik":
        return F.lpad(col.cast("string"), 10, "0")
    if id_type == "corp_code":
        return F.lpad(col.cast("string"), 8, "0")
    raise ValueError(id_type)


def normalize_rating(col: Column, mapping: dict[str, str] | None = None) -> Column:
    """F7 — lowercase, space/dash → underscore, then literal-map lookup.
    Ref: normalize_rating, api/src/etl/base/transformer.py:210-219."""
    norm = F.translate(F.lower(col), " -", "__")
    if not mapping:
        return norm
    m = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    return F.coalesce(m[norm], norm)


def weekend_roll(d: Column) -> Column:
    """F9 — roll Saturday/Sunday back to Friday (dayofweek: 1=Sun,7=Sat).
    Ref: get_trade_date, api/src/etl/base/extractor.py:81-93."""
    return (
        F.when(F.dayofweek(d) == 1, F.date_sub(d, 2))
        .when(F.dayofweek(d) == 7, F.date_sub(d, 1))
        .otherwise(F.to_date(d))
    )


def parse_symbols(col: Column) -> Column:
    """F11 — split CSV, trim, uppercase. Falsy input (empty string or
    NULL) yields an EMPTY array, the reference's
    ``if not params.get('symbols'): return []`` — a bare split('')
    would return [''] and leak an empty ticker downstream (r5 review).
    Ref: parse_symbols, api/src/etl/base/extractor.py:126-137."""
    return F.when(col.isNull() | (col == ""),
                  F.array().cast("array<string>")) \
            .otherwise(F.transform(F.split(col, ","),
                                   lambda x: F.upper(F.trim(x))))


def task_id(source: str, suffix: str, round_col: Column) -> Column:
    """F12 — deterministic task id: source_suffix_round (the reference
    embeds wall clock — extractor.py:51-57; we use round indices so
    runs are reproducible)."""
    return F.concat_ws("_", F.lit(source), F.lit(suffix), round_col.cast("string"))


def add_metadata(df, source: str, round_col: Column):
    """F13 — stamp lineage columns on each row.
    Ref: add_metadata, api/src/etl/base/loader.py:211-220."""
    return (df.withColumn("created_round", round_col)
              .withColumn("updated_round", round_col)
              .withColumn("data_source", F.lit(source)))


def json_field(col: Column, path: str) -> Column:
    """F16 — JSON column access.
    Ref: parameters/result_summary JSON, api/src/models/task_log.py:26-27."""
    return F.get_json_object(col, path)


def normalize_target_price(price: Column, currency: Column | str = "USD") -> Column:
    """F8 — struct(target_price, currency), NULL when the cleaned price
    is null OR zero: the reference's ``if not numeric_price`` falsy
    check maps 0 to None too, and that quirk is preserved.
    Ref: normalize_target_price, api/src/etl/base/transformer.py:239-248."""
    cur = F.lit(currency) if isinstance(currency, str) else currency
    p = clean_numeric(price)
    return F.when(p.isNotNull() & (p != 0.0),
                  F.struct(p.alias("target_price"), cur.alias("currency")))


def filing_date_range(start: Column, end: Column, single: Column, today: Column) -> Column:
    """F10 — struct(range_start, range_end): (start, end) when both
    params are present, (date, date) when the single param is, else
    (today, today). Params are ``yyyyMMdd`` strings like the reference's
    ``strptime(..., "%Y%m%d")``; ``today`` is an injected deterministic
    reference date (the reference calls ``date.today()`` — wall clock is
    banned here for reproducibility, same policy as F12 task_id).
    Parse failures yield null bounds (try_-semantics) instead of the
    reference's raised ValueError — the engine's quarantine-not-crash
    contract. Branch selection is FALSY like the reference's
    ``params.get("start_date") and params.get("end_date")``: an
    empty-string param counts as absent and falls through to the next
    branch, it does not select a null-bound (start, end) struct.
    Ref: get_filing_date_range, api/src/etl/base/extractor.py:102-117."""
    s = F.try_to_timestamp(start, F.lit("yyyyMMdd")).cast("date")
    e = F.try_to_timestamp(end, F.lit("yyyyMMdd")).cast("date")
    d = F.try_to_timestamp(single, F.lit("yyyyMMdd")).cast("date")
    t = today.cast("date")

    def _truthy(c: Column) -> Column:
        return c.isNotNull() & (c != "")

    return (
        F.when(_truthy(start) & _truthy(end),
               F.struct(s.alias("range_start"), e.alias("range_end")))
        .when(_truthy(single), F.struct(d.alias("range_start"), d.alias("range_end")))
        .otherwise(F.struct(t.alias("range_start"), t.alias("range_end")))
    )


def extract_filing_metadata(filing_json: Column) -> Column:
    """F14 — pull the four filing metadata fields out of a filing
    document (JSON string column = the reference's dict), with the
    filing_date normalized through F1.
    Ref: extract_filing_metadata, api/src/etl/base/transformer.py:178-185."""
    return F.struct(
        normalize_date(F.get_json_object(filing_json, "$.filing_date")).alias("filing_date"),
        F.get_json_object(filing_json, "$.document_type").alias("document_type"),
        F.get_json_object(filing_json, "$.company_name").alias("company_name"),
        F.get_json_object(filing_json, "$.filing_url").alias("filing_url"),
    )


def parse_xbrl(xbrl_content: Column) -> Column:
    """F15 — XBRL parsing, a stub in the reference too (returns ``{}``
    with a TODO): mirrored as an always-empty string→string map so the
    column contract is fixed for a real parser to drop into.
    Ref: parse_xbrl_data, api/src/etl/base/transformer.py:187-190."""
    return F.map_from_arrays(F.array().cast("array<string>"),
                             F.array().cast("array<string>"))
