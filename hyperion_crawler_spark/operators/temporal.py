"""Temporal joins — as-of and interval (range) joins, the two
time-series operators Spark's join syntax lacks (kdb+ `aj`, DuckDB
ASOF JOIN, Flink temporal join).

as-of join: for every left row, the single most recent right row with
``right.ts <= left.ts`` within the same key. The naive formulation is
an inequality theta-join (a per-key cartesian in Spark); this
implementation is the canonical distributed shape instead — union the
two sides, ONE hash shuffle on the key, one in-partition sort by
(ts, side), then a running ``last(ignorenulls)`` window carries each
right row forward to the left rows it covers. Cost: one shuffle + one
sort, independent of how many right rows each left row could match.

Range join: equality on key + ``point BETWEEN lo AND hi``. Catalyst
executes the raw predicate as a per-key nested loop; bucketizing the
interval table by a fixed granule turns it into an equi-join on
(key, granule) with shuffle ∝ interval coverage — the standard
interval-index trick (used by Spark's own range-join hints on
Databricks, and by every genomics interval joiner).

The reference has no temporal operators; its nearest analog is the
max-trade-date latest-price slice (krx/loader.py:224-235) — an as-of
probe at ``ts = ∞``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              right_cols: list[str] | None = None,
              tolerance: int | None = None) -> DataFrame:
    """As-of join (backward): left rows gain the newest right row with
    ``right.ts <= left.ts`` per ``key``; left rows with no prior right
    row keep nulls. At equal timestamps the right row IS visible
    (inclusive, matching DuckDB ASOF `>=`). ``tolerance`` (same unit
    as ``ts``) drops matches older than ``left.ts - tolerance``.

    Ties inside the right side on (key, ts) are broken by keeping the
    row that sorts LAST under a deterministic struct order of its
    carried columns — every run and engine picks the same winner.
    """
    rc = right_cols or [c for c in right.columns if c not in (key, ts)]
    # NULL keys never match under join semantics (and DuckDB ASOF), but
    # Window.partitionBy groups nulls together and would hand null-key
    # left rows a carried match — split them out and re-attach with
    # null right columns at the end
    l_null = left.filter(F.col(key).isNull())
    left = left.filter(F.col(key).isNotNull())
    right = right.filter(F.col(key).isNotNull())
    r_tag = right.select(
        F.col(key), F.col(ts).cast("long").alias("_ts"), F.lit(0).alias("_side"),
        F.struct(F.col(ts).cast("long").alias("_rts"),
                 *[F.col(c) for c in rc]).alias("_r"))
    l_tag = left.select(
        F.col(key), F.col(ts).cast("long").alias("_ts"), F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"))
    both = (l_tag.withColumn("_r", F.lit(None).cast(r_tag.schema["_r"].dataType))
            .unionByName(r_tag.withColumn(
                "_lrow", F.lit(None).cast(l_tag.schema["_lrow"].dataType))))
    # right rows sort BEFORE left rows at the same _ts (side 0 < 1) so
    # an equal-timestamp right row is visible to that left row; right
    # same-(key, ts) duplicates resolve to the max _r struct (last in
    # sort order) deterministically
    w = (Window.partitionBy(key)
         .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_r").asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = both.withColumn("_rlast", F.last("_r", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "_rlast",
            F.when(F.col("_rlast._rts") >= F.col("_ts") - F.lit(tolerance),
                   F.col("_rlast")))
    matched = out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_rlast.{c}").alias(c) for c in rc])
    r_struct = F.lit(None).cast(r_tag.schema["_r"].dataType)
    unmatched = l_null.select(
        *left.columns,
        *[r_struct.getField(c).alias(c) for c in rc])
    return matched.unionByName(unmatched)


def range_join(points: DataFrame, intervals: DataFrame, key: str,
               point_col: str, lo_col: str, hi_col: str,
               granule: int) -> DataFrame:
    """Interval join: point rows paired with every interval row of the
    same ``key`` whose ``[lo, hi]`` contains the point. Buckets the
    intervals by ``granule`` (explode over covered buckets) and
    equi-joins on (key, bucket) before re-checking the exact predicate
    — shuffle ∝ sum of interval spans / granule, never a per-key
    nested loop. Pick ``granule`` near the median interval width."""
    pt = F.col(point_col).cast("long")
    b_pt = F.floor(pt / F.lit(granule))
    p = points.withColumn("_b", b_pt)
    iv = intervals.withColumn(
        "_b", F.explode(F.sequence(
            F.floor(F.col(lo_col).cast("long") / F.lit(granule)),
            F.floor(F.col(hi_col).cast("long") / F.lit(granule)))))
    joined = p.join(iv, [key, "_b"])
    return (joined.filter((pt >= F.col(lo_col).cast("long"))
                          & (pt <= F.col(hi_col).cast("long")))
            .drop("_b"))
