"""Table profiling — per-column statistics in ONE pass (the
data-quality summary a pipeline runs over every landed batch before
gating it; generalizes the reference's row-level validity tallies,
api/src/etl/base/transformer.py:60-89, to column-level evidence).

Plan shape: a single multi-aggregate job (every statistic for every
column in one row) followed by a driver-free unpivot into long form —
profiling a 100 TB table costs exactly one scan + one 1-row exchange,
never a scan per column.

Portability: means are computed over integer cents (exact integer
sums — a double sum's partial-sum order differs between engines and
runs); medians use exact linear-interpolation percentile (Spark
``percentile`` == DuckDB ``quantile_cont``), deterministic because
selection + one midpoint never accumulates error. Everything mirrors
into the oracle SQL (q45).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_numeric(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile numeric columns: one output row per column with
    ``(col_name, n, n_null, min_v, max_v, mean_c, p50)`` where ``mean_c``
    is the exact cents-mean rounded to 6 digits and ``p50`` the exact
    interpolated median rounded to 6 digits."""
    aggs = []
    for c in cols:
        col = F.col(c).cast("double")
        cents = F.floor(col * 100 + F.lit(0.5)).cast("long")
        aggs += [
            F.count(col).alias(f"{c}__n"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__n_null"),
            F.min(col).alias(f"{c}__min"),
            F.max(col).alias(f"{c}__max"),
            (F.floor(F.sum(cents) / F.count(col) / 100.0 * 1e6 + F.lit(0.5)) / 1e6)
            .alias(f"{c}__mean"),
            (F.floor(F.percentile(col, F.lit(0.5)) * 1e6 + F.lit(0.5)) / 1e6)
            .alias(f"{c}__p50"),
        ]
    one = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [F.lit(c), F.col(f"{c}__n"), F.col(f"{c}__n_null"),
                       F.col(f"{c}__min"), F.col(f"{c}__max"),
                       F.col(f"{c}__mean"), F.col(f"{c}__p50")]
    return one.select(F.stack(
        F.lit(len(cols)), *stack_args
    ).alias("col_name", "n", "n_null", "min_v", "max_v", "mean_c", "p50"))
