"""X6/§2.8 — uniform-grid regridding by linear interpolation
(`scipy.interpolate.interp1d` / `np.interp` sites: miletos/main.py:6286,
972, 1523; grid generation miletos/main.py:7538-7540, 12121-12124).

Spark-first: no UDF. The per-group uniform grid is `sequence` +
`explode` from a per-group (min, max) aggregate; interpolation is a
union of grid rows and data rows followed by two running windows —
last-known-before and first-known-after — and one line of arithmetic.
Two shuffles total (group agg + window partition), both on the group
key; window state is one row (running last), so it scales to arbitrary
series length.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interp_to_grid(
    df: DataFrame,
    step: float,
    time_col: str = "time",
    value_col: str = "value",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Linearly interpolate `value_col` onto the uniform grid
    ``{k·step : min(time) ≤ k·step ≤ max(time)}`` per group. Grid points
    outside the observed span are not produced (np.interp edge clamping
    never triggers). Returns group_cols + (time, value)."""
    gcols = list(group_cols)
    span = df.groupBy(*gcols).agg(
        F.ceil(F.min(time_col) / F.lit(float(step))).cast("long").alias("_k0"),
        F.floor(F.max(time_col) / F.lit(float(step))).cast("long").alias("_k1"),
    ) if gcols else df.agg(
        F.ceil(F.min(time_col) / F.lit(float(step))).cast("long").alias("_k0"),
        F.floor(F.max(time_col) / F.lit(float(step))).cast("long").alias("_k1"),
    )
    grid = span.select(
        *gcols, F.explode(F.sequence(F.col("_k0"), F.col("_k1"))).alias("_k")
    ).select(
        *gcols,
        (F.col("_k") * F.lit(float(step))).alias(time_col),
        F.lit(None).cast("double").alias(value_col),
        F.lit(1).alias("_is_grid"),
    )
    data = df.select(
        *gcols, F.col(time_col), F.col(value_col).cast("double"),
        F.lit(0).alias("_is_grid"),
    )
    both = data.unionByName(grid)

    # data rows order before a coincident grid point (_is_grid ASC) so a
    # grid point sitting exactly on a sample interpolates to that sample
    order = [F.col(time_col).asc(), F.col("_is_grid").asc()]
    w = Window.partitionBy(*gcols).orderBy(*order) if gcols else Window.orderBy(*order)
    wb = w.rowsBetween(Window.unboundedPreceding, 0)
    wf = w.rowsBetween(0, Window.unboundedFollowing)

    prev_v = F.last(value_col, ignorenulls=True).over(wb)
    prev_t = F.last(
        F.when(F.col("_is_grid") == 0, F.col(time_col)), ignorenulls=True
    ).over(wb)
    next_v = F.first(value_col, ignorenulls=True).over(wf)
    next_t = F.first(
        F.when(F.col("_is_grid") == 0, F.col(time_col)), ignorenulls=True
    ).over(wf)

    frac = F.when(
        next_t > prev_t, (F.col(time_col) - prev_t) / (next_t - prev_t)
    ).otherwise(F.lit(0.0))
    interp = prev_v + (next_v - prev_v) * frac
    return (
        both.withColumn("_interp", interp)
        .filter(F.col("_is_grid") == 1)
        .select(*gcols, F.col(time_col), F.col("_interp").alias(value_col))
    )
