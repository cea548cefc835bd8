"""Rolling/ordered window operators (SURVEY.md §2.5, W1–W3, W7).

All are Spark window aggregates (JVM-side). Windows partition by the
series key (inst, chunk[, ener]) so state never crosses a partition —
the scale-safe shape: each series chunk is bounded (≤ a sector).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _win(group_cols: Sequence[str], order_col: str):
    w = Window.orderBy(order_col)
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy(order_col)
    return w


def rolling_std(
    df: DataFrame,
    half_width: int,
    value_col: str = "value",
    time_col: str = "time",
    group_cols: Sequence[str] = (),
    cut_peak: bool = False,
    out_col: str = "roll_std",
) -> DataFrame:
    """W1 — `retr_stdvwind`: centered rolling std over ±half_width rows
    (miletos/main.py:6907-6944).

    With ``cut_peak`` the max value in each window is excluded
    (`boolcuttpeak`) — done with closed-form moments
    (n, Σx, Σx², max) rather than a UDF:
        var' = (Σx² − m²)/(n−1) − ((Σx − m)/(n−1))²·(n−1)/(n−1)
    i.e. recompute mean/variance of the window with the max removed.
    """
    w = _win(group_cols, time_col).rowsBetween(-half_width, half_width)
    if not cut_peak:
        return df.withColumn(out_col, F.stddev_samp(value_col).over(w))
    n = F.count(value_col).over(w)
    s1 = F.sum(value_col).over(w)
    s2 = F.sum(F.pow(F.col(value_col), 2)).over(w)
    mx = F.max(value_col).over(w)
    n1 = n - 1
    mean1 = (s1 - mx) / n1
    # population->sample variance of the peak-removed window
    var1 = ((s2 - mx * mx) - n1 * mean1 * mean1) / (n1 - 1)
    return df.withColumn(out_col, F.when(n1 > 1, F.sqrt(F.greatest(var1, F.lit(0.0)))))


def rolling_median(
    df: DataFrame,
    half_width: int,
    value_col: str = "value",
    time_col: str = "time",
    group_cols: Sequence[str] = (),
    out_col: str = "roll_med",
    exact: bool = True,
) -> DataFrame:
    """W2 — centered median filter of size 2*half_width+1
    (scipy.ndimage.median_filter analog; miletos/main.py:5744,
    6784-6795). Exact `percentile` over a row frame for oracle parity.
    """
    w = _win(group_cols, time_col).rowsBetween(-half_width, half_width)
    fn = "percentile" if exact else "percentile_approx"
    return df.withColumn(out_col, F.expr(f"{fn}({value_col}, 0.5)").over(w))


def rolling_percentile_band(
    df: DataFrame,
    range_width: float,
    value_col: str = "value",
    time_col: str = "time",
    group_cols: Sequence[str] = (),
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """W3 — rolling 5/50/95-percentile band over a ±range_width TIME
    window (flare finder, miletos/main.py:11367-11399). Adds columns
    band_lo, band_med, band_hi and the detection metric
    ``(value − band_med) / (band_hi − band_lo)``.

    Range frame over the time axis (matching the reference's ±1 h window
    irrespective of cadence). Built with a SQL window spec because the
    DataFrame `rangeBetween` API only accepts integer offsets while the
    time axis is DOUBLE days.
    """
    part = f"PARTITION BY {', '.join(group_cols)} " if group_cols else ""
    frame = (
        f"OVER ({part}ORDER BY {time_col} "
        f"RANGE BETWEEN {range_width!r} PRECEDING AND {range_width!r} FOLLOWING)"
    )
    return (
        df.withColumn("band_lo", F.expr(f"percentile({value_col}, {lo}) {frame}"))
        .withColumn("band_med", F.expr(f"percentile({value_col}, 0.5) {frame}"))
        .withColumn("band_hi", F.expr(f"percentile({value_col}, {hi}) {frame}"))
        .withColumn(
            "detect_metric",
            (F.col(value_col) - F.col("band_med"))
            / F.nullif(F.col("band_hi") - F.col("band_lo"), F.lit(0.0)),
        )
    )


def largest_gap(
    df: DataFrame,
    time_col: str = "time",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """W7 — per group, the start time and size of the largest time gap
    (argmax(diff(time)), miletos/main.py:2144)."""
    w = _win(group_cols, time_col)
    gaps = df.select(*group_cols, F.col(time_col)).withColumn(
        "gap", F.col(time_col) - F.lag(time_col).over(w)
    )
    if group_cols:
        return gaps.groupBy(*group_cols).agg(
            F.max("gap").alias("max_gap"),
            F.expr(f"max_by({time_col}, gap)").alias("gap_end_time"),
        )
    return gaps.agg(
        F.max("gap").alias("max_gap"),
        F.expr(f"max_by({time_col}, gap)").alias("gap_end_time"),
    )
