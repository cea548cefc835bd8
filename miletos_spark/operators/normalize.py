"""A2 median normalization + A3 white-light aggregation
(miletos/main.py:7484-7488, 10597-10600).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def median_normalize(
    df: DataFrame,
    value_col: str = "value",
    stdv_col: str = "stdv",
    group_cols: Sequence[str] = ("inst", "chunk"),
    exact: bool = True,
) -> DataFrame:
    """A2 — divide value and stdv by the per-group median value
    (miletos/main.py:7484-7488: flux /= np.nanmedian(flux)).

    Implemented as a tiny per-group aggregate broadcast-joined back —
    NOT a per-row window — because group count (instruments × chunks)
    is small while rows are ~10^12 at target scale. `exact=True` uses
    exact `percentile` for oracle parity; flip to `percentile_approx`
    for cheaper single-pass behavior at extreme scale.
    """
    med_fn = "percentile" if exact else "percentile_approx"
    if group_cols:
        med = df.groupBy(*group_cols).agg(
            F.expr(f"{med_fn}({value_col}, 0.5)").alias("_med")
        )
        out = df.join(F.broadcast(med), on=list(group_cols))
    else:
        med_val = df.agg(F.expr(f"{med_fn}({value_col}, 0.5)")).first()[0]
        out = df.withColumn("_med", F.lit(med_val))
    return (
        out.withColumn(value_col, F.col(value_col) / F.col("_med"))
        .withColumn(stdv_col, F.col(stdv_col) / F.col("_med"))
        .drop("_med")
    )


def white_light(
    df: DataFrame,
    time_col: str = "time",
    value_col: str = "value",
    stdv_col: str = "stdv",
    group_cols: Sequence[str] = ("kind", "inst", "chunk"),
) -> DataFrame:
    """A3 — collapse the energy axis: mean value per time, error added in
    quadrature / n (miletos/main.py:10597-10600). The reference prepends
    the result as energy bin 0; callers can union this back with ener=0.
    """
    gb = [*group_cols, time_col]
    return (
        df.groupBy(*gb)
        .agg(
            # decimal fixed-order sum: the collapsed mean is exact and
            # partition-layout-independent (power-of-two bin counts
            # make exact decimal ties common, and a 1-ulp partial-sum
            # wobble flips them)
            (
                F.sum(F.col(value_col).cast("decimal(38,18)")).cast("double")
                / F.count(value_col)
            ).alias("value"),
            (F.sqrt(F.sum(F.pow(F.col(stdv_col), 2))) / F.count("*")).alias("stdv"),
        )
        .withColumn("ener", F.lit(0))
        .select(*group_cols, time_col, "ener", "value", "stdv")
    )
