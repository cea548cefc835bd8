"""A1 — `rebn_tser` rebin/downsample (miletos/main.py:3755-3818).

Bin a series by fixed Δt (or target bin count over the observed span);
per bin: mean of values, bin-center time, and the reference's error
propagation ``sqrt((sqrt(Σe²)/n)² + std(values)²)``
(miletos/main.py:3808-3811).

One groupBy → one shuffle on (group_cols, bin). Map-side partial
aggregation applies (all aggs are algebraic), so at 100 TB this is a
single combine-then-reduce pass; no window, no UDF.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rebin(
    df: DataFrame,
    delt: float,
    t0: float | None = None,
    time_col: str = "time",
    value_col: str = "value",
    stdv_col: str = "stdv",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Fixed-width rebin. Returns one row per non-empty bin with columns:
    group_cols + [bin, time, value, stdv, n].

    - ``bin``   = floor((time - t0)/delt)
    - ``time``  = bin-center t0 + (bin + 0.5)*delt
    - ``value`` = avg(value)
    - ``stdv``  = sqrt((sqrt(Σ stdv²)/n)² + stddev_pop(value)²)

    If ``t0`` is None the global min time is used (one cheap agg).
    """
    if t0 is None:
        t0 = df.agg(F.min(time_col)).first()[0]
    binc = F.floor((F.col(time_col) - F.lit(float(t0))) / F.lit(float(delt))).alias("bin")
    gb = [*group_cols, "bin"]
    out = (
        df.select(*group_cols, binc, F.col(value_col).alias("_v"), F.col(stdv_col).alias("_e"))
        .groupBy(*gb)
        .agg(
            # decimal fixed-order sum: bin means of exact-decimal data
            # are reproducible bit-for-bit across partition layouts and
            # engines (plain avg wobbles by partial-sum order, which
            # flips exact rounding ties)
            (
                F.sum(F.col("_v").cast("decimal(38,18)")).cast("double")
                / F.count("_v")
            ).alias("value"),
            F.coalesce(F.stddev_pop("_v"), F.lit(0.0)).alias("_scatter"),
            F.sqrt(F.sum(F.pow(F.col("_e"), 2))).alias("_esum"),
            F.count("_v").alias("n"),
        )
        .withColumn(
            "stdv",
            F.sqrt(F.pow(F.col("_esum") / F.col("n"), 2) + F.pow(F.col("_scatter"), 2)),
        )
        .withColumn(
            "time", F.lit(float(t0)) + (F.col("bin") + F.lit(0.5)) * F.lit(float(delt))
        )
        .drop("_scatter", "_esum")
    )
    return out.select(*group_cols, "bin", "time", "value", "stdv", "n")


def rebin_by_count(
    df: DataFrame,
    num_bins: int,
    time_col: str = "time",
    value_col: str = "value",
    stdv_col: str = "stdv",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Rebin to a target number of equal-width bins over the observed
    span (reference's `numbrebn` mode, miletos/main.py:3761-3767)."""
    row = df.agg(F.min(time_col).alias("lo"), F.max(time_col).alias("hi")).first()
    lo, hi = row["lo"], row["hi"]
    span = (hi - lo) or 1.0
    # widen a hair so the max point lands in the last bin, as np.digitize
    # with right-open edges does
    delt = span / num_bins * (1.0 + 1e-12)
    return rebin(
        df, delt, t0=lo, time_col=time_col, value_col=value_col,
        stdv_col=stdv_col, group_cols=group_cols,
    )
