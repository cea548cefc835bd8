"""X1 — `fold_tser` phase fold (miletos/main.py:7346-7380) and
X5 phase-curve bundles (miletos/main.py:11933-12046).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _posmod(x, p):
    """Non-negative modulo ((x % p) + p) % p — matches NumPy % on
    negatives and is written identically in the DuckDB oracle so both
    engines agree on negative times."""
    return ((x % p) + p) % p


def fold(
    df: DataFrame,
    period: float,
    epoch: float = 0.0,
    phase_center: float = 0.0,
    in_time_units: bool = False,
    time_col: str = "time",
    out_col: str = "phase",
) -> DataFrame:
    """Add a phase column: ``phase = ((time − epoch) mod P)/P`` recentered
    on `phase_center` into (center−0.5, center+0.5]; optionally × P for
    time units (`boolfolddivi=False` path, miletos/main.py:7362-7372).

    Pure column arithmetic — no shuffle. Downstream phase-ordered
    consumers sort explicitly (the reference sorts eagerly,
    miletos/main.py:7376-7378; we keep ordering lazy so Catalyst can
    drop it when the consumer re-aggregates anyway).
    """
    p = F.lit(float(period))
    phas = _posmod(F.col(time_col) - F.lit(float(epoch)), p) / p
    # recenter: wrap into (phase_center - 0.5, phase_center + 0.5]
    c = F.lit(float(phase_center))
    phas = phas - F.when(phas > c + 0.5, 1.0).otherwise(0.0)
    phas = phas + F.when(phas <= c - 0.5, 1.0).otherwise(0.0)
    if in_time_units:
        phas = phas * p
    return df.withColumn(out_col, phas)


def phase_bins(
    df: DataFrame,
    num_bins: int = 100,
    phase_col: str = "phase",
    value_col: str = "value",
    stdv_col: str = "stdv",
    group_cols: Sequence[str] = (),
    center: float = 0.0,
) -> DataFrame:
    """X5 helper — bin a folded series on a fixed phase grid spanning
    (center−0.5, center+0.5] with `num_bins` bins
    (miletos/main.py:11968-12036). Same aggregate shape as A1 rebin.
    """
    lo = center - 0.5
    binc = F.least(
        F.floor((F.col(phase_col) - F.lit(lo)) * num_bins).cast("int"),
        F.lit(num_bins - 1),
    ).alias("bin")
    return (
        df.select(*group_cols, binc, F.col(value_col).alias("_v"), F.col(stdv_col).alias("_e"))
        .groupBy(*group_cols, "bin")
        .agg(
            # decimal fixed-order sum (see rebin.py): tie-stable bin
            # means across partition layouts and engines
            (
                F.sum(F.col("_v").cast("decimal(38,18)")).cast("double")
                / F.count("_v")
            ).alias("value"),
            F.coalesce(F.stddev_pop("_v"), F.lit(0.0)).alias("_sc"),
            F.sqrt(F.sum(F.pow(F.col("_e"), 2))).alias("_es"),
            F.count("_v").alias("n"),
        )
        .withColumn(
            "stdv", F.sqrt(F.pow(F.col("_es") / F.col("n"), 2) + F.pow(F.col("_sc"), 2))
        )
        .withColumn("phase", F.lit(lo) + (F.col("bin") + 0.5) / num_bins)
        .drop("_sc", "_es")
        .select(*group_cols, "bin", "phase", "value", "stdv", "n")
    )


def transit_flag(
    df: DataFrame,
    period: float,
    epoch: float,
    duration_days: float,
    time_col: str = "time",
    out_col: str = "in_transit",
    secondary: bool = False,
) -> DataFrame:
    """J1 — `retr_indxtimetran` as a predicate column
    (miletos/main.py:6502-6587).

    The reference materializes integer index sets per transit window; at
    scale the phase predicate ``|wrap(phase)| < dura/(2P)`` is shuffle-
    free and equivalent (SURVEY.md J1 'preferred at scale'). Secondary
    eclipses shift phase by 0.5.
    """
    p = float(period)
    eff_epoch = float(epoch) + (p / 2.0 if secondary else 0.0)
    half = float(duration_days) / 2.0 / p
    phas = _posmod(F.col(time_col) - F.lit(eff_epoch), F.lit(p)) / F.lit(p)
    # wrap into (-0.5, 0.5]
    phas = phas - F.when(phas > 0.5, 1.0).otherwise(0.0)
    return df.withColumn(out_col, F.abs(phas) < half)
