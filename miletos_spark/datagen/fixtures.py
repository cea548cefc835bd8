"""Synthetic light-curve fixtures with known injected signals.

Mirrors the reference's simulation modes (S12, miletos/main.py:10104-10562)
and its unit-test generator (tests/test_Detrend.py:5-21), but seeded
(seed=42 convention — the reference seeds nothing; FIXTURES.md fixes
that). Generation is distributed: `spark.range` drives the time grid and
all signal math is column arithmetic (JVM-side), so fixtures scale to
arbitrary row counts; numpy appears only for the tiny per-signal
parameter draws on the driver.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from miletos_spark.schema import KIND_FLUX


def _finish(df: DataFrame, inst: str, chunk: int) -> DataFrame:
    return df.select(
        "time",
        F.lit(0).alias("ener"),
        "value",
        "stdv",
        F.lit(KIND_FLUX).alias("kind"),
        F.lit(inst).alias("inst"),
        F.lit(chunk).alias("chunk"),
    )


def sinusoid_mixture(
    spark: SparkSession,
    n: int = 10_000,
    span_days: float = 30.0,
    n_signals: int = 10,
    noise: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """B1 — sum of `n_signals` random sinusoids + Gaussian noise
    (tests/test_Detrend.py:5-21 shape). Periods ≤ 10 d, amplitudes U(0,1).
    """
    rng = np.random.default_rng(seed)
    ampl = rng.uniform(0.0, 1.0, n_signals)
    peri = rng.uniform(0.5, 10.0, n_signals)
    t = (F.col("id") * (span_days / (n - 1))).alias("time")
    base = spark.range(n).select(t)
    signal = F.lit(0.0)
    for a, p in zip(ampl, peri):
        signal = signal + F.lit(float(a)) * F.sin(2 * math.pi * F.col("time") / F.lit(float(p)))
    out = base.withColumn(
        "value", signal + F.randn(seed) * noise
    ).withColumn("stdv", F.lit(noise))
    return _finish(out, "SYNT", 0)


def transit_injected(
    spark: SparkSession,
    cadence_sec: float = 120.0,
    span_days: float = 27.0,
    t0: float = 2462000.0,
    period: float = 3.7,
    epoch_offset: float = 1.1,
    depth: float = 0.01,
    duration_hours: float = 2.5,
    noise: float = 0.001,
    seed: int = 42,
) -> DataFrame:
    """B2 — TESS-like cadence with a box transit of known ephemeris
    (miletos/main.py:10114-10123, 10488-10562 analog). depth in relative
    flux (0.01 = 10 ppt)."""
    n = int(span_days * 86400.0 / cadence_sec)
    dt = cadence_sec / 86400.0
    base = spark.range(n).select((F.lit(t0) + F.col("id") * dt).alias("time"))
    p = F.lit(float(period))
    phase = ((F.col("time") - F.lit(t0 + epoch_offset)) % p + p) % p / p
    phase = phase - F.when(phase > 0.5, 1.0).otherwise(0.0)
    half = duration_hours / 24.0 / 2.0 / period
    in_tran = F.abs(phase) < half
    out = base.withColumn(
        "value",
        F.lit(1.0) - F.when(in_tran, F.lit(float(depth))).otherwise(0.0)
        + F.randn(seed) * noise,
    ).withColumn("stdv", F.lit(noise))
    return _finish(out, "TESS", 0)


def flare_injected(
    spark: SparkSession,
    cadence_sec: float = 120.0,
    span_days: float = 10.0,
    flare_times: tuple[float, ...] = (1.3, 4.7, 8.2),
    ampl: float = 0.1,
    tscl_hours: float = 1.0,
    noise: float = 0.002,
    seed: int = 42,
) -> DataFrame:
    """B3 — baseline 1.0 + exponential-decay flares at known times
    (flare model ampl·exp(−Δt/tscl), miletos/main.py:368-381;
    cnfg_flare_simulated examples/examples.py:561-611)."""
    n = int(span_days * 86400.0 / cadence_sec)
    dt = cadence_sec / 86400.0
    base = spark.range(n).select((F.col("id") * dt).alias("time"))
    tscl = tscl_hours / 24.0
    signal = F.lit(1.0)
    for tf in flare_times:
        dtf = F.col("time") - F.lit(float(tf))
        signal = signal + F.when(
            dtf >= 0, F.lit(float(ampl)) * F.exp(-dtf / F.lit(tscl))
        ).otherwise(0.0)
    out = base.withColumn("value", signal + F.randn(seed) * noise).withColumn(
        "stdv", F.lit(noise)
    )
    return _finish(out, "TESS", 0)
