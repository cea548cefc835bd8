"""Search operator tests — recover-what-you-injected (FIXTURES.md B1–B3)."""

import math

import pytest
from pyspark.sql import functions as F

from miletos_spark.datagen import flare_injected, sinusoid_mixture, transit_injected
from miletos_spark.search import (
    bls_best,
    bls_search,
    flare_outlier_search,
    freq_grid,
    lomb_scargle,
)
from miletos_spark.search.bls import trial_table
from miletos_spark.search.flare import exp_decay_template, matched_filter_search


def test_lomb_scargle_recovers_sinusoid(spark):
    # single strong sinusoid: P=2.0 d over 20 d
    n, span, period = 2000, 20.0, 2.0
    base = spark.range(n).select((F.col("id") * (span / (n - 1))).alias("time"))
    df = base.withColumn(
        "value", F.sin(2 * math.pi * F.col("time") / period) + F.randn(42) * 0.2
    )
    grid = freq_grid(spark, f_min=0.05, df=0.005, n_freq=200)  # periods 1–20 d
    spec = lomb_scargle(df, grid)
    best = spec.orderBy(F.col("power").desc()).first()
    assert 1.0 / best["freq"] == pytest.approx(period, rel=0.02)
    assert best["power"] > 0.5


def test_bls_recovers_transit(spark):
    df = transit_injected(spark, period=3.7, epoch_offset=1.1, depth=0.01,
                          duration_hours=2.5, noise=0.001)
    t0 = 2462000.0
    # oversample enough that epoch drift over the 27 d baseline stays
    # under half a transit duration (the reference's factosam=10 serves
    # the same purpose, miletos/main.py:5482-5485)
    trials = trial_table(spark, p_min=2.5, p_max=5.0, span_days=27.0,
                         osam=40.0, n_dcyc=4, dcyc_min=0.005)
    spec = bls_search(df, trials, t_ref=t0)
    best = bls_best(spec, min_in=20).first()
    assert best["period"] == pytest.approx(3.7, rel=0.02)
    assert best["depth"] == pytest.approx(0.01, rel=0.5)
    assert best["snr"] > 7.1  # reference detection threshold thrss2nr
    # epoch within one box width of the injected epoch (mod period)
    phase_err = abs(((best["epoch"] - (t0 + 1.1)) % best["period"]) / best["period"])
    phase_err = min(phase_err, 1 - phase_err)
    assert phase_err < max(best["dcyc"], 0.02) * 1.5


def test_flare_outlier_search_finds_injected(spark):
    # near-single-cadence spike so <5% of the ±1 h window is contaminated
    # and the p95 band stays at the noise level (the detector's operating
    # regime: the reference's p95-of-61-points tolerates ~2 flare samples)
    df = flare_injected(spark, flare_times=(1.3, 4.7, 8.2), ampl=0.1,
                        tscl_hours=0.03, noise=0.002)
    det = flare_outlier_search(df, window_days=1.0 / 24.0, threshold=5.0)
    times = sorted(r["time"] for r in det.collect())
    assert len(times) >= 3
    for tf in (1.3, 4.7, 8.2):
        assert any(abs(t - tf) < 0.1 for t in times)


def test_matched_filter_finds_flares(spark):
    df = flare_injected(spark, flare_times=(2.0, 6.5), ampl=0.12,
                        tscl_hours=1.0, noise=0.002)
    # template: 1h decay sampled at 2-min cadence, 30 samples
    tmpl = exp_decay_template(n_samples=30, tscl_samples=30.0)
    det = matched_filter_search(df, tmpl)
    times = sorted(r["time"] for r in det.collect())
    for tf in (2.0, 6.5):
        assert any(abs(t - tf) < 0.1 for t in times), (tf, times[:10])


def test_alt_bls_backend_cross_validates_phase_bucket(spark):
    """P4: the independent fold+scan BLS (astropy when present, NumPy
    twin otherwise) must recover the injected period AND agree with the
    phase-bucket bls_search's best period within grid resolution."""
    from miletos_spark.datagen.fixtures import transit_injected
    from miletos_spark.search.bls import bls_best, bls_search
    from miletos_spark.search.bls_reference import bls_alt_backend

    inj_p = 3.7
    df = transit_injected(
        spark, period=inj_p, depth=0.01, noise=0.0005, t0=0.0
    ).select("time", "value")
    periods = [3.1 + 0.1 * i for i in range(13)]  # 3.1..4.3
    alt = bls_alt_backend(df, periods, durations=(0.02, 0.05))
    alt_best = alt.orderBy(F.col("power").desc()).first()
    assert abs(alt_best["period"] - inj_p) < 0.051
    assert alt_best["depth"] > 0.005  # sign convention: dip depth > 0

    trials = spark.createDataFrame(
        [(p, d, o) for p in periods for d in (0.02, 0.05) for o in (0.0, 0.5)],
        "period double, dcyc double, off double",
    )
    spec = bls_search(df, trials, time_col="time", value_col="value", t_ref=0.0)
    pb_best = bls_best(spec, min_in=3).first()
    assert abs(pb_best["period"] - alt_best["period"]) < 0.051


def test_tls_trapezoid_recovers_injected(spark):
    # P4 TLS-style backend: trapezoid template beats grid mismatches;
    # injected (period, start-bin, duration) must be recovered exactly
    import numpy as np

    from miletos_spark.search.bls_reference import tls_search

    rng = np.random.default_rng(3)
    t = np.sort(rng.uniform(0.0, 30.0, 4000))
    n_bins, start, w, ing, depth, period = 256, 64, 13, 4, 0.2, 3.0
    ph = np.mod(t, period) / period
    b = np.minimum((ph * n_bins).astype(int), n_bins - 1)
    k = b - start
    shape = np.where(
        (k >= 0) & (k < w),
        np.minimum(
            np.minimum((k + 0.5) / ing, (w - k - 0.5) / ing), 1.0
        ),
        0.0,
    )
    y = 1.0 - depth * shape + 0.002 * rng.normal(size=len(t))
    df = spark.createDataFrame(
        [(float(a), float(v)) for a, v in zip(t, y)], "time double, value double"
    )
    out = tls_search(df, [2.0, 2.5, 3.0, 3.5, 4.0], durations=(0.02, 0.05, 0.1))
    best = out.orderBy(out.power.desc()).first()
    assert best["period"] == 3.0
    assert best["dura_frac"] == 0.05
    assert abs(best["epoch_frac"] - start / n_bins) < 1.5 / n_bins
    assert abs(best["depth"] - depth) < 0.02
    assert best["backend"] == "tls-trapezoid"
