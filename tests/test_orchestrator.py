"""End-to-end pipeline orchestration (§3.1 lifecycle parity):
recover-what-you-injected through the FULL staged pipeline, and verify
the detection gate stays closed on pure noise."""

import pytest
from pyspark.sql import functions as F

from miletos_spark.datagen.fixtures import transit_injected
from miletos_spark.plans.orchestrator import RunConfig, run_pipeline

# inject exactly on the BLS trial grid (f = 1/8 + 16/(osam*span)): an
# off-grid period smears phase by df*span over the baseline, which is
# the physics the osam parameter controls — grid-resolution recovery is
# covered separately in test_bls_multi
SPAN, OSAM = 27.0, 4.0
P = 1.0 / (1.0 / 8.0 + 16.0 / (OSAM * SPAN))  # ≈ 3.661 d
EPOCH, DEPTH = 1.1, 0.01


@pytest.fixture(scope="module")
def cfg():
    return RunConfig(
        detrend_half_width=25, detrend_max_iter=1,
        bls_p_min=2.0, bls_p_max=8.0, bls_osam=4.0,
        bls_n_dcyc=2, bls_dcyc_min=0.02, bls_max_signals=1,
    )


def test_pipeline_detects_injected_transit(spark, cfg):
    # depth 2.5x per-point noise: survives the 3-sigma clip stage (as in
    # real data), detection comes from box accumulation (~100 in-transit
    # points -> box SNR ~ 25)
    series = transit_injected(
        spark, cadence_sec=600.0, span_days=SPAN, t0=0.0, period=P,
        epoch_offset=EPOCH, depth=DEPTH, duration_hours=2.5,
        noise=0.004, seed=3,
    )
    res = run_pipeline(spark, series, cfg)
    assert res.detected
    assert len(res.bls_detections) == 1
    got_p = res.bls_detections[0]["period"]
    assert abs(1 / got_p - 1 / P) < 2 / (OSAM * SPAN)  # grid resolution
    assert res.depth_fit is not None
    assert res.depth_fit["depth_hat"] == pytest.approx(DEPTH, rel=0.35)
    assert res.phase_bundle is not None
    assert res.phase_bundle.count() == 50
    assert res.summary["n_samples"] > 0


def test_pipeline_gate_closed_on_noise(spark, cfg):
    series = (
        spark.range(2000)
        .select((F.col("id") * 0.01).alias("time"))
        .withColumn("value", F.lit(1.0) + F.randn(5) * 0.001)
        .withColumn("stdv", F.lit(0.001))
    )
    res = run_pipeline(spark, series, cfg)
    assert not res.detected
    assert res.depth_fit is None
    assert res.phase_bundle is None


def test_pixels_to_planet_end_to_end(spark):
    """Capstone: S5 -> A2 -> P2 composed. Synthesize target-pixel
    frames (Gaussian PSF x injected-transit flux + flat background),
    extract the light curve with aperture photometry, median-normalize,
    and recover the injected period with the BLS box search."""
    import math as m

    from pyspark.sql import functions as F

    from miletos_spark.datagen.fixtures import transit_injected
    from miletos_spark.operators.normalize import median_normalize
    from miletos_spark.search.bls import bls_best, bls_search, trial_table
    from miletos_spark.sources.photometry import (
        aperture_photometry,
        finite_photometry,
    )

    period, depth = 3.0, 0.03
    series = transit_injected(
        spark, cadence_sec=1200.0, span_days=18.0, t0=0.0, period=period,
        epoch_offset=0.7, depth=depth, duration_hours=4.0,
        noise=0.002, seed=11,
    )
    # lift each sample into a 5x5 frame: star PSF at the center scaled
    # by the astrophysical flux, on a flat background of 50
    px = (
        series.select("time", "value",
                      F.explode(F.sequence(F.lit(0), F.lit(4))).alias("pixr"))
        .select("time", "value", "pixr",
                F.explode(F.sequence(F.lit(0), F.lit(4))).alias("pixc"))
    )
    d2 = (F.col("pixr") - F.lit(2.0)) ** 2 + (F.col("pixc") - F.lit(2.0)) ** 2
    px = px.select(
        "time", "pixr", "pixc",
        (F.lit(50.0) + F.exp(-d2 / F.lit(2.0)) * (F.lit(100.0) * F.col("value"))
         ).alias("flux"),
    )
    lc = finite_photometry(
        aperture_photometry(px, 2.0, 2.0, radius_pix=2.0, frame_cols=("time",))
    ).select("time", "value")
    lc = median_normalize(
        lc.withColumn("inst", F.lit("TESS")).withColumn("stdv", F.lit(0.01)),
        group_cols=("inst",),
    )
    trials = trial_table(spark, p_min=2.0, p_max=6.0, span_days=18.0,
                         osam=4.0, n_dcyc=2, dcyc_min=0.02)
    best = bls_best(bls_search(lc, trials, time_col="time")).first()
    # period recovered within the frequency-grid resolution
    assert abs(best["period"] - period) / period < 0.05
    assert best["depth"] == pytest.approx(depth, rel=0.4)
