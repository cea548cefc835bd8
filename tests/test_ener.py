"""F6/X3 energy-axis cube + radius-ratio spectrum
(reference: miletos/main.py:10591-10604 white light, 12343-12381 spectrum)."""

from __future__ import annotations

from pyspark.sql import functions as F

from miletos_spark.operators.ener import build_ener_cube, radius_ratio_spectrum


def _toy(spark):
    # 2 energy bins, 3 days, deterministic values
    rows = []
    eid = 0
    for day in range(3):
        for k in range(4):  # 4 samples/day; ener = eid % 2 + 1
            rows.append((eid, day + 0.1 * k, 1.0 + 0.1 * (eid % 2)))
            eid += 1
    return spark.createDataFrame(rows, "event_id long, t double, value double")


def test_white_light_is_mean_across_bins(spark):
    cube = build_ener_cube(_toy(spark), n_ener=2, bin_days=1.0).cache()
    bands = {r["ener"] for r in cube.select("ener").distinct().collect()}
    assert bands == {0, 1, 2}
    got = {
        (r["ener"], r["day"]): r["flux"] for r in cube.collect()
    }
    for day in range(3):
        # white = mean of the two per-bin means (main.py:10598)
        assert abs(got[(0, day)] - (got[(1, day)] + got[(2, day)]) / 2) < 1e-12
    # n rolls up
    n0 = {r["day"]: r["n"] for r in cube.filter("ener = 0").collect()}
    assert all(v == 4 for v in n0.values())


def test_spectrum_one_row_per_band_flat_for_flat_input(spark):
    cube = build_ener_cube(_toy(spark), n_ener=2, bin_days=1.0)
    spec = radius_ratio_spectrum(cube, period=7.0, epoch=1.5, dura=0.7)
    rows = {r["ener"]: r for r in spec.collect()}
    assert set(rows) == {0, 1, 2}
    for r in rows.values():
        assert r["n_bins"] == 3
        # constant-per-band input detrends to flat -> depth ~ 0
        assert abs(r["depth_hat"]) < 1e-6
        assert r["rratio"] is not None
