"""Model/inference layer (SURVEY.md §2.11): forward model evaluation,
likelihood aggregation, closed-form depth fit, Nelder-Mead group fit —
recover-what-you-injected, mirroring the reference's simulation-based
validation (miletos/main.py:10488-10562)."""

import math

import pytest
from pyspark.sql import functions as F

from miletos_spark.datagen.fixtures import transit_injected
from miletos_spark.model.forward import flare_model, transit_model, trapezoid_depth
from miletos_spark.model.infer import _nelder_mead, fit_transit_groups
from miletos_spark.model.likelihood import depth_fit_closed_form, gaussian_loglik

P, EPOCH, DEPTH, DURA = 3.0, 1.0, 0.02, 0.25


@pytest.fixture(scope="module")
def injected(spark):
    # 20 days @ ~10-min cadence, 2% box transit, sigma=0.002
    return transit_injected(
        spark, cadence_sec=576.0, span_days=20.0, t0=0.0, period=P,
        epoch_offset=EPOCH, depth=DEPTH, duration_hours=DURA * 24.0,
        noise=0.002, seed=7,
    ).cache()


def test_transit_model_shape(spark):
    df = spark.createDataFrame(
        [(EPOCH,), (EPOCH + P,), (EPOCH + P / 2,), (EPOCH + DURA,)],
        "time double",
    )
    rows = df.select(
        transit_model(F.col("time"), P, EPOCH, DEPTH, DURA).alias("m")
    ).collect()
    assert rows[0]["m"] == pytest.approx(1.0 - DEPTH)   # mid-transit
    assert rows[1]["m"] == pytest.approx(1.0 - DEPTH)   # next transit
    assert rows[2]["m"] == pytest.approx(1.0)           # out of transit
    assert rows[3]["m"] == pytest.approx(1.0)           # past 4th contact


def test_flare_model_decay(spark):
    df = spark.createDataFrame([(0.0,), (1.0,), (1.5,), (0.5,)], "time double")
    rows = (
        df.select("time", flare_model(F.col("time"), [(1.0, 0.1, 0.5)]).alias("m"))
        .orderBy("time")
        .collect()
    )
    by_t = {r["time"]: r["m"] for r in rows}
    assert by_t[0.0] == pytest.approx(1.0)      # before the flare
    assert by_t[0.5] == pytest.approx(1.0)
    assert by_t[1.0] == pytest.approx(1.1)      # peak
    assert by_t[1.5] == pytest.approx(1.0 + 0.1 * math.exp(-1.0))


def test_depth_fit_recovers_injection(injected):
    shaped = injected.withColumn(
        "shape", trapezoid_depth(F.col("time"), P, EPOCH, DURA)
    )
    row = depth_fit_closed_form(shaped, "shape").first()
    # box injected vs trapezoid fitted -> a few % model-mismatch bias
    assert row["depth_hat"] == pytest.approx(DEPTH, rel=0.1)
    assert row["depth_err"] < DEPTH / 5  # detection, not upper limit


def test_loglik_prefers_true_model(injected):
    true_m = transit_model(F.col("time"), P, EPOCH, DEPTH, DURA)
    flat_m = F.lit(1.0)
    ll_true = gaussian_loglik(injected.withColumn("m", true_m), "m").first()["loglik"]
    ll_flat = gaussian_loglik(injected.withColumn("m", flat_m), "m").first()["loglik"]
    assert ll_true > ll_flat


def test_nelder_mead_rosenbrock():
    def rosen(x):
        return (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2

    x, fx = _nelder_mead(rosen, [0.0, 0.0], [0.5, 0.5], max_iter=2000)
    assert fx < 1e-6
    assert x[0] == pytest.approx(1.0, abs=1e-2)


def test_fit_transit_groups_recovers(injected):
    grouped = injected.withColumn("grp", F.lit("a"))
    row = fit_transit_groups(
        grouped, period=P, epoch0=0.8, depth0=0.01, dura0=0.2,
        group_cols=("grp",),
    ).first()
    assert row["depth_hat"] == pytest.approx(DEPTH, rel=0.3)
    assert row["epoch_hat"] == pytest.approx(EPOCH, abs=DURA / 2)


def test_mcmc_posterior_covers_injection(injected):
    from miletos_spark.model.infer import sample_transit_groups

    grouped = injected.withColumn("grp", F.lit("a"))
    row = sample_transit_groups(
        grouped, period=P, epoch0=0.9, depth0=0.015, dura0=0.2,
        n_walkers=16, n_steps=150, group_cols=("grp",),
    ).first()
    # posterior median near truth; 16-84 interval is a sane width
    assert row["depth_p50"] == pytest.approx(DEPTH, rel=0.3)
    assert row["epoch_p50"] == pytest.approx(EPOCH, abs=DURA)
    assert 0 < row["depth_p84"] - row["depth_p16"] < DEPTH
    assert row["n_samples"] > 1000


def test_param_registry_roundtrip():
    from miletos_spark.model.params import ParamSpec, transit_registry

    reg = transit_registry(period=3.0, epoch_bounds=(0.0, 3.0))
    assert reg.index == {"epoch": 0, "depth": 1, "dura": 2}
    vec = reg.pack({"epoch": 1.0, "depth": 0.02, "dura": 0.25})
    full = reg.unpack(vec)
    assert full == {"period": 3.0, "epoch": 1.0, "depth": 0.02, "dura": 0.25}
    assert reg.in_bounds(vec)
    assert not reg.in_bounds([5.0, 0.02, 0.25])       # epoch out of bounds
    assert reg.clip([5.0, -0.1, 0.25]) == [3.0, 0.0, 0.25]
    with pytest.raises(ValueError):
        reg.add(ParamSpec("epoch", 0, 1))              # duplicate name


def test_gp_loglik_recovers_hyperparams(spark):
    """M3/M4 GP likelihood: a grid evaluation over (sigma, rho) must
    peak at the hyperparameters the synthetic series was drawn from."""
    import numpy as np

    from miletos_spark.model.likelihood import gp_loglik

    rng = np.random.default_rng(3)
    n = 200
    t = np.sort(rng.uniform(0.0, 20.0, n))
    sig_true, rho_true, err = 0.05, 2.0, 0.005
    r = np.abs(t[:, None] - t[None, :]) * (np.sqrt(3.0) / rho_true)
    k = sig_true**2 * (1.0 + r) * np.exp(-r) + np.diag(np.full(n, err**2))
    y = np.linalg.cholesky(k) @ rng.standard_normal(n)
    df = spark.createDataFrame(
        [(float(a), float(b), err) for a, b in zip(t, y)],
        "time double, value double, stdv double",
    ).cache()

    def ll(sigma, rho):
        return gp_loglik(
            df, None, sigma=sigma, rho=rho, time_col="time"
        ).first()["loglik"]

    grid = [(s, p) for s in (0.01, 0.05, 0.2) for p in (0.5, 2.0, 8.0)]
    scores = {(s, p): ll(s, p) for s, p in grid}
    assert max(scores, key=scores.get) == (sig_true, rho_true)
    df.unpersist()


def test_gp_llik_state_space_matches_dense():
    """The O(n) Kalman prediction-error likelihood must equal the dense
    Cholesky marginal likelihood to solver precision — it is the 100TB
    path gp_loglik switches to above GP_LLIK_DENSE_CUTOFF points (dense
    series have FEW gaps, so gap regions grow with data density and the
    O(n³) solve blows up exactly where data is richest)."""
    import numpy as np

    from miletos_spark.model.likelihood import _gp_llik_matern32_ss

    rng = np.random.default_rng(7)
    for rho, base_err in ((2.0, 0.05), (0.02, 0.5)):
        n = 400
        t = np.sort(rng.uniform(0.0, 20.0, n))
        y = 0.3 * np.sin(t / 3.0) + 0.1 * rng.normal(size=n)
        e = base_err * (1.0 + 0.5 * rng.uniform(size=n))  # heteroscedastic
        sig2 = 0.25
        r = np.abs(t[:, None] - t[None, :]) * (np.sqrt(3.0) / rho)
        c = sig2 * (1.0 + r) * np.exp(-r) + np.diag(e * e + 1e-12)
        ll = np.linalg.cholesky(c)
        dense = (
            -0.5 * float(y @ np.linalg.solve(c, y))
            - float(np.log(np.diag(ll)).sum())
            - 0.5 * n * np.log(2.0 * np.pi)
        )
        ss = _gp_llik_matern32_ss(t, y, sig2, rho, e * e + 1e-12)
        assert abs(dense - ss) < 1e-8 * max(1.0, abs(dense))


def test_brightness_temp_grid_recovers_on_grid_truth(spark):
    """M10 retr_llik_spec analog: depth generated from a known on-grid
    temperature must be recovered exactly by the grid-scan MAP fit."""
    from miletos_spark.model.secondary import (
        brightness_temp_fit,
        depth_model_expr,
    )
    from pyspark.sql import functions as F

    t_true = 1800.0
    obs = spark.createDataFrame(
        [("a", 0.1, 5772.0, 0.02)],
        "grp string, rratio double, tstar double, dept_err double",
    ).withColumn(
        "dept_obs", F.expr(depth_model_expr(t_expr=repr(t_true)))
    )
    got = brightness_temp_fit(obs, group_cols=("grp",)).first()
    assert got["tmpt"] == t_true
    assert abs(got["llik"]) < 1e-18


def test_albedo_recirc_grid_recovers_on_grid_truth(spark):
    """M10 retr_llik_albbepsi analog: on-grid (A, eps) injected through
    the Cowan & Agol day/night formulas is recovered exactly."""
    from miletos_spark.model.secondary import albedo_recirc_fit

    a_true, e_true, tequi = 0.30000000000000004, 0.25, 1500.0
    psii = (1.0 - a_true) ** 0.25
    tirr = tequi * psii
    tday = tirr * (2.0 / 3.0 - 5.0 * e_true / 12.0) ** 0.25
    tnight = tirr * (e_true / 4.0) ** 0.25
    obs = spark.createDataFrame(
        [("a", tequi, tday, 20.0, tnight, 20.0, psii, 0.03)],
        "grp string, tequi double, tday_obs double, tday_err double,"
        " tnight_obs double, tnight_err double, psii_obs double,"
        " psii_err double",
    )
    got = albedo_recirc_fit(obs, group_cols=("grp",)).first()
    assert (got["albb"], got["epsi"]) == (a_true, e_true)


def test_mcmc_albedo_posterior_covers_truth(spark):
    """M10 sampler role: the stretch-move posterior over the albedo
    likelihood must bracket the injected truth within its 16-84 band
    (generous tolerance: short deterministic chain)."""
    from miletos_spark.model.secondary import sample_albedo_groups

    a_true, e_true, tequi = 0.25, 0.3, 1500.0
    psii = (1.0 - a_true) ** 0.25
    tirr = tequi * psii
    tday = tirr * (2.0 / 3.0 - 5.0 * e_true / 12.0) ** 0.25
    tnight = tirr * (e_true / 4.0) ** 0.25
    obs = spark.createDataFrame(
        [("a", tequi, tday, 10.0, tnight, 10.0, psii, 0.02)],
        "grp string, tequi double, tday_obs double, tday_err double,"
        " tnight_obs double, tnight_err double, psii_obs double,"
        " psii_err double",
    )
    got = sample_albedo_groups(obs, group_cols=("grp",)).first()
    assert got["albb_p16"] - 0.1 <= a_true <= got["albb_p84"] + 0.1
    assert got["epsi_p16"] - 0.1 <= e_true <= got["epsi_p84"] + 0.1
    assert got["n_samples"] > 0


def test_dilution_correction(spark):
    """X7 (miletos/main.py:11919-11931): contrati=1 is the identity;
    contrati>1 deepens a transit by exactly that factor."""
    from pyspark.sql import functions as F

    from miletos_spark.model.forward import dilution_correction

    df = spark.createDataFrame(
        [(1.0,), (0.99,), (0.95,)], "flux double"
    )
    same = df.select(dilution_correction(F.col("flux"), 1.0).alias("f"))
    assert [r["f"] for r in same.collect()] == [1.0, 0.99, 0.95]
    deep = {
        r["flux"]: r["f"]
        for r in df.select(
            "flux", dilution_correction(F.col("flux"), 2.0).alias("f")
        ).collect()
    }
    assert deep[1.0] == 1.0
    assert abs(deep[0.99] - 0.98) < 1e-12  # depth 0.01 -> 0.02


def test_phase_curve_decomposition_identity(spark):
    """M9 component decomposition (miletos/main.py:1950-2025):
    totl = stel + elli + beam + plan by construction; components carry
    the injected amplitudes at their phase extremes."""
    from miletos_spark.model.forward import phase_curve_components

    p, e, dep, dur = 4.0, 0.5, 0.01, 0.3
    ab, ae, ad, an = 2e-4, 1e-4, 3e-4, 1e-4
    n = 4000
    df = spark.range(n).select((F.col("id") * (8.0 / n)).alias("t"))
    comps = phase_curve_components(F.col("t"), p, e, dep, dur, ab, ae, ad, an)
    out = df.select("t", *[c.alias(k) for k, c in comps.items()])
    rows = out.collect()
    for r in rows:
        assert r["totl"] == pytest.approx(
            r["stel"] + r["elli"] + r["beam"] + r["plan"], abs=1e-12
        )
        assert r["pmod"] == pytest.approx(r["plan"] - r["nigh"], abs=1e-12)
    # quarter phase (phi=0.25): beaming at +ab, ellipsoidal at +ae
    quarter = min(rows, key=lambda r: abs(((r["t"] - e) / p) % 1.0 - 0.25))
    assert quarter["beam"] == pytest.approx(ab, rel=1e-2)
    assert quarter["elli"] == pytest.approx(ae, rel=1e-2)
    # near transit center (phi=0): nightside facing -> plan ~ an,
    # stellar shows the transit dip
    tc = min(rows, key=lambda r: abs(((r["t"] - e) / p) % 1.0))
    assert tc["plan"] == pytest.approx(an, rel=0.05)
    assert tc["stel"] == pytest.approx(1.0 - dep, abs=1e-9)
