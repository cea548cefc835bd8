"""M5 — per-group inference (`proc_modl` `typeinfe='opti'`,
miletos/main.py:3928-4169): maximize the Gaussian likelihood of the
trapezoid transit model per series group, inside an Arrow-batched
`applyInPandas`.

Spark-first shape: groups (target × instrument × energy-iteration) fan
out across the cluster — the reference's population runs (thousands of
independent targets) are exactly Spark's parallelism axis; within a
group the data is a bounded series chunk, so driver-side numpy is safe.

Dependency-free: a small deterministic Nelder–Mead (the reference uses
`scipy.optimize.minimize(Nelder-Mead)`; same algorithm, fixed initial
simplex, no randomness). scipy is used instead when importable.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame


def _nelder_mead(fn, x0, steps, max_iter=200, xtol=1e-10, ftol=1e-12):
    """Minimal deterministic Nelder–Mead; x0/steps set the initial
    simplex. Returns (x_best, f_best)."""
    n = len(x0)
    sim = np.empty((n + 1, n))
    sim[0] = x0
    for i in range(n):
        v = np.array(x0, dtype=float)
        v[i] += steps[i]
        sim[i + 1] = v
    fv = np.array([fn(v) for v in sim])
    for _ in range(max_iter):
        order = np.argsort(fv, kind="stable")
        sim, fv = sim[order], fv[order]
        if np.max(np.abs(sim[1:] - sim[0])) < xtol or fv[-1] - fv[0] < ftol:
            break
        centroid = sim[:-1].mean(axis=0)
        xr = centroid + (centroid - sim[-1])  # reflect
        fr = fn(xr)
        if fr < fv[0]:
            xe = centroid + 2.0 * (centroid - sim[-1])  # expand
            fe = fn(xe)
            sim[-1], fv[-1] = (xe, fe) if fe < fr else (xr, fr)
        elif fr < fv[-2]:
            sim[-1], fv[-1] = xr, fr
        else:
            xc = centroid + 0.5 * (sim[-1] - centroid)  # contract
            fc = fn(xc)
            if fc < fv[-1]:
                sim[-1], fv[-1] = xc, fc
            else:  # shrink
                for i in range(1, n + 1):
                    sim[i] = sim[0] + 0.5 * (sim[i] - sim[0])
                    fv[i] = fn(sim[i])
    best = int(np.argmin(fv))
    return sim[best], fv[best]


def _trapezoid_np(t, period, epoch, depth, dura_total, dura_ingress=None):
    if dura_ingress is None:
        dura_ingress = 0.1 * dura_total
    t14h = dura_total / 2.0
    t23h = max(t14h - dura_ingress, 0.0)
    ph = np.mod(t - epoch, period)
    ph = np.where(ph > period / 2.0, ph - period, ph)
    dt = np.abs(ph)
    frac = (t14h - dt) / max(t14h - t23h, 1e-12)
    shape = np.where(dt <= t23h, 1.0, np.where(dt < t14h, frac, 0.0))
    return 1.0 - depth * shape


def _stretch_move_mcmc(log_prob, x0, n_walkers, n_steps, seed, a=2.0):
    """Affine-invariant ensemble sampler (Goodman & Weare 2010 stretch
    move — the emcee/tdpy algorithm the reference uses for
    `typeinfe='samp'`, miletos/main.py:12131-12133). Deterministic via
    a seeded Generator. Returns (n_steps*n_walkers, dim) chain."""
    rng = np.random.default_rng(seed)
    dim = len(x0)
    walkers = x0 + 1e-4 * np.abs(x0).clip(1e-6) * rng.standard_normal(
        (n_walkers, dim)
    )
    lp = np.array([log_prob(w) for w in walkers])
    chain = []
    for _ in range(n_steps):
        for i in range(n_walkers):
            j = rng.integers(n_walkers - 1)
            j = j if j < i else j + 1
            z = (1.0 + (a - 1.0) * rng.random()) ** 2 / a
            prop = walkers[j] + z * (walkers[i] - walkers[j])
            lp_prop = log_prob(prop)
            if np.log(rng.random() + 1e-300) < (dim - 1) * np.log(z) + lp_prop - lp[i]:
                walkers[i], lp[i] = prop, lp_prop
        chain.append(walkers.copy())
    return np.concatenate(chain, axis=0)


def sample_transit_groups(
    df: DataFrame,
    period: float,
    epoch0: float,
    depth0: float = 0.01,
    dura0: float = 0.1,
    n_walkers: int = 24,
    n_steps: int = 200,
    burn_frac: float = 0.3,
    seed: int = 42,
    group_cols: Sequence[str] = ("inst", "chunk"),
    time_col: str = "time",
    value_col: str = "value",
    stdv_col: str = "stdv",
) -> DataFrame:
    """M5 `typeinfe='samp'`: per-group ensemble MCMC over
    (epoch, depth, dura) of the fixed-period trapezoid, inside
    applyInPandas. Defaults mirror the reference's sampler scale
    (100-walker/30%-burn shape, miletos/main.py:12131-12133) scaled to
    test size. Returns A5-style 16/50/84 posterior percentiles per
    parameter per group."""
    import pandas as pd

    keys = list(group_cols)
    pctiles = [
        f"{p}_{t} double"
        for p in ("epoch", "depth", "dura")
        for t in ("p16", "p50", "p84")
    ]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keys).schema.fields
    ) + ", " + ", ".join(pctiles) + ", n_samples long"

    p, e0, d0, w0 = float(period), float(epoch0), float(depth0), float(dura0)

    def sample_one(pdf: pd.DataFrame) -> pd.DataFrame:
        t = pdf[time_col].to_numpy(dtype=float)
        y = pdf[value_col].to_numpy(dtype=float)
        s = pdf[stdv_col].to_numpy(dtype=float)

        def log_prob(x):
            epoch, depth, dura = x
            if dura <= 0 or dura > p / 2 or abs(depth) > 1.0:
                return -1e30
            m = _trapezoid_np(t, p, epoch, depth, dura)
            z = (y - m) / s
            return -0.5 * float(z @ z)

        chain = _stretch_move_mcmc(
            log_prob, np.array([e0, d0, w0]), n_walkers, n_steps, seed
        )
        post = chain[int(len(chain) * burn_frac):]
        row = {k: pdf[k].iloc[0] for k in keys}
        for d_idx, name in enumerate(("epoch", "depth", "dura")):
            q16, q50, q84 = np.percentile(post[:, d_idx], [16, 50, 84])
            row[f"{name}_p16"] = float(q16)
            row[f"{name}_p50"] = float(q50)
            row[f"{name}_p84"] = float(q84)
        row["n_samples"] = len(post)
        return pd.DataFrame([row])

    return df.groupBy(*keys).applyInPandas(sample_one, schema=out_schema)


def fit_transit_groups(
    df: DataFrame,
    period: float | None,
    epoch0: float | None,
    depth0: float = 0.01,
    dura0: float = 0.1,
    group_cols: Sequence[str] = ("inst", "chunk"),
    time_col: str = "time",
    value_col: str = "value",
    stdv_col: str = "stdv",
    period_col: str | None = None,
    epoch_col: str | None = None,
    dura_col: str | None = None,
) -> DataFrame:
    """Fit (epoch, depth, dura_total) of a fixed-period trapezoid per
    group by chi² minimization. Returns one row per group:
    group_cols + (epoch_hat, depth_hat, dura_hat, chi2, n).

    The per-group series must be bounded (a sector/chunk); the fit is
    deterministic (fixed initial simplex, stable sort).

    The population form: when `period_col`/`epoch_col`/`dura_col` are
    given, each group's fixed period and initial (epoch, dura) are read
    from ITS OWN columns (constant within the group — e.g. the target's
    top BLS detection broadcast-joined in) instead of shared scalars,
    so N targets with N different ephemerides fit in one
    applyInPandas."""
    import pandas as pd

    keys = list(group_cols)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keys).schema.fields
    ) + ", epoch_hat double, depth_hat double, dura_hat double, chi2 double, n long"

    if period_col is None and period is None:
        raise ValueError("either period or period_col is required")
    p_s = float(period) if period is not None else None
    e_s = float(epoch0) if epoch0 is not None else None
    d0 = float(depth0)
    w_s = float(dura0)

    def fit_one(pdf: pd.DataFrame) -> pd.DataFrame:
        p = float(pdf[period_col].iloc[0]) if period_col else p_s
        e0 = float(pdf[epoch_col].iloc[0]) if epoch_col else e_s
        w0 = float(pdf[dura_col].iloc[0]) if dura_col else w_s
        t = pdf[time_col].to_numpy(dtype=float)
        y = pdf[value_col].to_numpy(dtype=float)
        s = pdf[stdv_col].to_numpy(dtype=float)

        def chi2(x):
            epoch, depth, dura = x
            if dura <= 0 or dura > p / 2 or abs(depth) > 1.0:
                return 1e30
            m = _trapezoid_np(t, p, epoch, depth, dura)
            z = (y - m) / s
            return float(z @ z)

        # one restart from the first optimum (fresh simplex): Nelder-Mead
        # can stall on a collapsed simplex near piecewise-linear kinks of
        # the trapezoid; re-expanding around the incumbent is the
        # standard deterministic polish (same move the reference's scipy
        # driver gets from its default adaptive restarts)
        try:
            from scipy.optimize import minimize

            x, fx = [e0, d0, w0], None
            for _ in range(2):
                res = minimize(
                    chi2, x, method="Nelder-Mead",
                    options={"maxiter": 400, "xatol": 1e-10, "fatol": 1e-12},
                )
                x, fx = res.x, float(res.fun)
        except ImportError:
            x, fx = _nelder_mead(
                chi2, [e0, d0, w0], [0.05 * p, max(d0, 1e-3), 0.5 * w0]
            )
            x, fx = _nelder_mead(
                chi2, x, [0.005 * p, max(0.1 * d0, 1e-4), 0.05 * w0]
            )
        row = {k: pdf[k].iloc[0] for k in keys}
        row.update(
            epoch_hat=float(x[0]), depth_hat=float(x[1]),
            dura_hat=float(x[2]), chi2=fx, n=len(t),
        )
        return pd.DataFrame([row])

    return df.groupBy(*keys).applyInPandas(fit_one, schema=out_schema)
