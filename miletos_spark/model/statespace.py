"""Shared Matern-3/2 state-space core (Hartikainen & Sarkka 2010; the
same representation celerite exploits for the kernel the reference
builds in `setp_gpro`, miletos/main.py:707-732).

ONE copy of the numerically delicate filter algebra — transition
coefficients, the A·P·Aᵀ + (P∞ − A·P∞·Aᵀ) covariance prediction, and
the gain/update block — consumed by BOTH O(n) GP paths:

- `operators.detrend._gp_smooth_matern32` (posterior mean via RTS
  backward pass over the stored filter path), and
- `model.likelihood._gp_llik_matern32_ss` (marginal log-likelihood via
  the prediction-error decomposition).

Their dense twins assert agreement at 1e-9/1e-8 in tests; keeping the
filter in one place is what keeps those two claims coupled — a
stability fix applied here reaches both paths by construction.

State x = [f, f'], stationary covariance diag(σ², σ²λ²), λ = √3/ρ.
"""

from __future__ import annotations

import numpy as np

# above this many points, a region's dense O(n³) GP solve switches to
# the O(n) state-space path (both detrend and likelihood). Measured
# crossover on this container: dense n=400 ~13 ms vs smoother ~3 ms,
# dense n=1250 ~400 ms vs ~7 ms — the filter wins from a few hundred
# points, so dense survives only where the n×n kernel is literally
# cheaper than the Python-loop constant.
GP_DENSE_CUTOFF = 256


def matern32_transition(t_s, sig2: float, rho: float):
    """Per-step transition coefficients, vectorized once (the exp
    dominates a scalar loop otherwise): A_i = e·[[1+λdt, dt],
    [−λ²dt, 1−λdt]] with dt_i = t_i − t_{i−1} (identity at i = 0).
    Returns (Aa, Ab, Ac, Ad, s0, s1)."""
    n = len(t_s)
    lam = np.sqrt(3.0) / rho
    s0, s1 = sig2, sig2 * lam * lam
    dt = np.empty(n)
    dt[0] = 0.0
    dt[1:] = np.asarray(t_s[1:], dtype=float) - np.asarray(
        t_s[:-1], dtype=float
    )
    e = np.exp(-lam * dt)
    Aa = e * (1.0 + lam * dt)
    Ab = e * dt
    Ac = e * (-lam * lam * dt)
    Ad = e * (1.0 - lam * dt)
    Aa[0], Ab[0], Ac[0], Ad[0] = 1.0, 0.0, 0.0, 1.0
    return Aa, Ab, Ac, Ad, s0, s1


def kalman_forward(t_s, y, sig2: float, rho: float, r_diag,
                   keep_paths: bool = False, with_loglik: bool = True):
    """Kalman filter forward pass over the sorted series.

    `r_diag` is the per-sample measurement variance (array). Returns a
    dict with `loglik` (the prediction-error-decomposition marginal
    log-likelihood, −½Σ(ν²/S + ln S + ln 2π); None when `with_loglik`
    is off — the smoother path discards it, and the per-sample np.log
    is measurable inside this pure-Python hot loop) and, when
    `keep_paths`, the predicted/filtered mean/covariance arrays plus
    the transition coefficients the RTS backward pass needs."""
    n = len(t_s)
    Aa, Ab, Ac, Ad, s0, s1 = matern32_transition(t_s, sig2, rho)

    if keep_paths:
        mp0 = np.empty(n); mp1 = np.empty(n)          # predicted mean
        pp00 = np.empty(n); pp01 = np.empty(n); pp11 = np.empty(n)
        mf0 = np.empty(n); mf1 = np.empty(n)          # filtered mean
        pf00 = np.empty(n); pf01 = np.empty(n); pf11 = np.empty(n)

    m0 = m1 = 0.0
    p00, p01, p11 = s0, 0.0, s1
    ll = 0.0
    log2pi = np.log(2.0 * np.pi)
    for i in range(n):
        if i > 0:
            a, b, c, d = Aa[i], Ab[i], Ac[i], Ad[i]
            m0, m1 = a * m0 + b * m1, c * m0 + d * m1
            u0 = a * p00 + b * p01
            u1 = a * p01 + b * p11
            v0 = c * p00 + d * p01
            v1 = c * p01 + d * p11
            # A P Aᵀ + (P∞ − A P∞ Aᵀ)
            p00 = a * u0 + b * u1 + s0 - (a * a * s0 + b * b * s1)
            p01 = c * u0 + d * u1 - (a * c * s0 + b * d * s1)
            p11 = c * v0 + d * v1 + s1 - (c * c * s0 + d * d * s1)
        if keep_paths:
            mp0[i], mp1[i] = m0, m1
            pp00[i], pp01[i], pp11[i] = p00, p01, p11
        S = p00 + r_diag[i]
        innov = y[i] - m0
        if with_loglik:
            ll += -0.5 * (innov * innov / S + np.log(S) + log2pi)
        k0 = p00 / S
        k1 = p01 / S
        m0 += k0 * innov
        m1 += k1 * innov
        p11 -= k1 * p01
        p01 -= k0 * p01
        p00 -= k0 * p00
        if keep_paths:
            mf0[i], mf1[i] = m0, m1
            pf00[i], pf01[i], pf11[i] = p00, p01, p11

    out = {"loglik": float(ll) if with_loglik else None}
    if keep_paths:
        out.update(
            A=(Aa, Ab, Ac, Ad),
            mp=(mp0, mp1), pp=(pp00, pp01, pp11),
            mf=(mf0, mf1), pf=(pf00, pf01, pf11),
        )
    return out


def rts_posterior_mean(fwd: dict, n: int):
    """RTS backward smoother (mean only) over a `kalman_forward(...,
    keep_paths=True)` result: G = P_f Aᵀ P_p⁻¹. Returns the posterior
    mean of f at every sample."""
    Aa, Ab, Ac, Ad = fwd["A"]
    mp0, mp1 = fwd["mp"]
    pp00, pp01, pp11 = fwd["pp"]
    mf0, mf1 = fwd["mf"]
    pf00, pf01, pf11 = fwd["pf"]

    out = np.empty(n)
    ms0, ms1 = mf0[n - 1], mf1[n - 1]
    out[n - 1] = ms0
    for i in range(n - 2, -1, -1):
        j = i + 1
        a, b, c, d = Aa[j], Ab[j], Ac[j], Ad[j]
        q00, q01, q11 = pp00[j], pp01[j], pp11[j]
        det = q00 * q11 - q01 * q01
        f00, f01, f11 = pf00[i], pf01[i], pf11[i]
        t00 = f00 * a + f01 * b
        t01 = f00 * c + f01 * d
        t10 = f01 * a + f11 * b
        t11 = f01 * c + f11 * d
        g00 = (t00 * q11 - t01 * q01) / det
        g01 = (t01 * q00 - t00 * q01) / det
        g10 = (t10 * q11 - t11 * q01) / det
        g11 = (t11 * q00 - t10 * q01) / det
        dm0 = ms0 - mp0[j]
        dm1 = ms1 - mp1[j]
        ms0 = mf0[i] + g00 * dm0 + g01 * dm1
        ms1 = mf1[i] + g10 * dm0 + g11 * dm1
        out[i] = ms0
    return out
