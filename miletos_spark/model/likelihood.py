"""M3 — Gaussian log-likelihood as an aggregation
(`retr_llik_mile`, miletos/main.py:735-850) and the closed-form
weighted-least-squares transit-depth estimator.

The pure-Gaussian likelihood `−0.5·Σ((d−m)/σ)²` is an algebraic
aggregate — map-side combinable, one shuffle of |groups| rows, fully
SQL-expressible (so the driver oracle can verify it). The depth fit
exploits that the trapezoid model is LINEAR in depth:

    d_i = 1 − depth·s_i + ε_i,  ε ~ N(0, σ_i²)
    ⇒ deptĥ = Σ w_i s_i (1 − d_i) / Σ w_i s_i²,  w_i = 1/σ_i²

with variance 1/Σ w_i s_i² — the BLS inner kernel (A4) generalized to
weighted shapes, again a plain aggregation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def gaussian_loglik(
    df: DataFrame,
    model_col: Column | str,
    value_col: str = "value",
    stdv_col: str = "stdv",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group Gaussian log-likelihood (without the constant term,
    matching the reference's `−0.5·Σ((d−m)/σ)²`) plus chi² and n."""
    m = F.col(model_col) if isinstance(model_col, str) else model_col
    z = (F.col(value_col) - m) / F.col(stdv_col)
    gb = df.groupBy(*group_cols) if group_cols else df.groupBy()
    return gb.agg(
        (F.lit(-0.5) * F.sum(z * z)).alias("loglik"),
        F.sum(z * z).alias("chi2"),
        # F5 `boolrejeoutlllik` (miletos/main.py:819-821): the
        # worst-sample-rejected likelihood drops the largest single
        # chi2 term — one extra max aggregate, same single pass
        (F.lit(-0.5) * (F.sum(z * z) - F.max(z * z))).alias("loglik_rej"),
        F.count("*").alias("n"),
    )


# single cutoff shared with the detrend smoother (crossover
# measurements: model/statespace.py)
from miletos_spark.model.statespace import GP_DENSE_CUTOFF as GP_LLIK_DENSE_CUTOFF  # noqa: E501


def _gp_llik_matern32_ss(t_s, y, sig2: float, rho: float, r_diag) -> float:
    """O(n) Matern-3/2 GP marginal log-likelihood via the state-space
    prediction-error decomposition: run the Kalman filter (shared core:
    `model.statespace`) and sum the innovation terms
    −½(ν²/S + ln S + ln 2π). Exactly equals the dense
    −½yᵀC⁻¹y − ½ln|C| − n/2·ln 2π (same model, exact inference;
    agreement asserted in tests), at O(n) instead of O(n³) — the scale
    path for DENSE series where gap regions grow with data density.
    `r_diag` is the per-sample measurement variance (heteroscedastic)."""
    from miletos_spark.model.statespace import kalman_forward

    return kalman_forward(t_s, y, sig2, rho, r_diag)["loglik"]


def gp_loglik(
    df: DataFrame,
    model_col: Column | str | None,
    sigma: float,
    rho: float,
    value_col: str = "value",
    stdv_col: str = "stdv",
    time_col: str = "time",
    group_cols: Sequence[str] = (),
    gap_days: float | None = None,
) -> DataFrame:
    """M3/M4 — `typellik='GaussianProcess'` (miletos/main.py:771-808):
    the marginal log-likelihood of the residual (data − model) under a
    Matern-3/2 GP noise model (the celerite kernel the reference builds
    in `setp_gpro`, miletos/main.py:707-732) plus the per-sample
    measurement errors:

        C = K + diag(σ_err²),  K_ij = σ²(1+r)e^{−r},  r = √3|Δt|/ρ
        llik = −½ yᵀC⁻¹y − ½ log|C| − n/2·log 2π

    Evaluated exactly per (group[, gap-region]) with a dense Cholesky
    inside applyInPandas — the same seam as the GP detrend (SURVEY §7.3):
    regions are bounded (≤ a sector) so the O(n³) factorization stays
    in-memory per task and the cluster parallelizes across regions.

    With `gap_days`, the series is sessionized and the per-region
    log-likelihoods SUM — a block-diagonal covariance across gap
    regions. For gaps ≫ ρ the Matern correlation across them is
    e^{−√3·gap/ρ} ≈ 0, so the block-diagonal likelihood equals the full
    one to machine precision while never materializing a cross-region
    kernel — the scale-correct factorization.

    Returns one row per group: group_cols + (loglik, n).
    """
    import pandas as pd

    from miletos_spark.operators.sessionize import sessionize

    if model_col is None:
        resid_src = df.withColumn("_resid", F.col(value_col))
    else:
        m = F.col(model_col) if isinstance(model_col, str) else model_col
        resid_src = df.withColumn("_resid", F.col(value_col) - m)

    if gap_days is not None:
        sess = sessionize(
            resid_src, gap_days, time_col=time_col, group_cols=group_cols
        )
        keys = [*group_cols, "region"]
    else:
        sess = resid_src.withColumn("region", F.lit(0))
        keys = [*group_cols, "region"]

    gtypes = {f.name: f.dataType.simpleString() for f in sess.schema.fields}
    out_schema = ", ".join(
        [f"{c} {gtypes[c]}" for c in keys] + ["loglik double", "n long"]
    )
    sig2, rho_f = float(sigma) ** 2, float(rho)

    def region_llik(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        t = pdf[time_col].to_numpy(dtype=float)
        y = pdf["_resid"].to_numpy(dtype=float)
        e = (
            pdf[stdv_col].to_numpy(dtype=float)
            if stdv_col in pdf.columns
            else np.zeros_like(t)
        )
        o = np.argsort(t)
        t, y, e = t[o], y[o], e[o]
        n = len(t)
        if n > GP_LLIK_DENSE_CUTOFF:
            # O(n) path: dense data has FEW gaps, so gap regions GROW
            # with density and the O(n³) Cholesky becomes the scale
            # bottleneck exactly where the data is richest (hung at
            # sf0.1 already). Identical marginal likelihood.
            loglik = _gp_llik_matern32_ss(t, y, sig2, rho_f, e * e + 1e-12)
        else:
            r = np.abs(t[:, None] - t[None, :]) * (np.sqrt(3.0) / rho_f)
            c = sig2 * (1.0 + r) * np.exp(-r) + np.diag(e * e + 1e-12)
            # Cholesky for the log-det (numerically safe), one solve for
            # the quadratic form — numpy-only (no scipy here)
            ll = np.linalg.cholesky(c)
            alpha = np.linalg.solve(c, y)
            loglik = (
                -0.5 * float(y @ alpha)
                - float(np.log(np.diag(ll)).sum())
                - 0.5 * n * np.log(2.0 * np.pi)
            )
        return pd.DataFrame([[*key, loglik, n]], columns=[*keys, "loglik", "n"])

    per_region = sess.groupBy(*keys).applyInPandas(region_llik, schema=out_schema)
    gb = per_region.groupBy(*group_cols) if group_cols else per_region.groupBy()
    return gb.agg(F.sum("loglik").alias("loglik"), F.sum("n").alias("n"))


def depth_fit_closed_form(
    df: DataFrame,
    shape_col: Column | str,
    value_col: str = "value",
    stdv_col: str = "stdv",
    group_cols: Sequence[str] = (),
    exact: bool = False,
) -> DataFrame:
    """Weighted-least-squares depth: the maximum-likelihood amplitude of
    a unit-depth shape under Gaussian errors, with its 1σ uncertainty —
    one aggregation, no optimizer.

    `exact=True` sums the per-row terms as DECIMAL(38,18): each term is
    still computed in IEEE double (bit-identical across engines for the
    same expression), but the summation becomes order-independent, so
    the result no longer carries ~n·eps reordering noise from Spark's
    partial-aggregation order. Use for oracle-compared outputs whose
    rounded value would otherwise sit within noise of a rounding
    boundary; the DuckDB twin mirrors it with the same CAST."""
    s = F.col(shape_col) if isinstance(shape_col, str) else shape_col
    w = F.lit(1.0) / (F.col(stdv_col) * F.col(stdv_col))
    term_num = w * s * (F.lit(1.0) - F.col(value_col))
    term_den = w * s * s
    if exact:
        num = F.sum(term_num.cast("decimal(38,18)")).cast("double")
        den = F.sum(term_den.cast("decimal(38,18)")).cast("double")
    else:
        num = F.sum(term_num)
        den = F.sum(term_den)
    gb = df.groupBy(*group_cols) if group_cols else df.groupBy()
    return gb.agg(
        (num / den).alias("depth_hat"),
        (F.lit(1.0) / F.sqrt(den)).alias("depth_err"),
        F.sum((s > 0).cast("long")).alias("n_in_shape"),
    )
