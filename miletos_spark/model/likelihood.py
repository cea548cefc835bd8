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
