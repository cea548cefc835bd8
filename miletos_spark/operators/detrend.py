"""X2–X4 — baseline detrending (miletos/main.py:6653-6904, 10890-11101).

Three backends mirroring the reference's `typebdtr`:

- ``median_detrend`` — median filter baseline (miletos/main.py:6784-6795):
  pure window aggregate, zero UDFs, the scale-default.
- ``spline_detrend`` — per-region LSQ spline (miletos/main.py:6779-6783):
  `applyInPandas` per (inst, chunk, ener, region); regions are bounded
  (≤ one sector) so group size is safe for Arrow batches.
- ``clip_detrend_loop`` — X4 alternate sigma-clip and detrend to
  fixpoint (≤5 iters, miletos/main.py:10931-11087).

Output convention follows the reference: detrended value =
``1 + value − baseline`` (miletos/main.py:6847-6851 semantics), so a
flat series normalizes to 1.0.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from miletos_spark.operators.sessionize import sessionize
from miletos_spark.operators.windows import rolling_median


def median_detrend(
    df: DataFrame,
    half_width: int,
    value_col: str = "value",
    time_col: str = "time",
    group_cols: Sequence[str] = (),
    out_col: str = "value_detrended",
    halo_chunk_rows: int | None = None,
) -> DataFrame:
    """X2 'medi' backend: baseline = centered rolling median; output
    1 + value − baseline. `halo_chunk_rows` parallelizes pooled-series
    windows exactly (see `rolling_median`)."""
    out = rolling_median(
        df, half_width, value_col=value_col, time_col=time_col,
        group_cols=group_cols, out_col="_baseline",
        halo_chunk_rows=halo_chunk_rows,
    )
    return out.withColumn(
        out_col, F.lit(1.0) + F.col(value_col) - F.col("_baseline")
    ).drop("_baseline")


def spline_detrend(
    df: DataFrame,
    knot_spacing_days: float = 0.5,
    order: int = 3,
    gap_days: float = 0.1,
    value_col: str = "value",
    time_col: str = "time",
    group_cols: Sequence[str] = ("inst", "chunk", "ener"),
    out_col: str = "value_detrended",
    max_region_days: float | None = 50.0,
) -> DataFrame:
    """X2 'Spline' backend: per gap-region LSQUnivariateSpline with
    interior knots every `knot_spacing_days` (miletos/main.py:6853-6886;
    defaults `timescalbdtr`, `ordrspln=3` miletos/main.py:7921-7925).

    Sessionize on gaps (W4) then fit per (group, region) inside an
    Arrow-batched `applyInPandas`. Degenerate regions (< order+2 points
    or fewer points than knots require) fall back to their mean, matching
    the reference's <4-point guard (miletos/main.py:6836-6851).

    `max_region_days` caps a fit region's time span: a continuous
    region longer than the cap is split into ceil(span/cap) EQUAL
    sub-fits (balanced, so every piece spans (cap/2, cap] — a naive
    split at cap multiples leaves a sliver tail with too few points
    for its knots, which would mean-fallback into a baseline
    discontinuity at the final boundary). The dense LSQ is
    O(n·k²) with BOTH n and k growing with region span, so an uncapped
    multi-year region is super-linear in volume (measured ×11.8 at
    10× span); capped, work is linear in span and the sub-regions
    parallelize. This mirrors the reference, which fits per sector —
    its regions are bounded by construction (miletos/main.py:9966-9999).
    """
    import pandas as pd

    sess = sessionize(df, gap_days, time_col=time_col, group_cols=group_cols)
    keys = [*group_cols, "region"]
    if max_region_days is not None:
        w = Window.partitionBy(*keys)
        span = F.col("_r1") - F.col("_r0")
        n_parts = F.greatest(
            F.lit(1), F.ceil(span / F.lit(float(max_region_days)))
        )
        sess = (
            sess.withColumn("_r0", F.min(time_col).over(w))
            .withColumn("_r1", F.max(time_col).over(w))
            .withColumn(
                "_part",
                F.when(
                    span > 0,
                    F.least(
                        F.floor(
                            (F.col(time_col) - F.col("_r0"))
                            * n_parts / span
                        ),
                        n_parts - 1,
                    ),
                ).otherwise(F.lit(0)).cast("int"),
            )
            .drop("_r0", "_r1")
        )
        keys = [*keys, "_part"]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in sess.schema.fields
    ) + f", {out_col} double"

    def fit_region(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        t = pdf[time_col].to_numpy()
        y = pdf[value_col].to_numpy()
        o = np.argsort(t)
        t_s, y_s = t[o], y[o]
        span = float(t_s[-1] - t_s[0]) if len(t_s) > 1 else 0.0
        n_knots = int(span / knot_spacing_days)
        if len(t_s) <= order + 1 + n_knots or span <= 0:
            baseline = np.full_like(y_s, np.mean(y_s))  # <4-point guard
        else:
            knots = t_s[0] + np.arange(1, n_knots + 1) * span / (n_knots + 1)
            try:
                from scipy.interpolate import LSQUnivariateSpline

                baseline = LSQUnivariateSpline(t_s, y_s, knots, k=order)(t_s)
            except ImportError:
                # numpy-only LSQ spline: truncated-power basis
                # f(t) = Σ a_j u^j + Σ b_k (u−κ_k)_+^order, u = normalized t
                u = (t_s - t_s[0]) / span
                uk = (knots - t_s[0]) / span
                cols = [u**j for j in range(order + 1)]
                cols += [np.clip(u - k, 0.0, None) ** order for k in uk]
                A = np.stack(cols, axis=1)
                coef, *_ = np.linalg.lstsq(A, y_s, rcond=None)
                baseline = A @ coef
        res = pdf.iloc[o].copy()
        res[out_col] = 1.0 + y_s - baseline
        return res

    out = sess.groupBy(*keys).applyInPandas(fit_region, schema=out_schema)
    return out.drop("_part") if max_region_days is not None else out


def _gp_smooth_matern32(t_s, yc, sig2: float, rho: float, sn2: float):
    """O(n) Matern-3/2 GP posterior mean via the state-space form:
    Kalman filter forward + RTS smoother backward over state x =
    [f, f'] (shared core: `model.statespace`). Equals the dense
    K(K+σₙ²I)⁻¹y posterior mean to solver precision, at O(n·2²)
    instead of O(n³) — the 100 TB path for long-timescale baselines
    where gap regions grow with data density."""
    import numpy as np

    from miletos_spark.model.statespace import kalman_forward, rts_posterior_mean

    n = len(t_s)
    fwd = kalman_forward(
        t_s, yc, sig2, rho, np.full(n, float(sn2)),
        keep_paths=True, with_loglik=False,
    )
    return rts_posterior_mean(fwd, n)


# above this many points, a region's dense O(n³) solve switches to the
# O(n) state-space smoother (single source of truth + crossover
# measurements: model/statespace.py)
from miletos_spark.model.statespace import GP_DENSE_CUTOFF  # noqa: E402


def gp_detrend(
    df: DataFrame,
    timescale_days: float = 2.0,
    noise: float | None = None,
    gap_days: float = 0.1,
    value_col: str = "value",
    time_col: str = "time",
    stdv_col: str = "stdv",
    group_cols: Sequence[str] = ("inst", "chunk", "ener"),
    out_col: str = "value_detrended",
) -> DataFrame:
    """X2 'GaussianProcess' backend — the reference DEFAULT
    (`typebdtr='GaussianProcess'`, miletos/main.py:7919): per gap-region
    Matern-3/2 GP baseline (celerite kernel, miletos/main.py:707-732),
    computed exactly with numpy dense algebra instead of celerite's
    O(n) solver — regions are bounded (≤ a sector), so the O(n³) solve
    stays in-memory per group; the cluster parallelizes across regions.

    baseline = K (K + σ_n² I)⁻¹ (y − ȳ) + ȳ,
    K_ij = σ²(1 + √3 r/ρ) exp(−√3 r/ρ), r = |t_i − t_j|, ρ = timescale.
    Output `1 + value − baseline` (reference convention).
    """
    import pandas as pd

    sess = sessionize(df, gap_days, time_col=time_col, group_cols=group_cols)
    keys = [*group_cols, "region"]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in sess.schema.fields
    ) + f", {out_col} double"
    rho = float(timescale_days)

    def fit_region(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        t = pdf[time_col].to_numpy(dtype=float)
        y = pdf[value_col].to_numpy(dtype=float)
        o = np.argsort(t)
        t_s, y_s = t[o], y[o]
        n = len(t_s)
        if n < 4:  # degenerate-region guard (miletos/main.py:6836-6851)
            baseline = np.full(n, y_s.mean() if n else 0.0)
        else:
            mu = y_s.mean()
            yc = y_s - mu
            sig2 = float(np.var(yc)) or 1e-12
            if noise is not None:
                sn2 = float(noise) ** 2
            elif stdv_col in pdf.columns:
                sn2 = float(np.mean(pdf[stdv_col].to_numpy()[o]) ** 2) or 1e-12
            else:
                sn2 = 0.01 * sig2
            if n > GP_DENSE_CUTOFF:
                # O(n) state-space path: identical posterior mean,
                # no n×n kernel materialization
                baseline = (
                    _gp_smooth_matern32(t_s, yc, sig2, rho, sn2) + mu
                )
            else:
                r = np.abs(t_s[:, None] - t_s[None, :]) * (
                    np.sqrt(3.0) / rho
                )
                K = sig2 * (1.0 + r) * np.exp(-r)
                alpha = np.linalg.solve(K + sn2 * np.eye(n), yc)
                baseline = K @ alpha + mu
        res = pdf.iloc[o].copy()
        res[out_col] = 1.0 + y_s - baseline
        return res

    return sess.groupBy(*keys).applyInPandas(fit_region, schema=out_schema)


def clip_detrend_loop(
    df: DataFrame,
    half_width: int,
    low: float = 3.0,
    high: float = 3.0,
    max_iter: int = 5,
    value_col: str = "value",
    time_col: str = "time",
    group_cols: Sequence[str] = (),
    clip_per_group: bool = False,
    halo_chunk_rows: int | None = None,
) -> DataFrame:
    """X4 — alternate 3σ clip (on the detrended residual) and median
    re-detrend until the kept row count is stable or `max_iter`
    (miletos/main.py:10931-11087; cap miletos/main.py:8586).

    Driver loop over cached DataFrames; each pass = one window job +
    one agg + one filter. Final pass evaluates the trend on the
    surviving rows and returns them with `value_detrended`.

    With `clip_per_group` the σ-clip thresholds are computed PER
    `group_cols` group (broadcast-joined back) instead of pooled — the
    population-run semantics, where each target clips on its own
    residual scatter. Default stays the pooled clip the single-series
    driver queries document.
    """
    work = df
    prev = None
    for _ in range(max_iter):
        det = median_detrend(
            work, half_width, value_col=value_col, time_col=time_col,
            group_cols=group_cols, halo_chunk_rows=halo_chunk_rows,
        ).cache()
        if clip_per_group and group_cols:
            # ONE action per iteration on the per-group branch too
            # (r15, the pooled branch's r14 treatment extended): the
            # fixpoint count and the per-group clip stats come from the
            # same aggregate job (which also materializes the cache) —
            # the separate count() + broadcast-build pair cost one
            # extra scheduled pass per iteration on the anchors'
            # critical path. The stats table is one row per target (the
            # broadcast already implied driver-sized), so collect it
            # and re-expose it as an Arrow local relation: the
            # subsequent broadcast builds driver-side with no job.
            keys = list(group_cols)
            gagg = det.groupBy(*keys).agg(
                F.count("*").alias("_cn"),
                F.avg("value_detrended").alias("_cmu"),
                F.stddev_pop("value_detrended").alias("_csd"),
            )
            grows = gagg.collect()
            n = sum(r["_cn"] for r in grows)
        else:
            # ONE action per iteration: the row count (the fixpoint
            # test) and the clip stats come from the same aggregate
            # job, which also materializes the cache — the separate
            # count() + stats.first() pair cost one extra sequential
            # job per iteration on the pipeline anchors' critical
            # path (r14, guide §1.2 step 1: fewer passes). The stats
            # of the final (converged) iteration are computed and
            # unused — same job, no extra pass.
            srow = det.agg(
                F.count("*").alias("_n"),
                F.avg("value_detrended").alias("mu"),
                F.stddev_pop("value_detrended").alias("sd"),
            ).first()
            n = srow["_n"]
        if prev is not None and n == prev:
            return det
        prev = n
        if clip_per_group and group_cols:
            from miletos_spark.schema import local_relation

            gstats = local_relation(
                det.sparkSession, grows, gagg.schema
            ).drop("_cn")
            work = (
                det.join(F.broadcast(gstats), keys)
                .filter(
                    (F.col("_csd") == 0.0)
                    | (
                        (F.col("value_detrended")
                         > F.col("_cmu") - low * F.col("_csd"))
                        & (F.col("value_detrended")
                           < F.col("_cmu") + high * F.col("_csd"))
                    )
                )
                .drop("value_detrended", "_cmu", "_csd")
            )
            continue
        mu, sd = srow["mu"], srow["sd"]
        if not sd:
            return det
        work = det.filter(
            (F.col("value_detrended") > mu - low * sd)
            & (F.col("value_detrended") < mu + high * sd)
        ).drop("value_detrended")
    return median_detrend(
        work, half_width, value_col=value_col, time_col=time_col,
        group_cols=group_cols, halo_chunk_rows=halo_chunk_rows,
    )
