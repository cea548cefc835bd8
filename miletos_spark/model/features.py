"""M8 — derived physical features (`calc_feat_alle`,
miletos/main.py:1231-1585) + A5 posterior percentile summaries
(miletos/main.py:1566-1571).

Pure column arithmetic (withColumn chains) over a table of per-sample
(or per-candidate) parameters, then 16/50/84 exact percentiles per
group. Stellar parameters default to solar; the feature formulas are
the standard public relations the reference pulls from `nicomedia`:

- radius ratio      rratio = sqrt(depth)
- planet radius     rp_rearth = rratio · rstar_rsun · 109.076
- semi-major axis   a_au = (P_yr² · mstar_msun)^(1/3)   [Kepler III]
- a / R*            a_rs = a_au · 215.032 / rstar_rsun
- equilibrium temp  teq_k = tstar_k · sqrt(rstar_rsun/(2·a_rs·rstar_rsun))
                    = tstar_k · sqrt(1/(2·a_rs))        [zero albedo]
- insolation        insol_earth = (rstar_rsun² · (tstar_k/5772)⁴) / a_au²
- transit duration  dura_hr = P_hr/π · asin(1/a_rs)     [central transit]
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AU_PER_RSUN = 215.032
REARTH_PER_RSUN = 109.076
TSUN_K = 5772.0


def derived_features(
    df: DataFrame,
    depth_col: str = "depth",
    period_col: str = "period",
    rstar_rsun: float = 1.0,
    mstar_msun: float = 1.0,
    tstar_k: float = TSUN_K,
) -> DataFrame:
    """Append the derived-feature columns to a params table. Depth is
    relative (not ppt); period in days."""
    depth = F.col(depth_col)
    p_days = F.col(period_col)
    rratio = F.sqrt(depth)
    a_au = F.pow(
        F.pow(p_days / F.lit(365.25), 2) * F.lit(float(mstar_msun)), 1.0 / 3.0
    )
    a_rs = a_au * F.lit(AU_PER_RSUN) / F.lit(float(rstar_rsun))
    return (
        df.withColumn("rratio", rratio)
        .withColumn(
            "rp_rearth", rratio * F.lit(float(rstar_rsun) * REARTH_PER_RSUN)
        )
        .withColumn("a_au", a_au)
        .withColumn("a_rs", a_rs)
        .withColumn(
            "teq_k", F.lit(float(tstar_k)) * F.sqrt(1.0 / (2.0 * a_rs))
        )
        .withColumn(
            "insol_earth",
            F.lit(float(rstar_rsun) ** 2)
            * F.pow(F.lit(float(tstar_k) / TSUN_K), 4)
            / (a_au * a_au),
        )
        .withColumn(
            "dura_hr",
            p_days * F.lit(24.0) / F.lit(3.141592653589793) * F.asin(1.0 / a_rs),
        )
    )


def percentile_summary(
    df: DataFrame,
    feature_cols: Sequence[str],
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """A5 — 16/50/84 exact percentiles per feature per group: the
    reference's value ± asymmetric-error summary
    (miletos/main.py:1566-1571). Output columns `{feat}_p16/_p50/_p84`."""
    aggs = []
    for c in feature_cols:
        for q, tag in ((0.16, "p16"), (0.5, "p50"), (0.84, "p84")):
            aggs.append(
                F.expr(f"percentile({c}, {q!r})").alias(f"{c}_{tag}")
            )
    gb = df.groupBy(*group_cols) if group_cols else df.groupBy()
    return gb.agg(*aggs)
