"""M8 — derived physical features (`calc_feat_alle`,
miletos/main.py:1231-1585) + A5 posterior percentile summaries
(miletos/main.py:1566-1571).

Pure column arithmetic over a table of per-sample (or per-candidate)
parameters, then 16/50/84 exact percentiles per group.

Every feature formula lives ONCE in `FEATURE_EXPRS` as an ANSI-SQL
expression string: the Spark side evaluates it with `F.expr`, the
DuckDB oracle wraps the same strings in a CTE chain
(`sql_feature_ctes`) — textually identical expressions execute the
identical float op sequence in both engines, so rounded outputs hash
equal. Formulas are the standard public relations the reference pulls
from its `nicomedia` helper:

- geometry/orbit: incl, sini, ecce, omeg, sinw, rs2a, imfa
  (miletos/main.py:1334-1341, 1404-1418)
- star: loggstar, lumistar (miletos/main.py:1338, 1360-1361)
- planet: rratio, rp_rearth, a_au, a_rs, teq_k, insol_earth,
  depth_ppt, mass_pred (Weiss & Marcy 2014 stand-in for
  `retr_massfromradi`), dens_plan, v_esc (miletos/main.py:1343-1390)
- durations + blend limits: dura_hr, dura_full_hr, dura_total_hr,
  max_dept_blen, min_dilu, max_dmag (miletos/main.py:1432-1441)
- observables: rv_sema (public K formula), dept_beam, dept_elli
  (α_elli from Claret-style u=0.4, g=0.2), ampl_rm, snr_rm
  (miletos/main.py:1420-1450), tsm/esm (Kempton+2018 public metrics,
  miletos/main.py:1396-1402)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AU_PER_RSUN = 215.032
REARTH_PER_RSUN = 109.076
TSUN_K = 5772.0
PI = "3.141592653589793e0"

# Default stellar/system scalars, used when the params table carries no
# such columns (added as literals so the expressions below can always
# reference them by name).
DEFAULT_SCALARS = {
    "rstar": 1.0,     # R_sun
    "mstar": 1.0,     # M_sun
    "tstar": TSUN_K,  # K
    "vsini": 2.0,     # km/s (reference vsiistar)
    "jmag": 10.0,
    "kmag": 9.5,
}

# (name, ANSI-SQL expression). Later entries may reference earlier
# names. Inputs: depth, period (+ optional esin, ecos, cosi and the
# scalar columns above).
FEATURE_EXPRS: list[tuple[str, str]] = [
    # -- existing 7 (expression text unchanged for hash stability) ----
    ("rratio", "sqrt(depth)"),
    ("rp_rearth", "rratio * 109.076e0 * rstar"),
    ("a_au", "pow(pow(period / 365.25e0, 2) * mstar, 1.0e0/3.0e0)"),
    ("a_rs", "a_au * 215.032e0 / rstar"),
    ("teq_k", "tstar * sqrt(1.0e0 / (2.0e0 * a_rs))"),
    ("insol_earth",
     f"rstar * rstar * pow(tstar / {TSUN_K!r}e0, 4) / (a_au * a_au)"),
    ("dura_hr", f"period * 24.0e0 / {PI} * asin(1.0e0 / a_rs)"),
    # -- orbit geometry (miletos/main.py:1334-1341, 1404-1418) --------
    ("incl_deg", f"acos(cosi) * 180.0e0 / {PI}"),
    ("sini", "sqrt(1.0e0 - cosi * cosi)"),
    ("ecce", "esin * esin + ecos * ecos"),
    ("omeg_deg",
     f"180.0e0 / {PI} * ((atan2(esin, ecos) % (2.0e0 * {PI}) + 2.0e0 * {PI})"
     f" % (2.0e0 * {PI}))"),
    ("sinw", f"sin({PI} / 180.0e0 * omeg_deg)"),
    ("rsma", "(1.0e0 + rratio) / a_rs"),
    ("rs2a", "rsma / (1.0e0 + rratio)"),
    ("imfa",
     "cosi / rs2a * (1.0e0 - ecce * ecce) / (1.0e0 + ecce * sinw)"),
    # -- star (miletos/main.py:1338, 1360-1361) -----------------------
    ("loggstar", "mstar / (rstar * rstar)"),
    ("lumistar", "rstar * rstar * pow(tstar / 5778.0e0, 4)"),
    # -- planet bulk (miletos/main.py:1343-1390) ----------------------
    ("depth_ppt", "1000.0e0 * rratio * rratio"),
    # Weiss & Marcy 2014 piecewise mass-radius (public stand-in for
    # nicomedia.retr_massfromradi); giants capped at Jupiter-ish
    ("mass_pred",
     "CASE WHEN rp_rearth < 1.5e0"
     " THEN 0.440e0 * pow(rp_rearth, 3) + 0.614e0 * pow(rp_rearth, 4)"
     " WHEN rp_rearth < 4.0e0 THEN 2.69e0 * pow(rp_rearth, 0.93e0)"
     " ELSE least(0.86e0 * pow(rp_rearth, 1.89e0), 317.8e0) END"),
    ("dens_plan", "mass_pred / pow(rp_rearth, 3)"),
    # v_esc = 11.186e0 km/s * sqrt(M/R) in Earth units
    ("v_esc_kms", "11.186e0 * sqrt(mass_pred / rp_rearth)"),
    # -- durations + blend limits (miletos/main.py:1432-1441) ---------
    ("impact_b", "a_rs * cosi"),
    ("dura_total_hr",
     f"period * 24.0e0 / {PI} * asin(least(1.0e0, sqrt(greatest("
     "pow(1.0e0 + rratio, 2) - impact_b * impact_b, 0.0e0)) / (a_rs * sini)))"),
    ("dura_full_hr",
     f"period * 24.0e0 / {PI} * asin(least(1.0e0, sqrt(greatest("
     "pow(1.0e0 - rratio, 2) - impact_b * impact_b, 0.0e0)) / (a_rs * sini)))"),
    ("max_dept_blen",
     "1000.0e0 * pow(1.0e0 - dura_full_hr / dura_total_hr, 2)"
     " / pow(1.0e0 + dura_full_hr / dura_total_hr, 2)"),
    ("min_dilu", "depth_ppt / max_dept_blen"),
    # greatest() guard: min_dilu ≥ 1 would make the log argument
    # non-positive, where Spark yields NULL but DuckDB -inf/NaN —
    # clamp to a floor so both engines compute the same finite value
    ("max_dmag",
     "-2.5e0 * log10(greatest(min_dilu / (1.0e0 - min_dilu), 1e-12))"),
    # -- observables (miletos/main.py:1396-1402, 1420-1450) -----------
    # RV semi-amplitude, public formula: K[m/s] = 0.0895e0 m_e sin i
    #   (M*+m)^(-2/3) (P/yr)^(-1/3) / sqrt(1-e²)
    ("rv_sema_ms",
     f"0.0895e0 * mass_pred * sin(incl_deg * {PI} / 180.0e0)"
     " * pow(mstar, -2.0e0/3.0e0) * pow(period / 365.25e0, -1.0e0/3.0e0)"
     " / sqrt(1.0e0 - ecce * ecce)"),
    # Doppler beaming depth [ppt]: 4 K / c (consbeam = 1)
    ("dept_beam_ppt", "1000.0e0 * 4.0e0 * rv_sema_ms / 3e8 * 1000.0e0"),
    # ellipsoidal variation [ppt]; α_elli = 0.15e0(15+u)(1+g)/(3-u),
    # u = 0.4e0, g = 0.2e0 (miletos/main.py:1444-1449)
    ("dept_elli_ppt",
     "1000.0e0 * (0.15e0 * (15.0e0 + 0.4e0) * (1.0e0 + 0.2e0) / (3.0e0 - 0.4e0))"
     " * (mass_pred / 332946.0e0) / mstar"
     f" * pow(sin(incl_deg * {PI} / 180.0e0), 2) * pow(1.0e0 / a_rs, 3)"),
    # Rossiter-McLaughlin amplitude + its PFS S/N
    # (miletos/main.py:1453-1455)
    ("ampl_rm_ms",
     "2.0e0 / 3.0e0 * vsini * 1e-3 * depth_ppt"
     " * sqrt(greatest(1.0e0 - imfa, 0.0e0)) * 1000.0e0"),
    ("snr_rm",
     "(ampl_rm_ms / 0.9e0) * sqrt(greatest(dura_full_hr, 0.0e0)"
     " / (10.0e0 / 60.0e0))"),
    # TSM / ESM (Kempton+2018, public scale factors per radius bin)
    ("tsm",
     "(CASE WHEN rp_rearth < 1.5e0 THEN 0.19e0 WHEN rp_rearth < 2.75e0"
     " THEN 1.26e0 WHEN rp_rearth < 4.0e0 THEN 1.28e0 ELSE 1.15e0 END)"
     " * pow(rp_rearth, 3) * teq_k / (mass_pred * rstar * rstar)"
     " * pow(10.0e0, -jmag / 5.0e0)"),
    ("esm",
     "4.29e6 * (exp(1918.37e0 / tstar) - 1.0e0)"
     " / (exp(1918.37e0 / (1.1e0 * teq_k)) - 1.0e0)"
     " * rratio * rratio * pow(10.0e0, -kmag / 5.0e0)"),
]

FEATURE_NAMES = [name for name, _ in FEATURE_EXPRS]


def derived_features(
    df: DataFrame,
    depth_col: str = "depth",
    period_col: str = "period",
    rstar_rsun: float = 1.0,
    mstar_msun: float = 1.0,
    tstar_k: float = TSUN_K,
) -> DataFrame:
    """Append every derived-feature column to a params table. Depth is
    relative (not ppt); period in days. Orbit columns (esin, ecos,
    cosi) and scalar columns (rstar, mstar, tstar, vsini, jmag, kmag)
    are used when present, else filled with defaults — so the operator
    runs on anything from a bare (depth, period) table to a full
    posterior-sample dump."""
    if depth_col != "depth":
        df = df.withColumn("depth", F.col(depth_col))
    if period_col != "period":
        df = df.withColumn("period", F.col(period_col))
    scalars = dict(
        DEFAULT_SCALARS,
        rstar=float(rstar_rsun),
        mstar=float(mstar_msun),
        tstar=float(tstar_k),
    )
    for name, val in scalars.items():
        if name not in df.columns:
            df = df.withColumn(name, F.lit(float(val)))
    for name in ("esin", "ecos", "cosi"):
        if name not in df.columns:
            df = df.withColumn(name, F.lit(0.0))
    for name, expr in FEATURE_EXPRS:
        df = df.withColumn(name, F.expr(expr))
    return df


def sql_feature_ctes(base_cte: str, first: str = "f0") -> tuple[str, str]:
    """DuckDB twin: chain one CTE per feature over `base_cte` (which
    must provide depth, period, esin, ecos, cosi + scalar columns).
    Returns (cte_sql_fragment, final_cte_name). The expression strings
    are the SAME objects Spark executes via F.expr."""
    parts = []
    prev = base_cte
    for i, (name, expr) in enumerate(FEATURE_EXPRS):
        cur = f"{first}_{i}"
        parts.append(f"{cur} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = cur
    return ",\n".join(parts), prev


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
