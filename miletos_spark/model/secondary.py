"""M10 — secondary samplers (miletos/main.py:941-996).

Two small inference problems the reference solves by handing a
likelihood to its external sampler:

- `retr_llik_spec` (miletos/main.py:987-996): fit a planet
  brightness temperature to observed occultation depths — model depth
  [ppt] = 1e3 · rratio² · ∫B(T_p,λ)dλ / ∫B(T_*,λ)dλ, Gaussian
  log-likelihood against the measured depth.
- `retr_llik_albbepsi` (miletos/main.py:941-966): fit Bond albedo A
  and heat-recirculation efficiency ε — ψ = (1-A)^¼, T_irr = T_eq·ψ,
  dayside/nightside temperatures from ε, Gaussian log-likelihood
  against measured day/night temperatures plus a ψ prior.

Spark-first re-expression: both parameter spaces are tiny and bounded,
so the MAP fit is a declarative grid scan — broadcast-crossJoin the
parameter grid against the (already aggregated, small) per-group
observations, evaluate the likelihood as a pure column expression, and
take the top row per group with a deterministic window tiebreak. The
whole fit stays inside Catalyst/codegen, needs no Python, and — because
every formula lives once as an ANSI-SQL expression string (the
features.py pattern) — the DuckDB oracle executes the identical float
op sequence. The posterior-sampling role of the reference's
`tdpy.samp` is covered by `sample_albedo_groups`, which runs the same
likelihood through the seeded stretch-move ensemble sampler in
`infer.py` (rows-only check: stochastic, no SQL oracle).

Physics is public textbook material: Planck's law with the second
radiation constant c2 = 14387.770 µm·K; day/night temperatures from
irradiation temperature and recirculation efficiency (Cowan & Agol
2011, ApJ 729:54 eqs. 4-5): T_day = T_irr(2/3 - 5ε/12)^¼,
T_night = T_irr(ε/4)^¼.

Scale: the grids are O(100) literal rows (broadcast, no shuffle); the
observation side is one row per group (already reduced upstream), so
the scan materializes |groups|·|grid| rows and the argmax window
partitions are bounded by the grid size — safe at any corpus size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PLANCK_C2_UM_K = 14387.770  # second radiation constant, µm·K
DEFAULT_WLENS_UM = (0.6, 0.8, 1.0, 1.5, 2.0, 3.0, 4.0, 5.0)


def _dlit(v: float) -> str:
    """Literal text that parses as DOUBLE in both Spark and DuckDB
    (DuckDB reads plain decimal literals as DECIMAL; an exponent forces
    double — same trick as features.py's `...e0` constants)."""
    r = repr(float(v))
    return r if ("e" in r or "E" in r) else r + "e0"


def planck_sum_expr(t_expr: str, wlens: Sequence[float] = DEFAULT_WLENS_UM) -> str:
    """Σ_i Δλ_i · B(λ_i, T) with B ∝ λ⁻⁵ / (exp(c2/(λT)) - 1), as one
    expression string (trapezoid-style midpoint weights). The λ grid is
    folded into precomputed double literals so both engines evaluate
    the identical op sequence; only T remains a column reference."""
    terms = []
    n = len(wlens)
    for i, w in enumerate(wlens):
        lo = wlens[i - 1] if i > 0 else w
        hi = wlens[i + 1] if i + 1 < n else w
        dw = (hi - lo) / 2.0
        coef = dw / float(w) ** 5
        c2w = PLANCK_C2_UM_K / float(w)
        terms.append(
            f"{_dlit(coef)} / (exp({_dlit(c2w)} / ({t_expr})) - 1.0e0)"
        )
    return "(" + " + ".join(terms) + ")"


def depth_model_expr(
    t_expr: str = "tmpt",
    tstar_expr: str = "tstar",
    rratio_expr: str = "rratio",
    wlens: Sequence[float] = DEFAULT_WLENS_UM,
) -> str:
    """Occultation depth [ppt] of a blackbody planet at temperature T
    against its star (miletos/main.py:990-991: `1e3 rrat² spec/spec*`)."""
    return (
        f"1000.0e0 * ({rratio_expr}) * ({rratio_expr})"
        f" * {planck_sum_expr(t_expr, wlens)}"
        f" / {planck_sum_expr(tstar_expr, wlens)}"
    )


SPEC_LLIK_EXPR = "-0.5e0 * pow(dept_modl - dept_obs, 2) / (dept_err * dept_err)"

# ψ/T_day/T_night/likelihood chain (retr_llik_albbepsi). Later entries
# reference earlier names; the reference's fixed 1e3 weight on the ψ
# term is absorbed into psii_err by the caller.
ALBB_EXPRS: list[tuple[str, str]] = [
    ("psii", "pow(1.0e0 - albb, 0.25e0)"),
    ("tirr", "tequi * psii"),
    ("tday",
     "tirr * pow(greatest(2.0e0/3.0e0 - 5.0e0 * epsi / 12.0e0, 0.0e0),"
     " 0.25e0)"),
    ("tnight", "tirr * pow(epsi / 4.0e0, 0.25e0)"),
    ("llik",
     "-0.5e0 * (pow(tday - tday_obs, 2) / (tday_err * tday_err)"
     " + pow(tnight - tnight_obs, 2) / (tnight_err * tnight_err)"
     " + pow(psii - psii_obs, 2) / (psii_err * psii_err))"),
]


def _index_grid(spark, n: int, exprs: dict[str, str]) -> DataFrame:
    """Grid rows derived from an integer index by multiply-add only —
    the oracle mirrors `x * step + lo` textually, so grid doubles are
    bit-identical across engines (never accumulate a float step)."""
    g = spark.range(n).select(F.col("id").cast("double").alias("x"))
    return g.select(*(F.expr(e).alias(name) for name, e in exprs.items()))


def brightness_temp_fit(
    obs: DataFrame,
    group_cols: Sequence[str] = ("event_type",),
    t_lo: float = 500.0,
    t_step: float = 25.0,
    n_t: int = 121,
    wlens: Sequence[float] = DEFAULT_WLENS_UM,
) -> DataFrame:
    """MAP brightness temperature per group. `obs` needs columns
    rratio, tstar, dept_obs, dept_err (+ group cols); returns one row
    per group: group_cols + (tmpt, dept_modl, llik)."""
    spark = obs.sparkSession
    grid = _index_grid(
        spark, n_t, {"tmpt": f"x * {_dlit(t_step)} + {_dlit(t_lo)}"}
    )
    j = (
        obs.crossJoin(F.broadcast(grid))
        .withColumn("dept_modl", F.expr(depth_model_expr(wlens=wlens)))
        .withColumn("llik", F.expr(SPEC_LLIK_EXPR))
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("llik").desc(), F.col("tmpt").asc()
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(*group_cols, "tmpt", "dept_modl", "llik")
    )


def sql_brightness_temp_ctes(
    obs_cte: str,
    group_cols: Sequence[str] = ("event_type",),
    t_lo: float = 500.0,
    t_step: float = 25.0,
    n_t: int = 121,
    wlens: Sequence[float] = DEFAULT_WLENS_UM,
) -> str:
    """DuckDB twin of `brightness_temp_fit` over CTE `obs_cte` (same
    expression strings, same index-multiply grid, same tiebreak).
    Returns a CTE fragment ending with `scored` (filter rn = 1 in the
    caller's final SELECT)."""
    keys = ", ".join(group_cols)
    return f"""
grid AS (
  SELECT CAST(x AS DOUBLE) * {_dlit(t_step)} + {_dlit(t_lo)} AS tmpt
  FROM range({n_t}) t(x)
),
scan AS (
  SELECT o.*, g.tmpt,
         {depth_model_expr(wlens=wlens)} AS dept_modl
  FROM {obs_cte} o CROSS JOIN grid g
),
scored AS (
  SELECT *, {SPEC_LLIK_EXPR} AS llik,
         row_number() OVER (PARTITION BY {keys}
                            ORDER BY {SPEC_LLIK_EXPR} DESC, tmpt ASC) AS rn
  FROM scan
)"""


def albedo_recirc_fit(
    obs: DataFrame,
    group_cols: Sequence[str] = ("event_type",),
    n_a: int = 20,
    n_e: int = 20,
    step: float = 0.05,
) -> DataFrame:
    """MAP (Bond albedo, recirculation efficiency) per group. `obs`
    needs tequi, tday_obs, tday_err, tnight_obs, tnight_err, psii_obs,
    psii_err (+ group cols); returns group_cols + (albb, epsi, psii,
    tday, tnight, llik). Grid spans [0, (n-1)·step] per axis."""
    spark = obs.sparkSession
    ga = _index_grid(spark, n_a, {"albb": f"x * {_dlit(step)}"})
    ge = _index_grid(spark, n_e, {"epsi": f"x * {_dlit(step)}"})
    j = obs.crossJoin(F.broadcast(ga.crossJoin(ge)))
    for name, expr in ALBB_EXPRS:
        j = j.withColumn(name, F.expr(expr))
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("llik").desc(), F.col("albb").asc(), F.col("epsi").asc()
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(*group_cols, "albb", "epsi", "psii", "tday", "tnight", "llik")
    )


def sql_albedo_recirc_ctes(
    obs_cte: str,
    group_cols: Sequence[str] = ("event_type",),
    n_a: int = 20,
    n_e: int = 20,
    step: float = 0.05,
) -> str:
    """DuckDB twin of `albedo_recirc_fit`. Returns a CTE fragment
    ending with `ranked` (filter rn = 1 in the caller's final SELECT)."""
    keys = ", ".join(group_cols)
    chain = []
    prev = "scan"
    for i, (name, expr) in enumerate(ALBB_EXPRS):
        cur = f"ab_{i}"
        chain.append(f"{cur} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = cur
    ctes = ",\n".join(chain)
    return f"""
ga AS (SELECT CAST(x AS DOUBLE) * {_dlit(step)} AS albb FROM range({n_a}) t(x)),
ge AS (SELECT CAST(x AS DOUBLE) * {_dlit(step)} AS epsi FROM range({n_e}) t(x)),
scan AS (SELECT o.*, ga.albb, ge.epsi
         FROM {obs_cte} o CROSS JOIN ga CROSS JOIN ge),
{ctes},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY {keys}
                               ORDER BY llik DESC, albb ASC, epsi ASC) AS rn
  FROM {prev}
)"""


def sample_albedo_groups(
    obs: DataFrame,
    group_cols: Sequence[str] = ("event_type",),
    n_walkers: int = 10,
    n_steps: int = 80,
    seed: int = 7,
) -> DataFrame:
    """Posterior (A, ε) per group via the seeded stretch-move ensemble
    sampler over the same likelihood the grid scan maximizes — the
    sampler role of the reference's `tdpy.samp` call
    (miletos/main.py:12131-12133 applied to retr_llik_albbepsi).
    Returns 16/50/84 percentiles of A and ε per group (rows-only:
    stochastic, no SQL oracle)."""
    import numpy as np
    import pandas as pd

    from miletos_spark.model.infer import _stretch_move_mcmc

    keys = list(group_cols)
    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in obs.select(*keys).schema.fields
    )
    out_schema = (
        key_schema
        + ", albb_p16 double, albb_p50 double, albb_p84 double"
        + ", epsi_p16 double, epsi_p50 double, epsi_p84 double"
        + ", n_samples bigint"
    )

    def sample_one(pdf: pd.DataFrame) -> pd.DataFrame:
        r = pdf.iloc[0]
        tequi = float(r["tequi"])
        tday_o, tday_e = float(r["tday_obs"]), float(r["tday_err"])
        tnig_o, tnig_e = float(r["tnight_obs"]), float(r["tnight_err"])
        psii_o, psii_e = float(r["psii_obs"]), float(r["psii_err"])

        def log_prob(x):
            a, e = x
            if not (0.0 <= a <= 1.0 and 0.0 <= e <= 1.0):
                return -np.inf
            psii = (1.0 - a) ** 0.25
            tirr = tequi * psii
            tday = tirr * max(2.0 / 3.0 - 5.0 * e / 12.0, 0.0) ** 0.25
            tnig = tirr * (e / 4.0) ** 0.25
            return -0.5 * (
                (tday - tday_o) ** 2 / tday_e**2
                + (tnig - tnig_o) ** 2 / tnig_e**2
                + (psii - psii_o) ** 2 / psii_e**2
            )

        chain = _stretch_move_mcmc(
            log_prob, np.array([0.3, 0.3]), n_walkers, n_steps, seed
        )
        keep = chain[len(chain) // 2 :]
        row = {k: r[k] for k in keys}
        for j, nm in enumerate(("albb", "epsi")):
            p16, p50, p84 = np.percentile(keep[:, j], [16, 50, 84])
            row[f"{nm}_p16"], row[f"{nm}_p50"], row[f"{nm}_p84"] = (
                float(p16), float(p50), float(p84),
            )
        row["n_samples"] = len(keep)
        return pd.DataFrame([row])

    return obs.groupBy(*keys).applyInPandas(sample_one, schema=out_schema)
