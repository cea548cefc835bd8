"""M11 — target visibility calculator (miletos/main.py:11766-11852).

The reference computes target altitude/airmass over a night and the
Sun's altitude for twilight shading via astropy coordinate transforms
(`tdpy.calc_visitarg`, `astropy.coordinates.AltAz`). Astropy is not in
this image — and is not needed: for observability planning the classic
textbook transforms (Meeus, *Astronomical Algorithms*) are plenty and
are pure per-row trigonometry, which keeps the whole operator inside
whole-stage codegen and makes it SQL-expressible for the oracle:

- GMST(deg) = 280.46061837 + 360.98564736629 · (JD − 2451545.0)
- LST = GMST + east longitude;  hour angle H = LST − RA
- sin(alt) = sin(φ)sin(δ) + cos(φ)cos(δ)cos(H)
- airmass = sec z = 1/sin(alt)  (the reference uses `.secz` too)
- low-precision solar position (Meeus ch. 25): mean anomaly g, mean
  longitude q, ecliptic longitude L = q + 1.915 sin g + 0.020 sin 2g,
  obliquity ε = 23.439 − 3.6e-7·d, then RA/Dec from (L, ε).

Differences vs astropy (documented deviation): no precession/nutation/
aberration/refraction — arcminute-level, irrelevant for the "is the
target up tonight, at what airmass" question the reference answers,
and the deviation is visible in the docstring rather than hidden.

Scale: the time grid is a broadcast of O(100–10k) literal rows; one
row per (target, step) with pure column math — no shuffle until the
final per-target aggregate, which reduces to |targets| rows.

Every formula lives once below as an ANSI-SQL expression string
(features.py pattern); Spark runs them via F.expr, the DuckDB oracle
textually embeds the same strings in a CTE chain.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# wrap-to-[0,360) helper applied as text
def _w(e: str) -> str:
    return f"((({e}) % 360.0e0) + 360.0e0) % 360.0e0"


# Inputs per row: dt_hour (grid offset from jd0, hours), ra_deg,
# dec_deg (target), and the scalar columns jd0, lat_deg, lon_deg.
VISI_EXPRS: list[tuple[str, str]] = [
    ("jd", "jd0 + dt_hour / 24.0e0"),
    ("d2000", "jd - 2451545.0e0"),
    ("gmst_deg", _w("280.46061837e0 + 360.98564736629e0 * d2000")),
    ("lst_deg", _w("gmst_deg + lon_deg")),
    ("ha_deg", _w("lst_deg - ra_deg")),
    ("sin_alt",
     "sin(radians(lat_deg)) * sin(radians(dec_deg))"
     " + cos(radians(lat_deg)) * cos(radians(dec_deg))"
     " * cos(radians(ha_deg))"),
    ("alt_deg", "degrees(asin(sin_alt))"),
    ("airmass",
     "CASE WHEN sin_alt > 0.0e0 THEN 1.0e0 / sin_alt ELSE NULL END"),
    # -- Sun, Meeus low-precision ------------------------------------
    ("sun_g_deg", _w("357.529e0 + 0.98560028e0 * d2000")),
    ("sun_q_deg", _w("280.459e0 + 0.98564736e0 * d2000")),
    ("sun_l_deg",
     "sun_q_deg + 1.915e0 * sin(radians(sun_g_deg))"
     " + 0.020e0 * sin(2.0e0 * radians(sun_g_deg))"),
    ("obliq_deg", "23.439e0 - 0.00000036e0 * d2000"),
    ("sun_ra_deg",
     _w("degrees(atan2(cos(radians(obliq_deg)) * sin(radians(sun_l_deg)),"
        " cos(radians(sun_l_deg))))")),
    ("sun_dec_deg",
     "degrees(asin(sin(radians(obliq_deg)) * sin(radians(sun_l_deg))))"),
    ("sun_ha_deg", _w("lst_deg - sun_ra_deg")),
    ("sun_alt_deg",
     "degrees(asin(sin(radians(lat_deg)) * sin(radians(sun_dec_deg))"
     " + cos(radians(lat_deg)) * cos(radians(sun_dec_deg))"
     " * cos(radians(sun_ha_deg))))"),
    # thresholds on ROUNDED values so a last-ulp libm difference
    # between engines cannot flip a boolean at the knife edge
    ("is_dark", "round(sun_alt_deg, 6) < 0.0e0"),
    ("is_astro_dark", "round(sun_alt_deg, 6) < -18.0e0"),
    ("is_observable",
     "is_astro_dark AND round(airmass, 6) >= 1.0e0"
     " AND round(airmass, 6) < 2.0e0"),
]


def visibility_grid(
    targets: DataFrame,
    jd0: float,
    n_steps: int = 145,
    step_hours: float = 0.1666666666666667,
    lat_deg: float = 28.3,
    lon_deg: float = -16.5,
) -> DataFrame:
    """Alt/airmass/Sun-altitude curve for each target over a time grid
    starting at `jd0`. `targets` needs (ra_deg, dec_deg) plus any id
    columns; output adds dt_hour and every VISI_EXPRS column."""
    spark = targets.sparkSession
    grid = spark.range(n_steps).select(
        (F.col("id").cast("double") * F.lit(float(step_hours))).alias(
            "dt_hour"
        )
    )
    df = (
        targets.crossJoin(F.broadcast(grid))
        .withColumn("jd0", F.lit(float(jd0)))
        .withColumn("lat_deg", F.lit(float(lat_deg)))
        .withColumn("lon_deg", F.lit(float(lon_deg)))
    )
    for name, expr in VISI_EXPRS:
        df = df.withColumn(name, F.expr(expr))
    return df


def visibility_summary(
    curve: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Per-target observability summary over a visibility curve:
    dark/astro-dark/observable step counts, best (minimum) airmass and
    peak altitude — the planning numbers the reference prints
    (miletos/main.py:11808-11810)."""
    return curve.groupBy(*group_cols).agg(
        F.count(F.when(F.col("is_dark"), 1)).alias("n_dark"),
        F.count(F.when(F.col("is_astro_dark"), 1)).alias("n_astro_dark"),
        F.count(F.when(F.col("is_observable"), 1)).alias("n_observable"),
        F.min(F.when(F.col("is_astro_dark"), F.col("airmass"))).alias(
            "best_airmass"
        ),
        F.max("alt_deg").alias("peak_alt_deg"),
    )


def sql_visibility_ctes(
    targets_cte: str,
    jd0: float,
    n_steps: int = 145,
    step_hours: float = 0.1666666666666667,
    lat_deg: float = 28.3,
    lon_deg: float = -16.5,
    first: str = "v0",
) -> tuple[str, str]:
    """DuckDB twin of `visibility_grid`: CTE chain over `targets_cte`
    (which must provide ra_deg, dec_deg + id cols). Returns
    (fragment, final_cte_name)."""

    def lit(v: float) -> str:
        r = repr(float(v))
        return r if "e" in r else r + "e0"

    parts = [
        f"""{first}_grid AS (
  SELECT CAST(x AS DOUBLE) * {lit(step_hours)} AS dt_hour
  FROM range({n_steps}) t(x)
),
{first}_base AS (
  SELECT o.*, g.dt_hour,
         {lit(jd0)} AS jd0, {lit(lat_deg)} AS lat_deg,
         {lit(lon_deg)} AS lon_deg
  FROM {targets_cte} o CROSS JOIN {first}_grid g
)"""
    ]
    prev = f"{first}_base"
    for i, (name, expr) in enumerate(VISI_EXPRS):
        cur = f"{first}_{i}"
        parts.append(f"{cur} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = cur
    return ",\n".join(parts), prev
