"""F6/X3 — the energy axis: multi-band cube, white-light prepend,
per-energy detrend wrap, radius-ratio spectrum.

The reference stores every time series as a (time, ener, 3) cube and,
when more than one energy bin exists, prepends a white-light band:
flux = mean over bins, error = sqrt(Σσ²)/n (miletos/main.py:10591-10604).
Fits then iterate per energy bin (`typemodlenerfitt='iter'`,
miletos/main.py:12298-12307) and the per-bin radius ratios form the
transmission spectrum (miletos/main.py:12343-12381).

Spark-first shape: the cube is just a DataFrame keyed by (ener, bin) —
long format, so every per-energy stage is the same operator with `ener`
appended to group_cols, and the white-light band is one aggregation
unioned back in. Nothing here shuffles more than once per stage and
all aggregates are map-side combinable; at 100 TB the cube key
(ener, time-bin) bounds every partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_ener_cube(
    df: DataFrame,
    n_ener: int = 4,
    bin_days: float = 1.0,
    time_col: str = "t",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Bin a long event stream into an (ener, day) flux cube and
    prepend the white-light band as ener = 0.

    The driver data has no physical energy column, so the fixture
    assigns `ener = id % n_ener + 1` — deterministic and
    oracle-mirrorable. Means are DECIMAL(38,18) fixed-order sums so the
    cube is bit-identical across engines and partition layouts.
    """
    ener = (F.pmod(F.col(id_col), F.lit(n_ener)) + F.lit(1)).cast("int")
    day = F.floor(F.col(time_col) / F.lit(float(bin_days))).cast("long")
    base = df.select(ener.alias("ener"), day.alias("day"), F.col(value_col))
    cube = base.groupBy("ener", "day").agg(
        (
            F.sum(F.col(value_col).cast("decimal(38,18)")).cast("double")
            / F.count("*")
        ).alias("flux"),
        F.count("*").alias("n"),
    )
    # white light (miletos/main.py:10598): mean across energy bins
    white = (
        cube.groupBy("day")
        .agg(
            (
                F.sum(F.col("flux").cast("decimal(38,18)")).cast("double")
                / F.count("*")
            ).alias("flux"),
            F.sum("n").alias("n"),
        )
        .withColumn("ener", F.lit(0))
    )
    cols = ["ener", "day", "flux", "n"]
    return white.select(*cols).unionByName(cube.select(*cols))


def radius_ratio_spectrum(
    cube: DataFrame,
    period: float,
    epoch: float,
    dura: float,
    bin_days: float = 1.0,
) -> DataFrame:
    """Per-energy median-normalize → linear detrend → closed-form depth
    fit → Rp/R* spectrum, each stage grouped on `ener` (the X3 wrap:
    same operator, energy key appended).

    Returns one row per band: (ener, n_bins, depth_hat, depth_err,
    rratio) where rratio = sqrt(max(depth, 0)) — the reference's
    `rratcomp` per bin (miletos/main.py:12343-12381) for the
    linear-in-depth trapezoid model.
    """
    from miletos_spark.model.forward import trapezoid_depth
    from miletos_spark.model.likelihood import depth_fit_closed_form

    med = cube.groupBy("ener").agg(
        F.expr("percentile(flux, 0.5)").alias("_med")
    )
    norm = (
        cube.join(med, "ener")
        .withColumn("tc", (F.col("day") + F.lit(0.5)) * F.lit(float(bin_days)))
        .withColumn("rflx", F.col("flux") / F.col("_med"))
    )
    fit = norm.groupBy("ener").agg(
        F.regr_slope("rflx", "tc").alias("_b"),
        F.regr_intercept("rflx", "tc").alias("_a"),
    )
    det = norm.join(fit, "ener").withColumn(
        "dflx",
        F.lit(1.0) + F.col("rflx") - (F.col("_a") + F.col("_b") * F.col("tc")),
    )
    shaped = det.withColumn(
        "shape", trapezoid_depth(F.col("tc"), period, epoch, dura)
    ).withColumn("stdv", F.lit(1.0))
    fitted = depth_fit_closed_form(
        shaped, "shape", value_col="dflx", group_cols=("ener",), exact=True
    )
    counts = cube.groupBy("ener").agg(F.count("*").alias("n_bins"))
    return counts.join(fitted, "ener").select(
        "ener",
        "n_bins",
        "depth_hat",
        "depth_err",
        F.sqrt(F.greatest("depth_hat", F.lit(0.0))).alias("rratio"),
    )
