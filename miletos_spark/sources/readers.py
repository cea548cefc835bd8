"""S-series sources (SURVEY.md §2.1).

Spark-first stance: light curves land as columnar tables (parquet/CSV);
the FITS-specific steps of `read_tesskplr_file` (miletos/main.py:
7407-7502) — quality mask, BJD offset, median normalization — are
DataFrame transformations applied at read. Native FITS files are read
for real via the minimal pure-numpy BINTABLE parser in
`sources/fits.py` (binaryFile scan → mapInPandas parse), no astropy
required.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from miletos_spark.operators.normalize import median_normalize

# BJD offsets applied on read (miletos/main.py:7456-7459)
BJD_OFFSET = {"TESS": 2457000.0, "Kepler": 2454833.0}

SERIES_CSV_SCHEMA = StructType(
    [
        StructField("time", DoubleType()),
        StructField("value", DoubleType()),
        StructField("stdv", DoubleType()),
    ]
)


def read_series_csv(
    spark: SparkSession,
    paths: str | Sequence[str],
    default_stdv: float = 1e-4,
    max_abs_value: float = 1e6,
) -> DataFrame:
    """S8 — user-input CSV series (miletos/main.py:10222-10233): fixed
    (time, value[, stdv]) schema, synthesized 1e-4 errors when the error
    column is missing/null, `|value| ≥ 1e6` rows dropped. Multi-file
    paths scan in one job (S2's folder-concat); ordering is left to the
    consumer (Spark rows are unordered; sorts belong to sinks/windows).
    """
    if isinstance(paths, str):
        paths = [paths]
    df = spark.read.csv(list(paths), header=True, schema=SERIES_CSV_SCHEMA)
    return (
        df.withColumn(
            "stdv", F.coalesce(F.col("stdv"), F.lit(float(default_stdv)))
        )
        .filter(F.col("time").isNotNull() & F.col("value").isNotNull())
        .filter(F.abs(F.col("value")) < max_abs_value)
    )


def read_lightcurve_table(
    spark: SparkSession,
    path: str,
    inst: str = "TESS",
    time_col: str = "time",
    flux_col: str = "flux",
    err_col: str = "flux_err",
    quality_col: str | None = "quality",
    apply_offset: bool = True,
    normalize: bool = True,
) -> DataFrame:
    """S1 semantics over a columnar landing table: quality==0 &
    isfinite filter (pushed to the scan), BJD offset, per-file median
    normalization (miletos/main.py:7448-7502). Output long schema
    (time, ener, value, stdv, inst, chunk)."""
    df = spark.read.parquet(path)
    if quality_col and quality_col in df.columns:
        df = df.filter(F.col(quality_col) == 0)
    df = df.filter(
        ~F.isnan(F.col(flux_col)) & F.col(flux_col).isNotNull()
        & F.col(time_col).isNotNull()
    )
    t = F.col(time_col)
    if apply_offset and inst in BJD_OFFSET:
        t = t + F.lit(BJD_OFFSET[inst])
    chunk = F.col("chunk") if "chunk" in df.columns else F.lit(0)
    out = df.select(
        t.alias("time"),
        F.lit(0).alias("ener"),
        F.col(flux_col).alias("value"),
        (F.col(err_col) if err_col in df.columns else F.lit(0.0)).alias("stdv"),
        F.lit(inst).alias("inst"),
        chunk.alias("chunk"),
    )
    if normalize:
        out = median_normalize(out, group_cols=("inst", "chunk"))
    return out


def read_magnitude_series(
    spark: SparkSession,
    path: str,
    time_col: str = "time",
    mag_col: str = "tmag",
    quality_col: str | None = "qflag",
    inst: str = "QLP",
) -> DataFrame:
    """S3 — QLP-style magnitude series: quality filter (QFLAG==0),
    magnitude → relative flux `10^(−(m − median)/2.5)`
    (miletos/main.py:6420-6453). Median via exact per-file percentile
    (one tiny agg), conversion is a column expression."""
    df = spark.read.parquet(path)
    if quality_col and quality_col in df.columns:
        df = df.filter(F.col(quality_col) == 0)
    df = df.filter(F.col(mag_col).isNotNull() & ~F.isnan(F.col(mag_col)))
    med = df.agg(F.expr(f"percentile({mag_col}, 0.5)")).first()[0]
    flux = F.pow(F.lit(10.0), -(F.col(mag_col) - F.lit(float(med))) / 2.5)
    return df.select(
        F.col(time_col).alias("time"),
        F.lit(0).alias("ener"),
        flux.alias("value"),
        F.lit(0.0).alias("stdv"),
        F.lit(inst).alias("inst"),
        F.lit(0).alias("chunk"),
    )


def angular_separation_deg(
    ra1: Column, dec1: Column, ra2: Column, dec2: Column
) -> Column:
    """Great-circle separation in degrees (haversine — numerically
    stable at the small radii cone searches use). All inputs degrees."""
    rad = math.pi / 180.0
    dra2 = (ra2 - ra1) * rad / 2.0
    ddec2 = (dec2 - dec1) * rad / 2.0
    a = F.pow(F.sin(ddec2), 2.0) + (
        F.cos(dec1 * rad) * F.cos(dec2 * rad) * F.pow(F.sin(dra2), 2.0)
    )
    return 2.0 * F.asin(F.least(F.sqrt(a), F.lit(1.0))) / rad


def read_ztf_cone(
    spark: SparkSession,
    path: str,
    ra_deg: float,
    dec_deg: float,
    radius_deg: float = 0.01,
    mag_col: str = "mag",
    time_col: str = "mjd",
    flags_col: str | None = "catflags",
    inst: str = "ZTF",
) -> DataFrame:
    """S6 — ZTF source (miletos/main.py:8780-8792): the reference
    cone-searches ZTF (`LCQuery.download_data(circle=[ra, dec, 0.01])`)
    and takes the (mjd, mag) series. The remote download is an upstream
    landing job (SURVEY §2.2); this reads the landed table and applies
    the engine-side semantics: exact great-circle cone predicate
    (pushed to the scan as ra/dec range guards plus the haversine
    filter), quality flags == 0, MJD → JD (+2400000.5, the reference's
    absolute-days convention), and the S3 magnitude → relative-flux
    conversion 10^(−(m − median)/2.5)."""
    df = spark.read.parquet(path)
    # bounding-box pre-filter: min/max-pushable to the parquet scan,
    # so the trig only runs on row groups that can match
    dec_pad = float(radius_deg)
    ra_pad = float(radius_deg) / max(
        math.cos(math.radians(dec_deg)), 1e-9
    )
    df = df.filter(
        (F.col("dec") >= dec_deg - dec_pad)
        & (F.col("dec") <= dec_deg + dec_pad)
        & (F.col("ra") >= ra_deg - ra_pad)
        & (F.col("ra") <= ra_deg + ra_pad)
    )
    sep = angular_separation_deg(
        F.col("ra"), F.col("dec"), F.lit(float(ra_deg)), F.lit(float(dec_deg))
    )
    df = df.filter(sep <= float(radius_deg))
    if flags_col and flags_col in df.columns:
        df = df.filter(F.col(flags_col) == 0)
    df = df.filter(F.col(mag_col).isNotNull() & ~F.isnan(F.col(mag_col)))
    med = df.agg(F.expr(f"percentile({mag_col}, 0.5)")).first()[0]
    if med is None:
        med = 0.0
    flux = F.pow(F.lit(10.0), -(F.col(mag_col) - F.lit(float(med))) / 2.5)
    return df.select(
        (F.col(time_col) + F.lit(2400000.5)).alias("time"),
        F.lit(0).alias("ener"),
        flux.alias("value"),
        F.lit(0.0).alias("stdv"),
        F.lit(inst).alias("inst"),
        F.lit(0).alias("chunk"),
    )


def read_tess_fits(spark, path, **kwargs):
    """S1 — native FITS ingestion (miletos/main.py:7407-7502), real:
    a minimal pure-numpy BINTABLE parser (sources/fits.py) runs inside
    `mapInPandas` over a `binaryFile` scan, then the shared quality-
    mask / BJD-offset / median-normalize pipeline. See
    `miletos_spark.sources.fits.read_tess_fits`."""
    from miletos_spark.sources.fits import read_tess_fits as _impl

    return _impl(spark, path, **kwargs)


def available_chunks(
    spark: SparkSession, path: str, chunk_col: str = "chunk"
) -> list[int]:
    """S7 — the local-sector-cache listing (`retr_tsecpathlocl`,
    miletos/main.py:211-259) as a catalog question: which chunk
    partitions exist. Uses the partition column when present (partition
    pruning makes this a metadata-only scan), else a distinct query."""
    df = spark.read.parquet(path)
    if chunk_col not in df.columns:
        return [0]
    rows = df.select(chunk_col).distinct().collect()
    return sorted(int(r[0]) for r in rows)
