"""S4 — MAST observation/product query → FITS landing, as a batch
landing job over a canned (or separately downloaded) response.

The reference queries MAST live inside `init` (astroquery
`Observations.query_criteria` → `get_product_list` →
`download_products`, miletos/main.py:8548-8567, 8857-9188). Our stance
(SURVEY §2.1 S4) is that the HTTP fetch is an upstream landing job on
a cluster; everything AFTER the fetch — the observation filter, the
observation↔product join, the product selection, and the FITS parse
into the long-format table — is relational and implemented here
Spark-first. `land_mast_lightcurves` drives that whole path from a
response in MAST's public column schema (`obsid`, `obs_collection`,
`provenance_name`, `sequence_number`, `calib_level`, `dataURI`, ...),
with the download step abstracted to a URI→local-path resolver: a
canned fixture response exercises the IDENTICAL engine path a live
connector would, which is exactly what the canned-fixture test does
(tests/test_sources_streaming.py::test_mast_canned_landing).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# public MAST CAOM field names as returned by astroquery.mast
# (subset used by the reference's selection logic)
MAST_OBS_SCHEMA = (
    "obsid string, obs_collection string, dataproduct_type string, "
    "target_name string, provenance_name string, sequence_number int, "
    "calib_level int, t_min double, t_max double"
)
MAST_PROD_SCHEMA = (
    "obsID string, obs_collection string, dataproduct_type string, "
    "productType string, productSubGroupDescription string, "
    "dataURI string, size long"
)


def read_mast_response(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """Parse a landed MAST JSON-lines response (one record per row, the
    shape `astroquery`'s table serializes to) with an explicit schema —
    no inference, so a malformed response fails loudly at read."""
    return spark.read.schema(schema).json(path)


def select_mast_products(
    observations: DataFrame,
    products: DataFrame,
    collections: tuple[str, ...] = ("TESS", "HLSP"),
    provenances: tuple[str, ...] = ("SPOC", "QLP"),
    min_calib_level: int = 2,
    subgroups: tuple[str, ...] = ("LC", "FAST-LC"),
) -> DataFrame:
    """The reference's observation/product selection as one relational
    plan (miletos/main.py:8857-9188): keep science time-series
    observations from the wanted collections/pipelines at a calibrated
    processing level, broadcast-join their product lists on the
    observation id, and keep the light-curve science products. Returns
    one row per chosen product:
    (target_name, provenance_name, sequence_number, dataURI)."""
    obs = observations.filter(
        F.col("obs_collection").isin(*collections)
        & F.col("provenance_name").isin(*provenances)
        & (F.col("dataproduct_type") == "timeseries")
        & (F.col("calib_level") >= min_calib_level)
    )
    prod = products.filter(
        (F.col("productType") == "SCIENCE")
        & F.col("productSubGroupDescription").isin(*subgroups)
    )
    # observation lists are per-target (thousands of rows at most):
    # broadcast the filtered obs side under the product table
    return (
        prod.join(
            F.broadcast(
                obs.select(
                    F.col("obsid").alias("obsID"),
                    "target_name",
                    "provenance_name",
                    "sequence_number",
                )
            ),
            "obsID",
        )
        .select(
            "target_name", "provenance_name", "sequence_number", "dataURI"
        )
        .orderBy("target_name", "sequence_number", "dataURI")
    )


def land_mast_lightcurves(
    spark: SparkSession,
    observations: DataFrame,
    products: DataFrame,
    resolve_uri: Callable[[str], str],
    landing_dir: str,
    **select_kwargs,
) -> DataFrame:
    """S4 end-to-end: select the light-curve products, materialize each
    `dataURI` into `landing_dir` via `resolve_uri` (live connector: an
    HTTP GET; canned fixture: a local path lookup — the engine path is
    identical), and parse the landed FITS files through the S1 native
    reader into the long-format series table. The product list is
    O(sectors·targets) — a file manifest, never sample data — so the
    driver-side collect is bounded by construction."""
    from miletos_spark.sources.fits import read_tess_fits

    chosen = select_mast_products(observations, products, **select_kwargs)
    manifest = [r["dataURI"] for r in chosen.select("dataURI").collect()]
    if not manifest:
        raise ValueError("MAST selection matched no products")
    names = [os.path.basename(u) for u in manifest]
    if len(set(names)) != len(names):
        raise ValueError(
            "MAST product basenames collide in one landing dir: "
            f"{sorted({n for n in names if names.count(n) > 1})}"
        )
    # Land into a dedicated subdirectory owned by this function: stale
    # *.fits from a previous (wider) selection must not leak into this
    # read, but the caller's landing_dir may hold unrelated FITS data
    # we must never delete — only the _mast_lc/ subdir is ours to wipe.
    owned = os.path.join(landing_dir, "_mast_lc")
    if os.path.isdir(owned):
        for old_f in os.listdir(owned):
            if old_f.endswith(".fits"):
                os.remove(os.path.join(owned, old_f))
    os.makedirs(owned, exist_ok=True)
    for uri in manifest:
        local = resolve_uri(uri)
        shutil.copy(local, os.path.join(owned, os.path.basename(uri)))
    return read_tess_fits(spark, os.path.join(owned, "*.fits"))
