"""S4 — catalog cone search / closest-match crossmatch.

The reference's MAST interaction (miletos/main.py:8548-8567) is a
remote catalog scan: `Catalogs.query_region(target, radius, "TIC")`,
then associate the target with the CLOSEST source if it lies within
0.2 arcsec. The REST download is an upstream landing job (SURVEY §2.1
S4: "batch ingest job → parquet landing table"); the engine-side
semantics — cone predicate, per-target nearest neighbor, closeness
gate — are relational and implemented here Spark-first:

- `cone_search`: one target against the landed catalog — bounding-box
  range guards (min/max-pushable to the parquet scan) + exact
  great-circle predicate, distance-ordered.
- `crossmatch_closest`: MANY targets at once via the zones algorithm
  (Gray et al., "The Zones Algorithm for Finding Points-Near-a-Point or
  Cross-Matching Spatial Datasets", MSR-TR-2006-52): both sides get a
  declination-zone key of height = search radius, the catalog side is
  exploded into its ±1 neighbor zones, and the join is an EQUI-join on
  the zone key with an ra-band secondary predicate. No crossJoin: at
  100 TB catalog scale the shuffle is keyed on bounded-population
  zones, each target touches ≤ 3 zones, and AQE absorbs the dense-
  field skew. The nearest match per target is a deterministic struct
  argmin on (round(sep, 9), cat_id) — rounding first, so a last-ulp
  trig difference between runs/engines can't flip the winner.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miletos_spark.sources.readers import angular_separation_deg

ASSOC_RADIUS_ARCSEC = 0.2  # the reference's association gate


def cone_search(
    catalog: DataFrame,
    ra_deg: float,
    dec_deg: float,
    radius_deg: float,
    ra_col: str = "ra",
    dec_col: str = "dec",
) -> DataFrame:
    """All catalog sources within `radius_deg` of one position,
    closest first (miletos/main.py:8552: `query_region` + dstArcSec
    ordering)."""
    dec_pad = float(radius_deg)
    ra_pad = float(radius_deg) / max(math.cos(math.radians(dec_deg)), 1e-9)
    sep = angular_separation_deg(
        F.col(ra_col), F.col(dec_col), F.lit(float(ra_deg)), F.lit(float(dec_deg))
    )
    return (
        catalog.filter(
            (F.col(dec_col) >= dec_deg - dec_pad)
            & (F.col(dec_col) <= dec_deg + dec_pad)
            & (F.col(ra_col) >= ra_deg - ra_pad)
            & (F.col(ra_col) <= ra_deg + ra_pad)
        )
        .withColumn("sep_deg", sep)
        .filter(F.col("sep_deg") <= float(radius_deg))
        .orderBy("sep_deg")
    )


def crossmatch_closest(
    catalog: DataFrame,
    targets: DataFrame,
    radius_deg: float,
    cat_id: str = "cat_id",
    tgt_id: str = "tgt_id",
    max_abs_dec: float = 66.0,
) -> DataFrame:
    """Per-target closest catalog source within `radius_deg`, via the
    zones equi-join (no crossJoin). Column convention: both inputs
    carry (id, ra, dec); output (tgt_id, cat_id, sep_deg) with sep
    rounded to 9 decimals (the argmin key). Targets with no source in
    range are absent (the reference's no-association branch,
    miletos/main.py:8566-8567)."""
    zh = float(radius_deg)
    ra_pad = float(radius_deg) / max(math.cos(math.radians(max_abs_dec)), 1e-9)

    cat = catalog.select(
        F.col(cat_id).alias("_cid"),
        F.col("ra").alias("_cra"),
        F.col("dec").alias("_cdec"),
        F.floor(F.col("dec") / zh).cast("long").alias("_z0"),
    )
    cat3 = cat.select(
        "_cid", "_cra", "_cdec",
        F.explode(
            F.array(F.col("_z0") - 1, F.col("_z0"), F.col("_z0") + 1)
        ).alias("_z"),
    )
    tgt = targets.select(
        F.col(tgt_id).alias("_tid"),
        F.col("ra").alias("_tra"),
        F.col("dec").alias("_tdec"),
        F.floor(F.col("dec") / zh).cast("long").alias("_z"),
    )
    sep = angular_separation_deg(
        F.col("_cra"), F.col("_cdec"), F.col("_tra"), F.col("_tdec")
    )
    joined = (
        tgt.join(
            cat3,
            on=[
                tgt["_z"] == cat3["_z"],
                F.abs(F.col("_cra") - F.col("_tra")) <= ra_pad,
            ],
        )
        .withColumn("_sep", F.round(sep, 9))
        .filter(F.col("_sep") <= float(radius_deg))
    )
    best = (
        joined.groupBy("_tid")
        .agg(
            F.min(F.struct(F.col("_sep"), F.col("_cid"))).alias("_b")
        )
        .select(
            F.col("_tid").alias(tgt_id),
            F.col("_b._cid").alias(cat_id),
            F.col("_b._sep").alias("sep_deg"),
        )
    )
    return best
