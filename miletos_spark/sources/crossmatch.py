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
    ra_pad = float(radius_deg) / max(
        math.cos(math.radians(min(abs(dec_deg) + radius_deg, 89.999))), 1e-9
    )
    sep = angular_separation_deg(
        F.col(ra_col), F.col(dec_col), F.lit(float(ra_deg)), F.lit(float(dec_deg))
    )
    # RA band with 0/360 wraparound: when the band crosses the seam,
    # OR in the wrapped range (still min/max range predicates, so the
    # whole disjunction stays pushable to the parquet scan; the
    # haversine sep is 2π-periodic so no correction is needed there)
    ra_lo, ra_hi = ra_deg - ra_pad, ra_deg + ra_pad
    ra_band = (F.col(ra_col) >= ra_lo) & (F.col(ra_col) <= ra_hi)
    if ra_lo < 0.0:
        ra_band = ra_band | (F.col(ra_col) >= ra_lo + 360.0)
    if ra_hi > 360.0:
        ra_band = ra_band | (F.col(ra_col) <= ra_hi - 360.0)
    if ra_pad >= 180.0:  # polar cap: the band is the full circle
        ra_band = F.lit(True)
    return (
        catalog.filter(
            (F.col(dec_col) >= dec_deg - dec_pad)
            & (F.col(dec_col) <= dec_deg + dec_pad)
            & ra_band
        )
        .withColumn("sep_deg", sep)
        .filter(F.col("sep_deg") <= float(radius_deg))
        .orderBy("sep_deg")
    )


def _ra_pad_expr(dec_col, radius_deg: float):
    """RA half-width (deg) that bounds any true match at this row's
    declination: the pair partner can sit up to one radius further
    from the equator, so evaluate sec(dec) at |dec|+radius, clamped
    short of the pole (where the pad degrades to zone-only banding —
    still correct, just less selective)."""
    edge = F.least(F.abs(dec_col) + F.lit(float(radius_deg)), F.lit(89.999))
    return F.lit(float(radius_deg)) / F.greatest(
        F.cos(F.radians(edge)), F.lit(1e-9)
    )


def crossmatch_closest(
    catalog: DataFrame,
    targets: DataFrame,
    radius_deg: float,
    cat_id: str = "cat_id",
    tgt_id: str = "tgt_id",
) -> DataFrame:
    """Per-target closest catalog source within `radius_deg`, via the
    zones equi-join (no crossJoin). Column convention: both inputs
    carry (id, ra, dec); output (tgt_id, cat_id, sep_deg) with sep
    rounded to 9 decimals (the argmin key). Targets with no source in
    range are absent (the reference's no-association branch,
    miletos/main.py:8566-8567).

    The RA band is exact per row (no fixed max-|dec| precondition: the
    pad is derived from each target's own declination), and RA
    wraparound at 0/360 is handled by duplicating border sources
    shifted by ±360° — the haversine separation is 2π-periodic, so a
    shifted copy scores identically and the argmin dedups."""
    zh = float(radius_deg)

    cat = catalog.select(
        F.col(cat_id).alias("_cid"),
        F.col("ra").alias("_cra"),
        F.col("dec").alias("_cdec"),
    )
    # border duplication: a source within one (dec-local) pad of the
    # 0/360 seam must also be visible at ra±360 for targets across it
    cpad = _ra_pad_expr(F.col("_cdec"), zh)
    cat_wrapped = cat.unionByName(
        cat.filter(F.col("_cra") <= cpad).withColumn(
            "_cra", F.col("_cra") + F.lit(360.0)
        )
    ).unionByName(
        cat.filter(F.col("_cra") >= F.lit(360.0) - cpad).withColumn(
            "_cra", F.col("_cra") - F.lit(360.0)
        )
    )
    cat3 = cat_wrapped.select(
        "_cid", "_cra", "_cdec",
        F.explode(
            F.sequence(
                F.floor(F.col("_cdec") / zh).cast("long") - 1,
                F.floor(F.col("_cdec") / zh).cast("long") + 1,
            )
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
                F.abs(F.col("_cra") - F.col("_tra"))
                <= _ra_pad_expr(F.col("_tdec"), zh),
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
