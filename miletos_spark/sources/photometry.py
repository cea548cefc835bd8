"""S5 — photometry extraction (the lygos sub-pipeline seam).

The reference delegates FFI/target-pixel photometry to the external
`lygos` package and post-processes its output: drop empty sectors,
drop non-finite rows (miletos/main.py:9315-9484). The extraction
itself — aperture sum minus a background estimate per frame — is a
relational aggregation over long-format pixel data, so it runs here
Spark-first:

    (chunk, time, pixr, pixc, flux)  →  (chunk, time, value)

- one groupBy (chunk, time/frame id) = ONE shuffle whose key count is
  the number of frames, independent of aperture size; partial
  aggregation combines map-side, so at 100 TB of pixels the shuffle
  carries one row per frame;
- aperture membership is a pure column predicate (no UDF);
- the background is the median of out-of-aperture pixels (aggregate
  FILTER clause — both engines support it), scaled by the aperture
  pixel count and subtracted, the standard aperture-photometry
  background correction;
- aperture sums run in DECIMAL(38,18) so partial-agg order can't move
  the result (the engine's fixed-order float-sum convention);
- the F4 guards (drop non-finite, empty chunks vanish by absence)
  compose downstream exactly as the reference applies them to the
  lygos output (miletos/main.py:9467-9470).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aperture_photometry(
    pix: DataFrame,
    center_r: float,
    center_c: float,
    radius_pix: float = 2.0,
    frame_cols: tuple[str, ...] = ("chunk", "time"),
    row_col: str = "pixr",
    col_col: str = "pixc",
    flux_col: str = "flux",
) -> DataFrame:
    """Background-subtracted aperture photometry per frame. Returns the
    frame columns plus (n_aper, bg_med, value)."""
    d2 = (
        (F.col(row_col) - F.lit(float(center_r))) ** 2
        + (F.col(col_col) - F.lit(float(center_c))) ** 2
    )
    in_aper = d2 <= float(radius_pix) ** 2
    tagged = pix.withColumn("_in", in_aper)
    agg = tagged.groupBy(*frame_cols).agg(
        F.sum(F.when(F.col("_in"), F.lit(1)).otherwise(F.lit(0))).alias("n_aper"),
        F.sum(
            F.when(F.col("_in"), F.col(flux_col)).cast("decimal(38,18)")
        ).cast("double").alias("_apersum"),
        F.expr(
            f"percentile({flux_col}, 0.5) FILTER (WHERE NOT _in)"
        ).alias("bg_med"),
    )
    return agg.select(
        *frame_cols,
        "n_aper",
        "bg_med",
        (F.col("_apersum") - F.col("bg_med") * F.col("n_aper")).alias("value"),
    )


def finite_photometry(lc: DataFrame, value_col: str = "value") -> DataFrame:
    """The reference's post-lygos guards (miletos/main.py:9467-9470):
    drop non-finite photometry rows; chunks that produced nothing are
    absent by construction."""
    v = F.col(value_col)
    return lc.filter(
        v.isNotNull() & ~F.isnan(v) & (F.abs(v) != float("inf"))
    )
