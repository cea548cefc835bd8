"""Rolling/ordered window operators (SURVEY.md §2.5, W1–W3, W7).

All are Spark window aggregates (JVM-side). Windows partition by the
series key (inst, chunk[, ener]) so state never crosses a partition —
the scale-safe shape: each series chunk is bounded (≤ a sector).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _win(group_cols: Sequence[str], order_col: str):
    w = Window.orderBy(order_col)
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy(order_col)
    return w


def rolling_std(
    df: DataFrame,
    half_width: int,
    value_col: str = "value",
    time_col: str = "time",
    group_cols: Sequence[str] = (),
    cut_peak: bool = False,
    out_col: str = "roll_std",
) -> DataFrame:
    """W1 — `retr_stdvwind`: centered rolling std over ±half_width rows
    (miletos/main.py:6907-6944).

    With ``cut_peak``, reference semantics exactly (`boolcuttpeak`,
    miletos/main.py:6931-6933 + 6942): remove ALL window elements equal
    to the window max (`ydat != amax` drops every tie, not one
    instance) and take the POPULATION std (np.std, ddof=0). Closed
    form: full-window moments (n, Σx, Σx², max) plus the max-tie count
    from the frame's element list —
        n₀ = n − #ties, Σ′ = Σx − #ties·m, Σ″ = Σx² − #ties·m²,
        var = Σ″/n₀ − (Σ′/n₀)²
    NULL when every element ties the max (empty remainder).
    """
    w = _win(group_cols, time_col).rowsBetween(-half_width, half_width)
    if not cut_peak:
        return df.withColumn(out_col, F.stddev_samp(value_col).over(w))
    n = F.count(value_col).over(w)
    s1 = F.sum(value_col).over(w)
    s2 = F.sum(F.pow(F.col(value_col), 2)).over(w)
    mx = F.max(value_col).over(w)
    arr = F.collect_list(F.col(value_col)).over(w)
    d = (
        df.withColumn("_n", n)
        .withColumn("_s1", s1)
        .withColumn("_s2", s2)
        .withColumn("_mx", mx)
        .withColumn("_arr", arr)
    )
    cnt = F.size(F.filter(F.col("_arr"), lambda x: x == F.col("_mx")))
    n0 = F.col("_n") - cnt
    s1p = F.col("_s1") - cnt * F.col("_mx")
    s2p = F.col("_s2") - cnt * F.col("_mx") * F.col("_mx")
    var0 = s2p / n0 - (s1p / n0) * (s1p / n0)
    return d.withColumn(
        out_col, F.when(n0 > 0, F.sqrt(F.greatest(var0, F.lit(0.0))))
    ).drop("_n", "_s1", "_s2", "_mx", "_arr")


def rolling_median(
    df: DataFrame,
    half_width: int,
    value_col: str = "value",
    time_col: str = "time",
    group_cols: Sequence[str] = (),
    out_col: str = "roll_med",
    exact: bool = True,
    halo_chunk_rows: int | None = None,
) -> DataFrame:
    """W2 — centered median filter of size 2*half_width+1
    (scipy.ndimage.median_filter analog; miletos/main.py:5744,
    6784-6795). Exact `percentile` over a row frame for oracle parity.

    `halo_chunk_rows` parallelizes an unpartitioned (or coarsely
    partitioned) series without changing a single output value: a
    global row_number fixes the frame order (one cheap sorted pass),
    rows are bucketed into index chunks with ±half_width halo copies in
    the neighbor chunks, and the exact-percentile frames — the actual
    cost — evaluate PARTITION BY chunk in parallel. Frames order by the
    row_number itself, so tied timestamps resolve identically in every
    chunk. Must be > 2*half_width."""
    fn = "percentile" if exact else "percentile_approx"
    if halo_chunk_rows is not None:
        if halo_chunk_rows <= 2 * half_width:
            raise ValueError(
                f"halo_chunk_rows ({halo_chunk_rows}) must exceed the "
                f"window size (2*{half_width})"
            )
        c = int(halo_chunk_rows)
        rn = F.row_number().over(_win(group_cols, time_col))
        idx = F.col("_rn") - 1
        home = F.floor(idx / c)
        offs = F.array(
            F.lit(0),
            F.when(idx % c < half_width, F.lit(-1)),
            F.when(idx % c >= c - half_width, F.lit(1)),
        )
        haloed = (
            df.withColumn("_rn", rn)
            .withColumn(
                "_off", F.explode(F.filter(offs, lambda x: x.isNotNull()))
            )
            .withColumn("_hchunk", home + F.col("_off"))
        )
        # explicit count: AQE would coalesce this small-in-bytes shuffle
        # back to one partition, defeating the CPU spread
        n_part = df.sparkSession.sparkContext.defaultParallelism
        haloed = haloed.repartition(n_part, *group_cols, "_hchunk")
        w = (
            Window.partitionBy(*group_cols, "_hchunk")
            .orderBy("_rn")
            .rowsBetween(-half_width, half_width)
        )
        return (
            haloed.withColumn(
                out_col, F.expr(f"{fn}({value_col}, 0.5)").over(w)
            )
            .filter(F.col("_off") == 0)
            .drop("_rn", "_off", "_hchunk")
        )
    w = _win(group_cols, time_col).rowsBetween(-half_width, half_width)
    return df.withColumn(out_col, F.expr(f"{fn}({value_col}, 0.5)").over(w))


def rolling_percentile_band(
    df: DataFrame,
    range_width: float,
    value_col: str = "value",
    time_col: str = "time",
    group_cols: Sequence[str] = (),
    lo: float = 0.05,
    hi: float = 0.95,
    halo_chunk: float | None = None,
) -> DataFrame:
    """W3 — rolling 5/50/95-percentile band over a ±range_width TIME
    window (flare finder, miletos/main.py:11367-11399). Adds columns
    band_lo, band_med, band_hi and the detection metric
    ``(value − band_med) / (band_hi − band_lo)``.

    Range frame over the time axis (matching the reference's ±1 h window
    irrespective of cadence). Built with a SQL window spec because the
    DataFrame `rangeBetween` API only accepts integer offsets while the
    time axis is DOUBLE days.

    `halo_chunk` (≥ range_width, in time units) parallelizes an
    otherwise-unpartitioned (or coarsely-partitioned) series WITHOUT
    changing a single output value: rows are bucketed into time chunks,
    rows within `range_width` of a chunk edge are ALSO copied into the
    neighbor chunk (the halo), the window runs PARTITION BY chunk, and
    only each row's home-chunk copy is kept. A ±range_width frame never
    reaches past the halo, so every frame is identical to the
    unpartitioned one — this is the exact-semantics fix for the
    one-task pooled-series window (6.5 s → sub-second on the sf0.1
    pipeline flare stage). Halo row overhead ≈ 2·range_width/chunk.
    """
    if halo_chunk is not None:
        if halo_chunk < range_width:
            raise ValueError(
                f"halo_chunk ({halo_chunk}) must be >= range_width "
                f"({range_width}): a frame may not span two chunk halos"
            )
        t = F.col(time_col)
        home = F.floor(t / F.lit(float(halo_chunk)))
        # halo conditions widened by an ulp margin: floor(t/halo) can
        # land a boundary-adjacent row one chunk high/low when t/halo
        # rounds across the integer, and a copy the frame doesn't need
        # is harmless (RANGE excludes it; non-home copies are filtered)
        # while a MISSING copy breaks the exactness contract. The
        # margin covers |t| up to halo_chunk * 2^26 time units.
        eps = float(halo_chunk) * 2.0 ** -26
        offs = F.array(
            F.lit(0),
            F.when(
                t - home * halo_chunk < range_width + eps, F.lit(-1)
            ),
            F.when(
                (home + 1) * halo_chunk - t <= range_width + eps, F.lit(1)
            ),
        )
        haloed = (
            df.withColumn("_home", home)
            .withColumn("_off", F.explode(F.filter(offs, lambda x: x.isNotNull())))
            .withColumn("_hchunk", F.col("_home") + F.col("_off"))
        )
        # explicit partition count: the chunks exist to spread CPU-heavy
        # exact-percentile work, and AQE would coalesce this
        # small-in-bytes shuffle back into one partition otherwise
        # (user-specified repartition counts are exempt from coalescing;
        # the window's PARTITION BY reuses this hash distribution, so no
        # second exchange is added)
        n_part = df.sparkSession.sparkContext.defaultParallelism
        haloed = haloed.repartition(n_part, *group_cols, "_hchunk")
        banded = rolling_percentile_band(
            haloed, range_width, value_col=value_col, time_col=time_col,
            group_cols=(*group_cols, "_hchunk"), lo=lo, hi=hi,
        )
        return banded.filter(F.col("_off") == 0).drop(
            "_home", "_off", "_hchunk"
        )
    part = f"PARTITION BY {', '.join(group_cols)} " if group_cols else ""
    frame = (
        f"OVER ({part}ORDER BY {time_col} "
        f"RANGE BETWEEN {range_width!r} PRECEDING AND {range_width!r} FOLLOWING)"
    )
    # ONE window evaluation for all three percentiles (array form): the
    # exact-percentile frame scan is the whole cost of this operator,
    # and three separate window expressions paid it three times
    # (measured 3x on the single-partition pipeline flare stage)
    return (
        df.withColumn(
            "_band",
            F.expr(f"percentile({value_col}, array({lo}, 0.5, {hi})) {frame}"),
        )
        .withColumn("band_lo", F.col("_band")[0])
        .withColumn("band_med", F.col("_band")[1])
        .withColumn("band_hi", F.col("_band")[2])
        .drop("_band")
        .withColumn(
            "detect_metric",
            (F.col(value_col) - F.col("band_med"))
            / F.nullif(F.col("band_hi") - F.col("band_lo"), F.lit(0.0)),
        )
    )


def largest_gap(
    df: DataFrame,
    time_col: str = "time",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """W7 — per group, the start time and size of the largest time gap
    (argmax(diff(time)), miletos/main.py:2144)."""
    w = _win(group_cols, time_col)
    gaps = df.select(*group_cols, F.col(time_col)).withColumn(
        "gap", F.col(time_col) - F.lag(time_col).over(w)
    )
    if group_cols:
        return gaps.groupBy(*group_cols).agg(
            F.max("gap").alias("max_gap"),
            F.expr(f"max_by({time_col}, gap)").alias("gap_end_time"),
        )
    return gaps.agg(
        F.max("gap").alias("max_gap"),
        F.expr(f"max_by({time_col}, gap)").alias("gap_end_time"),
    )
