"""W4 gap sessionization + W5 trigger clustering (SURVEY.md §2.5).

Classic lag + running-sum sessionization; replaces the reference's
`retr_timeedge` region splitting (miletos/main.py:6590-6630) and
consecutive-trigger clustering (miletos/main.py:6352-6368, 11393-11398).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    gap: float,
    time_col: str = "time",
    group_cols: Sequence[str] = (),
    out_col: str = "region",
    order_cols: Sequence[str] | None = None,
    bucket_width: float | None = None,
) -> DataFrame:
    """W4 — assign a region id that increments wherever
    Δtime > gap (`timebrekregi` = 0.1 d default, miletos/main.py:6716).

    region = running count of gap-breaks up to the current row, per
    group. One window (single shuffle on group_cols); at scale the
    partition key bounds window state to one series chunk.

    `order_cols` (default [time_col]) lets callers append tie-break
    columns (e.g. a unique event id) so row order — and therefore the
    running sum seen by any downstream per-row consumer — is
    deterministic when timestamps collide.

    `bucket_width` switches to the distributed prefix-sum path: the
    plain path sorts each group in ONE window partition, which is fine
    when group_cols bound a series chunk but funnels a whole series
    through one task when they don't. With a bucket width (same units
    as time_col), no partition ever holds more than one (group, time
    bucket); see `_sessionize_bucketed`. Results are identical.
    """
    if bucket_width is not None:
        return _sessionize_bucketed(
            df, gap, time_col, group_cols, out_col, order_cols, bucket_width
        )
    ocols = list(order_cols) if order_cols else [time_col]
    w = Window.partitionBy(*group_cols).orderBy(*ocols) if group_cols else Window.orderBy(*ocols)
    brk = (
        (F.col(time_col) - F.lag(time_col).over(w) > gap).cast("int")
    )
    return df.withColumn(
        out_col,
        F.sum(F.coalesce(brk, F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )


def _sessionize_bucketed(
    df: DataFrame,
    gap: float,
    time_col: str,
    group_cols: Sequence[str],
    out_col: str,
    order_cols: Sequence[str] | None,
    bucket_width: float,
) -> DataFrame:
    """Two-phase distributed prefix sum — the scale path for W4.

    A session id is a running count of gap-breaks, i.e. a prefix sum in
    time order. The plain formulation needs the whole series sorted in
    one window partition; this one never does:

    1. bucket = floor(time / bucket_width); local window per (group,
       bucket) computes each row's break flag and local prefix sum —
       partition size is bounded by one bucket, not the series.
    2. a per-bucket summary (first/last time, total local breaks) —
       span/bucket_width rows per group, independent of row density —
       gets a window over buckets: whether each bucket's first row
       breaks against the previous bucket's last row, and the cumulative
       break count before the bucket.
    3. broadcast the summary back; region = local prefix + bucket offset.

    Exactly equivalent to the plain path (same > gap predicate, same
    tie-break order; rows with equal time share a bucket by
    construction). Cost: one narrow bucket window, one tiny aggregate,
    one broadcast join — no series-wide sort anywhere.
    """
    ocols = list(order_cols) if order_cols else [time_col]
    gcols = list(group_cols)
    t = F.col(time_col)
    bkt = F.floor(t / F.lit(float(bucket_width)))
    dfb = df.withColumn("_skt", bkt)

    wloc = Window.partitionBy(*gcols, "_skt").orderBy(*ocols)
    loc_brk = F.coalesce(
        (t - F.lag(time_col).over(wloc) > gap).cast("int"), F.lit(0)
    )
    local = dfb.withColumn("_brk", loc_brk).withColumn(
        "_pref",
        F.sum("_brk").over(wloc.rowsBetween(Window.unboundedPreceding, 0)),
    )

    summ = local.groupBy(*gcols, "_skt").agg(
        F.min(t).alias("_t_first"),
        F.max(t).alias("_t_last"),
        F.sum("_brk").alias("_n_brk"),
    )
    wsum = (
        Window.partitionBy(*gcols).orderBy("_skt")
        if gcols
        else Window.orderBy("_skt")
    )
    bound = F.coalesce(
        (F.col("_t_first") - F.lag("_t_last").over(wsum) > gap).cast("long"),
        F.lit(0),
    )
    offsets = summ.withColumn("_bound", bound).withColumn(
        "_off",
        F.sum(F.col("_n_brk") + F.col("_bound")).over(
            wsum.rowsBetween(Window.unboundedPreceding, 0)
        )
        - F.col("_n_brk"),
    ).select(*gcols, "_skt", "_off")

    # No broadcast hint: the offsets table has groups × (span /
    # bucket_width) rows — small for typical series, but exactly the
    # regime this path targets (long series, fine buckets) can grow it
    # past driver memory. Let AQE pick broadcast vs shuffle from the
    # actual size at runtime.
    return (
        local.join(offsets, [*gcols, "_skt"])
        .withColumn(out_col, F.col("_pref") + F.col("_off"))
        .drop("_skt", "_brk", "_pref", "_off")
    )


def cluster_triggers(
    df: DataFrame,
    flag_col: str,
    metric_col: str,
    time_col: str = "time",
    group_cols: Sequence[str] = (),
    order_cols: Sequence[str] | None = None,
) -> DataFrame:
    """W5 — group consecutive flagged rows into clusters; keep the
    per-cluster argmax of `metric_col` (matched-filter peak,
    miletos/main.py:6352-6368).

    Consecutive = adjacent in time order with no unflagged row between.
    `order_cols` (default [time_col]) can append tie-break columns so
    cluster boundaries are deterministic when times collide. The
    per-cluster peak is the lexicographic max of (metric, time), so a
    metric tie deterministically keeps the latest sample — mirrored by
    `max(struct_pack(...))` in SQL oracles (plain `max_by(time, metric)`
    picks an engine-dependent row on ties).
    Returns one row per cluster: group_cols + [cluster, time, metric].
    """
    ocols = list(order_cols) if order_cols else [time_col]
    w = Window.partitionBy(*group_cols).orderBy(*ocols) if group_cols else Window.orderBy(*ocols)
    flagged = df.withColumn("_f", F.col(flag_col).cast("int"))
    # a new cluster starts at each flagged row whose predecessor is unflagged
    start = (
        (F.col("_f") == 1)
        & (F.coalesce(F.lag("_f").over(w), F.lit(0)) == 0)
    ).cast("int")
    clustered = (
        flagged.withColumn(
            "_cluster",
            F.sum(start).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .filter(F.col("_f") == 1)
    )
    return (
        clustered.groupBy(*group_cols, "_cluster")
        .agg(
            F.max(
                F.struct(
                    F.col(metric_col).alias("m"), F.col(time_col).alias("t")
                )
            ).alias("_peak"),
            F.count("*").alias("n_triggers"),
        )
        .select(
            *group_cols,
            F.col("_cluster").alias("cluster"),
            F.col("_peak.t").alias(time_col),
            F.col("_peak.m").alias(metric_col),
            "n_triggers",
        )
    )
