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
    """
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
