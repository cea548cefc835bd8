"""§2.12 — Structured Streaming for incremental sector ingest.

The reference is strictly batch; its chunk axis (TESS sector,
miletos/main.py:9966-9999) is already an append unit, so the streaming
analog is: landing parquet stream partitioned by chunk → stateless
stages map 1:1 (F1/F2 filters, X1 fold, A1 rebin) → gap sessionization
becomes `session_window` with a watermark → iterative analyses (BLS,
detrend fixpoint) run per arriving chunk via `foreachBatch`.

Watermark/late-data semantics are our design choice (no reference
counterpart): event-time watermark = 1 day — later-than-a-day samples
(a re-downloaded sector) belong in a batch backfill, not the stream.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_sessions(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    gap_sec: float = 14400.0,
    ts_col: str = "ts",
    group_col: str = "user_id",
    watermark: str = "1 day",
) -> DataFrame:
    """W4 sessionization as a streaming `session_window` aggregate:
    one row per (group, session) with count and bounds. Returns the
    streaming DataFrame (caller attaches the sink/trigger)."""
    src = spark.readStream.schema(schema).parquet(input_dir)
    gap = f"{int(gap_sec)} seconds"
    return (
        src.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(group_col))
        .agg(
            F.count("*").alias("n_events"),
            # decimal fixed-order sum: micro-batch order can't move the
            # session mean (see rebin.py)
            (
                F.sum(F.col("value").cast("decimal(38,18)")).cast("double")
                / F.count("*")
            ).alias("mean_value"),
        )
        .select(
            group_col,
            F.col("session_window.start").alias("t_start"),
            F.col("session_window.end").alias("t_end"),
            "n_events",
            "mean_value",
        )
    )


def stream_rebin(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    bin_width: str = "1 hour",
    ts_col: str = "ts",
    group_col: str = "event_type",
    watermark: str = "1 day",
) -> DataFrame:
    """A1 rebin as a streaming tumbling-window aggregate (the
    incremental form of `rebn_tser`)."""
    src = spark.readStream.schema(schema).parquet(input_dir)
    return (
        src.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), bin_width), F.col(group_col))
        .agg(
            # decimal fixed-order sum: bin means are identical across
            # micro-batch boundaries, partition layouts, and engines
            (
                F.sum(F.col("value").cast("decimal(38,18)")).cast("double")
                / F.count("*")
            ).alias("value"),
            F.count("*").alias("n"),
        )
        .select(
            group_col,
            F.col("window.start").alias("bin_start"),
            "value",
            "n",
        )
    )


def incremental_analysis(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
):
    """The reference's per-new-sector re-analysis (BLS / detrend loop —
    inherently iterative, so batch jobs) triggered per arriving
    micro-batch via `foreachBatch`. Returns the started
    StreamingQuery; caller awaits/stops it (use
    trigger(availableNow=True) semantics — set by this helper — for
    drain-and-stop processing of the current backlog)."""
    src = spark.readStream.schema(schema).parquet(input_dir)
    return (
        src.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
