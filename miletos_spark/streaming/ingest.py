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


def stream_bls(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    trials: list[tuple[float, float, float]],
    ts_col: str = "ts",
    value_col: str = "value",
    t_ref: float = 0.0,
) -> DataFrame:
    """P2 as an INCREMENTAL streaming aggregate: the box spectrum is an
    algebraic aggregate keyed on (trial, phase-bucket) — a bounded key
    space independent of row count — so it streams naturally: each
    arriving sector updates the per-box partial sums and the spectrum
    is always current, with state = |trials| x O(1/dcyc) rows no matter
    how much data has flowed. This is the streaming-native form of the
    reference's per-new-sector full re-search (miletos/main.py:
    9966-9999 + 5282-5965): instead of recomputing the whole spectrum
    per sector, only the partial sums advance.

    Stream-static broadcast join against the trial grid; the in-box
    means run as decimal fixed-order sums (micro-batch arrival order
    cannot move them — the `stream_rebin` discipline), so the drained
    spectrum is bit-equal to the batch/oracle form. Returns the
    streaming DataFrame of (period, dcyc, off, bucket, n_in, mean_in);
    the caller attaches sink/trigger and scores depth/SNR against the
    global moments (an O(|spectrum|) batch step)."""
    src = spark.readStream.schema(schema).parquet(input_dir)
    trials_df = spark.createDataFrame(
        trials, "period double, dcyc double, off double"
    ).withColumn("_k", F.lit(1))

    t = F.unix_micros(F.col(ts_col)).cast("double") / 1e6 / 86400.0
    joined = (
        src.withColumn("_k", F.lit(1))
        .withColumn("_t", t - F.lit(float(t_ref)))
        .join(F.broadcast(trials_df), "_k")
    )
    phase = ((F.col("_t") % F.col("period")) + F.col("period")) % F.col(
        "period"
    ) / F.col("period")
    shifted = phase - F.col("off") * F.col("dcyc")
    wrapped = ((shifted % 1.0) + 1.0) % 1.0
    bucket = F.floor(wrapped / F.col("dcyc")).cast("int")
    return (
        joined.withColumn("bucket", bucket)
        .groupBy("period", "dcyc", "off", "bucket")
        .agg(
            F.count("*").alias("n_in"),
            (
                F.sum(F.col(value_col).cast("decimal(38,18)")).cast("double")
                / F.count("*")
            ).alias("mean_in"),
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
