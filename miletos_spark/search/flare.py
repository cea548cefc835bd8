"""P6/P7 — flare detection (miletos/main.py:6073-6417, 11353-11431).

- `flare_outlier_search` (P7, `typemodlflar='outl'`): rolling
  5/50/95-percentile band over a ±window, detection metric
  (y − med)/(p95 − p5), threshold (default 7σ analog,
  `thrssigmflar` miletos/main.py:7856), consecutive-trigger clustering
  keeping per-cluster peak — pure window ops (W3 + W5), zero UDFs.

- `matched_filter_search` (P6, `srch_flar`/`corr_tmpt`): exponential-
  decay template correlation. Spark-first: express the 'valid'-mode
  correlation as a windowed dot product with per-row template weights —
  for a k-sample template, corr_i = Σ_j tmpl_j · y_{i+j} over a
  rowsBetween(0, k−1) frame. Built from lead() columns (k is small:
  the reference uses 3 templates of a few samples at 3-min cadence).
  Gap sessionization bounds each correlation to a uniform-cadence
  region, mirroring the reference's split-at-gaps + regrid
  (miletos/main.py:6230-6286).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from miletos_spark.operators.sessionize import cluster_triggers, sessionize
from miletos_spark.operators.windows import rolling_percentile_band


def flare_outlier_search(
    df: DataFrame,
    window_days: float = 1.0 / 24.0,
    threshold: float = 7.0,
    time_col: str = "time",
    value_col: str = "value",
    group_cols: Sequence[str] = (),
    halo_chunk_days: float | None = None,
) -> DataFrame:
    """P7 — returns one row per detected flare:
    group_cols + (cluster, time, detect_metric, n_triggers).

    `halo_chunk_days` parallelizes the percentile band's time window
    via halo chunking (exact-identical output; see
    `rolling_percentile_band`) — use it when group_cols don't bound the
    partitions (a pooled series, or few very long targets)."""
    banded = rolling_percentile_band(
        df, window_days, value_col=value_col, time_col=time_col,
        group_cols=group_cols, halo_chunk=halo_chunk_days,
    )
    flagged = banded.withColumn(
        "_trig", F.coalesce(F.col("detect_metric") > threshold, F.lit(False))
    )
    return cluster_triggers(
        flagged, "_trig", "detect_metric", time_col=time_col, group_cols=group_cols
    )


def exp_decay_template(n_samples: int, tscl_samples: float, ampl: float = 1.0) -> list[float]:
    """Flare template ampl·exp(−Δt/tscl) (miletos/main.py:368-381),
    sampled on the cadence grid and mean-subtracted (the reference
    mean-subtracts both series and template before correlating,
    miletos/main.py:6301-6319)."""
    raw = [ampl * math.exp(-j / tscl_samples) for j in range(n_samples)]
    mu = sum(raw) / n_samples
    return [v - mu for v in raw]


def matched_filter_search(
    df: DataFrame,
    template: Sequence[float],
    threshold: float | None = None,
    gap_days: float = 0.1,
    time_col: str = "time",
    value_col: str = "value",
    group_cols: Sequence[str] = (),
    order_cols: Sequence[str] | None = None,
    session_bucket_width: float | None = None,
) -> DataFrame:
    """P6 — windowed-dot-product correlation + auto threshold
    (median + 7·σ of the correlation series, miletos/main.py:6331-6336)
    + trigger clustering. Returns one row per detected event.

    Assumes near-uniform cadence within a gap region (the reference
    regrids; at driver-data granularity lead() over the row frame is the
    equivalent). Template length k ⇒ k−1 lead columns; k is O(10).

    `order_cols` (default [time_col]) should append a unique-id
    tie-break: the lead() columns read k−1 rows ahead in window order,
    so duplicate timestamps would otherwise make corr values depend on
    engine row order (and the auto threshold amplifies any diff).

    `session_bucket_width` routes region assignment through the
    distributed prefix-sum sessionizer, so when group_cols don't bound
    the series (e.g. one long target) no single task sorts it; the
    downstream lead()/cluster windows are per (group, region), bounded
    by one contiguous gap-free chunk.
    """
    k = len(template)
    ocols = list(order_cols) if order_cols else [time_col]
    sess = sessionize(
        df, gap_days, time_col=time_col, group_cols=group_cols,
        order_cols=ocols, bucket_width=session_bucket_width,
    )
    keys = [*group_cols, "region"]
    w = Window.partitionBy(*keys).orderBy(*ocols)

    # decimal sum → order-independent mean (the mean seeds every corr
    # term and the auto threshold, so reordering noise would propagate)
    mu_row = df.agg(
        (F.sum(F.col(value_col).cast("decimal(38,18)")).cast("double")
         / F.count(value_col)).alias("mu")
    ).first()
    mu = mu_row["mu"]
    y = F.col(value_col) - F.lit(float(mu))
    corr = F.lit(float(template[0])) * y
    for j in range(1, k):
        corr = corr + F.lit(float(template[j])) * (
            F.lead(value_col, j).over(w) - F.lit(float(mu))
        )
    scored = sess.withColumn("corr", corr).filter(F.col("corr").isNotNull())

    if threshold is None:
        # order-independent moments: plain stddev_pop merges partial
        # aggregates in partition order, so the threshold — and through
        # it every trigger decision — would wobble with AQE/partition
        # layout. DECIMAL(38,18) sums of corr and corr² are exact
        # integer arithmetic regardless of order; the float ops after
        # them are a fixed sequence mirrored by the SQL oracle.
        stats = scored.agg(
            F.expr("percentile(corr, 0.5)").alias("med"),
            F.sum(F.col("corr").cast("decimal(38,18)")).alias("s1"),
            F.sum((F.col("corr") * F.col("corr")).cast("decimal(38,18)")).alias("s2"),
            F.count("corr").alias("n"),
        ).first()
        n = float(stats["n"])
        m1 = float(stats["s1"]) / n
        var = float(stats["s2"]) / n - m1 * m1
        threshold = float(stats["med"]) + 7.0 * math.sqrt(max(var, 0.0))

    flagged = scored.withColumn("_trig", F.col("corr") > threshold)
    return cluster_triggers(
        flagged, "_trig", "corr", time_col=time_col, group_cols=keys,
        order_cols=ocols,
    )
