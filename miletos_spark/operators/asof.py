"""As-of join — a custom operator Spark's DataFrame API lacks (cited
in the task brief; the reference has no relational joins at all, but
series⋈series alignment at scale is exactly this shape).

Spark-first formulation: no per-row probing, no range join explosion.
Union the two sides with a source tag, run ONE window partitioned by
the `by` key ordered by (time, tag) carrying the running
last-known-right-row, keep left rows. Cost: one shuffle on the `by`
key, O(1) window state — the same machinery as `interp_to_grid`, and
the standard scale-out trick for backward as-of semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str = "time",
    by_cols: Sequence[str] = (),
    value_cols: Sequence[str] = ("value",),
    tolerance: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: for each left row, attach the latest right
    row with `right.time <= left.time` (per `by_cols` group), within
    `tolerance` if given. Right rows at exactly the left time match
    (DuckDB ASOF semantics). Appends `{time_col}{suffix}` and
    `{v}{suffix}` for each value column; no match → nulls."""
    by = list(by_cols)
    lcols = left.columns
    l_tag = left.withColumn("_src", F.lit(1))
    r_tag = right.select(
        *by,
        F.col(time_col),
        *[F.col(v).alias(f"{v}{suffix}") for v in value_cols],
    ).withColumn("_src", F.lit(0))
    both = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # right rows sort before a left row at the same time (tag 0 < 1),
    # so equality matches — ASOF "<=" semantics
    order = [F.col(time_col).asc(), F.col("_src").asc()]
    w = (
        (Window.partitionBy(*by) if by else Window.partitionBy())
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched_t = F.last(
        F.when(F.col("_src") == 0, F.col(time_col)), ignorenulls=True
    ).over(w)
    out = both.withColumn(f"{time_col}{suffix}", matched_t)
    for v in value_cols:
        out = out.withColumn(
            f"{v}{suffix}",
            F.last(
                F.when(F.col("_src") == 0, F.col(f"{v}{suffix}")),
                ignorenulls=True,
            ).over(w),
        )
    out = out.filter(F.col("_src") == 1).drop("_src")
    if tolerance is not None:
        stale = (F.col(time_col) - F.col(f"{time_col}{suffix}")) > float(tolerance)
        for v in value_cols:
            out = out.withColumn(
                f"{v}{suffix}",
                F.when(stale, F.lit(None)).otherwise(F.col(f"{v}{suffix}")),
            )
        out = out.withColumn(
            f"{time_col}{suffix}",
            F.when(stale, F.lit(None)).otherwise(F.col(f"{time_col}{suffix}")),
        )
    keep = lcols + [f"{time_col}{suffix}"] + [f"{v}{suffix}" for v in value_cols]
    return out.select(*keep)
