"""P5 — `srch_outlperi` periodic-outlier search (miletos/main.py:5203-5279).

Top-k brightest samples → all pairwise time gaps → sort → if the
minimum fractional difference between consecutive sorted gaps is below
a threshold, the shared gap is a candidate period and the brightest
sample its epoch.

Everything after the top-k (k=5 → 10 pairs) is constant-size, so the
whole tail of the plan is broadcast-scale regardless of input rows; the
only full-data op is the top-k (`orderBy(desc).limit(k)`, which Spark
executes as a per-partition partial top-k + driver merge — no global
sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def outlier_period_search(
    df: DataFrame,
    k: int = 5,
    time_col: str = "time",
    value_col: str = "value",
) -> DataFrame:
    """Returns the sorted pairwise-gap table with fractional consecutive
    differences: (gap, frac_diff) — the reference's decision rule takes
    the argmin row and compares frac_diff < 0.1 (miletos/main.py:5243-5256).
    """
    top = (
        df.select(time_col, value_col)
        .orderBy(F.col(value_col).desc(), F.col(time_col))
        .limit(k)
    )
    a = top.select(F.col(time_col).alias("ta"))
    b = top.select(F.col(time_col).alias("tb"))
    pairs = a.crossJoin(b).filter(F.col("ta") < F.col("tb"))
    gaps = pairs.select((F.col("tb") - F.col("ta")).alias("gap"))
    w = Window.orderBy("gap")
    return (
        gaps.withColumn("prev_gap", F.lag("gap").over(w))
        .withColumn(
            "frac_diff",
            F.when(
                F.col("prev_gap").isNotNull(),
                (F.col("gap") - F.col("prev_gap")) / F.col("gap"),
            ),
        )
        .select("gap", "frac_diff")
    )


def outlier_period_sql(
    time_expr: str, value_expr: str, table: str, k: int = 5
) -> str:
    """DuckDB twin of `outlier_period_search`."""
    return f"""
WITH top AS (
  SELECT CAST({time_expr} AS DOUBLE) AS t, CAST({value_expr} AS DOUBLE) AS v
  FROM {table}
  ORDER BY v DESC, t
  LIMIT {k}
),
pairs AS (
  SELECT b.t - a.t AS gap
  FROM top a CROSS JOIN top b
  WHERE a.t < b.t
)
SELECT gap,
       CASE WHEN lag(gap) OVER (ORDER BY gap) IS NOT NULL
            THEN (gap - lag(gap) OVER (ORDER BY gap)) / gap
       END AS frac_diff
FROM pairs
"""
