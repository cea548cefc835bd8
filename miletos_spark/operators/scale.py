"""Scale strategies: bucketed co-located joins and skew salting.

These are the 100 TB join/aggregation patterns (SURVEY.md §4, task
brief): bucketing pre-shuffles a table ONCE at write time so every
subsequent equi-join/aggregation on the bucket key runs shuffle-free;
salting splinters a hot key across `n_salt` sub-keys so no single
reducer owns it (the engine-side fallback when AQE's skew splitting
isn't enough — e.g. a single pathological phase bucket or band hash).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+optionally sorted) table. A join or
    groupBy on `bucket_cols` between two tables bucketed the same way
    is planned WITHOUT an Exchange — the write paid the shuffle once.
    Sorting within buckets additionally removes the sort of a
    sort-merge join (the classic series⋈series alignment at scale)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, str],
    n_salt: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation for skewed keys: stage 1 aggregates
    on (group_cols, salt) — splitting each hot key across `n_salt`
    reducers — stage 2 merges the partials. Only algebraic aggregates
    (sum/count/min/max) compose; avg = sum/count downstream.

    `aggs` maps output column -> 'fn(col)' with fn in sum|count|min|max.
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    stage1_aggs, stage2_aggs = [], []
    for out, spec in aggs.items():
        fn, col = spec.rstrip(")").split("(")
        fn = fn.strip().lower()
        if fn == "count":
            stage1_aggs.append(F.count(col if col != "*" else "*").alias(f"_{out}"))
        else:
            stage1_aggs.append(getattr(F, fn)(col).alias(f"_{out}"))
        stage2_aggs.append(merge_fn[fn](f"_{out}").alias(out))
    partial = df.withColumn("_salt", (F.rand(seed=42) * n_salt).cast("int")) \
        .groupBy(*group_cols, "_salt").agg(*stage1_aggs)
    return partial.groupBy(*group_cols).agg(*stage2_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side's key, explode the small
    side across all salt values (small × n_salt rows), join on
    (key, salt). Each hot key's rows spread over `n_salt` tasks instead
    of one. Use when the small side fits ×n_salt in memory but is too
    big (or too hot) for a plain broadcast."""
    salts = F.array(*[F.lit(i) for i in range(n_salt)])
    big_s = big.withColumn("_salt", (F.rand(seed=42) * n_salt).cast("int"))
    small_s = small.withColumn("_salt", F.explode(salts))
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")
