"""S-series sinks (SURVEY.md §2.1, S9–S11).

- `write_stage` — per-stage table writes (the reference's per-stage CSV
  dumps, miletos/main.py:10823-10838), partitioned for pruning.
- `upsert_results` — the cluster-CSV append-with-dedup
  (miletos/main.py:12458-12539) as a keyed merge: new rows replace
  existing rows with the same key, everything else is preserved.
- `memoize_parquet` — the pickle memo short-circuit
  (miletos/main.py:8706-8714): return the cached table unless
  overwrite; else build, persist, return.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_stage(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = ("inst", "chunk"),
    mode: str = "overwrite",
) -> None:
    """S9 — persist a stage table as partitioned parquet. Partitioning
    by (inst, chunk) mirrors the reference's per-sector files and buys
    partition pruning for sector-selection reads (S7/U4)."""
    writer = df.write.mode(mode)
    cols = [c for c in partition_cols if c in df.columns]
    if cols:
        writer = writer.partitionBy(*cols)
    writer.parquet(path)


def upsert_results(
    spark: SparkSession,
    path: str,
    new_rows: DataFrame,
    key: str = "strgtarg",
) -> DataFrame:
    """S10 — MERGE-style upsert keyed on `key`: keep existing rows whose
    key is absent from `new_rows` (left_anti), union the new rows, write
    back atomically (temp dir + rename via overwrite). Returns the
    merged table.

    Plain-parquet stand-in for `MERGE INTO` (no Delta in this env); the
    anti-join is broadcast when the new side is small — the common case
    (one run summary row per invocation). The merge is written to a
    sibling temp dir and swapped in, so the input path is never read
    and overwritten in the same job (and nothing is collected to the
    driver — the table can be arbitrarily large).

    Promotion is rename-aside, never delete-then-rename: the old table
    moves to `__old`, the new one renames in, then `__old` is removed —
    at no point does a crash leave the path without a recoverable copy
    (a missing path with a surviving `__old` is restored on the next
    call). Scope: local/POSIX filesystems where directory rename is
    atomic; on object stores swap this for a table format's
    transactional commit (Delta/Iceberg)."""
    import shutil

    old = path.rstrip("/") + "__upsert_old"
    if not os.path.exists(path) and os.path.exists(old):
        # crashed after rename-aside, before promotion: recover
        os.rename(old, path)
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        keep = existing.join(
            F.broadcast(new_rows.select(key).distinct()), on=key, how="left_anti"
        )
        merged = keep.unionByName(new_rows, allowMissingColumns=True)
        tmp = path.rstrip("/") + "__upsert_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
    else:
        new_rows.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def memoize_parquet(
    spark: SparkSession,
    path: str,
    build: Callable[[], DataFrame],
    overwrite: bool = False,
) -> DataFrame:
    """S11 — result-cache table: if `path` exists and not `overwrite`,
    short-circuit and read it (the reference's pickle memo,
    miletos/main.py:8706-8714); else build, write, read back."""
    if os.path.exists(path) and not overwrite:
        return spark.read.parquet(path)
    build().write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
