"""Batch model-inference seam: the one place a real encoder plugs in.

`batch_infer` is the Arrow-batched `mapInPandas` template for running
an arbitrary per-batch model over a text column at cluster scale.
Everything scale-relevant is owned by the template, not the model:

- **Batching**: input Arrow frames are re-chunked to at most
  `max_batch_rows` rows per model call, so peak model-input memory is
  bounded by the caller regardless of
  `spark.sql.execution.arrow.maxRecordsPerBatch` (which bounds the
  Arrow transfer, a different axis). A GPU encoder sets this to its
  optimal micro-batch; the Spark plan is unchanged.
- **Contract enforcement**: the model fn takes a `pandas.Series` of
  strings and must return a float array of shape `(len(batch), dim)`;
  shape/width violations raise immediately with the offending shape
  (not a downstream Arrow cast error three stages later).
- **Schema**: output = input columns + `out_col array<double>`; all
  passthrough columns survive untouched, so the template composes with
  `mean_pool` / ANN / dedup exactly like the JVM `hash_embed` path.

This container has no embedding model (same stance as the multimodal
codec stubs: multimodal.py), so `hash_embed_model_fn` is the
deterministic stand-in — it reproduces `similarity.hash_embed`'s
md5-based dyadic components BIT-FOR-BIT (int(md5_hex8,16)/2^32 − 0.5:
a 32-bit-mantissa rational, exact in float64 in both engines), which
is what lets a driver row route through the Python seam and still
hash-match the DuckDB oracle. Swapping in a real encoder at cluster
scale is a one-function change with the batching/memory story already
tested (tests/test_inference.py).

Reference parity: the reference runs its per-chunk model evaluations
as in-process NumPy loops (miletos/main.py forward-model call sites);
here the same seam is a distributed Arrow-batched operator.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType


def batch_infer(
    df: DataFrame,
    model_fn: "Callable",
    text_col: str = "chunk_text",
    out_col: str = "emb",
    dim: int = 8,
    max_batch_rows: int = 1024,
) -> DataFrame:
    """Append `out_col array<double>` = `model_fn` applied over
    bounded batches of `text_col`.

    `model_fn(texts: pandas.Series) -> ndarray of shape (len, dim)`.
    It is called with at most `max_batch_rows` rows at a time and must
    be deterministic if the result feeds an exactness gate (a real
    encoder usually isn't bit-stable across hardware — pin the oracle
    strategy accordingly; the hash stub is).
    """
    import pandas as pd  # executor-side import kept with the closure

    if max_batch_rows < 1:
        raise ValueError(f"max_batch_rows must be >= 1, got {max_batch_rows}")
    out_schema = StructType(
        df.schema.fields
        + [StructField(out_col, ArrayType(DoubleType()), False)]
    )

    def run(frames: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in frames:
            for lo in range(0, len(pdf), max_batch_rows):
                sub = pdf.iloc[lo : lo + max_batch_rows]
                vecs = np.asarray(model_fn(sub[text_col]), dtype=np.float64)
                if vecs.shape != (len(sub), dim):
                    raise ValueError(
                        f"model_fn returned shape {vecs.shape}, "
                        f"expected ({len(sub)}, {dim})"
                    )
                out = sub.copy()
                out[out_col] = list(vecs)
                yield out

    return df.mapInPandas(run, schema=out_schema)


def hash_embed_model_fn(dim: int = 8) -> "Callable":
    """The deterministic stub model: component j of text t is
    int(md5(t + '|' + str(j))[:8], 16) / 2^32 − 0.5 — the exact
    formula `similarity.hash_embed` evaluates JVM-side, so
    `batch_infer(df, hash_embed_model_fn(d))` is bit-equal to
    `hash_embed(df, dim=d)` (pinned in tests). Row-at-a-time inside
    the batch is fine: the stub's job is to prove the batching
    contract, not to be fast."""

    def fn(texts) -> np.ndarray:
        out = np.empty((len(texts), dim), dtype=np.float64)
        for i, t in enumerate(texts):
            for j in range(dim):
                h = hashlib.md5(f"{t}|{j}".encode("utf-8")).hexdigest()[:8]
                out[i, j] = int(h, 16) / 4294967296.0 - 0.5
        return out

    return fn
