"""Contract tests for the batch model-inference seam
(miletos_spark.pipeline.inference): the template owns batching,
schema, and shape enforcement; the model fn is pluggable."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from miletos_spark.pipeline.inference import batch_infer, hash_embed_model_fn
from miletos_spark.pipeline.similarity import hash_embed


def _texts_df(spark, n=25, parts=2):
    return (
        spark.range(n)
        .repartition(parts)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("chunk text no "), F.col("id")).alias("chunk_text"),
            (F.col("id") % 3).alias("grp"),
        )
    )


def test_seam_bit_equal_to_jvm_hash_embed(spark):
    """batch_infer with the hash stub must reproduce similarity.hash_embed
    BIT-FOR-BIT — the property that lets a driver row route through the
    Python seam and still hash-match the JVM/DuckDB oracle."""
    df = _texts_df(spark)
    via_seam = {
        r["doc_id"]: r["emb"]
        for r in batch_infer(df, hash_embed_model_fn(8), dim=8).collect()
    }
    via_jvm = {
        r["doc_id"]: r["emb"] for r in hash_embed(df, dim=8).collect()
    }
    assert via_seam.keys() == via_jvm.keys()
    for k in via_jvm:
        assert via_seam[k] == via_jvm[k]  # exact float equality, no tol


def test_batches_bounded_and_complete(spark):
    """max_batch_rows bounds every model call; re-chunking loses no rows
    and passthrough columns survive."""
    bound = 7

    def strict_fn(texts):
        assert 0 < len(texts) <= bound, f"batch of {len(texts)} > {bound}"
        return np.zeros((len(texts), 4))

    df = _texts_df(spark, n=40, parts=3)
    out = batch_infer(
        df, strict_fn, dim=4, max_batch_rows=bound
    )
    rows = out.collect()
    assert len(rows) == 40
    assert sorted(r["doc_id"] for r in rows) == list(range(40))
    assert all(r["grp"] == r["doc_id"] % 3 for r in rows)
    assert all(r["emb"] == [0.0, 0.0, 0.0, 0.0] for r in rows)


def test_wrong_shape_raises_with_shape_in_message(spark):
    df = _texts_df(spark, n=5, parts=1)
    bad = batch_infer(df, lambda t: np.zeros((len(t), 3)), dim=8)
    with pytest.raises(Exception, match=r"expected \(5, 8\)"):
        bad.collect()


def test_empty_input_keeps_schema(spark):
    df = _texts_df(spark, n=6, parts=1).filter(F.col("doc_id") < 0)
    out = batch_infer(df, hash_embed_model_fn(8), dim=8)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "chunk_text", "grp", "emb",
    ]


def test_composes_with_mean_pool_like_jvm_path(spark):
    """The seam output must feed mean_pool identically to the JVM path —
    the doc-embedding pipeline swap is a one-function change."""
    from miletos_spark.pipeline.similarity import mean_pool

    df = _texts_df(spark, n=12, parts=2)
    a = {
        (r["grp"],): (r["n_chunks"], r["emb"])
        for r in mean_pool(
            batch_infer(df, hash_embed_model_fn(8), dim=8),
            group_col="grp", dim=8,
        ).collect()
    }
    b = {
        (r["grp"],): (r["n_chunks"], r["emb"])
        for r in mean_pool(hash_embed(df, dim=8), group_col="grp", dim=8).collect()
    }
    assert a == b
