"""Distributed one-pass linear probe trainer (pipeline/classifier.py):
the solve must equal numpy's on the same moments, be bit-invariant to
partitioning (the decimal-sum contract), and actually recover the
injected decision rule."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from miletos_spark.pipeline.classifier import (
    PROBE_FEATURES,
    gauss_jordan_steps,
    probe_features,
    probe_score_expr,
    score_linear_probe,
    train_linear_probe,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def feats(spark):
    from miletos_spark.pipeline.text import quality_logit
    from miletos_spark.schema import load_table

    docs = load_table(spark, SF, "documents")
    label = F.when(quality_logit(F.col("text")) > 0, F.lit(1.0)).otherwise(
        F.lit(-1.0)
    )
    return probe_features(docs, label)


def test_weights_match_numpy_ridge(feats):
    w = train_linear_probe(feats).first()
    pdf = feats.toPandas()
    X = np.column_stack(
        [np.ones(len(pdf))] + [pdf[f"x{i}"].to_numpy() for i in range(1, 6)]
    )
    y = pdf["y"].to_numpy()
    A = X.T @ X + 1e-3 * np.eye(6)
    ref = np.linalg.solve(A, X.T @ y)
    got = np.array([w[f"w{j}"] for j in range(6)])
    # numpy solves with partial pivoting and float moments, so agreement
    # is numerical (~1e-12 on this conditioning), not bitwise
    assert np.allclose(got, ref, rtol=1e-9, atol=1e-9), (got, ref)


def test_weights_bit_invariant_to_partitioning(feats):
    a = train_linear_probe(feats).first()
    b = train_linear_probe(feats.repartition(7)).first()
    for j in range(6):
        assert a[f"w{j}"] == b[f"w{j}"], (j, a[f"w{j}"], b[f"w{j}"])


def test_probe_recovers_injected_rule(feats):
    w = train_linear_probe(feats)
    out = score_linear_probe(feats, w)
    acc = out.select(
        F.avg((F.col("pred") == (F.col("label") > 0)).cast("double"))
    ).first()[0]
    base = out.select(
        F.greatest(
            F.avg((F.col("label") > 0).cast("double")),
            1 - F.avg((F.col("label") > 0).cast("double")),
        )
    ).first()[0]
    assert acc > base + 0.05, (acc, base)
    assert acc > 0.85, acc


def test_solve_strings_are_engine_neutral():
    """The generated solve and score strings must stay in the shared
    Spark-SQL/DuckDB dialect: plain arithmetic and aliases only."""
    banned = ("F.", "`", "::", "$")
    for step in gauss_jordan_steps():
        for e in step:
            assert all(t not in e for t in banned), e
    assert probe_score_expr() == (
        "w0 + w1 * x1 + w2 * x2 + w3 * x3 + w4 * x4 + w5 * x5"
    )
    assert len(PROBE_FEATURES) == 6


def test_stream_scoring_equals_batch(spark, tmp_path):
    """stream_probe_score over a 2-file feed must emit bit-identical
    logits to the batch scorer on the same rows (stateless contract)."""
    from miletos_spark.schema import load_table
    from miletos_spark.streaming.ingest import stream_probe_score

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "lang", "text"
    )
    from miletos_spark.pipeline.text import quality_logit

    label = F.when(quality_logit(F.col("text")) > 0, F.lit(1.0)).otherwise(
        F.lit(-1.0)
    )
    w = train_linear_probe(probe_features(docs, label)).localCheckpoint()
    feed = str(tmp_path / "feed")
    docs.repartition(2).write.parquet(feed)
    sdf = stream_probe_score(
        spark, feed, "doc_id long, lang string, text string", w,
        max_files_per_trigger=1,
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("probe_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["logit"], r["pred"])
        for r in spark.sql("SELECT * FROM probe_stream_t").collect()
    }
    want = {
        r["doc_id"]: (r["logit"], r["pred"])
        for r in score_linear_probe(
            probe_features(docs, label), w
        ).collect()
    }
    assert got == want and len(got) > 0
