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


def test_irls_probe_matches_exact_python_replay(spark, sf_dir):
    """The IRLS weights must be BIT-IDENTICAL to an independent
    pure-Python replay of the declared algorithm: fixed 3 passes,
    left-associated eta chain, +/-13 clamp, 12-decimal-rounded
    sigmoid, shortest-repr decimal(38,18) sums (Decimal(repr(x)) is
    exactly Spark's double->decimal cast), ridge, and the same
    pivot-free Gauss-Jordan order. Pins every IEEE op the engine-
    shared strings promise."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from miletos_spark.pipeline.classifier import (
        IRLS_ITERS,
        probe_features,
        train_logistic_probe_irls,
    )
    from miletos_spark.plans.driver_queries import _probe_label
    from miletos_spark.schema import load_table

    docs = load_table(spark, sf_dir, "documents")
    feats = probe_features(docs, _probe_label())
    got = train_logistic_probe_irls(feats).first()

    rows = [
        (1.0, r["x1"], r["x2"], r["x3"], r["x4"], r["x5"], r["y"])
        for r in feats.collect()
    ]
    d = 6
    w = [0.0] * d
    for _ in range(IRLS_ITERS):
        a = [[Decimal(0)] * (d + 1) for _ in range(d)]
        for x0, x1, x2, x3, x4, x5, y in rows:
            xs = (x0, x1, x2, x3, x4, x5)
            eta = w[0]
            for i in range(1, d):
                eta = eta + w[i] * xs[i]
            cl = min(max(eta, -13.0), 13.0)
            sig = 1.0 / (1.0 + math.exp(-cl))
            # Spark round(x, 12) = BigDecimal.valueOf(x) (shortest
            # repr) setScale(12, HALF_UP) — NOT Python's binary round
            p = float(
                Decimal(repr(sig)).quantize(
                    Decimal("1e-12"), ROUND_HALF_UP
                )
            )
            s = p * (1.0 - p)
            z = eta + (((y + 1.0) / 2.0) - p) / (p * (1.0 - p))

            def dec18(v: float) -> Decimal:
                # Spark cast(double as decimal(38,18)): shortest repr,
                # then scale-18 HALF_UP — each TERM truncates before
                # the sum, not just the total
                return Decimal(repr(v)).quantize(
                    Decimal("1e-18"), ROUND_HALF_UP
                )

            for i in range(d):
                for j in range(d):
                    lo, hi = min(i, j), max(i, j)
                    a[i][j] += dec18((s * xs[lo]) * xs[hi])
                a[i][d] += dec18((s * xs[i]) * z)
        m = [
            [
                float(a[i][j]) + (1e-3 if i == j else 0.0)
                for j in range(d + 1)
            ]
            for i in range(d)
        ]
        for k in range(d):
            nxt = [row[:] for row in m]
            for i in range(d):
                if i == k:
                    continue
                for j in range(d + 1):
                    nxt[i][j] = m[i][j] - (m[i][k] / m[k][k]) * m[k][j]
            m = nxt
        w = [m[j][d] / m[j][j] for j in range(d)]
    for i in range(d):
        assert got[f"w{i}"] == w[i], (i, got[f"w{i}"], w[i])
