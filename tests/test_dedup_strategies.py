"""Both exact near-dup strategies (counting join vs PPJoin prefix
filtering) must produce the identical pair set — exactness cross-check."""

import os

import pytest

from miletos_spark.pipeline.dedup import (
    near_dup_pairs_bruteforce,
    near_dup_pairs_prefix,
)
from miletos_spark.schema import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


def _pairs(df):
    return {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in df.collect()
    }


def test_strategies_agree(spark, docs):
    counting = _pairs(near_dup_pairs_bruteforce(docs, threshold=0.5, k=9))
    prefix = _pairs(near_dup_pairs_prefix(docs, threshold=0.5, k=9))
    assert counting == prefix
    assert len(counting) > 0  # the driver corpus contains near-dups


def test_simhash_banded_join_is_lossless_for_small_hamming(spark, docs):
    """Pigeonhole: a pair at Hamming ≤ 3 over 4 bands must share a band,
    so the banded join equals brute force exactly — no recall loss."""
    from pyspark.sql import functions as F

    from miletos_spark.pipeline.dedup import (
        simhash_band_pairs,
        simhash_hamming,
        simhash_md5,
    )

    banded = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_band_pairs(docs, max_hamming=3).collect()
    }
    fps = simhash_md5(docs)
    a = fps.select(F.col("doc_id").alias("id_a"), F.col("simhash_hex").alias("fa"))
    b = fps.select(F.col("doc_id").alias("id_b"), F.col("simhash_hex").alias("fb"))
    brute = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", simhash_hamming(F.col("fa"), F.col("fb")))
        .filter(F.col("hamming") <= 3)
    )
    expected = {
        (r["id_a"], r["id_b"], r["hamming"]) for r in brute.collect()
    }
    assert banded == expected
    # the banded plan is a bucketed equi-join, not a cartesian product
    plan = simhash_band_pairs(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
