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
