"""ANN family: brute-force is ground truth; LSH and IVF approximate it,
and both become exact when probing everything."""

import pytest

from miletos_spark.pipeline.similarity import cosine_topk, ivf_topk, lsh_bucket_topk
from miletos_spark.schema import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def query(emb):
    row = emb.orderBy("vec_id").select("embedding").first()
    return [float(x) for x in row["embedding"]]


def _ids(df):
    return [r["vec_id"] for r in df.collect()]


def test_ivf_exhaustive_equals_bruteforce(emb, query):
    exact = _ids(cosine_topk(emb, query, k=10))
    ivf_all = _ids(
        ivf_topk(emb, query, k=10, n_clusters=8, n_probe=8)
    )
    assert ivf_all == exact


def test_ivf_probe_recall(emb, query):
    exact = set(_ids(cosine_topk(emb, query, k=10)))
    approx = set(_ids(ivf_topk(emb, query, k=10, n_clusters=8, n_probe=2)))
    # the query vector's own cell is probed -> its exact top-1 (itself)
    # must be found, and recall should be substantial
    assert len(exact & approx) >= 5


def test_ivf_landed_probe_all_equals_bruteforce(emb, query, spark, sf_dir):
    """The write-time landed IVF index must reproduce brute force when
    every cell is probed, and its partition layout must prune the scan
    (the probed-cells read plans a partition filter on _cell)."""
    from miletos_spark.pipeline.landing import land_ivf_index
    from miletos_spark.pipeline.similarity import ivf_topk_landed

    paths = land_ivf_index(spark, sf_dir, n_clusters=8)
    exact = _ids(cosine_topk(emb, query, k=10))
    landed_all = _ids(
        ivf_topk_landed(spark, paths, query, k=10, n_probe=8)
    )
    assert landed_all == exact
    probe2 = ivf_topk_landed(spark, paths, query, k=10, n_probe=2)
    plan = probe2._jdf.queryExecution().executedPlan().toString()
    assert "_cell" in plan  # pruning predicate reached the scan
    assert len(set(_ids(probe2)) & set(exact)) >= 5


def test_lsh_multiprobe_contains_self(emb, query):
    got = _ids(lsh_bucket_topk(emb, query, k=5, n_planes=8, probe_bits=1))
    exact_top1 = _ids(cosine_topk(emb, query, k=1))[0]
    assert exact_top1 in got


def test_banded_near_dup_finds_planted_pairs_no_crossjoin(emb, spark):
    from pyspark.sql import functions as F

    from miletos_spark.pipeline.similarity import lsh_band_near_dup_pairs

    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select("vec_id", v.alias("embedding"))
    planted = base.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x + F.lit(0.01)).alias(
            "embedding"
        ),
    )
    pairs = lsh_band_near_dup_pairs(
        base.unionByName(planted), dim=64, threshold=0.9
    )
    # exactly the 10 planted (i, i+1000) pairs; random pairs sit ~0.5
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(i, i + 1000) for i in range(10)}
    # scale contract: candidate generation is a bucketed equi-join,
    # never a cartesian/nested-loop product
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
