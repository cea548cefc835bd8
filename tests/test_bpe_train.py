"""Distributed BPE trainer vs the offline reference trainer: the
on-cluster count-and-merge loop (`pipeline/bpe_train.py`) must produce
BYTE-EQUAL merge tables to `tools/train_bpe.py::train` on the same
corpus — same greedy sequence, same (count, pair) tie-break, same
min-count stop — because the frozen-table apply path (`bpe_render`
replace chain and its DuckDB oracle replay) assumes the table is
exactly what the sequential Sennrich loop yields."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

N_MERGES = 24


def _texts(spark, sf_dir):
    from miletos_spark.schema import load_table

    df = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    texts = [
        r["text"]
        for r in df.orderBy("doc_id").collect()
    ]
    return df, texts


def test_distributed_trainer_equals_offline_reference(spark, sf_dir):
    from train_bpe import train as train_offline

    from miletos_spark.pipeline.bpe_train import train_bpe

    df, texts = _texts(spark, sf_dir)
    want = train_offline(texts, N_MERGES)
    got = train_bpe(df, n_merges=N_MERGES)
    assert got == want


def test_size_gated_local_loop_equals_distributed(spark, sf_dir):
    """The r14 driver cutover: when the vocab fits the driver the
    merge loop runs locally over the collected Spark word table —
    forcing the distributed loop (collect_threshold=0) must learn the
    byte-identical table."""
    from miletos_spark.pipeline.bpe_train import train_bpe

    df, _ = _texts(spark, sf_dir)
    local = train_bpe(df, n_merges=N_MERGES)
    distributed = train_bpe(df, n_merges=N_MERGES, collect_threshold=0)
    assert local == distributed
    # min_count stop behaves identically on both paths
    assert train_bpe(df, n_merges=8, min_count=10**9) == []
    assert (
        train_bpe(df, n_merges=8, min_count=10**9, collect_threshold=0)
        == []
    )


def test_trainer_alphabet_equals_offline(spark, sf_dir):
    from miletos_spark.pipeline.bpe_train import alphabet

    df, texts = _texts(spark, sf_dir)
    want = sorted({c for t in texts for w in t.lower().split() for c in w})
    assert alphabet(df) == want


def test_trainer_min_count_stop(spark):
    """Pairs below min_count never merge (the offline `cnt < 2` stop):
    an all-unique-pairs corpus learns nothing at min_count=3."""
    from miletos_spark.pipeline.bpe_train import train_bpe

    df = spark.createDataFrame([("ab cd",), ("ef gh",)], ["text"])
    assert train_bpe(df, n_merges=8, min_count=3) == []


def test_batched_mode_yields_wellformed_table(spark, sf_dir):
    """merges_per_round>1 is the documented-approximate round-bounding
    mode: it may reorder vs sequential greedy, but every merge must
    still be derivable (each side is an alphabet char or a previously
    merged token) and the batch must never exceed n_merges."""
    from miletos_spark.pipeline.bpe_train import alphabet, train_bpe

    df, _ = _texts(spark, sf_dir)
    merges = train_bpe(df, n_merges=12, merges_per_round=4)
    assert 0 < len(merges) <= 12
    known = set(alphabet(df))
    for a, b in merges:
        assert a in known and b in known, (a, b)
        known.add(a + b)


def test_trained_table_drives_the_frozen_apply_path(spark, sf_dir):
    """Handoff: a freshly trained table plugs straight into
    `bpe_tokens`, and the resulting tokenization round-trips the
    non-whitespace chars of lower(text) — the same invariant the
    frozen-table queries rely on."""
    from miletos_spark.pipeline.bpe_train import train_bpe
    from miletos_spark.pipeline.text import bpe_tokens

    df, _ = _texts(spark, sf_dir)
    merges = tuple(train_bpe(df, n_merges=N_MERGES))
    got = df.select(
        "doc_id",
        F.array_join(bpe_tokens(F.col("text"), merges), "").alias("joined"),
        F.regexp_replace(F.lower("text"), r"\s+", "").alias("want"),
    )
    bad = got.filter(F.col("joined") != F.col("want")).count()
    assert bad == 0


# --- production encoder vs the frozen replace chain ------------------------


def _chain_tokens(df):
    from miletos_spark.pipeline.text import bpe_tokens

    return df.select(
        "doc_id",
        F.array_join(bpe_tokens(F.col("text")), " ").alias("tokens"),
    )


def test_production_encoder_equals_replace_chain_on_frozen_table(
    spark, sf_dir
):
    """The merge-count-bounded encoder (lowest-rank-pair loop) must
    tokenize EXACTLY like the sequential replace chain on the frozen
    table — the equivalence argued in its docstring, checked on the
    full corpus."""
    from miletos_spark.pipeline.text import bpe_encode_production

    df, _ = _texts(spark, sf_dir)
    j = (
        _chain_tokens(df)
        .withColumnRenamed("tokens", "want")
        .join(bpe_encode_production(df), "doc_id")
    )
    assert j.filter(F.col("want") != F.col("tokens")).count() == 0
    assert j.count() == df.count()


def test_production_encoder_overlap_and_injection_cases(spark):
    """Adversarial parity: overlapping merge sites ('aaaa' under a
    learned (a,a) rule must merge left-to-right non-overlapping in
    both paths) and delimiter control chars in the input (both paths
    strip them)."""
    from miletos_spark.pipeline.bpe_train import train_bpe
    from miletos_spark.pipeline.text import bpe_encode_production, bpe_tokens

    rows = [
        (0, "aaaa aaa aa"),
        (1, "abab ab ba bab"),
        (2, "aa\x1fbb \x1ea ab"),
        (3, "  aa   ab\tba  "),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = tuple(train_bpe(df, n_merges=6, min_count=1))
    assert merges  # the probe is vacuous if nothing was learned
    want = df.select(
        "doc_id",
        F.array_join(bpe_tokens(F.col("text"), merges), " ").alias("want"),
    )
    got = bpe_encode_production(df, merges=merges)
    j = want.join(got, "doc_id")
    bad = j.filter(F.col("want") != F.col("tokens")).collect()
    assert bad == []
