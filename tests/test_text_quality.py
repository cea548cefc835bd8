"""Text-quality operators on crafted documents (the synthetic corpus
has near-zero natural repetition, so the oracle round-trip alone can't
distinguish a broken repetition rule from a clean corpus)."""

from miletos_spark.pipeline.text import doc_repetition


def test_doc_repetition_known_fractions(spark):
    docs = spark.createDataFrame(
        [
            # 4 lines, "spam spam" duplicated twice (4+4=8 chars of 26
            # non-empty line chars); bigrams of "a b a b a" = 4, top
            # ("a b") = 2
            (1, "spam spam\nreal line one\nspam spam\nxyz"),
            (2, "a b a b a"),
            (3, "single"),          # 1 word: no bigrams, no dup lines
            (4, "  \n  "),          # whitespace only: 0 lines
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in doc_repetition(docs).collect()}
    assert set(got) == {1, 2, 3, 4}

    r1 = got[1]
    assert r1["n_lines"] == 4
    tot = len("spam spam") * 2 + len("real line one") + len("xyz")
    assert abs(r1["dup_line_frac"] - (18 / tot)) < 1e-12
    r2 = got[2]
    assert r2["n_lines"] == 1
    assert abs(r2["top_bigram_frac"] - 2 / 4) < 1e-12
    assert got[3]["top_bigram_frac"] == 0.0
    assert got[3]["dup_line_frac"] == 0.0
    assert got[4]["n_lines"] == 0
    assert got[4]["dup_line_frac"] == 0.0
