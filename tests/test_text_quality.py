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


def test_scrub_pii_crafted_and_idempotent(spark):
    from miletos_spark.pipeline.text import scrub_pii

    rows = [
        (0, "mail a.b-c%d@sub.example.co.uk now"),
        (1, "ssn 078-05-1120 phone 555-123-4567 and 555.123.4567"),
        (2, "ip 192.168.0.1 not 1234.5.6.7890 ver 1.2.3"),
        (3, "clean text with no pii at all"),
        (4, "user@x.io and 10.0.0.1 and 078-05-1120"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in scrub_pii(df).collect()}
    assert got[0]["n_email"] == 1 and "<EMAIL>" in got[0]["text_scrubbed"]
    assert got[1]["n_ssn"] == 1 and got[1]["n_phone"] == 2
    # 1234.5.6.7890: no 4-octet IPv4 inside (word boundaries);
    # 1.2.3 is not 4 octets either
    assert got[2]["n_ipv4"] == 1
    assert got[2]["text_scrubbed"] == "ip <IP> not 1234.5.6.7890 ver 1.2.3"
    assert got[3] == {
        "doc_id": 3, "text_scrubbed": rows[3][1],
        "n_email": 0, "n_ssn": 0, "n_phone": 0, "n_ipv4": 0,
    }
    assert got[4]["n_email"] == 1 and got[4]["n_ipv4"] == 1
    assert got[4]["n_ssn"] == 1
    # idempotence: scrubbing scrubbed text finds nothing more
    again = scrub_pii(
        spark.createDataFrame(
            [(k, v["text_scrubbed"]) for k, v in got.items()],
            "doc_id long, text string",
        )
    ).collect()
    for r in again:
        assert r["n_email"] + r["n_ssn"] + r["n_phone"] + r["n_ipv4"] == 0


def test_quality_classifier_crafted(spark):
    from miletos_spark.pipeline.text import quality_classifier

    rows = [
        (0, "a decent length document " * 10),   # long clean -> keep
        (1, "x"),                                 # one tiny token
        (2, "!!! ### $$$ %%% ^^^ &&&"),           # all punctuation
        (3, "1234 5678 9012 3456"),               # all digits
        (4, ""),                                  # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in quality_classifier(df).collect()}
    assert got[0]["keep"] is True and got[0]["logit"] > 0
    assert got[2]["keep"] is False   # punct weight dominates
    assert got[3]["keep"] is False   # digit weight dominates
    # empty text: all features 0 -> logit == bias
    assert got[4]["logit"] == -0.8 and got[4]["keep"] is False
    # keep is exactly the sign test
    for r in got.values():
        assert r["keep"] == (r["logit"] > 0)


def test_unigram_logprob_crafted(spark):
    import math

    from miletos_spark.pipeline.text import unigram_logprob

    # corpus: counts a:3 b:2 c:1 -> N=6, V=3, p(t) = (cnt+1)/9
    rows = [(0, "a a b"), (1, "a b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    pa, pb, pc = 4 / 9, 3 / 9, 2 / 9
    want0 = 2 * math.log(pa) + math.log(pb)
    want1 = math.log(pa) + math.log(pb) + math.log(pc)
    assert got[0]["n_tokens"] == 3 and got[1]["n_tokens"] == 3
    assert abs(got[0]["logprob"] - want0) < 1e-12
    assert abs(got[1]["logprob"] - want1) < 1e-12
    # the repeated-common-token doc is more in-distribution
    assert got[0]["logprob"] > got[1]["logprob"]
    # external vocab: OOV tokens get the (0+1)/(N+V) floor
    voc = spark.createDataFrame([("a", 3)], "tok string, cnt long")
    ext = {
        r["doc_id"]: r["logprob"]
        for r in unigram_logprob(df, vocab=voc).collect()
    }
    w0 = 2 * math.log(4 / 4) + math.log(1 / 4)
    assert abs(ext[0] - w0) < 1e-12


def test_chunk_documents_windows(spark):
    from miletos_spark.pipeline.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    rows = [(0, words), (1, "solo"), (2, ""), (3, "   ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=4, overlap=2).collect()
    by = {}
    for r in out:
        by.setdefault(r["doc_id"], []).append(r)
    # doc 0: 10 tokens, step 2 -> starts 0,2,4,6,8
    got0 = sorted(by[0], key=lambda r: r["chunk_idx"])
    assert [r["start_tok"] for r in got0] == [0, 2, 4, 6, 8]
    assert [r["n_tok_chunk"] for r in got0] == [4, 4, 4, 4, 2]
    assert got0[0]["chunk_text"] == "w0 w1 w2 w3"
    assert got0[1]["chunk_text"] == "w2 w3 w4 w5"   # overlap of 2
    assert got0[4]["chunk_text"] == "w8 w9"          # short tail
    # single-token doc: one chunk
    assert len(by[1]) == 1 and by[1][0]["chunk_text"] == "solo"
    # empty / whitespace-only docs: no chunks
    assert 2 not in by and 3 not in by


def test_unigram_logprob_size_gated_join_paths_agree(spark):
    """The broadcast and shuffle join strategies must be numerically
    IDENTICAL (same plan semantics, different physical join); the
    size gate flips to shuffle when the vocab exceeds the threshold."""
    from miletos_spark.pipeline.text import unigram_logprob

    rows = [(i, f"tok{i % 7} common tok{(i + 1) % 5} common") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bc = {r["doc_id"]: r.asDict() for r in
          unigram_logprob(df, broadcast=True).collect()}
    sh = {r["doc_id"]: r.asDict() for r in
          unigram_logprob(df, broadcast=False).collect()}
    assert bc == sh
    # gate: a 1-entry threshold forces the shuffle path (same answer)
    gated = {r["doc_id"]: r.asDict() for r in
             unigram_logprob(df, broadcast_threshold=1).collect()}
    assert gated == bc


def test_bigram_logprob_stupid_backoff(spark):
    """Hand-checked stupid backoff on a 2-doc corpus: seen bigrams use
    raw count ratios, unseen ones pay ln(alpha) over the add-one
    unigram model, doc-initial tokens score as plain unigrams; the
    broadcast and shuffle paths agree."""
    import math

    from miletos_spark.pipeline.text import bigram_logprob

    # corpus: doc0 = "a b a b", doc1 = "b a x"
    # unigrams: a=3 b=3 x=1, N=7, V=3
    # bigrams:  (a,b)=2 (b,a)=2 (a,x)=1
    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "b a x")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r.asDict() for r in bigram_logprob(df).collect()}
    p1 = {"a": math.log(4 / 10), "b": math.log(4 / 10),
          "x": math.log(2 / 10)}
    # doc0: p1(a) + ln(2/3) [a b] + ln(2/3) [b a] + ln(2/3) [a b]
    want0 = p1["a"] + 3 * math.log(2 / 3)
    assert abs(out[0]["logprob"] - want0) < 1e-12
    assert out[0]["n_bigram_hits"] == 3 and out[0]["n_backoff"] == 0
    # doc1: p1(b) + ln(2/3) [b a] + ln(1/3) [a x]
    want1 = p1["b"] + math.log(2 / 3) + math.log(1 / 3)
    assert abs(out[1]["logprob"] - want1) < 1e-12
    assert out[1]["n_bigram_hits"] == 2 and out[1]["n_backoff"] == 0
    # self-trained = every bigram seen; an EXTERNAL model (the CCNet
    # shape) is what exercises backoff: score "x b" under the 2-doc
    # model above -> (x,b) unseen -> ln(alpha) + p1(b)
    df2 = spark.createDataFrame([(2, "x b")], "doc_id long, text string")
    out2 = {r["doc_id"]: r.asDict()
            for r in bigram_logprob(df2, model=df).collect()}
    assert out2[2]["n_backoff"] == 1 and out2[2]["n_bigram_hits"] == 0
    want2 = p1["x"] + math.log(0.4) + p1["b"]
    assert abs(out2[2]["logprob"] - want2) < 1e-12
    sh = {r["doc_id"]: r.asDict()
          for r in bigram_logprob(df2, model=df, broadcast=False).collect()}
    assert sh == out2


def _bpe_reference(text: str, merges) -> list:
    """Classic BPE apply loop (Sennrich et al. 2016): per word, apply
    each merge rule in table order until it no longer occurs."""
    out = []
    for w in text.lower().split():
        syms = list(w)
        for a, b in merges:
            i, cur = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    cur.append(a + b)
                    i += 2
                else:
                    cur.append(syms[i])
                    i += 1
            syms = cur
        out.extend(syms)
    return out


def test_bpe_matches_classic_apply_loop(spark):
    """The string-replace-chain encoder must be TOKEN-IDENTICAL to the
    classic per-word merge loop on real corpus text (the delimiter
    encoding exists precisely so one replace == one merge pass)."""
    from pyspark.sql import functions as F

    from miletos_spark.pipeline.text import BPE_MERGES, bpe_tokens

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(100)
    got = {
        r["doc_id"]: r["toks"]
        for r in docs.select(
            "doc_id", bpe_tokens(F.col("text")).alias("toks")
        ).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        assert got[r["doc_id"]] == _bpe_reference(r["text"], BPE_MERGES), (
            r["doc_id"]
        )


def test_bpe_roundtrip_and_counts(spark):
    """Tokens must partition the non-whitespace chars of lower(text)
    (no char lost or duplicated by the merge chain), the count column
    must equal the token-array size, and repeated-pair inputs (the
    'aaaa' adjacency trap) must merge leftmost-first like BPE."""
    from pyspark.sql import functions as F

    from miletos_spark.pipeline.text import bpe_token_count, bpe_tokens

    rows = [
        (0, "Hash JOIN hash join HASHJOIN"),
        (1, "aaaa erer InInIn"),          # adjacent-merge stress
        (2, ""),
        (3, "   "),
        (4, "x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id",
            "text",
            bpe_tokens(F.col("text")).alias("toks"),
            bpe_token_count(F.col("text")).alias("n"),
        ).collect()
    }
    for i, text in rows:
        assert "".join(out[i]["toks"]) == "".join(text.lower().split())
        assert out[i]["n"] == len(out[i]["toks"])
    from miletos_spark.pipeline.text import BPE_MERGES

    for i, text in rows:
        assert out[i]["toks"] == _bpe_reference(text, BPE_MERGES)


def test_bpe_delimiter_injection_is_sanitized(spark):
    """Adversarial input carrying the encoder's own control-char
    delimiters must not forge unit boundaries — it tokenizes exactly
    like the text with those chars stripped."""
    from pyspark.sql import functions as F

    from miletos_spark.pipeline.text import bpe_tokens

    evil = "he\x1fllo wo\x1e\x1frld"
    clean = "hello world"
    df = spark.createDataFrame(
        [(0, evil), (1, clean)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["toks"]
        for r in df.select(
            "doc_id", bpe_tokens(F.col("text")).alias("toks")
        ).collect()
    }
    assert got[0] == got[1]


def test_bpe_token_ids_roundtrip_and_oov(spark):
    """Frozen-vocab id encoding: every in-alphabet token maps to its
    frozen id (alphabet first, merges after, in order), OOV chars map
    to 0, and the id sequence length equals the token count. The
    corpus's own chars are all in-alphabet by construction (the
    alphabet was trained on it), so OOV is exercised with crafted
    input here."""
    from pyspark.sql import functions as F

    from miletos_spark.pipeline.text import (
        bpe_token_ids,
        bpe_tokens,
        bpe_vocab,
    )

    vocab = bpe_vocab()
    df = spark.createDataFrame(
        [(0, "scan batch 42 x!z"), (1, "")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["toks"], r["ids"])
        for r in df.select(
            "doc_id",
            bpe_tokens(F.col("text")).alias("toks"),
            bpe_token_ids(F.col("text")).alias("ids"),
        ).collect()
    }
    toks, ids = got[0]
    assert len(toks) == len(ids)
    for t, i in zip(toks, ids):
        assert i == vocab.get(t, 0), (t, i)
    # '4', '2', 'x', '!', 'z' are outside the frozen alphabet -> 0
    assert ids.count(0) == sum(1 for t in toks if t not in vocab) >= 5
    assert got[1] == ([], [])


def test_trigram_logprob_backoff_chain(spark):
    """Hand-checked full stupid-backoff chain: trigram hit, bigram-level
    backoff (alpha * c2/c1), unigram-level backoff (alpha^2 * p1 at the
    trigram position; alpha * p1 at a bigram position), doc-initial
    fall-through, and single-token docs."""
    import math

    from miletos_spark.pipeline.text import trigram_logprob

    # model corpus: "a b c a b c" ->
    #   uni: a2 b2 c2, N=6, V=3; p1(t)=(c+1)/9
    #   bi:  (a,b)=2 (b,c)=2 (c,a)=1
    #   tri: (a,b,c)=2 (b,c,a)=1 (c,a,b)=1
    model = spark.createDataFrame(
        [(0, "a b c a b c")], "doc_id long, text string"
    )
    la = math.log(0.4)
    p1 = {t: math.log(3 / 9) for t in "abc"}
    p1["x"] = math.log(1 / 9)
    score = spark.createDataFrame(
        [(1, "a b c"), (2, "b b c"), (3, "a b x"), (4, "a")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in trigram_logprob(score, model=model).collect()
    }
    # doc1: p1(a) + S(b|a)=ln(2/2) + tri (a,b,c): ln(2/2)
    want1 = p1["a"] + math.log(2 / 2) + math.log(2 / 2)
    assert abs(out[1]["logprob"] - want1) < 1e-12
    assert out[1]["n_trigram_hits"] == 1
    # doc2: p1(b) + S(b|b): (b,b) unseen -> la + p1(b);
    #   (b,b,c) unseen, (b,c) seen -> la + ln(c2(b,c)/c1(b)) = la + ln(2/2)
    want2 = p1["b"] + (la + p1["b"]) + (la + math.log(2 / 2))
    assert abs(out[2]["logprob"] - want2) < 1e-12
    assert out[2]["n_bigram_backoff"] == 1 and out[2]["n_unigram_backoff"] == 1
    # doc3: p1(a) + S(b|a) + (a,b,x) unseen, (b,x) unseen -> la+la+p1(x)
    want3 = p1["a"] + math.log(2 / 2) + (la + la + p1["x"])
    assert abs(out[3]["logprob"] - want3) < 1e-12
    # single-token doc
    assert abs(out[4]["logprob"] - p1["a"]) < 1e-12
    assert out[4]["n_tokens"] == 1
    # join-path equality
    sh = {r["doc_id"]: r.asDict()
          for r in trigram_logprob(score, model=model,
                                   broadcast=False).collect()}
    assert sh == out


def test_bpe_lossless_roundtrip_edges(spark):
    """decode(encode(t)) == normalized t on OOV chars (digits, punct,
    x/z outside the frozen alphabet), empty docs, repeated whitespace
    — and (r9) on MULTI-BYTE Unicode, where each OOV char expands to
    one fallback id per UTF-8 byte and the decode reassembles the
    bytes before the single final UTF-8 decode."""
    from pyspark.sql import functions as F

    from miletos_spark.pipeline.text import (
        bpe_decode_ids,
        bpe_token_ids_lossless,
    )

    df = spark.createDataFrame(
        [
            (1, "The quick  BROWN fox! 123 xyzzy"),
            (2, ""),
            (3, "   "),
            (4, "zebra x-ray\tmixed\nlines"),
            (5, "plain words the model saw"),
            (6, "naïve café über —dash"),
            (7, "日本語 テスト €99 ßharp"),
        ],
        "doc_id long, text string",
    )
    ids = bpe_token_ids_lossless(F.col("text"))
    norm = F.array_join(
        F.filter(
            F.split(
                F.lower(F.trim(F.regexp_replace("text", "[\x1f\x1e]", ""))),
                r"\s+",
            ),
            lambda w: F.length(w) > 0,
        ),
        " ",
    )
    bad = df.select(
        (bpe_decode_ids(ids) == norm).alias("ok")
    ).filter(~F.col("ok"))
    assert bad.count() == 0
    # the fallback range is the FIXED 256-entry byte range — no id may
    # exceed BPE_BYTE_BASE+255 regardless of input codepoints (the r8
    # codepoint scheme violated this on non-Latin-1 text)
    mx = df.select(F.array_max(ids).alias("m")).agg(F.max("m")).first()[0]
    assert mx is not None and mx <= 1255


def test_quality_funnel_matches_python_reference(spark):
    """quality_funnel vs a from-scratch replay of first-failing-rule
    attribution on a corpus crafted to hit every rule."""
    from miletos_spark.pipeline.text import apply_funnel, quality_funnel

    rows = [
        (0, "too short"),                                      # min_tokens
        (1, " ".join("w%d" % i for i in range(95))),           # max_tokens
        (2, "the " + " ".join(["lengthy"] * 30)),              # word_len (7.0 > 4.9) -> repetition? word_len fires first
        (3, " ".join("u%d" % i for i in range(40))),           # stopwords (0 stop hits)
        (4, "the " + " ".join("v%d" % i for i in range(10))
            + " spam" * 29),                                   # repetition
        (5, "the cat sat on a mat " * 5 + "and it was fine"),  # kept
        (6, "of all red dots " + " ".join("k%d" % i for i in range(30))),  # kept
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    stop = {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was"}

    def dropped(text):
        w = [x for x in text.lower().strip().split() if x]
        n = len(w)
        mwl = sum(len(x) for x in w) / n if n else 0.0
        stopf = sum(1 for x in w if x in stop) / max(n, 1)
        tops = max((w.count(d) for d in set(w)), default=0) / n if n else 0.0
        if not n >= 20:
            return "min_tokens"
        if not n <= 90:
            return "max_tokens"
        if not mwl <= 4.9:
            return "word_len"
        if not stopf >= 0.02:
            return "stopwords"
        if not tops <= 0.15:
            return "repetition"
        return None

    tags = [dropped(t) for _, t in rows]
    names = ["min_tokens", "max_tokens", "word_len", "stopwords", "repetition"]
    expect, n_in = [], len(rows)
    for i, nm in enumerate(names):
        d = tags.count(nm)
        expect.append((i, nm, n_in, d, n_in - d))
        n_in -= d

    got = [
        (r["rule_idx"], r["rule"], r["n_in"], r["n_dropped"], r["n_out"])
        for r in quality_funnel(docs).orderBy("rule_idx").collect()
    ]
    assert got == expect
    # every rule must actually fire on this corpus, and some docs survive
    assert all(e[3] >= 1 for e in expect)
    assert expect[-1][4] >= 1

    kept = {r["doc_id"] for r in apply_funnel(docs).collect()}
    assert kept == {i for i, (di, t) in enumerate(rows) if dropped(t) is None}
    assert len(kept) == expect[-1][4]


def test_quality_funnel_by_group_consistency(spark):
    """Per-group funnels must sum to the global funnel, conserve rows
    within each group, and chain (rule i's n_out == rule i+1's n_in)."""
    from miletos_spark.pipeline.text import quality_funnel

    rows = []
    for i in range(30):
        lang = ["en", "de", "fr"][i % 3]
        if i % 5 == 0:
            rows.append((i, lang, "tiny"))
        elif i % 5 == 1:
            rows.append((i, lang, " ".join("w%d" % j for j in range(95))))
        else:
            rows.append(
                (i, lang, "the cat sat on mat " + " ".join(
                    "x%d" % j for j in range(20)))
            )
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])

    per = quality_funnel(docs, group_col="lang").collect()
    glob = {
        r["rule_idx"]: (r["n_in"], r["n_dropped"], r["n_out"])
        for r in quality_funnel(docs).collect()
    }
    by_rule = {}
    by_group = {}
    for r in per:
        by_rule.setdefault(r["rule_idx"], [0, 0, 0])
        for j, c in enumerate(("n_in", "n_dropped", "n_out")):
            by_rule[r["rule_idx"]][j] += r[c]
        by_group.setdefault(r["lang"], {})[r["rule_idx"]] = (
            r["n_in"], r["n_dropped"], r["n_out"]
        )
    assert {k: tuple(v) for k, v in by_rule.items()} == glob
    for lang, chain in by_group.items():
        for i in range(4):
            assert chain[i][2] == chain[i + 1][0], (lang, i)
            assert chain[i][0] == chain[i][1] + chain[i][2], (lang, i)
