"""Offline BPE merge-table trainer (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units" — the classic
count-and-merge loop). Run ONCE against a corpus sample; paste the
printed literal into `miletos_spark.pipeline.text.BPE_MERGES`. The
merge table is FROZEN so the distributed encoder (pure string
`replace` chain, see `bpe_render`) and its DuckDB oracle replay are
byte-identical — training is deliberately driver-side and offline,
exactly like shipping a tokenizer.json with a model.

Usage: python tools/train_bpe.py [parquet_path] [n_merges]
"""

from __future__ import annotations

import sys
from collections import Counter


def train(texts: "list[str]", n_merges: int) -> "list[tuple[str, str]]":
    # word frequency over lowercased whitespace tokens
    wf: Counter = Counter()
    for t in texts:
        for w in t.lower().split():
            wf[w] += 1
    # each word as a tuple of symbols (chars initially)
    words = {w: tuple(w) for w in wf}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            f = wf[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # deterministic: max count, ties by pair text
        (a, b), cnt = max(
            pairs.items(), key=lambda kv: (kv[1], kv[0])
        )
        if cnt < 2:
            break
        merges.append((a, b))
        merged = a + b
        new_words = {}
        for w, syms in words.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    return merges


if __name__ == "__main__":
    import duckdb

    path = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/testdata/sf0.01/documents.parquet"
    )
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    texts = [
        r[0]
        for r in duckdb.execute(
            f"SELECT text FROM read_parquet('{path}')"
        ).fetchall()
    ]
    merges = train(texts, n)
    print("BPE_MERGES: tuple[tuple[str, str], ...] = (")
    for a, b in merges:
        print(f"    ({a!r}, {b!r}),")
    print(")")
    alphabet = sorted({c for t in texts for w in t.lower().split() for c in w})
    print()
    print("BPE_ALPHABET: tuple[str, ...] = (")
    for i in range(0, len(alphabet), 12):
        print("    " + " ".join(f"{c!r}," for c in alphabet[i:i + 12]))
    print(")")
