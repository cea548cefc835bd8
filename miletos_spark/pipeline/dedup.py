"""Deduplication operators over a `documents(doc_id, text, ...)` table.

Exact dedup is a hash-groupBy (one shuffle on a 128-bit digest — at
100 TB this is the canonical map-side-combine pattern). Near-dup comes
in three flavors mirroring standard large-corpus practice:

- MinHash + LSH: shingle → k minhashes → band into b buckets →
  self-join on (band, bucket-hash) → candidate pairs. The join key is
  the band hash, so the shuffle is on small keys and candidate
  verification happens only within buckets (no all-pairs blowup).
- SimHash: 64-bit fingerprint; near-dups share most bits — banded
  equality join on 4×16-bit chunks finds ≤k-bit-distance candidates.
- N-gram Jaccard: exact verification kernel for candidate pairs.

All hashing uses xxhash64/crc32 (Spark built-ins, JVM-side); no Python
in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = False,
) -> DataFrame:
    """Group identical texts by md5 digest; keep the lowest id as the
    canonical representative. Returns (text_hash, n_dups, keep_id)."""
    txt = F.col(text_col)
    if normalize:
        txt = F.lower(F.regexp_replace(txt, r"\s+", " "))
    return (
        df.select(F.md5(txt).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
    )


def shingle_array(df: DataFrame, text_col: str = "text", k: int = 5) -> DataFrame:
    """Add a distinct character-k-gram shingle array column."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    n = F.length(norm)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    sh = F.array_distinct(F.transform(idx, lambda i: F.substr(norm, i, F.lit(k))))
    return df.withColumn("shingles", sh)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 9,
    num_hashes: int = 32,
    partitions: int | None = None,
) -> DataFrame:
    """MinHash signature per document. Returns (id, sig ARRAY<BIGINT>).

    Cost model: string hashing dominates, so each shingle is xxhash64'd
    exactly ONCE; the `num_hashes` families are derived by affine mixing
    (odd multiplier + offset over Z/2^64 — the standard universal-hash
    trick), which is a multiply-add per shingle instead of a rehash.
    All JVM-side: min-aggregation runs inside `F.transform` over the
    per-row hash array, so no shuffle until the LSH band join.

    Small inputs arrive as one parquet task; `partitions` (default
    defaultParallelism) spreads the CPU-bound projection first.
    """
    import random

    # Universal hashing ((a*h + b) mod p, p = 2^31-1): the modular wrap
    # is what de-correlates the families — a plain affine map is
    # monotonic and every slot would pick the same argmin shingle.
    # 32-bit domain keeps products under 2^63 (Spark 4 ANSI mode throws
    # on long overflow).
    MERSENNE = (1 << 31) - 1
    rng = random.Random(42)
    params = [
        (rng.randrange(1, MERSENNE), rng.randrange(MERSENNE))
        for _ in range(num_hashes)
    ]
    if partitions is None:
        partitions = df.sparkSession.sparkContext.defaultParallelism
    with_sh = shingle_array(df.repartition(partitions), text_col=text_col, k=k)
    base = with_sh.select(
        F.col(id_col),
        F.transform("shingles", lambda s: F.xxhash64(s)).alias("_h"),
    )
    def mix(a: int, b: int):
        return lambda h: F.pmod(
            h.bitwiseAND(F.lit(0xFFFFFFFF)) * F.lit(a) + F.lit(b), F.lit(MERSENNE)
        )

    sigs = F.array(
        *[F.array_min(F.transform("_h", mix(a, b))) for a, b in params]
    )
    return base.select(F.col(id_col), sigs.alias("sig"))


def minhash_lsh_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 8,
) -> DataFrame:
    """LSH: split the signature into `bands` rows-per-band chunks; docs
    sharing any band chunk are candidates. Returns distinct (id_a, id_b)
    with id_a < id_b.

    Shuffle is on (band, band_hash) — bucket sizes are data-dependent
    but bounded by real duplication; AQE skew-join covers hot buckets.
    """
    n = sigs.select(F.size("sig")).first()[0]
    rows_per_band = n // bands
    banded = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bhash")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, on=["band", "bhash"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def simhash_64(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """64-bit SimHash over whitespace tokens: for each bit position,
    sum +1/−1 votes weighted by token hash bits; fingerprint bit = sign.

    Pure column expressions: token array → per-bit vote via
    aggregate(); no UDF, no shuffle.
    """
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    h = F.transform(toks, lambda t: F.xxhash64(t))
    fp = F.lit(0).cast("long")
    for bit in range(64):
        vote = F.aggregate(
            h,
            F.lit(0),
            lambda acc, x, b=bit: acc
            + F.when(F.shiftright(x, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        # bit 63 is the two's-complement sign bit of the LongType fingerprint
        weight = F.lit(-(2**63) if bit == 63 else 2**bit).cast("long")
        fp = fp + F.when(vote > 0, weight).otherwise(F.lit(0).cast("long"))
    return df.select(F.col(id_col), fp.alias("simhash"))


def near_dup_pairs_bruteforce(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 9,
) -> DataFrame:
    """Exact all-pairs character-k-gram Jaccard ≥ threshold — the
    ground-truth near-dup detector (O(n²); the verification oracle for
    the MinHash-LSH scale path, and usable directly for small corpora).
    Returns (id_a, id_b, jaccard)."""
    sh = shingle_array(df, text_col=text_col, k=k).select(
        F.col(id_col), F.col("shingles")
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 9,
) -> DataFrame:
    """Exact Jaccard similarity on character-k-gram sets for candidate
    (id_a, id_b) pairs: |A∩B| / |A∪B| via array_intersect/array_union.
    The candidate table is the small side — broadcast both lookups."""
    sh = shingle_array(df, text_col=text_col, k=k).select(
        F.col(id_col), F.col("shingles")
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .select("id_a", "id_b", "jaccard")
    )
