"""Multimodal columns: image/audio/video as opaque `binary` payloads
with typed metadata, processed by Arrow-batched `mapInPandas` stages.

The Spark-side plumbing is real — schemas, partitioning, UDF
signatures, batch shapes — while the codec kernels are deterministic
fakes behind a clearly-marked seam (`_decode_bytes`): the container has
no image/audio libraries, and in production only that function body
changes (PIL/libav decode instead of byte-reshaping).

Design notes for 100 TB:
- payloads stay in the executor (never collected); a stage is one scan
  → mapInPandas → columnar write.
- decode output is a fixed-size `array<double>` feature/pixel block, so
  downstream ops (resize, feature extraction, embedding distance) are
  plain column math / Pandas-vectorized.
- `mapInPandas` (not applyInPandas): no grouping, no shuffle — each
  Arrow batch is decoded where it was read.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "n_frames int"
)


def synth_media(spark, n: int = 64, frame_px: int = 8) -> DataFrame:
    """Deterministic synthetic media table: payload bytes derived from
    md5(media_id) repeated to size — a stand-in for real encoded blobs
    with realistic per-row sizes (images: 1 frame; videos: 6 frames)."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 3 == 0, "video").otherwise("image").alias("kind"),
        F.lit(frame_px).alias("width"),
        F.lit(frame_px).alias("height"),
        F.when(F.col("id") % 3 == 0, 6).otherwise(1).alias("n_frames"),
    )
    frame_bytes = frame_px * frame_px
    # each md5-hex repeat yields 16 BYTES after to_binary (32 hex chars)
    n_rep = F.floor((F.col("n_frames") * frame_bytes + 15) / 16).cast("int")
    payload = F.to_binary(
        F.repeat(F.md5(F.col("media_id").cast("string")), n_rep), F.lit("hex")
    )
    return (
        df.withColumn("payload_full", payload)
        .withColumn(
            "payload",
            F.expr(f"substring(payload_full, 1, n_frames * {frame_bytes})"),
        )
        .select("media_id", "kind", "payload", "width", "height", "n_frames")
    )


def _decode_bytes(payload: bytes, width: int, height: int, n_frames: int) -> np.ndarray:
    """CODEC SEAM — deterministic fake decode: interpret the raw bytes
    as (n_frames, height, width) uint8 'pixels'. In production this is
    the only function that changes (real image/video decode)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    need = n_frames * height * width
    if len(arr) < need:
        arr = np.pad(arr, (0, need - len(arr)))
    return arr[:need].reshape(n_frames, height, width).astype(np.float64)


def decode_media(df: DataFrame) -> DataFrame:
    """Decode payloads to per-frame pixel blocks: one output row per
    (media_id, frame) with `pixels array<double>` (row-major)."""
    import pandas as pd

    out_schema = "media_id long, kind string, frame int, pixels array<double>"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                block = _decode_bytes(
                    r.payload, int(r.width), int(r.height), int(r.n_frames)
                )
                for f_idx in range(block.shape[0]):
                    rows.append(
                        (int(r.media_id), r.kind, f_idx,
                         block[f_idx].ravel().tolist())
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "frame", "pixels"]
            )

    return df.mapInPandas(decode, schema=out_schema)


def frame_sample(df: DataFrame, every_k: int = 2) -> DataFrame:
    """Keep every k-th frame of decoded video rows (images pass
    through) — pure filter, no UDF."""
    return df.filter(
        (F.col("kind") != "video") | (F.col("frame") % every_k == 0)
    )


def resize_pixels(df: DataFrame, src_px: int, factor: int = 2) -> DataFrame:
    """Block-mean downsample of the row-major pixel array by `factor`
    in both axes — pure higher-order column functions (no UDF): output
    pixel (i,j) = mean of the factor×factor source block."""
    dst = src_px // factor
    idx = F.sequence(F.lit(0), F.lit(dst * dst - 1))

    def mean_block(k):
        di = F.floor(k / dst)
        dj = k % dst
        total = F.lit(0.0)
        for a in range(factor):
            for b in range(factor):
                src_k = (di * factor + a) * src_px + (dj * factor + b)
                total = total + F.col("pixels").getItem(src_k.cast("int"))
        return total / (factor * factor)

    return df.withColumn("pixels_small", F.transform(idx, mean_block)).drop(
        "pixels"
    )


def phash_frames(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """64-bit perceptual hash (average-hash form) per decoded frame,
    as a 16-hex-char STRING: bit i = 1 iff pixel i exceeds the frame's
    mean brightness — the pHash family's thresholded-block scheme
    over the decoded 8×8 block (classic pHash thresholds DCT
    coefficients; the codec seam here yields pixel blocks, and the
    threshold-vs-frame-mean form keeps every comparison exact
    integer-vs-rational, so engines agree bit-for-bit).

    Nibble n packs bits 4n..4n+3 — the SAME hex packing as
    `dedup.simhash_md5`, so `simhash_hamming` and the banded join
    machinery apply to media fingerprints unchanged. The mean is
    projected to a real attribute first (the HOF-inlining trap), and
    the 64 bit-terms live in one projection, not a join filter (the
    64KB codegen lesson). Returns (id, kind, frame, phash_hex).

    Invariance note: a global brightness shift (+c on every pixel)
    moves the mean by exactly +c, so every bit — and the hash — is
    UNCHANGED: the standard aHash robustness argument, and why the
    planted jitter contract survives re-encode-style perturbations."""
    px = F.col("pixels")
    mean = F.aggregate(px, F.lit(0.0), lambda a, x: a + x) / F.size(px)
    d = df.select(
        F.col(id_col), "kind", "frame", "pixels", mean.alias("_mean")
    )
    hex_digits = "0123456789abcdef"
    chars = []
    for n in range(16):
        nib = None
        for j in range(4):
            term = F.when(
                F.element_at(px, 4 * n + j + 1) > F.col("_mean"),
                F.lit(1 << j),
            ).otherwise(0)
            nib = term if nib is None else nib + term
        chars.append(F.lit(hex_digits).substr(nib + F.lit(1), F.lit(1)))
    return d.select(
        F.col(id_col), "kind", "frame", F.concat(*chars).alias("phash_hex")
    )


def media_phash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "media_id",
) -> DataFrame:
    """Media near-dup pairs via the banded Hamming join — the
    multimodal twin of `dedup.simhash_band_pairs`, over per-frame
    pHashes instead of document SimHashes: fingerprints split into
    4 × 16-bit bands; by pigeonhole any pair at Hamming ≤ 3 agrees
    exactly on at least one band, so the band-equality self-join is a
    LOSSLESS candidate generator and the exact 64-bit Hamming verify
    (`simhash_hamming`, reused) filters false candidates. A trimmed
    re-upload (frames shifted by k) matches frame-by-frame at
    Hamming 0; a lightly re-encoded frame matches at small Hamming.

    Shuffle is on (band, 4-hex chunk) — bucketed, never all-pairs.
    Returns (id_a, frame_a, id_b, frame_b, hamming), id_a < id_b
    (cross-media pairs only: within-media frame similarity is a
    different question from dedup)."""
    from miletos_spark.pipeline.dedup import simhash_hamming

    fps = phash_frames(df, id_col=id_col).cache()
    banded = fps.select(
        F.col(id_col),
        "frame",
        "phash_hex",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.substring("phash_hex", 1 + 4 * b, 4).alias(
                            "chunk"
                        ),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "frame", "phash_hex", "bb.band", "bb.chunk")
    a = banded.select(
        "band", "chunk",
        F.col(id_col).alias("id_a"), F.col("frame").alias("frame_a"),
        F.col("phash_hex").alias("fp_a"),
    )
    b = banded.select(
        "band", "chunk",
        F.col(id_col).alias("id_b"), F.col("frame").alias("frame_b"),
        F.col("phash_hex").alias("fp_b"),
    )
    cands = (
        a.join(b, on=["band", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "frame_a", "id_b", "frame_b", "fp_a", "fp_b")
        .dropDuplicates(["id_a", "frame_a", "id_b", "frame_b"])
    )
    return (
        cands.withColumn(
            "hamming", simhash_hamming(F.col("fp_a"), F.col("fp_b"))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "frame_a", "id_b", "frame_b", "hamming")
    )


def media_features(df: DataFrame) -> DataFrame:
    """Per-frame feature extraction over the pixel block — aggregate
    HOFs only: mean/min/max brightness and RMS contrast."""
    px = F.col("pixels")
    n = F.size(px)
    mean = F.aggregate(px, F.lit(0.0), lambda a, x: a + x) / n
    sq = F.aggregate(px, F.lit(0.0), lambda a, x: a + x * x) / n
    return df.select(
        "media_id",
        "kind",
        "frame",
        mean.alias("brightness"),
        F.sqrt(F.greatest(sq - mean * mean, F.lit(0.0))).alias("contrast"),
        F.array_min(px).alias("px_min"),
        F.array_max(px).alias("px_max"),
    )
