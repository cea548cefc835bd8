"""Deterministic corpus sampling for training-data mixing.

Temperature-based mixture reweighting (the Pile / Gopher recipe: group
probabilities are flattened with an exponent alpha < 1 so rare
languages / sources are upsampled relative to their natural share)
implemented as a pure column-expression filter — no RNG, no shuffle
beyond one tiny group-count aggregate that is broadcast back.

The per-row keep decision is a deterministic hash threshold:
``u(doc_id) = md5(doc_id)[:8] / 2**32`` gives an exact dyadic rational
in [0, 1) that any engine reproduces bit-for-bit, so the sample is
stable across runs, engines, and cluster sizes (the property an
incremental 100 TB curation pipeline needs: re-running never churns
the sampled set). Reference scope: the corpus-curation ops are
beyond-reference additions (no miletos counterpart); the deterministic
hash-thinning idiom mirrors the posterior subsample hash thinning
(plans/driver_queries.py T5).

Scale notes: the only aggregation is one count per group (|groups| ~
hundreds of languages/sources at worst) joined back with an explicit
broadcast; the keep filter is whole-stage-codegen'd and applied at
scan time, so the sampled write streams at full parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TWO_32 = 4294967296.0  # 2**32; u = first-8-hex-nibbles / 2**32


def hash_uniform(id_col: Column) -> Column:
    """Deterministic uniform in [0, 1): the first 8 hex nibbles of
    md5(id) as an exact 32-bit dyadic rational. Exactly reproducible
    in any engine with md5 (DuckDB oracle: strpos nibble sum)."""
    k = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
    return k.cast("long") / F.lit(TWO_32)


def group_keep_fractions(
    df: DataFrame,
    group_col: str = "lang",
    alpha: float = 0.5,
    keep_frac: float = 0.3,
) -> DataFrame:
    """Per-group keep fraction for temperature-``alpha`` mixing:

        f_g = min(1, keep_frac * (N / N_g) ** (1 - alpha))

    alpha=1 keeps the natural mixture (f_g = keep_frac everywhere);
    alpha=0 equalizes groups; alpha=0.5 (the default, and the pinned
    registry value) makes the exponent 0.5 so the whole recipe is
    sqrt/div/mul — all IEEE correctly-rounded, hence bit-identical in
    Spark and the DuckDB oracle. The fraction is rounded to 6 decimals
    BEFORE thresholding in both engines (memory: quantize-vs-round
    ties), so the kept set is engine-exact.

    Returns (group_col, n_grp, keep_frac_grp)."""
    counts = df.groupBy(group_col).agg(F.count("*").alias("n_grp"))
    total = counts.agg(F.sum("n_grp").alias("n_total"))
    expo = 1.0 - alpha
    ratio = F.col("n_total").cast("double") / F.col("n_grp")
    factor = F.sqrt(ratio) if expo == 0.5 else F.pow(ratio, F.lit(expo))
    return counts.crossJoin(F.broadcast(total)).select(
        group_col,
        "n_grp",
        F.round(
            F.least(F.lit(1.0), F.lit(keep_frac) * factor), 6
        ).alias("keep_frac_grp"),
    )


def mixture_sample(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    keep_frac: float = 0.3,
) -> DataFrame:
    """Deterministically sample ``df`` to a temperature-``alpha``
    mixture over ``group_col``: keep a row iff its hash uniform falls
    below the group's keep fraction. Returns the kept rows with
    ``n_grp`` / ``keep_frac_grp`` attached (the plan is scan → one
    tiny agg → broadcast hash join → codegen filter)."""
    fracs = group_keep_fractions(df, group_col, alpha=alpha, keep_frac=keep_frac)
    u = hash_uniform(F.col(id_col))
    return (
        df.join(F.broadcast(fracs), group_col)
        .withColumn("u", u)
        .filter(F.col("u") < F.col("keep_frac_grp"))
        .drop("u")
    )


def assign_splits(
    df: DataFrame,
    weights: "Sequence[tuple[str, int]]" = (
        ("train", 8), ("val", 1), ("test", 1),
    ),
    id_col: str = "doc_id",
    group_col: str | None = None,
    bucket_count: int | None = None,
) -> DataFrame:
    """Deterministic train/val/test split assignment (the dataset-
    versioning primitive every training pipeline needs: a document's
    split must never change when the corpus grows or the job reruns).

    Two modes sharing one integer-exact rule:

    - ``group_col=None`` (the 100 TB default): split by the md5 hash
      uniform alone — pure codegen scan, no shuffle, and membership is
      a function of the id only, so it is stable under corpus growth
      (new docs slot into splits without moving old ones).
    - ``group_col`` given (exact stratified mode): rank rows within
      each stratum by (hash, id) and cut the ranking at integer
      boundaries, giving EXACT per-stratum proportions. Plain form:
      one window per stratum — a per-stratum SORT in one task, fine
      while strata are small. ``bucket_count=B`` switches to the
      distributed two-pass rank (the gap-sessionization prefix-sum
      trick): bucket rows by the hash value itself (order-preserving),
      count per (stratum, bucket), broadcast the cumulative offsets,
      and rank inside (stratum, bucket) windows bounded by ~|stratum|/B
      — BIT-IDENTICAL ranks (equal hashes land in the same bucket, so
      the (hash, id) tiebreak order is preserved), asserted in
      tests/test_sampling_packing.py. At 100 TB a lang stratum is
      billions of rows: use B ~ rows/10M.

    Weights are INTEGERS (e.g. 8/1/1 = 80/10/10): boundaries are pure
    integer comparisons (`rank * W <= n * cum_w`, no float fraction
    anywhere), so the assignment is bit-identical in any engine — a
    0.96 * n float boundary would tie at whole numbers.

    Returns ``df`` + a ``split`` column."""
    from pyspark.sql import Window

    names = [n for n, _ in weights]
    cums, acc = [], 0
    for _, w in weights:
        acc += w
        cums.append(acc)
    total = acc

    if group_col is None:
        # rank-free form of the same rule: u*W < cum_w (u is a 32-bit
        # dyadic rational, W a small int — the product is exact)
        u32 = F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("long")
        expr = F.lit(names[-1])
        for name, cum in zip(names[:-1][::-1], cums[:-1][::-1]):
            expr = F.when(
                u32 * total < F.lit(cum * 4294967296), F.lit(name)
            ).otherwise(expr)
        return df.withColumn("split", expr)

    if bucket_count is None:
        w = Window.partitionBy(group_col).orderBy(
            hash_uniform(F.col(id_col)), F.col(id_col)
        )
        cnt = Window.partitionBy(group_col)
        r = F.row_number().over(w)
        n = F.count("*").over(cnt)
    else:
        B = int(bucket_count)
        u = hash_uniform(F.col(id_col))
        work = df.withColumn("_u", u).withColumn(
            "_bkt",
            F.least(
                F.floor(F.col("_u") * B), F.lit(B - 1)
            ).cast("int"),
        )
        counts = work.groupBy(group_col, "_bkt").agg(
            F.count("*").alias("_c")
        )
        woff = (
            Window.partitionBy(group_col)
            .orderBy("_bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        wall = Window.partitionBy(group_col)
        offs = counts.select(
            group_col,
            "_bkt",
            F.coalesce(F.sum("_c").over(woff), F.lit(0)).alias("_off"),
            F.sum("_c").over(wall).alias("_n"),
        )
        work = work.join(F.broadcast(offs), [group_col, "_bkt"])
        wb = Window.partitionBy(group_col, "_bkt").orderBy(
            "_u", id_col
        )
        r = F.row_number().over(wb) + F.col("_off")
        n = F.col("_n")
        expr = F.lit(names[-1])
        for name, cum in zip(names[:-1][::-1], cums[:-1][::-1]):
            expr = F.when(
                r * total <= n * cum, F.lit(name)
            ).otherwise(expr)
        return work.withColumn("split", expr).drop(
            "_u", "_bkt", "_off", "_n"
        )
    expr = F.lit(names[-1])
    for name, cum in zip(names[:-1][::-1], cums[:-1][::-1]):
        expr = F.when(r * total <= n * cum, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)
