"""Beyond-reference operators for large-scale training-data pipelines:
deduplication, similarity search, text analysis, multimodal columns.

These reuse the engine's Spark-first idioms (hash-groupBy, broadcast
joins, window ops, Arrow-batched UDFs only where unavoidable) and are
first-class alongside the SURVEY.md §2 inventory.
"""

from miletos_spark.pipeline.dedup import (  # noqa: F401
    exact_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash_64,
    ngram_jaccard_pairs,
)
from miletos_spark.pipeline.text import (  # noqa: F401
    text_stats,
    token_count,
    bpe_ish_token_count,
    doc_quality,
    vocab_counts,
    language_id,
    doc_fingerprint,
)
from miletos_spark.pipeline.similarity import (  # noqa: F401
    cosine_topk,
    lsh_bucket_topk,
    ivf_topk,
    ivf_topk_landed,
)
from miletos_spark.pipeline.landing import (  # noqa: F401
    land_dedup_index,
    land_embedding_index,
    land_ivf_index,
    land_ivfpq_index,
)
from miletos_spark.pipeline.sampling import (  # noqa: F401
    hash_uniform,
    group_keep_fractions,
    mixture_sample,
)
from miletos_spark.pipeline.packing import (  # noqa: F401
    pack_chunks,
    pack_summary,
)
