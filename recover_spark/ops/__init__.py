from recover_spark.ops.dedup_text import (
    duplicate_clusters,
    exact_dedup,
    minhash_near_duplicates,
    minhash_signatures,
    ngram_jaccard_pairs,
    remove_repeated_spans,
    simhash_signatures,
)
from recover_spark.ops.similarity import (
    brute_force_topk,
    build_ivf_index,
    embedding_near_duplicates,
    ivf_topk,
    ivf_topk_indexed,
    lsh_bucketed_topk,
    quantize_embeddings,
    quantized_cosine_topk,
)
from recover_spark.ops.text_analysis import (
    chunk_documents,
    document_fingerprint,
    language_id,
    quality_filter,
    text_profile,
)
from recover_spark.ops.sampling import (
    heavy_hitters,
    histogram,
    stable_sample,
    stable_split,
)

__all__ = [
    "duplicate_clusters",
    "quality_filter",
    "heavy_hitters",
    "histogram",
    "stable_sample",
    "stable_split",
    "chunk_documents",
    "exact_dedup",
    "minhash_near_duplicates",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "remove_repeated_spans",
    "simhash_signatures",
    "brute_force_topk",
    "build_ivf_index",
    "embedding_near_duplicates",
    "ivf_topk",
    "ivf_topk_indexed",
    "lsh_bucketed_topk",
    "quantize_embeddings",
    "quantized_cosine_topk",
    "document_fingerprint",
    "language_id",
    "text_profile",
]
