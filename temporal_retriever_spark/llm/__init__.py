"""LLM-data-pipeline operators (SURVEY §2.10, BASELINE north star).

No reference analog — these are Spark-native designs for the operations
a large-scale training-data pipeline needs: deduplication (exact,
MinHash-LSH, SimHash, n-gram Jaccard), similarity search over embedding
columns, text analysis (language id, quality scores, token counts,
fingerprints), and multimodal binary-column plumbing.
"""

from temporal_retriever_spark.llm.text import (
    language_id,
    text_fingerprint,
    text_stats,
    tfidf_topk,
    token_count_expr,
    token_topk,
)
from temporal_retriever_spark.llm.dedup import (
    duplicate_clusters,
    exact_dedup,
    exact_duplicate_groups,
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_signatures,
    near_dup_pairs,
    near_dup_pairs_verified,
    ngram_containment_pairs,
    ngram_jaccard_pairs,
    simhash_near_dups,
    simhash_pairs,
    simhash_signatures,
    word_shingles,
)
from temporal_retriever_spark.llm.similarity import (
    cosine_similarity_expr,
    cosine_topk,
    embedding_group_outliers,
    embedding_near_dup_pairs,
    lsh_cosine_topk,
    pool_embeddings,
)
from temporal_retriever_spark.llm.chunking import (
    chunk_documents,
    pack_sequences,
)
from temporal_retriever_spark.llm.corpus import (
    corpus_sketch_stats,
    prepare_corpus,
    apply_mixture,
    mixture_plan,
    quality_prune,
    sample_corpus,
    sample_k_per_group,
    train_test_split,
    sample_hash_expr,
)
from temporal_retriever_spark.llm.filters import (
    contamination,
    gopher_filter,
    repetition_stats,
    scrub_text,
)
from temporal_retriever_spark.llm.lm import (
    perplexity_prune,
    score_ngram_lm,
    train_ngram_lm,
)
from temporal_retriever_spark.llm.multimodal import (
    extract_features,
    media_metadata_stats,
    repartition_for_payloads,
    resize_images,
    sample_frames,
    set_decoder,
    set_frame_sampler,
    set_resizer,
    synthetic_media,
)

__all__ = [
    "train_ngram_lm",
    "score_ngram_lm",
    "perplexity_prune",
    "language_id",
    "text_fingerprint",
    "text_stats",
    "tfidf_topk",
    "token_topk",
    "token_count_expr",
    "duplicate_clusters",
    "exact_dedup",
    "exact_duplicate_groups",
    "jaccard_verify",
    "lsh_candidate_pairs",
    "minhash_signatures",
    "near_dup_pairs",
    "near_dup_pairs_verified",
    "ngram_jaccard_pairs",
    "simhash_near_dups",
    "simhash_pairs",
    "simhash_signatures",
    "word_shingles",
    "cosine_similarity_expr",
    "cosine_topk",
    "embedding_near_dup_pairs",
    "lsh_cosine_topk",
    "prepare_corpus",
    "sample_corpus",
    "sample_k_per_group",
    "train_test_split",
    "chunk_documents",
    "ngram_containment_pairs",
    "embedding_group_outliers",
    "pool_embeddings",
    "quality_prune",
    "mixture_plan",
    "apply_mixture",
    "pack_sequences",
    "sample_hash_expr",
    "corpus_sketch_stats",
    "contamination",
    "gopher_filter",
    "repetition_stats",
    "scrub_text",
    "extract_features",
    "media_metadata_stats",
    "repartition_for_payloads",
    "resize_images",
    "sample_frames",
    "set_decoder",
    "set_frame_sampler",
    "set_resizer",
    "synthetic_media",
]
