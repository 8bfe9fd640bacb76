"""Operator library (SURVEY §7 P4): DataFrame-native custom operators."""

from .asof import asof_join
from .dedup import (
    attach_clusters,
    contamination_overlap,
    dedup_exact,
    duplicate_clusters,
    embedding_neardup_pairs,
    exact_dup_groups,
    minhash_candidates,
    ngram_jaccard_pairs,
    ngram_jaccard_prefix_candidates,
    dedup_paragraphs,
    duplicate_spans,
    semantic_dedup,
    semantic_neardup_pairs,
    simhash,
    simhash_banded_keys,
    simhash_candidates,
)
from .packing import chunk_documents, pack_by_offset, pack_greedy, pack_stats
from .positional import positional_join, with_row_position
from .profile import profile_columns
from .retrieval import bm25_topk, tfidf_vectors
from .sampling import (
    hash_split,
    hash_threshold,
    sample_by_hash,
    stratified_sample_by_hash,
    temperature_mix,
)
from .gapfill import gap_fill
from .groupmap import zscore_normalize_pandas, zscore_normalize_window
from .pipeline import clean_corpus, corpus_report
from .multimodal import (
    decode_audio,
    decode_image,
    make_demo_assets,
    make_demo_audio,
    sample_frames,
)
from .rollup import bucket_agg, reaggregate, rollup_ladder, time_bucket
from .sessionize import session_stats, sessionize
from .similarity import (
    ann_topk,
    cosine_scores,
    cosine_topk,
    cosine_topk_int8,
    cosine_topk_pandas,
    ivf_assign,
    ivf_topk,
    kmeans_centroids,
    lsh_bucket,
    quantize_embeddings,
)
from .text import (
    bpe_token_count,
    fingerprint,
    lang_scores,
    quality_score,
    corpus_bigram_scores,
    entropy_stats,
    repetition_stats,
    scrub_text,
    source_report,
    text_stats,
    token_count,
    normalize_text,
)

__all__ = [
    "asof_join",
    "dedup_exact",
    "exact_dup_groups",
    "minhash_candidates",
    "dedup_paragraphs",
    "duplicate_spans",
    "simhash",
    "simhash_banded_keys",
    "simhash_candidates",
    "ngram_jaccard_pairs",
    "ngram_jaccard_prefix_candidates",
    "embedding_neardup_pairs",
    "duplicate_clusters",
    "attach_clusters",
    "contamination_overlap",
    "sample_by_hash",
    "stratified_sample_by_hash",
    "hash_split",
    "hash_threshold",
    "pack_by_offset",
    "chunk_documents",
    "pack_greedy",
    "pack_stats",
    "profile_columns",
    "bm25_topk",
    "tfidf_vectors",
    "sessionize",
    "session_stats",
    "cosine_scores",
    "cosine_topk",
    "cosine_topk_pandas",
    "cosine_topk_int8",
    "quantize_embeddings",
    "ann_topk",
    "lsh_bucket",
    "token_count",
    "bpe_token_count",
    "lang_scores",
    "quality_score",
    "fingerprint",
    "text_stats",
    "scrub_text",
    "normalize_text",
    "corpus_bigram_scores",
    "entropy_stats",
    "repetition_stats",
    "decode_image",
    "decode_audio",
    "make_demo_audio",
    "sample_frames",
    "make_demo_assets",
    "time_bucket",
    "gap_fill",
    "bucket_agg",
    "reaggregate",
    "rollup_ladder",
    "zscore_normalize_pandas",
    "zscore_normalize_window",
    "clean_corpus",
    "corpus_report",
]

from .topk import term_frequencies, topk_per_group  # noqa: E402

__all__ += ["topk_per_group", "term_frequencies", "ivf_assign", "ivf_topk",
            "kmeans_centroids", "semantic_dedup", "semantic_neardup_pairs",
            "positional_join", "with_row_position", "temperature_mix"]
