"""map_batches stages: extraction, entity linking, canonicalization,
dedup, text analysis, similarity search, multimodal plumbing."""

from .canonicalize import QUAD_SCHEMA, canonicalize_stage
from .dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard,
    simhash_candidates,
    verify_pairs_jaccard,
)
from .extract import extract_stage, extract_text
from .linking import MentionExtractor, linking_stage, make_linker_fn
from .asof import asof_join
from .corpus import (
    decontaminate,
    grouped_topk,
    hll_distinct,
    ngram_topk,
    repetition_stats_fn,
    stable_sample,
)
from .multimodal import DecodeStage, frame_sample_fn, media_stage
from .similarity import knn_brute, knn_lsh
from .text import char_stats_fn, fingerprint_fn, lang_id_fn, text_stage, token_count_fn

__all__ = [
    "extract_text",
    "extract_stage",
    "MentionExtractor",
    "make_linker_fn",
    "linking_stage",
    "canonicalize_stage",
    "QUAD_SCHEMA",
    "exact_dedup",
    "minhash_lsh_candidates",
    "verify_pairs_jaccard",
    "ngram_jaccard",
    "simhash_candidates",
    "embedding_neardup_pairs",
    "knn_brute",
    "knn_lsh",
    "token_count_fn",
    "char_stats_fn",
    "lang_id_fn",
    "fingerprint_fn",
    "text_stage",
    "DecodeStage",
    "media_stage",
    "frame_sample_fn",
]
