"""map_batches stages: extraction, entity linking, canonicalization,
dedup, text analysis, similarity search, multimodal plumbing."""

from .extract import extract_text, extract_stage
from .linking import MentionExtractor, linking_stage
from .canonicalize import canonicalize_stage, QUAD_SCHEMA

__all__ = [
    "extract_text",
    "extract_stage",
    "MentionExtractor",
    "linking_stage",
    "canonicalize_stage",
    "QUAD_SCHEMA",
]
