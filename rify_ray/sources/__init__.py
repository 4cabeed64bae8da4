"""Data sources: parquet readers and the deterministic synthetic
Common-Crawl-style pages table (BASELINE.json ``input_hint``)."""

from .pages import ALIAS_INDEX, PREDICATE_PHRASES, expected_page_triples, pages_dataset, pages_table

__all__ = [
    "pages_dataset",
    "pages_table",
    "expected_page_triples",
    "ALIAS_INDEX",
    "PREDICATE_PHRASES",
]
