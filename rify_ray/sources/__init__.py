"""Data sources: parquet readers, the deterministic synthetic
Common-Crawl-style pages table (BASELINE.json ``input_hint``), the
N-Quads RDF interchange reader/writer, and the JSONL corpus
reader/writer."""

from .jsonl import read_jsonl, write_jsonl
from .nquads import json_to_term, read_nquads, term_to_json, write_nquads
from .pages import ALIAS_INDEX, PREDICATE_PHRASES, expected_page_triples, pages_dataset, pages_table

__all__ = [
    "pages_dataset",
    "pages_table",
    "expected_page_triples",
    "ALIAS_INDEX",
    "PREDICATE_PHRASES",
    "read_nquads",
    "write_nquads",
    "read_jsonl",
    "write_jsonl",
    "term_to_json",
    "json_to_term",
]
