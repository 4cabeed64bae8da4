"""Distributed state: the hash-partitioned, parquet-backed triple store."""

from .store import TripleStore

__all__ = ["TripleStore"]
