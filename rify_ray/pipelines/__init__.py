"""End-to-end pipelines: KG construction + reasoning."""

from .kg import build_triples, kg_construct_and_infer

__all__ = ["build_triples", "kg_construct_and_infer"]
