"""rify_ray — a Ray-Data-native knowledge-graph construction and
rule-inference engine with the query/data-processing capabilities of
docknetwork/rify, built from scratch on ray.data.Dataset.

Public API mirrors the reference's three entry points
(``infer`` / ``prove`` / ``validate``) plus the Ray Data pipeline layer:

- :mod:`rify_ray.model` — rules, entities, proofs, errors, JSON serde.
- :mod:`rify_ray.local` — exact single-process semantics oracle.
- :mod:`rify_ray.engine` — distributed semi-naive fixpoint over Datasets.
- :mod:`rify_ray.sources` — parquet readers and the synthetic pages table.
- :mod:`rify_ray.stages` — map_batches stages: extraction, entity linking,
  canonicalization, dedup, text stats, similarity search, multimodal.
- :mod:`rify_ray.pipelines` — end-to-end KG construction + reasoning.
"""

from .model import (
    B,
    BadRuleApplication,
    CantProve,
    Entity,
    ExhaustedSearchSpace,
    InvalidProof,
    InvalidRule,
    NoSuchRule,
    NovelName,
    Rule,
    RuleApplication,
    U,
    UnboundImplied,
    Valid,
    rules_from_json,
    rules_to_json,
)
# package-level infer/prove/validate are the DISTRIBUTED engine entry
# points (they accept lists of quads like the reference, plus Arrow
# tables / polars frames / ray Datasets); the faithful single-process
# oracle stays available as rify_ray.local
from .engine import (
    add_premises_store,
    infer,
    infer_store,
    prove,
    prove_store,
    remove_premises_store,
    validate,
)

__all__ = [
    "add_premises_store",
    "infer_store",
    "prove_store",
    "remove_premises_store",
    "B",
    "U",
    "Entity",
    "Rule",
    "RuleApplication",
    "Valid",
    "infer",
    "prove",
    "validate",
    "rules_from_json",
    "rules_to_json",
    "InvalidRule",
    "UnboundImplied",
    "CantProve",
    "ExhaustedSearchSpace",
    "NovelName",
    "InvalidProof",
    "NoSuchRule",
    "BadRuleApplication",
]

__version__ = "0.1.0"
