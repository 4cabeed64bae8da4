"""JSON-level API: the same surface as the reference's JS/WASM bindings
(``/root/reference/bindings/js_wasm/src/lib.rs:38-50,122-135,162-173``).

All inputs/outputs are JSON-compatible values; errors are returned as
serde-shaped values matching the binding error enum
(``bindings/js_wasm/src/lib.rs:190-196``):

    "InputTypo" | {"InvalidRule": ...} | {"CantProve": ...} | {"InvalidProof": ...}

(``InputTypo`` is the unit variant for malformed input shape — serde
deserialization failure, lib.rs:210-214 — and serializes as a bare
string, exactly like serde does for a unit variant.)

Terms may be any JSON value (plain strings or RDF-term objects like
``{"Iri": "..."}``) — exactly the reference's generic ``Bound`` with a
serde representation.  Non-string terms ride through the engine via its
canonical JSON string encoding (:func:`rify_ray.engine.encode_term`).
"""

from __future__ import annotations

from typing import Any, List, Sequence

from . import engine
from .engine import decode_term, encode_term
from .model import (
    B,
    CantProve,
    InputTypo,
    InvalidProof,
    InvalidRule,
    Rule,
    RuleApplication,
    U,
)


def _parse_rules(rules: Sequence[dict]) -> List[Rule]:
    out = []
    for obj in rules:
        def ent(d):
            # malformed shape is a deserialization failure (InputTypo),
            # not a semantically invalid rule
            if not isinstance(d, dict) or len(d) != 1:
                raise InputTypo(f"bad entity JSON: {d!r}")
            if set(d) == {"Unbound"}:
                return U(d["Unbound"])
            if set(d) == {"Bound"}:
                return B(encode_term(d["Bound"]))
            raise InputTypo(f"bad entity JSON: {d!r}")

        if not isinstance(obj, dict):
            raise InputTypo(f"a rule must be an object, got {type(obj).__name__}")
        out.append(
            Rule.create(
                [[ent(e) for e in atom] for atom in obj.get("if_all", [])],
                [[ent(e) for e in atom] for atom in obj.get("then", [])],
            )
        )
    return out


def _fact(f: Sequence[Any]):
    if len(f) != 4:
        raise InputTypo(f"a fact must have exactly 4 terms, got {len(f)}")
    return tuple(encode_term(t) for t in f)


def infer(premises: Sequence[Sequence[Any]], rules: Sequence[dict]) -> Any:
    """JSON infer: returns the list of newly derived facts or a tagged
    error dict."""
    try:
        rs = _parse_rules(rules)
        facts = [_fact(f) for f in premises]
        out = engine.infer(facts, rs)
        return [[decode_term(t) for t in f] for f in out]
    except InputTypo:
        return "InputTypo"
    except InvalidRule as e:
        return {"InvalidRule": str(e)}


def prove(
    premises: Sequence[Sequence[Any]],
    to_prove: Sequence[Sequence[Any]],
    rules: Sequence[dict],
) -> Any:
    """JSON prove: returns a list of rule applications
    (``{"rule_index": i, "instantiations": [...]}``) or a tagged error."""
    try:
        rs = _parse_rules(rules)
        facts = [_fact(f) for f in premises]
        goals = [_fact(f) for f in to_prove]
        proof = engine.prove(facts, goals, rs)
        return [
            {
                "rule_index": a.rule_index,
                "instantiations": [decode_term(t) for t in a.instantiations],
            }
            for a in proof
        ]
    except InputTypo:
        return "InputTypo"
    except InvalidRule as e:
        return {"InvalidRule": str(e)}
    except CantProve as e:
        return {"CantProve": str(e)}


def validate(rules: Sequence[dict], proof: Sequence[dict]) -> Any:
    """JSON validate: returns ``{"assumed": [...], "implied": [...]}``
    (each a sorted list of 4-term facts) or a tagged error."""
    try:
        rs = _parse_rules(rules)
        apps = [
            RuleApplication(
                int(p["rule_index"]),
                tuple(encode_term(t) for t in p["instantiations"]),
            )
            for p in proof
        ]
        v = engine.validate(rs, apps)

        return {
            "assumed": [[decode_term(t) for t in f] for f in sorted(v.assumed)],
            "implied": [[decode_term(t) for t in f] for f in sorted(v.implied)],
        }
    except InputTypo:
        return "InputTypo"
    except InvalidRule as e:
        return {"InvalidRule": str(e)}
    except InvalidProof as e:
        return {"InvalidProof": str(e)}
