"""Logical data model: terms, entities, rules, rule applications, errors.

This is the user-facing rule layer of the engine.  It mirrors the semantics
of the reference implementation (docknetwork/rify) while being pure Python
with no Ray dependency:

- a *fact* is a quad ``(s, p, o, g)`` of opaque, totally-ordered terms
  (reference: ``src/infer.rs:9-12``, quads-not-triples per ``README.md:21-23``);
- a rule atom slot is either a variable (``Unbound``) or a constant
  (``Bound``) (reference: ``src/rule.rs:30-35``);
- a :class:`Rule` is a conjunctive if-then clause whose ``then`` may only
  use variables that appear in ``if_all`` (range restriction — reference
  ``src/rule.rs:72-86``, error ``InvalidRule::UnboundImplied``);
- a :class:`RuleApplication` binds a rule's variables **in order of first
  appearance in** ``if_all`` (reference ``src/rule.rs:170-177``,
  ``src/prove.rs:264-269``).

JSON wire format is byte-compatible with rify's serde format
(``src/rule.rs:499-529``): an entity is ``{"Unbound": name}`` or
``{"Bound": value}`` where ``value`` may be any JSON value (plain string or
an RDF-term-like object).

Terms are opaque to the engine: no arithmetic, no datatype interpretation,
equality-by-ordering only (reference ``README.md:47``).  The distributed
engine (``rify_ray.engine``) requires terms to be *strings*; this module
accepts anything hashable and totally ordered, like the reference's generic
``Bound: Ord``.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Iterable, Iterator, Sequence, Tuple

Term = Any  # opaque, totally ordered within one problem instance
Fact = Tuple[Term, Term, Term, Term]  # (s, p, o, g)


# ---------------------------------------------------------------------------
# errors
# ---------------------------------------------------------------------------


class RifyError(Exception):
    """Base class for all engine errors."""


class InputTypo(RifyError):
    """Malformed input shape at the JSON boundary — the binding-level
    deserialization failure, distinct from a semantically invalid rule
    (reference error enum, ``bindings/js_wasm/src/lib.rs:190-196``;
    serde errors map to ``Error::InputTypo``, :210-214)."""


class InvalidRule(RifyError):
    """Rule construction failed."""


class UnboundImplied(InvalidRule):
    """`then` contains a variable that does not appear in `if_all`.

    Reference: ``src/rule.rs:196-210``.
    """

    def __init__(self, name: Any):
        self.name = name
        super().__init__(f"UnboundImplied({name!r})")


class CantProve(RifyError):
    """Proof search failed (reference ``src/prove.rs:212-229``)."""


class ExhaustedSearchSpace(CantProve):
    """Fixpoint completed without reaching the goal."""


class NovelName(CantProve):
    """A goal term never appears in premises or rules."""


class InvalidProof(RifyError):
    """Proof validation failed (reference ``src/validate.rs:97-104``)."""


class NoSuchRule(InvalidProof):
    """rule_index out of range."""


class BadRuleApplication(InvalidProof):
    """Instantiation count does not match the rule's variable count."""


# ---------------------------------------------------------------------------
# entities and rules
# ---------------------------------------------------------------------------


@dataclass(frozen=True, order=True)
class Entity:
    """One slot of a rule atom: a variable or a constant.

    ``kind`` is "u" (Unbound / variable) or "b" (Bound / constant).
    Reference: ``src/rule.rs:30-35``.
    """

    kind: str
    value: Any

    def is_unbound(self) -> bool:
        return self.kind == "u"

    def is_bound(self) -> bool:
        return self.kind == "b"


def U(name: Any) -> Entity:
    """Variable slot (reference ``Entity::Unbound``)."""
    return Entity("u", name)


def B(value: Any) -> Entity:
    """Constant slot (reference ``Entity::Bound``)."""
    return Entity("b", value)


Atom = Tuple[Entity, Entity, Entity, Entity]


def _as_atom(raw: Sequence[Entity]) -> Atom:
    if len(raw) != 4:
        raise InvalidRule(f"an atom must have exactly 4 slots, got {len(raw)}")
    s, p, o, g = raw
    for e in (s, p, o, g):
        if not isinstance(e, Entity):
            raise InvalidRule(f"atom slot must be an Entity, got {type(e)}")
    return (s, p, o, g)


@dataclass(frozen=True)
class Rule:
    """A conjunctive if-then rule over quads.

    Invariant (enforced by :meth:`create`): every variable in ``then``
    appears in ``if_all`` — so rules can never invent new entities and
    reasoning terminates (reference ``src/rule.rs:63-86``, ``README.md:9``).
    """

    if_all: Tuple[Atom, ...]
    then: Tuple[Atom, ...]

    @staticmethod
    def create(if_all: Iterable[Sequence[Entity]], then: Iterable[Sequence[Entity]]) -> "Rule":
        ia = tuple(_as_atom(a) for a in if_all)
        th = tuple(_as_atom(a) for a in then)
        if_vars = {e.value for atom in ia for e in atom if e.is_unbound()}
        for atom in th:
            for e in atom:
                if e.is_unbound() and e.value not in if_vars:
                    raise UnboundImplied(e.value)
        return Rule(ia, th)

    def canonical_unbound(self) -> list:
        """Unique variable names in order of first appearance in ``if_all``.

        This order defines the meaning of ``RuleApplication.instantiations``
        (reference ``src/rule.rs:170-177``).  Scanning is atom by atom,
        slot order s, p, o, g.
        """
        seen: list = []
        seen_set = set()
        for atom in self.if_all:
            for e in atom:
                if e.is_unbound() and e.value not in seen_set:
                    seen_set.add(e.value)
                    seen.append(e.value)
        return seen

    def iter_entities(self) -> Iterator[Entity]:
        for atom in self.if_all:
            yield from atom
        for atom in self.then:
            yield from atom

    # -- JSON wire format (rify serde compatible, src/rule.rs:499-529) ------

    def to_json_obj(self) -> dict:
        def ent(e: Entity) -> dict:
            return {"Unbound": e.value} if e.is_unbound() else {"Bound": e.value}

        return {
            "if_all": [[ent(e) for e in atom] for atom in self.if_all],
            "then": [[ent(e) for e in atom] for atom in self.then],
        }

    @staticmethod
    def from_json_obj(obj: dict) -> "Rule":
        def ent(d: dict) -> Entity:
            if set(d) == {"Unbound"}:
                return U(d["Unbound"])
            if set(d) == {"Bound"}:
                return B(d["Bound"])
            raise InvalidRule(f"bad entity JSON: {d!r}")

        return Rule.create(
            [[ent(e) for e in atom] for atom in obj.get("if_all", [])],
            [[ent(e) for e in atom] for atom in obj.get("then", [])],
        )


def rules_to_json(rules: Sequence[Rule]) -> str:
    return json.dumps([r.to_json_obj() for r in rules])


def rules_from_json(text: str) -> list:
    return [Rule.from_json_obj(o) for o in json.loads(text)]


# ---------------------------------------------------------------------------
# proofs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RuleApplication:
    """One deductive proof step (reference ``src/prove.rs:264-269``).

    ``instantiations`` bind the rule's variables in canonical order
    (first appearance in ``if_all``).
    """

    rule_index: int
    instantiations: Tuple[Term, ...] = field(default_factory=tuple)

    def _binding(self, rule: Rule) -> dict:
        cano = rule.canonical_unbound()
        if len(cano) != len(self.instantiations):
            raise BadRuleApplication(
                f"rule {self.rule_index} expects {len(cano)} bindings, got {len(self.instantiations)}"
            )
        return dict(zip(cano, self.instantiations))

    def _bind_atoms(self, rule: Rule, atoms: Sequence[Atom]) -> list:
        bind = self._binding(rule)
        out = []
        for atom in atoms:
            out.append(tuple(bind[e.value] if e.is_unbound() else e.value for e in atom))
        return out

    def assumptions_when_applied(self, rule: Rule) -> list:
        """Bound ``if_all`` atoms (reference ``src/prove.rs:272-277``)."""
        return self._bind_atoms(rule, rule.if_all)

    def implications_when_applied(self, rule: Rule) -> list:
        """Bound ``then`` atoms (reference ``src/prove.rs:279-284``)."""
        return self._bind_atoms(rule, rule.then)

    def to_json_obj(self) -> dict:
        return {"rule_index": self.rule_index, "instantiations": list(self.instantiations)}

    @staticmethod
    def from_json_obj(obj: dict) -> "RuleApplication":
        return RuleApplication(int(obj["rule_index"]), tuple(obj["instantiations"]))


@dataclass(frozen=True)
class Valid:
    """Result of proof validation (reference ``src/validate.rs:86-95``).

    If every quad in ``assumed`` is true then, under the rule list, every
    quad in ``implied`` is true.  The two sets are disjoint.
    """

    assumed: frozenset
    implied: frozenset
