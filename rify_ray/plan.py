"""Rule compilation: turn :class:`rify_ray.model.Rule` objects into join
plans for the distributed fixpoint engine.

The reference engine answers a conjunctive body by recursive backtracking
over six permutation indexes, greedily picking the atom with the fewest
index matches first (``/root/reference/src/reasoner.rs:161-197``,
``pop_strictest_requirement`` ``235-243``).  In a distributed relational
setting the same computation is a **left-deep chain of hash joins**: each
body atom becomes a filtered projection of the fact table, and the join
key of each step is the set of variables shared with the atoms already
joined.  Seeded (semi-naive) evaluation — the reference's
``apply_related`` (``src/reasoner.rs:131-155``) — becomes: for a rule
with k body atoms, k chains per iteration, the i-th chain substituting
the delta set for atom i.

This module is pure Python (no Ray): rules are tiny and plans are
computed once on the driver, then shipped to workers as plain data.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

from .model import Rule

# fact table column names, in slot order
SLOTS = ("s", "p", "o", "g")

# binding-set column name for canonical variable i
def vcol(i: int) -> str:
    return f"_v{i}"


@dataclass(frozen=True)
class AtomPlan:
    """One rule-body (or head) atom lowered to slot descriptors.

    ``slots[j]`` is ``("const", value)`` or ``("var", var_index)`` where
    ``var_index`` indexes the rule's canonical variable order (first
    appearance in ``if_all`` — ``src/rule.rs:170-177``).
    """

    slots: Tuple[Tuple[str, object], ...]  # length 4

    @property
    def const_filters(self) -> List[Tuple[str, object]]:
        """[(slot_col, const_value)] equality filters."""
        return [
            (SLOTS[j], v) for j, (kind, v) in enumerate(self.slots) if kind == "const"
        ]

    @property
    def var_slots(self) -> List[Tuple[str, int]]:
        """[(slot_col, var_index)] — may repeat a var_index (intra-atom
        equality constraint, e.g. ``[?x ?p ?x ?g]``)."""
        return [
            (SLOTS[j], v) for j, (kind, v) in enumerate(self.slots) if kind == "var"
        ]

    @property
    def var_indices(self) -> List[int]:
        """Distinct variable indices, in slot order."""
        out: List[int] = []
        for _, v in self.var_slots:
            if v not in out:
                out.append(v)
        return out

    def selectivity_key(self, bound_vars: frozenset) -> Tuple[int, int]:
        """Greedy join-order score: (#constant slots, #already-bound var
        slots).  Higher = more selective = join earlier.  Distributed
        analogue of ``pop_strictest_requirement``
        (``src/reasoner.rs:235-243``) without runtime cardinalities."""
        n_const = len(self.const_filters)
        n_bound = sum(1 for _, v in self.var_slots if v in bound_vars)
        return (n_const + n_bound, n_const)


@dataclass(frozen=True)
class ChainPlan:
    """Join chain for one (rule, delta position) pair.

    ``order[0]`` is the delta-seeded atom index (into ``body``); the rest
    are full-store atoms in greedy-selectivity join order.
    """

    delta_pos: int
    order: Tuple[int, ...]


@dataclass
class RulePlan:
    """Compiled form of one rule."""

    index: int
    rule: Rule
    cano_vars: List[object]  # canonical variable order (names)
    body: List[AtomPlan]
    head: List[AtomPlan]
    chains: List[ChainPlan] = field(default_factory=list)

    @property
    def n_vars(self) -> int:
        return len(self.cano_vars)

    def bound_constants(self) -> List[object]:
        """Every constant mentioned by the rule (term-universe input —
        ``vertices``, ``src/common.rs:111-123``)."""
        return [e.value for e in self.rule.iter_entities() if e.is_bound()]


def _plan_atom(atom, var_index: Dict[object, int]) -> AtomPlan:
    slots = []
    for e in atom:
        if e.is_unbound():
            slots.append(("var", var_index[e.value]))
        else:
            slots.append(("const", e.value))
    return AtomPlan(tuple(slots))


def _plan_chain(body: List[AtomPlan], delta_pos: int) -> ChainPlan:
    """Greedy selectivity ordering of the non-seed atoms; prefers atoms
    sharing variables with the already-joined prefix (avoids cross
    joins), then more-constant atoms."""
    bound = frozenset(body[delta_pos].var_indices)
    remaining = [i for i in range(len(body)) if i != delta_pos]
    order = [delta_pos]
    while remaining:
        def score(i: int):
            a = body[i]
            shares = any(v in bound for v in a.var_indices)
            sel = a.selectivity_key(bound)
            return (1 if shares else 0, sel, -i)

        best = max(remaining, key=score)
        remaining.remove(best)
        order.append(best)
        bound = bound | frozenset(body[best].var_indices)
    return ChainPlan(delta_pos, tuple(order))


def compile_rule(index: int, rule: Rule) -> RulePlan:
    cano = rule.canonical_unbound()
    var_index = {name: i for i, name in enumerate(cano)}
    body = [_plan_atom(a, var_index) for a in rule.if_all]
    head = [_plan_atom(a, var_index) for a in rule.then]
    plan = RulePlan(index=index, rule=rule, cano_vars=cano, body=body, head=head)
    plan.chains = [_plan_chain(body, i) for i in range(len(body))]
    return plan


def compile_rules(rules: Sequence[Rule]) -> List[RulePlan]:
    return [compile_rule(i, r) for i, r in enumerate(rules)]
