"""Single-process oracle implementing the exact reference semantics.

This module is a faithful Python re-expression of the reference engine
(docknetwork/rify) used for two purposes:

1. **Conformance oracle** — the distributed engine (``rify_ray.engine``)
   is tested against this module on every golden case from the reference
   test suite (triple-set P/R target >= 0.95; we assert exact set
   equality).
2. **Small-input fast path** — rules/proofs/goal sets are tiny compared to
   the fact store; when a caller's premises fit comfortably on the driver,
   running here avoids cluster round-trips entirely.

It mirrors, with citations:

- ``Translator`` — term <-> dense id by global sort rank
  (``src/translator.rs:13-40``);
- the quad store with six sorted permutation indexes and the 16-way
  index dispatch (``src/reasoner.rs:86-95``, ``202-227``);
- backtracking conjunctive matching with greedy selectivity ordering
  (``apply`` / ``pop_strictest_requirement``, ``src/reasoner.rs:161-197``,
  ``235-243``) and the seeded semi-naive variant (``apply_related``,
  ``src/reasoner.rs:131-155``);
- the fixpoint loops of ``infer`` (``src/infer.rs:29-101``) and ``prove``
  (first-derivation-wins lineage + early exit, ``src/prove.rs:90-165``);
- ``recall_proof`` lineage walk (``src/prove.rs:171-210``);
- sequential, order-sensitive ``validate`` (``src/validate.rs:61-82``).

The shared-mutable-atom-list trick of the reference (rule bodies are
reordered in place by eviction, and the reordering persists across calls)
is reproduced exactly so proof output matches the reference's golden
proofs byte for byte.
"""

from __future__ import annotations

from bisect import bisect_left, bisect_right, insort
from typing import Callable, Dict, List, Optional, Sequence, Tuple

from .model import (
    BadRuleApplication,
    ExhaustedSearchSpace,
    Fact,
    NoSuchRule,
    NovelName,
    Rule,
    RuleApplication,
    Valid,
)

Quad = Tuple[int, int, int, int]  # (s, p, o, g) as global term ids

_ABSENT = object()


class Translator:
    """Bijective term <-> dense-int dictionary; id = rank in sorted term
    universe (``src/translator.rs:13-40``)."""

    def __init__(self, terms):
        self.terms: List = sorted(set(terms))
        self._fwd = {t: i for i, t in enumerate(self.terms)}

    def forward(self, term) -> Optional[int]:
        return self._fwd.get(term)

    def back(self, tid: int):
        return self.terms[tid]


class MapStack:
    """Backtracking-friendly partial map (``src/mapstack.rs:10-51``)."""

    __slots__ = ("map", "history")

    def __init__(self):
        self.map: Dict[int, int] = {}
        self.history: List[Tuple[int, object]] = []

    def write(self, k: int, v: int) -> None:
        self.history.append((k, self.map.get(k, _ABSENT)))
        self.map[k] = v

    def undo(self) -> None:
        k, old = self.history.pop()
        if old is _ABSENT:
            del self.map[k]
        else:
            self.map[k] = old

    def get(self, k: int):
        return self.map.get(k)


class LowRule:
    """Rule with local slot ids (``src/rule.rs:24-28``).

    Local ids ``0..u`` are the rule's variables in first-appearance order
    over ``if_all`` (slot order s,p,o,g); ids ``u..u+b`` are the rule's
    constants; ``inst`` pre-binds constants to global term ids
    (``src/rule.rs:92-165``).
    """

    __slots__ = ("if_all", "then", "inst", "n_unbound")

    def __init__(self, if_all: List[Quad], then: List[Quad], inst: MapStack, n_unbound: int):
        self.if_all = if_all  # mutable: reordered in place like the reference
        self.then = then
        self.inst = inst
        self.n_unbound = n_unbound


def lower_rule(rule: Rule, tran: Translator) -> LowRule:
    next_local = 0
    unbound_map: Dict[object, int] = {}
    for atom in rule.if_all:
        for e in atom:
            if e.is_unbound() and e.value not in unbound_map:
                unbound_map[e.value] = next_local
                next_local += 1
    n_unbound = next_local
    bound_map: Dict[object, int] = {}
    for e in rule.iter_entities():
        if e.is_bound() and e.value not in bound_map:
            bound_map[e.value] = next_local
            next_local += 1

    def local(e) -> int:
        return unbound_map[e.value] if e.is_unbound() else bound_map[e.value]

    if_all = [tuple(local(e) for e in atom) for atom in rule.if_all]
    then = [tuple(local(e) for e in atom) for atom in rule.then]
    inst = MapStack()
    for term, lid in bound_map.items():
        gid = tran.forward(term)
        if gid is None:
            raise KeyError(f"no translation for rule constant {term!r}")
        inst.write(lid, gid)
    return LowRule(if_all, then, inst, n_unbound)


def _local_to_global(atom: Quad, inst: MapStack) -> Optional[Quad]:
    out = []
    for slot in atom:
        v = inst.get(slot)
        if v is None:
            return None
        out.append(v)
    return tuple(out)


# permutation extractors: name -> tuple-of-slot-indices into (s,p,o,g)
_PERMS = {
    "spog": (0, 1, 2, 3),
    "posg": (1, 2, 0, 3),
    "ospg": (2, 0, 1, 3),
    "gspo": (3, 0, 1, 2),
    "gpos": (3, 1, 2, 0),
    "gosp": (3, 2, 0, 1),
}

# 16-way dispatch (``src/reasoner.rs:202-227``): bound-slot mask
# (s,p,o,g) -> (index name, prefix slot order in original s/p/o/g indices)
_DISPATCH = {
    (1, 1, 1, 1): ("spog", (0, 1, 2, 3)),
    (1, 1, 1, 0): ("spog", (0, 1, 2)),
    (1, 1, 0, 1): ("gspo", (3, 0, 1)),
    (1, 1, 0, 0): ("spog", (0, 1)),
    (1, 0, 1, 1): ("gosp", (3, 2, 0)),
    (1, 0, 1, 0): ("ospg", (2, 0)),
    (1, 0, 0, 1): ("gspo", (3, 0)),
    (1, 0, 0, 0): ("spog", (0,)),
    (0, 1, 1, 1): ("gpos", (3, 1, 2)),
    (0, 1, 1, 0): ("posg", (1, 2)),
    (0, 1, 0, 1): ("gpos", (3, 1)),
    (0, 1, 0, 0): ("posg", (1,)),
    (0, 0, 1, 1): ("gosp", (3, 2)),
    (0, 0, 1, 0): ("ospg", (2,)),
    (0, 0, 0, 1): ("gspo", (3,)),
    (0, 0, 0, 0): ("spog", ()),
}


class Reasoner:
    """Insertion-ordered fact log + six sorted permutation indexes
    (``src/reasoner.rs:86-127``)."""

    def __init__(self):
        self.claims: List[Quad] = []
        self._set = set()
        self.indexes: Dict[str, List[int]] = {name: [] for name in _PERMS}

    def contains(self, quad: Quad) -> bool:
        return quad in self._set

    def insert(self, quad: Quad) -> None:
        if quad in self._set:
            return
        self.claims.append(quad)
        ni = len(self.claims) - 1
        self._set.add(quad)
        for name, perm in _PERMS.items():
            key = lambda idx, p=perm: tuple(self.claims[idx][i] for i in p)
            insort(self.indexes[name], ni, key=key)

    def matches(self, pattern: Quad, inst: MapStack) -> List[int]:
        bound = [inst.get(slot) for slot in pattern]
        mask = tuple(1 if b is not None else 0 for b in bound)
        name, order = _DISPATCH[mask]
        idx = self.indexes[name]
        if not order:
            return idx
        prefix = tuple(bound[i] for i in order)
        perm = _PERMS[name]
        key = lambda i, p=perm, n=len(prefix): tuple(self.claims[i][j] for j in p)[:n]
        lo = bisect_left(idx, prefix, key=key)
        hi = bisect_right(idx, prefix, key=key)
        return idx[lo:hi]

    # -- conjunctive matching ------------------------------------------------

    def apply(
        self,
        rule: List[Quad],
        base: int,
        inst: MapStack,
        cb: Callable[[MapStack], None],
    ) -> None:
        """Find all satisfying assignments of ``rule[base:]``
        (``src/reasoner.rs:161-197``).  Reorders ``rule[base:]`` in place
        exactly like the reference's eviction."""
        n = len(rule) - base
        if n == 0:
            cb(inst)
            return
        # greedy selectivity: atom with fewest index matches first
        # (``pop_strictest_requirement``, src/reasoner.rs:235-243)
        best_i = min(range(base, len(rule)), key=lambda i: len(self.matches(rule[i], inst)))
        rule[base], rule[best_i] = rule[best_i], rule[base]
        strictest = rule[base]
        for claim_idx in list(self.matches(strictest, inst)):
            quad = self.claims[claim_idx]
            for k, v in zip(strictest, quad):
                inst.write(k, v)
            self.apply(rule, base + 1, inst, cb)
            for _ in range(4):
                inst.undo()

    def apply_related(
        self,
        quad: Quad,
        rule: List[Quad],
        inst: MapStack,
        cb: Callable[[MapStack], None],
    ) -> None:
        """Seeded (semi-naive) variant: for each body atom that can match
        the new quad, bind it then match the rest (``src/reasoner.rs:131-155``)."""
        for i in range(len(rule)):
            rule[0], rule[i] = rule[i], rule[0]
            part = rule[0]
            if _can_match(quad, part, inst):
                for k, v in zip(part, quad):
                    inst.write(k, v)
                self.apply(rule, 1, inst, cb)
                for _ in range(4):
                    inst.undo()


def _can_match(quad: Quad, part: Quad, inst: MapStack) -> bool:
    for rp, q in zip(part, quad):
        a = inst.get(rp)
        if a is not None and a != q:
            return False
    return True


# ---------------------------------------------------------------------------
# infer
# ---------------------------------------------------------------------------


def _build_translator(premises: Sequence[Fact], rules: Sequence[Rule]) -> Translator:
    """All bound terms of rules + all terms of premises
    (``vertices``, src/common.rs:111-123)."""
    terms = [e.value for r in rules for e in r.iter_entities() if e.is_bound()]
    for f in premises:
        terms.extend(f)
    return Translator(terms)


def _forward_fact(tran: Translator, fact: Fact) -> Optional[Quad]:
    out = []
    for t in fact:
        g = tran.forward(t)
        if g is None:
            return None
        out.append(g)
    return tuple(out)


def infer(premises: Sequence[Fact], rules: Sequence[Rule]) -> List[Fact]:
    """Forward-chaining fixpoint; returns only newly derived facts,
    duplicate-free, premises excluded, in first-derivation order
    (``src/infer.rs:9-101``)."""
    tran = _build_translator(premises, rules)
    lpremises = [_forward_fact(tran, f) for f in premises]
    lrules = [lower_rule(r, tran) for r in rules]
    lclaims = _low_infer(lpremises, lrules)
    return [tuple(tran.back(t) for t in q) for q in lclaims]


def _low_infer(premises: List[Quad], rules: List[LowRule]) -> List[Quad]:
    rs = Reasoner()
    to_add = set(premises)
    initial_len = len(to_add)

    # unconditional rules fire once up front (src/infer.rs:36-50)
    for rule in rules:
        if not rule.if_all:
            for atom in rule.then:
                q = _local_to_global(atom, rule.inst)
                assert q is not None
                to_add.add(q)
    rules = [r for r in rules if r.if_all]

    while to_add:
        adding = sorted(to_add)  # BTreeSet drain order
        adding_set = to_add
        to_add = set()
        for new in adding:
            rs.insert(new)
            for rule in rules:

                def cb(inst, then=rule.then):
                    for implied in then:
                        nq = _local_to_global(implied, inst)
                        if not rs.contains(nq) and nq not in adding_set:
                            to_add.add(nq)

                rs.apply_related(new, rule.if_all, rule.inst, cb)

    return rs.claims[initial_len:]


# ---------------------------------------------------------------------------
# prove
# ---------------------------------------------------------------------------


class _LowApp:
    __slots__ = ("rule_index", "inst_snapshot")

    def __init__(self, rule_index: int, inst_snapshot: Dict[int, int]):
        self.rule_index = rule_index
        self.inst_snapshot = inst_snapshot


def prove(
    premises: Sequence[Fact],
    to_prove: Sequence[Fact],
    rules: Sequence[Rule],
) -> List[RuleApplication]:
    """Find a proof of the goal facts (``src/prove.rs:58-165``).

    Raises :class:`NovelName` when a goal term never occurs in premises or
    rules; :class:`ExhaustedSearchSpace` when the fixpoint completes
    without deriving every goal.
    """
    tran = _build_translator(premises, rules)
    lpremises = [_forward_fact(tran, f) for f in premises]
    lto_prove = []
    for f in to_prove:
        lf = _forward_fact(tran, f)
        if lf is None:
            raise NovelName(f"goal {f!r} uses a term absent from premises and rules")
        lto_prove.append(lf)
    lrules = [lower_rule(r, tran) for r in rules]
    lproof = _low_prove(lpremises, lto_prove, lrules)
    return [_raise(app, rules[app.rule_index], lrules[app.rule_index], tran) for app in lproof]


def _low_prove(
    premises: List[Quad], to_prove: List[Quad], rules: List[LowRule]
) -> List[_LowApp]:
    rs = Reasoner()
    arguments: Dict[Quad, _LowApp] = {}  # first-derivation-wins lineage
    to_add = set(premises)

    for rule_index, rule in enumerate(rules):
        if not rule.if_all:
            for atom in rule.then:
                q = _local_to_global(atom, rule.inst)
                if q not in to_add:
                    to_add.add(q)
                    arguments[q] = _LowApp(rule_index, {})
    rules2 = [(i, r) for i, r in enumerate(rules) if r.if_all]

    while to_add and not all(rs.contains(tp) for tp in to_prove):
        adding_now = sorted(to_add)
        adding_set = to_add
        to_add = set()
        for fact in adding_now:
            rs.insert(fact)
            for rule_index, rule in rules2:

                def cb(inst, rule_index=rule_index, then=rule.then):
                    for implied in then:
                        nq = _local_to_global(implied, inst)
                        if not rs.contains(nq) and nq not in adding_set:
                            if nq not in arguments:
                                arguments[nq] = _LowApp(rule_index, dict(inst.map))
                            to_add.add(nq)

                rs.apply_related(fact, rule.if_all, rule.inst, cb)

    if not all(rs.contains(tp) for tp in to_prove):
        raise ExhaustedSearchSpace("goal not derivable from premises under rules")

    out: List[_LowApp] = []
    for claim in to_prove:
        _recall_proof(claim, arguments, rules, out)
    return out


def _recall_proof(
    to_prove: Quad,
    arguments: Dict[Quad, _LowApp],
    rules: List[LowRule],
    outp: List[_LowApp],
) -> None:
    """Post-order lineage walk; each argument used at most once
    (``src/prove.rs:171-210``)."""
    app = arguments.pop(to_prove, None)
    if app is None:
        return  # premise — assumed

    rule = rules[app.rule_index]

    def to_global(local: int) -> int:
        concrete = rule.inst.get(local)
        if concrete is not None:
            return concrete
        return app.inst_snapshot[local]

    for atom in rule.if_all:
        sub = tuple(to_global(slot) for slot in atom)
        _recall_proof(sub, arguments, rules, outp)
    outp.append(app)


def _raise(app: _LowApp, rule: Rule, lrule: LowRule, tran: Translator) -> RuleApplication:
    """Lift a lowered proof step back to user terms
    (``src/common.rs:52-77``): instantiations in canonical variable order."""
    inst = []
    for local in range(lrule.n_unbound):
        gid = app.inst_snapshot[local]
        inst.append(tran.back(gid))
    return RuleApplication(app.rule_index, tuple(inst))


# ---------------------------------------------------------------------------
# validate
# ---------------------------------------------------------------------------


def validate(rules: Sequence[Rule], proof: Sequence[RuleApplication]) -> Valid:
    """Order-sensitive sequential re-execution of a proof
    (``src/validate.rs:61-82``).

    A quad already implied is not counted assumed; a quad already assumed
    is not counted implied; the returned sets are disjoint.
    """
    implied = set()
    assumed = set()
    for app in proof:
        if not (0 <= app.rule_index < len(rules)):
            raise NoSuchRule(f"rule_index {app.rule_index} out of range")
        rule = rules[app.rule_index]
        for assumption in app.assumptions_when_applied(rule):
            if assumption not in implied:
                assumed.add(assumption)
        for implication in app.implications_when_applied(rule):
            if implication not in assumed:
                implied.add(implication)
    return Valid(assumed=frozenset(assumed), implied=frozenset(implied))
