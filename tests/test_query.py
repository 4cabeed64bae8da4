"""Conjunctive pattern query (engine.query / engine.query_store) vs a
brute-force enumerator with the reference's ``apply`` semantics
(``/root/reference/src/reasoner.rs:161-197``): all satisfying variable
assignments over a fact set, intra-atom repeats as equality constraints,
constants as filters.
"""

import polars as pl
import pytest

from rify_ray import B, Rule, U, engine
from fixtures import DG, ancestry_facts, ancestry_rules


def brute_query(facts, pattern):
    """Reference semantics by exhaustive enumeration: returns
    (var_names_in_first_appearance_order, set of assignment tuples)."""
    vars_order = []
    for atom in pattern:
        for e in atom:
            if e.is_unbound() and e.value not in vars_order:
                vars_order.append(e.value)

    def match(fact, atom, binding):
        b = dict(binding)
        for t, e in zip(fact, atom):
            if e.is_bound():
                if t != e.value:
                    return None
            else:
                if e.value in b and b[e.value] != t:
                    return None
                b[e.value] = t
        return b

    partial = [dict()]
    for atom in pattern:
        nxt = []
        for b in partial:
            for f in facts:
                m = match(tuple(f), atom, b)
                if m is not None:
                    nxt.append(m)
        partial = nxt
    return vars_order, {tuple(b[v] for v in vars_order) for b in partial}


def _result_set(res, var_names):
    if isinstance(res, list):
        return {tuple(r[v] for v in var_names) for r in res}
    return set(map(tuple, res.select(var_names).iter_rows()))


PATTERNS = [
    # single atom, one var
    [[U("x"), B("parent"), U("y"), B(DG)]],
    # two-atom chain with shared var
    [
        [U("x"), B("parent"), U("y"), B(DG)],
        [U("y"), B("parent"), U("z"), B(DG)],
    ],
    # constant subject + var object
    [[B("node_0"), B("parent"), U("y"), B(DG)]],
    # var predicate
    [[U("x"), U("p"), B("node_1"), B(DG)]],
]


@pytest.mark.parametrize("pattern_i", range(len(PATTERNS)))
def test_query_matches_bruteforce(pattern_i):
    facts = ancestry_facts(8)
    pattern = PATTERNS[pattern_i]
    want_vars, want = brute_query(facts, [tuple(a) for a in pattern])
    got = engine.query(facts, pattern)
    assert _result_set(got, [str(v) for v in want_vars]) == want
    assert want  # patterns chosen to be non-trivial


def test_query_intra_atom_repeat_and_dict_encode_off():
    facts = [("a", "p", "a", "g"), ("a", "p", "b", "g"), ("c", "p", "c", "g")]
    pattern = [[U("x"), B("p"), U("x"), B("g")]]
    for de in (True, False):
        got = engine.query(facts, pattern, dict_encode=de)
        assert _result_set(got, ["x"]) == {("a",), ("c",)}


def test_query_all_constant_pattern():
    facts = ancestry_facts(4)
    hit = engine.query(facts, [[B("node_0"), B("parent"), B("node_1"), B(DG)]])
    assert hit["matched"].to_list() == [True]
    miss = engine.query(facts, [[B("node_0"), B("parent"), B("node_2"), B(DG)]])
    assert miss["matched"].to_list() == [False]


def test_query_empty_result_keeps_columns():
    facts = ancestry_facts(4)
    out = engine.query(facts, [[U("x"), B("nope"), U("y"), B(DG)]])
    assert _result_set(out, ["x", "y"]) == set()


def test_query_empty_pattern_raises():
    with pytest.raises(ValueError):
        engine.query(ancestry_facts(4), [])


def test_query_non_string_terms():
    facts = [(1, 2, 3, 0), (3, 2, 4, 0), (4, 2, 1, 0)]
    out = engine.query(facts, [[U("x"), B(2), U("y"), B(0)]])
    assert _result_set(out, ["x", "y"]) == {(1, 3), (3, 4), (4, 1)}


def test_query_store_equals_query_over_closure(tmp_path):
    """query_store over the materialized fixpoint == query over the
    driver-resident closure (premises ∪ derived)."""
    import ray.data
    import pyarrow as pa

    facts = ancestry_facts(8)
    rules = ancestry_rules()
    derived = engine.infer(facts, rules)
    closure = list(facts) + [tuple(f) for f in derived]
    pattern = [
        [U("a"), B("ancestor"), U("b"), B(DG)],
        [U("b"), B("ancestor"), U("c"), B(DG)],
    ]
    want_vars, want = brute_query(closure, [tuple(a) for a in pattern])

    ds = ray.data.from_arrow(
        pa.table({c: [f[j] for f in facts] for j, c in enumerate(["s", "p", "o", "g"])})
    )
    store = engine.infer_store(ds, rules, str(tmp_path / "kg"), num_partitions=4)
    got = engine.query_store(store, pattern, num_partitions=4)
    rows = {tuple(r[str(v)] for v in want_vars) for r in got.take_all()}
    assert rows == want

    # decode=False returns the raw hash ids — same cardinality
    raw = engine.query_store(store, pattern, num_partitions=4, decode=False)
    assert raw.count() == len(want)

    # all-constant pattern over the store
    m = engine.query_store(
        store, [[B("node_0"), B("ancestor"), B("node_3"), B(DG)]]
    ).take_all()
    assert m == [{"matched": True}]
    m2 = engine.query_store(
        store, [[B("node_0"), B("nope"), B("node_3"), B(DG)]]
    ).take_all()
    assert m2 == [{"matched": False}]


# ---------------------------------------------------------------------------
# SPARQL-lite modifiers: FILTER / SELECT / DISTINCT
# ---------------------------------------------------------------------------


def _chain_pattern():
    return [
        [U("a"), B("parent"), U("b"), B(DG)],
        [U("b"), B("parent"), U("c"), B(DG)],
    ]


def test_query_filters_match_brute():
    facts = ancestry_facts(8)
    want_vars, want = brute_query(facts, [tuple(a) for a in _chain_pattern()])
    kept = {t for t in want if t[1] != "node_3" and t[0] < t[2]}
    got = engine.query(
        facts,
        _chain_pattern(),
        filters=[("b", "!=", "node_3"), ("a", "<", "c")],
    )
    assert _result_set(got, [str(v) for v in want_vars]) == kept
    assert kept and kept != want  # both clauses actually bite


def test_query_select_keeps_duplicates_distinct_dedupes():
    facts = [
        ("a", "p", "x", "g"),
        ("a", "p", "y", "g"),
        ("b", "p", "x", "g"),
    ]
    pattern = [[U("s"), B("p"), U("o"), B("g")]]
    plain = engine.query(facts, pattern, select=["s"])
    assert sorted(r["s"] for r in plain) == ["a", "a", "b"]  # SPARQL SELECT
    dedup = engine.query(facts, pattern, select=["s"], distinct=True)
    assert sorted(r["s"] for r in dedup) == ["a", "b"]


def test_query_filter_constant_encoding_non_string():
    facts = [(1, 2, 3, 0), (3, 2, 4, 0), (4, 2, 1, 0)]
    out = engine.query(
        facts, [[U("x"), B(2), U("y"), B(0)]], filters=[("x", "!=", 3)]
    )
    assert _result_set(out, ["x", "y"]) == {(1, 3), (4, 1)}


def test_query_filter_explicit_var_literal_markers():
    """A filter rhs can be marked explicitly: U(name) forces a variable
    reference, B(value) forces a literal — resolving the bare-string
    ambiguity when a literal collides with a variable name."""
    # a fact whose object IS the string "b" — the collision case
    facts = [
        ("a1", "p", "b", "g"),
        ("a2", "p", "zz", "g"),
        ("b", "p", "b", "g"),
    ]
    pattern = [[U("a"), B("p"), U("b"), B("g")]]
    # B("b"): compare variable a against the LITERAL string "b"
    lit = engine.query(facts, pattern, filters=[("a", "==", B("b"))])
    assert _result_set(lit, ["a", "b"]) == {("b", "b")}
    # U("b"): compare variable a against variable b (same as bare "b")
    var = engine.query(facts, pattern, filters=[("a", "==", U("b"))])
    assert _result_set(var, ["a", "b"]) == {("b", "b")}
    bare_warns = engine.query(facts, pattern, filters=[("a", "!=", U("b"))])
    assert _result_set(bare_warns, ["a", "b"]) == {("a1", "b"), ("a2", "zz")}
    # bare string naming a variable: still a variable reference, but warns
    with pytest.warns(UserWarning, match="names a pattern variable"):
        bare = engine.query(facts, pattern, filters=[("a", "==", "b")])
    assert _result_set(bare, ["a", "b"]) == {("b", "b")}
    # U rhs must name a pattern variable
    with pytest.raises(ValueError):
        engine.query(facts, pattern, filters=[("a", "==", U("nope"))])


def test_query_filter_validation_errors():
    facts = ancestry_facts(4)
    pattern = [[U("x"), B("parent"), U("y"), B(DG)]]
    with pytest.raises(ValueError):
        engine.query(facts, pattern, filters=[("x", "~", "node_1")])
    with pytest.raises(ValueError):
        engine.query(facts, pattern, filters=[("nope", "==", "node_1")])
    with pytest.raises(ValueError):
        engine.query(facts, pattern, select=["x", "zz"])
    with pytest.raises(ValueError):
        engine.query(facts, pattern, select=["x", "x"])


def test_query_store_filters_equal_driver(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    facts = ancestry_facts(8)
    rules = ancestry_rules()
    derived = engine.infer(facts, rules)
    closure = list(facts) + [tuple(f) for f in derived]
    pattern = [
        [U("a"), B("ancestor"), U("b"), B(DG)],
        [U("b"), B("ancestor"), U("c"), B(DG)],
    ]
    filters = [("b", "!=", "node_3"), ("a", "<", "c")]
    want = engine.query(closure, pattern, filters=filters, select=["a", "c"], distinct=True)
    want_set = _result_set(want, ["a", "c"])

    ds = ray.data.from_arrow(
        pa.table({cn: [f[j] for f in facts] for j, cn in enumerate(["s", "p", "o", "g"])})
    )
    store = engine.infer_store(ds, rules, str(tmp_path / "kgf"), num_partitions=4)
    got = engine.query_store(
        store, pattern, num_partitions=4, filters=filters, select=["a", "c"], distinct=True
    )
    rows = {(r["a"], r["c"]) for r in got.take_all()}
    assert rows == want_set and want_set

    with pytest.raises(ValueError):
        engine.query_store(store, pattern, filters=filters, decode=False)
