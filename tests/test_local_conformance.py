"""Conformance of rify_ray.local against the reference's golden cases.

Every case cites the reference test it reproduces (SURVEY.md §5,
FIXTURES.md F5).  No Ray involved.
"""

import json

import pytest

from fixtures import (
    CREDENTIAL_EE,
    DG,
    FRIENDSWITH_FACTS,
    ancestry_expected,
    ancestry_facts,
    ancestry_rules,
    awesome_score_axiom,
    consecutive_ints_facts_rules,
    explicit_ethos_rules,
    friendswith_rules,
)
from rify_ray.local import infer, prove, validate
from rify_ray.model import (
    B,
    BadRuleApplication,
    ExhaustedSearchSpace,
    NoSuchRule,
    NovelName,
    Rule,
    RuleApplication,
    U,
    UnboundImplied,
)


# -- infer ------------------------------------------------------------------


def test_ancestry():
    """src/infer.rs:116-154: ring of 10 => exactly the 100 ancestor pairs."""
    out = infer(ancestry_facts(10), ancestry_rules())
    assert len(out) == len(set(out))  # duplicate-free
    assert set(out) == ancestry_expected(10)


@pytest.mark.parametrize("n", [20, 30])
def test_ancestry_bench_sizes(n):
    """benches/src/lib.rs:47-66: 20/30-node rings => n^2 facts."""
    out = infer(ancestry_facts(n), ancestry_rules())
    assert set(out) == ancestry_expected(n)


def test_unconditional_rule():
    """src/infer.rs:156-165: empty if_all fires from an empty fact set."""
    rules = [Rule.create([], [[B("nachos"), B("are"), B("food"), B(DG)]])]
    assert infer([], rules) == [("nachos", "are", "food", DG)]


def test_reasoning_is_already_complete():
    """src/infer.rs:167-179."""
    facts = [("nachos", "are", "tasty", DG), ("nachos", "are", "food", DG)]
    rules = [
        Rule.create(
            [[B("nachos"), B("are"), B("tasty"), B(DG)]],
            [[B("nachos"), B("are"), B("food"), B(DG)]],
        )
    ]
    assert infer(facts, rules) == []


def test_empty_ruleset():
    """src/infer.rs:181-191."""
    facts = [("nachos", "are", "tasty", DG), ("nachos", "are", "food", DG)]
    assert infer(facts, []) == []


def test_empty_claimgraph():
    """src/infer.rs:193-203."""
    rules = [
        Rule.create(
            [[B("nachos"), B("are"), B("tasty"), B(DG)]],
            [[B("nachos"), B("are"), B("food"), B(DG)]],
        )
    ]
    assert infer([], rules) == []


def test_sum_of_consecutive_ints_is_odd():
    """src/infer.rs:205-274: 5-rule multi-variable join chain."""
    facts, rules = consecutive_ints_facts_rules()
    derived = infer(facts, rules)
    assert ("A+B", "is", "odd", DG) in set(derived)


def test_infer_no_premises_in_output_no_dups():
    facts = ancestry_facts(10)
    out = infer(facts, ancestry_rules())
    assert not (set(out) & set(facts))
    assert len(out) == len(set(out))


# -- rule validation --------------------------------------------------------


def test_create_invalid_unbound_implied():
    """src/rule.rs:404-482: then-var absent from if_all is rejected."""
    with pytest.raises(UnboundImplied):
        Rule.create([], [[U("a"), U("a"), U("a"), U("a")]])
    with pytest.raises(UnboundImplied):
        Rule.create(
            [[B("sun"), B("enabled"), B("false"), B(DG)]],
            [[U("a"), B("color"), B("black"), B(DG)]],
        )


def test_rule_serde_roundtrip():
    """src/rule.rs:484-570: exact JSON wire format."""
    jsonrule = {
        "if_all": [
            [
                {"Unbound": "pig"},
                {"Bound": {"Iri": "https://example.com/Ability"}},
                {"Bound": {"Iri": "https://example.com/Flight"}},
                {"Bound": "DefaultGraph"},
            ],
        ],
        "then": [
            [
                {"Bound": {"Iri": "did:dock:bddap"}},
                {"Bound": {"Iri": "http://xmlns.com/foaf/spec/#term_firstName"}},
                {
                    "Bound": {
                        "Literal": {
                            "value": "Gorgadon",
                            "datatype": "http://www.w3.org/1999/02/22-rdf-syntax-ns#PlainLiteral",
                        }
                    }
                },
                {"Bound": "DefaultGraph"},
            ],
        ],
    }
    rule = Rule.from_json_obj(jsonrule)
    assert rule.to_json_obj() == jsonrule
    assert json.loads(json.dumps(rule.to_json_obj())) == jsonrule


# -- prove ------------------------------------------------------------------


def test_novel_name():
    """src/prove.rs:352-359."""
    with pytest.raises(NovelName):
        prove([], [("andrew", "score", "awesome", DG)], [])


def test_search_space_exhausted():
    """src/prove.rs:361-394."""
    premises = [
        ("score", "score", "score", DG),
        ("andrew", "andrew", "andrew", DG),
        ("awesome", "awesome", "awesome", DG),
    ]
    with pytest.raises(ExhaustedSearchSpace):
        prove(premises, [("andrew", "score", "awesome", DG)], [])
    premises2 = premises + [
        ("backflip", "backflip", "backflip", DG),
        ("ability", "ability", "ability", DG),
    ]
    rules = [
        Rule.create([], []),
        Rule.create(
            [[U("a"), B("ability"), B("backflip"), U("g")]],
            [[U("a"), B("score"), B("awesome"), U("g")]],
        ),
    ]
    with pytest.raises(ExhaustedSearchSpace):
        prove(premises2, [("andrew", "score", "awesome", DG)], rules)


def test_prove_already_stated():
    """src/prove.rs:396-407: proving a premise yields the empty proof."""
    assert prove(
        [("doggo", "score", "11", DG)], [("doggo", "score", "11", DG)], []
    ) == []


def test_prove_single_step():
    """src/prove.rs:410-439: pins the canonical instantiation ORDER
    (first appearance in if_all: boi, g, s)."""
    rule = awesome_score_axiom(graph_var=True)
    proof = prove(
        [("you", "score", "unspecified", DG), ("you", "is", "awesome", DG)],
        [("you", "score", "awesome", DG)],
        [rule],
    )
    assert proof == [RuleApplication(0, ("you", DG, "unspecified"))]


def test_prove_doctest_example():
    """src/prove.rs:12-57 doctest: bound default_graph variant."""
    rule = awesome_score_axiom(graph_var=False)
    proof = prove(
        [("you", "score", "unspecified", DG), ("you", "is", "awesome", DG)],
        [("you", "score", "awesome", DG)],
        [rule],
    )
    assert proof == [RuleApplication(0, ("you", "unspecified"))]


def test_graph_separation():
    """src/prove.rs:441-500: unbound graph var binds consistently."""
    rule = awesome_score_axiom(graph_var=True)
    # same graph: provable
    prove(
        [("you", "score", "unspecified", DG), ("you", "is", "awesome", DG)],
        [("you", "score", "awesome", DG)],
        [rule],
    )
    # facts split across graphs: not provable
    with pytest.raises(ExhaustedSearchSpace):
        prove(
            [("you", "score", "unspecified", DG), ("you", "is", "awesome", "other_graph")],
            [("you", "score", "awesome", DG)],
            [rule],
        )
    with pytest.raises(ExhaustedSearchSpace):
        prove(
            [("you", "score", "unspecified", DG), ("you", "is", "awesome", "other_graph")],
            [("you", "score", "awesome", "other_graph")],
            [rule],
        )
    with pytest.raises(ExhaustedSearchSpace):
        prove(
            [
                ("you", "score", "unspecified", DG),
                ("you", "is", "awesome", DG),
                ("other_graph", "other_graph", "other_graph", "other_graph"),
            ],
            [("you", "score", "awesome", "other_graph")],
            [rule],
        )


def test_prove_multi_step():
    """src/prove.rs:502-627: 11-step golden proof; we require a valid proof
    implying the goals, no longer than the reference's."""
    rules = friendswith_rules()
    goals = [("soyoung", "is", "awesome", DG), ("nick", "is", "awesome", DG)]
    proof = prove(FRIENDSWITH_FACTS, goals, rules)
    assert len(proof) <= 11
    valid = validate(rules, proof)
    for g in goals:
        assert g in valid.implied
    assert valid.assumed <= set(FRIENDSWITH_FACTS)


def test_ancestry_high_prove_and_verify():
    """src/prove.rs:629-678 (over int terms)."""
    n = 10
    nodes = list(range(3, 3 + n))
    parent, ancestor, dg = 0, 1, 2
    facts = [(nodes[i], parent, nodes[(i + 1) % n], dg) for i in range(n)]
    rules = [
        Rule.create(
            [[U("a"), B(parent), U("b"), B(dg)]],
            [[U("a"), B(ancestor), U("b"), B(dg)]],
        ),
        Rule.create(
            [
                [U("a"), B(ancestor), U("b"), B(dg)],
                [U("b"), B(ancestor), U("c"), B(dg)],
            ],
            [[U("a"), B(ancestor), U("c"), B(dg)]],
        ),
    ]
    goals = [
        (nodes[0], ancestor, nodes[-1], dg),
        (nodes[-1], ancestor, nodes[0], dg),
        (nodes[0], ancestor, nodes[0], dg),
        (nodes[0], parent, nodes[1], dg),  # a premise
    ]
    proof = prove(facts, goals, rules)
    valid = validate(rules, proof)
    assert valid.assumed == set(facts)
    for goal in goals:
        assert (goal in valid.implied) ^ (goal in facts)
    for f in facts:
        assert f not in valid.implied


def test_no_proof_is_generated_for_facts():
    """src/prove.rs:680-694."""
    facts = [
        ("tacos", "are", "tasty", DG),
        ("nachos", "are", "tasty", DG),
        ("nachos", "are", "food", DG),
    ]
    rules = [
        Rule.create(
            [[B("nachos"), B("are"), B("tasty"), B(DG)]],
            [[B("nachos"), B("are"), B("food"), B(DG)]],
        )
    ]
    assert prove(facts, [("nachos", "are", "food", DG)], rules) == []


def test_prove_unconditional_rule():
    """src/prove.rs:696-712: one application with empty instantiations."""
    rules = [Rule.create([], [[B("nachos"), B("are"), B("food"), B(DG)]])]
    proof = prove([], [("nachos", "are", "food", DG)], rules)
    assert proof == [RuleApplication(0, ())]


def test_explicit_ethos_chain():
    """bindings/js_wasm/binding_tests/test.js:93-146: golden proof + sets."""
    rules = explicit_ethos_rules()
    goals = [("bobert", "mayPurchase", "http://www.heppnetz.de/ontologies/vso/ns#Vehicle", DG)]
    proof = prove(CREDENTIAL_EE, goals, rules)
    assert proof == [
        RuleApplication(0, ("root_authority", "_:0", "issuer")),
        RuleApplication(1, ("root_authority", "issuer", "_:1")),
        RuleApplication(
            2,
            ("_:1", "bobert", "mayPurchase", "http://www.heppnetz.de/ontologies/vso/ns#Vehicle"),
        ),
    ]
    valid = validate(rules, proof)
    assert valid.assumed == set(CREDENTIAL_EE)
    assert valid.implied == {
        ("bobert", "mayPurchase", "http://www.heppnetz.de/ontologies/vso/ns#Vehicle", DG),
        ("root_authority", "claims", "_:1", DG),
        ("root_authority", "defersTo", "issuer", DG),
    }


# -- validate ---------------------------------------------------------------


def test_irrelevant_facts_ignored():
    """src/validate.rs:119-142: assumption minimality."""
    facts = [("tacos", "are", "tasty", DG), ("nachos", "are", "tasty", DG)]
    rules = [
        Rule.create(
            [[B("nachos"), B("are"), B("tasty"), B(DG)]],
            [[B("nachos"), B("are"), B("food"), B(DG)]],
        )
    ]
    proof = prove(facts, [("nachos", "are", "food", DG)], rules)
    valid = validate(rules, proof)
    assert valid.assumed == {("nachos", "are", "tasty", DG)}
    assert ("nachos", "are", "food", DG) in valid.implied


def test_bad_rule_application():
    """src/validate.rs:144-159: wrong instantiation count."""
    rules_v1 = [
        Rule.create([[U("a"), B("a"), B("a"), B("a")]], [[B("b"), B("b"), B("b"), B("b")]])
    ]
    rules_v2 = [
        Rule.create([[B("a"), B("a"), B("a"), B("a")]], [[B("b"), B("b"), B("b"), B("b")]])
    ]
    proof = prove([("a", "a", "a", "a")], [("b", "b", "b", "b")], rules_v1)
    with pytest.raises(BadRuleApplication):
        validate(rules_v2, proof)


def test_no_such_rule():
    """src/validate.rs:161-172."""
    rules = [
        Rule.create([[B("a"), B("a"), B("a"), B("a")]], [[B("b"), B("b"), B("b"), B("b")]])
    ]
    proof = prove([("a", "a", "a", "a")], [("b", "b", "b", "b")], rules)
    with pytest.raises(NoSuchRule):
        validate([], proof)


def test_validate_manual_proof():
    """src/validate.rs:174-261: hand-written proof, exact assumed/implied."""
    rules = [
        Rule.create(
            [
                [B("andrew"), B("claims"), U("c"), B(DG)],
                [U("c"), B("subject"), U("s"), B(DG)],
                [U("c"), B("property"), U("p"), B(DG)],
                [U("c"), B("object"), U("o"), B(DG)],
            ],
            [[U("s"), U("p"), U("o"), B(DG)]],
        ),
        Rule.create(
            [[U("a"), B("favoriteFood"), U("f"), B(DG)]],
            [
                [U("a"), B("likes"), U("f"), B(DG)],
                [U("f"), B("type"), B("food"), B(DG)],
            ],
        ),
        Rule.create(
            [
                [U("f"), B("type"), B("food"), B(DG)],
                [U("a"), B("alergyFree"), B("true"), B(DG)],
            ],
            [[U("a"), B("mayEat"), U("f"), B(DG)]],
        ),
    ]
    facts = {
        ("alice", "favoriteFood", "beans", DG),
        ("andrew", "claims", "_:claim1", DG),
        ("_:claim1", "subject", "bob", DG),
        ("_:claim1", "property", "alergyFree", DG),
        ("_:claim1", "object", "true", DG),
    }
    manual_proof = [
        RuleApplication(1, ("alice", "beans")),
        RuleApplication(0, ("_:claim1", "bob", "alergyFree", "true")),
        RuleApplication(2, ("beans", "bob")),
    ]
    valid = validate(rules, manual_proof)
    assert valid.assumed == facts
    assert valid.implied == {
        ("alice", "likes", "beans", DG),
        ("beans", "type", "food", DG),
        ("bob", "alergyFree", "true", DG),
        ("bob", "mayEat", "beans", DG),
    }


def test_validate_js_doctest():
    """bindings/js_wasm/binding_tests/test.js:193-234."""
    rule = awesome_score_axiom(graph_var=False)
    valid = validate([rule], [RuleApplication(0, ("you", "unspecified"))])
    assert valid.assumed == {
        ("you", "is", "awesome", DG),
        ("you", "score", "unspecified", DG),
    }
    assert valid.implied == {("you", "score", "awesome", DG)}
