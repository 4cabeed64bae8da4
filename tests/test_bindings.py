"""JSON-bindings API parity with the reference's JS/WASM bindings
(``bindings/js_wasm/binding_tests/test.js:40-146`` — the "Explicit
Ethos" credential-chain end-to-end case, plus error paths)."""

from rify_ray import bindings


def a(s):
    return {"Unbound": s}


def e(s):
    return {"Bound": s}


DG = "default_graph"
VEHICLE = "http://www.heppnetz.de/ontologies/vso/ns#Vehicle"

CREDENTIAL_EE = [
    ["root_authority", "claims", "_:0", DG],
    ["_:0", "subject", "root_authority", DG],
    ["_:0", "predicate", "defersTo", DG],
    ["_:0", "object", "issuer", DG],
    ["issuer", "claims", "_:1", DG],
    ["_:1", "subject", "bobert", DG],
    ["_:1", "predicate", "mayPurchase", DG],
    ["_:1", "object", VEHICLE, DG],
]

RULES = [
    {
        "if_all": [
            [a("super"), e("claims"), a("claim1"), e(DG)],
            [a("claim1"), e("subject"), a("super"), e(DG)],
            [a("claim1"), e("predicate"), e("defersTo"), e(DG)],
            [a("claim1"), e("object"), a("minor"), e(DG)],
        ],
        "then": [[a("super"), e("defersTo"), a("minor"), e(DG)]],
    },
    {
        "if_all": [
            [a("super"), e("defersTo"), a("minor"), e(DG)],
            [a("minor"), e("claims"), a("claim1"), e(DG)],
        ],
        "then": [[a("super"), e("claims"), a("claim1"), e(DG)]],
    },
    {
        "if_all": [
            [e("root_authority"), e("claims"), a("c"), e(DG)],
            [a("c"), e("subject"), a("s"), e(DG)],
            [a("c"), e("predicate"), a("p"), e(DG)],
            [a("c"), e("object"), a("o"), e(DG)],
        ],
        "then": [[a("s"), a("p"), a("o"), e(DG)]],
    },
]


def test_loading_of_rules_works():
    assert bindings.prove([], [], RULES) == []
    assert bindings.validate(RULES, []) == {"assumed": [], "implied": []}


def test_explicit_ethos_prove_validate_roundtrip():
    goals = [["bobert", "mayPurchase", VEHICLE, DG]]
    proof = bindings.prove(CREDENTIAL_EE, goals, RULES)
    assert isinstance(proof, list) and len(proof) >= 3
    valid = bindings.validate(RULES, proof)
    assert goals[0] in valid["implied"]
    # assumptions must all be stated facts (verifier-side check, the
    # documented binding pattern)
    for f in valid["assumed"]:
        assert f in CREDENTIAL_EE
    assert not any(f in valid["assumed"] for f in valid["implied"])


def test_infer_composite_claims():
    derived = bindings.infer(CREDENTIAL_EE, RULES)
    assert ["bobert", "mayPurchase", VEHICLE, DG] in derived


def test_rdf_term_objects_roundtrip():
    iri = lambda v: {"Iri": v}
    lit = lambda v: {"Literal": {"value": v, "datatype": "xsd:string"}}
    facts = [[iri("alice"), iri("knows"), iri("bob"), {"DefaultGraph": True}]]
    rules = [
        {
            "if_all": [
                [{"Unbound": "x"}, {"Bound": iri("knows")}, {"Unbound": "y"}, {"Bound": {"DefaultGraph": True}}]
            ],
            "then": [
                [{"Unbound": "y"}, {"Bound": iri("knownBy")}, {"Unbound": "x"}, {"Bound": {"DefaultGraph": True}}]
            ],
        }
    ]
    out = bindings.infer(facts, rules)
    assert out == [[iri("bob"), iri("knownBy"), iri("alice"), {"DefaultGraph": True}]]
    proof = bindings.prove(facts, out, rules)
    assert proof == [{"rule_index": 0, "instantiations": [iri("alice"), iri("bob")]}]


def test_error_paths():
    bad_rule = [{"if_all": [], "then": [[a("x"), e("p"), e("o"), e(DG)]]}]
    r = bindings.infer([], bad_rule)
    assert "InvalidRule" in r
    r = bindings.prove([["s", "p", "o", DG]], [["novel", "p", "o", DG]], [])
    assert "CantProve" in r
    r = bindings.validate(RULES, [{"rule_index": 99, "instantiations": []}])
    assert "InvalidProof" in r
    r = bindings.validate(RULES, [{"rule_index": 0, "instantiations": ["too", "few"]}])
    assert "InvalidProof" in r


def test_input_typo_paths():
    """Malformed input SHAPE is the binding-level InputTypo unit variant
    (serde deserialization error → Error::InputTypo,
    bindings/js_wasm/src/lib.rs:190-196,210-214), distinct from a
    semantically invalid rule."""
    # entity that is neither {"Unbound": ...} nor {"Bound": ...}
    r = bindings.infer([], [{"if_all": [], "then": [[{"Wat": 1}, e("p"), e("o"), e(DG)]]}])
    assert r == "InputTypo"
    # a fact with the wrong arity
    r = bindings.infer([["only", "three", "terms"]], [])
    assert r == "InputTypo"
    r = bindings.prove([["s", "p", "o", DG, "extra"]], [], [])
    assert r == "InputTypo"
    # a rule that is not an object at all
    r = bindings.validate(["not-a-rule"], [])
    assert r == "InputTypo"
