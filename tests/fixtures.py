"""Shared golden fixtures ported from the reference test suite.

Each fixture cites the reference file:line it reproduces (FIXTURES.md F5).
These drive both the local oracle tests and the distributed-engine
conformance tests.
"""

from rify_ray.model import B, Rule, U

DG = "default_graph"


def ancestry_facts(n=10, node=lambda i: f"node_{i}"):
    """Ring of n parent facts (src/infer.rs:116-154, benches/src/lib.rs:35-45)."""
    return [(node(i), "parent", node((i + 1) % n), DG) for i in range(n)]


def ancestry_rules():
    """parent => ancestor; ancestor-transitivity (src/infer.rs:127-139)."""
    return [
        Rule.create(
            [[U("a"), B("parent"), U("b"), B(DG)]],
            [[U("a"), B("ancestor"), U("b"), B(DG)]],
        ),
        Rule.create(
            [
                [U("a"), B("ancestor"), U("b"), B(DG)],
                [U("b"), B("ancestor"), U("c"), B(DG)],
            ],
            [[U("a"), B("ancestor"), U("c"), B(DG)]],
        ),
    ]


def ancestry_expected(n=10, node=lambda i: f"node_{i}"):
    """All n^2 ancestor pairs including self (closed form of the ring closure)."""
    return {(node(i), "ancestor", node(j), DG) for i in range(n) for j in range(n)}


def awesome_score_axiom(graph_var=False):
    """(?a is awesome) & (?a score ?s) -> (?a score awesome)
    (src/prove.rs:20-32; unbound-graph variant src/prove.rs:411-420)."""
    g = U("g") if graph_var else B(DG)
    return Rule.create(
        [
            [U("boi" if graph_var else "a"), B("is"), B("awesome"), g],
            [U("boi" if graph_var else "a"), B("score"), U("s"), g],
        ],
        [[U("boi" if graph_var else "a"), B("score"), B("awesome"), g]],
    )


def friendswith_rules():
    """claim-unwrap / awesome-propagation / friendswith-symmetry
    (src/prove.rs:502-566)."""
    return [
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
            [
                [U("person_a"), B("is"), B("awesome"), B(DG)],
                [U("person_a"), B("friendswith"), U("person_b"), B(DG)],
            ],
            [[U("person_b"), B("is"), B("awesome"), B(DG)]],
        ),
        Rule.create(
            [[U("person_a"), B("friendswith"), U("person_b"), B(DG)]],
            [[U("person_b"), B("friendswith"), U("person_a"), B(DG)]],
        ),
    ]


FRIENDSWITH_FACTS = [
    ("soyoung", "friendswith", "nick", DG),
    ("nick", "friendswith", "elina", DG),
    ("elina", "friendswith", "sam", DG),
    ("sam", "friendswith", "fausto", DG),
    ("fausto", "friendswith", "lovesh", DG),
    ("andrew", "claims", "_:claim1", DG),
    ("_:claim1", "subject", "lovesh", DG),
    ("_:claim1", "property", "is", DG),
    ("_:claim1", "object", "awesome", DG),
]


def explicit_ethos_rules():
    """Credential delegation rules (bindings/js_wasm/binding_tests/test.js:50-85)."""
    return [
        Rule.create(
            [
                [U("super"), B("claims"), U("claim1"), B(DG)],
                [U("claim1"), B("subject"), U("super"), B(DG)],
                [U("claim1"), B("predicate"), B("defersTo"), B(DG)],
                [U("claim1"), B("object"), U("minor"), B(DG)],
            ],
            [[U("super"), B("defersTo"), U("minor"), B(DG)]],
        ),
        Rule.create(
            [
                [U("super"), B("defersTo"), U("minor"), B(DG)],
                [U("minor"), B("claims"), U("claim1"), B(DG)],
            ],
            [[U("super"), B("claims"), U("claim1"), B(DG)]],
        ),
        Rule.create(
            [
                [B("root_authority"), B("claims"), U("c"), B(DG)],
                [U("c"), B("subject"), U("s"), B(DG)],
                [U("c"), B("predicate"), U("p"), B(DG)],
                [U("c"), B("object"), U("o"), B(DG)],
            ],
            [[U("s"), U("p"), U("o"), B(DG)]],
        ),
    ]


CREDENTIAL_EE = [
    ("root_authority", "claims", "_:0", DG),
    ("_:0", "subject", "root_authority", DG),
    ("_:0", "predicate", "defersTo", DG),
    ("_:0", "object", "issuer", DG),
    ("issuer", "claims", "_:1", DG),
    ("_:1", "subject", "bobert", DG),
    ("_:1", "predicate", "mayPurchase", DG),
    ("_:1", "object", "http://www.heppnetz.de/ontologies/vso/ns#Vehicle", DG),
]


def consecutive_ints_facts_rules():
    """5 facts + 5 rules deriving (A+B is odd) (src/infer.rs:205-274)."""
    facts = [
        ("B", "is a consecutive int to", "A", DG),
        ("A+B", "result of op", "op_add_A_B", DG),
        ("op_add_A_B", "op_type", "add", DG),
        ("op_add_A_B", "left_hand", "A", DG),
        ("op_add_A_B", "right_hand", "B", DG),
    ]
    rules = [
        Rule.create(
            [[U("y"), B("is a consecutive int to"), U("x"), B(DG)]],
            [[U("y"), B("equals (t -> t+1) of"), U("x"), B(DG)]],
        ),
        Rule.create(
            [
                [U("y"), B("is type"), B("int"), B(DG)],
                [U("x"), B("is type"), B("int"), B(DG)],
                [U("x+y"), B("result of op"), U("op1"), B(DG)],
                [U("op1"), B("op_type"), B("add"), B(DG)],
                [U("op1"), B("left_hand"), U("x"), B(DG)],
                [U("op1"), B("right_hand"), U("y"), B(DG)],
            ],
            [[U("x+y"), B("is type"), B("int"), B(DG)]],
        ),
        Rule.create(
            [
                [U("y"), B("equals (t -> t+1) of"), U("x"), B(DG)],
                [U("x+y"), B("result of op"), U("op1"), B(DG)],
                [U("op1"), B("op_type"), B("add"), B(DG)],
                [U("op1"), B("left_hand"), U("x"), B(DG)],
                [U("op1"), B("right_hand"), U("y"), B(DG)],
            ],
            [[U("x+y"), B("equals (t -> 2*t+1) of"), U("x"), B(DG)]],
        ),
        Rule.create(
            [
                [U("v"), B("equals (t -> 2*t+1) of"), U("w"), B(DG)],
                [U("v"), B("is type"), B("int"), B(DG)],
                [U("w"), B("is type"), B("int"), B(DG)],
            ],
            [[U("v"), B("is"), B("odd"), B(DG)]],
        ),
        Rule.create(
            [[U("p"), B("is a consecutive int to"), U("q"), B(DG)]],
            [
                [U("p"), B("is type"), B("int"), B(DG)],
                [U("q"), B("is type"), B("int"), B(DG)],
            ],
        ),
    ]
    return facts, rules
