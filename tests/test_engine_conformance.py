"""Distributed engine vs the local oracle / closed-form golden outputs.

Every case mirrors a reference golden test (citations in
tests/fixtures.py and FIXTURES.md §F5).  The conformance target is
triple-set P/R >= 0.95; we assert exact set equality.

The broadcast evaluator is exercised on every fixture; the shuffle
evaluator (real Dataset.join exchanges) on a representative subset —
it computes the same thing through different physical plans, and each
round costs seconds of Ray overhead at toy scale.
"""

import polars as pl
import pytest

from rify_ray import (
    B,
    ExhaustedSearchSpace,
    NovelName,
    Rule,
    U,
    local,
)
from rify_ray import engine

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


def assert_infer_matches_oracle(facts, rules, **kw):
    exp = set(local.infer(facts, rules))
    got = set(engine.infer(facts, rules, **kw))
    assert got == exp


# ---------------------------------------------------------------------------
# infer — broadcast path
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [10, 20])
def test_ancestry_ring(n):
    facts = ancestry_facts(n)
    got = set(engine.infer(facts, ancestry_rules()))
    assert got == ancestry_expected(n)


def test_consecutive_ints():
    facts, rules = consecutive_ints_facts_rules()
    exp = set(local.infer(facts, rules))
    got = set(engine.infer(facts, rules))
    assert ("A+B", "is", "odd", DG) in got
    assert got == exp


def test_friendswith_chain():
    assert_infer_matches_oracle(FRIENDSWITH_FACTS, friendswith_rules())


def test_explicit_ethos():
    assert_infer_matches_oracle(CREDENTIAL_EE, explicit_ethos_rules())


def test_unconditional_rule_fires_from_empty():
    r = Rule.create([], [[B("nachos"), B("are"), B("food"), B(DG)]])
    assert engine.infer([], [r]) == [("nachos", "are", "food", DG)]


def test_unconditional_head_already_premise_excluded():
    fact = ("nachos", "are", "food", DG)
    r = Rule.create([], [[B("nachos"), B("are"), B("food"), B(DG)]])
    assert engine.infer([fact], [r]) == []


def test_noop_edges():
    facts = ancestry_facts(5)
    # already complete / empty ruleset / empty claimgraph (src/infer.rs:167-203)
    full = facts + sorted(ancestry_expected(5))
    assert engine.infer(full, ancestry_rules()) == []
    assert engine.infer(facts, []) == []
    assert engine.infer([], ancestry_rules()) == []


def test_graph_separation():
    # facts in different graphs must not join (src/prove.rs:441-500)
    facts = [
        ("you", "is", "awesome", "other_graph"),
        ("you", "score", "unspecified", DG),
    ]
    rule = awesome_score_axiom(graph_var=True)
    assert engine.infer(facts, [rule]) == []
    # same graph: fires
    facts_same = [
        ("you", "is", "awesome", DG),
        ("you", "score", "unspecified", DG),
    ]
    assert set(engine.infer(facts_same, [rule])) == {("you", "score", "awesome", DG)}


def test_u32_terms_roundtrip():
    n = 8
    facts = [(i, 0, (i + 1) % n, 99) for i in range(n)]
    rules = [
        Rule.create([[U("a"), B(0), U("b"), B(99)]], [[U("a"), B(1), U("b"), B(99)]]),
        Rule.create(
            [[U("a"), B(1), U("b"), B(99)], [U("b"), B(1), U("c"), B(99)]],
            [[U("a"), B(1), U("c"), B(99)]],
        ),
    ]
    assert_infer_matches_oracle(facts, rules)


def test_intra_atom_repeated_variable():
    facts = [("x", "p", "x", DG), ("x", "p", "y", DG)]
    rule = Rule.create(
        [[U("a"), B("p"), U("a"), B(DG)]], [[U("a"), B("self"), U("a"), B(DG)]]
    )
    assert set(engine.infer(facts, [rule])) == {("x", "self", "x", DG)}


def test_head_with_all_variable_atom():
    # rule 0 of prove_multi_step has head [?s ?p ?o] (src/prove.rs:534)
    assert_infer_matches_oracle(FRIENDSWITH_FACTS, friendswith_rules())


def test_dataset_and_polars_io():
    import pyarrow as pa

    facts = ancestry_facts(6)
    tbl = pa.table({c: [f[j] for f in facts] for j, c in enumerate(["s", "p", "o", "g"])})
    out = engine.infer(tbl, ancestry_rules())
    assert isinstance(out, pl.DataFrame)
    got = set(map(tuple, out.select(["s", "p", "o", "g"]).iter_rows()))
    assert got == ancestry_expected(6)
    assert "iteration" in out.columns


# ---------------------------------------------------------------------------
# prove / validate — broadcast path
# ---------------------------------------------------------------------------


def test_prove_and_validate_roundtrip():
    facts = ancestry_facts(10)
    rules = ancestry_rules()
    goal = ("node_0", "ancestor", "node_6", DG)
    proof = engine.prove(facts, [goal], rules)
    v = engine.validate(rules, proof)
    assert goal in v.implied
    assert v.assumed <= set(facts)
    assert v.assumed.isdisjoint(v.implied)


def test_prove_multi_step_validates():
    rules = friendswith_rules()
    goals = [("soyoung", "is", "awesome", DG), ("nick", "is", "awesome", DG)]
    proof = engine.prove(FRIENDSWITH_FACTS, goals, rules)
    v = engine.validate(rules, proof)
    for g in goals:
        assert g in v.implied
    assert v.assumed <= set(FRIENDSWITH_FACTS)
    # proof minimality guard: the reference pins an 11-step golden proof
    # for this fixture and asserts generated proofs never get longer
    # (src/prove.rs:582-611); hold our distributed prover to the same bar
    assert len(proof) <= 11, f"proof regressed to {len(proof)} steps (golden: 11)"


def test_prove_already_stated_is_empty():
    facts = ancestry_facts(5)
    assert engine.prove(facts, [facts[0]], ancestry_rules()) == []


def test_prove_unconditional():
    r = Rule.create([], [[B("nachos"), B("are"), B("food"), B(DG)]])
    proof = engine.prove([], [("nachos", "are", "food", DG)], [r])
    assert len(proof) == 1
    assert proof[0].rule_index == 0
    assert proof[0].instantiations == ()


def test_prove_novel_name():
    with pytest.raises(NovelName):
        engine.prove(ancestry_facts(5), [("martian", "ancestor", "node_0", DG)], ancestry_rules())


def test_prove_exhausted():
    with pytest.raises(ExhaustedSearchSpace):
        engine.prove(ancestry_facts(5), [("node_0", "parent", "node_3", DG)], ancestry_rules())


def test_prove_graph_separation_fails_across_graphs():
    facts = [
        ("you", "is", "awesome", "other_graph"),
        ("you", "score", "unspecified", DG),
    ]
    with pytest.raises(ExhaustedSearchSpace):
        engine.prove(facts, [("you", "score", "awesome", DG)], [awesome_score_axiom(graph_var=True)])


def test_prove_u32_terms():
    n = 6
    facts = [(i, 0, (i + 1) % n, 99) for i in range(n)]
    rules = [
        Rule.create([[U("a"), B(0), U("b"), B(99)]], [[U("a"), B(1), U("b"), B(99)]]),
        Rule.create(
            [[U("a"), B(1), U("b"), B(99)], [U("b"), B(1), U("c"), B(99)]],
            [[U("a"), B(1), U("c"), B(99)]],
        ),
    ]
    goal = (0, 1, 3, 99)
    proof = engine.prove(facts, [goal], rules)
    v = engine.validate(rules, proof)
    assert goal in v.implied
    assert v.assumed <= set(facts)


# ---------------------------------------------------------------------------
# shuffle path (real Dataset.join exchanges) — representative subset
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_shuffle_ancestry(ray_session=None):
    facts = ancestry_facts(5)
    got = set(engine.infer(facts, ancestry_rules(), mode="shuffle", num_partitions=4))
    assert got == ancestry_expected(5)


@pytest.mark.usefixtures("ray_session")
def test_auto_mode_crosses_to_shuffle(ray_session=None):
    """auto mode switches broadcast → shuffle when the store outgrows the
    threshold mid-fixpoint; the result set must be unchanged."""
    import polars as pl

    facts = ancestry_facts(5)
    df = pl.DataFrame(
        {c: [f[j] for f in facts] for j, c in enumerate(["s", "p", "o", "g"])}
    )
    fp = engine.Fixpoint(
        ancestry_rules(), mode="auto", broadcast_threshold=12, num_partitions=4
    )
    res = fp.run(df)
    evals = {m["evaluator"] for m in res.metrics}
    assert "broadcast" in evals and "shuffle" in evals
    got = set(map(tuple, res.derived().select(["s", "p", "o", "g"]).iter_rows()))
    assert got == ancestry_expected(5)


@pytest.mark.usefixtures("ray_session")
def test_shuffle_salted_join(ray_session=None):
    """Salted joins (skew mitigation) must not change the result set."""
    import polars as pl

    facts = ancestry_facts(5)
    df = pl.DataFrame(
        {c: [f[j] for f in facts] for j, c in enumerate(["s", "p", "o", "g"])}
    )
    fp = engine.Fixpoint(ancestry_rules(), mode="shuffle", num_partitions=4, salt_factor=3)
    res = fp.run(df)
    got = set(map(tuple, res.derived().select(["s", "p", "o", "g"]).iter_rows()))
    assert got == ancestry_expected(5)


@pytest.mark.usefixtures("ray_session")
def test_shuffle_prove_validate(ray_session=None):
    facts = ancestry_facts(4)
    rules = ancestry_rules()
    goal = ("node_0", "ancestor", "node_2", DG)
    proof = engine.prove(facts, [goal], rules, mode="shuffle", num_partitions=4)
    v = engine.validate(rules, proof)
    assert goal in v.implied


# ---------------------------------------------------------------------------
# checkpoint / resume
# ---------------------------------------------------------------------------


def test_checkpoint_resume(tmp_path):
    facts = ancestry_facts(8)
    rules = ancestry_rules()
    df = pl.DataFrame(
        {c: [f[j] for f in facts] for j, c in enumerate(["s", "p", "o", "g"])}
    )
    fp = engine.Fixpoint(rules, checkpoint_dir=str(tmp_path))
    r1 = fp.run(df)
    derived1 = set(map(tuple, r1.derived().select(["s", "p", "o", "g"]).iter_rows()))
    assert derived1 == ancestry_expected(8)

    fp2 = engine.Fixpoint(rules, checkpoint_dir=str(tmp_path))
    r2 = fp2.run(df, resume=True)
    derived2 = set(map(tuple, r2.derived().select(["s", "p", "o", "g"]).iter_rows()))
    assert derived2 == derived1
    assert r2.metrics == []  # nothing recomputed


def test_checkpoint_resume_partial(tmp_path):
    """Resume from a prefix of iterations continues to the same fixpoint."""
    import os
    import shutil

    facts = ancestry_facts(8)
    rules = ancestry_rules()
    df = pl.DataFrame(
        {c: [f[j] for f in facts] for j, c in enumerate(["s", "p", "o", "g"])}
    )
    fp = engine.Fixpoint(rules, checkpoint_dir=str(tmp_path))
    r1 = fp.run(df)
    # drop the last two completed iterations to simulate a crash
    dirs = sorted(os.listdir(tmp_path))
    assert len(dirs) >= 3
    for d in dirs[-2:]:
        shutil.rmtree(tmp_path / d)
    fp2 = engine.Fixpoint(rules, checkpoint_dir=str(tmp_path))
    r2 = fp2.run(df, resume=True)
    assert set(map(tuple, r2.derived().select(["s", "p", "o", "g"]).iter_rows())) == ancestry_expected(8)
    assert len(r2.metrics) >= 1  # some rounds actually re-ran


def test_checkpoint_resume_after_iter0_only(tmp_path):
    """Crash during round 1 (only iter 0 checkpointed): round 1's seed
    delta must be rebuilt as premises ∪ uncond heads — the checkpointed
    iter-0 delta alone holds no premises, so resuming from it naively
    would silently derive nothing."""
    import os
    import shutil

    facts = ancestry_facts(8)
    rules = ancestry_rules()
    df = pl.DataFrame(
        {c: [f[j] for f in facts] for j, c in enumerate(["s", "p", "o", "g"])}
    )
    fp = engine.Fixpoint(rules, checkpoint_dir=str(tmp_path))
    fp.run(df)
    for d in sorted(os.listdir(tmp_path))[1:]:  # keep ONLY iter=00000
        shutil.rmtree(tmp_path / d)
    fp2 = engine.Fixpoint(rules, checkpoint_dir=str(tmp_path))
    r2 = fp2.run(df, resume=True)
    assert set(map(tuple, r2.derived().select(["s", "p", "o", "g"]).iter_rows())) == ancestry_expected(8)


def test_recall_proof_deep_chain_no_recursion_limit():
    """_recall_proof must walk proof chains deeper than the Python
    recursion limit (iterative lineage walk)."""
    from rify_ray.engine import _recall_proof
    from rify_ray.model import B, Rule, U

    n = 5000
    rules = [
        Rule.create(
            [[U("a"), B("reach"), U("b"), B(DG)], [U("b"), B("succ"), U("c"), B(DG)]],
            [[U("a"), B("reach"), U("c"), B(DG)]],
        )
    ]
    # linear lineage: reach(0, k) derived from reach(0, k-1) ∧ succ(k-1, k)
    arguments = {
        (f"n{0}", "reach", f"n{k}", DG): (0, (f"n{0}", f"n{k-1}", f"n{k}"))
        for k in range(2, n)
    }
    out = []
    _recall_proof(("n0", "reach", f"n{n-1}", DG), arguments, rules, out)
    assert len(out) == n - 2
    # post-order: shallowest application first
    assert out[0].instantiations == ("n0", "n1", "n2")
    assert out[-1].instantiations == ("n0", f"n{n-2}", f"n{n-1}")
