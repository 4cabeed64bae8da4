"""Store-resident prove: lineage persisted as per-generation parquet,
proof extracted by backward frontier-vs-lineage joins."""

import pyarrow as pa
import pytest

from rify_ray import engine
from rify_ray.model import ExhaustedSearchSpace, NovelName

from fixtures import DG, FRIENDSWITH_FACTS, ancestry_facts, ancestry_rules, friendswith_rules

pytestmark = pytest.mark.usefixtures("ray_session")


def _tbl(facts):
    return pa.table(
        {c: pa.array([f[j] for f in facts], pa.string()) for j, c in enumerate(["s", "p", "o", "g"])}
    )


def test_prove_store_ancestry(tmp_path):
    facts = ancestry_facts(5)
    rules = ancestry_rules()
    goal = ("node_0", "ancestor", "node_3", DG)
    proof = engine.prove_store(_tbl(facts), [goal], rules, str(tmp_path / "kg"), num_partitions=4)
    v = engine.validate(rules, proof)
    assert goal in v.implied
    assert v.assumed <= set(facts)


def test_prove_store_multi_step(tmp_path):
    rules = friendswith_rules()
    goals = [("soyoung", "is", "awesome", DG)]
    proof = engine.prove_store(
        _tbl(FRIENDSWITH_FACTS), goals, rules, str(tmp_path / "kg"), num_partitions=4
    )
    v = engine.validate(rules, proof)
    assert goals[0] in v.implied
    assert v.assumed <= set(FRIENDSWITH_FACTS)
    # minimality guard mirrors the reference's 11-step golden ceiling
    # (src/prove.rs:582-611): goal "soyoung is awesome" needs the whole
    # 5-hop friendship chain (5 × rules 2+1) plus rule 0 = 11 steps
    assert len(proof) <= 11, f"proof regressed to {len(proof)} steps"


def test_prove_store_already_stated(tmp_path):
    facts = ancestry_facts(4)
    proof = engine.prove_store(
        _tbl(facts), [facts[0]], ancestry_rules(), str(tmp_path / "kg"), num_partitions=4
    )
    assert proof == []


def test_prove_store_errors(tmp_path):
    facts = ancestry_facts(4)
    with pytest.raises(NovelName):
        engine.prove_store(
            _tbl(facts),
            [("martian", "ancestor", "node_0", DG)],
            ancestry_rules(),
            str(tmp_path / "kg1"),
            num_partitions=4,
        )
    with pytest.raises(ExhaustedSearchSpace):
        engine.prove_store(
            _tbl(facts),
            [("node_0", "parent", "node_2", DG)],
            ancestry_rules(),
            str(tmp_path / "kg2"),
            num_partitions=4,
        )
