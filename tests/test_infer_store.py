"""Dataset/parquet-resident fixpoint (engine.infer_store): facts never
land on the driver; store generations = premises + per-round deltas."""

import pyarrow as pa
import pytest

from rify_ray import engine
from rify_ray.state import TripleStore

from fixtures import ancestry_expected, ancestry_facts, ancestry_rules

pytestmark = pytest.mark.usefixtures("ray_session")


def _premises_table(facts):
    return pa.table(
        {c: pa.array([f[j] for f in facts], pa.string()) for j, c in enumerate(["s", "p", "o", "g"])}
    )


def test_infer_store_ancestry(tmp_path):
    facts = ancestry_facts(5)
    store = engine.infer_store(
        _premises_table(facts), ancestry_rules(), str(tmp_path / "kg"), num_partitions=4
    )
    # dict-encoded by default: raw generations hold int64 term ids
    assert store.value_type == "int64"
    derived = {
        (r["s"], r["p"], r["o"], r["g"])
        for r in store.decoded_dataset(first_gen=1).take_all()
    }
    assert derived == ancestry_expected(5)
    # gen 0 is exactly the premises
    gen0 = {
        (r["s"], r["p"], r["o"], r["g"])
        for r in store.decoded_dataset(last_gen=0).take_all()
    }
    assert gen0 == set(facts)


def test_infer_store_string_typed(tmp_path):
    """dict_encode=False keeps the raw-string store layout."""
    facts = ancestry_facts(5)
    store = engine.infer_store(
        _premises_table(facts), ancestry_rules(), str(tmp_path / "kg"),
        num_partitions=4, dict_encode=False,
    )
    assert store.value_type == "string"
    derived = {
        (r["s"], r["p"], r["o"], r["g"])
        for r in store.dataset(first_gen=1).take_all()
    }
    assert derived == ancestry_expected(5)
    # decoded_dataset is a no-op passthrough for string stores
    assert store.decoded_dataset(first_gen=1).count() == len(derived)


def test_infer_store_resume_idempotent(tmp_path):
    facts = ancestry_facts(4)
    path = str(tmp_path / "kg")
    s1 = engine.infer_store(_premises_table(facts), ancestry_rules(), path, num_partitions=4)
    n1, gens1 = s1.count(), len(s1.generations)
    # re-run on the completed store: no new facts, no new generations
    s2 = engine.infer_store(_premises_table(facts), ancestry_rules(), path, num_partitions=4)
    assert s2.count() == n1
    assert len(s2.generations) == gens1
    assert {
        (r["s"], r["p"], r["o"], r["g"]) for r in s2.decoded_dataset(first_gen=1).take_all()
    } == ancestry_expected(4)
