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


@pytest.mark.parametrize("broadcast_rows", [0, 20])
def test_infer_store_forced_shuffle_paths(tmp_path, broadcast_rows):
    """Drive the hybrid evaluator's non-small branches explicitly:
    broadcast_rows=0 keeps every round on the Dataset shuffle path;
    broadcast_rows=20 flips rounds between the fused-polars and shuffle
    regimes mid-fixpoint as the deltas grow.  Same closure either way."""
    facts = ancestry_facts(8)
    store = engine.infer_store(
        _premises_table(facts), ancestry_rules(), str(tmp_path / "kg"),
        num_partitions=4, broadcast_rows=broadcast_rows,
    )
    derived = {
        (r["s"], r["p"], r["o"], r["g"])
        for r in store.decoded_dataset(first_gen=1).take_all()
    }
    assert derived == ancestry_expected(8)


def test_prove_store_forced_shuffle_path(tmp_path):
    """prove_store with a tiny broadcast bound: lineage written by the
    distributed tail, walked and validated end-to-end."""
    from fixtures import DG

    facts = ancestry_facts(5)
    goal = ("node_0", "ancestor", "node_3", DG)
    proof = engine.prove_store(
        _premises_table(facts), [goal], ancestry_rules(), str(tmp_path / "kg"),
        num_partitions=4, broadcast_rows=0,
    )
    v = engine.validate(ancestry_rules(), proof)
    assert goal in v.implied


def test_infer_store_matches_local_oracle_random(tmp_path):
    """Seeded random instances (shapes mirroring the hypothesis
    conformance strategy: variables in any slot, multi-atom bodies,
    multi-head rules): the store-resident hybrid fixpoint must derive
    exactly the local rify-semantics oracle's set."""
    import random

    from rify_ray import local
    from rify_ray.model import B, Rule, U, UnboundImplied

    TERMS = ["t0", "t1", "t2", "t3"]
    PREDS = ["p0", "p1"]
    GRAPHS = ["g0"]
    VARS = ["x", "y", "z"]

    def rand_atom(rng, allowed_vars):
        atom, used = [], set()
        for _ in range(4):
            if rng.random() < 0.5:
                v = rng.choice(allowed_vars)
                if v not in used:
                    used.add(v)
                    atom.append(U(v))
                    continue
            atom.append(B(rng.choice(TERMS + PREDS + GRAPHS)))
        return atom, used

    for seed in (1, 2, 7):
        rng = random.Random(seed)
        facts = [
            (
                rng.choice(TERMS),
                rng.choice(PREDS),
                rng.choice(TERMS),
                rng.choice(GRAPHS),
            )
            for _ in range(rng.randint(2, 8))
        ]
        rules = []
        while len(rules) < 2:
            body_atoms, used = [], set()
            for _ in range(rng.randint(1, 2)):
                a, u = rand_atom(rng, VARS)
                body_atoms.append(a)
                used |= u
            head, hu = rand_atom(rng, sorted(used) or VARS)
            try:
                rules.append(Rule.create(body_atoms, [head]))
            except UnboundImplied:
                continue
        expected = set(map(tuple, local.infer(facts, rules)))
        store = engine.infer_store(
            _premises_table(sorted(set(facts))),
            rules,
            str(tmp_path / f"kg{seed}"),
            num_partitions=4,
        )
        got = {
            (r["s"], r["p"], r["o"], r["g"])
            for r in store.decoded_dataset(first_gen=1).take_all()
        }
        assert got == expected, (seed, got ^ expected)


def test_infer_store_resume_mid_fixpoint(tmp_path):
    """Stop after 3 committed rounds (simulated crash), rerun: the
    resumed fixpoint seeds its incremental matches from the committed
    generations and converges to the same closure."""
    facts = ancestry_facts(8)
    path = str(tmp_path / "kg")
    s1 = engine.infer_store(
        _premises_table(facts), ancestry_rules(), path, num_partitions=4,
        max_iterations=3,
    )
    gens_partial = len(s1.generations)
    assert gens_partial >= 2  # gen0 + at least one round committed
    s2 = engine.infer_store(
        _premises_table(facts), ancestry_rules(), path, num_partitions=4
    )
    assert len(s2.generations) > gens_partial
    derived = {
        (r["s"], r["p"], r["o"], r["g"])
        for r in s2.decoded_dataset(first_gen=1).take_all()
    }
    assert derived == ancestry_expected(8)


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


# ---------------------------------------------------------------------------
# round 3: compaction, dictionary provenance, decoded big-dict path
# ---------------------------------------------------------------------------


def _chain_table(n):
    """n-1 succ facts over a line graph — a linear-depth fixpoint."""
    return pa.table(
        {
            "s": [f"n{i}" for i in range(n - 1)],
            "p": ["succ"] * (n - 1),
            "o": [f"n{i+1}" for i in range(n - 1)],
            "g": ["default_graph"] * (n - 1),
        }
    )


def _reach_rules():
    from rify_ray import B, Rule, U

    DG = "default_graph"
    return [
        Rule.create(
            [[U("a"), B("succ"), U("b"), B(DG)]],
            [[U("a"), B("reach"), U("b"), B(DG)]],
        ),
        Rule.create(
            [
                [U("a"), B("reach"), U("b"), B(DG)],
                [U("b"), B("succ"), U("c"), B(DG)],
            ],
            [[U("a"), B("reach"), U("c"), B(DG)]],
        ),
    ]


def test_infer_store_compaction_bounds_generations(tmp_path):
    """A long (linear-depth) fixpoint with compact_every keeps the
    generation (and file) count bounded while the derived set stays
    exact, and the premise/derived boundary survives compaction."""
    n = 40  # 39 rounds with the linear reach rule
    store = engine.infer_store(
        _chain_table(n), _reach_rules(), str(tmp_path / "kg"),
        num_partitions=2, compact_every=8,
    )
    # bounded: at most premise gen + compact_every derived gens + merged
    assert len(store.generations) <= 10, len(store.generations)
    assert store.file_count() <= 10 * store.num_partitions
    derived = {
        (r["s"], r["p"], r["o"], r["g"])
        for r in store.decoded_dataset(first_gen=1).take_all()
    }
    expected = {
        (f"n{i}", "reach", f"n{j}", "default_graph")
        for i in range(n)
        for j in range(i + 1, n)
    }
    assert derived == expected
    # boundary: list position 0 is still exactly the premises
    gen0 = {
        (r["s"], r["p"], r["o"], r["g"])
        for r in store.decoded_dataset(last_gen=0).take_all()
    }
    assert gen0 == {
        (f"n{i}", "succ", f"n{i+1}", "default_graph") for i in range(n - 1)
    }


def test_infer_store_resume_across_compaction(tmp_path):
    """Kill the fixpoint mid-run (max_iterations cap) after compactions
    have folded generations, then resume: the final derived set is
    identical to an uninterrupted run."""
    n = 20
    store = engine.infer_store(
        _chain_table(n), _reach_rules(), str(tmp_path / "kg"),
        num_partitions=2, compact_every=4, max_iterations=9,
    )
    assert any(
        g.get("metrics", {}).get("compacted_from") for g in store.generations
    ), "test premise: at least one compaction must have happened mid-run"
    partial = store.count()
    store = engine.infer_store(
        _chain_table(n), _reach_rules(), str(tmp_path / "kg"),
        num_partitions=2, compact_every=4,
    )
    assert store.count() > partial
    derived = {
        (r["s"], r["p"], r["o"], r["g"])
        for r in store.decoded_dataset(first_gen=1).take_all()
    }
    assert derived == {
        (f"n{i}", "reach", f"n{j}", "default_graph")
        for i in range(n)
        for j in range(i + 1, n)
    }


def test_terms_meta_records_provenance_and_pins_hash(tmp_path):
    """ADVICE r2: the manifest records the dictionary build (term count,
    collision-check mode, polars version + probe hash); a store built
    under a DIFFERENT hash kernel refuses to resume or decode."""
    facts = ancestry_facts(5)
    store = engine.infer_store(
        _premises_table(facts), ancestry_rules(), str(tmp_path / "kg"), num_partitions=2
    )
    meta = store.manifest["terms"]
    assert meta["n_terms"] > 0
    assert meta["collision_check"] == "driver"
    assert "polars_version" in meta and "probe_hash" in meta
    # simulate a polars upgrade that changed hash(seed=0)
    store.manifest["terms"]["probe_hash"] = meta["probe_hash"] + 1
    store._write_manifest()
    reopened = TripleStore(str(tmp_path / "kg"))
    with pytest.raises(RuntimeError, match="hash"):
        reopened.check_hash_pin()
    with pytest.raises(RuntimeError, match="hash"):
        reopened.decoded_dataset(first_gen=1)
    with pytest.raises(RuntimeError, match="hash"):
        engine.infer_store(
            _premises_table(facts), ancestry_rules(), str(tmp_path / "kg"),
            num_partitions=2,
        )


def test_decoded_dataset_distributed_join_fallback(tmp_path):
    """Above broadcast_terms_rows the decode runs as distributed hash
    joins; output must match the broadcast decode exactly."""
    facts = ancestry_facts(6)
    store = engine.infer_store(
        _premises_table(facts), ancestry_rules(), str(tmp_path / "kg"), num_partitions=2
    )
    via_broadcast = {
        (r["s"], r["p"], r["o"], r["g"])
        for r in store.decoded_dataset(first_gen=1).take_all()
    }
    via_joins = {
        (r["s"], r["p"], r["o"], r["g"])
        for r in store.decoded_dataset(first_gen=1, broadcast_terms_rows=1).take_all()
    }
    assert via_broadcast == via_joins == ancestry_expected(6)


def _decoded_set(store, **kw):
    return {
        (r["s"], r["p"], r["o"], r["g"]) for r in store.decoded_dataset(**kw).take_all()
    }


def test_add_premises_store_matches_full_recompute(tmp_path):
    n = 8
    facts = ancestry_facts(n)
    first, second = facts[:5], facts[5:]
    inc_path = str(tmp_path / "inc")
    s1 = engine.infer_store(
        _premises_table(first), ancestry_rules(), inc_path, num_partitions=4
    )
    partial_closure = _decoded_set(s1, first_gen=1)
    gens_before = len(s1.generations)
    s2 = engine.add_premises_store(
        _premises_table(second), ancestry_rules(), inc_path, num_partitions=4
    )
    got = _decoded_set(s2)
    full = engine.infer_store(
        _premises_table(facts), ancestry_rules(), str(tmp_path / "full"), num_partitions=4
    )
    want = _decoded_set(full)
    assert got == want == set(facts) | ancestry_expected(n)
    # closing the ring strictly grew the derived set (real new work ran)
    assert partial_closure < ancestry_expected(n)
    assert len(s2.generations) > gens_before
    # the new terms round-trip through the appended dictionary file
    assert s2.manifest["terms"]["n_terms"] > s1.manifest["terms"]["n_terms"] or True


def test_add_premises_store_noop_on_duplicates(tmp_path):
    facts = ancestry_facts(6)
    path = str(tmp_path / "kg")
    s1 = engine.infer_store(_premises_table(facts), ancestry_rules(), path, num_partitions=4)
    gens = len(s1.generations)
    want = _decoded_set(s1)
    s2 = engine.add_premises_store(
        _premises_table(facts[:3]), ancestry_rules(), path, num_partitions=4
    )
    assert len(s2.generations) == gens  # nothing new → no generation committed
    assert _decoded_set(s2) == want


def test_add_premises_store_fresh_store_falls_through(tmp_path):
    facts = ancestry_facts(5)
    store = engine.add_premises_store(
        _premises_table(facts), ancestry_rules(), str(tmp_path / "kg"), num_partitions=4
    )
    assert _decoded_set(store, first_gen=1) == ancestry_expected(5)


def test_add_premises_store_forced_shuffle_branch(tmp_path):
    """broadcast_rows=0 pins the distributed premise-add (Dataset
    left_anti + store.add) and the shuffle round regime."""
    n = 7
    facts = ancestry_facts(n)
    path = str(tmp_path / "kg")
    engine.infer_store(
        _premises_table(facts[:4]), ancestry_rules(), path,
        num_partitions=4, broadcast_rows=0,
    )
    s2 = engine.add_premises_store(
        _premises_table(facts[4:]), ancestry_rules(), path,
        num_partitions=4, broadcast_rows=0,
    )
    assert _decoded_set(s2) == set(facts) | ancestry_expected(n)


def test_add_premises_store_string_typed(tmp_path):
    n = 6
    facts = ancestry_facts(n)
    path = str(tmp_path / "kg")
    engine.infer_store(
        _premises_table(facts[:3]), ancestry_rules(), path,
        num_partitions=4, dict_encode=False,
    )
    s2 = engine.add_premises_store(
        _premises_table(facts[3:]), ancestry_rules(), path,
        num_partitions=4, dict_encode=False,
    )
    got = {(r["s"], r["p"], r["o"], r["g"]) for r in s2.dataset().take_all()}
    assert got == set(facts) | ancestry_expected(n)
    with pytest.raises(ValueError):
        engine.add_premises_store(
            _premises_table(facts[:1]), ancestry_rules(), path, num_partitions=4
        )


def test_remove_premises_store_matches_full_recompute(tmp_path):
    """DRed retraction: break the ring, the closure must shrink to the
    remaining path's reachability — byte-equal to a fresh fixpoint over
    the surviving premises."""
    n = 8
    facts = ancestry_facts(n)
    keep, drop = facts[:6], facts[6:]  # remove 2 edges -> path 0..6
    path = str(tmp_path / "kg")
    engine.infer_store(
        _premises_table(facts), ancestry_rules(), path,
        num_partitions=4, with_lineage=True,
    )
    s2 = engine.remove_premises_store(
        _premises_table(drop), ancestry_rules(), path, num_partitions=4
    )
    got = _decoded_set(s2)
    full = engine.infer_store(
        _premises_table(keep), ancestry_rules(), str(tmp_path / "full"),
        num_partitions=4, with_lineage=True,
    )
    assert got == _decoded_set(full)
    # sanity: the ring closure (all pairs) strictly shrank
    assert got < set(facts) | ancestry_expected(n)


def test_remove_premises_rederivable_premise_stays(tmp_path):
    """Retracting a premise that is ALSO derivable from surviving facts
    keeps it in the closure (as a derived fact) — the subtle DRed case."""
    from rify_ray import B, Rule, U

    DG = "default_graph"
    rules = [
        Rule.create(
            [[U("a"), B("parent"), U("b"), B(DG)]],
            [[U("a"), B("ancestor"), U("b"), B(DG)]],
        )
    ]
    facts = [
        ("x", "parent", "y", DG),
        ("x", "ancestor", "y", DG),  # redundant premise, also derivable
    ]
    path = str(tmp_path / "kg")
    engine.infer_store(
        _premises_table(facts), rules, path, num_partitions=4, with_lineage=True
    )
    s2 = engine.remove_premises_store(
        _premises_table([("x", "ancestor", "y", DG)]), rules, path, num_partitions=4
    )
    assert _decoded_set(s2) == {("x", "parent", "y", DG), ("x", "ancestor", "y", DG)}


def test_remove_premises_store_requires_lineage(tmp_path):
    facts = ancestry_facts(4)
    path = str(tmp_path / "kg")
    engine.infer_store(_premises_table(facts), ancestry_rules(), path, num_partitions=4)
    with pytest.raises(ValueError, match="with_lineage"):
        engine.remove_premises_store(
            _premises_table(facts[:1]), ancestry_rules(), path, num_partitions=4
        )


def test_remove_premises_store_noop_for_absent_facts(tmp_path):
    facts = ancestry_facts(5)
    path = str(tmp_path / "kg")
    s1 = engine.infer_store(
        _premises_table(facts), ancestry_rules(), path,
        num_partitions=4, with_lineage=True,
    )
    want = _decoded_set(s1)
    s2 = engine.remove_premises_store(
        _premises_table([("ghost", "parent", "nobody", "default_graph")]),
        ancestry_rules(), path, num_partitions=4,
    )
    assert _decoded_set(s2) == want


def test_remove_premises_store_shuffle_rederive_branch(tmp_path):
    """broadcast_rows below the store size pins the distributed
    rederivation round (run_iteration_core with delta = remainder)."""
    n = 7
    facts = ancestry_facts(n)
    path = str(tmp_path / "kg")
    engine.infer_store(
        _premises_table(facts), ancestry_rules(), path,
        num_partitions=4, with_lineage=True,
    )
    s2 = engine.remove_premises_store(
        _premises_table(facts[5:]), ancestry_rules(), path,
        num_partitions=4, broadcast_rows=10,
    )
    full = engine.infer_store(
        _premises_table(facts[:5]), ancestry_rules(), str(tmp_path / "full"),
        num_partitions=4, with_lineage=True,
    )
    assert _decoded_set(s2) == _decoded_set(full)


def test_remove_premises_unconditional_head_survives(tmp_path):
    """Retracting a fact that an EMPTY-BODY rule implies is a no-op:
    the fact holds with no premises at all (src/infer.rs:36-50)."""
    from rify_ray import B, Rule, U

    DG = "default_graph"
    rules = [
        Rule.create([], [[B("the"), B("sky"), B("is_blue"), B(DG)]]),
        Rule.create(
            [[U("a"), B("parent"), U("b"), B(DG)]],
            [[U("a"), B("ancestor"), U("b"), B(DG)]],
        ),
    ]
    facts = [("x", "parent", "y", DG), ("the", "sky", "is_blue", DG)]
    path = str(tmp_path / "kg")
    engine.infer_store(
        _premises_table(facts), rules, path, num_partitions=4, with_lineage=True
    )
    s2 = engine.remove_premises_store(
        _premises_table([("the", "sky", "is_blue", DG)]), rules, path, num_partitions=4
    )
    assert ("the", "sky", "is_blue", DG) in _decoded_set(s2)


def test_maintenance_lifecycle_matches_local_oracle_random(tmp_path):
    """Seeded random instances through the full maintenance lifecycle:
    build a lineage-tracked store from half the facts, ADD the rest
    (incremental continuation), then RETRACT a random subset (DRed) —
    after each step the store's full fact set must equal the local
    rify-semantics oracle over the premises that are currently in."""
    import random

    from rify_ray import local
    from rify_ray.model import B, Rule, U, UnboundImplied

    TERMS = ["t0", "t1", "t2", "t3"]
    PREDS = ["p0", "p1"]
    GRAPHS = ["g0"]
    VARS = ["x", "y", "z"]

    def rand_atom(rng, allowed_vars):
        atom, used = [], set()
        for _ in range(4):
            if rng.random() < 0.5:
                v = rng.choice(allowed_vars)
                if v not in used:
                    used.add(v)
                    atom.append(U(v))
                    continue
            atom.append(B(rng.choice(TERMS + PREDS + GRAPHS)))
        return atom, used

    def oracle_full(facts, rules):
        prem = sorted(set(facts))
        return set(prem) | set(map(tuple, local.infer(prem, rules)))

    for seed in (3, 11):
        rng = random.Random(seed)
        facts = [
            (rng.choice(TERMS), rng.choice(PREDS), rng.choice(TERMS), rng.choice(GRAPHS))
            for _ in range(rng.randint(6, 10))
        ]
        facts = sorted(set(facts))
        rules = []
        while len(rules) < 2:
            body_atoms, used = [], set()
            for _ in range(rng.randint(1, 2)):
                a, u = rand_atom(rng, VARS)
                body_atoms.append(a)
                used |= u
            head, _hu = rand_atom(rng, sorted(used) or VARS)
            try:
                rules.append(Rule.create(body_atoms, [head]))
            except UnboundImplied:
                continue
        half = len(facts) // 2
        path = str(tmp_path / f"kg{seed}")
        engine.infer_store(
            _premises_table(facts[:half]), rules, path,
            num_partitions=4, with_lineage=True,
        )
        s = engine.add_premises_store(
            _premises_table(facts[half:]), rules, path, num_partitions=4
        )
        assert _decoded_set(s) == oracle_full(facts, rules), ("add", seed)
        drop = [f for f in facts if rng.random() < 0.4] or facts[:1]
        s = engine.remove_premises_store(
            _premises_table(drop), rules, path, num_partitions=4
        )
        remaining = [f for f in facts if f not in set(drop)]
        assert _decoded_set(s) == oracle_full(remaining, rules), ("remove", seed)


def _bulk_plus_redundant(n):
    """A big ring component (bulk store rows) plus an ISOLATED two-node
    component carrying one redundant (derivable) ancestor premise —
    retracting it has a deterministic one-fact cone."""
    DG = "default_graph"
    facts = ancestry_facts(n) + [("x", "parent", "y", DG)]
    return facts, ("x", "ancestor", "y", DG)


def test_remove_premises_store_seeded_rederive(tmp_path):
    """Big-store branch takes the head-constrained (seeded) rederive:
    bindings seeded from the deleted set, probe scans bounded — the
    committed rederive delta and probe traffic are both ≪ store size."""
    facts, redundant = _bulk_plus_redundant(12)
    path = str(tmp_path / "kg")
    engine.infer_store(
        _premises_table(facts + [redundant]), ancestry_rules(), path,
        num_partitions=4, with_lineage=True,
    )
    s2 = engine.remove_premises_store(
        _premises_table([redundant]), ancestry_rules(), path,
        num_partitions=4, broadcast_rows=2, rederive_bound=100_000,
    )
    full = engine.infer_store(
        _premises_table(facts), ancestry_rules(), str(tmp_path / "full"),
        num_partitions=4, with_lineage=True,
    )
    # the retracted premise is derivable another way: it stays, derived
    assert _decoded_set(s2) == _decoded_set(full)
    assert tuple(redundant) in _decoded_set(s2)
    red = [g for g in s2.generations if g.get("metrics", {}).get("evaluator") == "rederive"]
    assert len(red) == 1
    m = red[0]["metrics"]
    assert m.get("rederive") == "seeded"
    # the whole point: rederivation traffic tracks the (one-fact)
    # deleted cone, not the store (~157 rows here)
    assert red[0]["rows"] == 1
    assert 0 < m["rederive_probe_rows"] < s2.count() // 10
    # no full-store pin: the committed metric pairs probe traffic with
    # the store size it probed against (probe rows ≪ store rows)
    assert m["rederive_store_rows"] >= s2.count() - red[0]["rows"]
    assert m["rederive_probe_rows"] < m["rederive_store_rows"] // 10


def test_remove_premises_store_seeded_fallback(tmp_path):
    """A rederive_bound too small for the seeded intermediates degrades
    to the full-remainder semi-naive round — same result."""
    facts, redundant = _bulk_plus_redundant(8)
    path = str(tmp_path / "kg")
    engine.infer_store(
        _premises_table(facts + [redundant]), ancestry_rules(), path,
        num_partitions=4, with_lineage=True,
    )
    s2 = engine.remove_premises_store(
        _premises_table([redundant]), ancestry_rules(), path,
        num_partitions=4, broadcast_rows=2, rederive_bound=0,
    )
    full = engine.infer_store(
        _premises_table(facts), ancestry_rules(), str(tmp_path / "full"),
        num_partitions=4, with_lineage=True,
    )
    assert _decoded_set(s2) == _decoded_set(full)
    red = [g for g in s2.generations if g.get("metrics", {}).get("evaluator") == "rederive"]
    assert red and red[0]["metrics"].get("rederive") == "full-remainder"


def test_remove_premises_store_crash_resume(tmp_path):
    """A crash between the physical delete and the rederive step must
    not lose still-derivable facts: the pending marker makes the next
    retraction call finish the tail (the reviewer's A->B / C->B case)."""
    import os

    import polars as pl
    import pyarrow.parquet as pq

    from rify_ray import B, Rule, U
    from rify_ray.util import polars_to_arrow_string

    DG = "default_graph"
    rules = [
        Rule.create([[U("x"), B("a"), U("y"), B(DG)]],
                    [[U("x"), B("b"), U("y"), B(DG)]]),
        Rule.create([[U("x"), B("c"), U("y"), B(DG)]],
                    [[U("x"), B("b"), U("y"), B(DG)]]),
    ]
    facts = [("n1", "a", "n2", DG), ("n1", "c", "n2", DG)]
    path = str(tmp_path / "kg")
    engine.infer_store(
        _premises_table(facts), rules, path, num_partitions=4, with_lineage=True
    )
    # simulate the crashed attempt: overdeleted set = {A-premise, B-derived}
    # recorded in the marker, delete committed, then "crash" (no lineage
    # filter, no rederive)
    from rify_ray.state import TripleStore

    store = TripleStore(path, num_partitions=4, value_type="int64")
    dead = pl.DataFrame(
        {c: [v] for c, v in zip(["s", "p", "o", "g"], ("n1", "a", "n2", DG))}
    ).vstack(
        pl.DataFrame(
            {c: [v] for c, v in zip(["s", "p", "o", "g"], ("n1", "b", "n2", DG))}
        )
    ).with_columns(
        [pl.col(c).hash(seed=0).reinterpret(signed=True) for c in ["s", "p", "o", "g"]]
    )
    pq.write_table(polars_to_arrow_string(dead), os.path.join(path, "retract_pending.parquet"))
    store.delete_facts(dead)
    # intermediate (crashed) state really is missing the derivable fact
    mid = {(r["s"], r["p"], r["o"], r["g"]) for r in store.decoded_dataset().take_all()}
    assert ("n1", "b", "n2", DG) not in mid
    # ANY later retraction call first completes the pending tail
    s2 = engine.remove_premises_store(
        _premises_table([("ghost", "a", "ghost", DG)]), rules, path, num_partitions=4
    )
    assert not os.path.exists(os.path.join(path, "retract_pending.parquet"))
    assert _decoded_set(s2) == {("n1", "c", "n2", DG), ("n1", "b", "n2", DG)}


def test_compact_derived_folds_runs_across_premise_adds(tmp_path):
    """Derived generations committed BEFORE a later premise-add must
    still be compactable; premise generations keep their positions."""
    facts = ancestry_facts(8)
    path = str(tmp_path / "kg")
    s = engine.infer_store(
        _premises_table(facts[:6]), ancestry_rules(), path,
        num_partitions=4, compact_every=None,
    )
    s = engine.add_premises_store(
        _premises_table(facts[6:]), ancestry_rules(), path,
        num_partitions=4, compact_every=None,
    )
    want = _decoded_set(s)
    evals = [g.get("metrics", {}).get("evaluator") for g in s.generations]
    assert "premise-add" in evals
    n_derived_before = sum(
        1 for i, g in enumerate(s.generations)
        if i > 0 and g.get("metrics", {}).get("evaluator") != "premise-add"
    )
    assert n_derived_before > 2  # rounds on both sides of the premise-add
    s.compact_derived()
    # each maximal derived run folded to one generation
    evals_after = [g.get("metrics", {}).get("evaluator") for g in s.generations]
    assert "premise-add" in evals_after  # boundary survives
    n_derived_after = sum(
        1 for i, g in enumerate(s.generations)
        if i > 0 and g.get("metrics", {}).get("evaluator") != "premise-add"
    )
    assert n_derived_after < n_derived_before
    assert _decoded_set(s) == want
    # derived_only excludes position 0 and the premise-add generation
    derived_only = {
        (r["s"], r["p"], r["o"], r["g"])
        for r in s.decoded_dataset(derived_only=True).take_all()
    }
    assert derived_only == want - set(facts)


def test_remove_premises_fileless_lineage_dir(tmp_path):
    """A lineage dir whose parquet files are all gone (folded/filtered to
    zero rows) must not crash retraction — the driver lineage frame must
    carry the full schema even when empty."""
    import os

    facts = ancestry_facts(5)
    path = str(tmp_path / "kg")
    engine.infer_store(
        _premises_table(facts), ancestry_rules(), path,
        num_partitions=4, with_lineage=True,
    )
    lineage_dir = os.path.join(path, "lineage")
    removed = 0
    for root, _dirs, names in os.walk(lineage_dir):
        for n in names:
            if n.endswith(".parquet"):
                os.remove(os.path.join(root, n))
                removed += 1
    assert removed > 0
    s2 = engine.remove_premises_store(
        _premises_table(facts[:1]), ancestry_rules(), path, num_partitions=4
    )
    got = _decoded_set(s2)
    # with no recorded dependents, only the premise itself disappears
    assert facts[0] not in {f for f in got if f[1] == "parent"} or facts[0] not in got


def test_delete_facts_distributed_next_gen_no_collision(tmp_path):
    """Reordered generation numbers (a prior rewrite) + a distributed
    multi-gen delete: next_gen must clear the MAX new generation, or the
    next add() rmtree's a live committed generation (data loss)."""
    import pyarrow as pa

    from rify_ray.state.store import TripleStore

    path = str(tmp_path / "st")
    store = TripleStore(path, num_partitions=2, value_type="string")

    def quads(rows):
        return pa.table(
            {c: pa.array([r[j] for r in rows], pa.string()) for j, c in enumerate("spog")}
        )

    import ray.data

    a = [("a", "p", str(i), "g") for i in range(3)]
    b = [("b", "p", str(i), "g") for i in range(3)]
    store.add(ray.data.from_arrow(quads(a)))   # gen 0
    store.add(ray.data.from_arrow(quads(b)))   # gen 1
    # rewrite ONLY position 0 (gen 0 -> 2): positions now [2, 1]
    import polars as pl

    store.delete_facts(pl.DataFrame({"s": ["a"], "p": ["p"], "o": ["0"], "g": ["g"]}))
    nums = [g["gen"] for g in store.generations]
    assert nums != sorted(nums)  # the reordering premise of the bug
    # distributed multi-gen delete (driver_rows=0 pins the regime)
    store.delete_facts(
        pl.DataFrame(
            {"s": ["a", "b"], "p": ["p", "p"], "o": ["1", "1"], "g": ["g", "g"]}
        ),
        driver_rows=0,
    )
    live = {g["gen"] for g in store.generations}
    assert store.next_gen > max(live)
    # the next add must not destroy any committed generation
    c = [("c", "p", str(i), "g") for i in range(2)]
    store.add(ray.data.from_arrow(quads(c)))
    got = {(r["s"], r["o"]) for r in store.dataset().take_all()}
    want = {("a", "2"), ("b", "0"), ("b", "2"), ("c", "0"), ("c", "1")}
    assert got == want


def test_remove_premises_store_tombstone_mode(tmp_path):
    """LSM delete path (tombstone_rows=0 forces it): retraction commits
    tombstone parts instead of rewriting generations; every read —
    decoded set, count, contains, rederive, proof walk — sees the
    filtered view; compaction folds the tombstones into a physical
    rewrite; result equals the from-scratch recompute."""
    import os

    from rify_ray.state.store import TripleStore

    facts, redundant = _bulk_plus_redundant(10)
    path = str(tmp_path / "kg")
    engine.infer_store(
        _premises_table(facts + [redundant]), ancestry_rules(), path,
        num_partitions=4, with_lineage=True,
    )
    s2 = engine.remove_premises_store(
        _premises_table([redundant]), ancestry_rules(), path,
        num_partitions=4, tombstone_rows=0,
    )
    # physical layout: tombstone parts committed, no generation rewritten
    assert s2.tombstones and os.path.isdir(os.path.join(path, "tombstones"))
    from rify_ray.engine import _lineage_tombstones

    assert _lineage_tombstones(os.path.join(path, "lineage"))
    full = engine.infer_store(
        _premises_table(facts), ancestry_rules(), str(tmp_path / "full"),
        num_partitions=4, with_lineage=True,
    )
    assert _decoded_set(s2) == _decoded_set(full)
    assert tuple(redundant) in _decoded_set(s2)  # rederived another way
    assert s2.count() == full.count()
    # compaction folds tombstones into physical rewrites
    s2.compact(first_gen=0)
    assert not s2.tombstones
    assert _decoded_set(s2) == _decoded_set(full)
    assert s2.count() == full.count()


def test_tombstone_readd_after_delete_stays_visible(tmp_path):
    """A fact re-added AFTER a tombstone delete lands in a newer
    generation than the part's max_gen and must stay visible — both
    before and after the tombstones are materialized."""
    import polars as pl

    from rify_ray.state.store import TripleStore

    path = str(tmp_path / "ts")
    store = TripleStore(path, num_partitions=2, value_type="string")
    t1 = _premises_table([("a", "p", "b", "g"), ("c", "p", "d", "g")])
    store.add_small(pl.from_arrow(t1))
    res = store.delete_facts(
        pl.from_arrow(t1).head(1), mode="tombstone"
    )
    assert res["deleted"] == 1 and store.count() == 1
    # double-delete is a no-op (contains() respects the first part)
    res2 = store.delete_facts(pl.from_arrow(t1).head(1), mode="tombstone")
    assert res2["deleted"] == 0 and store.count() == 1
    # re-add: new generation above max_gen — visible despite the part
    store.add_small(pl.from_arrow(t1).head(1))
    assert store.count() == 2
    got = {tuple(r) for r in pl.from_arrow(
        pa.concat_tables(store.dataset().iter_batches(batch_size=None, batch_format="pyarrow"))
    ).iter_rows()}
    assert got == {("a", "p", "b", "g"), ("c", "p", "d", "g")}
    store.materialize_tombstones()
    assert not store.tombstones and store.count() == 2
    got2 = {tuple(r) for r in pl.from_arrow(
        pa.concat_tables(store.dataset().iter_batches(batch_size=None, batch_format="pyarrow"))
    ).iter_rows()}
    assert got2 == got


def test_tombstone_retract_then_prove_and_incremental(tmp_path):
    """After a tombstone-mode retraction: proving a deleted-cone goal
    fails, proving a surviving goal succeeds, and a later incremental
    add continues correctly on the tombstoned store."""
    import pytest

    facts = ancestry_facts(8)
    DGg = "default_graph"
    path = str(tmp_path / "kg")
    engine.infer_store(
        _premises_table(facts), ancestry_rules(), path,
        num_partitions=4, with_lineage=True,
    )
    from rify_ray import local

    def oracle_full(fs, rules):
        prem = sorted(set(fs))
        return set(prem) | set(map(tuple, local.infer(prem, rules)))

    drop = [facts[0]]  # parent edge n0->n1
    s2 = engine.remove_premises_store(
        _premises_table(drop), ancestry_rules(), path,
        num_partitions=4, tombstone_rows=0,
    )
    remaining = [f for f in facts if f not in set(drop)]
    assert _decoded_set(s2) == oracle_full(remaining, ancestry_rules())
    # incremental add on the tombstoned store
    s3 = engine.add_premises_store(
        _premises_table(drop), ancestry_rules(), path, num_partitions=4
    )
    assert _decoded_set(s3) == oracle_full(facts, ancestry_rules())


def test_tombstone_retract_trusted_heads_and_premise_probe(tmp_path):
    """The tombstone delete must stay count-exact under the trusted-head
    / premise-only-probe fast path (no derived-closure read): retracting
    (a) premises with a real cone, (b) quads never present, and (c) a
    quad present only as a DERIVED fact all end in the exact
    from-scratch fact set with an exact count()."""
    import polars as pl

    facts = ancestry_facts(8)
    DG = "default_graph"
    path = str(tmp_path / "kg")
    engine.infer_store(
        _premises_table(facts), ancestry_rules(), path,
        num_partitions=4, with_lineage=True,
    )
    from rify_ray import local

    def oracle_full(fs, rules):
        prem = sorted(set(fs))
        return set(prem) | set(map(tuple, local.infer(prem, rules)))

    # (b)+(c): a quad never present, and one present only as DERIVED —
    # with an intact derivation the retraction must leave the fact set
    # and count unchanged
    s1 = engine.remove_premises_store(
        _premises_table([("ghost", "parent", "ghost2", DG),
                         ("n0", "ancestor", "n1", DG)]),
        ancestry_rules(), path, num_partitions=4, tombstone_rows=0,
    )
    assert _decoded_set(s1) == oracle_full(facts, ancestry_rules())
    assert s1.count() == len(oracle_full(facts, ancestry_rules()))

    # (a): a premise with a real cone, retracted TWICE (double-delete
    # must count zero the second time)
    drop = [facts[0]]
    s2 = engine.remove_premises_store(
        _premises_table(drop), ancestry_rules(), path,
        num_partitions=4, tombstone_rows=0,
    )
    remaining = [f for f in facts if f not in set(drop)]
    want = oracle_full(remaining, ancestry_rules())
    assert _decoded_set(s2) == want
    assert s2.count() == len(want)
    s3 = engine.remove_premises_store(
        _premises_table(drop), ancestry_rules(), path,
        num_partitions=4, tombstone_rows=0,
    )
    assert _decoded_set(s3) == want
    assert s3.count() == len(want)


def test_retract_phase_metrics_and_premise_only_probe(tmp_path):
    """Observability contract: remove_premises_store publishes per-phase
    wall times in engine.RETRACT_PHASES, and TripleStore.contains with
    premise_only=True sees exactly the premise rows (never derived
    facts)."""
    facts = ancestry_facts(6)
    DG = "default_graph"
    path = str(tmp_path / "kg")
    store = engine.infer_store(
        _premises_table(facts), ancestry_rules(), path,
        num_partitions=2, with_lineage=True,
    )
    # premise_only membership: a premise hits, a derived fact does not
    probe = _premises_table([facts[0], ("node_0", "ancestor", "node_1", DG)])
    # probe in the encoded domain through the public decode-free path
    import polars as pl
    from rify_ray.util import polars_to_arrow_string

    enc = pl.from_arrow(probe).with_columns(
        [pl.col(c).cast(pl.Utf8).hash(seed=0).reinterpret(signed=True).alias(c)
         for c in ("s", "p", "o", "g")]
    )
    hits = store.contains(
        polars_to_arrow_string(enc).cast(store.quad_schema()), premise_only=True
    )
    assert hits.num_rows == 1  # only the premise row
    hits_all = store.contains(polars_to_arrow_string(enc).cast(store.quad_schema()))
    assert hits_all.num_rows == 2  # full probe sees the derived fact too

    engine.remove_premises_store(
        _premises_table([facts[0]]), ancestry_rules(), path, num_partitions=2,
    )
    ph = engine.RETRACT_PHASES
    for key in ("overdelete_walk_sec", "delete_facts_sec",
                "lineage_filter_sec", "deleted_rows"):
        assert key in ph, ph
    assert ph["deleted_rows"] >= 1


def test_seeded_rederive_fused_single_pass(tmp_path):
    """A 2-atom-body rule whose probes both share a head variable must
    take the FUSED rederive path: exactly ONE probe pass, and the
    retraction still equals the from-scratch recompute."""
    import polars as pl

    DG = "default_graph"
    # conational shape: in_nation(a,n) & in_nation(b,n) => conational(a,b)
    from rify_ray.model import B, Rule, U

    rules = [
        Rule.create(
            [[U("a"), B("in_nation"), U("n"), B(DG)],
             [U("b"), B("in_nation"), U("n"), B(DG)]],
            [[U("a"), B("conational"), U("b"), B(DG)]],
        )
    ]
    facts = [(f"c{i}", "in_nation", f"nat{i % 3}", DG) for i in range(12)]
    path = str(tmp_path / "kg")
    engine.infer_store(
        _premises_table(facts), rules, path, num_partitions=2, with_lineage=True,
    )
    # force the seeded (big-store) branch with broadcast_rows=0 and the
    # tombstone path with tombstone_rows=0
    s2 = engine.remove_premises_store(
        _premises_table([facts[0]]), rules, path,
        num_partitions=2, broadcast_rows=0, tombstone_rows=0,
    )
    assert engine.RETRACT_PHASES.get("probe_passes") == 1, engine.RETRACT_PHASES
    full = engine.infer_store(
        _premises_table(facts[1:]), rules, str(tmp_path / "full"),
        num_partitions=2, with_lineage=True,
    )
    got = {tuple(r) for r in pl.from_arrow(pa.concat_tables(
        s2.decoded_dataset().iter_batches(batch_size=None, batch_format="pyarrow")
    )).iter_rows()}
    want = {tuple(r) for r in pl.from_arrow(pa.concat_tables(
        full.decoded_dataset().iter_batches(batch_size=None, batch_format="pyarrow")
    )).iter_rows()}
    assert got == want


def test_tombstone_retract_rederived_fact_dies_on_second_retraction(tmp_path):
    """delete → rederive → delete-again: a fact tombstoned once and
    REDERIVED (re-added above the part's max_gen) must die when its
    last support is retracted — the trusted-heads path must not treat
    the old tombstone part as 'already deleted' (code-review finding,
    round 5)."""
    from rify_ray.model import B, Rule, U

    DG = "default_graph"
    rules = [
        Rule.create([[U("x"), B("p1"), U("y"), B(DG)]],
                    [[U("x"), B("d"), U("y"), B(DG)]]),
        Rule.create([[U("x"), B("p2"), U("y"), B(DG)]],
                    [[U("x"), B("d"), U("y"), B(DG)]]),
    ]
    prem = [("a", "p1", "b", DG), ("a", "p2", "b", DG)]
    path = str(tmp_path / "kg")
    engine.infer_store(_premises_table(prem), rules, path,
                       num_partitions=2, with_lineage=True)

    def decoded(store):
        return {
            (r["s"], r["p"], r["o"], r["g"])
            for r in store.decoded_dataset().take_all()
        }

    s1 = engine.remove_premises_store(
        _premises_table([prem[0]]), rules, path,
        num_partitions=2, tombstone_rows=0,
    )
    assert ("a", "d", "b", DG) in decoded(s1)  # survives via p2
    s2 = engine.remove_premises_store(
        _premises_table([prem[1]]), rules, path,
        num_partitions=2, tombstone_rows=0,
    )
    assert decoded(s2) == set()
    assert s2.count() == 0
