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


# ---------------------------------------------------------------------------
# round 3: non-string terms + generation-pruned lineage sweep
# ---------------------------------------------------------------------------


def test_prove_store_u32_terms(tmp_path):
    """The reference is generic over Ord terms and proves over u32 facts
    (src/prove.rs:629-678); prove_store now routes non-string premises
    through the JSON term boundary and returns native-typed
    instantiations."""
    import pyarrow as pa

    from rify_ray import B, Rule, U, engine

    prem = pa.table(
        {
            "s": pa.array([1, 2, 3], pa.uint32()),
            "p": pa.array([10, 10, 10], pa.uint32()),
            "o": pa.array([2, 3, 4], pa.uint32()),
            "g": pa.array([0, 0, 0], pa.uint32()),
        }
    )
    rules = [
        Rule.create([[U("a"), B(10), U("b"), B(0)]], [[U("a"), B(20), U("b"), B(0)]]),
        Rule.create(
            [[U("a"), B(20), U("b"), B(0)], [U("b"), B(20), U("c"), B(0)]],
            [[U("a"), B(20), U("c"), B(0)]],
        ),
    ]
    proof = engine.prove_store(prem, [(1, 20, 4, 0)], rules, str(tmp_path / "kg"),
                               num_partitions=2)
    assert proof, "expected a non-empty proof"
    assert all(
        isinstance(t, int) for a in proof for t in a.instantiations
    ), "instantiations must decode back to ints"
    v = engine.validate(rules, proof)
    assert (1, 20, 4, 0) in [tuple(f) for f in v.implied]


def test_prove_store_lineage_sweep_scans_each_generation_once(tmp_path):
    """The backward lineage walk is one newest→oldest sweep: every
    lineage generation is probed at most once (strictly decreasing gen
    numbers in the scan log), instead of per-BFS-level scans of ALL
    generations — a deep chain would otherwise pay O(depth²) scans."""
    import os

    import pyarrow as pa

    from rify_ray import engine
    from rify_ray.state import TripleStore

    n = 12
    prem = pa.table(
        {
            "s": [f"n{i}" for i in range(n - 1)],
            "p": ["succ"] * (n - 1),
            "o": [f"n{i+1}" for i in range(n - 1)],
            "g": ["default_graph"] * (n - 1),
        }
    )
    from rify_ray import B, Rule, U

    DG = "default_graph"
    rules = [
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
    store_path = str(tmp_path / "kg")
    proof = engine.prove_store(
        prem, [("n0", "reach", f"n{n-1}", DG)], rules, store_path, num_partitions=2
    )
    v = engine.validate(rules, proof)
    assert ("n0", "reach", f"n{n-1}", DG) in [tuple(f) for f in v.implied]
    # the walk left its per-generation scan log on the store handle
    store = TripleStore(store_path)
    lineage_gens = [
        d for d in os.listdir(os.path.join(store_path, "lineage")) if d.startswith("gen=")
    ]
    # scan_log is attached by prove_store to ITS store instance — re-walk
    # here to inspect it directly
    from rify_ray.engine import _encode_rules_hash, _walk_lineage_generations, hash_term_ids

    walk_rules = _encode_rules_hash(rules)
    univ = sorted({"n0", "reach", f"n{n-1}", DG})
    enc = dict(zip(univ, hash_term_ids(univ)))
    goal = (enc["n0"], enc["reach"], enc[f"n{n-1}"], enc[DG])
    arguments, scan_log = _walk_lineage_generations(
        os.path.join(store_path, "lineage"), {goal}, walk_rules, int, True
    )
    assert arguments, "walk must resolve the goal"
    gens_scanned = [g for g, _files in scan_log]
    assert gens_scanned == sorted(gens_scanned, reverse=True)
    assert len(gens_scanned) == len(set(gens_scanned)), "each gen scanned at most once"
    assert len(gens_scanned) <= len(lineage_gens)


def test_prove_store_after_incremental_maintenance(tmp_path):
    """Lineage stays consistent across the full maintenance lifecycle:
    build with lineage → add premises (lineage auto-continues) → prove a
    fact only derivable through the added premises → retract → the
    now-underivable goal exhausts, a surviving goal still proves."""
    facts = ancestry_facts(8)
    rules = ancestry_rules()
    path = str(tmp_path / "kg")
    engine.infer_store(
        _tbl(facts[:6]), rules, path, num_partitions=4, with_lineage=True
    )
    engine.add_premises_store(_tbl(facts[6:]), rules, path, num_partitions=4)
    # ring now closed: node_3 reaches node_1 only THROUGH the added edges
    wrap_goal = ("node_3", "ancestor", "node_1", DG)
    proof = engine.prove_store(_tbl(facts), [wrap_goal], rules, path, num_partitions=4)
    v = engine.validate(rules, proof)
    assert wrap_goal in v.implied
    assert v.assumed <= set(facts)
    # retract the ring-closing edges again
    engine.remove_premises_store(_tbl(facts[6:]), rules, path, num_partitions=4)
    with pytest.raises(ExhaustedSearchSpace):
        engine.prove_store(
            _tbl(facts[:6]), [wrap_goal], rules, path, num_partitions=4
        )
    path_goal = ("node_0", "ancestor", "node_3", DG)
    proof2 = engine.prove_store(
        _tbl(facts[:6]), [path_goal], rules, path, num_partitions=4
    )
    v2 = engine.validate(rules, proof2)
    assert path_goal in v2.implied
    assert v2.assumed <= set(facts[:6])


def _linear_chain(n):
    """Chain premises + LINEAR recursion rules: the fixpoint needs ~n
    rounds (one reach extension per round) — the long-fixpoint shape."""
    from rify_ray import B, Rule, U

    facts = [(f"c{i}", "parent", f"c{i+1}", DG) for i in range(n)]
    rules = [
        Rule.create(
            [[U("a"), B("parent"), U("b"), B(DG)]],
            [[U("a"), B("reach"), U("b"), B(DG)]],
        ),
        Rule.create(
            [
                [U("a"), B("parent"), U("b"), B(DG)],
                [U("b"), B("reach"), U("c"), B(DG)],
            ],
            [[U("a"), B("reach"), U("c"), B(DG)]],
        ),
    ]
    return facts, rules


def _lineage_dir_count(store_path):
    import os

    d = os.path.join(store_path, "lineage")
    return sum(
        1
        for g in os.listdir(d)
        if g.startswith("gen=") and not g.endswith((".new", ".old"))
    )


def test_long_fixpoint_lineage_compaction_and_proof(tmp_path):
    """100+ rounds with compaction: the lineage directory count stays
    bounded (compact_lineage folds alongside compact_derived) and the
    backward proof walk still resolves a whole-chain goal ACROSS the
    merged multi-round lineage directory (the loop-scan path)."""
    n = 110
    facts, rules = _linear_chain(n)
    path = str(tmp_path / "kg")
    goal = ("c0", "reach", f"c{n}", DG)
    proof = engine.prove_store(_tbl(facts), [goal], rules, path, num_partitions=4)
    # the fixpoint ran >100 rounds but compaction bounds the on-disk
    # generation count (fact store AND lineage)
    assert _lineage_dir_count(path) < 70
    import os

    lineage = os.path.join(path, "lineage")
    assert any(
        os.path.exists(os.path.join(lineage, g, "_merged"))
        for g in os.listdir(lineage)
        if g.startswith("gen=")
    )
    v = engine.validate(rules, proof)
    assert goal in v.implied
    assert v.assumed <= set(facts)


def test_retraction_across_compacted_lineage(tmp_path):
    """Retract from a store whose lineage was folded by compact_lineage:
    the overdeletion walk, the lineage filter (which must keep the
    merged marker) and the rederive still equal a fresh recompute."""
    n = 24
    facts, rules = _linear_chain(n)
    path = str(tmp_path / "kg")
    engine.infer_store(
        _tbl(facts), rules, path, num_partitions=4,
        with_lineage=True, compact_every=5,
    )
    assert _lineage_dir_count(path) < 20
    drop = [facts[n // 2]]
    s2 = engine.remove_premises_store(_tbl(drop), rules, path, num_partitions=4)
    full = engine.infer_store(
        _tbl([f for f in facts if f not in set(drop)]), rules,
        str(tmp_path / "full"), num_partitions=4, with_lineage=True,
    )
    got = {
        (r["s"], r["p"], r["o"], r["g"]) for r in s2.decoded_dataset().take_all()
    }
    want = {
        (r["s"], r["p"], r["o"], r["g"]) for r in full.decoded_dataset().take_all()
    }
    assert got == want
    # a goal inside the surviving prefix still proves over the filtered,
    # merged lineage
    goal = ("c0", "reach", f"c{n // 2}", DG)
    from rify_ray.engine import _walk_lineage_generations, _encode_rules_hash, hash_term_ids
    import os

    terms = sorted({t for t in goal})
    enc = dict(zip(terms, hash_term_ids(terms)))
    args, _log = _walk_lineage_generations(
        os.path.join(path, "lineage"),
        {tuple(enc[t] for t in goal)},
        _encode_rules_hash(rules),
        int,
        True,
    )
    assert tuple(enc[t] for t in goal) in args


def test_kg_prove_chain_query_contract(ray_session):
    """The public kg_prove_chain queries() entry: prove_store +
    validate end-to-end, assumed set == the succ premise chain, one
    goal_implied row — matches the DuckDB oracle at sf0.001."""
    import sys

    sys.path.insert(0, "/root/repo")
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    res = e.queries()["kg_prove_chain"](sf)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW nation AS SELECT * FROM read_parquet('{sf}/nation.parquet')"
    )
    want = con.execute(e.oracle_sql()["kg_prove_chain"]).arrow()
    key = lambda t: sorted(
        zip(*(t[c].to_pylist() for c in ("kind", "s", "p", "o", "g")))
    )
    assert key(res) == key(want)
    assert res.num_rows == want.num_rows > 1
    kinds = set(res["kind"].to_pylist())
    assert kinds == {"assumed", "goal_implied"}
