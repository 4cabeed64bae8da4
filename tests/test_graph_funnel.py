"""Graph predicate stats / top-degree + ordered funnel vs brute-force
Python references."""

import pyarrow as pa
import pytest

QUADS = [
    ("a", "knows", "b", "g"),
    ("a", "knows", "c", "g"),
    ("b", "knows", "c", "g"),
    ("a", "likes", "c", "g"),
    ("c", "likes", "c", "g"),
    ("a", "knows", "b", "g2"),  # duplicate (s,p,o) in another graph
]


def _quads_ds():
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {c: pa.array([q[j] for q in QUADS], pa.string()) for j, c in enumerate("spog")}
        )
    ).repartition(3)


def _collect(ds):
    tabs = [
        b
        for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows and b.num_columns
    ]
    return pa.concat_tables(tabs) if tabs else None


def test_predicate_stats(ray_session):
    from rify_ray.stages.graph import predicate_stats

    out = _collect(predicate_stats(_quads_ds())).to_pylist()
    got = {r["p"]: (r["n_facts"], r["n_subjects"], r["n_objects"]) for r in out}
    # facts count every quad row; distincts are per (p, entity)
    assert got == {"knows": (4, 2, 2), "likes": (2, 2, 1)}


def test_top_degree_out_and_in(ray_session):
    from rify_ray.stages.graph import top_degree

    out = _collect(top_degree(_quads_ds(), k=2, direction="out")).to_pylist()
    assert [(r["entity"], r["degree"]) for r in out] == [("a", 4), ("b", 1)]
    inn = _collect(top_degree(_quads_ds(), k=2, direction="in")).to_pylist()
    assert [(r["entity"], r["degree"]) for r in inn] == [("c", 4), ("b", 2)]
    with pytest.raises(ValueError):
        top_degree(_quads_ds(), direction="sideways")


def test_events_funnel_chain_semantics(ray_session, tmp_path):
    """The funnel requires each stage at/after the previous one; a
    missing middle stage breaks the chain even when a later-stage event
    exists."""
    import pyarrow.parquet as pq

    from rify_ray.pipelines.relational import events_funnel

    us = 1_000_000

    def ts(sec):
        return sec * us

    rows = [
        # user 1: full chain in order
        (1, ts(10), "view"), (1, ts(20), "click"), (1, ts(30), "purchase"),
        # user 2: purchase BEFORE click → purchase stage unsatisfied
        (2, ts(10), "view"), (2, ts(30), "click"), (2, ts(20), "purchase"),
        # user 3: no view → absent entirely (purchase exists)
        (3, ts(5), "purchase"),
        # user 4: view only
        (4, ts(7), "view"),
        # user 5: click before view, second click after → uses the later
        (5, ts(10), "click"), (5, ts(20), "view"), (5, ts(25), "click"),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    for forced in (False, True):
        out = _collect(events_funnel(str(tmp_path), forced_shuffle=forced)).to_pylist()
        got = {r["user_id"]: (r["t_view_us"], r["t_click_us"], r["t_purchase_us"]) for r in out}
        assert got == {
            1: (ts(10), ts(20), ts(30)),
            2: (ts(10), ts(30), None),
            4: (ts(7), None, None),
            5: (ts(20), ts(25), None),
        }


def test_events_retention_matches_brute(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from rify_ray.pipelines.relational import events_retention

    US_DAY = 86_400_000_000
    # (user, day) activity; user 1 first on day 0, user 2 first on day 1
    acts = [(1, 0), (1, 0), (1, 1), (1, 3), (2, 1), (2, 1), (2, 2), (3, 0), (3, 40)]
    t = pa.table(
        {
            "user_id": pa.array([u for u, _ in acts], pa.int64()),
            "ts": pa.array([d * US_DAY + 5 for _, d in acts], pa.timestamp("us")),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")

    firsts = {}
    for u, d in acts:
        firsts[u] = min(firsts.get(u, 10**9), d)
    triples = {(u, firsts[u], d - firsts[u]) for u, d in acts if 0 <= d - firsts[u] <= 30}
    want = {}
    for _, cd, off in triples:
        key = (str(__import__("datetime").date(1970, 1, 1) + __import__("datetime").timedelta(days=cd)), off)
        want[key] = want.get(key, 0) + 1

    # all three physical regimes: driver fold, distributed+broadcast
    # cohort lut, distributed+hash-join cohort attach
    for bcast, forced in ((20_000_000, False), (20_000_000, True), (0, True)):
        out = _collect(
            events_retention(
                str(tmp_path),
                max_offset=30,
                broadcast_rows=bcast,
                num_partitions=4,
                forced_shuffle=forced,
            )
        ).to_pylist()
        got = {(r["cohort_day"], r["day_offset"]): r["n_users"] for r in out}
        assert got == want, (bcast, forced, got, want)


def test_top_degree_distributed_sort_branch(ray_session):
    from rify_ray.stages.graph import top_degree

    out = _collect(top_degree(_quads_ds(), k=2, direction="out", broadcast_rows=0)).to_pylist()
    assert [(r["entity"], r["degree"]) for r in out] == [("a", 4), ("b", 1)]


def test_ngram_topk_distributed_sort_branch(ray_session):
    import ray.data

    from rify_ray.stages.corpus import ngram_topk

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["a b a b", "a b c"], pa.string()),
            }
        )
    )
    out = _collect(ngram_topk(docs, k=2, broadcast_rows=0)).to_pylist()
    assert [(r["gram"], r["cnt"]) for r in out] == [("a b", 3), ("b a", 1)]


def test_revenue_by_nation_branches_agree(ray_session):
    """Broadcast star-join path == hash-join-chain path, value-exact
    (integer revenue units are order-independent)."""
    from rify_ray.pipelines.relational import revenue_by_nation

    sf = "/root/testdata/sf0.001"
    a = _collect(revenue_by_nation(sf)).to_pylist()
    b = _collect(revenue_by_nation(sf, forced_shuffle=True)).to_pylist()
    key = lambda r: r["n_name"]
    assert sorted(a, key=key) == sorted(b, key=key) and len(a) > 0


def test_bloom_no_false_negatives_and_bounded_fp(ray_session):
    """Bloom decontamination must drop a SUPERSET of the exact op's
    drops (no false negatives); with a roomy filter the false-positive
    overdrop is zero on this corpus."""
    import numpy as np
    import ray.data

    from rify_ray.stages.corpus import BloomFilter, bloom_ngram_decontaminate, ngram_decontaminate

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(50)]
    docs = [
        (i, " ".join(rng.choice(vocab, size=12).tolist())) for i in range(200)
    ]
    eval_texts = [docs[3][1], docs[77][1], "w1 w2 w3 w4 w5 w6"]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([x for _, x in docs], pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    exact = {r["doc_id"] for r in _collect(ngram_decontaminate(ds, eval_texts, n=5)).to_pylist()}
    bloom = {r["doc_id"] for r in _collect(bloom_ngram_decontaminate(ds, eval_texts, n=5, bits_pow=22)).to_pylist()}
    assert bloom <= exact            # bloom drops everything exact drops
    assert exact - bloom == set()    # roomy filter: no overdrop here
    assert len(exact) < len(docs)    # the op actually bites

    # FP-rate sanity on the raw filter: 1k members, 100k probes, 2^20 bits
    bf = BloomFilter(bits_pow=20, k=4)
    bf.add([f"m{i}" for i in range(1000)])
    probes = pa.array([f"x{i}" for i in range(100_000)], pa.string())
    fp = bf.contains(probes).mean()
    assert fp < 0.001, fp
    members = pa.array([f"m{i}" for i in range(1000)], pa.string())
    assert bf.contains(members).all()  # zero false negatives


def test_stable_str_hash64_pinned_and_representation_invariant():
    """The Bloom probe hash is pure-numpy and must be bit-identical
    forever (a drifting hash across versions would silently break the
    persistent/heterogeneous-cluster no-false-negative contract) —
    pinned golden values, plus invariance to Arrow representation
    (slices with nonzero offset, chunking, null-as-empty)."""
    import numpy as np

    from rify_ray.stages.corpus import stable_str_hash64

    a = pa.array(["", "a", "hello world", "héllo", "a" * 300, None])
    h = stable_str_hash64(a, 1)
    assert [hex(int(x)) for x in h] == [
        "0x96fa14d79953ca26",
        "0x5c10119e76a023a0",
        "0x252c9f5bd04b6a97",
        "0xb95d43031ca1b8cd",
        "0xe60d02f28f81d54",
        "0x96fa14d79953ca26",  # null hashes like ""
    ]
    assert (stable_str_hash64(a.slice(2, 3), 1) == h[2:5]).all()
    ch = pa.chunked_array([["", "a"], ["hello world"]])
    assert (stable_str_hash64(ch, 1) == h[:3]).all()
    assert (stable_str_hash64(a, 2) != h).all()  # seed independence
    hh = stable_str_hash64(pa.array([f"g{i}" for i in range(100_000)]), 7)
    assert len(np.unique(hh)) == 100_000  # injective on a real workload
