"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library code it calls) calls ``ray.init()`` /
``ray.shutdown()``.

- :func:`entry` — flagship KG pipeline (synthetic pages → extract →
  link → canonicalize → dedup → fixpoint, plus relational quads from
  sf0.001 parquet) returning a Dataset of derived triples.
- :func:`queries` — one callable per implemented operator/pipeline from
  SURVEY.md §2 (+ the training-data ops); each takes ``sf_dir``.
- :func:`oracle_sql` — DuckDB-runnable ANSI-SQL twins for every
  SQL-expressible query (same column names; order-insensitive compare).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

FACT_COLS = ["s", "p", "o", "g"]
DG = "default_graph"


# ---------------------------------------------------------------------------
# shared helpers (no ray.init anywhere)
# ---------------------------------------------------------------------------


def _rules_in_region():
    from rify_ray import B, Rule, U

    return [
        Rule.create(
            [
                [U("c"), B("in_nation"), U("n"), B(DG)],
                [U("n"), B("in_region"), U("r"), B(DG)],
            ],
            [[U("c"), B("in_region"), U("r"), B(DG)]],
        )
    ]


def _rules_conational():
    from rify_ray import B, Rule, U

    return [
        Rule.create(
            [
                [U("a"), B("in_nation"), U("n"), B(DG)],
                [U("b"), B("in_nation"), U("n"), B(DG)],
            ],
            [[U("a"), B("conational"), U("b"), B(DG)]],
        )
    ]


def _rules_reach():
    from rify_ray import B, Rule, U

    return [
        Rule.create(
            [[U("a"), B("succ"), U("b"), B(DG)]],
            [[U("a"), B("reach"), U("b"), B(DG)]],
        ),
        Rule.create(
            [
                [U("a"), B("reach"), U("b"), B(DG)],
                [U("b"), B("reach"), U("c"), B(DG)],
            ],
            [[U("a"), B("reach"), U("c"), B(DG)]],
        ),
    ]


def _derived_to_arrow(derived_pl) -> pa.Table:
    from rify_ray.util import polars_to_arrow_string

    return polars_to_arrow_string(derived_pl.select(FACT_COLS))


def _collect_quads(*datasets) -> "polars.DataFrame":  # noqa: F821
    import polars as pl

    frames = []
    for ds in datasets:
        if isinstance(ds, pa.Table):
            frames.append(pl.from_arrow(ds))
            continue
        batches = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
        if batches:
            frames.append(pl.from_arrow(pa.concat_tables(batches)))
    if not frames:
        return pl.DataFrame(schema={c: pl.Utf8 for c in FACT_COLS})
    return pl.concat([f.select(FACT_COLS) for f in frames])


def _query_vectors(sf_dir: str, n: int = 10):
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    import pyarrow.compute as pc

    mask = pc.less(tbl["vec_id"], n)
    sub = tbl.filter(mask)
    ids = np.asarray(sub["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.asarray(sub["embedding"].to_pylist(), dtype=np.float64)
    return ids, mat


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 + synthetic pages."""
    import tempfile

    import ray.data

    from rify_ray import engine
    from rify_ray.pipelines.kg import kg_construct_and_infer_store
    from rify_ray.pipelines.relational import customer_nation_quads, nation_region_quads
    from rify_ray.sources import pages_dataset

    sf_dir = "/root/testdata/sf0.001"
    # 1. KG from synthetic Common-Crawl-style pages → ancestor closure,
    #    on the store-resident (100 TB) path
    with tempfile.TemporaryDirectory() as d:
        store = kg_construct_and_infer_store(
            pages_dataset(200, 40), fixtures_rules.ancestry_rules(), 40,
            f"{d}/kg", concurrency=2,
        )
        pages_derived = _collect(store.decoded_dataset(first_gen=1))
    # 2. relational quads from parquet → in_region inference
    quads = _collect_quads(customer_nation_quads(sf_dir), nation_region_quads(sf_dir))
    rel_derived = engine.infer(quads, _rules_in_region())
    rel_tbl = _derived_to_arrow(rel_derived)
    return ray.data.from_arrow(pa.concat_tables([pages_derived, rel_tbl]))


# inline ancestry rules to keep entry() self-contained (tests/fixtures.py
# is not importable from the driver context)
class _FixturesRules:
    @staticmethod
    def ancestry_rules():
        from rify_ray import B, Rule, U

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


fixtures_rules = _FixturesRules


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_kg_customer_region(sf_dir: str):
    from rify_ray import engine
    from rify_ray.pipelines.relational import customer_nation_quads, nation_region_quads

    quads = _collect_quads(customer_nation_quads(sf_dir), nation_region_quads(sf_dir))
    return _derived_to_arrow(engine.infer(quads, _rules_in_region()))


def _q_kg_conational(sf_dir: str):
    from rify_ray import engine
    from rify_ray.pipelines.relational import customer_nation_quads, supplier_nation_quads

    quads = _collect_quads(customer_nation_quads(sf_dir), supplier_nation_quads(sf_dir))
    return _derived_to_arrow(engine.infer(quads, _rules_conational()))


def _q_kg_nation_chain_closure(sf_dir: str):
    from rify_ray import engine
    from rify_ray.pipelines.relational import nation_chain_quads

    quads = _collect_quads(nation_chain_quads(sf_dir))
    return _derived_to_arrow(engine.infer(quads, _rules_reach()))


def _q_kg_prove_chain(sf_dir: str):
    """The reference's flagship capability — ``prove`` + ``validate`` —
    under the hard oracle signal (reference golden shape:
    ``src/prove.rs:502-627``'s multi-step chain proofs).

    Builds a lineage-tracking store over the nation ``succ`` chain,
    proves the LONGEST goal ``reach(first, last)`` via
    ``engine.prove_store`` (early-exit fixpoint → generation-pruned
    backward lineage walk → proof replay), validates the returned
    proof with ``engine.validate``, and emits the validation verdict as
    rows: one ``kind='assumed'`` row per assumed premise plus one
    ``kind='goal_implied'`` row for the proven goal.

    The assumed set is SQL-pinnable: any proof of reach(first,last)
    over a simple path must traverse every edge, and reach facts derive
    only from succ premises — so assumed == the full succ premise
    table, and the goal row == (min nation, reach, max nation).  The
    callable additionally asserts the in-memory contracts the SQL twin
    can't see: goal ∈ implied, assumed ∩ implied = ∅, assumed ⊆
    premises — a broken prover or validator fails loudly rather than
    returning plausible rows."""
    import tempfile

    import ray.data

    from rify_ray import engine
    from rify_ray.pipelines.relational import nation_chain_quads

    quads = nation_chain_quads(sf_dir)
    first = quads["s"][0].as_py()
    last = quads["o"][-1].as_py()
    goal = (first, "reach", last, DG)
    with tempfile.TemporaryDirectory() as d:
        proof = engine.prove_store(
            ray.data.from_arrow(quads),
            [goal],
            _rules_reach(),
            f"{d}/kg",
            num_partitions=8,
        )
    v = engine.validate(_rules_reach(), proof)
    if goal not in v.implied:
        raise AssertionError("validated proof does not imply the goal")
    if v.assumed & v.implied:
        raise AssertionError("assumed/implied sets must be disjoint")
    premises = set(
        zip(*(quads[c].to_pylist() for c in FACT_COLS))
    )
    if not v.assumed <= premises:
        raise AssertionError("proof assumed a non-premise quad")
    rows = sorted(v.assumed) + [goal]
    kinds = ["assumed"] * (len(rows) - 1) + ["goal_implied"]
    return pa.table(
        {
            "kind": pa.array(kinds, pa.string()),
            "s": pa.array([r[0] for r in rows], pa.string()),
            "p": pa.array([r[1] for r in rows], pa.string()),
            "o": pa.array([r[2] for r in rows], pa.string()),
            "g": pa.array([r[3] for r in rows], pa.string()),
        }
    )


def _q_kg_customer_region_store(sf_dir: str):
    """The in_region inference on the STORE-RESIDENT path (dict-encoded
    parquet generations, hybrid rounds) — oracle-checked against the
    same SQL as the broadcast-path kg_customer_region, so the driver's
    DuckDB gate covers infer_store end to end."""
    import tempfile

    import ray.data

    from rify_ray import engine
    from rify_ray.pipelines.relational import customer_nation_quads, nation_region_quads
    from rify_ray.util import polars_to_arrow_string

    quads = _collect_quads(customer_nation_quads(sf_dir), nation_region_quads(sf_dir))
    with tempfile.TemporaryDirectory() as d:
        store = engine.infer_store(
            ray.data.from_arrow(polars_to_arrow_string(quads)),
            _rules_in_region(),
            f"{d}/kg",
            num_partitions=8,
        )
        return _collect(store.decoded_dataset(first_gen=1))


def _bgp_pattern():
    from rify_ray import B, U

    return [
        [U("c"), B("in_nation"), U("n"), B(DG)],
        [U("n"), B("in_region"), U("r"), B(DG)],
    ]


def _q_kg_bgp_customer_region(sf_dir: str):
    """Conjunctive (basic-graph-pattern) QUERY — no inference: enumerate
    all (customer, nation, region) assignments satisfying the two-atom
    pattern over the premise quads via ``engine.query`` (the reference's
    ``Reasoner::apply`` as a one-shot public operation)."""
    from rify_ray import engine
    from rify_ray.pipelines.relational import customer_nation_quads, nation_region_quads
    from rify_ray.util import polars_to_arrow_string

    quads = _collect_quads(customer_nation_quads(sf_dir), nation_region_quads(sf_dir))
    out = engine.query(quads, _bgp_pattern())
    return polars_to_arrow_string(out)


def _q_kg_bgp_store(sf_dir: str):
    """The same basic-graph-pattern query on the STORE-RESIDENT path:
    the pattern matches as streaming filtered projections of the
    dict-encoded parquet generations, joins are hash-shuffle exchanges,
    bindings decode through the store dictionary — same SQL oracle as
    ``kg_bgp_customer_region``."""
    import tempfile

    import ray.data

    from rify_ray import engine
    from rify_ray.pipelines.relational import customer_nation_quads, nation_region_quads
    from rify_ray.util import polars_to_arrow_string

    quads = _collect_quads(customer_nation_quads(sf_dir), nation_region_quads(sf_dir))
    with tempfile.TemporaryDirectory() as d:
        store = engine.infer_store(
            ray.data.from_arrow(polars_to_arrow_string(quads)),
            _rules_in_region(),
            f"{d}/kg",
            num_partitions=8,
        )
        return _collect(engine.query_store(store, _bgp_pattern(), num_partitions=8))


def _q_kg_customer_region_incr(sf_dir: str):
    """Incremental view maintenance, oracle-checked: half the customer
    facts build the store fixpoint, the other half arrive later via
    ``engine.add_premises_store`` (anti-joined, committed as a premise
    generation, semi-naive rounds continue from only the new facts).
    The derived read (``derived_only=True`` excludes premise
    generations) must equal the one-shot closure — same SQL oracle as
    ``kg_customer_region``."""
    import tempfile

    import ray.data

    from rify_ray import engine
    from rify_ray.pipelines.relational import customer_nation_quads, nation_region_quads
    from rify_ray.util import polars_to_arrow_string

    cust = _collect_quads(customer_nation_quads(sf_dir))
    nr = _collect_quads(nation_region_quads(sf_dir))
    import polars as pl

    half = cust.height // 2
    base = pl.concat([cust.head(half), nr])
    add = cust.slice(half)
    with tempfile.TemporaryDirectory() as d:
        engine.infer_store(
            ray.data.from_arrow(polars_to_arrow_string(base)),
            _rules_in_region(),
            f"{d}/kg",
            num_partitions=8,
        )
        store = engine.add_premises_store(
            ray.data.from_arrow(polars_to_arrow_string(add)),
            _rules_in_region(),
            f"{d}/kg",
            num_partitions=8,
        )
        return _collect(store.decoded_dataset(derived_only=True))


def _q_kg_customer_region_retract(sf_dir: str):
    """DRed retraction, oracle-checked: the full closure is built with
    lineage, then every odd customer's in_nation premise is RETRACTED
    (``engine.remove_premises_store``: lineage overdeletion walk →
    atomic physical delete → rederive round → resumed fixpoint).  The
    surviving derived set must hash-match the SQL closure over even
    customers only."""
    import tempfile

    import polars as pl
    import ray.data

    from rify_ray import engine
    from rify_ray.pipelines.relational import customer_nation_quads, nation_region_quads
    from rify_ray.util import polars_to_arrow_string

    cust = _collect_quads(customer_nation_quads(sf_dir))
    nr = _collect_quads(nation_region_quads(sf_dir))
    # odd customers: subject "c:<odd custkey>"
    odd = cust.filter(
        pl.col("s").str.strip_prefix("c:").cast(pl.Int64) % 2 == 1
    )
    with tempfile.TemporaryDirectory() as d:
        engine.infer_store(
            ray.data.from_arrow(polars_to_arrow_string(pl.concat([cust, nr]))),
            _rules_in_region(),
            f"{d}/kg",
            num_partitions=8,
            with_lineage=True,
        )
        store = engine.remove_premises_store(
            ray.data.from_arrow(polars_to_arrow_string(odd)),
            _rules_in_region(),
            f"{d}/kg",
            num_partitions=8,
        )
        return _collect(store.decoded_dataset(derived_only=True))


def _q_kg_conational_store(sf_dir: str):
    """The conational closure — the biggest derived set in the suite
    (10.26 M facts at sf0.1) — on the STORE-RESIDENT path: premises
    stream straight from parquet (no driver collect), the round output
    exceeds ``broadcast_rows`` so it exercises the chunked distributed
    commit, and the result decodes through the persisted dictionary.
    Oracle-checked against the same SQL as ``kg_conational``, so the
    scale-safe path is value-checked at its biggest output
    (``low_infer`` semantics, src/infer.rs:29-101)."""
    import tempfile

    from rify_ray import engine
    from rify_ray.pipelines.relational import customer_nation_quads, supplier_nation_quads

    quads = customer_nation_quads(sf_dir).union(supplier_nation_quads(sf_dir))
    with tempfile.TemporaryDirectory() as d:
        store = engine.infer_store(
            quads, _rules_conational(), f"{d}/kg", num_partitions=16,
        )
        return _collect(store.decoded_dataset(first_gen=1))


# phase timings of the most recent _q_kg_conational_retract call —
# bench.py reads this to report the retraction cost SEPARATELY from the
# closure build it necessarily runs first (the sublinearity evidence:
# retract_sec ≪ build_sec on the 10.26 M-fact closure at sf0.1)
_LAST_RETRACT_TIMES: dict[str, float] = {}


def _q_kg_conational_retract(sf_dir: str):
    """DRed retraction AT SCALE: the conational closure — the biggest
    derived set in the suite (10.26 M facts at sf0.1) — is built with
    lineage, then ~1 % of the customer ``in_nation`` premises
    (``custkey % 100 == 1``) are retracted.  Each customer has exactly
    one ``in_nation`` premise, so every conational pair touching a
    retracted customer dies and nothing rederives — the overdeletion
    cone is ~2 % of the closure and the maintenance cost must track
    THAT, not the 10 M-fact store (phase timings exported via
    ``_LAST_RETRACT_TIMES`` for bench.py).  Oracle: the conational
    closure over the surviving entities only — i.e. the from-scratch
    recompute, so the equals-recompute property IS the hash check."""
    import tempfile
    import time

    import polars as pl
    import ray.data

    from rify_ray import engine
    from rify_ray.pipelines.relational import customer_nation_quads, supplier_nation_quads
    from rify_ray.util import polars_to_arrow_string

    cust = _collect_quads(customer_nation_quads(sf_dir))
    drop = cust.filter(pl.col("s").str.strip_prefix("c:").cast(pl.Int64) % 100 == 1)
    quads = customer_nation_quads(sf_dir).union(supplier_nation_quads(sf_dir))
    with tempfile.TemporaryDirectory() as d:
        t0 = time.monotonic()
        engine.infer_store(
            quads, _rules_conational(), f"{d}/kg", num_partitions=16,
            with_lineage=True,
        )
        t1 = time.monotonic()
        store = engine.remove_premises_store(
            ray.data.from_arrow(polars_to_arrow_string(drop)),
            _rules_conational(),
            f"{d}/kg",
            num_partitions=16,
        )
        t2 = time.monotonic()
        _LAST_RETRACT_TIMES.update(
            {"build_sec": t1 - t0, "retract_sec": t2 - t1, "retracted": drop.height}
        )
        # per-phase attribution (walk / delete / rederive probes) —
        # engine.RETRACT_PHASES is rebuilt by each remove_premises_store
        _LAST_RETRACT_TIMES.update(
            {f"phase_{k}": v for k, v in engine.RETRACT_PHASES.items()}
        )
        return _collect(store.decoded_dataset(derived_only=True))


def _dump_oracle_quads(store, name: str) -> None:
    """Persist the store's PREMISE quads (generation 0 — the
    canonicalized page mentions) to a fixed scratch path so the DuckDB
    oracle can run the same recursive closure over the identical input.
    The synthetic pages are deterministic (sources/pages.py
    ``expected_page_triples``), so the file content is identical across
    runs — a stale file from a previous run is byte-equivalent."""
    import pyarrow.parquet as pq

    os.makedirs("/tmp/rify_ray_oracle", exist_ok=True)
    prem = _collect(store.decoded_dataset(last_gen=0))
    path = f"/tmp/rify_ray_oracle/{name}.parquet"
    pq.write_table(prem, path + ".tmp")
    os.replace(path + ".tmp", path)


def _q_kg_pages_flagship(sf_dir: str):
    """Flagship on the store-resident (100 TB) path: pages → triples
    stream into TripleStore parquet generations → hybrid fixpoint; the
    derived closure is generations ≥ 1, oracle-checked against a DuckDB
    recursive closure over the (dumped) canonicalized premise quads.
    (The driver-resident kg_construct_and_infer remains available for
    small interactive runs; both produce the identical fact set —
    asserted in tests/test_kg_pipeline.py.)"""
    import tempfile

    from rify_ray.pipelines.kg import kg_construct_and_infer_store
    from rify_ray.sources import pages_dataset

    with tempfile.TemporaryDirectory() as d:
        store = kg_construct_and_infer_store(
            pages_dataset(500, 50), fixtures_rules.ancestry_rules(), 50,
            f"{d}/kg", concurrency=2,
        )
        _dump_oracle_quads(store, "flagship_premises")
        return _collect(store.decoded_dataset(first_gen=1))


def _docs_ds(sf_dir: str):
    import ray.data

    # the documents table is a single parquet file; split the read so
    # downstream map stages actually parallelize
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"], override_num_blocks=32
    )


def _q_dedup_exact_docs(sf_dir: str):
    from rify_ray.stages.dedup import exact_dedup

    out = exact_dedup(_docs_ds(sf_dir))
    if out is None:
        return pa.schema([("doc_id", pa.int64())]).empty_table()
    return pa.concat_tables(out.iter_batches(batch_size=None, batch_format="pyarrow"))


_CLUSTER_SCHEMA = pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])


def _collect_clusters(out) -> pa.Table:
    tbls = [
        t for t in out.iter_batches(batch_size=None, batch_format="pyarrow") if t.num_rows
    ]
    if not tbls:
        return _CLUSTER_SCHEMA.empty_table()
    return pa.concat_tables(t.select(["doc_id", "cluster_id"]) for t in tbls)


def _q_dedup_clusters_exact(sf_dir: str):
    """Exact-duplicate clusters via the generic connected-components
    operator: chained per-text pairs → min-label components.  The oracle
    (GROUP BY text) checks the CC operator end to end, since components
    of exact-equality chains are exactly the text groups."""
    from rify_ray.stages.dedup import duplicate_clusters, exact_dup_pairs

    pairs = exact_dup_pairs(_docs_ds(sf_dir))
    return _collect_clusters(duplicate_clusters(pairs))


def _q_cc_label_groups(sf_dir: str):
    """Connected components over a non-trivial equality graph at every
    scale factor: chain docs sharing ``n_chars``, recover components.
    Components of per-group chains are exactly the ``GROUP BY n_chars``
    groups, which the SQL oracle states directly — this is the
    value-exact check for :func:`duplicate_clusters` (the text-keyed
    variant has no duplicate groups at sf0.01)."""
    import ray.data

    from rify_ray.stages.dedup import duplicate_clusters, exact_dup_pairs

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "n_chars"],
        override_num_blocks=32,
    )
    pairs = exact_dup_pairs(docs, key_col="n_chars")
    return _collect_clusters(duplicate_clusters(pairs))


def _q_dedup_clusters_minhash(sf_dir: str):
    """Near-duplicate clusters: MinHash-verified pairs → connected
    components → (doc_id, cluster_id); keep-first survivors are the rows
    with doc_id == cluster_id."""
    from rify_ray.stages.dedup import duplicate_clusters, minhash_verified_pairs

    pairs = minhash_verified_pairs(_docs_ds(sf_dir), threshold=0.5)
    return _collect_clusters(duplicate_clusters(pairs.select_columns(["id1", "id2"])))


def _q_docs_neardup_survivors(sf_dir: str):
    """The corpus a near-dedup pass actually keeps: MinHash-verified
    pairs → connected components → drop every cluster member except the
    minimum id.  Rows-only (the pair set is LSH-derived); the component
    labeling and survivor selection are pinned by the cluster tests."""
    from rify_ray.stages.dedup import minhash_verified_pairs, neardup_survivors

    pairs = minhash_verified_pairs(_docs_ds(sf_dir), threshold=0.5)
    out = neardup_survivors(_docs_ds(sf_dir), pairs.select_columns(["id1", "id2"]))

    def ids(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pc.cast(batch["doc_id"], pa.int64())})

    out = out.map_batches(ids, batch_format="pyarrow", zero_copy_batch=True)
    return pa.concat_tables(
        t for t in out.iter_batches(batch_size=None, batch_format="pyarrow") if t.num_rows
    )


def _q_source_stats(sf_dir: str):
    from rify_ray.pipelines.relational import source_stats

    out = source_stats(sf_dir)
    return pa.concat_tables(
        t for t in out.iter_batches(batch_size=None, batch_format="pyarrow") if t.num_rows
    )


def _q_text_token_counts(sf_dir: str):
    from rify_ray.stages.text import text_stage, token_count_fn

    out = text_stage(_docs_ds(sf_dir), token_count_fn)
    return pa.concat_tables(out.iter_batches(batch_size=None, batch_format="pyarrow"))


def _q_text_char_stats(sf_dir: str):
    from rify_ray.stages.text import char_stats_fn, text_stage

    out = text_stage(_docs_ds(sf_dir), char_stats_fn)
    return pa.concat_tables(out.iter_batches(batch_size=None, batch_format="pyarrow"))


def _q_text_lang_id(sf_dir: str):
    from rify_ray.stages.text import lang_id_fn, text_stage

    out = text_stage(_docs_ds(sf_dir), lang_id_fn)
    return pa.concat_tables(out.iter_batches(batch_size=None, batch_format="pyarrow"))


def _q_text_fingerprint(sf_dir: str):
    from rify_ray.stages.text import fingerprint_fn, text_stage

    out = text_stage(_docs_ds(sf_dir), fingerprint_fn)
    return pa.concat_tables(out.iter_batches(batch_size=None, batch_format="pyarrow"))


def _q_text_quality(sf_dir: str):
    from rify_ray.stages.text import quality_score_fn, text_stage

    out = text_stage(_docs_ds(sf_dir), quality_score_fn)
    return pa.concat_tables(out.iter_batches(batch_size=None, batch_format="pyarrow"))


# eval-set decontamination blocklist — shared verbatim by the Ray stage
# and the SQL oracle so both filters are the same predicate
DECONTAMINATE_PHRASES = ["order fast", "customer stream", "vector merge"]


def _q_text_bpe_token_counts(sf_dir: str):
    from rify_ray.stages.text import bpe_token_count_fn, text_stage

    out = text_stage(_docs_ds(sf_dir), bpe_token_count_fn)
    return pa.concat_tables(out.iter_batches(batch_size=None, batch_format="pyarrow"))


def _q_text_winnow_fp(sf_dir: str):
    """Winnowing (rolling-hash) document sketches — no SQL twin (the
    windowed-minimum selection isn't ANSI-SQL-expressible); pinned by
    the reference-implementation conformance test instead."""
    from rify_ray.stages.text import text_stage, winnow_fingerprint_fn

    out = text_stage(_docs_ds(sf_dir), winnow_fingerprint_fn())
    return pa.concat_tables(out.iter_batches(batch_size=None, batch_format="pyarrow"))


def _q_docs_normalize(sf_dir: str):
    from rify_ray.stages.text import normalize_fn, text_stage

    out = text_stage(_docs_ds(sf_dir), normalize_fn)
    return pa.concat_tables(out.iter_batches(batch_size=None, batch_format="pyarrow"))


def _q_docs_stable_sample(sf_dir: str):
    from rify_ray.stages.corpus import stable_sample

    out = stable_sample(_docs_ds(sf_dir), pct=10, mod=100)
    return pa.concat_tables(out.iter_batches(batch_size=None, batch_format="pyarrow"))


def _q_docs_decontaminate(sf_dir: str):
    from rify_ray.stages.corpus import decontaminate

    out = decontaminate(_docs_ds(sf_dir), DECONTAMINATE_PHRASES)
    return pa.concat_tables(out.iter_batches(batch_size=None, batch_format="pyarrow"))


def _q_ngram_top20(sf_dir: str):
    from rify_ray.stages.corpus import ngram_topk

    out = ngram_topk(_docs_ds(sf_dir), k=20)
    return pa.concat_tables(out.iter_batches(batch_size=None, batch_format="pyarrow"))


def _q_text_repetition(sf_dir: str):
    from rify_ray.stages.corpus import repetition_stats_fn
    from rify_ray.stages.text import text_stage

    out = text_stage(_docs_ds(sf_dir), repetition_stats_fn())
    return pa.concat_tables(out.iter_batches(batch_size=None, batch_format="pyarrow"))


REDACT_PATTERN = r"\b(customer|spark|vector)\b"


def _q_docs_redact(sf_dir: str):
    from rify_ray.stages.corpus import redact

    out = redact(_docs_ds(sf_dir), REDACT_PATTERN, "[REDACTED]")
    return pa.concat_tables(out.iter_batches(batch_size=None, batch_format="pyarrow"))


def _q_docs_stratified_sample(sf_dir: str):
    import ray.data

    from rify_ray.stages.corpus import stratified_sample

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source"],
        override_num_blocks=32,
    )
    out = stratified_sample(docs, strata_col="source", key_col="doc_id", k=5)
    return pa.concat_tables(
        t for t in out.iter_batches(batch_size=None, batch_format="pyarrow") if t.num_rows
    )


MIXTURE_RATES = {"src0": 50, "src1": 25, "src2": 10}


def _q_docs_mixture_sample(sf_dir: str):
    import ray.data

    from rify_ray.stages.corpus import mixture_sample

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source"],
        override_num_blocks=32,
    )
    out = mixture_sample(docs, MIXTURE_RATES, default_pct=5)
    return pa.concat_tables(
        t for t in out.iter_batches(batch_size=None, batch_format="pyarrow") if t.num_rows
    )


def _q_docs_quality_filter(sf_dir: str):
    """Quantile-gated quality filter: keep documents whose stopword
    density is at or above the corpus median — the score is a streaming
    map, the median comes from the constant-size histogram reduction
    (no sort exchange), and the filter is a second streaming pass."""
    from rify_ray.stages.corpus import quantile_threshold
    from rify_ray.stages.text import quality_score_fn, text_stage

    scored = text_stage(_docs_ds(sf_dir), quality_score_fn).materialize()
    thr = quantile_threshold(scored, "stopword_bp", 0.5)

    def keep(batch: pa.Table) -> pa.Table:
        b = batch.filter(
            pc.greater_equal(batch["stopword_bp"], pa.scalar(thr, pa.int64()))
        )
        return b.select(["doc_id", "stopword_bp"])

    out = scored.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    return pa.concat_tables(
        t for t in out.iter_batches(batch_size=None, batch_format="pyarrow") if t.num_rows
    )


def _q_docs_ngram_decontaminate(sf_dir: str):
    """5-gram-overlap decontamination against the first three documents
    as the held-out eval set (they drop themselves too — they trivially
    share their own grams)."""
    import pyarrow.parquet as pq

    from rify_ray.stages.corpus import ngram_decontaminate

    ev = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    eval_texts = ev.filter(pc.less(ev["doc_id"], 3))["text"].to_pylist()
    out = ngram_decontaminate(_docs_ds(sf_dir), eval_texts, n=5)

    def ids(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pc.cast(batch["doc_id"], pa.int64())})

    out = out.map_batches(ids, batch_format="pyarrow", zero_copy_batch=True)
    return pa.concat_tables(
        t for t in out.iter_batches(batch_size=None, batch_format="pyarrow") if t.num_rows
    )


def _q_docs_pack_bins(sf_dir: str):
    """Sequence packing: token counts (streaming map) → per-source
    contiguous 512-token bins."""
    import ray.data

    from rify_ray.stages.corpus import pack_bins

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "text"],
        override_num_blocks=32,
    )

    def toks(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "source": pc.cast(batch["source"], pa.string()),
                "n_tokens": pc.cast(
                    pc.count_substring_regex(batch["text"], r"\S+"), pa.int64()
                ),
            }
        )

    out = pack_bins(
        docs.map_batches(toks, batch_format="pyarrow", zero_copy_batch=True),
        capacity=512,
    )
    return pa.concat_tables(
        t for t in out.iter_batches(batch_size=None, batch_format="pyarrow") if t.num_rows
    )


def _q_events_value_p50_sketch(sf_dir: str):
    """Approximate global median of the event value (integer cents) via
    the deterministic Munro-Paterson mergeable quantile sketch — the
    unbounded-domain scale path for quantiles.  Rows-only by design
    (approximate); rank error is pinned by
    ``test_mp_quantile_sketch_rank_error_and_determinism``."""
    import ray.data

    from rify_ray.stages.corpus import MPQuantileSketch

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def cents(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch["value"], pa.float64())
        c = pc.floor(pc.add(pc.multiply(v, pa.scalar(100.0)), pa.scalar(0.5)))
        return pa.table({"cents": pc.cast(c, pa.int64())})

    sk = MPQuantileSketch.from_dataset(
        ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        "cents",
        k=256,
    )
    return pa.table({"p50_cents_est": pa.array([sk.quantile(0.5)], pa.int64())})


def _q_events_hopping_counts(sf_dir: str):
    from rify_ray.pipelines.relational import events_hopping_counts

    out = events_hopping_counts(sf_dir, window_s=7200, hop_s=3600)
    return pa.concat_tables(
        t for t in out.iter_batches(batch_size=None, batch_format="pyarrow") if t.num_rows
    )


def _q_embed_norm_top10(sf_dir: str):
    import ray.data

    from rify_ray.stages.similarity import embed_norm_topk

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out = embed_norm_topk(emb, k=10)
    return pa.concat_tables(out.iter_batches(batch_size=None, batch_format="pyarrow"))


def _q_events_value_quantiles(sf_dir: str):
    from rify_ray.pipelines.relational import events_value_quantiles

    out = events_value_quantiles(sf_dir)
    return pa.concat_tables(
        t for t in out.iter_batches(batch_size=None, batch_format="pyarrow") if t.num_rows
    )


def _q_events_range_purchases_24h(sf_dir: str):
    """Range join (aggregated): for each 'error' event, how many
    'purchase' events the same user made in the prior 24 hours."""
    import ray.data

    from rify_ray.stages.asof import range_join_count

    def side(event_type):
        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
        )

        def prep(batch: pa.Table) -> pa.Table:
            b = batch.filter(pc.equal(batch["event_type"], event_type))
            return pa.table(
                {
                    "event_id": pc.cast(b["event_id"], pa.int64()),
                    "user_id": pc.cast(b["user_id"], pa.int64()),
                    "ts_us": pc.cast(b["ts"], pa.int64()),
                }
            )

        return ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    day_us = 24 * 3600 * 1_000_000
    out = range_join_count(
        side("error"),
        side("purchase"),
        by="user_id",
        on="ts_us",
        low_offset=-day_us,
        high_offset=0,
        left_cols=["event_id"],
        count_col="n_purchases_24h",
    )
    return pa.concat_tables(
        t for t in out.iter_batches(batch_size=None, batch_format="pyarrow") if t.num_rows
    )


def _q_docs_topk_per_source(sf_dir: str):
    """Grouped top-k: the 3 longest documents per source (ties broken by
    doc_id) — partial top-k per block, adaptive final merge."""
    import ray.data

    from rify_ray.stages.corpus import grouped_topk

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "n_chars"],
        override_num_blocks=32,
    )
    out = grouped_topk(
        ds, key_cols=["source"], order_col="n_chars", tiebreak_col="doc_id", k=3
    )
    return pa.concat_tables(
        t for t in out.iter_batches(batch_size=None, batch_format="pyarrow") if t.num_rows
    )


def _q_events_distinct_users(sf_dir: str):
    """Exact distinct count via the map-side combiner (distinct keys per
    block cross the exchange, not rows)."""
    import ray.data

    from rify_ray.pipelines.relational import _preagg_count

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    schema = pa.schema([("user_id", pa.int64()), ("n", pa.int64())])
    out = _preagg_count(ds, ["user_id"], schema, "n")
    return pa.table({"n_users": pa.array([out.count()], pa.int64())})


def _q_events_distinct_users_hll(sf_dir: str):
    """Approximate distinct count (HyperLogLog, p=12): constant-size
    per-block registers, driver max-merge, ~1.6% relative error."""
    import ray.data

    from rify_ray.stages.corpus import hll_distinct

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    est = hll_distinct(ds, "user_id", p=12)
    return pa.table({"n_users_est": pa.array([int(round(est))], pa.int64())})


def _q_events_asof_prior_purchase(sf_dir: str):
    """As-of join: each 'error' event matched to the same user's latest
    'purchase' event at or before it (DuckDB ``ASOF JOIN`` oracle)."""
    import ray.data

    from rify_ray.stages.asof import asof_join

    def side(event_type):
        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
        )

        def prep(batch: pa.Table) -> pa.Table:
            m = pc.equal(batch["event_type"], event_type)
            b = batch.filter(m)
            return pa.table(
                {
                    "event_id": pc.cast(b["event_id"], pa.int64()),
                    "user_id": pc.cast(b["user_id"], pa.int64()),
                    "ts_us": pc.cast(b["ts"], pa.int64()),
                }
            )

        return ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    out = asof_join(
        side("error"),
        side("purchase"),
        by="user_id",
        on="ts_us",
        left_cols=["event_id"],
        right_cols=[("event_id", "prior_event_id"), ("ts_us", "prior_ts_us")],
    )
    return pa.concat_tables(
        t for t in out.iter_batches(batch_size=None, batch_format="pyarrow") if t.num_rows
    )


def _q_events_window_counts(sf_dir: str):
    from rify_ray.pipelines.relational import events_window_counts

    out = events_window_counts(sf_dir)
    return pa.concat_tables(out.iter_batches(batch_size=None, batch_format="pyarrow"))


def _collect(out):
    batches = list(out.iter_batches(batch_size=None, batch_format="pyarrow"))
    return pa.concat_tables(batches) if batches else out.schema().empty_table()


def _q_top_users_by_events(sf_dir: str):
    from rify_ray.pipelines.relational import top_users_by_events

    return _collect(top_users_by_events(sf_dir, 10))


def _q_orders_by_status_priority(sf_dir: str):
    from rify_ray.pipelines.relational import orders_by_status_priority

    return _collect(orders_by_status_priority(sf_dir))


def _q_orders_rollup(sf_dir: str):
    from rify_ray.pipelines.relational import orders_rollup

    return _collect(orders_rollup(sf_dir))


def _q_events_type_pivot(sf_dir: str):
    from rify_ray.pipelines.relational import events_type_pivot

    return _collect(events_type_pivot(sf_dir))


def _q_events_user_running(sf_dir: str):
    from rify_ray.pipelines.relational import events_user_running

    return _collect(events_user_running(sf_dir))


def _q_segment_order_counts(sf_dir: str):
    from rify_ray.pipelines.relational import segment_order_counts

    return _collect(segment_order_counts(sf_dir))


def _q_lineitem_pricing_cents(sf_dir: str):
    from rify_ray.pipelines.relational import lineitem_pricing_cents

    return _collect(lineitem_pricing_cents(sf_dir))


def _q_events_sessionize(sf_dir: str):
    from rify_ray.pipelines.relational import events_sessionize

    return _collect(events_sessionize(sf_dir))


def _q_events_props_extract(sf_dir: str):
    from rify_ray.pipelines.relational import events_props_extract

    return _collect(events_props_extract(sf_dir))


def _q_kg_pages_store(sf_dir: str):
    """Flagship over the Dataset-resident path: pages → triples →
    infer_store (parquet-generation fixpoint) → derived reach facts."""
    import tempfile

    from rify_ray import engine
    from rify_ray.pipelines.kg import build_triples
    from rify_ray.sources import pages_dataset
    from rify_ray.sources.pages import alias_index

    quads = build_triples(pages_dataset(200, 12), alias_index(12), concurrency=2)
    with tempfile.TemporaryDirectory() as d:
        store = engine.infer_store(
            quads, fixtures_rules.ancestry_rules(), f"{d}/kg", num_partitions=4
        )
        _dump_oracle_quads(store, "pages_store_premises")
        return _collect(store.decoded_dataset(first_gen=1))


def _q_knn_cosine_top5(sf_dir: str):
    import ray.data

    from rify_ray.stages.similarity import knn_brute

    ids, mat = _query_vectors(sf_dir, 10)
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = knn_brute(emb, ids, mat, k=5)
    tbl = pa.concat_tables(out.iter_batches(batch_size=None, batch_format="pyarrow"))
    return tbl.select(["query_id", "rank", "neighbor_id"])


def _q_knn_lsh_top3(sf_dir: str):
    import ray.data

    from rify_ray.stages.similarity import knn_lsh

    ids, mat = _query_vectors(sf_dir, 5)
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    # nbits=6 + 2 probe hops: ~1/3 of the bucket space per query,
    # the recall/compute knee on these embeddings (recall >= 0.5 vs
    # brute pinned in the self-run artifact twin)
    out = knn_lsh(emb, ids, mat, k=3, nbits=6, multiprobe=2)
    tbl = pa.concat_tables(out.iter_batches(batch_size=None, batch_format="pyarrow"))
    return tbl.select(["query_id", "rank", "neighbor_id"])


def _q_knn_ivf_top3(sf_dir: str):
    import ray.data

    from rify_ray.stages.similarity import knn_ivf

    ids, mat = _query_vectors(sf_dir, 5)
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = knn_ivf(emb, ids, mat, k=3, nlist=16, nprobe=4)
    tbl = pa.concat_tables(out.iter_batches(batch_size=None, batch_format="pyarrow"))
    return tbl.select(["query_id", "rank", "neighbor_id"])


def _q_minhash_candidates(sf_dir: str):
    from rify_ray.stages.dedup import minhash_lsh_candidates

    out = minhash_lsh_candidates(_docs_ds(sf_dir))
    if out is None:
        return pa.schema([("id1", pa.int64()), ("id2", pa.int64())]).empty_table()
    return pa.concat_tables(out.iter_batches(batch_size=None, batch_format="pyarrow"))


def _q_minhash_verified(sf_dir: str):
    from rify_ray.stages.dedup import minhash_verified_pairs

    out = minhash_verified_pairs(_docs_ds(sf_dir), threshold=0.5)
    batches = list(out.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not batches:
        return pa.schema(
            [("id1", pa.int64()), ("id2", pa.int64()), ("jaccard", pa.float64())]
        ).empty_table()
    return pa.concat_tables(batches)


def _q_dedup_ngram_jaccard(sf_dir: str):
    from rify_ray.stages.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(_docs_ds(sf_dir))
    batches = list(out.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not batches:
        return pa.schema(
            [
                ("id1", pa.int64()),
                ("id2", pa.int64()),
                ("inter_n", pa.int64()),
                ("union_n", pa.int64()),
            ]
        ).empty_table()
    return pa.concat_tables(batches)


def _q_simhash_neardup(sf_dir: str):
    from rify_ray.stages.dedup import simhash_candidates

    out = simhash_candidates(_docs_ds(sf_dir))
    if out is None:
        return pa.schema(
            [("id1", pa.int64()), ("id2", pa.int64()), ("hamming", pa.int64())]
        ).empty_table()
    batches = list(out.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not batches:
        return pa.schema(
            [("id1", pa.int64()), ("id2", pa.int64()), ("hamming", pa.int64())]
        ).empty_table()
    return pa.concat_tables(batches)


def _q_embed_neardup(sf_dir: str):
    import ray.data

    from rify_ray.stages.dedup import embedding_neardup_pairs

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    # the synthetic embeddings have no true near-dups (max pair cosine
    # ~0.51); 0.45 keeps the op's output non-trivial and deterministic
    out = embedding_neardup_pairs(emb, threshold=0.45)
    batches = [
        b
        for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows and b.num_columns
    ]
    if not batches:
        return pa.schema([("id1", pa.int64()), ("id2", pa.int64())]).empty_table()
    # (id1, id2) only: the cosine value is float and would make the
    # oracle hash-compare sensitive to summation order
    return pa.concat_tables(batches).select(["id1", "id2"])


def _q_multimodal_decode(sf_dir: str):
    import ray.data

    from rify_ray.stages.multimodal import media_stage, synthetic_media_table

    # auto backend: the WAV rows hit the REAL stdlib-wave decoder, the
    # PNG rows the REAL vendored stdlib PNG parser, and the video rows
    # the REAL vendored stdlib Y4M container parser — all three kinds
    # decode real in-container (decoded_real=True row for row)
    media = ray.data.from_arrow(
        synthetic_media_table(60, real_audio=True, real_image=True, real_video=True)
    )
    out = media_stage(media, backend="auto", concurrency=2)
    return pa.concat_tables(out.iter_batches(batch_size=None, batch_format="pyarrow"))


def _q_docs_tfidf_top5(sf_dir: str):
    """Top-5 TF-IDF keywords per document (linear idf — ``tf/df`` —
    so the score is an exactly-rounded IEEE division, bit-identical to
    the SQL oracle): one vocabulary-sized df exchange, broadcast df
    lookup, per-doc top-k resolved locally inside the scoring map."""
    from rify_ray.stages.lexical import tfidf_topk

    return _collect(tfidf_topk(_docs_ds(sf_dir), k=5))


def _q_docs_postings_index(sf_dir: str):
    """Inverted index over word bigrams with a document-frequency cap:
    (term, df, ascending comma-joined posting list).  The df cap is
    enforced BEFORE the posting-list exchange (exact dfs from a
    partial-count groupby + broadcast hot-term anti-filter), so every
    posting-building group is bounded."""
    from rify_ray.stages.lexical import postings_index

    return _collect(postings_index(_docs_ds(sf_dir), ngram=2, max_df=200))


def _q_docs_per_source_cap(sf_dir: str):
    """Per-source document cap (the C4/RefinedWeb-style per-host cap):
    keep the first 15 docs per source by doc_id — per-block partial
    combiner, at most k rows per key per block cross the exchange."""
    import ray.data

    from rify_ray.stages.corpus import per_key_cap

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source"],
        override_num_blocks=32,
    )
    return _collect(per_key_cap(ds, key_cols=["source"], order_col="doc_id", k=15))


def _bgp_filter_clauses():
    return [("n", "!=", "n:3")]


def _q_kg_bgp_filtered(sf_dir: str):
    """Basic-graph-pattern query WITH the SPARQL-lite modifiers:
    FILTER (?n != 'n:3'), SELECT DISTINCT ?c ?r — driver path."""
    from rify_ray import engine
    from rify_ray.pipelines.relational import customer_nation_quads, nation_region_quads
    from rify_ray.util import polars_to_arrow_string

    quads = _collect_quads(customer_nation_quads(sf_dir), nation_region_quads(sf_dir))
    out = engine.query(
        quads,
        _bgp_pattern(),
        filters=_bgp_filter_clauses(),
        select=["c", "r"],
        distinct=True,
    )
    return polars_to_arrow_string(out)


def _q_kg_bgp_filtered_store(sf_dir: str):
    """The same filtered BGP on the STORE path: the filter runs as a
    vectorized predicate map over the decoded bindings stream, distinct
    is one groupby exchange over the projected columns."""
    import tempfile

    import ray.data

    from rify_ray import engine
    from rify_ray.pipelines.relational import customer_nation_quads, nation_region_quads
    from rify_ray.util import polars_to_arrow_string

    quads = _collect_quads(customer_nation_quads(sf_dir), nation_region_quads(sf_dir))
    with tempfile.TemporaryDirectory() as d:
        store = engine.infer_store(
            ray.data.from_arrow(polars_to_arrow_string(quads)),
            _rules_in_region(),
            f"{d}/kg",
            num_partitions=8,
        )
        return _collect(
            engine.query_store(
                store,
                _bgp_pattern(),
                num_partitions=8,
                filters=_bgp_filter_clauses(),
                select=["c", "r"],
                distinct=True,
            )
        )


def _kg_premise_quads_ds(sf_dir: str):
    import ray.data

    from rify_ray.pipelines.relational import (
        customer_nation_quads,
        nation_region_quads,
        supplier_nation_quads,
    )
    from rify_ray.util import polars_to_arrow_string

    quads = _collect_quads(
        customer_nation_quads(sf_dir),
        supplier_nation_quads(sf_dir),
        nation_region_quads(sf_dir),
    )
    return ray.data.from_arrow(polars_to_arrow_string(quads)).repartition(16)


def _q_kg_predicate_stats(sf_dir: str):
    """Graph profile per predicate over the premise quads: fact count +
    distinct subject/object cardinalities — per-block combiners, one
    keyed exchange per statistic, driver merge of the tiny result."""
    from rify_ray.stages.graph import predicate_stats

    return _collect(predicate_stats(_kg_premise_quads_ds(sf_dir)))


def _q_kg_top_out_degree(sf_dir: str):
    """Top-10 hub entities by out-degree over the premise quads."""
    from rify_ray.stages.graph import top_degree

    return _collect(top_degree(_kg_premise_quads_ds(sf_dir), k=10, direction="out"))


def _q_events_funnel(sf_dir: str):
    """Ordered view→click→purchase funnel per user (first stage-1
    event, first stage-2 at/after it, ...)."""
    from rify_ray.pipelines.relational import events_funnel

    return _collect(events_funnel(sf_dir))


def _q_revenue_by_nation(sf_dir: str):
    """TPC-H Q5-style star join: revenue per customer nation, exact
    integer 1e-4-dollar units per item so the sum is order-independent.
    Dimensions fold into ONE broadcast lookup; the fact table streams
    through a single attach+preagg map; the only exchange is a
    nation-sized groupby.sum."""
    from rify_ray.pipelines.relational import revenue_by_nation

    return _collect(revenue_by_nation(sf_dir))


def _q_docs_bloom_decontaminate(sf_dir: str):
    """Constant-memory decontamination: the eval gram set lives in a
    16 MB-class Bloom filter instead of a broadcast set — the scale
    path for web-scale blocklists.  Approximate by design (bounded
    false-positive OVERDROP, zero false negatives — property-pinned in
    tests), so rows-only: its exact twin ``docs_ngram_decontaminate``
    carries the SQL oracle."""
    import duckdb

    from rify_ray.stages.corpus import bloom_ngram_decontaminate

    con = duckdb.connect()
    evals = [
        r[0]
        for r in con.execute(
            f"SELECT text FROM '{sf_dir}/documents.parquet' WHERE doc_id % 97 = 0"
        ).fetchall()
    ]
    con.close()
    return _collect(bloom_ngram_decontaminate(_docs_ds(sf_dir), evals, n=8))


def _q_docs_vocab(sf_dir: str):
    """Ranked tokenizer vocabulary: (term, df, vocab_id) with vocab_id
    the 1-based dense rank by (df desc, term asc)."""
    from rify_ray.stages.lexical import vocab_table

    return _collect(vocab_table(_docs_ds(sf_dir)))


def _q_docs_cooccur_top20(sf_dir: str):
    """Top-20 word collocations by lift (PMI sans monotone log): pairs
    form in ONE vectorized within-block self-join (a doc lives in one
    row — no pair exchange), per-block pair-count combiners, min-count
    floor, broadcast unigram-df attach."""
    from rify_ray.stages.lexical import cooccurrence_topk

    return _collect(cooccurrence_topk(_docs_ds(sf_dir), k=20, min_count=5))


def _q_docs_incremental_dedup(sf_dir: str):
    """Snapshot-incremental exact dedup (the recrawl shape): even
    doc_ids are crawl snapshot 1 and commit their digests to a
    persistent store; odd doc_ids are snapshot 2 and keep only docs
    whose content was never seen (deduped within the snapshot,
    min-id survivor)."""
    import tempfile

    from rify_ray.stages.dedup import incremental_exact_dedup

    def parity(rem):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            return batch.filter(
                _pc.equal(_pc.bit_wise_and(batch["doc_id"], 1), rem)
            )

        return fn

    ds = _docs_ds(sf_dir)
    snap1 = ds.map_batches(parity(0), batch_format="pyarrow", zero_copy_batch=True)
    snap2 = ds.map_batches(parity(1), batch_format="pyarrow", zero_copy_batch=True)
    with tempfile.TemporaryDirectory() as d:
        incremental_exact_dedup(snap1, f"{d}/digests")
        out, _ = incremental_exact_dedup(snap2, f"{d}/digests")
        return _collect(out)


def _q_events_retention(sf_dir: str):
    """Cohort retention triangle: users cohorted by first-event day,
    distinct active users per (cohort_day, day_offset ≤ 30)."""
    from rify_ray.pipelines.relational import events_retention

    return _collect(events_retention(sf_dir))


def _q_docs_jsonl_roundtrip(sf_dir: str):
    """JSONL interchange: dump the documents table to newline-delimited
    JSON part files (distributed formatting, streamed bounded writes),
    read it back through the vectorized pyarrow.json parse, and return
    the table — the oracle checks byte-exact equality with the parquet
    source."""
    import tempfile

    import ray.data

    from rify_ray.sources import read_jsonl, write_jsonl

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", override_num_blocks=8)
    with tempfile.TemporaryDirectory() as d:
        write_jsonl(ds, f"{d}/docs")
        return _collect(read_jsonl(f"{d}/docs", schema=schema))


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "kg_customer_region": _q_kg_customer_region,
        "kg_customer_region_store": _q_kg_customer_region_store,
        "kg_customer_region_incr": _q_kg_customer_region_incr,
        "kg_bgp_customer_region": _q_kg_bgp_customer_region,
        "kg_bgp_store": _q_kg_bgp_store,
        "kg_bgp_filtered": _q_kg_bgp_filtered,
        "kg_bgp_filtered_store": _q_kg_bgp_filtered_store,
        "kg_customer_region_retract": _q_kg_customer_region_retract,
        "kg_conational": _q_kg_conational,
        "kg_conational_store": _q_kg_conational_store,
        "kg_conational_retract": _q_kg_conational_retract,
        "kg_nation_chain_closure": _q_kg_nation_chain_closure,
        "kg_prove_chain": _q_kg_prove_chain,
        "kg_predicate_stats": _q_kg_predicate_stats,
        "kg_top_out_degree": _q_kg_top_out_degree,
        "kg_pages_flagship": _q_kg_pages_flagship,
        "dedup_exact_docs": _q_dedup_exact_docs,
        "dedup_clusters_exact": _q_dedup_clusters_exact,
        "dedup_clusters_minhash": _q_dedup_clusters_minhash,
        "docs_neardup_survivors": _q_docs_neardup_survivors,
        "source_stats": _q_source_stats,
        "cc_label_groups": _q_cc_label_groups,
        "text_token_counts": _q_text_token_counts,
        "text_char_stats": _q_text_char_stats,
        "text_lang_id": _q_text_lang_id,
        "text_fingerprint": _q_text_fingerprint,
        "text_quality": _q_text_quality,
        "text_repetition": _q_text_repetition,
        "text_bpe_token_counts": _q_text_bpe_token_counts,
        "text_winnow_fp": _q_text_winnow_fp,
        "docs_normalize": _q_docs_normalize,
        "docs_stable_sample": _q_docs_stable_sample,
        "docs_decontaminate": _q_docs_decontaminate,
        "docs_redact": _q_docs_redact,
        "docs_stratified_sample": _q_docs_stratified_sample,
        "docs_quality_filter": _q_docs_quality_filter,
        "docs_mixture_sample": _q_docs_mixture_sample,
        "docs_ngram_decontaminate": _q_docs_ngram_decontaminate,
        "docs_pack_bins": _q_docs_pack_bins,
        "events_hopping_counts": _q_events_hopping_counts,
        "events_value_p50_sketch": _q_events_value_p50_sketch,
        "embed_norm_top10": _q_embed_norm_top10,
        "ngram_top20": _q_ngram_top20,
        "events_window_counts": _q_events_window_counts,
        "events_asof_prior_purchase": _q_events_asof_prior_purchase,
        "events_range_purchases_24h": _q_events_range_purchases_24h,
        "events_value_quantiles": _q_events_value_quantiles,
        "docs_topk_per_source": _q_docs_topk_per_source,
        "docs_tfidf_top5": _q_docs_tfidf_top5,
        "docs_postings_index": _q_docs_postings_index,
        "docs_per_source_cap": _q_docs_per_source_cap,
        "events_distinct_users": _q_events_distinct_users,
        "events_distinct_users_hll": _q_events_distinct_users_hll,
        "top_users_by_events": _q_top_users_by_events,
        "orders_by_status_priority": _q_orders_by_status_priority,
        "orders_rollup": _q_orders_rollup,
        "events_type_pivot": _q_events_type_pivot,
        "events_user_running": _q_events_user_running,
        "segment_order_counts": _q_segment_order_counts,
        "lineitem_pricing_cents": _q_lineitem_pricing_cents,
        "events_sessionize": _q_events_sessionize,
        "events_funnel": _q_events_funnel,
        "events_retention": _q_events_retention,
        "docs_incremental_dedup": _q_docs_incremental_dedup,
        "docs_cooccur_top20": _q_docs_cooccur_top20,
        "docs_vocab": _q_docs_vocab,
        "docs_bloom_decontaminate": _q_docs_bloom_decontaminate,
        "revenue_by_nation": _q_revenue_by_nation,
        "docs_jsonl_roundtrip": _q_docs_jsonl_roundtrip,
        "events_props_extract": _q_events_props_extract,
        "kg_pages_store": _q_kg_pages_store,
        "knn_cosine_top5": _q_knn_cosine_top5,
        "knn_lsh_top3": _q_knn_lsh_top3,
        "knn_ivf_top3": _q_knn_ivf_top3,
        "minhash_candidates": _q_minhash_candidates,
        "minhash_verified": _q_minhash_verified,
        "dedup_ngram_jaccard": _q_dedup_ngram_jaccard,
        "simhash_neardup": _q_simhash_neardup,
        "embed_neardup": _q_embed_neardup,
        "multimodal_decode": _q_multimodal_decode,
    }


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------


def _lang_id_sql() -> str:
    from rify_ray.stages.text import LANG_MARKERS

    score_exprs = []
    for name, markers in LANG_MARKERS:
        parts = [
            f"(length(text) - length(replace(text, '{m}', ''))) // {len(m)}"
            for m in markers
        ]
        score_exprs.append(f"({' + '.join(parts)}) AS {name}")
    scores = ", ".join(score_exprs)
    names = [name for name, _ in LANG_MARKERS]
    case = (
        f"CASE WHEN {names[0]} >= {names[1]} AND {names[0]} >= {names[2]} THEN '{names[0]}' "
        f"WHEN {names[1]} >= {names[2]} THEN '{names[1]}' ELSE '{names[2]}' END"
    )
    return (
        f"SELECT doc_id, {case} AS lang_pred "
        f"FROM (SELECT doc_id, {scores} FROM documents)"
    )


def _quality_sql() -> str:
    from rify_ray.stages.text import QUALITY_STOPWORDS

    sw = " + ".join(
        f"(length(text) - length(replace(text, '{w}', ''))) // {len(w)}"
        for w in QUALITY_STOPWORDS
    )
    return (
        "SELECT doc_id, "
        f"CAST(({sw}) * 10000 // GREATEST(length(regexp_extract_all(text, '\\S+')), 1) AS BIGINT) AS stopword_bp, "
        "CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 10000 "
        "// GREATEST(length(text), 1) AS BIGINT) AS punct_bp, "
        "CAST(length(replace(text, ' ', '')) * 100 "
        "// GREATEST(length(regexp_extract_all(text, '\\S+')), 1) AS BIGINT) AS token_len_c "
        "FROM documents"
    )


def _pages_closure_sql(dump_name: str) -> str:
    """DuckDB twin of the flagship: recursive ancestor closure over the
    canonicalized premise quads the query dumps to scratch (see
    ``_dump_oracle_quads`` — deterministic synthetic pages, so the file
    is byte-stable across runs).  Derived set = closure minus premises,
    mirroring ``store.decoded_dataset(first_gen=1)``."""
    prem = f"read_parquet('/tmp/rify_ray_oracle/{dump_name}.parquet')"
    return (
        f"WITH RECURSIVE prem AS (SELECT s, p, o, g FROM {prem}), "
        "base AS (SELECT DISTINCT s, o FROM prem "
        "WHERE p IN ('parent', 'ancestor') AND g = 'default_graph'), "
        "anc AS (SELECT s, o FROM base "
        "UNION SELECT a.s, b.o FROM anc a JOIN base b ON a.o = b.s) "
        "SELECT a.s AS s, 'ancestor' AS p, a.o AS o, 'default_graph' AS g "
        "FROM anc a WHERE NOT EXISTS "
        "(SELECT 1 FROM prem WHERE prem.s = a.s AND prem.p = 'ancestor' "
        "AND prem.o = a.o AND prem.g = 'default_graph')"
    )


def oracle_sql() -> dict[str, str]:
    return {
        "kg_pages_flagship": _pages_closure_sql("flagship_premises"),
        "kg_pages_store": _pages_closure_sql("pages_store_premises"),
        "kg_customer_region": (
            "SELECT 'c:' || c_custkey AS s, 'in_region' AS p, "
            "'r:' || r_regionkey AS o, 'default_graph' AS g "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey"
        ),
        "kg_customer_region_store": (
            "SELECT 'c:' || c_custkey AS s, 'in_region' AS p, "
            "'r:' || r_regionkey AS o, 'default_graph' AS g "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey"
        ),
        "kg_customer_region_incr": (
            "SELECT 'c:' || c_custkey AS s, 'in_region' AS p, "
            "'r:' || r_regionkey AS o, 'default_graph' AS g "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey"
        ),
        "kg_customer_region_retract": (
            "SELECT 'c:' || c_custkey AS s, 'in_region' AS p, "
            "'r:' || r_regionkey AS o, 'default_graph' AS g "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE c_custkey % 2 = 0"
        ),
        # basic-graph-pattern query (no inference): bindings of
        # [?c in_nation ?n] & [?n in_region ?r] over the premise quads
        "kg_bgp_customer_region": (
            "SELECT 'c:' || c_custkey AS c, 'n:' || n_nationkey AS n, "
            "'r:' || n_regionkey AS r "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey"
        ),
        "kg_bgp_store": (
            "SELECT 'c:' || c_custkey AS c, 'n:' || n_nationkey AS n, "
            "'r:' || n_regionkey AS r "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey"
        ),
        "kg_predicate_stats": (
            "WITH quads AS ("
            "SELECT 'c:' || c_custkey AS s, 'in_nation' AS p, "
            "'n:' || c_nationkey AS o FROM customer "
            "UNION ALL SELECT 's:' || s_suppkey, 'in_nation', "
            "'n:' || s_nationkey FROM supplier "
            "UNION ALL SELECT 'n:' || n_nationkey, 'in_region', "
            "'r:' || n_regionkey FROM nation) "
            "SELECT p, CAST(count(*) AS BIGINT) AS n_facts, "
            "CAST(count(DISTINCT s) AS BIGINT) AS n_subjects, "
            "CAST(count(DISTINCT o) AS BIGINT) AS n_objects "
            "FROM quads GROUP BY p"
        ),
        "kg_top_out_degree": (
            "WITH quads AS ("
            "SELECT 'c:' || c_custkey AS s FROM customer "
            "UNION ALL SELECT 's:' || s_suppkey FROM supplier "
            "UNION ALL SELECT 'n:' || n_nationkey FROM nation) "
            "SELECT s AS entity, CAST(count(*) AS BIGINT) AS degree "
            "FROM quads GROUP BY s ORDER BY degree DESC, entity LIMIT 10"
        ),
        "events_funnel": (
            "WITH v AS (SELECT user_id, min(ts) AS t FROM events "
            "WHERE event_type = 'view' GROUP BY 1), "
            "c AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            "JOIN v ON e.user_id = v.user_id AND e.ts >= v.t "
            "WHERE e.event_type = 'click' GROUP BY 1), "
            "p AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            "JOIN c ON e.user_id = c.user_id AND e.ts >= c.t "
            "WHERE e.event_type = 'purchase' GROUP BY 1) "
            "SELECT CAST(v.user_id AS BIGINT) AS user_id, "
            "epoch_us(v.t) AS t_view_us, epoch_us(c.t) AS t_click_us, "
            "epoch_us(p.t) AS t_purchase_us "
            "FROM v LEFT JOIN c ON v.user_id = c.user_id "
            "LEFT JOIN p ON v.user_id = p.user_id"
        ),
        "docs_jsonl_roundtrip": (
            "SELECT doc_id, text, lang, source, n_chars FROM documents"
        ),
        "revenue_by_nation": (
            "SELECT n_name, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) "
            "AS revenue_c4, CAST(count(*) AS BIGINT) AS n_items "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "GROUP BY n_name"
        ),
        "docs_vocab": (
            "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term "
            "FROM documents), "
            "d AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks "
            "WHERE term <> '' GROUP BY 1) "
            "SELECT term, CAST(df AS BIGINT) AS df, "
            "CAST(row_number() OVER (ORDER BY df DESC, term) AS BIGINT) AS vocab_id "
            "FROM d"
        ),
        "docs_cooccur_top20": (
            "WITH w AS (SELECT DISTINCT doc_id, term FROM "
            "(SELECT doc_id, unnest(string_split(text, ' ')) AS term "
            "FROM documents) WHERE term <> ''), "
            "uni AS (SELECT term, count(*) AS df FROM w GROUP BY 1), "
            "n AS (SELECT count(*) AS n_docs FROM documents), "
            "pairs AS (SELECT a.term AS w1, b.term AS w2, count(*) AS pair_n "
            "FROM w a JOIN w b ON a.doc_id = b.doc_id AND a.term < b.term "
            "GROUP BY 1, 2 HAVING count(*) >= 5) "
            "SELECT w1, w2, CAST(pair_n AS BIGINT) AS pair_n, "
            "CAST(d1.df AS BIGINT) AS df1, CAST(d2.df AS BIGINT) AS df2, "
            "CAST(pair_n * n.n_docs AS DOUBLE) / (d1.df * d2.df) AS lift "
            "FROM pairs JOIN uni d1 ON w1 = d1.term "
            "JOIN uni d2 ON w2 = d2.term CROSS JOIN n "
            "ORDER BY lift DESC, w1, w2 LIMIT 20"
        ),
        "docs_incremental_dedup": (
            "WITH s2 AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1), "
            "s1 AS (SELECT text FROM documents WHERE doc_id % 2 = 0) "
            "SELECT d.doc_id FROM s2 d "
            "WHERE NOT EXISTS (SELECT 1 FROM s1 WHERE s1.text = d.text) "
            "AND d.doc_id = (SELECT min(x.doc_id) FROM s2 x WHERE x.text = d.text)"
        ),
        "events_retention": (
            "WITH f AS (SELECT user_id, CAST(min(ts) AS DATE) AS cohort "
            "FROM events GROUP BY 1), "
            "a AS (SELECT DISTINCT e.user_id, f.cohort, "
            "date_diff('day', f.cohort, CAST(e.ts AS DATE)) AS day_offset "
            "FROM events e JOIN f ON e.user_id = f.user_id "
            "WHERE date_diff('day', f.cohort, CAST(e.ts AS DATE)) "
            "BETWEEN 0 AND 30) "
            "SELECT CAST(cohort AS VARCHAR) AS cohort_day, "
            "CAST(day_offset AS BIGINT) AS day_offset, "
            "CAST(count(*) AS BIGINT) AS n_users FROM a GROUP BY 1, 2"
        ),
        # FILTER (?n != 'n:3') + SELECT DISTINCT ?c ?r — string
        # comparison on the term text, exactly the engine's semantics
        "kg_bgp_filtered": (
            "SELECT DISTINCT 'c:' || c_custkey AS c, 'r:' || n_regionkey AS r "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "WHERE 'n:' || n_nationkey <> 'n:3'"
        ),
        "kg_bgp_filtered_store": (
            "SELECT DISTINCT 'c:' || c_custkey AS c, 'r:' || n_regionkey AS r "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "WHERE 'n:' || n_nationkey <> 'n:3'"
        ),
        "kg_conational": (
            "WITH ents AS ("
            "SELECT 'c:' || c_custkey AS e, c_nationkey AS nk FROM customer "
            "UNION ALL SELECT 's:' || s_suppkey, s_nationkey FROM supplier) "
            "SELECT a.e AS s, 'conational' AS p, b.e AS o, 'default_graph' AS g "
            "FROM ents a JOIN ents b ON a.nk = b.nk"
        ),
        "kg_conational_store": (
            "WITH ents AS ("
            "SELECT 'c:' || c_custkey AS e, c_nationkey AS nk FROM customer "
            "UNION ALL SELECT 's:' || s_suppkey, s_nationkey FROM supplier) "
            "SELECT a.e AS s, 'conational' AS p, b.e AS o, 'default_graph' AS g "
            "FROM ents a JOIN ents b ON a.nk = b.nk"
        ),
        # retraction at scale: surviving conational closure == the
        # from-scratch recompute over the non-retracted entities
        "kg_conational_retract": (
            "WITH ents AS ("
            "SELECT 'c:' || c_custkey AS e, c_nationkey AS nk FROM customer "
            "WHERE c_custkey % 100 <> 1 "
            "UNION ALL SELECT 's:' || s_suppkey, s_nationkey FROM supplier) "
            "SELECT a.e AS s, 'conational' AS p, b.e AS o, 'default_graph' AS g "
            "FROM ents a JOIN ents b ON a.nk = b.nk"
        ),
        "kg_nation_chain_closure": (
            "WITH ordered AS (SELECT n_nationkey, "
            "row_number() OVER (ORDER BY n_nationkey) AS rn FROM nation) "
            "SELECT 'n:' || a.n_nationkey AS s, 'reach' AS p, "
            "'n:' || b.n_nationkey AS o, 'default_graph' AS g "
            "FROM ordered a JOIN ordered b ON a.rn < b.rn"
        ),
        # prove+validate hard signal: assumed == the full succ premise
        # chain (a path proof must traverse every edge), goal row ==
        # reach(min nation, max nation)
        "kg_prove_chain": (
            "WITH chain AS (SELECT 'n:' || n_nationkey AS s, 'succ' AS p, "
            "'n:' || lead(n_nationkey) OVER (ORDER BY n_nationkey) AS o, "
            "'default_graph' AS g FROM nation) "
            "SELECT 'assumed' AS kind, s, p, o, g FROM chain WHERE o IS NOT NULL "
            "UNION ALL "
            "SELECT 'goal_implied', 'n:' || (SELECT min(n_nationkey) FROM nation), "
            "'reach', 'n:' || (SELECT max(n_nationkey) FROM nation), 'default_graph'"
        ),
        "dedup_exact_docs": "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text",
        # exact n-gram-Jaccard near-dup: char-5 shingles, candidates share
        # >=1 shingle with document frequency <= 50, threshold 4/5 compared
        # by integer cross-multiplication (mirrors ngram_jaccard_pairs)
        "dedup_ngram_jaccard": (
            "WITH sh AS ("
            "SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS s "
            "FROM (SELECT doc_id, text, unnest(range(1, length(text) - 3)) AS i "
            "FROM documents)), "
            "df AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 50), "
            "cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2 "
            "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id "
            "JOIN df ON df.s = a.s), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i "
            "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id "
            "JOIN cand c ON c.id1 = a.doc_id AND c.id2 = b.doc_id GROUP BY 1, 2) "
            "SELECT i.id1, i.id2, CAST(i.i AS BIGINT) AS inter_n, "
            "CAST(s1.n + s2.n - i.i AS BIGINT) AS union_n "
            "FROM inter i JOIN sizes s1 ON s1.doc_id = i.id1 "
            "JOIN sizes s2 ON s2.doc_id = i.id2 "
            "WHERE 5 * i.i >= 4 * (s1.n + s2.n - i.i)"
        ),
        "source_stats": (
            "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(length(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS sum_tokens, "
            "CAST(sum(length(text)) AS BIGINT) AS sum_chars "
            "FROM documents GROUP BY source"
        ),
        "dedup_clusters_exact": (
            "SELECT d.doc_id AS doc_id, m.cluster_id AS cluster_id "
            "FROM documents d JOIN (SELECT text, min(doc_id) AS cluster_id, "
            "count(*) AS c FROM documents GROUP BY text) m ON d.text = m.text "
            "WHERE m.c > 1"
        ),
        "cc_label_groups": (
            "SELECT d.doc_id AS doc_id, m.cluster_id AS cluster_id "
            "FROM documents d JOIN (SELECT n_chars, min(doc_id) AS cluster_id, "
            "count(*) AS c FROM documents GROUP BY n_chars) m "
            "ON d.n_chars = m.n_chars WHERE m.c > 1"
        ),
        "text_token_counts": (
            "SELECT doc_id, CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) "
            "AS n_tokens FROM documents"
        ),
        "text_char_stats": (
            "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, "
            "CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha, "
            "CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit, "
            "CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_space "
            "FROM documents"
        ),
        "text_lang_id": _lang_id_sql(),
        "text_bpe_token_counts": (
            "SELECT doc_id, CAST(length(regexp_extract_all(text, "
            "$$'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+$$"
            ")) AS BIGINT) AS n_bpe_tokens FROM documents"
        ),
        "text_quality": _quality_sql(),
        "text_repetition": (
            "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w "
            "FROM documents), "
            "per AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w), "
            "agg AS (SELECT doc_id, sum(c) AS total, count(*) AS n_distinct, "
            "max(c) AS maxc FROM per GROUP BY doc_id) "
            "SELECT doc_id, CAST(10000 * (total - n_distinct) // total AS BIGINT) "
            "AS dup_word_bp, CAST(10000 * maxc // total AS BIGINT) AS top_word_bp "
            "FROM agg"
        ),
        "events_value_quantiles": (
            "WITH c AS (SELECT event_type, "
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events) "
            "SELECT event_type, "
            "quantile_disc(cents, 0.25) AS p25_cents, "
            "quantile_disc(cents, 0.5) AS p50_cents, "
            "quantile_disc(cents, 0.75) AS p75_cents, "
            "quantile_disc(cents, 0.9) AS p90_cents "
            "FROM c GROUP BY event_type"
        ),
        "events_range_purchases_24h": (
            "WITH l AS (SELECT event_id, user_id, ts FROM events "
            "WHERE event_type = 'error'), "
            "r AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase') "
            "SELECT CAST(l.event_id AS BIGINT) AS event_id, "
            "CAST(l.user_id AS BIGINT) AS user_id, epoch_us(l.ts) AS ts_us, "
            "CAST(count(r.user_id) AS BIGINT) AS n_purchases_24h "
            "FROM l LEFT JOIN r ON l.user_id = r.user_id "
            "AND r.ts BETWEEN l.ts - INTERVAL 1 DAY AND l.ts "
            "GROUP BY l.event_id, l.user_id, l.ts"
        ),
        "docs_topk_per_source": (
            "SELECT doc_id, source, n_chars FROM documents "
            "QUALIFY row_number() OVER (PARTITION BY source "
            "ORDER BY n_chars DESC, doc_id) <= 3"
        ),
        # linear idf: score = tf/df (N constant across terms drops out
        # of the ranking; an IEEE double division is exactly rounded,
        # so the float column hashes identically across engines)
        "docs_tfidf_top5": (
            "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term "
            "FROM documents), "
            "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
            "WHERE term <> '' GROUP BY 1, 2), "
            "df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks "
            "WHERE term <> '' GROUP BY 1) "
            "SELECT CAST(t.doc_id AS BIGINT) AS doc_id, t.term, "
            "CAST(t.tf AS BIGINT) AS tf, CAST(d.df AS BIGINT) AS df, "
            "CAST(t.tf AS DOUBLE) / d.df AS score "
            "FROM tf t JOIN df d USING (term) "
            "QUALIFY row_number() OVER (PARTITION BY t.doc_id "
            "ORDER BY CAST(t.tf AS DOUBLE) / d.df DESC, t.term) <= 5"
        ),
        "docs_postings_index": (
            "WITH s AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
            "g AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] AS term "
            "FROM s, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)) "
            "SELECT term, CAST(count(*) AS BIGINT) AS df, "
            "string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings "
            "FROM g GROUP BY term HAVING count(*) <= 200"
        ),
        "docs_per_source_cap": (
            "SELECT doc_id, source FROM documents "
            "QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 15"
        ),
        "events_distinct_users": (
            "SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events"
        ),
        "events_asof_prior_purchase": (
            "WITH l AS (SELECT event_id, user_id, ts FROM events "
            "WHERE event_type = 'error'), "
            "r AS (SELECT event_id, user_id, ts FROM events "
            "WHERE event_type = 'purchase') "
            "SELECT CAST(l.event_id AS BIGINT) AS event_id, "
            "CAST(l.user_id AS BIGINT) AS user_id, epoch_us(l.ts) AS ts_us, "
            "CAST(r.event_id AS BIGINT) AS prior_event_id, "
            "epoch_us(r.ts) AS prior_ts_us "
            "FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts"
        ),
        "docs_normalize": (
            "SELECT doc_id, trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))) "
            "AS norm FROM documents"
        ),
        "docs_stable_sample": (
            "SELECT doc_id, text FROM documents "
            "WHERE (doc_id * 2654435761 % 4294967296) % 100 < 10"
        ),
        "docs_decontaminate": (
            "SELECT doc_id, text FROM documents WHERE "
            + " AND ".join(
                f"text NOT LIKE '%{p}%'" for p in DECONTAMINATE_PHRASES
            )
        ),
        "docs_redact": (
            "SELECT doc_id, regexp_replace(text, "
            "'\\b(customer|spark|vector)\\b', '[REDACTED]', 'g') AS text "
            "FROM documents"
        ),
        "docs_stratified_sample": (
            "SELECT doc_id, source FROM documents "
            "QUALIFY row_number() OVER (PARTITION BY source "
            "ORDER BY (doc_id * 2654435761 % 4294967296), doc_id) <= 5"
        ),
        "docs_mixture_sample": (
            "SELECT doc_id, source FROM documents "
            "WHERE (doc_id * 2654435761 % 4294967296) % 100 < "
            "CASE source "
            + " ".join(f"WHEN '{s}' THEN {p}" for s, p in sorted(MIXTURE_RATES.items()))
            + " ELSE 5 END"
        ),
        "docs_quality_filter": (
            "WITH s AS (" + _quality_sql() + ") "
            "SELECT doc_id, stopword_bp FROM s WHERE stopword_bp >= "
            "(SELECT quantile_disc(stopword_bp, 0.5) FROM s)"
        ),
        "docs_ngram_decontaminate": (
            "WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), "
            "g AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || "
            "w[i+3] || ' ' || w[i+4] AS gram "
            "FROM ws, UNNEST(generate_series(1, len(w) - 4)) AS t(i)), "
            "e AS (SELECT DISTINCT gram FROM g WHERE doc_id < 3), "
            "bad AS (SELECT DISTINCT g.doc_id FROM g JOIN e USING (gram)) "
            "SELECT doc_id FROM documents "
            "WHERE doc_id NOT IN (SELECT doc_id FROM bad)"
        ),
        "docs_pack_bins": (
            "WITH t AS (SELECT doc_id, source, "
            "CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens "
            "FROM documents), "
            "c AS (SELECT doc_id, source, n_tokens, "
            "SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id "
            "ROWS UNBOUNDED PRECEDING) AS cum FROM t) "
            "SELECT doc_id, source, n_tokens, "
            "CAST((cum - n_tokens) // 512 AS BIGINT) AS bin FROM c"
        ),
        "events_hopping_counts": (
            "WITH e AS (SELECT epoch_us(ts) AS tus, event_type FROM events), "
            "w AS (SELECT event_type, (tus // 3600000000) * 3600 AS window_start "
            "FROM e UNION ALL "
            "SELECT event_type, (tus // 3600000000) * 3600 - 3600 AS window_start "
            "FROM e) "
            "SELECT event_type, window_start, CAST(count(*) AS BIGINT) AS n_events "
            "FROM w GROUP BY event_type, window_start"
        ),
        "embed_norm_top10": (
            "SELECT CAST(rn AS BIGINT) AS rank, vec_id FROM ("
            "SELECT vec_id, row_number() OVER (ORDER BY "
            "list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x)) "
            "DESC, vec_id) AS rn FROM embeddings) WHERE rn <= 10"
        ),
        "ngram_top20": (
            "WITH s AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
            "b AS (SELECT ws[i] || ' ' || ws[i+1] AS gram "
            "FROM s, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)) "
            "SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM b "
            "GROUP BY gram ORDER BY cnt DESC, gram LIMIT 20"
        ),
        "text_fingerprint": "SELECT doc_id, md5(text) AS fingerprint FROM documents",
        "events_window_counts": (
            "SELECT CAST(user_id AS BIGINT) AS user_id, "
            "CAST((epoch_us(ts) // 3600000000) * 3600 AS BIGINT) AS window_start, "
            "CAST(count(*) AS BIGINT) AS n_events "
            "FROM events GROUP BY 1, 2"
        ),
        "top_users_by_events": (
            "SELECT CAST(user_id AS BIGINT) AS user_id, "
            "CAST(count(*) AS BIGINT) AS n_events FROM events GROUP BY user_id "
            "ORDER BY n_events DESC, user_id LIMIT 10"
        ),
        "orders_by_status_priority": (
            "SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders "
            "FROM orders GROUP BY 1, 2"
        ),
        # ROLLUP levels labeled 'ALL'; cents rounded per row then summed
        # as integers (order-independent), mirroring orders_rollup
        "orders_rollup": (
            "SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus, "
            "COALESCE(o_orderpriority, 'ALL') AS o_orderpriority, "
            "CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents "
            "FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)"
        ),
        "events_type_pivot": (
            "SELECT user_id, "
            "CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click, "
            "CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error, "
            "CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase, "
            "CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup, "
            "CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view "
            "FROM events GROUP BY user_id"
        ),
        "events_user_running": (
            "SELECT event_id, user_id, "
            "CAST(row_number() OVER w AS BIGINT) AS run_n, "
            "CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS run_cents "
            "FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING)"
        ),
        "segment_order_counts": (
            "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders "
            "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1"
        ),
        "lineitem_pricing_cents": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(ROUND(SUM(l_quantity) * 100) AS BIGINT) AS sum_qty_cents, "
            "CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT) AS sum_price_cents "
            "FROM lineitem GROUP BY 1, 2"
        ),
        "events_props_extract": (
            "SELECT CAST(event_id AS BIGINT) AS event_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS k_val FROM events"
        ),
        "events_sessionize": (
            "WITH marked AS ("
            "  SELECT user_id, epoch_us(ts) AS tus, "
            "    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000 "
            "         THEN 1 ELSE 0 END AS brk "
            "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))"
            "), sess AS ("
            "  SELECT user_id, tus, "
            "    SUM(brk) OVER (PARTITION BY user_id ORDER BY tus "
            "      ROWS UNBOUNDED PRECEDING) AS session_id "
            "  FROM marked) "
            "SELECT CAST(user_id AS BIGINT) AS user_id, "
            "  CAST(session_id AS BIGINT) AS session_id, "
            "  CAST(count(*) AS BIGINT) AS n_events, "
            "  CAST(min(tus) AS BIGINT) AS start_us "
            "FROM sess GROUP BY user_id, session_id"
        ),
        "embed_neardup": (
            "SELECT a.vec_id AS id1, b.vec_id AS id2 "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.45"
        ),
        "knn_cosine_top5": (
            "WITH q AS (SELECT vec_id AS query_id, "
            "CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id < 10), "
            "sims AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
            "list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sim "
            "FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id) "
            "SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM ("
            "SELECT query_id, neighbor_id, row_number() OVER ("
            "PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM sims) "
            "WHERE rank <= 5"
        ),
    }
