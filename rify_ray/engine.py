"""Distributed semi-naive forward-chaining fixpoint over Ray Data.

Public API mirrors the reference's three entry points:

- :func:`infer`  — ``/root/reference/src/infer.rs:9-26``
- :func:`prove`  — ``/root/reference/src/prove.rs:58-88``
- :func:`validate` — ``/root/reference/src/validate.rs:61-82``

Architecture (SURVEY.md §3.4):

* Facts are quads of **strings** ``(s, p, o, g)``; non-string terms are
  transparently JSON-encoded/decoded at the boundary (the reference is
  generic over ``Bound: Ord`` — tests use ``&str``, ``u32`` and RDF-term
  enums, ``src/infer.rs:9``).
* Rules are compiled on the driver into per-delta-position join-chain
  plans (:mod:`rify_ray.plan`); rules/plans/proofs stay on the driver —
  only fact state is distributed (SURVEY.md §7.4 item 9).
* Each fixpoint round is semi-naive: for every rule and every body
  position, a join chain seeded with the delta set, then first-wins
  dedup and an anti-join against the full store (``apply_related``,
  ``src/reasoner.rs:131-155``; ``low_infer``, ``src/infer.rs:29-101``).
* Three physical evaluators:
  - **broadcast** (:mod:`rify_ray.eval_broadcast`) — vectorized polars
    hash joins on an in-memory table; the small-side path for
    driver-resident fixpoints (chosen per-iteration by store size).
  - **hybrid** (:mod:`rify_ray.eval_hybrid`) — the store-resident
    (:func:`infer_store`) round: per-operation strategy choice between
    fused lazy polars, broadcast-map joins and shuffle exchanges,
    bounded by ``broadcast_rows``.
  - **shuffle** (:mod:`rify_ray.eval_shuffle`) — real
    ``ray.data.Dataset.join`` hash-shuffle exchanges; the 100 TB path.
* Optional per-iteration Parquet checkpointing with a manifest, making
  a long fixpoint resumable (BASELINE.json ``north_rule``).

Determinism: output facts are a set; we expose them with an
``iteration`` column (round of first derivation) and sort within a round
by quad, so output files are reproducible.  Proof *content* may differ
from the reference's sequential proofs, but every proof is validated by
the order-sensitive :func:`validate` replay (SURVEY.md §7.4 item 2).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple, Union

import polars as pl
import pyarrow as pa

from . import local as _local
from .state import store as _state_store
from .eval_broadcast import FACT_COLS, LKEY_SEP, run_iteration
from .model import (
    Entity,
    ExhaustedSearchSpace,
    Fact,
    NovelName,
    Rule,
    RuleApplication,
    Valid,
)
from .plan import RulePlan, compile_rules

# rows in the full store above which an iteration switches from the
# broadcast evaluator to Dataset.join shuffles
DEFAULT_BROADCAST_THRESHOLD = 2_000_000

_JSON_PREFIX = "\x00j:"

# per-phase wall times of the most recent remove_premises_store call
# (observability only — bench/tests read it to attribute retraction cost)
RETRACT_PHASES: Dict[str, float] = {}


# ---------------------------------------------------------------------------
# term encoding: the engine is string-typed; arbitrary Ord terms in/out
# ---------------------------------------------------------------------------


def encode_term(t: Any) -> str:
    if isinstance(t, str) and not t.startswith(_JSON_PREFIX):
        return t
    return _JSON_PREFIX + json.dumps(t, sort_keys=True, separators=(",", ":"))


def decode_term(s: str) -> Any:
    if s.startswith(_JSON_PREFIX):
        return json.loads(s[len(_JSON_PREFIX):])
    return s


def decode_lkey(lkey: str) -> Tuple[int, Tuple[str, ...]]:
    """Inverse of the lineage-key encoding (see eval_broadcast docstring)."""
    parts = lkey.split(LKEY_SEP)
    rule_index = int(parts[0])
    return rule_index, tuple(parts[1:])


def _encode_terms_batch_fn():
    """map_batches fn applying :func:`encode_term` column-wise to quad
    batches — vectorized for the common column types (string passthrough
    with a prefix-collision guard, integers via cast + prefix join, the
    JSON encodings coincide), per-value JSON fallback otherwise."""

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        arrays = {}
        for c in FACT_COLS:
            col = batch[c]
            t = col.type
            if pa.types.is_string(t) or pa.types.is_large_string(t):
                col = pc.cast(col, pa.string())
                clash = pc.starts_with(col, pattern=_JSON_PREFIX)
                if pc.any(clash).as_py():
                    col = pa.array([encode_term(v.as_py()) for v in col], pa.string())
                arrays[c] = col
            elif pa.types.is_integer(t):
                # encode_term(int) == _JSON_PREFIX + json.dumps(int) ==
                # _JSON_PREFIX + str(int): a pure vectorized string build
                arrays[c] = pc.binary_join_element_wise(
                    _JSON_PREFIX, pc.cast(col, pa.string()), ""
                )
            else:
                arrays[c] = pa.array(
                    [encode_term(v.as_py()) for v in col], pa.string()
                )
        return pa.table(arrays)

    return fn


def _encode_rule(rule: Rule) -> Rule:
    from .model import B, U

    def enc(atom):
        return [U(e.value) if e.is_unbound() else B(encode_term(e.value)) for e in atom]

    return Rule(tuple(tuple(enc(a)) for a in rule.if_all), tuple(tuple(enc(a)) for a in rule.then))


# ---------------------------------------------------------------------------
# input normalization
# ---------------------------------------------------------------------------

QuadsLike = Union[Sequence[Fact], pa.Table, pl.DataFrame, "ray.data.Dataset"]  # noqa: F821


def _to_polars(premises: QuadsLike) -> Tuple[pl.DataFrame, bool]:
    """Normalize premises to a polars frame of string quads.

    Returns (frame, decoded) where decoded=True means terms went through
    JSON encoding (list-of-tuples input with non-string terms).
    """
    if isinstance(premises, pl.DataFrame):
        return premises.select(FACT_COLS), False
    if isinstance(premises, pa.Table):
        return pl.from_arrow(premises).select(FACT_COLS), False
    try:
        import ray.data

        if isinstance(premises, ray.data.Dataset):
            batches = list(
                premises.select_columns(FACT_COLS).iter_batches(
                    batch_size=None, batch_format="pyarrow"
                )
            )
            if not batches:
                return pl.DataFrame(schema={c: pl.Utf8 for c in FACT_COLS}), False
            return pl.from_arrow(pa.concat_tables(batches)).select(FACT_COLS), False
    except ImportError:  # pragma: no cover
        pass
    # sequence of 4-tuples of arbitrary Ord terms
    rows = list(premises)
    needs_encode = any(not isinstance(t, str) for f in rows for t in f)
    if needs_encode:
        rows = [tuple(encode_term(t) for t in f) for f in rows]
    cols = {c: [f[j] for f in rows] for j, c in enumerate(FACT_COLS)}
    return pl.DataFrame(cols, schema={c: pl.Utf8 for c in FACT_COLS}), needs_encode


# ---------------------------------------------------------------------------
# fixpoint driver
# ---------------------------------------------------------------------------


@dataclass
class FixpointResult:
    """Everything a caller (or a resumed run) needs about one fixpoint."""

    premises: pl.DataFrame
    full: pl.DataFrame                      # premises ∪ all derivations
    deltas: List[pl.DataFrame] = field(default_factory=list)  # per round
    lineage: List[pl.DataFrame] = field(default_factory=list)  # per round, (quad, lkey)
    metrics: List[Dict[str, Any]] = field(default_factory=list)
    goals_reached: bool = True

    @property
    def iterations(self) -> int:
        return len(self.deltas)

    def derived(self) -> pl.DataFrame:
        """All newly derived facts (premises excluded) with an
        ``iteration`` column; deterministic order (iteration, s, p, o, g).

        Mirrors ``infer``'s output contract: duplicate-free, premises
        excluded (``src/infer.rs:79-98``); first-derivation *round* is
        exposed instead of the reference's incidental insertion order.
        """
        fact_dtype = self.premises.schema["s"] if "s" in self.premises.schema else pl.Utf8
        frames = []
        # Round 0 reproduces the reference's exact output contract
        # (src/infer.rs:32-50,79-81): claims[initial_len:] where round 0
        # inserts sorted(premises ∪ unconditional_heads) — so when an
        # unconditional head sorts before a premise, the head is dropped
        # and the premise IS emitted.  Term-id tuple order == term tuple
        # order (ids are sort ranks), so a plain lexicographic sort
        # matches.  Without unconditional heads this is simply "premises
        # excluded".
        if self.deltas and self.deltas[0].height:
            round0 = (
                pl.concat([self.premises, self.deltas[0].select(FACT_COLS)])
                .sort(FACT_COLS)
                .slice(self.premises.height)
            )
            if round0.height:
                frames.append(
                    round0.with_columns(pl.lit(0, dtype=pl.Int32).alias("iteration"))
                )
        for it, d in enumerate(self.deltas[1:], start=1):
            if d.height:
                frames.append(
                    d.select(FACT_COLS).with_columns(pl.lit(it, dtype=pl.Int32).alias("iteration"))
                )
        if not frames:
            return pl.DataFrame(
                schema={**{c: fact_dtype for c in FACT_COLS}, "iteration": pl.Int32}
            )
        # later rounds were anti-joined against the full store (which
        # contains the premises) every iteration, so no further exclusion
        # is needed
        return pl.concat(frames).sort(["iteration", *FACT_COLS])

    def arguments(self) -> Dict[Tuple[str, str, str, str], Tuple[int, Tuple[str, ...]]]:
        """First-derivation-wins lineage map quad -> (rule_index, inst)
        (reference ``arguments``, ``src/prove.rs:142-147``)."""
        args: Dict[Tuple[str, str, str, str], Tuple[int, Tuple[str, ...]]] = {}
        for frame in self.lineage:
            if not frame.height:
                continue
            for s, p, o, g, lkey in frame.select([*FACT_COLS, "lkey"]).iter_rows():
                q = (s, p, o, g)
                if q not in args:
                    args[q] = decode_lkey(lkey)
        return args


def _fire_unconditional(
    plans: Sequence[RulePlan], with_lineage: bool, fact_dtype=pl.Utf8
) -> pl.DataFrame:
    """Rules with empty bodies fire exactly once up front
    (``src/infer.rs:36-50``); their heads are fully constant by the
    range-restriction invariant."""
    rows: List[Tuple] = []
    for plan in plans:
        if plan.body:
            continue
        for atom in plan.head:
            quad = tuple(v for _, v in atom.slots)  # all const
            if with_lineage:
                rows.append((*quad, f"{plan.index:06d}"))
            else:
                rows.append(quad)
    schema = {c: fact_dtype for c in FACT_COLS}
    if with_lineage:
        schema["lkey"] = pl.Utf8
    cols = list(schema)
    if not rows:
        return pl.DataFrame(schema=schema)
    return pl.DataFrame(
        {c: [r[j] for r in rows] for j, c in enumerate(cols)}, schema=schema
    )


class Fixpoint:
    """Driver for the distributed fixpoint; holds compiled plans and
    execution knobs, runs rounds until no new facts (or goals reached).
    """

    def __init__(
        self,
        rules: Sequence[Rule],
        *,
        mode: str = "auto",  # auto | broadcast | shuffle
        broadcast_threshold: int = DEFAULT_BROADCAST_THRESHOLD,
        num_partitions: int = 32,
        checkpoint_dir: Optional[str] = None,
        max_iterations: int = 10_000,
        salt_factor: int = 1,
    ):
        self.rules = list(rules)
        self.plans = compile_rules(self.rules)
        self.mode = mode
        self.broadcast_threshold = broadcast_threshold
        self.num_partitions = num_partitions
        self.checkpoint_dir = checkpoint_dir
        self.max_iterations = max_iterations
        # >1 activates salted joins on the shuffle path (skew mitigation
        # for hot predicates/nodes — SURVEY.md §7.3)
        self.salt_factor = salt_factor

    # -- evaluator selection ------------------------------------------------

    def _run_round(
        self,
        delta: pl.DataFrame,
        full_old: pl.DataFrame,
        full_new: pl.DataFrame,
        with_lineage: bool,
    ) -> Tuple[pl.DataFrame, str]:
        use_shuffle = self.mode == "shuffle" or (
            self.mode == "auto" and full_new.height > self.broadcast_threshold
        )
        if use_shuffle:
            from .eval_shuffle import run_iteration_ds

            new = run_iteration_ds(
                delta, full_new, self.plans, with_lineage, self.num_partitions,
                full_old=full_old, salt_factor=self.salt_factor,
            )
            return new, "shuffle"
        return (
            run_iteration(delta, full_new, self.plans, with_lineage, full_old=full_old),
            "broadcast",
        )

    # -- checkpointing ------------------------------------------------------

    def _checkpoint(self, it: int, delta: pl.DataFrame, lineage: Optional[pl.DataFrame], metrics: Dict) -> None:
        if not self.checkpoint_dir:
            return
        d = os.path.join(self.checkpoint_dir, f"iter={it:05d}")
        os.makedirs(d, exist_ok=True)
        delta.write_parquet(os.path.join(d, "delta.parquet"))
        if lineage is not None:
            lineage.write_parquet(os.path.join(d, "lineage.parquet"))
        with open(os.path.join(d, "manifest.json"), "w") as f:
            json.dump(metrics, f)
        with open(os.path.join(d, "_SUCCESS"), "w") as f:
            f.write("")

    def load_checkpoint(self) -> Optional[Tuple[int, List[pl.DataFrame], List[pl.DataFrame]]]:
        """Read back every complete iteration (has ``_SUCCESS``); returns
        (last_iter, deltas, lineages) or None when nothing checkpointed."""
        if not self.checkpoint_dir or not os.path.isdir(self.checkpoint_dir):
            return None
        deltas, lineages = [], []
        it = 0
        while True:
            d = os.path.join(self.checkpoint_dir, f"iter={it:05d}")
            if not os.path.exists(os.path.join(d, "_SUCCESS")):
                break
            deltas.append(pl.read_parquet(os.path.join(d, "delta.parquet")))
            lp = os.path.join(d, "lineage.parquet")
            lineages.append(pl.read_parquet(lp) if os.path.exists(lp) else pl.DataFrame())
            it += 1
        if not deltas:
            return None
        return it - 1, deltas, lineages

    # -- the loop -----------------------------------------------------------

    def run(
        self,
        premises: pl.DataFrame,
        *,
        with_lineage: bool = False,
        goals: Optional[pl.DataFrame] = None,
        resume: bool = False,
    ) -> FixpointResult:
        premises = premises.unique(subset=FACT_COLS)
        res = FixpointResult(premises=premises, full=premises)

        start_iter = 0
        full_old = premises.clear()
        if resume:
            ck = self.load_checkpoint()
            if ck is not None:
                last_it, deltas, lineages = ck
                full = premises
                for d in deltas:
                    res.deltas.append(d.select(FACT_COLS))
                    full_old = full
                    full = pl.concat([full, d.select(FACT_COLS)]).unique(subset=FACT_COLS)
                res.lineage = [
                    lf if lf.height else pl.DataFrame(schema={c: pl.Utf8 for c in [*FACT_COLS, "lkey"]})
                    for lf in lineages
                ]
                res.full = full
                start_iter = last_it + 1

        fact_dtype = premises.schema["s"] if premises.width else pl.Utf8
        if start_iter == 0:
            # iteration 0: unconditional heads + premises form the first delta
            uncond = _fire_unconditional(self.plans, with_lineage, fact_dtype)
            # several unconditional rules may assert the same head: dedup,
            # first-wins by rule order when tracing lineage
            if with_lineage:
                uncond = uncond.sort("lkey").unique(subset=FACT_COLS, keep="first")
            else:
                uncond = uncond.unique(subset=FACT_COLS)
            uncond_new = uncond.join(premises, on=FACT_COLS, how="anti")
            delta0 = pl.concat([premises, uncond_new.select(FACT_COLS)])
            res.full = pl.concat([premises, uncond_new.select(FACT_COLS)])
            res.deltas.append(uncond_new.select(FACT_COLS))  # derived part only
            if with_lineage:
                res.lineage.append(
                    uncond_new.select([*FACT_COLS, "lkey"])
                    if uncond_new.height
                    else pl.DataFrame(
                        schema={**{c: fact_dtype for c in FACT_COLS}, "lkey": pl.Utf8}
                    )
                )
            t0 = time.monotonic()
            m = {
                "iteration": 0,
                "new_facts": int(uncond_new.height),
                "full_size": int(res.full.height),
                "evaluator": "driver",
                "sec": 0.0,
            }
            res.metrics.append(m)
            self._checkpoint(0, uncond_new, res.lineage[-1] if with_lineage else None, m)
            delta = delta0  # premises + uncond heads seed round 1
            start_iter = 1
        else:
            if start_iter == 1:
                # resume landed right after iteration 0: the checkpointed
                # delta holds only the unconditional heads — a fresh run
                # seeds round 1 with premises ∪ uncond heads, so rebuild
                # that seed (premises never appear in checkpointed deltas)
                delta = pl.concat([premises, res.deltas[0].select(FACT_COLS)])
                full_old = premises.clear()
            else:
                delta = res.deltas[-1]

        for it in range(start_iter, self.max_iterations):
            if goals is not None and self._goals_met(goals, res.full):
                return res
            if delta.height == 0:
                break
            t0 = time.monotonic()
            new, evaluator = self._run_round(delta, full_old, res.full, with_lineage)
            elapsed = time.monotonic() - t0
            new_facts = new.select(FACT_COLS)
            res.deltas.append(new_facts)
            if with_lineage:
                res.lineage.append(new.select([*FACT_COLS, "lkey"]) if new.height else new)
            full_old = res.full
            res.full = pl.concat([res.full, new_facts])
            m = {
                "iteration": it,
                "new_facts": int(new.height),
                "full_size": int(res.full.height),
                "evaluator": evaluator,
                "sec": round(elapsed, 4),
            }
            res.metrics.append(m)
            self._checkpoint(it, new_facts, new if with_lineage else None, m)
            delta = new_facts
            if new.height == 0:
                break

        if goals is not None:
            res.goals_reached = self._goals_met(goals, res.full)
        return res

    @staticmethod
    def _goals_met(goals: pl.DataFrame, full: pl.DataFrame) -> bool:
        return goals.join(full, on=FACT_COLS, how="anti").height == 0


# ---------------------------------------------------------------------------
# dictionary (Translator) encoding: terms -> dense int ids for the
# fixpoint hot loop.  Joins/dedup on Int64 are several times faster and
# far smaller than on IRI strings; the reference lowers terms for the
# same reason (``Translator``, src/translator.rs:13-40; ids are
# sort-ranks of the term universe, reproduced here).
# ---------------------------------------------------------------------------


def _build_terms_df(df: pl.DataFrame, rules: Sequence[Rule]) -> pl.DataFrame:
    consts = sorted({e.value for r in rules for e in _iter_rule_entities(r) if e.is_bound()})
    parts = [df[c].unique().rename("term") for c in FACT_COLS]
    parts.append(pl.Series("term", consts, dtype=pl.Utf8))
    terms = pl.concat(parts).unique().sort()
    return pl.DataFrame({"term": terms}).with_row_index("tid").select(
        pl.col("term"), pl.col("tid").cast(pl.Int64)
    )


def _iter_rule_entities(rule: Rule):
    for atom in rule.if_all:
        yield from atom
    for atom in rule.then:
        yield from atom


def _encode_quads_df(df: pl.DataFrame, terms: pl.DataFrame) -> pl.DataFrame:
    out = df
    for c in FACT_COLS:
        out = (
            out.join(terms, left_on=c, right_on="term", how="left")
            .drop(c)
            .rename({"tid": c})
        )
    return out.select(FACT_COLS)


def _decode_quads_df(df: pl.DataFrame, terms: pl.DataFrame, extra: Sequence[str] = ()) -> pl.DataFrame:
    out = df
    for c in FACT_COLS:
        out = (
            out.join(terms, left_on=c, right_on="tid", how="left")
            .drop(c)
            .rename({"term": c})
        )
    return out.select([*FACT_COLS, *extra])


def _encode_rules_ids(rules: Sequence[Rule], terms: pl.DataFrame) -> List[Rule]:
    from .model import B, U

    consts = {e.value for r in rules for e in _iter_rule_entities(r) if e.is_bound()}
    sub = terms.filter(pl.col("term").is_in(list(consts)))
    mapping = dict(zip(sub["term"].to_list(), sub["tid"].to_list()))

    def enc_atom(atom):
        return tuple(
            U(e.value) if e.is_unbound() else B(mapping[e.value]) for e in atom
        )

    return [
        Rule(tuple(enc_atom(a) for a in r.if_all), tuple(enc_atom(a) for a in r.then))
        for r in rules
    ]


# ---------------------------------------------------------------------------
# hash-based global dictionary for the STORE path.  The broadcast path's
# Translator assigns sort-rank ids (needs the whole term universe in one
# place); at store scale that global sort is itself a shuffle, so the
# store path instead uses ``tid = hash64(term)`` (polars ahash, fixed
# seed — deterministic across processes for a fixed polars version).
# Encoding is then a PURE MAP (no exchange anywhere); decoding joins the
# persisted ``(term, tid)`` table.  Collisions are checked once at
# dictionary build (64-bit: ~1e-8 even at 1e5 terms, ~1e-4 at 1e7).
# ---------------------------------------------------------------------------


def hash_term_ids(terms: Sequence[str]) -> List[int]:
    """Driver-side term→tid, same kernel as the distributed encoder."""
    s = pl.Series("t", list(terms), dtype=pl.Utf8)
    return s.hash(seed=0).reinterpret(signed=True).to_list()


def _hash_encode_quads_fn(cols: Sequence[str] = tuple(FACT_COLS)):
    """map_batches fn: replace every term column with its 64-bit hash id
    (Int64) — vectorized, shuffle-free encode."""
    cols = list(cols)

    def fn(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        df = df.with_columns(
            [pl.col(c).hash(seed=0).reinterpret(signed=True).alias(c) for c in cols]
        )
        return df.to_arrow()

    return fn


def _encode_rules_hash(rules: Sequence[Rule]) -> List[Rule]:
    """Rules with every bound constant replaced by its hash id."""
    from .model import B, U

    consts = sorted({e.value for r in rules for e in _iter_rule_entities(r) if e.is_bound()})
    mapping = dict(zip(consts, hash_term_ids(consts)))

    def enc_atom(atom):
        return tuple(
            U(e.value) if e.is_unbound() else B(mapping[e.value]) for e in atom
        )

    return [
        Rule(tuple(enc_atom(a) for a in r.if_all), tuple(enc_atom(a) for a in r.then))
        for r in rules
    ]


def _build_store_terms(
    premises_ds, rule_consts: Sequence[str], terms_dir: str
) -> Dict[str, Any]:
    """Distributed distinct over every term occurring in the premises (∪
    rule constants), hashed to ids and persisted as the store's
    ``(term, tid)`` parquet.  Returns provenance meta for the store
    manifest (term count, collision-check mode, polars hash pin); raises
    on a hash collision (two terms → one tid), which would corrupt the
    encoding.  The check ALWAYS runs: driver-side (concat of tid chunks)
    up to a bound, a distributed distinct-count above it."""
    import shutil

    import ray.data

    from .util import distinct, polars_to_arrow_string

    def to_terms(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        parts = [
            (batch[c].combine_chunks() if isinstance(batch[c], pa.ChunkedArray) else batch[c])
            for c in FACT_COLS
        ]
        merged = pa.concat_arrays([pc.cast(p, pa.string()) for p in parts])
        return pa.table({"term": pc.unique(merged)})

    terms_ds = premises_ds.map_batches(
        to_terms, batch_format="pyarrow", zero_copy_batch=True
    )
    if rule_consts:
        terms_ds = terms_ds.union(
            ray.data.from_arrow(pa.table({"term": pa.array(sorted(rule_consts), pa.string())}))
        )
    terms_ds = distinct(terms_ds, ["term"])
    if terms_ds is None:
        n_terms = 0
        tagged = ray.data.from_arrow(
            pa.table({"term": pa.array([], pa.string()), "tid": pa.array([], pa.int64())})
        )
    else:

        def tag(batch: pa.Table) -> pa.Table:
            df = pl.from_arrow(batch)
            df = df.with_columns(
                pl.col("term").hash(seed=0).reinterpret(signed=True).alias("tid")
            )
            return polars_to_arrow_string(df)

        tagged = terms_ds.map_batches(
            tag, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        n_terms = tagged.count()
    shutil.rmtree(terms_dir, ignore_errors=True)  # stale crashed attempt
    tagged.write_parquet(terms_dir)
    # collision check: |distinct tid| must equal |terms|.  Driver-side
    # (one count_distinct over streamed tid chunks, O(n) driver memory of
    # Int64s) up to a bound; above it a distributed distinct-count — the
    # check never silently skips (a 64-bit collision at web scale would
    # silently merge two IRIs and corrupt every downstream join).
    check_mode = "none"
    if 0 < n_terms <= 20_000_000:
        import pyarrow.compute as pc

        chunks = [
            b["tid"]
            for b in tagged.select_columns(["tid"]).iter_batches(
                batch_size=None, batch_format="pyarrow"
            )
            if b.num_rows
        ]
        n_distinct = pc.count_distinct(
            pa.concat_arrays([c.combine_chunks() for c in chunks])
        ).as_py()
        check_mode = "driver"
    elif n_terms > 0:
        tid_schema = pa.schema([("tid", pa.int64())])
        distinct_tids = distinct(
            tagged.select_columns(["tid"]), ["tid"], schema=tid_schema
        )
        n_distinct = distinct_tids.count() if distinct_tids is not None else 0
        check_mode = "distributed"
    else:
        n_distinct = 0
    if n_distinct != n_terms:
        raise RuntimeError(
            f"term-id hash collision in dictionary build ({n_terms} terms, "
            f"{n_distinct} distinct ids); rerun with dict_encode=False"
        )
    return {
        "n_terms": int(n_terms),
        "collision_check": check_mode,
        "polars_version": pl.__version__,
        "probe_hash": hash_term_ids([_state_store._HASH_PROBE])[0],
    }


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def infer(
    premises: QuadsLike,
    rules: Sequence[Rule],
    *,
    mode: str = "auto",
    broadcast_threshold: int = DEFAULT_BROADCAST_THRESHOLD,
    num_partitions: int = 32,
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
    as_dataset: bool = False,
    dict_encode: bool = True,
):
    """Forward-chaining fixpoint; returns only the newly derived facts,
    duplicate-free, premises excluded (``src/infer.rs:9-26``).

    Input may be a list of 4-tuples (returns a list of 4-tuples, like the
    reference), or a polars/arrow/ray Dataset of quads (returns a polars
    frame, or a ``ray.data.Dataset`` when ``as_dataset=True``).

    ``dict_encode=True`` (default) runs the fixpoint over dense int term
    ids (rify's Translator lowering) — the hot joins then move Int64
    columns instead of strings.
    """
    df, encoded = _to_polars(premises)
    eng_rules = [_encode_rule(r) for r in rules] if encoded else list(rules)
    terms = None
    if dict_encode:
        terms = _build_terms_df(df, eng_rules)
        df = _encode_quads_df(df, terms)
        eng_rules = _encode_rules_ids(eng_rules, terms)
    fp = Fixpoint(
        eng_rules,
        mode=mode,
        broadcast_threshold=broadcast_threshold,
        num_partitions=num_partitions,
        checkpoint_dir=checkpoint_dir,
    )
    res = fp.run(df, resume=resume)
    out = res.derived()
    if terms is not None:
        out = _decode_quads_df(out, terms, extra=["iteration"])
    if isinstance(premises, (list, tuple)):
        rows = [tuple(r) for r in out.select(FACT_COLS).iter_rows()]
        if encoded:
            rows = [tuple(decode_term(t) for t in f) for f in rows]
        return rows
    if as_dataset:
        import ray.data

        return ray.data.from_arrow(out.to_arrow())
    return out


_FILTER_OPS = ("==", "!=", "<", "<=", ">", ">=")


def _check_binding_filters(filters, var_names: Sequence[str]) -> None:
    """Validate SPARQL-FILTER-lite clauses ``(lhs_var, op, rhs)``: the
    lhs must be a pattern variable; the rhs may be given explicitly as
    ``U(name)`` (another pattern variable) or ``B(value)`` (a constant
    term) — or as a bare value, in which case a string that names a
    pattern variable is treated as that variable (a bare-string
    collision with a variable name warns; use ``B(...)`` to force the
    literal).  Non-string constants are JSON-encoded like rule
    constants, so equality semantics match the engine's term model.
    Ordering comparisons are lexicographic on the term text — the SQL
    twin is plain string comparison."""
    import warnings

    names = set(var_names)
    for clause in filters:
        if len(clause) != 3:
            raise ValueError(f"filter clause must be (var, op, term): {clause!r}")
        lhs, op, rhs = clause
        if op not in _FILTER_OPS:
            raise ValueError(f"unsupported filter op {op!r} (use one of {_FILTER_OPS})")
        if lhs not in names:
            raise ValueError(f"filter lhs {lhs!r} is not a pattern variable {sorted(names)}")
        if isinstance(rhs, Entity):
            if rhs.is_unbound() and rhs.value not in names:
                raise ValueError(
                    f"filter rhs variable {rhs.value!r} is not a pattern "
                    f"variable {sorted(names)}"
                )
        elif isinstance(rhs, str) and rhs in names:
            warnings.warn(
                f"filter rhs {rhs!r} names a pattern variable and is "
                f"interpreted as a variable reference; wrap it in B({rhs!r}) "
                f"to compare against the literal string, or U({rhs!r}) to "
                f"silence this warning",
                UserWarning,
                stacklevel=3,
            )


def _binding_filter_exprs(filters, var_names: Sequence[str]):
    """Compile validated filter clauses to polars boolean expressions
    (ANDed by the caller)."""
    import operator as _op

    ops = {
        "==": _op.eq,
        "!=": _op.ne,
        "<": _op.lt,
        "<=": _op.le,
        ">": _op.gt,
        ">=": _op.ge,
    }
    names = set(var_names)
    exprs = []
    for lhs, op, rhs in filters:
        left = pl.col(lhs)
        if isinstance(rhs, Entity):
            # explicit marker: U(name) = variable reference, B(v) = literal
            right = pl.col(rhs.value) if rhs.is_unbound() else pl.lit(encode_term(rhs.value))
        elif isinstance(rhs, str) and rhs in names:
            right = pl.col(rhs)
        else:
            right = pl.lit(encode_term(rhs))
        exprs.append(ops[op](left, right))
    return exprs


def _check_select(select, var_names: Sequence[str]) -> List[str]:
    sel = [str(v) for v in select]
    bad = [v for v in sel if v not in set(var_names)]
    if bad:
        raise ValueError(f"select names {bad} are not pattern variables {list(var_names)}")
    if len(set(sel)) != len(sel):
        raise ValueError(f"duplicate select names: {sel}")
    return sel


def query(
    premises: QuadsLike,
    pattern: Sequence,
    *,
    dict_encode: bool = True,
    filters: Optional[Sequence] = None,
    select: Optional[Sequence[str]] = None,
    distinct: bool = False,
):
    """Answer a conjunctive (basic-graph) pattern against a fact set:
    all satisfying variable assignments, one column per variable.

    This is the reference's conjunctive-body enumeration —
    ``Reasoner::apply`` (``/root/reference/src/reasoner.rs:161-197``)
    with its greedy fewest-matches-first atom ordering
    (``pop_strictest_requirement``, ``src/reasoner.rs:235-243``) —
    exposed as a one-shot public operation instead of only inside the
    fixpoint loop.  No inference happens: run :func:`infer` /
    :func:`infer_store` first and query the closure (for a
    store-resident closure use :func:`query_store`, the scale path).

    ``pattern`` is a list of 4-slot atoms exactly like a rule body
    (``U`` variables / ``B`` constants; a variable repeated within one
    atom is an intra-atom equality constraint).  Returns a polars frame
    whose columns are the variable names in first-appearance order
    (``src/rule.rs:170-177``); rows are the distinct assignments (the
    fact set is deduped first, and projecting ALL pattern variables
    keeps join outputs duplicate-free by construction).  List-of-tuples
    input returns a list of ``{var: term}`` dicts (terms decoded like
    :func:`infer`).  A pattern with no variables returns a one-row
    ``matched`` boolean.

    SPARQL-style post-join modifiers: ``filters`` is a sequence of
    ``(var, op, var_or_term)`` clauses (ops ``== != < <= > >=``,
    ANDed; ordering is lexicographic on the term text — the SQL twin
    is plain string comparison); ``select`` projects a subset of
    variables (SPARQL SELECT keeps duplicate rows, so pair it with
    ``distinct=True`` for set semantics).  Like :func:`infer`, this is the
    driver-resident API — the binding enumeration runs as one fused
    lazy polars query over the collected fact set."""
    from .eval_broadcast import eval_chain
    from .plan import compile_rule, vcol

    rule = Rule.create(pattern, ())  # validates atom shapes
    if not rule.if_all:
        raise ValueError("pattern must contain at least one atom")
    df, encoded = _to_polars(premises)
    df = df.unique(subset=FACT_COLS)
    if encoded:
        rule = _encode_rule(rule)
    terms = None
    if dict_encode:
        terms = _build_terms_df(df, [rule])
        df = _encode_quads_df(df, terms)
        rule = _encode_rules_ids([rule], terms)[0]
    plan = compile_rule(0, rule)
    var_names = [str(v) for v in plan.cano_vars]
    if filters:
        _check_binding_filters(filters, var_names)
    if select is not None:
        select = _check_select(select, var_names)
    vcols = [vcol(i) for i in range(len(var_names))]
    lz = eval_chain(df, df, df, plan, plan.chains[0])
    if not var_names:
        matched = lz is not None and lz.collect(engine="streaming").height > 0
        return pl.DataFrame({"matched": [matched]})
    if lz is None:
        bdf = pl.DataFrame(schema={c: df.schema["s"] for c in vcols})
    else:
        bdf = lz.collect(engine="streaming").select(vcols)
    if terms is not None:
        for c in vcols:
            bdf = (
                bdf.join(terms, left_on=c, right_on="tid", how="left")
                .drop(c)
                .rename({"term": c})
            )
        bdf = bdf.select(vcols)
    bdf = bdf.rename(dict(zip(vcols, var_names)))
    if filters:
        bdf = bdf.filter(_binding_filter_exprs(filters, var_names))
    if select is not None:
        bdf = bdf.select(select)
    if distinct:
        bdf = bdf.unique(maintain_order=True)
    if isinstance(premises, (list, tuple)):
        rows = [
            {v: (decode_term(t) if encoded else t) for v, t in zip(bdf.columns, r)}
            for r in bdf.iter_rows()
        ]
        return rows
    return bdf


def query_store(
    store,
    pattern: Sequence,
    *,
    num_partitions: int = 32,
    broadcast_terms_rows: int = 20_000_000,
    first_gen: int = 0,
    derived_only: bool = False,
    decode: bool = True,
    filters: Optional[Sequence] = None,
    select: Optional[Sequence[str]] = None,
    distinct: bool = False,
):
    """Conjunctive pattern query over a materialized
    :class:`rify_ray.state.TripleStore` — the scale path of
    :func:`query`: each atom matches as a streaming filtered projection
    of the store's parquet generations, the chain is a sequence of
    hash-shuffle joins, and only the BINDINGS flow between steps (the
    fact set never lands on the driver).  Atoms repeated across the
    pattern reuse one match scan (same memoization as the fixpoint's
    chains).  Returns a Dataset with one column per pattern variable
    (first-appearance order); ``decode=True`` (default) joins term ids
    back to strings via the store dictionary (broadcast gather below
    ``broadcast_terms_rows``, distributed hash joins above —
    :meth:`TripleStore.decode_columns`).  ``store`` may be a
    :class:`TripleStore` or its path.

    ``filters`` / ``select`` / ``distinct`` mirror :func:`query`:
    filters run as a vectorized polars predicate map over the DECODED
    bindings stream (so the semantics are on terms, not hash ids —
    they require ``decode=True`` on a hash-encoded store); ``select``
    projects; ``distinct`` dedupes via one ``groupby`` exchange over
    the (already projected) binding columns."""
    import ray.data

    from .eval_shuffle import _drop_empty_blocks, _match_batch_fn, shuffle_join
    from .plan import compile_rule, vcol
    from .state.store import TripleStore

    if isinstance(store, str):
        store = TripleStore(store)
    rule = Rule.create(pattern, ())
    if not rule.if_all:
        raise ValueError("pattern must contain at least one atom")
    rule = _encode_rule(rule)  # JSON-encode non-string constants
    if store.value_type == "int64":
        store.check_hash_pin()
        rule = _encode_rules_hash([rule])[0]
    plan = compile_rule(0, rule)
    chain = plan.chains[0]
    var_names = [str(v) for v in plan.cano_vars]
    if filters:
        _check_binding_filters(filters, var_names)
        if store.value_type == "int64" and not decode:
            raise ValueError("filters compare decoded terms: pass decode=True")
    if select is not None:
        select = _check_select(select, var_names)
    vcols = [vcol(i) for i in range(len(var_names))]
    facts_ds = store.dataset(first_gen=first_gen, derived_only=derived_only)

    match_cache: Dict[Any, Any] = {}
    bindings = None
    bound_cols: List[str] = []
    satisfied = True
    for atom_i in chain.order:
        atom = plan.body[atom_i]
        key = atom.slots
        if key in match_cache:
            m = match_cache[key]
        else:
            m = facts_ds.map_batches(
                _match_batch_fn(atom), batch_format="pyarrow", zero_copy_batch=True
            ).materialize()
            m = _drop_empty_blocks(m)
            match_cache[key] = m
        if m is None:
            satisfied = False
            break
        if not atom.var_indices:
            continue  # all-constant presence probe passed (rows > 0)
        m_cols = [vcol(i) for i in atom.var_indices]
        if bindings is None:
            bindings, bound_cols = m, m_cols
            continue
        shared = [c for c in m_cols if c in bound_cols]
        bindings = shuffle_join(
            bindings, m, shared, num_partitions, 1, probe_salt_cols=bound_cols
        )
        if bindings is None:
            satisfied = False
            break
        bound_cols = bound_cols + [c for c in m_cols if c not in bound_cols]
    if not var_names:
        return ray.data.from_arrow(pa.table({"matched": pa.array([satisfied])}))
    out_type = pa.string() if (decode and store.value_type == "int64") else (
        pa.int64() if store.value_type == "int64" else pa.string()
    )
    if not satisfied or bindings is None:
        empty_names = select if select is not None else var_names
        return ray.data.from_arrow(
            pa.schema([(nm, out_type) for nm in empty_names]).empty_table()
        )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({nm: batch[vc] for nm, vc in zip(var_names, vcols)})

    out = bindings.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    if decode and store.value_type == "int64":
        out = store.decode_columns(
            out, var_names, broadcast_terms_rows=broadcast_terms_rows
        )
    return _binding_modifiers_ds(
        out, var_names, filters, select, distinct, num_partitions
    )


def _binding_modifiers_ds(out, var_names, filters, select, distinct, num_partitions):
    """Apply the SPARQL-lite post-join modifiers to a bindings Dataset:
    filters as a vectorized polars predicate map (no exchange), select
    as a projection map, distinct as ONE ``groupby`` exchange over the
    projected columns (the only modifier that must shuffle)."""
    from .util import polars_to_arrow_string

    if filters:
        spec = [tuple(c) for c in filters]
        names = list(var_names)

        def filt(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            df = pl.from_arrow(batch).filter(_binding_filter_exprs(spec, names))
            return polars_to_arrow_string(df).cast(batch.schema)

        out = out.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
    if select is not None:
        sel = list(select)

        def proj(batch: pa.Table) -> pa.Table:
            return batch.select(sel) if batch.num_columns else batch

        out = out.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)
    if distinct:
        cols = list(select) if select is not None else list(var_names)
        out = out.groupby(cols).count()

        def drop_cnt(batch: pa.Table) -> pa.Table:
            if "count()" in batch.column_names:
                return batch.drop_columns(["count()"]).select(cols)
            return batch

        out = out.map_batches(drop_cnt, batch_format="pyarrow", zero_copy_batch=True)
    return out


def infer_store(
    premises_ds,
    rules: Sequence[Rule],
    store_path: str,
    *,
    num_partitions: int = 32,
    salt_factor: int = 1,
    max_iterations: int = 10_000,
    resume: bool = True,
    with_lineage: bool = False,
    goals: Optional[pa.Table] = None,
    broadcast_rows: int = 500_000,
    premises_precleaned: bool = False,
    dict_encode: bool = True,
    compact_every: Optional[int] = 64,
):
    """Fully Dataset/parquet-resident fixpoint — the 100 TB path.

    The full fact store NEVER lands on the driver: it lives in a
    :class:`rify_ray.state.TripleStore` (hash-partitioned parquet
    generations) and each round's delta is committed as a new store
    generation (atomic manifest commit → crash-resumable: rerunning
    continues from the last committed generation).

    Per round the evaluator adapts (:mod:`rify_ray.eval_hybrid`): while
    the round's WORKING SET (delta + join bindings) stays at or below
    ``broadcast_rows``, joins run as driver polars / broadcast-map hash
    joins and insert-if-absent is a single probe scan of the store — no
    shuffle-actor spin-up; any step that exceeds the bound degrades to
    the full ``Dataset.join`` hash-shuffle path
    (:func:`rify_ray.eval_shuffle.run_iteration_core`) with skew
    salting.  The store-side per-atom matches are maintained
    incrementally either way (only each delta is ever re-matched).

    Generation 0 holds the (deduped) premises + unconditional-rule heads;
    generations 1..k are the per-round deltas, so
    ``store.dataset(first_gen=1)`` is exactly the derived set.

    ``with_lineage`` persists per-generation lineage parquet under
    ``<store_path>/lineage/gen=K/`` — one (quad, lkey) row per first
    derivation (``src/prove.rs:142-147``'s arguments map, partitioned).
    ``goals`` (a 4-column arrow table) activates prove-style early exit:
    goal hits are tracked per round against each (small) delta, so no
    extra full-store exchange runs per round.

    ``dict_encode`` (default) lowers terms to 64-bit hash ids before
    generation 0 — a pure map, no exchange (vs the broadcast path's
    sort-rank Translator) — so every round's joins, probe scans and
    parquet generations move Int64 columns instead of IRI strings; the
    ``(term, tid)`` table persists under ``<store_path>/terms/`` and
    :meth:`TripleStore.decoded_dataset` restores strings on read.

    ``compact_every`` bounds the store's file count on long fixpoints:
    once the store holds that many DERIVED generations, they are
    compacted into one (:meth:`TripleStore.compact` with ``first_gen=1``
    — the premise generation and the derived/premise boundary survive).
    Resume across a compaction is exact: the merged generation keeps its
    last ``round`` and a resumed run seeds its delta with the merged
    derived set — a superset of the true delta, so semi-naive
    re-derivations are anti-joined away (extra work once, never wrong).
    ``None`` disables compaction.

    Returns the store; with ``goals``, returns (store, goals_reached).
    """
    import shutil

    import ray.data

    from .eval_hybrid import anti_probe, run_iteration_hybrid
    from .eval_shuffle import (
        IncrementalMatches,
        collect_to_polars,
        run_iteration_core,
    )
    from .state import TripleStore
    from .util import polars_to_arrow_string

    value_type = "int64" if dict_encode else "string"
    store = TripleStore(store_path, num_partitions=num_partitions, value_type=value_type)
    if store.generations and not resume:
        raise ValueError(f"store at {store_path} is non-empty and resume=False")
    if store.generations and store.value_type != value_type:
        raise ValueError(
            f"store at {store_path} is {store.value_type}-typed; "
            f"pass dict_encode={store.value_type == 'int64'} to resume it"
        )
    if store.generations:
        # resuming a dict-encoded store under a polars whose hash(seed=0)
        # differs would re-encode rules/goals into ids that match nothing
        store.check_hash_pin()
    rules = list(rules)
    eng_rules = _encode_rules_hash(rules) if dict_encode else rules
    plans = compile_rules(eng_rules)
    fact_dtype = pl.Int64 if dict_encode else pl.Utf8
    fact_pa = pa.int64() if dict_encode else pa.string()
    pin_schema = pa.schema([(c, fact_pa) for c in FACT_COLS])
    if with_lineage:
        pin_schema = pin_schema.append(pa.field("lkey", pa.string()))
    if isinstance(premises_ds, pa.Table):
        premises_ds = ray.data.from_arrow(premises_ds)
    lineage_dir = os.path.join(store_path, "lineage")
    # set by the driver gen-0 fast path: the committed generation-0 frame,
    # kept in hand so the round loop needs no parquet read-back
    fresh_small_gen0: Optional[pl.DataFrame] = None

    def _write_lineage_small(df: pl.DataFrame) -> None:
        gen = store.next_gen  # matches the fact generation add_small commits next
        d = os.path.join(lineage_dir, f"gen={gen:05d}")
        shutil.rmtree(d, ignore_errors=True)  # stale crashed attempt
        os.makedirs(d, exist_ok=True)
        df.select([*FACT_COLS, "lkey"]).write_parquet(os.path.join(d, "lineage.parquet"))

    if not store.generations:
        # consume the (possibly expensive, lazy) input pipeline ONCE:
        # the dictionary build and generation 0 both read these blocks
        premises_ds = premises_ds.select_columns(FACT_COLS).materialize()
        uncond = _fire_unconditional(plans, with_lineage, fact_dtype)
        if with_lineage and uncond.height:
            uncond = uncond.sort("lkey").unique(subset=FACT_COLS, keep="first")
        if with_lineage:
            shutil.rmtree(os.path.join(lineage_dir, "gen=00000"), ignore_errors=True)
            os.makedirs(os.path.join(lineage_dir, "gen=00000"), exist_ok=True)
            uncond.write_parquet(
                os.path.join(lineage_dir, "gen=00000", "lineage.parquet")
            )
        if premises_ds.count() <= broadcast_rows:
            # driver gen-0 fast path: the premises fit the hybrid
            # broadcast regime, so the dictionary build, encode, dedup
            # and commit all run as driver polars — ZERO exchanges (the
            # distributed branch below pays two hash-shuffle spin-ups:
            # terms distinct + gen-0 distinct, ~7 s of fixed cost at any
            # input size).  Identical outputs: same hash kernel, same
            # manifest provenance.
            prem_df = collect_to_polars(premises_ds)
            if prem_df.width == 0:
                prem_df = pl.DataFrame(schema={c: pl.Utf8 for c in FACT_COLS})
            prem_df = prem_df.select(FACT_COLS)
            if dict_encode:
                from .util import polars_to_arrow_string

                rule_consts = {
                    e.value for r in rules for e in _iter_rule_entities(r) if e.is_bound()
                }
                terms = pl.concat(
                    [
                        prem_df.select(pl.col(c).cast(pl.Utf8).alias("term"))
                        for c in FACT_COLS
                    ]
                    + (
                        [pl.DataFrame({"term": sorted(rule_consts)})]
                        if rule_consts
                        else []
                    )
                ).unique()
                terms = terms.with_columns(
                    pl.col("term").hash(seed=0).reinterpret(signed=True).alias("tid")
                )
                if terms["tid"].n_unique() != terms.height:
                    raise RuntimeError(
                        "term-id hash collision in dictionary build; "
                        "rerun with dict_encode=False"
                    )
                import pyarrow.parquet as pq

                shutil.rmtree(store.terms_dir, ignore_errors=True)
                os.makedirs(store.terms_dir, exist_ok=True)
                pq.write_table(
                    polars_to_arrow_string(terms),
                    os.path.join(store.terms_dir, "terms.parquet"),
                )
                store.set_terms_meta(
                    {
                        "n_terms": int(terms.height),
                        "collision_check": "driver",
                        "polars_version": pl.__version__,
                        "probe_hash": hash_term_ids([_state_store._HASH_PROBE])[0],
                    }
                )
                prem_df = prem_df.with_columns(
                    [
                        pl.col(c).cast(pl.Utf8).hash(seed=0).reinterpret(signed=True).alias(c)
                        for c in FACT_COLS
                    ]
                )
            gen0_df = (
                pl.concat([prem_df, uncond.select(FACT_COLS)])
                if uncond.height
                else prem_df
            )
            if not (premises_precleaned and not uncond.height):
                gen0_df = gen0_df.unique(subset=FACT_COLS)
            fresh_small_gen0 = gen0_df.select(FACT_COLS)
            store.add_small(fresh_small_gen0, extra={"round": 0})
        else:
            if dict_encode:
                # one-time dictionary build (distinct exchange over the
                # input terms), then the shuffle-free hash encode
                rule_consts = {
                    e.value for r in rules for e in _iter_rule_entities(r) if e.is_bound()
                }
                store.set_terms_meta(
                    _build_store_terms(premises_ds, rule_consts, store.terms_dir)
                )
                premises_ds = premises_ds.map_batches(
                    _hash_encode_quads_fn(), batch_format="pyarrow", zero_copy_batch=True
                )
            # generation 0: premises + unconditional heads
            gen0 = premises_ds.select_columns(FACT_COLS)
            if uncond.height:
                gen0 = gen0.union(
                    ray.data.from_arrow(
                        uncond.select(FACT_COLS)
                        .to_arrow()
                        .cast(pa.schema([(c, fact_pa) for c in FACT_COLS]))
                    )
                )
            # ``premises_precleaned`` (caller guarantees duplicate-free
            # premises, e.g. the KG pipeline's canonicalize dedup) skips
            # the gen-0 distinct exchange; unconditional heads may overlap
            # the premises, so the fast path needs both
            store.add(gen0, precleaned=premises_precleaned and not uncond.height)

    # cache the store-backed sides across rounds: full_new(k) =
    # full_new(k-1) ∪ delta(k), so only the first round reads parquet.
    # Resume round numbering comes from the last generation's committed
    # ``round`` metric (list positions shift under compaction).
    last_meta = store.generations[-1].get("metrics", {})
    start_round = last_meta.get("round", len(store.generations) - 1) + 1
    last = len(store.generations) - 1

    # Lazily-built Dataset view of the full store for the driver-small
    # regime: while every round stays driver-resident nothing consumes
    # the Dataset side, so eagerly maintaining per-round ``from_arrow``
    # unions is pure ray.put overhead.  The callable (re)builds the view
    # from the committed generations only when a fallback path actually
    # needs it (probe scan, mixed tail, regime transition) — cached per
    # store version (``next_gen`` is monotonic, incl. across compaction).
    _full_cache: list = [None, -1]

    def _store_full_ds():
        if _full_cache[0] is None or _full_cache[1] != store.next_gen:
            _full_cache[0] = store.dataset().materialize()
            _full_cache[1] = store.next_gen
        return _full_cache[0]

    inc = IncrementalMatches(plans, broadcast_rows)
    small_delta: Optional[pl.DataFrame] = None
    resume_full_small: Optional[pl.DataFrame] = None
    if fresh_small_gen0 is not None:
        # fresh store whose generation 0 was committed by the driver fast
        # path: the frame is already in hand — skip the parquet read-back
        # and all Dataset bookkeeping until a round outgrows the regime
        ds_mode = False
        delta_ds = full_old = full_new = None
        small_delta = fresh_small_gen0
        inc.advance_small(small_delta)
    elif store.count() <= broadcast_rows:
        # driver fast-path RESUME (incl. incremental premise-adds): the
        # whole store fits the hybrid broadcast regime, so the pre-delta
        # store and the delta stream straight to driver polars — the
        # per-atom match seeding and the store copy run without a single
        # Dataset materialize or per-atom distributed scan
        ds_mode = False
        delta_ds = full_old = full_new = None
        empty_df = pl.DataFrame(schema={c: fact_dtype for c in FACT_COLS})
        pre_df = (
            collect_to_polars(store.dataset(last_gen=last - 1)) if last >= 1 else empty_df
        )
        if pre_df.width == 0:
            pre_df = empty_df
        small_delta = collect_to_polars(store.dataset(first_gen=last))
        if small_delta.width == 0:
            small_delta = empty_df
        pre_df = pre_df.select(FACT_COLS)
        small_delta = small_delta.select(FACT_COLS)
        if pre_df.height:
            inc.advance_small(pre_df)
        inc.advance_small(small_delta)
        resume_full_small = pl.concat([pre_df, small_delta])
    else:
        ds_mode = True
        delta_rows = store.generations[last]["rows"]
        delta_ds = store.dataset(first_gen=last).materialize()
        empty_ds = ray.data.from_arrow(store.quad_schema().empty_table())
        full_old = store.dataset(last_gen=last - 1).materialize() if last >= 1 else empty_ds
        full_new = full_old.union(delta_ds) if last >= 1 else delta_ds
        if last >= 1:
            # resume mid-fixpoint: seed the incremental matches with one
            # scan of the pre-delta store
            inc.advance(full_old)
        if delta_rows <= broadcast_rows:
            small_delta = collect_to_polars(delta_ds)
            if small_delta.width == 0:
                small_delta = pl.DataFrame(schema={c: fact_dtype for c in FACT_COLS})
            inc.advance_small(small_delta)
        else:
            inc.advance(delta_ds)

    # driver copy of the full store while it fits under broadcast_rows:
    # turns per-round insert-if-absent into a lazy polars anti-join fused
    # with the chain queries (dropped permanently once the store outgrows
    # the bound — then insert-if-absent probe-scans the parquet store)
    full_small: Optional[pl.DataFrame] = None
    if store.count() <= broadcast_rows:
        if resume_full_small is not None:
            full_small = resume_full_small
        elif last >= 1:
            full_small = collect_to_polars(full_new)
        elif small_delta is not None:
            full_small = small_delta
        if full_small is not None and full_small.width == 0:
            full_small = pl.DataFrame(schema={c: fact_dtype for c in FACT_COLS})

    # goal tracking: the remaining-goal frame shrinks as deltas land;
    # one initial probe scan of the store, then per-delta checks only
    remaining: Optional[pl.DataFrame] = None
    if goals is not None:
        remaining = pl.from_arrow(goals.select(FACT_COLS)).unique()
        if dict_encode:
            remaining = remaining.with_columns(
                [
                    pl.col(c).hash(seed=0).reinterpret(signed=True).alias(c)
                    for c in FACT_COLS
                ]
            )
        if remaining.height:
            if full_small is not None:
                remaining = remaining.join(full_small, on=FACT_COLS, how="anti")
            else:
                remaining = anti_probe(remaining, full_new if ds_mode else _store_full_ds())

    for it in range(start_round, max_iterations):
        if remaining is not None and remaining.height == 0:
            return (store, True)
        if small_delta is not None:
            new = run_iteration_hybrid(
                small_delta,
                plans,
                inc,
                full_new if ds_mode else _store_full_ds,
                full_small=full_small,
                with_lineage=with_lineage,
                broadcast_rows=broadcast_rows,
                num_partitions=num_partitions,
                salt_factor=salt_factor,
                pin_schema=pin_schema,
                fact_dtype=fact_dtype,
            )
        else:
            new = run_iteration_core(
                delta_ds,
                full_old,
                full_new,
                plans,
                with_lineage=with_lineage,
                num_partitions=num_partitions,
                salt_factor=salt_factor,
                pin_schema=pin_schema,
                match_cache=inc.cache(),
            )
        if new is None:
            break
        if isinstance(new, pl.DataFrame) and new.height > broadcast_rows:
            # a small-regime round whose OUTPUT outgrew the bound: commit
            # it distributed (chunked blocks, hash-partitioned parquet
            # write) and let the next round run the shuffle path — the
            # driver holds the frame only transiently
            tbl = polars_to_arrow_string(
                new.select([*FACT_COLS, "lkey"] if with_lineage else FACT_COLS)
            )
            chunk = 1_000_000
            new = ray.data.from_arrow(
                [tbl.slice(o, chunk) for o in range(0, tbl.num_rows, chunk)]
            ).materialize()
        if isinstance(new, pl.DataFrame):
            if new.height == 0:
                break
            if with_lineage:
                _write_lineage_small(new)
            # driver-side generation commit (no distributed write tasks
            # for a small delta)
            store.add_small(new.select(FACT_COLS), extra={"round": it, "evaluator": "hybrid-small"})
            if ds_mode:
                new_facts = ray.data.from_arrow(
                    polars_to_arrow_string(new.select(FACT_COLS))
                )
                full_old = full_new
                full_new = full_old.union(new_facts)
                delta_ds = new_facts
            if remaining is not None and remaining.height:
                remaining = remaining.join(new.select(FACT_COLS), on=FACT_COLS, how="anti")
            small_delta = new.select(FACT_COLS)
            if full_small is not None:
                if full_small.height + new.height <= broadcast_rows:
                    full_small = pl.concat([full_small, small_delta])
                else:
                    full_small = None
            if not ds_mode and full_small is None:
                # the store outgrew the driver copy: from here on the
                # probe scans consume the Dataset view every round, so
                # snapshot it once (post-commit) and maintain it by
                # union — re-resolving the deferred view per round would
                # re-read the whole store per commit
                full_new = _store_full_ds()
                full_old = full_new
                ds_mode = True
            inc.advance_small(small_delta)
        else:
            cnt = new.count()
            if cnt == 0:
                break
            if with_lineage:
                gen = store.next_gen
                gen_lineage_dir = os.path.join(lineage_dir, f"gen={gen:05d}")
                # Ray's write_parquet appends UUID-named files — clear any
                # partial output from a crashed attempt before rewriting
                shutil.rmtree(gen_lineage_dir, ignore_errors=True)
                new.write_parquet(gen_lineage_dir)
            # new already went through dedup + anti-join inside the round
            new_facts = new.select_columns(FACT_COLS).materialize()
            if not ds_mode:
                # transition out of the deferred regime: snapshot the
                # store view BEFORE this commit, then maintain unions
                full_new = _store_full_ds()
                ds_mode = True
            store.add(
                new_facts,
                precleaned=True,
                extra={"round": it, "evaluator": "shuffle" if small_delta is None else "hybrid-mixed"},
            )
            full_old = full_new
            full_new = full_old.union(new_facts)
            delta_ds = new_facts
            if remaining is not None and remaining.height:
                remaining = anti_probe(remaining, delta_ds)
            full_small = None  # store outgrew the bound with this delta
            if cnt <= broadcast_rows:
                small_delta = collect_to_polars(new_facts).select(FACT_COLS)
                inc.advance_small(small_delta)
            else:
                small_delta = None
                inc.advance(delta_ds)
        # bound on-disk file count for long fixpoints: fold every
        # maximal run of consecutive DERIVED generations into one.
        # Premise generations (position 0 and incremental premise-adds)
        # keep their positions, so the derived/premise boundary — and
        # ``dataset(derived_only=True)`` — survives, and derived runs
        # committed before a later premise-add still get folded.
        # Disk-only; in-memory delta/full datasets stream on.
        if compact_every:
            n_derived = sum(
                1
                for i, g in enumerate(store.generations)
                if i > 0 and g.get("metrics", {}).get("evaluator") != "premise-add"
            )
            if n_derived >= compact_every:
                store.compact_derived()
                if with_lineage:
                    # mirror the fact-store fold: lineage directories
                    # otherwise accumulate one per round forever, and
                    # retraction's dependence scans walk all of them
                    compact_lineage(lineage_dir, keep_last=1)
    if remaining is not None:
        return (store, remaining.height == 0)
    return store


def _extend_store_terms(store, cand_terms: "pl.DataFrame") -> int:
    """Append the NEW terms of an incremental premise batch to the
    store's persisted ``(term, tid)`` dictionary.

    Candidates are probed against the existing dictionary with ONE
    streaming scan (broadcast candidate sets, no shuffle; driver polars
    while the dictionary is small — a distributed scan of a 15 k-row
    dictionary costs a whole job spin-up): a hit on ``term`` means the
    term is already registered; a hit on ``tid`` under a DIFFERENT term
    is a 64-bit collision with the existing universe and raises (as
    does a collision inside the batch).  Fresh rows land as one
    atomically-renamed parquet file — the decode paths glob the
    directory, and a crashed attempt self-heals because the next probe
    anti-joins whatever was already appended.  Returns the number of
    appended terms (manifest meta is updated on success)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from .util import polars_to_arrow_string

    cand_terms = cand_terms.unique(subset=["term"]).with_columns(
        pl.col("term").hash(seed=0).reinterpret(signed=True).alias("tid")
    )
    if cand_terms["tid"].n_unique() != cand_terms.height:
        raise RuntimeError(
            "term-id hash collision inside the premise batch; "
            "rerun with dict_encode=False"
        )
    files = sorted(
        os.path.join(store.terms_dir, n)
        for n in os.listdir(store.terms_dir)
        if n.endswith(".parquet")
    )
    term_arr = pc.cast(cand_terms.to_arrow()["term"], pa.string()).combine_chunks()
    tid_arr = cand_terms.to_arrow()["tid"].combine_chunks()

    def probe(batch: pa.Table, t_arr=None, i_arr=None) -> pa.Table:
        if t_arr is None:
            t_arr, i_arr = ray.get(ref)
        m = pc.or_(
            pc.is_in(pc.cast(batch["term"], pa.string()), value_set=t_arr),
            pc.is_in(pc.cast(batch["tid"], pa.int64()), value_set=i_arr),
        )
        out = batch.filter(m)
        return pa.table(
            {
                "term": pc.cast(out["term"], pa.string()),
                "tid": pc.cast(out["tid"], pa.int64()),
            }
        )

    n_terms = store.manifest.get("terms", {}).get("n_terms", 0)
    if n_terms <= 2_000_000:
        hits_tabs = [
            t
            for t in (probe(pq.read_table(f), term_arr, tid_arr) for f in files)
            if t.num_rows
        ]
    else:
        ref = ray.put((term_arr, tid_arr))
        hits_tabs = [
            b
            for b in ray.data.read_parquet(files)
            .map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
            .iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows and b.num_columns
        ]
    if hits_tabs:
        hits = pl.from_arrow(pa.concat_tables(hits_tabs)).unique()
        fresh = cand_terms.join(hits.select("term"), on="term", how="anti")
        clash = fresh.join(hits.select("tid"), on="tid", how="semi")
        if clash.height:
            raise RuntimeError(
                f"term-id hash collision with the existing dictionary "
                f"({clash.height} ids); rerun with dict_encode=False"
            )
    else:
        fresh = cand_terms
    if fresh.height == 0:
        return 0
    out_path = os.path.join(store.terms_dir, f"add-{store.next_gen:05d}.parquet")
    tmp = out_path + ".tmp"
    pq.write_table(polars_to_arrow_string(fresh.select(["term", "tid"])), tmp)
    os.replace(tmp, out_path)
    meta = dict(store.manifest.get("terms", {}))
    meta["n_terms"] = int(meta.get("n_terms", 0)) + fresh.height
    store.set_terms_meta(meta)
    return fresh.height


def add_premises_store(
    new_premises_ds,
    rules: Sequence[Rule],
    store_path: str,
    *,
    num_partitions: int = 32,
    salt_factor: int = 1,
    max_iterations: int = 10_000,
    with_lineage: Optional[bool] = None,
    broadcast_rows: int = 500_000,
    dict_encode: bool = True,
    compact_every: Optional[int] = 64,
):
    """Incremental maintenance of a completed :func:`infer_store`
    fixpoint: add new premise facts to the live store and continue the
    semi-naive rounds seeded with ONLY the truly-new facts — the
    existing closure is never recomputed.

    This is exactly the reference's ``apply_related`` discipline
    (``src/reasoner.rs:131-155``: every consequence of a new fact is
    found by chains in which that fact occupies at least one body
    position) applied across calls instead of across rounds: the new
    premises are anti-joined against the store, committed as one more
    generation, and the resumed round loop treats them as the delta
    against the full historical store.  The derived set after the call
    equals a from-scratch ``infer_store`` over the union of all
    premises (asserted by tests); cost scales with the NEW closure, not
    the store.

    ``rules`` must be the ruleset the store was built with (new
    unconditional rules would need their heads re-fired — pass them as
    premises instead).  New terms are appended to the persisted
    dictionary with the same pinned hash kernel and full collision
    checking (:func:`_extend_store_terms`).

    Caveat (fact-set semantics, like the reference): a "new" premise
    that is already DERIVED in the store adds no information and is
    anti-joined away — its premise-ness is not recorded, so a later
    :func:`remove_premises_store` that overdeletes its derivation also
    removes it.  Re-add it afterwards if it must outlive its
    derivation.

    A fresh/empty ``store_path`` falls through to plain
    :func:`infer_store`."""
    import pyarrow.compute as pc
    import ray.data

    from .eval_hybrid import anti_probe
    from .eval_shuffle import collect_to_polars
    from .state import TripleStore
    from .util import drop_empty_blocks

    value_type = "int64" if dict_encode else "string"
    store = TripleStore(store_path, num_partitions=num_partitions, value_type=value_type)
    if with_lineage is None:
        # auto-detect: a lineage-tracked store must KEEP recording
        # lineage through incremental rounds, or later prove_store /
        # retraction calls would silently miss the new derivations
        with_lineage = os.path.isdir(os.path.join(store_path, "lineage"))
    if not store.generations:
        return infer_store(
            new_premises_ds,
            rules,
            store_path,
            num_partitions=num_partitions,
            salt_factor=salt_factor,
            max_iterations=max_iterations,
            with_lineage=with_lineage,
            broadcast_rows=broadcast_rows,
            dict_encode=dict_encode,
            compact_every=compact_every,
        )
    if store.value_type != value_type:
        raise ValueError(
            f"store at {store_path} is {store.value_type}-typed; "
            f"pass dict_encode={store.value_type == 'int64'}"
        )
    store.check_hash_pin()
    if isinstance(new_premises_ds, pa.Table):
        new_premises_ds = ray.data.from_arrow(new_premises_ds)
    new_premises_ds = new_premises_ds.select_columns(FACT_COLS).materialize()
    last_meta = store.generations[-1].get("metrics", {})
    start_round = last_meta.get("round", len(store.generations) - 1) + 1
    rule_consts = {
        e.value for r in rules for e in _iter_rule_entities(r) if e.is_bound()
    }

    if new_premises_ds.count() <= broadcast_rows:
        prem_df = collect_to_polars(new_premises_ds)
        if prem_df.width == 0:
            prem_df = pl.DataFrame(schema={c: pl.Utf8 for c in FACT_COLS})
        prem_df = prem_df.select(FACT_COLS).unique()
        if dict_encode:
            cand = pl.concat(
                [prem_df.select(pl.col(c).cast(pl.Utf8).alias("term")) for c in FACT_COLS]
                + ([pl.DataFrame({"term": sorted(rule_consts)})] if rule_consts else [])
            ).unique()
            _extend_store_terms(store, cand)
            prem_df = prem_df.with_columns(
                [
                    pl.col(c).cast(pl.Utf8).hash(seed=0).reinterpret(signed=True).alias(c)
                    for c in FACT_COLS
                ]
            )
        new_facts = anti_probe(prem_df, store.dataset())
        if new_facts.height == 0:
            return store
        store.add_small(
            new_facts.select(FACT_COLS),
            extra={"round": start_round, "evaluator": "premise-add"},
        )
    else:
        if dict_encode:

            def to_terms(batch: pa.Table) -> pa.Table:
                parts = [
                    (
                        batch[c].combine_chunks()
                        if isinstance(batch[c], pa.ChunkedArray)
                        else batch[c]
                    )
                    for c in FACT_COLS
                ]
                merged = pa.concat_arrays([pc.cast(p, pa.string()) for p in parts])
                return pa.table({"term": pc.unique(merged)})

            from .util import distinct

            cand_ds = distinct(
                new_premises_ds.map_batches(
                    to_terms, batch_format="pyarrow", zero_copy_batch=True
                ),
                ["term"],
            )
            cand_tabs = (
                [
                    b
                    for b in cand_ds.iter_batches(batch_size=None, batch_format="pyarrow")
                    if b.num_rows and b.num_columns
                ]
                if cand_ds is not None
                else []
            )
            # the candidate set is DISTINCT terms of the batch — orders of
            # magnitude smaller than the batch; above driver scale, shard
            # this loop over term ranges (same probe kernel per shard)
            cand = (
                pl.from_arrow(pa.concat_tables(cand_tabs))
                if cand_tabs
                else pl.DataFrame({"term": []}, schema={"term": pl.Utf8})
            )
            if rule_consts:
                cand = pl.concat([cand, pl.DataFrame({"term": sorted(rule_consts)})])
            _extend_store_terms(store, cand)
            new_premises_ds = new_premises_ds.map_batches(
                _hash_encode_quads_fn(), batch_format="pyarrow", zero_copy_batch=True
            )
        from .util import distinct

        # one in-batch distinct + ONE anti-join against the store; the
        # result is then precleaned so store.add skips its own (second)
        # full-store anti-join exchange
        deduped = distinct(
            new_premises_ds.select_columns(FACT_COLS),
            FACT_COLS,
            schema=store.quad_schema(),
        )
        if deduped is None:
            return store
        joined = deduped.join(
            store.dataset().materialize(),
            "left_anti",
            num_partitions,
            on=tuple(FACT_COLS),
        ).materialize()
        joined = drop_empty_blocks(joined)
        if joined is None or joined.count() == 0:
            return store
        store.add(
            joined.select_columns(FACT_COLS),
            precleaned=True,
            extra={"round": start_round, "evaluator": "premise-add"},
        )

    return infer_store(
        ray.data.from_arrow(store.quad_schema().empty_table()),
        rules,
        store_path,
        num_partitions=num_partitions,
        salt_factor=salt_factor,
        max_iterations=max_iterations,
        resume=True,
        with_lineage=with_lineage,
        broadcast_rows=broadcast_rows,
        dict_encode=dict_encode,
        compact_every=compact_every,
    )


def _lineage_gen_files(lineage_dir: str, min_gen: Optional[int] = None):
    """``[(gen_number, file_path)]`` for every committed lineage parquet,
    optionally restricted to generations ``>= min_gen`` (dependence rows
    never live in an earlier generation than the fact they use — rounds
    are monotone — so the overdeletion walk scans a shrinking suffix)."""
    out = []
    if not os.path.isdir(lineage_dir):
        return out
    for gd in sorted(os.listdir(lineage_dir)):
        if not gd.startswith("gen=") or gd.endswith((".new", ".old")):
            continue
        gen = int(gd[len("gen="):])
        if min_gen is not None and gen < min_gen:
            continue
        d = os.path.join(lineage_dir, gd)
        for root, _dirs, names in os.walk(d):
            out.extend(
                (gen, os.path.join(root, n)) for n in names if n.endswith(".parquet")
            )
    return out


def _lineage_row_count(lineage_dir: str) -> int:
    """Total recorded derivations — parquet footers only, no data read."""
    import pyarrow.parquet as pq

    return sum(pq.read_metadata(f).num_rows for _g, f in _lineage_gen_files(lineage_dir))


# -- lineage tombstones (the LSM delete path's lineage side) ---------------


def _lineage_tomb_meta_path(lineage_dir: str) -> str:
    return os.path.join(lineage_dir, "tombstones", "meta.json")


def _lineage_tombstones(lineage_dir: str) -> List[Dict]:
    """Committed lineage tombstone parts ``[{file, rows, max_gen}]`` — a
    part hides lineage rows whose HEAD quad is in the part and whose
    generation is ≤ ``max_gen`` (a rederived head's NEW lineage row in a
    later generation stays visible)."""
    p = _lineage_tomb_meta_path(lineage_dir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f).get("parts", [])


def _write_lineage_tombstone(
    lineage_dir: str, deleted: pl.DataFrame, max_gen: int
) -> None:
    """Append one immutable lineage tombstone part (tmp+rename, meta
    updated last = commit point; a crash leaves at worst an orphan
    parquet no meta references)."""
    from .util import polars_to_arrow_string

    import pyarrow.parquet as _pq

    if deleted.height == 0:
        return
    tdir = os.path.join(lineage_dir, "tombstones")
    os.makedirs(tdir, exist_ok=True)
    parts = _lineage_tombstones(lineage_dir)
    used = [int(t["file"].split("-")[-1].split(".")[0]) for t in parts]
    idx = (max(used) + 1) if used else 0
    rel = f"ts-{idx:05d}.parquet"
    fpath = os.path.join(tdir, rel)
    _pq.write_table(
        polars_to_arrow_string(deleted.select(FACT_COLS).unique()), fpath + ".tmp"
    )
    os.replace(fpath + ".tmp", fpath)
    parts = [*parts, {"file": rel, "rows": int(deleted.height), "max_gen": int(max_gen)}]
    meta = _lineage_tomb_meta_path(lineage_dir)
    with open(meta + ".tmp", "w") as f:
        json.dump({"parts": parts}, f)
    os.replace(meta + ".tmp", meta)


def _lineage_tombstone_frame(
    lineage_dir: str, fact_dtype
) -> Optional[pl.DataFrame]:
    """All lineage tombstone parts as one frame with a ``_mg`` scope
    column (driver-resident; bounded by the retraction batch bound)."""
    parts = _lineage_tombstones(lineage_dir)
    if not parts:
        return None
    tdir = os.path.join(lineage_dir, "tombstones")
    frames = []
    for t in parts:
        df = pl.read_parquet(os.path.join(tdir, t["file"])).select(FACT_COLS)
        df = df.with_columns(
            [pl.col(c).cast(fact_dtype) for c in FACT_COLS]
            + [pl.lit(t["max_gen"], dtype=pl.Int64).alias("_mg")]
        )
        frames.append(df)
    return pl.concat(frames)


def _apply_lineage_tombstones(
    df: pl.DataFrame, tomb: Optional[pl.DataFrame]
) -> pl.DataFrame:
    """Drop rows of a ``gen``-carrying lineage frame whose head quad is
    tombstoned at or below that row's generation."""
    if tomb is None or df.height == 0:
        return df
    hid = (
        df.select([*FACT_COLS, "gen"])
        .join(tomb, on=FACT_COLS, how="inner")
        .filter(pl.col("gen") <= pl.col("_mg"))
        .select([*FACT_COLS, "gen"])
        .unique()
    )
    if hid.height == 0:
        return df
    return df.join(hid, on=[*FACT_COLS, "gen"], how="anti")


def _read_lineage_driver(lineage_dir: str, fact_dtype=pl.Utf8) -> pl.DataFrame:
    """All lineage rows as one driver polars frame with a ``gen`` column
    (the generation-directory number) — the driver-resident regime of the
    overdeletion walk and lineage filter.  When no lineage parquet files
    exist (every generation folded/filtered to zero rows), the empty
    frame still carries the FULL lineage schema — downstream joins on
    FACT_COLS must not crash on a fileless lineage dir."""
    import pyarrow.parquet as pq

    frames = []
    for gen, f in _lineage_gen_files(lineage_dir):
        t = pq.read_table(f)
        frames.append(pl.from_arrow(t).with_columns(pl.lit(gen, dtype=pl.Int64).alias("gen")))
    if not frames:
        schema = {c: fact_dtype for c in FACT_COLS}
        schema["lkey"] = pl.Utf8
        schema["gen"] = pl.Int64
        return pl.DataFrame(schema=schema)
    out = pl.concat(frames, how="vertical_relaxed")
    return _apply_lineage_tombstones(
        out, _lineage_tombstone_frame(lineage_dir, out.schema["s"])
    )


def _dependents_in_frame(
    blk: pl.DataFrame, frontier: pl.DataFrame, walk_rules: Sequence[Rule], fact_dtype
) -> pl.DataFrame:
    """HEAD quads (plus their lineage ``gen`` when the frame carries one)
    of every recorded derivation in ``blk`` whose reconstructed body
    contains a frontier fact — the vectorized body reconstruction shared
    by the driver-resident and distributed overdeletion scans.

    Per rule: the lkey splits into (rule_index, instantiations), each
    body atom's columns are either a rule constant literal or an
    instantiation column, and one semi-join against the frontier finds
    the dependents — no Python per-row decode."""
    keep_cols = [*FACT_COLS] + (["gen"] if "gen" in blk.columns else [])
    empty = pl.DataFrame(
        schema={c: (pl.Int64 if c == "gen" else fact_dtype) for c in keep_cols}
    )
    if blk.height == 0 or frontier.height == 0:
        return empty
    fr = frontier.select(FACT_COLS)
    # raw-lkey substring prefilter (Aho-Corasick) BEFORE the expensive
    # per-row split: a derivation whose body contains a frontier fact
    # must carry at least one frontier term among its lkey
    # instantiations — UNLESS some atom is all-constant (the dependence
    # is then invisible in the lkey), which disables the prefilter.
    # Substring matches over-select (id "12" inside "123"), never drop.
    if blk.height > 50_000 and all(
        any(e.is_unbound() for e in atom) for r in walk_rules for atom in r.if_all
    ):
        vals: set = set()
        for c in FACT_COLS:
            vals.update(fr[c].unique().to_list())
            if len(vals) > 20_000:
                break
        if len(vals) <= 20_000:
            blk = blk.filter(
                pl.col("lkey").str.contains_any([str(v) for v in vals])
            )
            if blk.height == 0:
                return empty
    var_pos = [
        {name: k for k, name in enumerate(r.canonical_unbound())} for r in walk_rules
    ]
    blk = blk.with_columns(pl.col("lkey").str.split(LKEY_SEP).alias("_parts"))
    blk = blk.with_columns(pl.col("_parts").list.get(0).cast(pl.Int64).alias("_ri"))
    hits = []
    for ri in blk["_ri"].unique().to_list():
        rule = walk_rules[ri]
        vp = var_pos[ri]
        sub = blk.filter(pl.col("_ri") == ri)
        for atom in rule.if_all:
            # cheap single-column prefilter BEFORE reconstructing the
            # candidate body frame: the atom can only produce a frontier
            # fact if its (first) variable slot's instantiation value
            # appears in the frontier's corresponding column — one
            # vectorized is_in over the raw lkey parts cuts a
            # millions-of-rows block to the dependent neighborhood
            # before any multi-column select/join materializes
            pre = None
            for j, e in enumerate(atom):
                if e.is_unbound():
                    pre = (j, vp[e.value])
                    break
            s2 = sub
            if pre is not None:
                j, k = pre
                s2 = sub.filter(
                    pl.col("_parts")
                    .list.get(k + 1)
                    .cast(fact_dtype)
                    .is_in(fr[FACT_COLS[j]].unique().implode())
                )
            if s2.height == 0:
                continue
            s2 = s2.with_columns(
                [
                    pl.col("_parts").list.get(k + 1).cast(fact_dtype).alias(f"_v{k}")
                    for k in range(len(vp))
                ]
            )
            exprs = []
            for j, e in enumerate(atom):
                if e.is_unbound():
                    exprs.append(pl.col(f"_v{vp[e.value]}").alias(f"_p_{FACT_COLS[j]}"))
                else:
                    exprs.append(
                        pl.lit(e.value, dtype=fact_dtype).alias(f"_p_{FACT_COLS[j]}")
                    )
            cand = s2.select([*[pl.col(c) for c in keep_cols], *exprs])
            hit = cand.join(
                fr.rename({c: f"_p_{c}" for c in FACT_COLS}),
                on=[f"_p_{c}" for c in FACT_COLS],
                how="semi",
            )
            if hit.height:
                hits.append(hit.select(keep_cols))
    if not hits:
        return empty
    return pl.concat(hits).unique()


def _scan_lineage_dependents(
    lineage_dir: str,
    frontier: pl.DataFrame,
    walk_rules: Sequence[Rule],
    fact_dtype,
    *,
    min_gen: Optional[int] = None,
    head_probe: Optional[pl.DataFrame] = None,
) -> Tuple[pl.DataFrame, set]:
    """Distributed overdeletion scan: ONE streaming pass over the
    per-generation lineage parquet of generations ``>= min_gen``
    returning ``(dependent heads with their gen, head-row gens of
    head_probe)``.

    ``min_gen`` prunes the walk: a derivation's body facts always live
    in an earlier-or-equal generation than the derivation's own row, so
    dependents of a frontier found at generations ``G`` can only be
    recorded at generations ``>= min(G)``.  ``head_probe`` piggybacks the
    lookup of which generations hold lineage rows for the given facts
    (needed to bound the later lineage filter to affected generations)
    onto the same pass."""
    import ray
    import ray.data

    from .util import polars_to_arrow_string

    gen_files = _lineage_gen_files(lineage_dir, min_gen)
    empty = pl.DataFrame(
        schema={**{c: fact_dtype for c in FACT_COLS}, "gen": pl.Int64}
    )
    if not gen_files or (frontier.height == 0 and head_probe is None):
        return empty, set()
    fact_pa = pa.int64() if fact_dtype == pl.Int64 else pa.string()
    out_schema = pa.schema(
        [(c, fact_pa) for c in FACT_COLS]
        + [("gen", pa.int64()), ("_is_head", pa.bool_())]
    )
    fref = ray.put(frontier.select(FACT_COLS))
    href = ray.put(head_probe.select(FACT_COLS)) if head_probe is not None else None
    tomb = _lineage_tombstone_frame(lineage_dir, fact_dtype)
    tref = ray.put(tomb) if tomb is not None else None
    gen_expr = (
        pl.col("path")
        .str.extract_all(r"gen=(\d+)")
        .list.last()
        .str.strip_prefix("gen=")
        .cast(pl.Int64)
        .alias("gen")
    )

    def probe(batch: pa.Table) -> pa.Table:
        blk = pl.from_arrow(batch)
        if blk.height == 0:
            return out_schema.empty_table()
        blk = blk.with_columns(gen_expr)
        if tref is not None:
            blk = _apply_lineage_tombstones(blk, ray.get(tref))
            if blk.height == 0:
                return out_schema.empty_table()
        outs = []
        deps = _dependents_in_frame(blk, ray.get(fref), walk_rules, fact_dtype)
        if deps.height:
            outs.append(deps.with_columns(pl.lit(False).alias("_is_head")))
        if href is not None:
            heads = blk.join(ray.get(href), on=FACT_COLS, how="semi")
            if heads.height:
                outs.append(
                    heads.select([*FACT_COLS, "gen"])
                    .unique()
                    .with_columns(pl.lit(True).alias("_is_head"))
                )
        if not outs:
            return out_schema.empty_table()
        return polars_to_arrow_string(pl.concat(outs)).cast(out_schema)

    tabs = [
        b
        for b in ray.data.read_parquet([f for _g, f in gen_files], include_paths=True)
        .map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows and b.num_columns
    ]
    if not tabs:
        return empty, set()
    allrows = pl.from_arrow(pa.concat_tables(tabs))
    head_gens = set(allrows.filter(pl.col("_is_head"))["gen"].to_list())
    deps = allrows.filter(~pl.col("_is_head")).drop("_is_head").unique()
    return deps, head_gens


def _overdelete_walk(
    lineage_dir: str,
    prem_df: pl.DataFrame,
    walk_rules: Sequence[Rule],
    fact_dtype,
    max_overdelete: int,
    *,
    lineage_df: Optional[pl.DataFrame] = None,
) -> Tuple[pl.DataFrame, List[int]]:
    """DRed overdeletion: iterate lineage dependency levels from the
    retracted premises; returns ``(deleted facts, affected lineage
    generations)``.  With ``lineage_df`` (the whole lineage driver-
    resident) each level is a polars pass; otherwise each level is one
    distributed scan pruned to generations ``>= min(gen)`` of the
    previous level's fresh heads (level 0 scans everything — a premise's
    position is unknown, and a premise retracted after being rederived
    HAS a lineage row whose generation the filter must know)."""
    def _atom_compatible(frontier_df: pl.DataFrame) -> pl.DataFrame:
        """Frontier rows that can match at least one rule-body atom's
        constant slots — only those can have recorded dependents, so a
        level whose frontier is all-incompatible needs NO lineage scan
        (e.g. retracting facts of a derived-only predicate that never
        appears in any body)."""
        keeps = []
        for r in walk_rules:
            for atom in r.if_all:
                cond = None
                for j, e in enumerate(atom):
                    if e.is_bound():
                        c = pl.col(FACT_COLS[j]) == pl.lit(e.value, dtype=fact_dtype)
                        cond = c if cond is None else (cond & c)
                keeps.append(
                    frontier_df if cond is None else frontier_df.filter(cond)
                )
        if not keeps:
            return frontier_df.head(0)
        return pl.concat(keeps).unique()

    deleted = prem_df
    frontier = prem_df
    affected: set = set()
    min_gen: Optional[int] = None
    first = True
    while frontier.height:
        frontier = _atom_compatible(frontier)
        if frontier.height == 0 and not first:
            break
        if lineage_df is not None:
            src = (
                lineage_df
                if min_gen is None
                else lineage_df.filter(pl.col("gen") >= min_gen)
            )
            heads = _dependents_in_frame(src, frontier, walk_rules, fact_dtype)
            if first:
                affected |= set(
                    lineage_df.join(prem_df, on=FACT_COLS, how="semi")["gen"].to_list()
                )
        else:
            heads, head_gens = _scan_lineage_dependents(
                lineage_dir,
                frontier,
                walk_rules,
                fact_dtype,
                min_gen=min_gen,
                head_probe=prem_df if first else None,
            )
            affected |= head_gens
        first = False
        fresh = (
            heads.join(deleted, on=FACT_COLS, how="anti") if heads.height else heads
        )
        if fresh.height == 0:
            break
        affected |= set(fresh["gen"].to_list())
        deleted = pl.concat([deleted, fresh.select(FACT_COLS)])
        if deleted.height > max_overdelete:
            raise ValueError(
                "overdeletion frontier exceeds max_overdelete — the retracted "
                "closure is too large for the driver-resident walk; retract in "
                "smaller batches or rebuild the store from surviving premises"
            )
        frontier = fresh.select(FACT_COLS)
        min_gen = int(fresh["gen"].min())
    return deleted, sorted(affected)


_MERGED_MARKER = "_merged"
_ABSORBS_FILE = "absorbs.json"


def _swap_lineage_dir(d: str) -> None:
    """Atomic-enough ``.new`` → live swap (a crashed swap is healed by
    :func:`_heal_lineage_dirs` on the next retraction).  The merged
    marker survives the swap — a rewritten merged generation still holds
    multi-round rows, and the backward proof walk must keep loop-scanning
    it (:func:`_walk_lineage_generations`)."""
    import shutil

    for meta in (_MERGED_MARKER, _ABSORBS_FILE):
        src = os.path.join(d, meta)
        dst = os.path.join(d + ".new", meta)
        if os.path.exists(src) and not os.path.exists(dst):
            shutil.copyfile(src, dst)
    old_dir = d + ".old"
    shutil.rmtree(old_dir, ignore_errors=True)
    os.rename(d, old_dir)
    os.rename(d + ".new", d)
    shutil.rmtree(old_dir, ignore_errors=True)


def compact_lineage(
    lineage_dir: str, *, keep_last: int = 1, driver_rows: int = 2_000_000
) -> None:
    """Fold all committed lineage generations except the newest
    ``keep_last`` into ONE merged directory — bounds the lineage file
    and directory count on long fixpoints the same way
    :meth:`TripleStore.compact_derived` bounds the fact store's.

    The merged directory keeps the LARGEST folded generation number, so
    both walk orders stay sound: parents still live at numbers ≤ the
    merged number (backward proof walk) and dependents at numbers ≥ it
    (retraction overdeletion walk, which prunes with ``>=``).  Rows
    from different rounds now share a directory, so a ``_merged``
    marker tells the backward walk to loop-scan it until no new quad
    resolves.  First-wins lkeys are preserved by a groupby-min on the
    quad during the fold (duplicate quads only exist transiently after
    a crashed swap; the min is the same deterministic tie-break as the
    round dedup).

    Crash discipline: the merged content is fully written to
    ``gen=K.new`` (with an ``absorbs.json`` naming the other folded
    directories), the swap commits it, then the absorbed directories
    are removed; :func:`_heal_lineage_dirs` finishes either half of a
    crashed attempt."""
    import shutil

    _heal_lineage_dirs(lineage_dir)
    _materialize_lineage_tombstones(lineage_dir)
    gen_files = _lineage_gen_files(lineage_dir)
    gens = sorted({g for g, _f in gen_files})
    victims = gens[:-keep_last] if keep_last else gens
    if len(victims) <= 1:
        return
    target = victims[-1]
    vset = set(victims)
    files = [f for g, f in gen_files if g in vset]
    d = os.path.join(lineage_dir, f"gen={target:05d}")
    new_dir = d + ".new"
    shutil.rmtree(new_dir, ignore_errors=True)
    os.makedirs(new_dir, exist_ok=True)

    n_rows = 0
    import pyarrow.parquet as pq

    for f in files:
        n_rows += pq.read_metadata(f).num_rows
    if n_rows <= driver_rows:
        frames = [pl.from_arrow(pq.read_table(f)) for f in files]
        merged = (
            pl.concat(frames, how="vertical_relaxed")
            .group_by(FACT_COLS)
            .agg(pl.col("lkey").min())
        )
        if merged.height:
            merged.select([*FACT_COLS, "lkey"]).write_parquet(
                os.path.join(new_dir, "lineage.parquet")
            )
    else:
        import ray.data

        from .util import drop_empty_blocks

        folded = (
            ray.data.read_parquet(files)
            .groupby(FACT_COLS, num_partitions=16)
            .min("lkey")
            .rename_columns({"min(lkey)": "lkey"})
            .materialize()
        )
        folded = drop_empty_blocks(folded)
        if folded is not None:
            folded.write_parquet(new_dir)
    with open(os.path.join(new_dir, _MERGED_MARKER), "w") as f:
        f.write("")
    with open(os.path.join(new_dir, _ABSORBS_FILE), "w") as f:
        json.dump([g for g in victims if g != target], f)
    _swap_lineage_dir(d)
    for g in victims:
        if g != target:
            shutil.rmtree(os.path.join(lineage_dir, f"gen={g:05d}"), ignore_errors=True)


def _materialize_lineage_tombstones(lineage_dir: str) -> None:
    """Fold committed lineage tombstone parts into physical rewrites
    (oldest first, each scoped to generations ≤ its ``max_gen``) —
    called by :func:`compact_lineage` so the logical deletes are paid
    once per compaction cycle, mirroring
    :meth:`TripleStore.materialize_tombstones`."""
    parts = _lineage_tombstones(lineage_dir)
    if not parts:
        return
    tdir = os.path.join(lineage_dir, "tombstones")
    meta = _lineage_tomb_meta_path(lineage_dir)
    while parts:
        t = parts[0]
        df = pl.read_parquet(os.path.join(tdir, t["file"]))
        gens = [
            g
            for g in sorted({g for g, _f in _lineage_gen_files(lineage_dir)})
            if g <= t["max_gen"]
        ]
        _filter_lineage_dirs(
            lineage_dir, df.select(FACT_COLS), affected_gens=gens, mode="rewrite"
        )
        parts = parts[1:]
        with open(meta + ".tmp", "w") as f:
            json.dump({"parts": parts}, f)
        os.replace(meta + ".tmp", meta)
        try:
            os.remove(os.path.join(tdir, t["file"]))
        except OSError:
            pass


def _filter_lineage_dirs(
    lineage_dir: str,
    deleted: pl.DataFrame,
    *,
    affected_gens: Optional[List[int]] = None,
    lineage_df: Optional[pl.DataFrame] = None,
    driver_rows: int = 2_000_000,
    mode: str = "rewrite",
) -> None:
    """Drop lineage rows whose HEAD is a deleted fact.

    ``mode="rewrite"`` (default): only ``affected_gens`` (the
    generations the overdeletion walk saw deleted heads in) are
    rewritten — every other generation provably holds none.  Below
    ``driver_rows`` total lineage rows the filter runs in driver polars
    (``lineage_df`` reuses the frame the walk already loaded); above,
    ONE distributed pass over the affected generations' files writes
    the filtered rows hive-partitioned by source generation, then plain
    renames swap each directory in (write-new → swap; a crashed swap is
    healed by :func:`_heal_lineage_dirs` on the next retraction).

    ``mode="tombstone"``: the LSM path — ONE part file records the
    deleted heads (scoped to the current max generation); every lineage
    reader filters against it and :func:`compact_lineage` folds it into
    a physical rewrite later.  Writes scale with the deleted cone."""
    import shutil

    from .util import polars_to_arrow_string

    if not os.path.isdir(lineage_dir) or deleted.height == 0:
        return
    if mode == "tombstone":
        all_gens = [g for g, _f in _lineage_gen_files(lineage_dir)]
        scope = (
            max(affected_gens)
            if affected_gens
            else (max(all_gens) if all_gens else 0)
        )
        _write_lineage_tombstone(lineage_dir, deleted, scope)
        return
    gen_files = _lineage_gen_files(lineage_dir)
    if affected_gens is not None:
        keep_set = set(affected_gens)
        gen_files = [(g, f) for g, f in gen_files if g in keep_set]
    if not gen_files:
        return
    gens = sorted({g for g, _f in gen_files})

    if lineage_df is None and _lineage_row_count(lineage_dir) <= driver_rows:
        lineage_df = _read_lineage_driver(
            lineage_dir, fact_dtype=deleted.schema["s"]
        )

    if lineage_df is not None:
        del_keys = deleted.select(FACT_COLS)
        for g in gens:
            d = os.path.join(lineage_dir, f"gen={g:05d}")
            sub = lineage_df.filter(pl.col("gen") == g)
            kept = sub.join(del_keys, on=FACT_COLS, how="anti").drop("gen")
            new_dir = d + ".new"
            shutil.rmtree(new_dir, ignore_errors=True)
            os.makedirs(new_dir, exist_ok=True)
            if kept.height:
                kept.write_parquet(os.path.join(new_dir, "lineage.parquet"))
            _swap_lineage_dir(d)
        return

    import ray
    import ray.data

    dref = ray.put(deleted.select(FACT_COLS))
    fact_pa = pa.int64() if deleted.schema["s"] == pl.Int64 else pa.string()
    out_schema = pa.schema(
        [(c, fact_pa) for c in FACT_COLS]
        + [("lkey", pa.string()), ("_gen", pa.int64())]
    )
    gen_expr = (
        pl.col("path")
        .str.extract_all(r"gen=(\d+)")
        .list.last()
        .str.strip_prefix("gen=")
        .cast(pl.Int64)
        .alias("_gen")
    )

    def keep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return out_schema.empty_table()
        blk = pl.from_arrow(batch).with_columns(gen_expr)
        kept = blk.join(ray.get(dref), on=FACT_COLS, how="anti")
        kept = kept.select([*FACT_COLS, "lkey", "_gen"])
        return polars_to_arrow_string(kept).cast(out_schema)

    tmp_out = os.path.join(lineage_dir, "_filter_tmp")
    shutil.rmtree(tmp_out, ignore_errors=True)
    ray.data.read_parquet(
        [f for _g, f in gen_files], include_paths=True
    ).map_batches(keep, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        tmp_out, partition_cols=["_gen"]
    )
    for g in gens:
        d = os.path.join(lineage_dir, f"gen={g:05d}")
        new_dir = d + ".new"
        shutil.rmtree(new_dir, ignore_errors=True)
        os.makedirs(new_dir, exist_ok=True)
        part_dir = os.path.join(tmp_out, f"_gen={g}")
        if os.path.isdir(part_dir):
            for n in sorted(os.listdir(part_dir)):
                if n.endswith(".parquet"):
                    os.replace(os.path.join(part_dir, n), os.path.join(new_dir, n))
        _swap_lineage_dir(d)
    shutil.rmtree(tmp_out, ignore_errors=True)


def _heal_lineage_dirs(lineage_dir: str) -> None:
    """Repair a half-finished :func:`_filter_lineage_dirs` /
    :func:`compact_lineage` swap: an orphan ``gen=K.old`` with no
    ``gen=K`` is renamed back (the filter re-runs idempotently); stray
    ``.new``/``.old`` leftovers are dropped; directories a committed
    merge absorbed (named in its ``absorbs.json``) but did not finish
    removing are removed now."""
    import shutil

    if not os.path.isdir(lineage_dir):
        return
    for gd in sorted(os.listdir(lineage_dir)):
        d = os.path.join(lineage_dir, gd)
        if gd.endswith(".old"):
            base = d[: -len(".old")]
            if not os.path.isdir(base):
                os.rename(d, base)
            else:
                shutil.rmtree(d, ignore_errors=True)
        elif gd.endswith(".new"):
            shutil.rmtree(d, ignore_errors=True)
    for gd in sorted(os.listdir(lineage_dir)):
        ab = os.path.join(lineage_dir, gd, _ABSORBS_FILE)
        if gd.startswith("gen=") and not gd.endswith((".new", ".old")) and os.path.exists(ab):
            with open(ab) as f:
                absorbed = json.load(f)
            for g in absorbed:
                shutil.rmtree(
                    os.path.join(lineage_dir, f"gen={g:05d}"), ignore_errors=True
                )


def remove_premises_store(
    premises_ds,
    rules: Sequence[Rule],
    store_path: str,
    *,
    num_partitions: int = 32,
    salt_factor: int = 1,
    max_iterations: int = 10_000,
    broadcast_rows: int = 500_000,
    max_overdelete: int = 5_000_000,
    dict_encode: bool = True,
    compact_every: Optional[int] = 64,
    rederive_bound: Optional[int] = None,
    tombstone_rows: int = 2_000_000,
):
    """DRed-style retraction (delete + rederive, Gupta/Mumick/
    Subrahmanian, SIGMOD 1993) over a live :func:`infer_store` fixpoint
    built with ``with_lineage=True``:

    1. **Overdelete** — a forward walk over the recorded lineage marks
       every fact whose (first-recorded) derivation transitively used a
       retracted premise (:func:`_overdelete_walk`: driver polars when
       the lineage fits in memory, else one pruned streaming lineage
       scan per dependency level — each level only reads generations at
       or after the previous level's earliest hit).
    2. **Delete** — the retracted premises plus the overdeleted set are
       physically removed (:meth:`TripleStore.delete_facts`, atomic
       manifest swap) along with their lineage rows (only the
       generations the walk saw deleted heads in are rewritten).
    3. **Rederive** — facts in the deleted set still derivable another
       way are put back by a HEAD-CONSTRAINED (magic-set-style) round:
       per rule, head-variable bindings are seeded from the deleted
       set and the body joins run as broadcast probe scans of the
       remaining store, so the data moved scales with the deleted
       cone, not the store (:func:`_seeded_rederive`; a full-remainder
       semi-naive round remains as the fallback when a seeded
       intermediate overflows its bound).  The resumed fixpoint then
       propagates from the rederived delta.

    The result equals a from-scratch ``infer_store`` over the surviving
    premises (asserted by tests) — including the subtle case where a
    retracted premise is itself re-derivable from the remaining facts
    (it stays, as a DERIVED fact).  The overdeleted set is held as a
    driver frame bounded by ``max_overdelete`` rows (~32 bytes/row of
    Int64 ids — the retraction batch's blast radius, independent of the
    evaluator's ``broadcast_rows`` regime bound); larger blast radii
    raise rather than silently degrade.  ``rederive_bound`` caps the
    seeded rederive's intermediate binding/probe frames (default
    ``max(broadcast_rows, 4·|deleted|)``); exceeding it falls back to
    the full-remainder round rather than failing."""
    import ray.data

    from .eval_hybrid import run_iteration_hybrid
    from .eval_shuffle import IncrementalMatches, collect_to_polars, run_iteration_core
    from .state import TripleStore

    RETRACT_PHASES.clear()  # per-call metrics — also on the resume path
    value_type = "int64" if dict_encode else "string"
    store = TripleStore(store_path, num_partitions=num_partitions, value_type=value_type)
    if not store.generations:
        raise ValueError(f"no store at {store_path}")
    if store.value_type != value_type:
        raise ValueError(
            f"store at {store_path} is {store.value_type}-typed; "
            f"pass dict_encode={store.value_type == 'int64'}"
        )
    store.check_hash_pin()
    lineage_dir = os.path.join(store_path, "lineage")
    if not os.path.isdir(lineage_dir):
        raise ValueError(
            "remove_premises_store requires a store built with with_lineage=True "
            "(retraction needs the recorded derivations to walk)"
        )
    _heal_lineage_dirs(lineage_dir)
    rules = list(rules)
    eng_rules = _encode_rules_hash(rules) if dict_encode else rules
    fact_dtype = pl.Int64 if dict_encode else pl.Utf8

    # complete a pending retraction a crashed prior call left behind
    # (marker written before its first destructive step), then reopen
    # the store — the resumed fixpoint works on a fresh manifest
    pending_marker = os.path.join(store_path, "retract_pending.parquet")
    pending_gens = os.path.join(store_path, "retract_pending_gens.json")
    if os.path.exists(pending_marker):
        pending = pl.read_parquet(pending_marker).select(FACT_COLS)
        pending = pending.with_columns([pl.col(c).cast(fact_dtype) for c in FACT_COLS])
        gens: Optional[List[int]] = None
        if os.path.exists(pending_gens):
            with open(pending_gens) as f:
                gens = json.load(f)
        _retract_finish(
            store,
            pending,
            rules,
            compile_rules(eng_rules),
            store_path,
            lineage_dir,
            dict_encode=dict_encode,
            fact_dtype=fact_dtype,
            broadcast_rows=broadcast_rows,
            num_partitions=num_partitions,
            salt_factor=salt_factor,
            max_iterations=max_iterations,
            compact_every=compact_every,
            resuming=True,
            affected_gens=gens,
            rederive_bound=rederive_bound,
            tombstone_rows=tombstone_rows,
        )
        os.remove(pending_marker)
        if os.path.exists(pending_gens):
            os.remove(pending_gens)
        store = TripleStore(
            store_path, num_partitions=num_partitions, value_type=value_type
        )

    if isinstance(premises_ds, pa.Table):
        premises_ds = ray.data.from_arrow(premises_ds)
    prem_df = collect_to_polars(premises_ds.select_columns(FACT_COLS))
    if prem_df.width == 0:
        prem_df = pl.DataFrame(schema={c: pl.Utf8 for c in FACT_COLS})
    prem_df = prem_df.select(FACT_COLS).unique()
    if dict_encode:
        prem_df = prem_df.with_columns(
            [
                pl.col(c).cast(pl.Utf8).hash(seed=0).reinterpret(signed=True).alias(c)
                for c in FACT_COLS
            ]
        )
    if prem_df.height > max_overdelete:
        raise ValueError(
            "retraction batch exceeds max_overdelete; split it into smaller batches"
        )
    plans = compile_rules(eng_rules)
    # an unconditional rule's head holds with NO premises — retracting it
    # is a no-op (rounds never re-fire empty bodies, so it would not be
    # rederived; src/infer.rs:36-50 fires them exactly once up front)
    uncond = _fire_unconditional(plans, False, fact_dtype)
    if uncond.height:
        prem_df = prem_df.join(uncond.select(FACT_COLS), on=FACT_COLS, how="anti")
        if prem_df.height == 0:
            return store

    # 1. overdeletion: iterate lineage dependency levels — driver polars
    # when the whole lineage fits, pruned distributed scans otherwise
    _t0 = time.monotonic()
    lineage_df: Optional[pl.DataFrame] = None
    if _lineage_row_count(lineage_dir) <= max(broadcast_rows, 2_000_000):
        lineage_df = _read_lineage_driver(lineage_dir, fact_dtype=fact_dtype)
    _t1 = time.monotonic()
    deleted, affected_gens = _overdelete_walk(
        lineage_dir,
        prem_df,
        eng_rules,
        fact_dtype,
        max_overdelete,
        lineage_df=lineage_df,
    )
    RETRACT_PHASES.update(
        {
            "lineage_read_sec": _t1 - _t0,
            "overdelete_walk_sec": time.monotonic() - _t1,
            "deleted_rows": int(deleted.height),
        }
    )

    # 2+3: physical delete + rederive, crash-resumable via the pending
    # marker: the overdeleted set (and the affected lineage generations)
    # is durably recorded BEFORE any destructive step, so a crash
    # anywhere in the tail re-runs it idempotently on the next call
    marker = os.path.join(store_path, "retract_pending.parquet")
    from .util import polars_to_arrow_string as _pas

    import pyarrow.parquet as _pq

    with open(pending_gens + ".tmp", "w") as f:
        json.dump(affected_gens, f)
    os.replace(pending_gens + ".tmp", pending_gens)
    tmp = marker + ".tmp"
    _pq.write_table(_pas(deleted.select(FACT_COLS)), tmp)
    os.replace(tmp, marker)
    out = _retract_finish(
        store,
        deleted,
        rules,
        plans,
        store_path,
        lineage_dir,
        dict_encode=dict_encode,
        fact_dtype=fact_dtype,
        broadcast_rows=broadcast_rows,
        num_partitions=num_partitions,
        salt_factor=salt_factor,
        max_iterations=max_iterations,
        compact_every=compact_every,
        resuming=False,
        affected_gens=affected_gens,
        lineage_df=lineage_df,
        rederive_bound=rederive_bound,
        tombstone_rows=tombstone_rows,
        verified_heads=deleted.join(prem_df, on=FACT_COLS, how="anti"),
    )
    os.remove(marker)
    os.remove(pending_gens)
    return out


def _seeded_rederive(
    store,
    deleted: pl.DataFrame,
    plans,
    fact_dtype,
    *,
    bound: int,
) -> Optional[Tuple[pl.DataFrame, int]]:
    """Head-constrained (magic-set-style) rederivation: compute every
    one-step derivation over the REMAINING store whose head quad is in
    ``deleted`` — the only facts that can be missing after an
    overdeletion.

    Per (rule, head atom): the head pattern matched against ``deleted``
    seeds bindings for the head variables; each body atom is then ONE
    broadcast probe scan of the store (constant/equality filters applied
    per block, semi-joined against the current binding frame's shared
    columns) so only rows joinable with the seeded cone ship back.  The
    joins themselves run in driver polars on those bounded frames.

    Data moved scales with the deleted cone, not the store; the store is
    scanned once per probed body atom (constant-filtered, no exchange),
    streaming straight off the parquet scan — the store is never pinned
    in the object store (a ``materialize()`` here would hold the full
    remainder resident per retraction call, a spill storm at scale).

    Returns ``(lineage frame (s,p,o,g,lkey), probe_rows)`` or None when
    any probe/binding frame exceeds ``bound`` — the caller then falls
    back to the full-remainder semi-naive round."""
    import ray
    import ray.data

    from .eval_broadcast import match_atom, project_heads
    from .plan import vcol
    from .util import polars_to_arrow_string

    # lazy: each probe is an independent streaming pass over the
    # committed parquet files; blocks are released as consumed
    store_ds = store.dataset()
    fact_pa = pa.int64() if fact_dtype == pl.Int64 else pa.string()
    probe_rows = 0
    heads_out: List[pl.DataFrame] = []
    del_keys = deleted.select(FACT_COLS).unique()

    def _atom_scan(atom):
        """Constant-pruned store scan for one probe atom: the atom's
        constant slots push down as a parquet filter, so row groups
        whose statistics exclude the constants (e.g. a whole derived
        generation under a different predicate) never leave storage."""
        import pyarrow.dataset as pads

        expr = None
        for c, v in atom.const_filters:
            e = pads.field(c) == v
            expr = e if expr is None else expr & e
        if expr is None:
            return store_ds
        return store.dataset(filter_expr=expr)

    def probe_atom(atom, seed_small: Optional[pl.DataFrame], shared: List[str]):
        """Matched projections of ``atom`` over the store, restricted to
        rows semi-joinable with the (broadcast) seed on ``shared``.
        Returns the collected distinct frame or None on overflow."""
        out_schema = pa.schema([(vcol(i), fact_pa) for i in atom.var_indices])
        seed_ref = ray.put(seed_small) if seed_small is not None else None

        def fn(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or batch.num_columns == 0:
                return out_schema.empty_table()
            m = match_atom(pl.from_arrow(batch), atom)
            if m is None:
                return out_schema.empty_table()
            if seed_ref is not None:
                m = m.join(ray.get(seed_ref).lazy(), on=shared, how="semi")
            res = m.collect(engine="streaming").unique()
            if res.height == 0:
                return out_schema.empty_table()
            return polars_to_arrow_string(res).cast(out_schema)

        _p0 = time.monotonic()
        tabs = []
        total = 0
        for b in (
            _atom_scan(atom)
            .map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
            .iter_batches(batch_size=None, batch_format="pyarrow")
        ):
            if b.num_rows and b.num_columns:
                tabs.append(b)
                total += b.num_rows
                if total > bound * 4:
                    return None
        RETRACT_PHASES["probe_passes"] = RETRACT_PHASES.get("probe_passes", 0) + 1
        RETRACT_PHASES["probe_pass_sec"] = RETRACT_PHASES.get(
            "probe_pass_sec", 0.0
        ) + (time.monotonic() - _p0)
        if not tabs:
            return pl.DataFrame(
                schema={vcol(i): fact_dtype for i in atom.var_indices}
            )
        out = pl.from_arrow(pa.concat_tables(tabs)).unique()
        if out.height > bound:
            return None
        return out

    def atom_present(atom) -> bool:
        """Presence probe for an all-constant body atom."""
        def fn(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or batch.num_columns == 0:
                return pa.table({"n": pa.array([], pa.int64())})
            m = match_atom(pl.from_arrow(batch), atom)
            return pa.table({"n": pa.array([1 if m is not None else 0], pa.int64())})

        for b in (
            _atom_scan(atom)
            .map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
            .iter_batches(batch_size=None, batch_format="pyarrow")
        ):
            if b.num_rows and b.num_columns and pa.compute.sum(b["n"]).as_py():
                return True
        return False

    # ---- phase A (driver): head seeding + greedy order per chain ----
    chains: List[Dict[str, Any]] = []
    for plan in plans:
        if not plan.body:
            continue
        for head_atom in plan.head:
            seed_lazy = match_atom(del_keys, head_atom)
            if seed_lazy is None:
                continue  # no deleted fact matches this head pattern
            seed = seed_lazy.collect(engine="streaming")
            if "__one" in seed.columns:
                bindings: Optional[pl.DataFrame] = None  # all-constant head
                bound_cols: List[str] = []
            else:
                seed = seed.unique()
                if seed.height == 0:
                    continue
                bindings = seed
                bound_cols = list(seed.columns)

            # greedy body order: atoms sharing already-bound variables
            # first (the distributed pop_strictest_requirement analogue)
            remaining_atoms = list(range(len(plan.body)))
            order: List[int] = []
            bvars = {int(c[2:]) for c in bound_cols}
            while remaining_atoms:
                def score(i):
                    a = plan.body[i]
                    shares = any(v in bvars for v in a.var_indices)
                    return (1 if shares else 0, a.selectivity_key(frozenset(bvars)), -i)

                best = max(remaining_atoms, key=score)
                remaining_atoms.remove(best)
                order.append(best)
                bvars |= set(plan.body[best].var_indices)
            chains.append(
                {"plan": plan, "bindings": bindings, "bound_cols": bound_cols,
                 "order": order}
            )

    # ---- fused probe pass: every var-atom whose seed shares a HEAD
    # variable probes in ONE scan (tagged projections).  The shipped
    # frame is a superset of what sequential chained probing would
    # fetch (head-seeded, not chain-seeded), but the driver chain join
    # below applies the full current-bindings restriction, so the final
    # bindings are identical — at the cost of ONE store pass instead of
    # one per atom.  Chains with a weakly-seeded atom (no head-shared
    # variable — its probe NEEDS the upstream chain restriction to stay
    # bounded) keep the sequential per-atom path.
    def _fusable(ch) -> bool:
        if ch["bindings"] is None:
            return False
        head_cols = set(ch["bound_cols"])
        for atom_i in ch["order"]:
            atom = ch["plan"].body[atom_i]
            m_cols = [vcol(i) for i in atom.var_indices]
            if m_cols and not (set(m_cols) & head_cols):
                return False
        return True

    probe_frames: Dict[Tuple[int, int], pl.DataFrame] = {}
    fused_ids = [ci for ci, ch in enumerate(chains) if _fusable(ch)]
    if fused_ids:
        tasks = []  # (tag, atom, seed_small, shared_head, m_cols)
        for ci in fused_ids:
            ch = chains[ci]
            head_cols = set(ch["bound_cols"])
            for atom_i in ch["order"]:
                atom = ch["plan"].body[atom_i]
                m_cols = [vcol(i) for i in atom.var_indices]
                if not m_cols:
                    continue  # all-constant atom: presence-checked below
                shared_head = [c for c in m_cols if c in head_cols]
                seed_small = ch["bindings"].select(shared_head).unique()
                tasks.append(((ci, atom_i), atom, seed_small, shared_head, m_cols))
        if tasks:
            import pyarrow.dataset as pads

            expr = None
            unfiltered = False
            for _tag, atom, _s, _sh, _m in tasks:
                e = None
                for c, v in atom.const_filters:
                    t = pads.field(c) == v
                    e = t if e is None else e & t
                if e is None:
                    unfiltered = True
                    break
                expr = e if expr is None else expr | e
            scan = store_ds if unfiltered else store.dataset(filter_expr=expr)
            tag_strs = [f"{ci}:{ai}" for (ci, ai), *_ in tasks]
            task_ref = ray.put(
                [
                    (ts, atom, seed_small, shared_head, m_cols)
                    for ts, (_tag, atom, seed_small, shared_head, m_cols) in zip(
                        tag_strs, tasks
                    )
                ]
            )
            out_schema = pa.schema(
                [("tag", pa.string())] + [(f"c{k}", fact_pa) for k in range(4)]
            )

            def fused_fn(batch: pa.Table) -> pa.Table:
                if batch.num_rows == 0 or batch.num_columns == 0:
                    return out_schema.empty_table()
                blk = pl.from_arrow(batch)
                outs = []
                for ts, atom, seed_small, shared_head, m_cols in ray.get(task_ref):
                    m = match_atom(blk, atom)
                    if m is None:
                        continue
                    if shared_head:
                        m = m.join(seed_small.lazy(), on=shared_head, how="semi")
                    res = m.collect(engine="streaming").unique()
                    if res.height == 0:
                        continue
                    res = res.rename({c: f"c{k}" for k, c in enumerate(m_cols)})
                    res = res.with_columns(
                        [pl.lit(ts).alias("tag")]
                        + [
                            pl.lit(None).cast(fact_dtype).alias(f"c{k}")
                            for k in range(len(m_cols), 4)
                        ]
                    ).select(["tag", "c0", "c1", "c2", "c3"])
                    outs.append(res)
                if not outs:
                    return out_schema.empty_table()
                return polars_to_arrow_string(pl.concat(outs)).cast(out_schema)

            _p0 = time.monotonic()
            per_tag: Dict[str, List[pa.Table]] = {ts: [] for ts in tag_strs}
            totals: Dict[str, int] = {ts: 0 for ts in tag_strs}
            for b in (
                scan.map_batches(fused_fn, batch_format="pyarrow", zero_copy_batch=True)
                .iter_batches(batch_size=None, batch_format="pyarrow")
            ):
                if b.num_rows == 0 or b.num_columns == 0:
                    continue
                blk = pl.from_arrow(b)
                for ts, sub in blk.group_by("tag"):
                    key = ts[0] if isinstance(ts, tuple) else ts
                    per_tag[key].append(sub.drop("tag"))
                    totals[key] += sub.height
                    if totals[key] > bound * 4:
                        return None  # overflow → caller falls back
            RETRACT_PHASES["probe_passes"] = RETRACT_PHASES.get("probe_passes", 0) + 1
            RETRACT_PHASES["probe_pass_sec"] = RETRACT_PHASES.get(
                "probe_pass_sec", 0.0
            ) + (time.monotonic() - _p0)
            for ts, (_tag, atom, _s, _sh, m_cols) in zip(tag_strs, tasks):
                parts = per_tag[ts]
                if parts:
                    frame = (
                        pl.concat(parts)
                        .select([f"c{k}" for k in range(len(m_cols))])
                        .rename({f"c{k}": c for k, c in enumerate(m_cols)})
                        .unique()
                    )
                else:
                    frame = pl.DataFrame(schema={c: fact_dtype for c in m_cols})
                if frame.height > bound:
                    return None
                probe_frames[_tag] = frame

    # ---- chain execution: identical join semantics either way; fused
    # chains read their pre-fetched frames, others probe live ----
    for ci, ch in enumerate(chains):
        plan = ch["plan"]
        bindings = ch["bindings"]
        bound_cols = list(ch["bound_cols"])
        ok = True
        for atom_i in ch["order"]:
            atom = plan.body[atom_i]
            m_cols = [vcol(i) for i in atom.var_indices]
            if not m_cols:
                if not atom_present(atom):
                    ok = False
                    break
                continue
            shared = [c for c in m_cols if c in bound_cols]
            if (ci, atom_i) in probe_frames:
                matched = probe_frames[(ci, atom_i)]
            else:
                seed_small = (
                    bindings.select(shared).unique()
                    if (bindings is not None and shared)
                    else None
                )
                matched = probe_atom(atom, seed_small, shared)
                if matched is None:
                    return None  # overflow → caller falls back
            probe_rows += matched.height
            if matched.height == 0:
                ok = False
                break
            if bindings is None:
                bindings = matched
            elif shared:
                bindings = bindings.join(matched, on=shared, how="inner")
            else:
                bindings = bindings.join(matched, how="cross")
            if bindings.height == 0:
                ok = False
                break
            if bindings.height > bound:
                return None
            bound_cols = bound_cols + [c for c in m_cols if c not in bound_cols]
        if not ok:
            continue
        if bindings is None:
            bindings = pl.DataFrame({"__one": [1]})
        heads = project_heads(plan, bindings.lazy(), True, fact_dtype).collect(
            engine="streaming"
        )
        if heads.height:
            heads_out.append(heads)

    empty = pl.DataFrame(
        schema={**{c: fact_dtype for c in FACT_COLS}, "lkey": pl.Utf8}
    )
    if not heads_out:
        return empty, probe_rows
    # only deleted facts can be absent from the store; first-wins lkey
    new = pl.concat(heads_out).join(del_keys, on=FACT_COLS, how="semi")
    if new.height == 0:
        return empty, probe_rows
    new = new.group_by(FACT_COLS).agg(pl.col("lkey").min())
    # insert-if-absent (one broadcast probe scan): a crashed prior
    # attempt may have committed some of these already — keeps the
    # resumed tail idempotent
    from .eval_hybrid import anti_probe

    new = anti_probe(new, store_ds)
    return new.select([*FACT_COLS, "lkey"]), probe_rows


def _retract_finish(
    store,
    deleted: pl.DataFrame,
    rules: Sequence[Rule],
    plans,
    store_path: str,
    lineage_dir: str,
    *,
    dict_encode: bool,
    fact_dtype,
    broadcast_rows: int,
    num_partitions: int,
    salt_factor: int,
    max_iterations: int,
    compact_every: Optional[int],
    resuming: bool,
    affected_gens: Optional[List[int]] = None,
    lineage_df: Optional[pl.DataFrame] = None,
    rederive_bound: Optional[int] = None,
    tombstone_rows: int = 2_000_000,
    verified_heads: Optional[pl.DataFrame] = None,
):
    """The destructive tail of :func:`remove_premises_store` — every
    step is idempotent so a crashed attempt re-runs safely under the
    pending marker: ``delete_facts`` is a no-op for already-absent
    facts, the lineage filter drops only rows whose head is deleted,
    the rederive round inserts-if-absent, and the resumed fixpoint
    continues from wherever the last attempt stopped.  ``resuming``
    forces the full tail even when nothing is left to delete (the
    prior attempt may have crashed after the delete but before the
    rederive)."""
    import ray.data

    from .eval_hybrid import run_iteration_hybrid
    from .eval_shuffle import IncrementalMatches, collect_to_polars, run_iteration_core

    # delete regime: above the driver-rewrite bound the physical rewrite
    # of the affected generations would cost a full store's worth of
    # writes per retraction — switch to LSM tombstones (writes scale
    # with the deleted cone; compaction folds them in later)
    _t0 = time.monotonic()
    lsm = store.count() > tombstone_rows
    # overdeletion heads are live facts by construction (each heads a
    # live lineage row, and lineage filtering is tombstone-synced with
    # the fact store), so the tombstone path skips their presence probe
    # and verifies only the user-supplied premise rows — against the
    # PREMISE generations alone.  A retraction thus never reads the
    # derived closure to delete from it (the resume path, which lost
    # the premise/head split with the pending marker, probes the full
    # store as before).
    res = store.delete_facts(
        deleted,
        mode="tombstone" if lsm else "rewrite",
        verified_df=verified_heads,
        probe_premise_only=verified_heads is not None,
    )
    RETRACT_PHASES["delete_facts_sec"] = time.monotonic() - _t0
    if res["deleted"] == 0 and not resuming:
        return store
    _t0 = time.monotonic()
    _filter_lineage_dirs(
        lineage_dir,
        deleted,
        affected_gens=affected_gens,
        lineage_df=lineage_df,
        mode="tombstone" if lsm else "rewrite",
    )
    RETRACT_PHASES["lineage_filter_sec"] = time.monotonic() - _t0

    # rederive: head-constrained when the store is big (cost tracks the
    # deleted cone); a plain driver round when the whole store is small
    fact_pa = pa.int64() if dict_encode else pa.string()
    pin_schema = pa.schema([(c, fact_pa) for c in FACT_COLS]).append(
        pa.field("lkey", pa.string())
    )
    last_meta = store.generations[-1].get("metrics", {})
    start_round = last_meta.get("round", len(store.generations) - 1) + 1
    remaining = store.count()
    new = None
    rederive_extra: Dict[str, Any] = {"round": start_round, "evaluator": "rederive"}
    if remaining == 0:
        return store
    _t0 = time.monotonic()
    if remaining <= broadcast_rows:
        inc = IncrementalMatches(plans, broadcast_rows)
        full_df = collect_to_polars(store.dataset())
        if full_df.width == 0:
            full_df = pl.DataFrame(schema={c: fact_dtype for c in FACT_COLS})
        full_df = full_df.select(FACT_COLS)
        inc.advance_small(full_df)
        new = run_iteration_hybrid(
            full_df,
            plans,
            inc,
            lambda: store.dataset().materialize(),
            full_small=full_df,
            with_lineage=True,
            broadcast_rows=broadcast_rows,
            num_partitions=num_partitions,
            salt_factor=salt_factor,
            pin_schema=pin_schema,
            fact_dtype=fact_dtype,
        )
    else:
        seeded = _seeded_rederive(
            store,
            deleted,
            plans,
            fact_dtype,
            bound=(
                rederive_bound
                if rederive_bound is not None
                else max(broadcast_rows, deleted.height * 4)
            ),
        )
        if seeded is not None:
            new, probe_rows = seeded
            rederive_extra["rederive"] = "seeded"
            rederive_extra["rederive_probe_rows"] = int(probe_rows)
            # observable scale metric: rows shipped back by the seeded
            # probes vs rows in the remaining store — a healthy skewed
            # retraction shows probe_rows ≪ store_rows (no full-store pin)
            rederive_extra["rederive_store_rows"] = int(remaining)
        else:
            # fallback: the full-remainder semi-naive DRed round
            inc = IncrementalMatches(plans, broadcast_rows)
            full_ds = store.dataset().materialize()
            empty_ds = ray.data.from_arrow(store.quad_schema().empty_table())
            inc.advance(full_ds)
            rederive_extra["rederive"] = "full-remainder"
            new = run_iteration_core(
                full_ds,
                empty_ds,
                full_ds,
                plans,
                with_lineage=True,
                num_partitions=num_partitions,
                salt_factor=salt_factor,
                pin_schema=pin_schema,
                match_cache=inc.cache(),
            )
    RETRACT_PHASES["rederive_sec"] = time.monotonic() - _t0
    import shutil

    _t0 = time.monotonic()
    if isinstance(new, pl.DataFrame) and new.height:
        gen = store.next_gen
        d = os.path.join(lineage_dir, f"gen={gen:05d}")
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
        new.select([*FACT_COLS, "lkey"]).write_parquet(os.path.join(d, "lineage.parquet"))
        store.add_small(new.select(FACT_COLS), extra=rederive_extra)
    elif new is not None and not isinstance(new, pl.DataFrame):
        cnt = new.count()
        if cnt:
            gen = store.next_gen
            d = os.path.join(lineage_dir, f"gen={gen:05d}")
            shutil.rmtree(d, ignore_errors=True)
            new.write_parquet(d)
            store.add(
                new.select_columns(FACT_COLS),
                precleaned=True,
                extra=rederive_extra,
            )
        else:
            new = None
    RETRACT_PHASES["rederive_commit_sec"] = time.monotonic() - _t0
    if new is None or (isinstance(new, pl.DataFrame) and new.height == 0):
        if not resuming:
            # nothing rederived and nothing was in flight: the remainder
            # of a complete closure minus a deleted cone is still closed
            return store
        # resuming: the crashed attempt may have committed a rederive
        # generation and died mid-propagation — fall through to the
        # resumed fixpoint (cheap no-op when already complete)

    # propagate: resumed fixpoint continues from the rederived delta
    _t0 = time.monotonic()
    try:
        return infer_store(
            ray.data.from_arrow(store.quad_schema().empty_table()),
            rules,
            store_path,
            num_partitions=num_partitions,
            salt_factor=salt_factor,
            max_iterations=max_iterations,
            resume=True,
            with_lineage=True,
            broadcast_rows=broadcast_rows,
            dict_encode=dict_encode,
            compact_every=compact_every,
        )
    finally:
        RETRACT_PHASES["resume_fixpoint_sec"] = time.monotonic() - _t0


def _walk_lineage_generations(
    lineage_dir: str,
    goals: set,
    walk_rules: Sequence[Rule],
    inst_cast,
    dict_encode: bool,
) -> Tuple[Dict[Tuple, Tuple[int, Tuple]], List[Tuple[int, int]]]:
    """Backward lineage walk over per-generation lineage parquet, one
    newest→oldest pass (``recall_proof``'s arguments map,
    ``src/prove.rs:142-147``; generation pruning is ours — rounds are
    monotone, so a quad's parents always live in an earlier generation).

    Returns (arguments, scan_log) where scan_log records
    ``(generation, files_scanned)`` for each generation actually probed
    — generations skipped by early exit never appear."""
    import ray
    import ray.data

    from .util import polars_to_arrow_string

    arguments: Dict[Tuple, Tuple[int, Tuple]] = {}
    scan_log: List[Tuple[int, int]] = []
    if not os.path.isdir(lineage_dir):
        return arguments, scan_log
    gen_dirs = sorted(
        (
            d
            for d in os.listdir(lineage_dir)
            if d.startswith("gen=") and not d.endswith((".new", ".old"))
        ),
        reverse=True,
    )
    frontier = set(goals)
    seen = set(goals)
    fact_dtype_w = pl.Int64 if dict_encode else pl.Utf8
    tomb_w = _lineage_tombstone_frame(lineage_dir, fact_dtype_w)
    # small-lineage fast path: below the bound each generation is read
    # ONCE with driver polars (cached for merged loop-scans) instead of
    # paying a full Ray pass per generation — a deep-but-small proof
    # chain otherwise spends ~1 s of fixed job overhead per round
    driver_small = _lineage_row_count(lineage_dir) <= 2_000_000
    _gen_cache: Dict[str, pl.DataFrame] = {}

    def scan_dir(files, frontier, gen_no) -> bool:
        """One probe pass of this generation's files against the current
        frontier; returns whether any new quad resolved."""
        fact_pa = pa.int64() if dict_encode else pa.string()
        ftab = pa.table(
            {
                c: pa.array([q[j] for q in frontier], fact_pa)
                for j, c in enumerate(FACT_COLS)
            }
        )

        # tombstoned heads at this generation never resolve (their
        # recorded derivation was retracted; a rederived head's lineage
        # lives in a newer generation above every part's max_gen)
        tomb_here = (
            set(
                map(
                    tuple,
                    tomb_w.filter(pl.col("_mg") >= gen_no)
                    .select(FACT_COLS)
                    .iter_rows(),
                )
            )
            if tomb_w is not None
            else None
        )

        if driver_small:
            key = files[0]
            if key not in _gen_cache:
                _gen_cache[key] = pl.concat([pl.read_parquet(f) for f in files])
            hits_df = _gen_cache[key].join(
                pl.from_arrow(ftab), on=FACT_COLS, how="semi"
            )
            batches = [polars_to_arrow_string(hits_df)] if hits_df.height else []
        else:
            fref = ray.put(pl.from_arrow(ftab))

            def probe(batch: pa.Table, _ref=fref) -> pa.Table:
                blk = pl.from_arrow(batch)
                hits = blk.join(ray.get(_ref), on=FACT_COLS, how="semi")
                return polars_to_arrow_string(hits)

            batches = ray.data.read_parquet(files).map_batches(
                probe, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_size=None, batch_format="pyarrow")
        resolved_any = False
        for b in batches:
            if b.num_rows == 0 or b.num_columns == 0:
                continue
            for s, p, o, g, lkey in zip(
                b["s"].to_pylist(),
                b["p"].to_pylist(),
                b["o"].to_pylist(),
                b["g"].to_pylist(),
                b["lkey"].to_pylist(),
            ):
                q = (s, p, o, g)
                if q in arguments:
                    continue
                if tomb_here and q in tomb_here:
                    continue
                resolved_any = True
                frontier.discard(q)
                ri, inst = decode_lkey(lkey)
                inst = tuple(inst_cast(x) for x in inst)
                arguments[q] = (ri, inst)
                rule = walk_rules[ri]
                binding = dict(zip(rule.canonical_unbound(), inst))
                for atom in rule.if_all:
                    sub = tuple(
                        binding[e.value] if e.is_unbound() else e.value for e in atom
                    )
                    if sub not in seen:
                        seen.add(sub)
                        frontier.add(sub)
        return resolved_any

    for gd in gen_dirs:
        if not frontier:
            break
        gen_no = int(gd.split("=")[1])
        d = os.path.join(lineage_dir, gd)
        files = sorted(
            os.path.join(root, n)
            for root, _dirs, names in os.walk(d)
            for n in names
            if n.endswith(".parquet")
        )
        if not files:
            continue
        # a MERGED generation (compact_lineage) holds rows from several
        # rounds, so a quad's parents may live in the same directory —
        # loop-scan it until a pass resolves nothing new; unmerged
        # generations keep the single newest→oldest pass
        merged = os.path.exists(os.path.join(d, _MERGED_MARKER))
        while True:
            scan_log.append((gen_no, len(files)))
            resolved = scan_dir(files, frontier, gen_no)
            if not (merged and resolved and frontier):
                break
    return arguments, scan_log


def prove_store(
    premises_ds,
    to_prove: Sequence[Fact],
    rules: Sequence[Rule],
    store_path: str,
    *,
    num_partitions: int = 32,
    salt_factor: int = 1,
    dict_encode: bool = True,
    broadcast_rows: int = 500_000,
) -> List[RuleApplication]:
    """Store-resident proof search — prove over data that never lands on
    the driver.  Lineage lives as per-generation parquet; after the
    early-exit fixpoint, the proof is extracted by a backward BFS of
    broadcast probe scans of the lineage, then replayed exactly like
    :func:`prove` (``recall_proof``, ``src/prove.rs:171-210``).

    ``dict_encode`` (default) runs the fixpoint AND the lineage walk over
    64-bit term ids — proofs over big premise sets skip the string-join
    tax — and translates the returned instantiations back to terms via
    the store's persisted dictionary.

    Raises :class:`NovelName` / :class:`ExhaustedSearchSpace` like the
    reference.  Non-string terms (the reference is generic over ``Ord``,
    ``src/infer.rs:9`` — e.g. its u32-term tests) go through the same
    JSON term boundary as :func:`infer`/:func:`prove`: premises are
    encoded by a vectorized ``map_batches`` pass, goals/rules on the
    driver, and returned instantiations are decoded back.
    """
    import ray.data

    if isinstance(premises_ds, pa.Table):
        premises_ds = ray.data.from_arrow(premises_ds)
    rules = list(rules)
    needs_term_encode = any(
        not (pa.types.is_string(f.type) or pa.types.is_large_string(f.type))
        for f in premises_ds.schema().base_schema
        if f.name in FACT_COLS
    ) or any(
        isinstance(t, str) and t.startswith(_JSON_PREFIX) for f in to_prove for t in f
    )
    if needs_term_encode:
        premises_ds = premises_ds.map_batches(
            _encode_terms_batch_fn(), batch_format="pyarrow", zero_copy_batch=True
        )
        rules = [_encode_rule(r) for r in rules]
        goals = [tuple(encode_term(t) for t in f) for f in to_prove]
    else:
        goals = [tuple(f) for f in to_prove]
    goal_tbl = pa.table(
        {c: pa.array([g[j] for g in goals], pa.string()) for j, c in enumerate(FACT_COLS)}
    )

    # NovelName pre-check (src/prove.rs:68-72): every goal term must
    # occur in premises ∪ rule constants; one streaming pass over the
    # premises, no full-term materialization
    rule_consts = set()
    for plan in compile_rules(rules):
        rule_consts.update(plan.bound_constants())
    need = {t for g in goals for t in g} - rule_consts
    if need:
        need_arr = pa.array(sorted(need), pa.string())

        def found_terms(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            hits = []
            for c in FACT_COLS:
                col = batch[c]
                mask = pc.is_in(col, value_set=need_arr)
                hits.append(col.filter(mask))
            merged = pa.concat_arrays(
                [h.combine_chunks() if isinstance(h, pa.ChunkedArray) else h for h in hits]
            )
            return pa.table({"term": pc.unique(merged)})

        found = set()
        for b in (
            premises_ds.map_batches(found_terms, batch_format="pyarrow", zero_copy_batch=True)
            .iter_batches(batch_size=None, batch_format="pyarrow")
        ):
            found.update(b["term"].to_pylist())
        missing = need - found
        if missing:
            raise NovelName(
                f"goal term(s) {sorted(missing)[:3]!r} absent from premises and rules"
            )

    store, reached = infer_store(
        premises_ds,
        rules,
        store_path,
        num_partitions=num_partitions,
        salt_factor=salt_factor,
        with_lineage=True,
        goals=goal_tbl,
        dict_encode=dict_encode,
        broadcast_rows=broadcast_rows,
    )
    if not reached:
        raise ExhaustedSearchSpace("goal not derivable from premises under rules")

    # the store (and its lineage) speaks term ids when dict-encoded: walk
    # the lineage in the encoded domain — the hash encoder is
    # deterministic, so goals/rules re-encode here independently — and
    # translate instantiations back to terms at the very end
    if dict_encode:
        walk_rules = _encode_rules_hash(rules)
        term_univ = sorted({t for g in goals for t in g})
        goal_enc = dict(zip(term_univ, hash_term_ids(term_univ)))
        goals = [tuple(goal_enc[t] for t in g) for g in goals]
        inst_cast = int  # lkey instantiations parse back to ids
    else:
        walk_rules = rules
        inst_cast = str

    # backward lineage extraction: every derived quad appears in exactly
    # one lineage generation and its rule-body parents were derived in
    # strictly EARLIER generations (semi-naive rounds), so one
    # newest→oldest sweep resolves everything — each generation is
    # scanned at most once (vs a per-BFS-level scan of ALL generations),
    # with early exit once the frontier is fully resolved (remaining
    # frontier quads are premises, which carry no lineage).
    arguments, scan_log = _walk_lineage_generations(
        os.path.join(store_path, "lineage"),
        set(goals),
        walk_rules,
        inst_cast,
        dict_encode,
    )
    store.last_lineage_scan = scan_log  # per-gen (gen, n_files) diagnostics

    out: List[RuleApplication] = []
    for goal in goals:
        _recall_proof(tuple(goal), arguments, walk_rules, out)
    if dict_encode and out:
        # translate instantiation ids back to terms via the persisted
        # dictionary (only the ids the proof actually uses are fetched)
        import pyarrow.parquet as pq

        need_ids = sorted({t for a in out for t in a.instantiations})
        files = sorted(
            os.path.join(store.terms_dir, n)
            for n in os.listdir(store.terms_dir)
            if n.endswith(".parquet")
        )
        tid_to_term: Dict[int, str] = {}
        for f in files:
            t = pq.read_table(f, filters=[("tid", "in", need_ids)])
            tid_to_term.update(zip(t["tid"].to_pylist(), t["term"].to_pylist()))
        out = [
            RuleApplication(a.rule_index, tuple(tid_to_term[t] for t in a.instantiations))
            for a in out
        ]
    if needs_term_encode:
        out = [
            RuleApplication(a.rule_index, tuple(decode_term(t) for t in a.instantiations))
            for a in out
        ]
    return out


def prove(
    premises: QuadsLike,
    to_prove: Sequence[Fact],
    rules: Sequence[Rule],
    *,
    mode: str = "auto",
    broadcast_threshold: int = DEFAULT_BROADCAST_THRESHOLD,
    num_partitions: int = 32,
    dict_encode: bool = True,
) -> List[RuleApplication]:
    """Distributed proof search (``src/prove.rs:58-165``): fixpoint with
    first-wins lineage and early exit once all goals are derived, then a
    driver-side lineage walk (``recall_proof``, ``src/prove.rs:171-210``).

    ``dict_encode`` (default) lowers terms to Translator int ids for the
    fixpoint and lineage — proofs over big premise sets pay int-join
    costs, not string-join costs, exactly like :func:`infer`; the
    returned instantiations are translated back to user terms.

    Raises :class:`NovelName` / :class:`ExhaustedSearchSpace` like the
    reference.  Proofs are returned in user terms and always re-checkable
    via :func:`validate`.
    """
    df, encoded = _to_polars(premises)
    eng_rules = [_encode_rule(r) for r in rules] if encoded else list(rules)

    enc = encode_term if encoded else (lambda t: t)
    goals = [tuple(enc(t) for t in f) for f in to_prove]

    # NovelName pre-check: every goal term must occur in premises ∪ rule
    # constants (src/prove.rs:68-72)
    universe = set()
    for c in FACT_COLS:
        universe.update(df[c].to_list())
    for plan in compile_rules(eng_rules):
        universe.update(plan.bound_constants())
    for f, orig in zip(goals, to_prove):
        for t in f:
            if t not in universe:
                raise NovelName(f"goal {orig!r} uses a term absent from premises and rules")

    terms = None
    if dict_encode:
        terms = _build_terms_df(df, eng_rules)
        df = _encode_quads_df(df, terms)
        eng_rules = _encode_rules_ids(eng_rules, terms)
        term_to_tid = dict(zip(terms["term"].to_list(), terms["tid"].to_list()))
        goals = [tuple(term_to_tid[t] for t in f) for f in goals]
        fact_dtype = pl.Int64
    else:
        fact_dtype = pl.Utf8

    goals_df = pl.DataFrame(
        {c: [f[j] for f in goals] for j, c in enumerate(FACT_COLS)},
        schema={c: fact_dtype for c in FACT_COLS},
    )
    fp = Fixpoint(
        eng_rules,
        mode=mode,
        broadcast_threshold=broadcast_threshold,
        num_partitions=num_partitions,
    )
    res = fp.run(df, with_lineage=True, goals=goals_df)
    if not res.goals_reached:
        raise ExhaustedSearchSpace("goal not derivable from premises under rules")

    arguments = res.arguments()
    if dict_encode:
        # lkey instantiations are stringified ids — back to Int64 so they
        # key against the encoded fact quads
        arguments = {
            q: (ri, tuple(int(x) for x in inst)) for q, (ri, inst) in arguments.items()
        }
    # premises never carry lineage (they are assumed, src/prove.rs:171-210)
    premise_set = set(map(tuple, df.select(FACT_COLS).iter_rows()))
    for q in premise_set:
        arguments.pop(q, None)

    out: List[RuleApplication] = []
    for goal in goals:
        _recall_proof(tuple(goal), arguments, eng_rules, out)
    if dict_encode:
        tid_to_term = dict(zip(terms["tid"].to_list(), terms["term"].to_list()))
        out = [
            RuleApplication(a.rule_index, tuple(tid_to_term[t] for t in a.instantiations))
            for a in out
        ]
    if encoded:
        out = [
            RuleApplication(a.rule_index, tuple(decode_term(t) for t in a.instantiations))
            for a in out
        ]
    return out


def _recall_proof(
    goal: Tuple[str, str, str, str],
    arguments: Dict[Tuple[str, str, str, str], Tuple[int, Tuple[str, ...]]],
    rules: Sequence[Rule],
    out: List[RuleApplication],
) -> None:
    """Post-order lineage walk; each argument consumed at most once
    (``src/prove.rs:171-210``).  Iterative (explicit stack): proof chains
    can be deeper than Python's recursion limit — e.g. a transitive
    closure over a chain of thousands of nodes on the store path."""
    stack: List[Tuple[Any, bool]] = [(goal, False)]
    while stack:
        node, emit = stack.pop()
        if emit:
            rule_index, inst = node
            out.append(RuleApplication(rule_index, tuple(inst)))
            continue
        app = arguments.pop(node, None)
        if app is None:
            continue  # premise — assumed
        rule_index, inst = app
        rule = rules[rule_index]
        binding = dict(zip(rule.canonical_unbound(), inst))
        # post-order: children first (in body order), then this application
        stack.append(((rule_index, inst), True))
        for atom in reversed(rule.if_all):
            sub = tuple(binding[e.value] if e.is_unbound() else e.value for e in atom)
            stack.append((sub, False))


def validate(rules: Sequence[Rule], proof: Sequence[RuleApplication]) -> Valid:
    """Order-sensitive sequential proof replay — identical semantics to
    the reference (``src/validate.rs:61-82``); proofs are tiny, so this
    runs on the driver (SURVEY.md §2.1 #17)."""
    return _local.validate(rules, proof)


def validate_many(
    rules: Sequence[Rule], proofs: Sequence[Sequence[RuleApplication]]
) -> List[Valid]:
    """Validate many independent proofs in parallel (one Ray task per
    chunk of proofs); each proof itself stays a sequential fold."""
    import ray

    rules = list(rules)

    @ray.remote
    def _chunk(ps: List[List[RuleApplication]]) -> List[Valid]:
        return [_local.validate(rules, p) for p in ps]

    if len(proofs) < 8:
        return [_local.validate(rules, p) for p in proofs]
    n = max(1, len(proofs) // 32)
    chunks = [list(proofs[i : i + n]) for i in range(0, len(proofs), n)]
    parts = ray.get([_chunk.remote(c) for c in chunks])
    return [v for part in parts for v in part]
