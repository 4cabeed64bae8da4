"""Shuffle evaluator: one fixpoint iteration as Ray Data hash-join
exchanges.

This is the scale path of the engine (SURVEY.md §2.1 #6-#8): every
rule-body atom becomes a filtered/projected ``map_batches`` over the
fact Dataset (zero-copy Arrow), and every chain step is a
``Dataset.join`` hash shuffle keyed on the variables shared with the
already-joined prefix — the distributed analogue of the reference's
16-way permutation-index dispatch (``/root/reference/src/reasoner.rs:202-227``).
Dedup is a ``groupby(s,p,o,g)`` aggregate; insert-if-absent is a
``left_anti`` join against the full store
(``Reasoner::insert``, ``src/reasoner.rs:103-127``).

The driver (:mod:`rify_ray.engine`) hands this evaluator the per-round
delta and full sets; blocks never round-trip through Python rows — all
per-batch work is pyarrow.compute kernels.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

from .eval_broadcast import FACT_COLS, LKEY_SEP
from .plan import SLOTS, AtomPlan, ChainPlan, RulePlan, vcol
from .util import drop_empty_blocks as _drop_empty_blocks
from .util import ensure_schema_fn as _ensure_schema
from .util import polars_to_arrow_string as _to_arrow_string
from .util import string_schema


def _ensure_schema_fn(cols: Sequence[str]) -> Callable[[pa.Table], pa.Table]:
    return _ensure_schema(string_schema(cols))


def _match_batch_fn(atom: AtomPlan) -> Callable[[pa.Table], pa.Table]:
    """Vectorized filter+project for one body atom (constant equality +
    intra-atom variable equality — ``can_match``, src/reasoner.rs:266-274)."""
    const_filters = atom.const_filters
    var_slots = atom.var_slots
    var_indices = atom.var_indices

    def fn(batch: pa.Table) -> pa.Table:
        mask = None
        for col, val in const_filters:
            m = pc.equal(batch[col], pa.scalar(val))
            mask = m if mask is None else pc.and_(mask, m)
        first_col = {}
        for col, vi in var_slots:
            if vi in first_col:
                m = pc.equal(batch[col], batch[first_col[vi]])
                mask = m if mask is None else pc.and_(mask, m)
            else:
                first_col[vi] = col
        if mask is not None:
            batch = batch.filter(mask)
        if not var_indices:
            # all-constant atom: presence probe (a zero-column table
            # would silently drop its row count)
            return pa.table({"__one": pa.array([1] * batch.num_rows, pa.int32())})
        arrays = [batch[first_col[vi]] for vi in var_indices]
        names = [vcol(vi) for vi in var_indices]
        return pa.table(arrays, names=names)

    return fn


def _head_batch_fn(plan: RulePlan, with_lineage: bool) -> Callable[[pa.Table], pa.Table]:
    head = plan.head
    n_vars = plan.n_vars
    rule_prefix = f"{plan.index:06d}"

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        tables = []
        lkey = None
        if with_lineage:
            parts: List = [pa.array([rule_prefix] * n, pa.string())]
            for i in range(n_vars):
                parts.append(pc.cast(batch[vcol(i)], pa.string()))
            if len(parts) > 1:
                lkey = pc.binary_join_element_wise(*parts, LKEY_SEP)
            else:
                lkey = parts[0]
        for atom in head:
            arrays, names = [], []
            for j, (kind, v) in enumerate(atom.slots):
                if kind == "const":
                    ctype = pa.string() if isinstance(v, str) else pa.int64()
                    arrays.append(pa.array([v] * n, ctype))
                else:
                    arrays.append(
                        batch[vcol(v)].combine_chunks()
                        if isinstance(batch[vcol(v)], pa.ChunkedArray)
                        else batch[vcol(v)]
                    )
                names.append(SLOTS[j])
            if with_lineage:
                arrays.append(lkey)
                names.append("lkey")
            tables.append(pa.table(arrays, names=names))
        return pa.concat_tables(tables) if len(tables) > 1 else tables[0]

    return fn


def _salt_probe_fn(cols: Sequence[str], salt_factor: int):
    """Deterministic per-row salt on the probe (bindings) side: hot join
    keys spread over ``salt_factor`` partitions instead of landing on
    one aggregator (skew mitigation — SURVEY.md §7.3; the canonical hot
    key is a popular predicate/node like ``ancestor``).  Vectorized
    shared kernel — no per-row Python hashing on the shuffle path."""
    from .util import hash_rows_mod_fn

    return hash_rows_mod_fn(cols, salt_factor, "__salt")


def _replicate_build_fn(salt_factor: int):
    """Replicate the build (store-match) side once per salt value."""

    def fn(batch: pa.Table) -> pa.Table:
        parts = []
        for s in range(salt_factor):
            parts.append(
                batch.append_column(
                    "__salt", pa.array([s] * batch.num_rows, pa.int32())
                )
            )
        return pa.concat_tables(parts)

    return fn


def run_iteration_ds(
    delta: pl.DataFrame,
    full: pl.DataFrame,
    plans: Sequence[RulePlan],
    with_lineage: bool = False,
    num_partitions: int = 32,
    full_old: "pl.DataFrame" = None,
    salt_factor: int = 1,
) -> pl.DataFrame:
    """One semi-naive round executed as Ray Data shuffles.

    The driver currently materializes the per-round result back to the
    driver (rounds are checkpointed to Parquet anyway); the joins,
    groupby-dedup and anti-join — the O(data) exchanges — all run
    distributed.
    """
    import polars as _pl
    import ray.data

    fact_dtype = full.schema["s"] if full.width else _pl.Utf8
    pa_fact = pa.int64() if fact_dtype in (_pl.Int64, _pl.UInt32, _pl.Int32) else pa.string()
    out_schema = {c: fact_dtype for c in FACT_COLS}
    pin_schema = pa.schema([(c, pa_fact) for c in FACT_COLS])
    if with_lineage:
        out_schema["lkey"] = _pl.Utf8
        pin_schema = pin_schema.append(pa.field("lkey", pa.string()))

    delta_ds = ray.data.from_arrow(_to_arrow_string(delta.select(FACT_COLS))).materialize()
    full_ds = ray.data.from_arrow(_to_arrow_string(full.select(FACT_COLS))).materialize()
    if full_old is None:
        full_old_ds = full_ds
    else:
        full_old_ds = ray.data.from_arrow(
            _to_arrow_string(full_old.select(FACT_COLS))
        ).materialize()

    new = run_iteration_core(
        delta_ds,
        full_old_ds,
        full_ds,
        plans,
        with_lineage=with_lineage,
        num_partitions=num_partitions,
        salt_factor=salt_factor,
        pin_schema=pin_schema,
    )
    if new is None:
        return pl.DataFrame(schema=out_schema)
    cols = [*FACT_COLS, "lkey"] if with_lineage else FACT_COLS
    batches = list(new.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not batches:
        return pl.DataFrame(schema=out_schema)
    out_df = pl.from_arrow(pa.concat_tables(batches))
    if out_df.height == 0:
        return pl.DataFrame(schema=out_schema)
    return out_df.select(cols).cast(out_schema)


def shuffle_join(
    bindings_ds,
    m_ds,
    shared,
    num_partitions: int,
    salt_factor: int = 1,
    probe_salt_cols=None,
):
    """One hash-shuffle inner join of a bindings Dataset against a match
    Dataset on the ``shared`` variable columns, with optional probe-side
    salting (build side replicated per salt).  ``probe_salt_cols``
    (default: all probe columns the caller has bound) must include more
    than the join key so rows sharing a hot key actually spread.
    Returns the materialized, empty-block-cleaned result or None when
    empty."""
    shared = list(shared)
    if not shared:
        # cross join: constant key on both sides (degenerate; only for
        # rules whose atoms share no variables)
        add_key = lambda b: b.append_column("__ck", pa.array([0] * b.num_rows, pa.int32()))
        out = bindings_ds.map_batches(add_key, batch_format="pyarrow").join(
            m_ds.map_batches(add_key, batch_format="pyarrow").materialize(),
            "inner",
            num_partitions=num_partitions,
            on=("__ck",),
        ).drop_columns(["__ck"]).materialize()
        return _drop_empty_blocks(out)
    if salt_factor > 1:
        bindings_ds = bindings_ds.map_batches(
            _salt_probe_fn(probe_salt_cols or shared, salt_factor),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        m_ds = m_ds.map_batches(
            _replicate_build_fn(salt_factor),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        out = bindings_ds.join(
            m_ds,
            "inner",
            num_partitions=num_partitions,
            on=tuple([*shared, "__salt"]),
        ).drop_columns(["__salt"]).materialize()
    else:
        out = bindings_ds.join(
            m_ds, "inner", num_partitions=num_partitions, on=tuple(shared)
        ).materialize()
    return _drop_empty_blocks(out)


def dedup_anti_ds(new, full_new_ds, with_lineage: bool, num_partitions: int, pin_schema):
    """Distributed tail of a fixpoint round: first-wins dedup
    (groupby min-lkey) + anti-join against the full store.  Returns the
    materialized new-facts Dataset or None when empty."""
    if with_lineage:
        new = new.groupby(FACT_COLS).min("lkey")
        new = new.rename_columns({"min(lkey)": "lkey"})
    else:
        new = new.groupby(FACT_COLS).count().drop_columns(["count()"])
    new = _drop_empty_blocks(new.materialize())
    if new is None:
        return None
    new = new.map_batches(
        _ensure_schema(pin_schema), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    new = new.join(full_new_ds, "left_anti", num_partitions, on=tuple(FACT_COLS))
    return _drop_empty_blocks(new.materialize())


def run_iteration_core(
    delta_ds,
    full_old_ds,
    full_new_ds,
    plans: Sequence[RulePlan],
    *,
    with_lineage: bool = False,
    num_partitions: int = 32,
    salt_factor: int = 1,
    pin_schema: Optional[pa.Schema] = None,
    match_cache: Optional[dict] = None,
):
    """Dataset-in / Dataset-out semi-naive round — the fully
    Dataset-resident variant used by :func:`rify_ray.engine.infer_store`
    (facts never land on the driver).  Returns a materialized Dataset of
    the round's new facts, or None when the round derives nothing.

    ``match_cache`` may be pre-populated (keys ``(side, atom.slots)``
    with side in delta/old/new) by an incremental maintainer — see
    :class:`IncrementalMatches` — so a round never rescans the full
    store."""
    if pin_schema is None:
        pin_schema = pa.schema([(c, pa.string()) for c in FACT_COLS])
        if with_lineage:
            pin_schema = pin_schema.append(pa.field("lkey", pa.string()))
    chain_outputs = []
    if match_cache is None:
        match_cache = {}
    for plan in plans:
        if not plan.body:
            continue
        for chain in plan.chains:
            out = _eval_chain_ds(
                delta_ds, full_old_ds, full_new_ds, plan, chain, with_lineage,
                num_partitions, salt_factor, match_cache,
            )
            if out is not None:
                chain_outputs.append(out)
    if not chain_outputs:
        return None

    new = chain_outputs[0]
    if len(chain_outputs) > 1:
        new = new.union(*chain_outputs[1:])

    # dedup (first-wins on lkey) — hash-partition groupby on the quad —
    # then insert-if-absent: anti-join against the full store
    return dedup_anti_ds(new, full_new_ds, with_lineage, num_partitions, pin_schema)


class MatchSide:
    """One side (old/new/delta) of an atom's incremental matches:
    a (lazy-union-of-materialized) Dataset, its exact row count, and —
    when the side is small enough to broadcast — a driver-side polars
    copy (``small``).  ``ds`` is None only when the side is empty."""

    __slots__ = ("ds", "rows", "small")

    def __init__(self, ds, rows: int, small=None):
        self.ds = ds
        self.rows = rows
        self.small = small


class IncrementalMatches:
    """Incremental per-atom match maintenance for the store-resident
    fixpoint: ``M_full(round k) = M_full(k-1) ∪ match(delta_k)``, so
    each round scans ONLY the delta instead of rescanning the whole
    store per atom per round (at web scale that turns O(rounds) full
    scans into one).

    ``advance(delta)`` (Dataset) or ``advance_small(delta)`` (driver
    polars frame — zero Ray executions) must be called once per round
    BEFORE evaluating it; ``cache()`` yields a pre-populated match cache
    for :func:`run_iteration_core`, ``side()`` the richer
    :class:`MatchSide` view for the hybrid evaluator.

    Row counts are maintained incrementally (never a ``count()`` over a
    lazy union), and sides at or below ``broadcast_rows`` additionally
    keep a driver polars copy so small-side joins run without any
    distributed execution at all.
    """

    def __init__(self, plans: Sequence[RulePlan], broadcast_rows: int = 0):
        self.atoms = {}
        for plan in plans:
            for atom in plan.body:
                self.atoms.setdefault(atom.slots, atom)
        self.broadcast_rows = broadcast_rows
        # per atom: matches over the store BEFORE the current delta
        self._m_old = {slots: MatchSide(None, 0) for slots in self.atoms}
        self._m_new = {slots: MatchSide(None, 0) for slots in self.atoms}
        self._delta_m = {slots: MatchSide(None, 0) for slots in self.atoms}

    def _combine(self, slots, dm: MatchSide) -> None:
        old = self._m_new[slots]
        self._delta_m[slots] = dm
        self._m_old[slots] = old
        if dm.rows == 0:
            self._m_new[slots] = old
        elif old.rows == 0:
            self._m_new[slots] = dm
        else:
            small = None
            if (
                old.small is not None
                and dm.small is not None
                and old.rows + dm.rows <= self.broadcast_rows
            ):
                small = pl.concat([old.small, dm.small])
            self._m_new[slots] = MatchSide(old.ds.union(dm.ds), old.rows + dm.rows, small)

    def advance(self, delta_ds) -> None:
        for slots, atom in self.atoms.items():
            dm = delta_ds.map_batches(
                _match_batch_fn(atom), batch_format="pyarrow", zero_copy_batch=True
            ).materialize()
            dm = _drop_empty_blocks(dm)
            if dm is None:
                self._combine(slots, MatchSide(None, 0))
                continue
            rows = dm.count()
            small = None
            if rows <= self.broadcast_rows:
                small = collect_to_polars(dm)
            self._combine(slots, MatchSide(dm, rows, small))

    def advance_small(self, delta_pl: "pl.DataFrame") -> None:
        """Driver-side advance: per-atom matches computed in polars from
        the (small) delta frame; the Dataset view is created with
        ``from_arrow`` (object-store blocks, no execution)."""
        import ray.data

        from .eval_broadcast import match_atom

        for slots, atom in self.atoms.items():
            if not atom.var_indices:
                # presence probe: rows matched matter, columns don't
                m = match_atom(delta_pl, atom)
                rows = 0 if m is None else int(m.select(pl.len()).collect().item())
                if rows == 0:
                    self._combine(slots, MatchSide(None, 0))
                else:
                    one = pl.DataFrame({"__one": [1] * 1})
                    self._combine(
                        slots,
                        MatchSide(ray.data.from_arrow(one.to_arrow()), rows, one),
                    )
                continue
            m = match_atom(delta_pl, atom)
            mdf = m.collect() if m is not None else None
            if mdf is None or mdf.height == 0:
                self._combine(slots, MatchSide(None, 0))
                continue
            ds = ray.data.from_arrow(_to_arrow_string(mdf))
            self._combine(slots, MatchSide(ds, mdf.height, mdf))

    def side(self, which: str, slots) -> MatchSide:
        return {"delta": self._delta_m, "old": self._m_old, "new": self._m_new}[which][slots]

    def cache(self) -> dict:
        out = {}
        for slots in self.atoms:
            out[("delta", slots)] = self._delta_m[slots].ds
            out[("old", slots)] = self._m_old[slots].ds
            out[("new", slots)] = self._m_new[slots].ds
        return out


def collect_to_polars(ds) -> "pl.DataFrame":
    """Fetch a (materialized, small) Dataset to a driver polars frame."""
    batches = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    tabs = [b for b in batches if b.num_rows > 0 and b.num_columns > 0]
    if not tabs:
        return pl.DataFrame()
    return pl.from_arrow(pa.concat_tables(tabs))


def _eval_chain_ds(
    delta_ds,
    full_old_ds,
    full_new_ds,
    plan: RulePlan,
    chain: ChainPlan,
    with_lineage: bool,
    num_partitions: int,
    salt_factor: int = 1,
    match_cache: Optional[dict] = None,
):
    """Left-deep join chain for one delta position; returns a Dataset of
    head quads (with lkey when tracing lineage) or None if statically
    empty.  ``match_cache`` memoizes (side, atom) match datasets across
    the round's chains — the k delta-position chains of one rule (and
    rules sharing atoms) reuse the same filtered projections."""
    body = plan.body
    bindings = None
    bound_cols: List[str] = []
    for step, atom_i in enumerate(chain.order):
        atom = body[atom_i]
        if step == 0:
            side, side_key = delta_ds, "delta"
        elif atom_i < chain.delta_pos:
            # semi-naive old/new split (no double count)
            side, side_key = full_old_ds, "old"
        else:
            side, side_key = full_new_ds, "new"
        # materialize + count: (a) pins the schema so the hash-shuffle
        # aggregator can build empty partitions (Ray drops schema-less
        # empty lazy outputs), (b) prunes dead chains early — the
        # distributed analogue of pop_strictest_requirement's
        # fewest-matches-first pruning (src/reasoner.rs:235-243)
        cache_key = (side_key, atom.slots)
        in_cache = match_cache is not None and cache_key in match_cache
        if in_cache:
            m = match_cache[cache_key]
        else:
            m = side.map_batches(
                _match_batch_fn(atom), batch_format="pyarrow", zero_copy_batch=True
            ).materialize()
            # map tasks are ELIDED on empty input blocks, which then keep
            # their ORIGINAL schema — drop them or the join sees mixed
            # schemas ("No match for FieldRef")
            m = _drop_empty_blocks(m)
            if match_cache is not None:
                match_cache[cache_key] = m
        if m is None:
            return None
        if not atom.var_indices:
            continue  # all-constant existence check passed
        m_cols = [vcol(i) for i in atom.var_indices]
        if bindings is None:
            bindings, bound_cols = m, m_cols
            continue
        shared = [c for c in m_cols if c in bound_cols]
        bindings = shuffle_join(
            bindings, m, shared, num_partitions, salt_factor, probe_salt_cols=bound_cols
        )
        if bindings is None or bindings.count() == 0:
            return None
        bound_cols = bound_cols + [c for c in m_cols if c not in bound_cols]
    if bindings is None:
        # body entirely constant atoms, all satisfied — single empty binding
        import ray.data

        bindings = ray.data.from_arrow(pa.table({"__one": pa.array([1])}))
    return bindings.map_batches(
        _head_batch_fn(plan, with_lineage), batch_format="pyarrow", zero_copy_batch=True
    )
