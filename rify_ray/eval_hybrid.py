"""Hybrid (adaptive broadcast/shuffle) round evaluator for the
store-resident fixpoint — the engine's Spark-AQE-style join-strategy
switch, applied per operation inside a round.

The store itself (parquet generations, :class:`rify_ray.state.TripleStore`)
and the per-atom match datasets (:class:`rify_ray.eval_shuffle.IncrementalMatches`)
always stay distributed.  What this module adapts is the per-round
WORKING SET — the delta and the intermediate join bindings:

- both join sides ≤ ``broadcast_rows``  → the whole chain stays ONE
  fused lazy polars query (join → head projection → anti-join-first →
  dedup), streamed in a single pass — no distributed execution at all
  (this mirrors :func:`rify_ray.eval_broadcast.run_iteration`'s
  anti-before-unique ordering: in late rounds almost everything derived
  is already known, so dedup touches ~0 rows instead of the O(n·fanout)
  candidate enumeration);
- bindings small, matches big           → ONE ``map_batches`` over the
  cached match Dataset with the bindings broadcast via ``ray.put`` —
  a classic broadcast hash join, no shuffle actors;
- bindings big                          → ``Dataset.join`` hash-shuffle
  exchange with skew salting (:func:`rify_ray.eval_shuffle.shuffle_join`).

The round tail adapts the same way: while the full store has a driver
copy (≤ ``broadcast_rows``), insert-if-absent is a lazy polars
anti-join; past that it becomes a broadcast PROBE SCAN of the store
(each block semi-joins against the candidate set — no aggregator
actors); and once the candidates themselves outgrow the bound, the
distributed groupby + anti-join tail runs
(:func:`rify_ray.eval_shuffle.dedup_anti_ds`).

Why this exists: a ``Dataset.join``/groupby exchange in Ray 2.49 spins
up a fresh aggregator actor pool (~1 s fixed cost); a semi-naive round
over a web-scale store typically has a TINY delta, so paying several
exchanges per round for kilobytes of bindings dominates wall time.  At
100 TB the deltas exceed ``broadcast_rows`` and every step degrades
gracefully to the shuffle path.  (Reference semantics mirrored:
``apply_related`` seeded chains, ``/root/reference/src/reasoner.rs:131-155``;
insert-if-absent, ``src/reasoner.rs:103-127``.)
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import polars as pl
import pyarrow as pa

from .eval_broadcast import FACT_COLS, match_atom, project_heads
from .eval_shuffle import (
    IncrementalMatches,
    _head_batch_fn,
    collect_to_polars,
    dedup_anti_ds,
    shuffle_join,
)
from .plan import ChainPlan, RulePlan, vcol
from .util import drop_empty_blocks, polars_to_arrow_string


def _bcast_join_fn(small_ref, shared: Sequence[str]):
    """map_batches fn: per-batch polars inner join of the (big) match
    block against the broadcast (small) bindings frame.  The small side
    is fetched from the object store once per worker call — Ray caches
    the deserialized object per process."""
    import ray

    shared = list(shared)

    def fn(batch: pa.Table) -> pa.Table:
        small: pl.DataFrame = ray.get(small_ref)
        big = pl.from_arrow(batch)
        if shared:
            out = small.join(big, on=shared, how="inner")
        else:
            out = small.join(big, how="cross")
        return polars_to_arrow_string(out)

    return fn


def _probe_hits_fn(cand_ref):
    """map_batches fn: emit the subset of candidate quads present in
    this store block (semi-join per block; union of hits ≤ |candidates|)."""
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        cand: pl.DataFrame = ray.get(cand_ref)
        blk = pl.from_arrow(batch.select(FACT_COLS))
        hits = cand.join(blk, on=FACT_COLS, how="semi")
        return polars_to_arrow_string(hits)

    return fn


def anti_probe(cand: pl.DataFrame, full_new_ds) -> pl.DataFrame:
    """Insert-if-absent for a SMALL candidate frame: one streaming map
    over the full store collecting which candidates already exist, then
    a driver anti-join.  O(store) scanned, O(|candidates|) moved — and
    no shuffle actors (``Reasoner::insert``, src/reasoner.rs:103-127)."""
    import ray

    if cand.height == 0 or full_new_ds is None:
        return cand
    cand_ref = ray.put(cand.select(FACT_COLS).unique())
    hits_ds = full_new_ds.map_batches(
        _probe_hits_fn(cand_ref), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    hits = collect_to_polars(hits_ds)
    if hits.height == 0:
        return cand
    return cand.join(hits.unique(), on=FACT_COLS, how="anti")


ChainOut = Tuple[str, Union[pl.LazyFrame, "ray.data.Dataset"]]  # noqa: F821


def _eval_chain_hybrid(
    delta_pl: pl.DataFrame,
    plan: RulePlan,
    chain: ChainPlan,
    inc: IncrementalMatches,
    with_lineage: bool,
    broadcast_rows: int,
    num_partitions: int,
    salt_factor: int,
    fact_dtype,
) -> Optional[ChainOut]:
    """One delta-position join chain with per-step strategy choice.
    Returns ("lazy", polars LazyFrame of heads) / ("ds", head Dataset) /
    None.  The lazy variant carries the UNCOLLECTED fused join+projection
    query — the round tail fuses it further with anti+dedup so the
    (potentially huge) pre-anti candidate enumeration never materializes.
    """
    import ray.data

    body = plan.body
    bindings_lazy: Optional[pl.LazyFrame] = None
    bindings_ds = None
    bound_cols: List[str] = []
    for step, atom_i in enumerate(chain.order):
        atom = body[atom_i]
        m_cols = [vcol(i) for i in atom.var_indices]
        if step == 0:
            m = match_atom(delta_pl, atom)
            if m is None:
                return None
            if not m_cols:
                continue  # satisfied presence probe
            bindings_lazy, bound_cols = m, m_cols
            continue
        side = "old" if atom_i < chain.delta_pos else "new"
        ms = inc.side(side, atom.slots)
        if ms.rows == 0:
            return None
        if not m_cols:
            continue  # satisfied presence probe (ms.rows > 0)
        if bindings_lazy is None and bindings_ds is None:
            # delta atom was constant-only: seed bindings from this side
            if ms.small is not None:
                bindings_lazy = ms.small.lazy()
            else:
                bindings_ds = ms.ds
            bound_cols = m_cols
            continue
        shared = [c for c in m_cols if c in bound_cols]
        if bindings_lazy is not None and ms.small is not None:
            # small ⋈ small — stays one fused lazy polars query
            if shared:
                bindings_lazy = bindings_lazy.join(ms.small.lazy(), on=shared, how="inner")
            else:
                bindings_lazy = bindings_lazy.join(ms.small.lazy(), how="cross")
        elif bindings_lazy is not None:
            # matches too big to fetch: collect bindings, pick broadcast
            # map-join vs shuffle by their size
            import ray

            bdf = bindings_lazy.collect(engine="streaming")
            if bdf.height == 0:
                return None
            if bdf.height <= broadcast_rows:
                out = ms.ds.map_batches(
                    _bcast_join_fn(ray.put(bdf), shared),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                ).materialize()
                out = drop_empty_blocks(out)
                if out is None:
                    return None
                n = out.count()
                if n == 0:
                    return None
                if n <= broadcast_rows:
                    bindings_lazy, bindings_ds = collect_to_polars(out).lazy(), None
                else:
                    bindings_lazy, bindings_ds = None, out
            else:
                bindings_ds = shuffle_join(
                    ray.data.from_arrow(polars_to_arrow_string(bdf)),
                    ms.ds, shared, num_partitions, salt_factor,
                    probe_salt_cols=bound_cols,
                )
                bindings_lazy = None
                if bindings_ds is None or bindings_ds.count() == 0:
                    return None
        else:
            # big bindings: full hash-shuffle exchange with salting
            m_ds = ms.ds
            if ms.small is not None:
                m_ds = ray.data.from_arrow(polars_to_arrow_string(ms.small))
            bindings_ds = shuffle_join(
                bindings_ds, m_ds, shared, num_partitions, salt_factor,
                probe_salt_cols=bound_cols,
            )
            if bindings_ds is None or bindings_ds.count() == 0:
                return None
        bound_cols = bound_cols + [c for c in m_cols if c not in bound_cols]

    if bindings_lazy is None and bindings_ds is None:
        # body entirely constant atoms, all satisfied — single empty binding
        bindings_lazy = pl.LazyFrame({"__one": [1]})
    if bindings_lazy is not None:
        return ("lazy", project_heads(plan, bindings_lazy, with_lineage, fact_dtype))
    return (
        "ds",
        bindings_ds.map_batches(
            _head_batch_fn(plan, with_lineage), batch_format="pyarrow", zero_copy_batch=True
        ),
    )


def run_iteration_hybrid(
    delta_pl: pl.DataFrame,
    plans: Sequence[RulePlan],
    inc: IncrementalMatches,
    full_new_ds,
    *,
    full_small: Optional[pl.DataFrame] = None,
    with_lineage: bool = False,
    broadcast_rows: int = 500_000,
    num_partitions: int = 32,
    salt_factor: int = 1,
    pin_schema: Optional[pa.Schema] = None,
    fact_dtype=pl.Utf8,
):
    """One semi-naive round with a small (driver-resident) delta.

    ``inc.advance_small(delta_pl)`` must have been called already.
    ``full_small`` is the driver copy of the full store if one is being
    maintained (store ≤ ``broadcast_rows``) — it turns insert-if-absent
    into a lazy polars anti-join fused with the chain queries.

    ``full_new_ds`` may be a Dataset OR a zero-arg callable returning
    one: in the pure-driver regime no round consumes the Dataset view of
    the store, so the caller defers building it; this function resolves
    the callable only on the fallback paths that actually scan it.

    Returns a polars frame of new facts (possibly empty) when the round
    stayed small, or a materialized Dataset when it went big (caller
    re-checks size), or None when statically empty.
    """
    if pin_schema is None:
        pin_schema = pa.schema([(c, pa.string()) for c in FACT_COLS])
        if with_lineage:
            pin_schema = pin_schema.append(pa.field("lkey", pa.string()))

    lazy_heads: List[pl.LazyFrame] = []
    ds_heads = []
    for plan in plans:
        if not plan.body:
            continue
        for chain in plan.chains:
            out = _eval_chain_hybrid(
                delta_pl, plan, chain, inc, with_lineage,
                broadcast_rows, num_partitions, salt_factor, fact_dtype,
            )
            if out is None:
                continue
            kind, val = out
            (lazy_heads if kind == "lazy" else ds_heads).append(val)

    out_cols = [*FACT_COLS, "lkey"] if with_lineage else FACT_COLS
    if not lazy_heads and not ds_heads:
        return pl.DataFrame(
            schema={c: (pl.Utf8 if c == "lkey" else fact_dtype) for c in out_cols}
        )

    if not ds_heads:
        cand = pl.concat(lazy_heads)
        if full_small is not None:
            # the eval_broadcast ordering: anti-join FIRST (kills the
            # re-derivation bulk), dedup the tiny remainder — one fused
            # streaming query end to end
            new = cand.join(full_small.lazy(), on=FACT_COLS, how="anti")
            if with_lineage:
                new = new.group_by(FACT_COLS).agg(pl.col("lkey").min())
            else:
                new = new.unique(subset=FACT_COLS)
            return new.select(out_cols).collect(engine="streaming")
        # no driver store copy: dedup (streaming), then probe-scan the
        # distributed store — or hand off to the shuffle tail when even
        # the deduped candidates are big
        if with_lineage:
            cand = cand.group_by(FACT_COLS).agg(pl.col("lkey").min())
        else:
            cand = cand.unique(subset=FACT_COLS)
        cand_df = cand.select(out_cols).collect(engine="streaming")
        full_ds = full_new_ds() if callable(full_new_ds) else full_new_ds
        if cand_df.height <= broadcast_rows:
            return anti_probe(cand_df, full_ds)
        import ray.data

        ds = ray.data.from_arrow(polars_to_arrow_string(cand_df))
        ds = ds.join(full_ds, "left_anti", num_partitions, on=tuple(FACT_COLS))
        return drop_empty_blocks(ds.materialize())

    # mixed: lift lazy parts into Datasets, run the distributed tail
    import ray.data

    for lf in lazy_heads:
        # local pre-dedup (combiner) before the exchange; min-lkey keeps
        # first-wins lineage exact under the global groupby-min
        if with_lineage:
            lf = lf.group_by(FACT_COLS).agg(pl.col("lkey").min())
        else:
            lf = lf.unique(subset=FACT_COLS)
        df = lf.collect(engine="streaming")
        if df.height:
            ds_heads.append(ray.data.from_arrow(polars_to_arrow_string(df.select(out_cols))))
    new = ds_heads[0]
    if len(ds_heads) > 1:
        new = new.union(*ds_heads[1:])
    full_ds = full_new_ds() if callable(full_new_ds) else full_new_ds
    return dedup_anti_ds(new, full_ds, with_lineage, num_partitions, pin_schema)
