"""Shared Ray Data helpers: schema pinning and empty-block hygiene.

Ray 2.49's hash aggregators (groupby) emit zero-row blocks with an
EMPTY schema for empty partitions, and map tasks are elided on empty
blocks, so such blocks survive `map_batches` fix-ups and later poison a
join's schema broadcast ("ArrowInvalid: No match for FieldRef").  Every
groupby → join boundary in this package goes through these helpers.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import pyarrow as pa


def tune_data_context(aggregator_cpus_per_partition: float = 0.1) -> None:
    """Explicit, one-shot session tuning: hash-shuffle / aggregate / join
    aggregator actors default to reserving CPU/2 of the cluster, which
    starves concurrently-running map stages (measured 3× pipeline
    slowdown at small CPU counts).  Call once after ``ray.init`` — e.g.
    from ``bench.py`` or a job entry point — instead of relying on any
    operator to mutate the shared DataContext as a side effect."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = (
        aggregator_cpus_per_partition
    )
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = (
        aggregator_cpus_per_partition
    )
    ctx.join_operator_actor_num_cpus_per_partition_override = (
        aggregator_cpus_per_partition
    )


def drop_empty_blocks(ds):
    """Rebuild a materialized Dataset from its non-empty block refs (no
    data movement — refs stay in the object store).  Returns None when
    every block is empty."""
    import ray.data

    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(ref)
    if not refs:
        return None
    return ray.data.from_arrow_refs(refs)


def ensure_schema_fn(schema: pa.Schema) -> Callable[[pa.Table], pa.Table]:
    """map_batches fn that rebuilds empty/odd blocks with the expected
    schema and puts columns in canonical order."""
    names = list(schema.names)

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return schema.empty_table()
        return batch.select(names)

    return fn


def string_schema(cols: Sequence[str]) -> pa.Schema:
    return pa.schema([(c, pa.string()) for c in cols])


def polars_to_arrow_string(df) -> pa.Table:
    """polars emits ``large_string`` / ``large_binary``; Arrow join keys
    and kernels here use ``string`` / ``binary`` — cast once at the
    boundary."""
    tbl = df.to_arrow()

    def norm(f):
        if f.type in (pa.large_string(), pa.utf8()):
            return (f.name, pa.string())
        if f.type == pa.large_binary():
            return (f.name, pa.binary())
        return f

    return tbl.cast(pa.schema([norm(f) for f in tbl.schema]))


def hash_rows_mod_fn(
    cols: Sequence[str], modulus: int, out_col: str
) -> Callable[[pa.Table], pa.Table]:
    """map_batches fn appending ``out_col = hash64(cols) % modulus``
    (Int32), fully vectorized — polars' seeded row hash (deterministic
    across processes for a fixed polars version); no ``to_pylist`` row
    loop.  Shared by the store partitioner and the salted-join probe."""
    import polars as pl

    cols = list(cols)

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.array([], pa.int32()))
        h = pl.from_arrow(batch.select(cols)).hash_rows(seed=0)
        parts = (h % modulus).cast(pl.Int32).rename(out_col)
        return batch.append_column(out_col, parts.to_arrow())

    return fn


def distinct(
    ds,
    cols: Sequence[str],
    *,
    keep_cols: Optional[Sequence[str]] = None,
    schema: Optional[pa.Schema] = None,
    driver_rows: int = 500_000,
):
    """Distributed distinct over ``cols``: local per-batch dedup first
    (combiner — shrinks the shuffle input before any exchange), then a
    hash-partition groupby, with empty-block hygiene.  Returns a Dataset
    with exactly ``cols`` (string-typed unless ``schema`` overrides) or
    None when input is empty.

    When the combined stream holds at most ``driver_rows`` rows the
    global dedup runs as a driver polars ``unique`` instead of the
    hash-aggregate exchange — the aggregator actor pool costs ~1 s of
    spin-up regardless of data size, which dominates exactly when the
    combiner already shrank the stream to almost nothing.  Inputs above
    the bound take the distributed exchange unchanged."""
    cols = list(cols)
    if schema is None:
        schema = string_schema(cols)

    def local_dedup(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        return batch.select(cols).group_by(cols).aggregate([])

    # materialize the combined (shrunken) stream BEFORE the shuffle: the
    # hash-aggregate operator reserves CPU/2 for its aggregator actors,
    # and running it concurrently with the map chain starves the maps on
    # small clusters (measured 3x slowdown of the whole pipeline); with
    # the combiner output materialized, maps get every CPU, then the
    # (cheap) exchange runs alone
    pre = ds.map_batches(
        local_dedup, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_pre = pre.count()
    if n_pre == 0:
        return None
    if n_pre <= driver_rows:
        import polars as pl
        import ray.data

        tbls = [
            t
            for t in pre.iter_batches(batch_size=None, batch_format="pyarrow")
            if t.num_rows
        ]
        uniq = (
            pl.from_arrow(pa.concat_tables(tbls, promote_options="permissive"))
            .unique(subset=cols)
            .select(cols)
        )
        return ray.data.from_arrow(polars_to_arrow_string(uniq).cast(schema))
    from ray.data import DataContext

    ctx = DataContext.get_current()
    prev = ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.1
    try:
        out = pre.groupby(cols, num_partitions=16).count().drop_columns(["count()"])
        out = out.materialize()
    finally:
        # scope the aggregator-CPU override to this exchange only — it is
        # a process-wide knob on the shared DataContext
        ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = prev
    out = drop_empty_blocks(out)
    if out is None:
        return None
    return out.map_batches(
        ensure_schema_fn(schema), batch_format="pyarrow", zero_copy_batch=True
    )


def from_arrow_blocks(tbl: pa.Table, rows_per_block: int = 8192):
    """Driver table → Dataset split into blocks: ``from_arrow`` of one
    table yields ONE block, which would serialize every downstream
    ``map_batches`` onto a single core."""
    import ray.data

    if tbl.num_rows <= rows_per_block:
        return ray.data.from_arrow(tbl)
    return ray.data.from_arrow(
        [tbl.slice(o, rows_per_block) for o in range(0, tbl.num_rows, rows_per_block)]
    )


def grouped_apply(
    tagged_ds,
    by: str,
    kernel,
    empty_schema: pa.Schema,
    *,
    broadcast_rows: int = 2_000_000,
    forced_shuffle: bool = False,
):
    """Adaptive per-key apply: run ``kernel`` (pa.Table group → pa.Table)
    once per distinct ``by`` value.

    Below ``broadcast_rows`` total rows the grouping happens on the
    driver (one argsort + boundary scan; kernels run in-process over
    zero-copy slices) — no sort exchange, no aggregator actors, which
    dominate exactly when keys are few and groups are small.  Above the
    bound, ``groupby(by).map_groups`` runs the identical kernel
    distributed (``forced_shuffle`` pins that branch for tests)."""
    import numpy as np
    import ray.data

    tagged_ds = tagged_ds.materialize()
    n = tagged_ds.count()
    if n == 0:
        return ray.data.from_arrow(empty_schema.empty_table())
    if forced_shuffle or n > broadcast_rows:
        return tagged_ds.groupby(by).map_groups(kernel, batch_format="pyarrow")
    tabs = [
        b
        for b in tagged_ds.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows and b.num_columns
    ]
    tbl = pa.concat_tables(tabs).combine_chunks()
    import pyarrow.compute as _pc

    keys = np.asarray(
        _pc.cast(tbl[by], pa.int64()).to_numpy(zero_copy_only=False), dtype=np.int64
    )
    order = np.argsort(keys, kind="stable")
    tbl = tbl.take(pa.array(order, pa.int64()))
    ks = keys[order]
    starts = np.flatnonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))
    sizes = np.diff(np.append(starts, ks.size))
    outs = [
        kernel(tbl.slice(int(s), int(l))) for s, l in zip(starts, sizes)
    ]
    outs = [o for o in outs if o.num_rows]
    if not outs:
        return ray.data.from_arrow(empty_schema.empty_table())
    return from_arrow_blocks(pa.concat_tables(outs).combine_chunks())
