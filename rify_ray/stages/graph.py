"""Graph-shape statistics over quad datasets: predicate histogram with
distinct subject/object cardinalities, and top-k degree entities.

These are the KG profiling ops run after construction (how dense is
each predicate, which entities are hubs) — the quad analogue of
``pipelines.relational.source_stats``.  Scale shape: every statistic is
a per-block combiner followed by ONE small keyed exchange —
``n_facts`` ships per-block partial counts, the distinct cardinalities
ship per-block-deduped key pairs (bounded by distinct entities, not
facts), and top-k degree reuses the partial-count + driver/distributed
top-k discipline of ``relational.top_users_by_events``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..util import drop_empty_blocks


def _value_counts_fn(col: str, out_key: str):
    def fn(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {out_key: pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        vc = pc.value_counts(batch[col].combine_chunks())
        return pa.table(
            {
                out_key: pc.cast(vc.field("values"), pa.string()),
                "cnt": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    return fn


def _sum_counts(parts, key: str):
    """groupby(key).sum("cnt") with the zero-row-block strip and the
    rename back to (key, cnt)."""
    agg = drop_empty_blocks(parts.groupby(key).sum("cnt").materialize())
    if agg is None:
        return None

    def rename(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return pa.table(
                {key: pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                key: pc.cast(batch[key], pa.string()),
                "cnt": pc.cast(batch["sum(cnt)"], pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def _distinct_pair_counts(quads_ds, key: str, other: str):
    """count(DISTINCT other) per key: per-block dedup of (key, other)
    pairs (combiner), one global groupby(key, other) dedup exchange,
    then per-block partial counts of the now-unique pairs + one
    key-sized sum exchange."""

    def pair_dedup(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {key: pa.array([], pa.string()), other: pa.array([], pa.string())}
            )
        return (
            pa.table({key: batch[key], other: batch[other]})
            .group_by([key, other])
            .aggregate([])
        )

    pairs = drop_empty_blocks(
        quads_ds.map_batches(
            pair_dedup, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
    )
    if pairs is None:
        return None
    uniq = drop_empty_blocks(pairs.groupby([key, other]).count().materialize())
    if uniq is None:
        return None
    parts = uniq.map_batches(
        _value_counts_fn(key, key), batch_format="pyarrow", zero_copy_batch=True
    )
    return _sum_counts(parts, key)


def predicate_stats(quads_ds, *, broadcast_rows: int = 2_000_000):
    """Per-predicate graph profile: ``(p, n_facts, n_subjects,
    n_objects)`` — fact count, distinct subjects, distinct objects.
    The final three-way merge happens on the driver (the result is
    predicate-cardinality-sized — tiny by construction)."""
    import polars as plr
    import ray.data

    schema = pa.schema(
        [
            ("p", pa.string()),
            ("n_facts", pa.int64()),
            ("n_subjects", pa.int64()),
            ("n_objects", pa.int64()),
        ]
    )
    facts = _sum_counts(
        quads_ds.map_batches(
            _value_counts_fn("p", "p"), batch_format="pyarrow", zero_copy_batch=True
        ),
        "p",
    )
    if facts is None:
        return ray.data.from_arrow(schema.empty_table())
    subj = _distinct_pair_counts(quads_ds, "p", "s")
    obj = _distinct_pair_counts(quads_ds, "p", "o")

    def collect(ds, name):
        tabs = [
            b
            for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows and b.num_columns
        ]
        return (
            plr.from_arrow(pa.concat_tables(tabs)).rename({"cnt": name})
            if tabs
            else plr.DataFrame(schema={"p": plr.String, name: plr.Int64})
        )

    df = (
        collect(facts, "n_facts")
        .join(collect(subj, "n_subjects"), on="p", how="left")
        .join(collect(obj, "n_objects"), on="p", how="left")
        .sort("p")
    )
    return ray.data.from_arrow(df.to_arrow().cast(schema))


def top_degree(quads_ds, *, k: int = 10, direction: str = "out", broadcast_rows: int = 2_000_000):
    """Top-``k`` entities by degree: ``(entity, degree)``, out-degree
    counts facts per subject, in-degree per object; ties break
    ascending on the entity term.  Partial per-block counts → one
    entity-keyed sum exchange → driver top-k below ``broadcast_rows``
    aggregated entities, distributed sort+limit above."""
    import polars as plr
    import ray.data

    if direction not in ("out", "in"):
        raise ValueError(f"direction must be 'out' or 'in', got {direction!r}")
    col = "s" if direction == "out" else "o"
    schema = pa.schema([("entity", pa.string()), ("degree", pa.int64())])
    agg = _sum_counts(
        quads_ds.map_batches(
            _value_counts_fn(col, "entity"), batch_format="pyarrow", zero_copy_batch=True
        ),
        "entity",
    )
    if agg is None:
        return ray.data.from_arrow(schema.empty_table())
    agg = agg.materialize()
    if agg.count() <= broadcast_rows:
        tabs = [
            b
            for b in agg.iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows and b.num_columns
        ]
        df = (
            plr.from_arrow(pa.concat_tables(tabs))
            .rename({"cnt": "degree"})
            .sort(["degree", "entity"], descending=[True, False])
            .head(k)
        )
        return ray.data.from_arrow(df.to_arrow().cast(schema))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"entity": batch["entity"], "degree": pc.cast(batch["cnt"], pa.int64())}
        )

    return (
        agg.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["degree", "entity"], descending=[True, False])
        .limit(k)
    )
