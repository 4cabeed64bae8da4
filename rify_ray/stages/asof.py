"""As-of join — a temporal operator Ray Data has no native primitive
for, built as the composition the engine uses everywhere else:
schema-harmonized union → ONE ``groupby(by)`` exchange →
vectorized per-group merge (sort + ``searchsorted``), exactly the
"(a) map_batches + groupby().map_groups + sort" route for custom
operators.

Semantics (``direction="backward"``, the classic case): for each left
row, the right row with the same ``by`` key and the greatest ``on``
value at or below the left row's ``on`` value — DuckDB's
``ASOF JOIN ... ON l.by = r.by AND l.on >= r.on``, which is also the
oracle used to value-check it.

Partitioning assumption (documented per the custom-operator contract):
one ``by`` group must fit in a worker.  For time-series data that is
the per-entity history — the natural unit.  If a single entity's
history outgrows a worker, pre-chunk ``on`` into ranges and replicate
each range's last right row into the next range (sessionize-style
carry), then run this operator per (by, range).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def asof_join(
    left_ds,
    right_ds,
    *,
    by: str,
    on: str,
    left_cols: Sequence[str],
    right_cols: Sequence[Tuple[str, str]],
    how: str = "inner",
):
    """As-of join of two Datasets on ``by`` with backward match on ``on``.

    ``left_cols``: left payload columns carried through (plus ``by`` and
    ``on``).  ``right_cols``: (source, output-name) pairs gathered from
    the matched right row (``on`` may be included to expose the matched
    time).  ``how``: "inner" drops left rows with no prior right row;
    "left" keeps them with nulls.

    Right-side ties on (by, on) are resolved deterministically by sort
    order of the remaining right columns (last wins); callers wanting a
    specific tie-break should pre-deduplicate.

    Payload columns are int64 (ids / epoch timestamps) — the
    schema-harmonized union types the null side, and integer payloads
    keep the exchange compact; join wider payloads back by id afterwards.
    """
    left_pay = [c for c in left_cols if c not in (by, on)]
    right_src = [s for s, _ in right_cols if s not in (by,)]
    # harmonized schema: by, on, side, left payload, right payload
    # (null on the opposite side)

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {
            by: pc.cast(batch[by], pa.int64()),
            on: pc.cast(batch[on], pa.int64()),
            "_side": pa.array(np.zeros(batch.num_rows, dtype=np.int8), pa.int8()),
        }
        for c in left_pay:
            cols[f"_l_{c}"] = batch[c]
        for c in right_src:
            cols[f"_r_{c}"] = pa.nulls(batch.num_rows, pa.int64())
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = {
            by: pc.cast(batch[by], pa.int64()),
            on: pc.cast(batch[on], pa.int64()),
            "_side": pa.array(np.ones(batch.num_rows, dtype=np.int8), pa.int8()),
        }
        for c in left_pay:
            cols[f"_l_{c}"] = pa.nulls(batch.num_rows, pa.int64())
        for c in right_src:
            cols[f"_r_{c}"] = pc.cast(batch[c], pa.int64())
        return pa.table(cols)

    tagged = left_ds.map_batches(
        tag_left, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right_ds.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )

    out_fields = (
        [(by, pa.int64()), (on, pa.int64())]
        + [(c, pa.int64()) for c in left_pay]
        + [(name, pa.int64()) for _, name in right_cols]
    )
    out_schema = pa.schema(out_fields)

    def merge(group: pa.Table) -> pa.Table:
        side = np.asarray(group["_side"].to_numpy(zero_copy_only=False))
        onv = np.asarray(group[on].to_numpy(zero_copy_only=False), dtype=np.int64)
        l_idx = np.flatnonzero(side == 0)
        r_idx = np.flatnonzero(side == 1)
        if l_idx.size == 0:
            return out_schema.empty_table()
        l_on = onv[l_idx]
        r_on = onv[r_idx]
        r_order = np.argsort(r_on, kind="stable")
        r_on_sorted = r_on[r_order]
        pos = np.searchsorted(r_on_sorted, l_on, side="right") - 1
        matched = pos >= 0
        if how == "inner":
            keep_l = l_idx[matched]
            keep_pos = pos[matched]
        else:
            keep_l = l_idx
            keep_pos = pos
        cols = {
            by: pa.array(
                np.asarray(group[by].to_numpy(zero_copy_only=False), dtype=np.int64)[
                    keep_l
                ],
                pa.int64(),
            ),
            on: pa.array(onv[keep_l], pa.int64()),
        }
        for c in left_pay:
            arr = np.asarray(
                pc.cast(group[f"_l_{c}"], pa.int64()).to_numpy(zero_copy_only=False)
            )
            cols[c] = pa.array(arr[keep_l], pa.int64())
        gather = r_idx[r_order]
        for src, name in right_cols:
            if src == on:
                vals = r_on_sorted
            else:
                full = np.asarray(
                    pc.cast(group[f"_r_{src}"], pa.int64()).to_numpy(
                        zero_copy_only=False
                    )
                )
                vals = full[gather]
            if how == "inner":
                cols[name] = pa.array(vals[keep_pos], pa.int64())
            else:
                out = np.zeros(keep_pos.size, dtype=np.int64)
                ok = keep_pos >= 0
                out[ok] = vals[keep_pos[ok]]
                cols[name] = pa.array(out, pa.int64(), mask=~ok)
        return pa.table(cols).cast(out_schema)

    from ..util import grouped_apply

    return grouped_apply(tagged, by, merge, out_schema)


def range_join_count(
    left_ds,
    right_ds,
    *,
    by: str,
    on: str,
    low_offset: int,
    high_offset: int,
    left_cols: Sequence[str],
    count_col: str = "n_in_range",
):
    """Range (interval) join, aggregated: for each left row, the COUNT
    of right rows with the same ``by`` key and ``on`` within
    ``[left.on + low_offset, left.on + high_offset]`` (inclusive).

    Same physical shape as :func:`asof_join` — one ``groupby(by)``
    exchange, then a per-group vectorized two-sided ``searchsorted``
    over the sorted right timestamps: O((|L|+|R|) log |R|) per key, not
    the O(|L|·|R|) row-pair blowup a naive inequality join produces.
    Emitting the aggregate instead of matched pairs is what makes the
    operator safe at scale: a boilerplate key with a million right rows
    in every window would otherwise explode the output.  Same per-key
    partitioning assumption as ``asof_join``."""
    left_pay = [c for c in left_cols if c not in (by, on)]

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {
            by: pc.cast(batch[by], pa.int64()),
            on: pc.cast(batch[on], pa.int64()),
            "_side": pa.array(np.zeros(batch.num_rows, dtype=np.int8), pa.int8()),
        }
        for c in left_pay:
            cols[f"_l_{c}"] = pc.cast(batch[c], pa.int64())
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = {
            by: pc.cast(batch[by], pa.int64()),
            on: pc.cast(batch[on], pa.int64()),
            "_side": pa.array(np.ones(batch.num_rows, dtype=np.int8), pa.int8()),
        }
        for c in left_pay:
            cols[f"_l_{c}"] = pa.nulls(batch.num_rows, pa.int64())
        return pa.table(cols)

    tagged = left_ds.map_batches(
        tag_left, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right_ds.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )
    out_schema = pa.schema(
        [(by, pa.int64()), (on, pa.int64())]
        + [(c, pa.int64()) for c in left_pay]
        + [(count_col, pa.int64())]
    )

    def merge(group: pa.Table) -> pa.Table:
        side = np.asarray(group["_side"].to_numpy(zero_copy_only=False))
        onv = np.asarray(group[on].to_numpy(zero_copy_only=False), dtype=np.int64)
        l_idx = np.flatnonzero(side == 0)
        if l_idx.size == 0:
            return out_schema.empty_table()
        r_on = np.sort(onv[side == 1], kind="stable")
        l_on = onv[l_idx]
        lo = np.searchsorted(r_on, l_on + low_offset, side="left")
        hi = np.searchsorted(r_on, l_on + high_offset, side="right")
        cols = {
            by: pa.array(
                np.asarray(group[by].to_numpy(zero_copy_only=False), dtype=np.int64)[
                    l_idx
                ],
                pa.int64(),
            ),
            on: pa.array(l_on, pa.int64()),
        }
        for c in left_pay:
            arr = np.asarray(
                pc.cast(group[f"_l_{c}"], pa.int64()).to_numpy(zero_copy_only=False)
            )
            cols[c] = pa.array(arr[l_idx], pa.int64())
        cols[count_col] = pa.array(hi - lo, pa.int64())
        return pa.table(cols).cast(out_schema)

    from ..util import grouped_apply

    return grouped_apply(tagged, by, merge, out_schema)
