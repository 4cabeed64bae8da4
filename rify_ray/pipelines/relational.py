"""Quad builders over the TPC-H-ish test tables + windowed event
aggregates.

These feed the inference engine with facts derived from relational
parquet inputs (read with column pruning — only the key columns leave
storage) and give the DuckDB oracle something exactly SQL-expressible
to check: entity-tagged string quads like ``c:{custkey} in_nation
n:{nationkey}``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

DG = "default_graph"


def _tag(prefix: str, col) -> pa.Array:
    """Vectorized ``prefix || int_col`` string building."""
    num = pc.cast(col, pa.string())
    pref = pa.array([prefix] * len(num), pa.string())
    return pc.binary_join_element_wise(pref, num, "")


def _quads_fn(s_prefix: str, s_col: str, pred: str, o_prefix: str, o_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "s": _tag(s_prefix, batch[s_col]),
                "p": pa.array([pred] * n, pa.string()),
                "o": _tag(o_prefix, batch[o_col]),
                "g": pa.array([DG] * n, pa.string()),
            }
        )

    return fn


def customer_nation_quads(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    return ds.map_batches(
        _quads_fn("c:", "c_custkey", "in_nation", "n:", "c_nationkey"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def supplier_nation_quads(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    return ds.map_batches(
        _quads_fn("s:", "s_suppkey", "in_nation", "n:", "s_nationkey"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def nation_region_quads(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    return ds.map_batches(
        _quads_fn("n:", "n_nationkey", "in_region", "r:", "n_regionkey"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def nation_chain_quads(sf_dir: str) -> pa.Table:
    """Chain ``n:k_i succ n:k_{i+1}`` over nation keys in sorted order.
    Nation is a 25-row dimension table — built driver-side (broadcast
    size), exactly like rule constants."""
    import pyarrow.parquet as pq

    keys = sorted(
        pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])[
            "n_nationkey"
        ].to_pylist()
    )
    s, o = [], []
    for a, b in zip(keys, keys[1:]):
        s.append(f"n:{a}")
        o.append(f"n:{b}")
    n = len(s)
    return pa.table(
        {
            "s": pa.array(s, pa.string()),
            "p": pa.array(["succ"] * n, pa.string()),
            "o": pa.array(o, pa.string()),
            "g": pa.array([DG] * n, pa.string()),
        }
    )


def _clean_groupby_output(out, schema: pa.Schema, rename: dict):
    """Post-groupby hygiene: empty aggregator blocks + column renames +
    exact output types."""
    from ..util import drop_empty_blocks

    out = drop_empty_blocks(out.materialize())
    if out is None:
        import ray.data

        return ray.data.from_arrow(schema.empty_table())

    def fix(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return schema.empty_table()
        cols = {}
        for name in schema.names:
            src = rename.get(name, name)
            cols[name] = pc.cast(batch[src], schema.field(name).type)
        return pa.table(cols)

    return out.map_batches(fix, batch_format="pyarrow", zero_copy_batch=True)


def _preagg_count(
    ds,
    key_cols: List[str],
    schema: pa.Schema,
    count_col: str,
    *,
    driver_rows_bound: int = 2_000_000,
    forced_shuffle: bool = False,
):
    """Map-side combine → adaptive final merge for grouped counts.

    The per-block partial (polars ``group_by().len()``) means the
    exchange moves DISTINCT KEYS PER BLOCK, not one row per input — the
    pre-aggregation discipline every wide count needs at scale.  The
    final merge is adaptive like the engine's hybrid rounds: a partial
    set at or below ``driver_rows_bound`` folds on the driver with one
    polars groupby (no aggregator-actor spin-up, the dominant fixed
    cost of tiny-scale ``Dataset.groupby``); above the bound a
    distributed ``groupby().sum()`` runs instead (``forced_shuffle``
    pins that branch for tests)."""
    import polars as plr
    import ray.data

    part_schema = pa.schema(
        [(schema.field(c).name, schema.field(c).type) for c in key_cols]
        + [("cnt", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        df = plr.from_arrow(batch.select(key_cols)).group_by(key_cols).len("cnt")
        return df.to_arrow().cast(part_schema)

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    # the adaptive final merge is exactly the partial-sum fold
    return _preagg_sum(
        parts,
        key_cols,
        schema,
        "cnt",
        count_col,
        driver_rows_bound=driver_rows_bound,
        forced_shuffle=forced_shuffle,
    )


def top_users_by_events(sf_dir: str, k: int = 10, *, forced_shuffle: bool = False):
    """Pre-aggregated count + sort + limit (top-k): the k users with
    most events, deterministic tie-break on user_id."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    schema = pa.schema([("user_id", pa.int64()), ("n_events", pa.int64())])
    out = _preagg_count(
        ds, ["user_id"], schema, "n_events", forced_shuffle=forced_shuffle
    )
    # top-k by (n_events desc, user_id asc): driver sort below the bound
    # (the aggregated set is distinct users — no sort exchange for a
    # k-row answer), distributed sort+limit above it
    if not forced_shuffle and out.count() <= 2_000_000:
        import polars as plr
        import ray.data

        tabs = [
            b
            for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows and b.num_columns
        ]
        if not tabs:
            return ray.data.from_arrow(schema.empty_table())
        df = (
            plr.from_arrow(pa.concat_tables(tabs))
            .sort(["n_events", "user_id"], descending=[True, False])
            .head(k)
        )
        return ray.data.from_arrow(df.to_arrow().cast(schema))
    return out.sort(["n_events", "user_id"], descending=[True, False]).limit(k)


def orders_by_status_priority(sf_dir: str, *, forced_shuffle: bool = False):
    """Multi-key pre-aggregated count."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderstatus", "o_orderpriority"]
    )
    schema = pa.schema(
        [
            ("o_orderstatus", pa.string()),
            ("o_orderpriority", pa.string()),
            ("n_orders", pa.int64()),
        ]
    )
    return _preagg_count(
        ds,
        ["o_orderstatus", "o_orderpriority"],
        schema,
        "n_orders",
        forced_shuffle=forced_shuffle,
    )


def segment_order_counts(
    sf_dir: str,
    num_partitions: int = 8,
    *,
    mode: str = "auto",
    broadcast_rows: int = 2_000_000,
):
    """Orders per customer market segment: broadcast-hash-join + map-side
    partial counts when the customer side fits the broadcast bound (one
    executor run, zero exchanges — the dimension table ships once via
    ``ray.put``); a real hash-join shuffle + distributed groupby above
    it (``mode="shuffle"`` pins that branch for tests)."""
    import ray.data

    from ..util import drop_empty_blocks

    schema = pa.schema([("c_mktsegment", pa.string()), ("n_orders", pa.int64())])
    import pyarrow.parquet as pq

    cust_meta_rows = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    if mode != "shuffle" and cust_meta_rows <= broadcast_rows:
        import polars as plr
        import ray

        # the dimension table is headed for the driver either way —
        # read it there directly (pruned columns) instead of paying an
        # executor run to collect it
        lut_ref = ray.put(
            plr.from_arrow(
                pq.read_table(
                    f"{sf_dir}/customer.parquet",
                    columns=["c_custkey", "c_mktsegment"],
                )
            )
        )
        part_schema = pa.schema([("c_mktsegment", pa.string()), ("cnt", pa.int64())])

        def join_partial(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return part_schema.empty_table()
            lut: plr.DataFrame = ray.get(lut_ref)
            df = plr.from_arrow(batch).join(
                lut, left_on="o_custkey", right_on="c_custkey", how="inner"
            )
            return (
                df.group_by("c_mktsegment").len("cnt").to_arrow().cast(part_schema)
            )

        parts = orders.map_batches(
            join_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        tabs = [
            b
            for b in parts.iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows and b.num_columns
        ]
        if not tabs:
            return ray.data.from_arrow(schema.empty_table())
        df = (
            plr.from_arrow(pa.concat_tables(tabs))
            .group_by("c_mktsegment")
            .agg(plr.col("cnt").sum().alias("n_orders"))
        )
        return ray.data.from_arrow(df.to_arrow().cast(schema))
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    joined = orders.materialize().join(
        cust.materialize(), "inner", num_partitions,
        on=("o_custkey",), right_on=("c_custkey",),
    ).materialize()
    joined = drop_empty_blocks(joined)
    if joined is None:
        return ray.data.from_arrow(schema.empty_table())
    out = joined.groupby("c_mktsegment").count()
    return _clean_groupby_output(out, schema, {"n_orders": "count()"})


def lineitem_pricing_cents(sf_dir: str):
    """TPC-H Q1-style aggregate with integer-cent outputs (stable under
    float summation-order differences): per (returnflag, linestatus)
    count + rounded sums."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )
    out = ds.groupby(["l_returnflag", "l_linestatus"]).sum(
        ["l_quantity", "l_extendedprice"]
    )
    from ..util import drop_empty_blocks

    out = drop_empty_blocks(out.materialize())
    schema = pa.schema(
        [
            ("l_returnflag", pa.string()),
            ("l_linestatus", pa.string()),
            ("sum_qty_cents", pa.int64()),
            ("sum_price_cents", pa.int64()),
        ]
    )
    if out is None:
        return __import__("ray.data", fromlist=["data"]).from_arrow(schema.empty_table())

    def fix(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return schema.empty_table()
        return pa.table(
            {
                "l_returnflag": pc.cast(batch["l_returnflag"], pa.string()),
                "l_linestatus": pc.cast(batch["l_linestatus"], pa.string()),
                "sum_qty_cents": pc.cast(
                    pc.round(pc.multiply(batch["sum(l_quantity)"], pa.scalar(100.0))),
                    pa.int64(),
                ),
                "sum_price_cents": pc.cast(
                    pc.round(pc.multiply(batch["sum(l_extendedprice)"], pa.scalar(100.0))),
                    pa.int64(),
                ),
            }
        )

    return out.map_batches(fix, batch_format="pyarrow", zero_copy_batch=True)


def revenue_by_nation(sf_dir: str, *, broadcast_rows: int = 20_000_000, forced_shuffle: bool = False):
    """TPC-H Q5-style star join: revenue per customer nation over
    lineitem ⋈ orders ⋈ customer ⋈ nation.  Revenue is computed in
    exact integer 10⁻⁴-dollar units PER ITEM
    (``round(price·100) · (100 − round(discount·100))``) so the sum is
    order-independent int64 arithmetic — hash-stable against the SQL
    oracle regardless of float summation order.

    Physical plan (the canonical warehouse shape): the three dimension
    tables fold into ONE ``ray.put`` broadcast lookup
    (orderkey → nation name, built driver-side — dimensions are small
    by definition), the fact table streams through a single map that
    attaches the nation and pre-aggregates per block, and the only
    exchange is a nation-cardinality ``groupby.sum`` of partials.
    ``forced_shuffle`` pins the hash-join chain instead (the fallback
    when orders outgrow the broadcast bound)."""
    import numpy as np
    import ray
    import ray.data

    from ..util import drop_empty_blocks

    schema = pa.schema(
        [
            ("n_name", pa.string()),
            ("revenue_c4", pa.int64()),
            ("n_items", pa.int64()),
        ]
    )

    def item_rev(batch: pa.Table) -> pa.Table:
        price_c = pc.cast(
            pc.round(pc.multiply(batch["l_extendedprice"], pa.scalar(100.0))),
            pa.int64(),
        )
        disc_pct = pc.cast(
            pc.round(pc.multiply(batch["l_discount"], pa.scalar(100.0))), pa.int64()
        )
        rev = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_pct))
        return pa.table(
            {"l_orderkey": pc.cast(batch["l_orderkey"], pa.int64()), "rev": rev}
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(item_rev, batch_format="pyarrow", zero_copy_batch=True)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )

    def finalize(agg):
        agg = drop_empty_blocks(agg.materialize())
        if agg is None:
            return ray.data.from_arrow(schema.empty_table())

        def fix(batch: pa.Table) -> pa.Table:
            if batch.num_columns == 0:
                return schema.empty_table()
            return pa.table(
                {
                    "n_name": pc.cast(batch["n_name"], pa.string()),
                    "revenue_c4": pc.cast(batch["sum(rev)"], pa.int64()),
                    "n_items": pc.cast(batch["sum(cnt)"], pa.int64()),
                }
            )

        return agg.map_batches(fix, batch_format="pyarrow", zero_copy_batch=True)

    n_orders = orders.count()
    if not forced_shuffle and n_orders <= broadcast_rows:
        import polars as plr

        def collect(ds):
            return plr.from_arrow(
                pa.concat_tables(
                    b
                    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")
                    if b.num_rows and b.num_columns
                )
            )

        # fold the dimension star into one orderkey → n_name lookup
        lut = (
            collect(orders)
            .join(collect(cust), left_on="o_custkey", right_on="c_custkey")
            .join(collect(nation), left_on="c_nationkey", right_on="n_nationkey")
            .select(["o_orderkey", "n_name"])
        )
        ref = ray.put(lut)

        def attach_agg(batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "n_name": pa.array([], pa.string()),
                    "rev": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
            if batch.num_rows == 0:
                return empty
            t: "plr.DataFrame" = ray.get(ref)
            df = (
                plr.from_arrow(batch)
                .join(t, left_on="l_orderkey", right_on="o_orderkey", how="inner")
                .group_by("n_name")
                .agg(
                    plr.col("rev").sum().alias("rev"),
                    plr.len().cast(plr.Int64).alias("cnt"),
                )
            )
            from ..util import polars_to_arrow_string

            return polars_to_arrow_string(df).cast(empty.schema)

        parts = li.map_batches(attach_agg, batch_format="pyarrow", zero_copy_batch=True)
        return finalize(parts.groupby("n_name").sum(["rev", "cnt"]))

    # hash-join chain fallback (dimensions beyond the broadcast bound)
    j1 = drop_empty_blocks(
        li.join(
            orders.map_batches(
                lambda b: pa.table(
                    {
                        "l_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                        "o_custkey": pc.cast(b["o_custkey"], pa.int64()),
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            "inner",
            8,
            on=("l_orderkey",),
        ).materialize()
    )
    if j1 is None:
        return ray.data.from_arrow(schema.empty_table())
    j2 = drop_empty_blocks(
        j1.join(
            cust.map_batches(
                lambda b: pa.table(
                    {
                        "o_custkey": pc.cast(b["c_custkey"], pa.int64()),
                        "c_nationkey": pc.cast(b["c_nationkey"], pa.int64()),
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            "inner",
            8,
            on=("o_custkey",),
        ).materialize()
    )
    if j2 is None:
        return ray.data.from_arrow(schema.empty_table())
    j3 = drop_empty_blocks(
        j2.join(
            nation.map_batches(
                lambda b: pa.table(
                    {
                        "c_nationkey": pc.cast(b["n_nationkey"], pa.int64()),
                        "n_name": pc.cast(b["n_name"], pa.string()),
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            "inner",
            8,
            on=("c_nationkey",),
        ).materialize()
    )
    if j3 is None:
        return ray.data.from_arrow(schema.empty_table())

    def preagg(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "n_name": pa.array([], pa.string()),
                "rev": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        g = (
            pa.table({"n_name": batch["n_name"], "rev": batch["rev"]})
            .group_by("n_name")
            .aggregate([("rev", "sum"), ("rev", "count")])
        )
        return pa.table(
            {
                "n_name": pc.cast(g["n_name"], pa.string()),
                "rev": pc.cast(g["rev_sum"], pa.int64()),
                "cnt": pc.cast(g["rev_count"], pa.int64()),
            }
        )

    parts = j3.map_batches(preagg, batch_format="pyarrow", zero_copy_batch=True)
    return finalize(parts.groupby("n_name").sum(["rev", "cnt"]))


def grouped_quantiles(
    ds,
    *,
    key_col: str,
    value_col: str,
    qs: List[float],
    out_names: List[str],
    heavy_key_bound: int = 50_000_000,
    sketch_k: int = 256,
    total_rows: Optional[int] = None,
):
    """Exact per-group discrete quantiles — DuckDB ``quantile_disc``
    semantics (the element at ``max(0, ceil(q*n) - 1)`` of the sorted
    values), so the SQL oracle matches value-for-value.

    One ``groupby(key)`` exchange; per-group work is a single sort.
    The exact path's partitioning assumption — one key's values fit in
    a worker — is ENFORCED, not hoped for: a cheap key-column pre-pass
    (per-block partial counts folded on the driver; distinct keys are
    grouping-cardinality small by the same assumption the output makes)
    finds keys with more than ``heavy_key_bound`` values, and those
    keys route automatically through the mergeable deterministic
    Munro-Paterson sketch
    (:func:`rify_ray.stages.corpus.grouped_quantile_sketch`) — per
    block O(k·log) sketch rows cross the exchange instead of every
    value, trading bounded rank error for never materializing a giant
    group (the same trade :func:`rify_ray.stages.corpus.hll_distinct`
    makes for counts).  Light keys stay exact; the two outputs union."""
    import numpy as np
    import ray.data

    out_schema = pa.schema(
        [(key_col, pa.string())] + [(n, pa.int64()) for n in out_names]
    )

    # key-cardinality pre-pass: one streaming scan of the key column.
    # Skipped entirely when the caller proves the input can't contain a
    # heavy key (``total_rows`` — cheap parquet metadata at the source;
    # NOT computed here via ds.count(), which would re-execute upstream
    # transforms).
    key_counts: dict = {}
    heavy: set = set()
    if total_rows is None or total_rows > heavy_key_bound:
        for b in ds.select_columns([key_col]).map_batches(
            lambda t: t.group_by(key_col).aggregate([([], "count_all")]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).iter_batches(batch_size=None, batch_format="pyarrow"):
            if b.num_rows == 0 or b.num_columns == 0:
                continue
            for kk, cc in zip(b[key_col].to_pylist(), b["count_all"].to_pylist()):
                key_counts[kk] = key_counts.get(kk, 0) + cc
        # a null key always stays on the exact path (the string-cast
        # is_in split below can't address it)
        heavy = {
            kk
            for kk, cc in key_counts.items()
            if cc > heavy_key_bound and kk is not None
        }

    def kernel(group: pa.Table) -> pa.Table:
        vals = np.sort(
            np.asarray(
                pc.cast(group[value_col], pa.int64()).to_numpy(zero_copy_only=False),
                dtype=np.int64,
            )
        )
        n = vals.size
        if n == 0:
            return out_schema.empty_table()
        cols = {
            key_col: pc.cast(pa.array([group[key_col][0].as_py()]), pa.string())
        }
        for q, name in zip(qs, out_names):
            idx = max(0, int(np.ceil(q * n)) - 1)
            cols[name] = pa.array([int(vals[idx])], pa.int64())
        return pa.table(cols).cast(out_schema)

    if not heavy:
        return ds.groupby(key_col).map_groups(kernel, batch_format="pyarrow")

    from ..stages.corpus import grouped_quantile_sketch

    # the split filter compares STRING casts of the key column, so the
    # heavy set must be its string casts too (a raw pa.array(...,
    # pa.string()) raises ArrowTypeError for int/float key columns);
    # arrow's own cast keeps the formatting identical on both sides
    heavy_arr = pc.cast(pa.array(sorted(heavy, key=str)), pa.string())

    def split_fn(keep_heavy: bool):
        def fn(batch: pa.Table) -> pa.Table:
            m = pc.is_in(pc.cast(batch[key_col], pa.string()), value_set=heavy_arr)
            return batch.filter(m if keep_heavy else pc.invert(m))

        return fn

    heavy_out = grouped_quantile_sketch(
        ds.map_batches(split_fn(True), batch_format="pyarrow", zero_copy_batch=True),
        key_col=key_col,
        value_col=value_col,
        qs=qs,
        out_names=list(out_names),
        k=sketch_k,
    )
    if len(heavy) == len(key_counts):
        return heavy_out
    light_out = (
        ds.map_batches(split_fn(False), batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .map_groups(kernel, batch_format="pyarrow")
    )
    return light_out.union(heavy_out)


def events_value_quantiles(sf_dir: str, *, heavy_key_bound: int = 50_000_000):
    """Per event_type quantiles of the value column in integer cents
    (p25/p50/p75/p90), exact vs DuckDB ``quantile_disc``; an event type
    with more than ``heavy_key_bound`` events routes automatically
    through the Munro-Paterson sketch (see :func:`grouped_quantiles`)."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def cents(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch["value"], pa.float64())
        c = pc.floor(pc.add(pc.multiply(v, pa.scalar(100.0)), pa.scalar(0.5)))
        return pa.table(
            {
                "event_type": pc.cast(batch["event_type"], pa.string()),
                "cents": pc.cast(c, pa.int64()),
            }
        )

    return grouped_quantiles(
        ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        key_col="event_type",
        value_col="cents",
        qs=[0.25, 0.5, 0.75, 0.9],
        out_names=["p25_cents", "p50_cents", "p75_cents", "p90_cents"],
        heavy_key_bound=heavy_key_bound,
        # parquet metadata count on the RAW read — proves no key can be
        # heavy without scanning, so the pre-pass is skipped entirely
        total_rows=ds.count(),
    )


def events_props_extract(sf_dir: str, key: str = "k"):
    """Scalar JSON extraction over the events ``props`` column:
    (event_id, k_val) — vectorized via polars' JSON path kernel inside
    ``map_batches`` (no Python-level json.loads loop)."""
    import polars as plr
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "props"])

    def fn(batch: pa.Table) -> pa.Table:
        df = plr.from_arrow(batch)
        out = df.select(
            plr.col("event_id").cast(plr.Int64),
            plr.col("props")
            .str.json_path_match(f"$.{key}")
            .cast(plr.Int64)
            .alias("k_val"),
        )
        tbl = out.to_arrow()
        return tbl.cast(pa.schema([("event_id", pa.int64()), ("k_val", pa.int64())]))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def events_sessionize(sf_dir: str, *, gap_s: int = 1800, forced_shuffle: bool = False):
    """Gap-based sessionization: per user, events sorted by time are cut
    into sessions wherever the inter-event gap exceeds ``gap_s``.
    Returns (user_id, session_id, n_events, start_us) — session_id is
    0-based per user in time order.

    Partitioning: per-user grouping through the adaptive
    ``util.grouped_apply`` (driver argsort below the broadcast bound, a
    ``groupby.map_groups`` hash-shuffle above); the per-group fold is
    vectorized numpy.  This is the streaming-window pattern: all state
    confined to the group/partition.
    """
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    import numpy as np

    gap_us = gap_s * 1_000_000
    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("session_id", pa.int64()),
            ("n_events", pa.int64()),
            ("start_us", pa.int64()),
        ]
    )

    def sessions(group: pa.Table) -> pa.Table:
        uid = group["user_id"][0].as_py()
        ts = np.sort(np.asarray(pc.cast(group["ts"], pa.int64()).to_pylist(), dtype=np.int64))
        if ts.size == 0:
            return out_schema.empty_table()
        brk = np.empty(ts.size, dtype=np.int64)
        brk[0] = 0
        brk[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sid = np.cumsum(brk)
        n_sessions = sid[-1] + 1
        counts = np.bincount(sid, minlength=n_sessions)
        starts = ts[np.searchsorted(sid, np.arange(n_sessions))]
        return pa.table(
            {
                "user_id": pa.array([uid] * n_sessions, pa.int64()),
                "session_id": pa.array(np.arange(n_sessions), pa.int64()),
                "n_events": pa.array(counts, pa.int64()),
                "start_us": pa.array(starts, pa.int64()),
            }
        )

    from ..util import grouped_apply

    return grouped_apply(
        ds, "user_id", sessions, out_schema, forced_shuffle=forced_shuffle
    )


def events_funnel(
    sf_dir: str,
    *,
    stages: Sequence[str] = ("view", "click", "purchase"),
    forced_shuffle: bool = False,
):
    """Ordered funnel analysis: per user, the timestamp of the first
    stage-1 event, the first stage-2 event AT OR AFTER it, and so on —
    the conversion-sequence op (view → click → purchase).  Users with
    no stage-1 event are absent; later stages are NULL once the chain
    breaks.  Returns (user_id, t_<stage>_us ...).

    Partitioning: all state is per-user, so this is the sessionize
    shape — adaptive ``grouped_apply`` (driver argsort below the
    broadcast bound, ``groupby.map_groups`` hash exchange above) with a
    vectorized numpy fold per group."""
    import ray.data

    stage_list = list(stages)
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    out_schema = pa.schema(
        [("user_id", pa.int64())]
        + [(f"t_{s}_us", pa.int64()) for s in stage_list]
    )

    import numpy as np

    def funnel(group: pa.Table) -> pa.Table:
        uid = group["user_id"][0].as_py()
        ts = np.asarray(
            pc.cast(group["ts"], pa.int64()).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        types = np.asarray(group["event_type"].to_pylist())
        vals: list = []
        cur = None
        for s in stage_list:
            if cur is None and vals:
                vals.append(None)  # chain already broken
                continue
            mask = types == s
            if cur is not None:
                mask &= ts >= cur
            if mask.any():
                cur = int(ts[mask].min())
                vals.append(cur)
            else:
                vals.append(None)
                cur = None
        if vals[0] is None:
            return out_schema.empty_table()
        cols = {"user_id": pa.array([uid], pa.int64())}
        for s, v in zip(stage_list, vals):
            cols[f"t_{s}_us"] = pa.array([v], pa.int64())
        return pa.table(cols)

    from ..util import grouped_apply

    return grouped_apply(ds, "user_id", funnel, out_schema, forced_shuffle=forced_shuffle)


def events_retention(
    sf_dir: str,
    *,
    max_offset: int = 30,
    broadcast_rows: int = 20_000_000,
    num_partitions: int = 8,
    driver_rows_bound: int = 2_000_000,
    forced_shuffle: bool = False,
):
    """Cohort retention: users are cohorted by their FIRST event day;
    for each (cohort_day, day_offset ≤ ``max_offset``) count the
    distinct users active that many days after their first event —
    the classic growth-analytics triangle.

    Scale shape — ONE pass over events, then adaptive like the other
    grouped aggregates: the scan reduces each block to its distinct
    (user, day) pairs (bounded by users × active-days per block, not
    events); when the per-block partials total at or below
    ``driver_rows_bound`` the rest is ONE driver polars pass (dedup →
    per-user min → offsets → counts, zero exchanges — the aggregator
    spin-up otherwise dominates at this size).  Above the bound,
    exactly three keyed exchanges, the last one tiny:

    1. ONE pair-keyed dedup exchange makes the pairs globally distinct;
    2. first-event-per-user derives FROM those deduped pairs (min day
       == min over raw events by construction): per-block partial min
       + one user-keyed ``groupby.min`` exchange, riding back as a
       ``ray.put`` broadcast below ``broadcast_rows`` users (a
       user-keyed hash join above — the only extra exchange in the
       big regime);
    3. cohort attach + offset filter are a pure per-block map over the
       already-distinct pairs (distinct (user, day) ⇒ distinct
       (user, cohort, offset): cohort is a function of user), so the
       final count is a per-block partial + one (cohort, offset)-keyed
       sum over at most cohorts × offsets rows per block."""
    import ray
    import ray.data

    from ..util import drop_empty_blocks

    US_PER_DAY = 86_400_000_000
    schema = pa.schema(
        [
            ("cohort_day", pa.string()),
            ("day_offset", pa.int64()),
            ("n_users", pa.int64()),
        ]
    )
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def block_pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()), "d": pa.array([], pa.int64())}
            )
        return (
            pa.table(
                {
                    "user_id": pc.cast(batch["user_id"], pa.int64()),
                    # event DAY (epoch days; events are post-1970)
                    "d": pc.divide(pc.cast(batch["ts"], pa.int64()), US_PER_DAY),
                }
            )
            .group_by(["user_id", "d"])
            .aggregate([])
        )

    pairs = ds.map_batches(
        block_pairs, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ray.data.from_arrow(schema.empty_table())
    if not forced_shuffle and n_pairs <= driver_rows_bound:
        import polars as plr

        tabs = [
            b
            for b in pairs.iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows and b.num_columns
        ]
        df = plr.from_arrow(pa.concat_tables(tabs)).unique()
        df = df.join(
            df.group_by("user_id").agg(plr.col("d").min().alias("cohort_d")),
            on="user_id",
        ).with_columns((plr.col("d") - plr.col("cohort_d")).alias("day_offset"))
        out = (
            df.filter(
                (plr.col("day_offset") >= 0) & (plr.col("day_offset") <= max_offset)
            )
            .group_by(["cohort_d", "day_offset"])
            .len("n_users")
            .with_columns(
                (plr.col("cohort_d") * US_PER_DAY)
                .cast(plr.Datetime("us"))
                .dt.date()
                .cast(plr.Utf8)
                .alias("cohort_day")
            )
            .select(["cohort_day", "day_offset", "n_users"])
        )
        return ray.data.from_arrow(out.to_arrow().cast(schema))

    # exchange 1: globally distinct (user, day) activity pairs — reused
    # by both the cohort derivation and the offset count, so material-
    # ized ONCE (size bounded by users × distinct active days, ≪ events)
    uniq = drop_empty_blocks(
        pairs.groupby(["user_id", "d"]).count().materialize()
    )
    if uniq is None:
        return ray.data.from_arrow(schema.empty_table())

    def strip_count(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()), "d": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "user_id": pc.cast(batch["user_id"], pa.int64()),
                "d": pc.cast(batch["d"], pa.int64()),
            }
        )

    uniq = uniq.map_batches(
        strip_count, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def partial_min(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()), "d": pa.array([], pa.int64())}
            )
        g = batch.group_by("user_id").aggregate([("d", "min")])
        return pa.table({"user_id": g["user_id"], "d": g["d_min"]})

    # exchange 2: first day per user, from the deduped pairs
    firsts = drop_empty_blocks(
        uniq.map_batches(partial_min, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .min("d")
        .materialize()
    )
    if firsts is None:
        return ray.data.from_arrow(schema.empty_table())

    def rename_min(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()), "cohort_d": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "user_id": pc.cast(batch["user_id"], pa.int64()),
                "cohort_d": pc.cast(batch["min(d)"], pa.int64()),
            }
        )

    firsts = firsts.map_batches(
        rename_min, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def count_partial(batch: pa.Table) -> pa.Table:
        """cohort attach + offset filter + per-block (cohort, offset)
        partial counts, over globally-distinct (user, day) pairs."""
        empty = pa.table(
            {
                "cohort_d": pa.array([], pa.int64()),
                "day_offset": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or "cohort_d" not in batch.column_names:
            return empty
        off = pc.subtract(
            pc.cast(batch["d"], pa.int64()), pc.cast(batch["cohort_d"], pa.int64())
        )
        t = pa.table({"cohort_d": pc.cast(batch["cohort_d"], pa.int64()), "day_offset": off})
        keep = pc.and_(pc.greater_equal(off, 0), pc.less_equal(off, max_offset))
        g = t.filter(keep).group_by(["cohort_d", "day_offset"]).aggregate(
            [("day_offset", "count")]
        )
        return pa.table(
            {
                "cohort_d": g["cohort_d"],
                "day_offset": g["day_offset"],
                "cnt": pc.cast(g["day_offset_count"], pa.int64()),
            }
        )

    n_users = firsts.count()
    if n_users <= broadcast_rows:
        import polars as plr

        tabs = [
            b
            for b in firsts.iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows and b.num_columns
        ]
        lut_ref = ray.put(plr.from_arrow(pa.concat_tables(tabs)))

        def attach_and_count(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return count_partial(batch)
            import polars as plr

            df = plr.from_arrow(batch).join(ray.get(lut_ref), on="user_id", how="inner")
            return count_partial(df.to_arrow().combine_chunks())

        cparts = uniq.map_batches(
            attach_and_count, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        joined = uniq.join(firsts, "inner", num_partitions, on=("user_id",))
        cparts = joined.map_batches(
            count_partial, batch_format="pyarrow", zero_copy_batch=True
        )

    # exchange 3 (tiny): at most cohorts × offsets rows per block
    agg = drop_empty_blocks(
        cparts.groupby(["cohort_d", "day_offset"]).sum("cnt").materialize()
    )
    if agg is None:
        return ray.data.from_arrow(schema.empty_table())

    def final(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return schema.empty_table()
        day_str = pc.cast(
            pc.cast(
                pc.multiply(pc.cast(batch["cohort_d"], pa.int64()), US_PER_DAY),
                pa.timestamp("us"),
            ),
            pa.date32(),
        )
        return pa.table(
            {
                "cohort_day": pc.cast(day_str, pa.string()),
                "day_offset": pc.cast(batch["day_offset"], pa.int64()),
                "n_users": pc.cast(batch["sum(cnt)"], pa.int64()),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow", zero_copy_batch=True)


def events_window_counts(sf_dir: str, *, window_s: int = 3600, forced_shuffle: bool = False):
    """Tumbling-window event counts per user: (user_id, window_start
    epoch-seconds, n_events).  The window bucket is a pure vectorized
    map; the count goes through the map-side combiner so the exchange
    (or driver fold at small scale) sees distinct (user, window) keys
    per block, not one row per event."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def bucket(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64())  # microseconds
        win = pc.multiply(
            pc.divide(us, pa.scalar(window_s * 1_000_000, pa.int64())),
            pa.scalar(window_s, pa.int64()),
        )
        return pa.table(
            {
                "user_id": pc.cast(batch["user_id"], pa.int64()),
                "window_start": win,
            }
        )

    bucketed = ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
    schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("window_start", pa.int64()),
            ("n_events", pa.int64()),
        ]
    )
    return _preagg_count(
        bucketed,
        ["user_id", "window_start"],
        schema,
        "n_events",
        forced_shuffle=forced_shuffle,
    )


def _preagg_sum(
    ds,
    key_cols: List[str],
    schema: pa.Schema,
    value_col,
    out_col,
    *,
    driver_rows_bound: int = 2_000_000,
    forced_shuffle: bool = False,
):
    """Like :func:`_preagg_count` but summing existing partial columns
    — for inputs that are ALREADY per-block partials (the
    combiner-of-combiners shape).  ``value_col``/``out_col`` may be a
    single name or parallel lists for multi-metric rollups."""
    import polars as plr
    import ray.data

    value_cols = [value_col] if isinstance(value_col, str) else list(value_col)
    out_cols = [out_col] if isinstance(out_col, str) else list(out_col)

    parts = ds.materialize()
    n = parts.count()
    if n == 0:
        return ray.data.from_arrow(schema.empty_table())
    if not forced_shuffle and n <= driver_rows_bound:
        tabs = [
            b
            for b in parts.iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows and b.num_columns
        ]
        df = (
            plr.from_arrow(pa.concat_tables(tabs))
            .group_by(key_cols)
            .agg(
                *[
                    plr.col(v).sum().alias(o)
                    for v, o in zip(value_cols, out_cols)
                ]
            )
        )
        return ray.data.from_arrow(df.to_arrow().cast(schema))
    out = parts.groupby(key_cols).sum(value_cols)
    return _clean_groupby_output(
        out, schema, {o: f"sum({v})" for v, o in zip(value_cols, out_cols)}
    )


def events_hopping_counts(
    sf_dir: str,
    *,
    window_s: int = 7200,
    hop_s: int = 3600,
    forced_shuffle: bool = False,
):
    """Hopping (sliding) window event counts per event_type: windows of
    ``window_s`` seconds starting every ``hop_s`` seconds (``window_s``
    must be a multiple of ``hop_s``).  Each event lands in exactly
    ``k = window_s/hop_s`` overlapping windows.

    The k-fold expansion happens AFTER the per-block aggregation, not
    before: each block first folds to distinct (event_type, base-hop)
    partial counts, then k shifted copies of those PARTIALS are emitted
    — the exchange moves k x distinct-keys-per-block rows, never k x
    events.  SQL twin: UNION ALL of the k shifted tumbling windows."""
    if window_s % hop_s != 0:
        raise ValueError("window_s must be a multiple of hop_s")
    k = window_s // hop_s
    import polars as plr
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
    part_schema = pa.schema(
        [("event_type", pa.string()), ("window_start", pa.int64()), ("cnt", pa.int64())]
    )

    def combine_then_expand(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        us = pc.cast(batch["ts"], pa.int64())  # microseconds
        base = pc.multiply(
            pc.divide(us, pa.scalar(hop_s * 1_000_000, pa.int64())),
            pa.scalar(hop_s, pa.int64()),
        )
        df = (
            plr.from_arrow(
                pa.table(
                    {"event_type": pc.cast(batch["event_type"], pa.string()), "base": base}
                )
            )
            .group_by(["event_type", "base"])
            .len("cnt")
        )
        parts = [
            df.select(
                plr.col("event_type"),
                (plr.col("base") - i * hop_s).alias("window_start"),
                plr.col("cnt"),
            )
            for i in range(k)
        ]
        return plr.concat(parts).to_arrow().cast(part_schema)

    partials = ds.map_batches(
        combine_then_expand, batch_format="pyarrow", zero_copy_batch=True
    )
    schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("window_start", pa.int64()),
            ("n_events", pa.int64()),
        ]
    )
    return _preagg_sum(
        partials,
        ["event_type", "window_start"],
        schema,
        "cnt",
        "n_events",
        forced_shuffle=forced_shuffle,
    )


def source_stats(sf_dir: str, *, forced_shuffle: bool = False):
    """Per-source corpus rollup (n_docs, total tokens, total chars) —
    the mix-composition dashboard numbers.  One per-block polars
    combiner folds each block to distinct sources BEFORE the exchange;
    the adaptive merge then sums partials (driver fold below the bound,
    ``groupby().sum`` above)."""
    import polars as plr
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"], override_num_blocks=32
    )
    part_schema = pa.schema(
        [
            ("source", pa.string()),
            ("n_docs", pa.int64()),
            ("sum_tokens", pa.int64()),
            ("sum_chars", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        toks = pc.cast(pc.count_substring_regex(batch["text"], r"\S+"), pa.int64())
        chars = pc.cast(pc.utf8_length(batch["text"]), pa.int64())
        df = (
            plr.from_arrow(
                pa.table(
                    {
                        "source": pc.cast(batch["source"], pa.string()),
                        "toks": toks,
                        "chars": chars,
                    }
                )
            )
            .group_by("source")
            .agg(
                plr.len().alias("n_docs"),
                plr.col("toks").sum().alias("sum_tokens"),
                plr.col("chars").sum().alias("sum_chars"),
            )
        )
        return df.to_arrow().cast(part_schema)

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    cols = ["n_docs", "sum_tokens", "sum_chars"]
    return _preagg_sum(
        parts, ["source"], part_schema, cols, cols, forced_shuffle=forced_shuffle
    )


def orders_rollup(sf_dir: str, *, forced_shuffle: bool = False):
    """``GROUP BY ROLLUP(o_orderstatus, o_orderpriority)``: order counts
    + integer-cent revenue at the (status, priority), (status, ALL) and
    (ALL, ALL) levels, rollup slots labeled ``'ALL'``.

    Scale shape: the input crosses ONE exchange — the finest-level
    pre-aggregated merge (per-block partials mean distinct keys per
    block travel, not one row per order); the coarser rollup levels
    derive from that finest aggregate (|status| × |priority| rows — the
    rollup dimensions are low-cardinality by construction) on the
    driver, never from a second pass over the input.  Cents are rounded
    PER ROW then summed as Int64, so the result is independent of float
    summation order."""
    import polars as plr
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )
    keys = ["o_orderstatus", "o_orderpriority"]
    schema = pa.schema(
        [
            ("o_orderstatus", pa.string()),
            ("o_orderpriority", pa.string()),
            ("n_orders", pa.int64()),
            ("sum_cents", pa.int64()),
        ]
    )
    part_schema = pa.schema(
        [
            ("o_orderstatus", pa.string()),
            ("o_orderpriority", pa.string()),
            ("cnt", pa.int64()),
            ("cents", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        cents = pc.cast(
            pc.round(pc.multiply(batch["o_totalprice"], pa.scalar(100.0))), pa.int64()
        )
        df = (
            plr.from_arrow(
                pa.table(
                    {
                        "o_orderstatus": pc.cast(batch["o_orderstatus"], pa.string()),
                        "o_orderpriority": pc.cast(batch["o_orderpriority"], pa.string()),
                        "cents": cents,
                    }
                )
            )
            .group_by(keys)
            .agg(plr.len().alias("cnt"), plr.col("cents").sum().alias("cents"))
        )
        return df.select([*keys, "cnt", "cents"]).to_arrow().cast(part_schema)

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    fine = _preagg_sum(
        parts,
        keys,
        schema,
        ["cnt", "cents"],
        ["n_orders", "sum_cents"],
        forced_shuffle=forced_shuffle,
    )
    tabs = [
        b
        for b in fine.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows and b.num_columns
    ]
    if not tabs:
        return ray.data.from_arrow(schema.empty_table())
    df = plr.from_arrow(pa.concat_tables(tabs))
    aggs = [
        plr.col("n_orders").sum().alias("n_orders"),
        plr.col("sum_cents").sum().alias("sum_cents"),
    ]
    lvl1 = df.group_by("o_orderstatus").agg(*aggs).with_columns(
        plr.lit("ALL").alias("o_orderpriority")
    )
    lvl0 = df.select(aggs).with_columns(
        plr.lit("ALL").alias("o_orderstatus"), plr.lit("ALL").alias("o_orderpriority")
    )
    out = plr.concat([x.select(schema.names) for x in (df, lvl1, lvl0)])
    return ray.data.from_arrow(out.to_arrow().cast(schema))


def events_type_pivot(
    sf_dir: str,
    types: Sequence[str] = ("click", "error", "purchase", "signup", "view"),
    *,
    forced_shuffle: bool = False,
):
    """Pivot ``event_type`` into per-user count columns (conditional
    aggregation over a FIXED, caller-declared column set — a pivot whose
    output schema depends on observed data would need a separate
    distinct pass; declaring ``types`` keeps it one streaming exchange
    of per-block partial pivots)."""
    import polars as plr
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    n_cols = [f"n_{t}" for t in types]
    schema = pa.schema([("user_id", pa.int64())] + [(c, pa.int64()) for c in n_cols])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return schema.empty_table()
        df = (
            plr.from_arrow(
                pa.table(
                    {
                        "user_id": pc.cast(batch["user_id"], pa.int64()),
                        "event_type": pc.cast(batch["event_type"], pa.string()),
                    }
                )
            )
            .group_by("user_id")
            .agg(
                *[
                    (plr.col("event_type") == t).sum().cast(plr.Int64).alias(c)
                    for t, c in zip(types, n_cols)
                ]
            )
        )
        return df.select(schema.names).to_arrow().cast(schema)

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return _preagg_sum(
        parts, ["user_id"], schema, n_cols, n_cols, forced_shuffle=forced_shuffle
    )


def events_user_running(sf_dir: str, *, forced_shuffle: bool = False):
    """Per-user RUNNING aggregates — the cumulative-window operator:
    for every event, its 1-based position and the running integer-cent
    value sum within its user's timeline ordered by (ts, event_id) (the
    unique id breaks timestamp ties deterministically — SQL
    ``SUM(...) OVER (PARTITION BY user_id ORDER BY ts, event_id)``).

    Partitioning: per-user grouping through the adaptive
    ``util.grouped_apply`` (driver argsort below the broadcast bound,
    one ``groupby.map_groups`` hash exchange above); the per-group
    running fold is a vectorized numpy lexsort + cumsum — window state
    never leaves the group."""
    import numpy as np
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("run_n", pa.int64()),
            ("run_cents", pa.int64()),
        ]
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": pc.cast(batch["event_id"], pa.int64()),
                "ts_us": pc.cast(batch["ts"], pa.int64()),
                "user_id": pc.cast(batch["user_id"], pa.int64()),
                "cents": pc.cast(
                    pc.round(pc.multiply(batch["value"], pa.scalar(100.0))), pa.int64()
                ),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    def running(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return out_schema.empty_table()
        eid = np.asarray(group["event_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        ts = np.asarray(group["ts_us"].to_numpy(zero_copy_only=False), dtype=np.int64)
        cents = np.asarray(group["cents"].to_numpy(zero_copy_only=False), dtype=np.int64)
        uid = group["user_id"][0].as_py()
        order = np.lexsort((eid, ts))
        return pa.table(
            {
                "event_id": pa.array(eid[order], pa.int64()),
                "user_id": pa.array(np.full(n, uid, dtype=np.int64)),
                "run_n": pa.array(np.arange(1, n + 1, dtype=np.int64)),
                "run_cents": pa.array(np.cumsum(cents[order]), pa.int64()),
            }
        )

    from ..util import grouped_apply

    return grouped_apply(
        prepped, "user_id", running, out_schema, forced_shuffle=forced_shuffle
    )
