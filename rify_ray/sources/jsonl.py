"""JSONL (newline-delimited JSON) corpus interchange: the most common
wire format for web-scale document dumps (one JSON object per line).

Scale shape: the reader is ``read_text`` → one ``map_batches`` parse per
block, so parsing parallelizes with the read and the Dataset streams —
no driver materialization.  The fast path batch-parses each block with
``pyarrow.json`` (vectorized C++ NDJSON parse, zero-copy into Arrow);
``on_error="skip"`` switches to a per-line tolerant path that drops
malformed lines (documented slower — validation is inherently
per-line).  The writer mirrors :func:`rify_ray.sources.write_nquads`'s
part-file discipline: distributed formatting, driver-streamed bounded
writes, stale parts cleared, tmp+rename commits.
"""

from __future__ import annotations

import io
from typing import Optional

import pyarrow as pa


def _parse_fast_fn(schema: Optional[pa.Schema]):
    import pyarrow.json as pj

    parse_opts = pj.ParseOptions(explicit_schema=schema) if schema is not None else None

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # schema=None: a zero-column empty block, NEVER the raw
            # ('text') passthrough — consumers strip empties, but a
            # wrong-schema block would break schema unification
            return schema.empty_table() if schema is not None else pa.table({})
        buf = ("\n".join(batch["text"].to_pylist()) + "\n").encode("utf-8")
        tbl = pj.read_json(
            io.BytesIO(buf),
            parse_options=parse_opts,
        )
        return tbl.select(schema.names).cast(schema) if schema is not None else tbl

    return fn


def _reject_constant(_s):
    raise ValueError("non-spec JSON constant (NaN/Infinity)")


def _parse_skip_fn(schema: Optional[pa.Schema]):
    import json

    import pyarrow.json as pj

    parse_opts = pj.ParseOptions(explicit_schema=schema) if schema is not None else None

    def parse_lines(lines):
        buf = ("\n".join(lines) + "\n").encode("utf-8")
        tbl = pj.read_json(io.BytesIO(buf), parse_options=parse_opts)
        return tbl.select(schema.names).cast(schema) if schema is not None else tbl

    def fn(batch: pa.Table) -> pa.Table:
        good = []
        for line in batch["text"].to_pylist():
            if not line.strip():
                continue
            try:
                # parse_constant rejects NaN/Infinity — json.loads is
                # laxer than pyarrow.json, and a line accepted here but
                # rejected there would crash the whole block
                obj = json.loads(line, parse_constant=_reject_constant)
            except ValueError:
                continue
            if isinstance(obj, dict):
                good.append(line)
        if not good:
            return schema.empty_table() if schema is not None else pa.table({})
        try:
            return parse_lines(good)
        except pa.ArrowInvalid:
            # a line json.loads accepted still failed the Arrow parse
            # (e.g. a value conflicting with the explicit schema) —
            # fall back to per-line parsing and drop the offenders
            kept = []
            for line in good:
                try:
                    kept.append(parse_lines([line]))
                except pa.ArrowInvalid:
                    continue
            if not kept:
                return schema.empty_table() if schema is not None else pa.table({})
            if schema is not None:
                return pa.concat_tables(kept)
            # schema=None: per-line inference can disagree (missing
            # keys) — unify permissively instead of crashing
            return pa.concat_tables(kept, promote_options="permissive")

    return fn


def read_jsonl(path, *, schema: Optional[pa.Schema] = None, on_error: str = "error", **read_kwargs):
    """JSONL file(s)/dir → Dataset.  Pass ``schema`` to pin column
    names/types across blocks (otherwise each block infers its own —
    fine for homogeneous dumps, required to be stable for heterogeneous
    ones).  ``on_error="skip"`` drops unparseable/non-object lines.

    Line-splitting caveat: the underlying ``read_text`` splits on
    unicode line boundaries, so a foreign file carrying RAW U+2028 /
    U+2029 inside string values will break mid-record — re-emit such
    files with those code points escaped (``\\u2028``), which is what
    :func:`write_jsonl` does."""
    import ray.data

    if on_error not in ("error", "skip"):
        raise ValueError(f"on_error must be 'error' or 'skip', got {on_error!r}")
    ds = ray.data.read_text(path, **read_kwargs)
    fn = _parse_skip_fn(schema) if on_error == "skip" else _parse_fast_fn(schema)
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _format_fn(batch: pa.Table) -> pa.Table:
    import polars as pl
    import pyarrow.compute as pc

    if batch.num_rows == 0:
        return pa.table({"line": pa.array([], pa.string())})
    buf = io.BytesIO()
    pl.from_arrow(batch).write_ndjson(buf)
    # split on \n ONLY — str.splitlines() also splits on U+2028/U+2029,
    # which JSON may carry raw inside string values
    lines = buf.getvalue().decode("utf-8").split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    arr = pa.array(lines, pa.string())
    # escape U+2028/U+2029 (legal raw in JSON strings, but line-split by
    # newline-delimited readers incl. ray.data.read_text — the standard
    # JS-compat escaping): raw separators only occur inside string
    # values after serialization, so this rewrite preserves JSON
    # semantics exactly
    arr = pc.replace_substring(arr, "\u2028", "\\u2028")
    arr = pc.replace_substring(arr, "\u2029", "\\u2029")
    return pa.table({"line": arr})


def write_jsonl(ds, path: str) -> int:
    """Dataset → JSONL part files under directory ``path`` (distributed
    vectorized formatting via polars ``write_ndjson``, driver-streamed
    bounded part writes, stale parts cleared, tmp+rename commits).
    Returns the number of rows written."""
    import os

    os.makedirs(path, exist_ok=True)
    # materialize the formatted lines BEFORE clearing the destination:
    # an in-place rewrite (ds = read_jsonl(p); write_jsonl(ds, p)) would
    # otherwise delete its own lazy input's files before the read runs
    lines = ds.map_batches(
        _format_fn, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    for n in os.listdir(path):
        if n.endswith(".jsonl") or n.endswith(".jsonl.tmp"):
            os.remove(os.path.join(path, n))
    total = 0
    for i, batch in enumerate(
        lines.iter_batches(batch_size=65536, batch_format="pyarrow")
    ):
        if batch.num_rows == 0:
            continue
        part = os.path.join(path, f"part-{i:05d}.jsonl")
        with open(part + ".tmp", "w", encoding="utf-8") as f:
            f.write("\n".join(batch["line"].to_pylist()))
            f.write("\n")
        os.replace(part + ".tmp", part)
        total += batch.num_rows
    return total
