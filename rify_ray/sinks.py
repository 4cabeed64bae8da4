"""Resumable partitioned Parquet sink.

A 100 TB output must never be one giant file or one all-or-nothing
write: it is written as one directory per hash bucket of the row key,
each committed with a ``_SUCCESS`` marker, so a failed run reruns and
SKIPS every finished bucket instead of rewriting the world — the same
atomic-marker discipline as :class:`rify_ray.state.TripleStore`
generations and the fixpoint checkpoints (``engine.Fixpoint``).

The reference has no I/O at all (its API is in-memory slices,
``/root/reference/src/infer.rs:9-12``); this sink is part of the
graft-mandated scale surface (SURVEY.md §4: "idempotent iteration
outputs", "write-once per iteration directory").
"""

from __future__ import annotations

import os
import shutil
from typing import List, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from .util import hash_rows_mod_fn

BUCKET_COL = "__bucket"


def write_partitioned_parquet(
    ds,
    path: str,
    *,
    key_cols: Sequence[str],
    num_buckets: int = 64,
    skip_complete: bool = True,
) -> dict:
    """Write ``ds`` as hash-bucketed Parquet under ``path`` —
    ``bucket=K/`` directories, each marked with ``_SUCCESS`` once its
    files are durable.

    Resume semantics (``skip_complete=True``, the default): buckets
    whose marker exists are PRUNED from the write with a vectorized
    per-batch filter (their rows never leave the scan); buckets left
    incomplete by a crashed attempt are wiped and rewritten, so a rerun
    converges to exactly-once output per bucket.  The bucket is the
    shared row-hash kernel (:func:`rify_ray.util.hash_rows_mod_fn`), so
    the same row always lands in the same bucket across runs — the
    property resume correctness rests on.

    Returns ``{"written": [...], "skipped": [...], "rows_written": n}``.

    The first write persists ``{key_cols, num_buckets}`` in a
    ``_sink_manifest.json``; a resume under DIFFERENT values would skip
    buckets computed under the old mapping and silently drop or
    duplicate rows, so a mismatch raises instead.
    """
    import json

    os.makedirs(path, exist_ok=True)
    manifest_path = os.path.join(path, "_sink_manifest.json")
    wanted = {"key_cols": list(key_cols), "num_buckets": int(num_buckets)}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            have = json.load(f)
        if skip_complete and have != wanted:
            raise ValueError(
                f"resume mismatch at {path}: existing buckets were written with "
                f"{have}, this call passes {wanted} — rows would be skipped or "
                "duplicated under the new mapping; use a fresh path or "
                "skip_complete=False to rewrite"
            )
        if not skip_complete and have != wanted:
            os.remove(manifest_path)
    if not os.path.exists(manifest_path):
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(wanted, f)
        os.replace(tmp, manifest_path)
    done: List[int] = []
    if skip_complete:
        for name in os.listdir(path):
            if name.startswith("bucket=") and os.path.exists(
                os.path.join(path, name, "_SUCCESS")
            ):
                done.append(int(name.split("=", 1)[1]))
    # wipe partial output of incomplete buckets AND any crash-leftover
    # Ray staging dirs (the hive-style `__bucket=K` dirs a crashed
    # attempt leaves before the rename below) — Ray appends UUID-named
    # files, so stale dirs would publish duplicates on resume
    for name in list(os.listdir(path)):
        if name.startswith(f"{BUCKET_COL}="):
            shutil.rmtree(os.path.join(path, name), ignore_errors=True)
        elif name.startswith("bucket="):
            b = int(name.split("=", 1)[1])
            if b not in done:
                shutil.rmtree(os.path.join(path, name), ignore_errors=True)

    bucketed = ds.map_batches(
        hash_rows_mod_fn(list(key_cols), num_buckets, BUCKET_COL),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if done:
        done_arr = pa.array(done, pa.int32())

        def prune(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.invert(pc.is_in(batch[BUCKET_COL], value_set=done_arr))
            )

        bucketed = bucketed.map_batches(
            prune, batch_format="pyarrow", zero_copy_batch=True
        )
    bucketed = bucketed.materialize()
    rows = bucketed.count()
    written: List[int] = []
    if rows == 0 and not done:
        # a successful write of an EMPTY dataset must still be readable:
        # persist the schema (sans bucket col) so read_partitioned_parquet
        # can return an empty Dataset instead of failing
        import pyarrow.parquet as pq

        # a fully-empty materialized pipeline may carry no schema; fall
        # back to the input dataset's
        sch = bucketed.schema() or ds.schema()
        schema = pa.schema([f for f in sch.base_schema if f.name != BUCKET_COL])
        tmp = os.path.join(path, "_empty.parquet.tmp")
        pq.write_table(schema.empty_table(), tmp)
        os.replace(tmp, os.path.join(path, "_empty.parquet"))
    if rows:
        bucketed.write_parquet(path, partition_cols=[BUCKET_COL])
        for name in os.listdir(path):
            if name.startswith(f"{BUCKET_COL}="):
                # normalize Ray's hive dir name to the stable bucket= form
                b = int(name.split("=", 1)[1])
                target = os.path.join(path, f"bucket={b}")
                shutil.rmtree(target, ignore_errors=True)
                os.replace(os.path.join(path, name), target)
                written.append(b)
        for b in written:
            with open(os.path.join(path, f"bucket={b}", "_SUCCESS"), "w") as f:
                f.write("")
    return {"written": sorted(written), "skipped": sorted(done), "rows_written": int(rows)}


def read_partitioned_parquet(path: str, columns: Optional[List[str]] = None):
    """Read back every COMPLETE bucket (has ``_SUCCESS``) as one
    streaming Dataset; incomplete buckets from a crashed write are
    invisible."""
    import ray.data

    files: List[str] = []
    for name in sorted(os.listdir(path)):
        d = os.path.join(path, name)
        if not name.startswith("bucket=") or not os.path.exists(
            os.path.join(d, "_SUCCESS")
        ):
            continue
        files.extend(
            os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
        )
    if not files:
        empty = os.path.join(path, "_empty.parquet")
        if os.path.exists(empty):
            return ray.data.read_parquet([empty], columns=columns)
        raise FileNotFoundError(f"no complete buckets under {path}")
    return ray.data.read_parquet(files, columns=columns)
