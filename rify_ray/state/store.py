"""Hash-partitioned, parquet-backed quad store — the distributed
``Reasoner`` fact log (reference ``src/reasoner.rs:86-127``) as durable
state.

Layout (BASELINE.json ``north_rule``: "resumable from checkpoint with
per-partition lineage + metrics")::

    <path>/
      manifest.json                 # generations, counts, partitioning
      gen=00000/part=<k>/*.parquet  # generation 0 (first add), hash-partitioned
      gen=00001/part=<k>/*.parquet  # generation 1 (second add), ...

Each ``add`` writes one new immutable *generation*: the incoming quads
are deduped, anti-joined against the current store (insert-if-absent —
``Reasoner::insert``), tagged with ``part = hash64(s,p,o,g) % P``, and
written partitioned by ``part``.  A crashed ``add`` leaves no manifest
entry, so the store never observes half-written generations: resuming
re-runs the add idempotently (the anti-join re-drops what landed).

Reads are ``ray.data.read_parquet`` over all committed generations —
streaming, column-prunable, spillable.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import pyarrow as pa

QUAD_COLS = ["s", "p", "o", "g"]


def _hash_part_fn(num_partitions: int):
    """Vectorized ``part = hash64(s,p,o,g) % P`` — shared kernel with the
    salted-join probe (:func:`rify_ray.util.hash_rows_mod_fn`); no Python
    loop on the per-quad write path."""
    from ..util import hash_rows_mod_fn

    return hash_rows_mod_fn(QUAD_COLS, num_partitions, "part")


class TripleStore:
    """Durable distributed quad store with exact insert-if-absent.

    ``value_type`` is ``"string"`` (raw IRI terms) or ``"int64"``
    (dictionary-encoded term ids — see ``engine.infer_store``'s
    ``dict_encode``; the ``(term, tid)`` table then lives under
    ``<path>/terms/`` and :meth:`decoded_dataset` joins it back)."""

    def __init__(self, path: str, num_partitions: int = 64, value_type: str = "string"):
        self.path = path
        os.makedirs(path, exist_ok=True)
        self.manifest_path = os.path.join(path, "manifest.json")
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                self.manifest = json.load(f)
            self.num_partitions = self.manifest["num_partitions"]
            self.value_type = self.manifest.get("value_type", "string")
        else:
            self.num_partitions = num_partitions
            self.value_type = value_type
            self.manifest = {
                "num_partitions": num_partitions,
                "value_type": value_type,
                "generations": [],  # [{gen, rows, metrics}]
            }

    @property
    def _arrow_value_type(self):
        return pa.int64() if self.value_type == "int64" else pa.string()

    def quad_schema(self) -> pa.Schema:
        return pa.schema([(c, self._arrow_value_type) for c in QUAD_COLS])

    @property
    def terms_dir(self) -> str:
        return os.path.join(self.path, "terms")

    # -- reads --------------------------------------------------------------

    @property
    def generations(self) -> List[Dict]:
        return self.manifest["generations"]

    def count(self) -> int:
        return sum(g["rows"] for g in self.generations)

    def dataset(
        self,
        columns: Optional[List[str]] = None,
        *,
        first_gen: int = 0,
        last_gen: Optional[int] = None,
    ):
        """Streaming Dataset over committed generations
        ``[first_gen, last_gen]`` (inclusive; default: all).  Column
        pruning supported."""
        import ray.data

        gens = self.generations[first_gen : (last_gen + 1 if last_gen is not None else None)]
        # Ray's read_parquet rejects a list of >1 DIRECTORIES — expand the
        # committed generations to concrete parquet file paths
        files: List[str] = []
        for g in gens:
            gen_dir = os.path.join(self.path, f"gen={g['gen']:05d}")
            for root, _dirs, names in os.walk(gen_dir):
                files.extend(
                    os.path.join(root, n) for n in names if n.endswith(".parquet")
                )
        if not files:
            return ray.data.from_arrow(self.quad_schema().empty_table())
        return ray.data.read_parquet(sorted(files), columns=columns or QUAD_COLS)

    def decoded_dataset(self, **kw):
        """Like :meth:`dataset`, but with dictionary-encoded term ids
        joined back to term strings.  A no-op for string-typed stores.

        The terms table is broadcast (``ray.put`` once, read per block)
        — the small-side join pattern; a deployment whose term dictionary
        outgrows one worker's heap should co-partition facts and terms by
        ``hash(tid)`` and join per partition instead."""
        ds = self.dataset(**kw)
        if self.value_type != "int64" or not os.path.isdir(self.terms_dir):
            return ds
        import polars as pl
        import pyarrow.parquet as pq
        import ray

        from ..util import polars_to_arrow_string

        files = sorted(
            os.path.join(self.terms_dir, n)
            for n in os.listdir(self.terms_dir)
            if n.endswith(".parquet")
        )
        terms = pl.from_arrow(
            pa.concat_tables([pq.read_table(f) for f in files])
        )
        ref = ray.put(terms)

        def decode(batch: pa.Table) -> pa.Table:
            t: pl.DataFrame = ray.get(ref)
            df = pl.from_arrow(batch)
            extra = [c for c in df.columns if c not in QUAD_COLS]
            for c in QUAD_COLS:
                df = (
                    df.join(t, left_on=c, right_on="tid", how="left")
                    .drop(c)
                    .rename({"term": c})
                )
            return polars_to_arrow_string(df.select([*QUAD_COLS, *extra]))

        return ds.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)

    def contains(self, quads: pa.Table) -> pa.Table:
        """Semi-join membership check (``Reasoner::contains``,
        src/reasoner.rs:98-101): returns the subset of ``quads`` present
        in the store."""
        import ray.data

        from ..util import drop_empty_blocks

        probe = ray.data.from_arrow(quads.select(QUAD_COLS)).materialize()
        store = self.dataset().materialize()
        if store.count() == 0 or probe.count() == 0:
            return self.quad_schema().empty_table()
        hit = probe.join(store, "left_semi", 8, on=tuple(QUAD_COLS))
        batches = list(hit.iter_batches(batch_size=None, batch_format="pyarrow"))
        if not batches:
            return self.quad_schema().empty_table()
        return pa.concat_tables(batches)

    # -- writes -------------------------------------------------------------

    def add(self, quads_ds, *, precleaned: bool = False, extra: Optional[Dict] = None) -> Dict:
        """Insert-if-absent a Dataset (or arrow Table) of quads as one
        new generation; returns per-add metrics.  Idempotent on retry:
        an uncommitted generation directory is ignored and overwritten.

        ``precleaned=True`` skips the dedup + anti-join (caller
        guarantees the quads are already duplicate-free and absent from
        the store — e.g. a fixpoint round's delta, which went through
        exactly those exchanges already).
        """
        import time

        import ray.data

        from ..util import distinct, drop_empty_blocks

        t0 = time.monotonic()
        if isinstance(quads_ds, pa.Table):
            quads_ds = ray.data.from_arrow(quads_ds)
        if precleaned:
            incoming = drop_empty_blocks(
                quads_ds.select_columns(QUAD_COLS).materialize()
            )
            if incoming is None:
                return {"added": 0, "sec": round(time.monotonic() - t0, 3)}
        else:
            incoming = distinct(
                quads_ds.select_columns(QUAD_COLS), QUAD_COLS, schema=self.quad_schema()
            )
            if incoming is None:
                return {"added": 0, "sec": 0.0}
            incoming = incoming.materialize()
            if self.count() > 0:
                store = self.dataset().materialize()
                incoming = incoming.join(
                    store, "left_anti", max(8, self.num_partitions // 8), on=tuple(QUAD_COLS)
                ).materialize()
                incoming = drop_empty_blocks(incoming)
                if incoming is None:
                    return {"added": 0, "sec": round(time.monotonic() - t0, 3)}

        gen = len(self.generations)
        gen_dir = os.path.join(self.path, f"gen={gen:05d}")
        # a crashed previous attempt may have left partial files in this
        # (uncommitted) generation dir; write_parquet adds new UUID-named
        # files alongside instead of replacing, so clear it first
        import shutil

        shutil.rmtree(gen_dir, ignore_errors=True)
        parted = incoming.map_batches(
            _hash_part_fn(self.num_partitions),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        parted.write_parquet(gen_dir, partition_cols=["part"])
        added = incoming.count()
        metrics = {
            "added": int(added),
            "sec": round(time.monotonic() - t0, 3),
            **(extra or {}),
        }
        # commit: manifest write is the atomic commit point
        self.manifest["generations"].append({"gen": gen, "rows": int(added), "metrics": metrics})
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f)
        os.replace(tmp, self.manifest_path)
        return metrics

    def add_small(self, df, *, extra: Optional[Dict] = None) -> Dict:
        """Commit a SMALL, precleaned polars frame of quads as one new
        generation without any distributed execution: the hash-partition
        column comes from the same shared kernel as :func:`_hash_part_fn`
        and per-part files are written driver-side.  Layout and manifest
        semantics are identical to :meth:`add` — used by the hybrid
        fixpoint for per-round deltas already known to be duplicate-free
        and absent from the store."""
        import shutil
        import time

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from ..util import hash_rows_mod_fn, polars_to_arrow_string

        t0 = time.monotonic()
        if df.height == 0:
            return {"added": 0, "sec": 0.0}
        gen = len(self.generations)
        gen_dir = os.path.join(self.path, f"gen={gen:05d}")
        shutil.rmtree(gen_dir, ignore_errors=True)  # stale crashed attempt
        # stay in arrow `string` (not polars large_string) so every file
        # in the store reads back with one schema
        tbl = hash_rows_mod_fn(QUAD_COLS, self.num_partitions, "part")(
            polars_to_arrow_string(df.select(QUAD_COLS))
        )
        parts = tbl["part"]
        for part in pc.unique(parts).to_pylist():
            sub = tbl.filter(pc.equal(parts, part)).drop_columns(["part"])
            d = os.path.join(gen_dir, f"part={part}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(sub, os.path.join(d, "data.parquet"))
        metrics = {
            "added": int(df.height),
            "sec": round(time.monotonic() - t0, 3),
            **(extra or {}),
        }
        self.manifest["generations"].append(
            {"gen": gen, "rows": int(df.height), "metrics": metrics}
        )
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f)
        os.replace(tmp, self.manifest_path)
        return metrics

    def compact(self) -> None:
        """Rewrite all generations as one (drops tombstone-free history;
        metrics preserved in the manifest)."""
        import ray.data

        if len(self.generations) <= 1:
            return
        import shutil

        ds = self.dataset().materialize()
        gen = len(self.generations)
        gen_dir = os.path.join(self.path, f"gen={gen:05d}")
        shutil.rmtree(gen_dir, ignore_errors=True)  # stale uncommitted attempt
        parted = ds.map_batches(
            _hash_part_fn(self.num_partitions),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        parted.write_parquet(gen_dir, partition_cols=["part"])
        total = ds.count()
        old_dirs = [os.path.join(self.path, f"gen={g['gen']:05d}") for g in self.generations]
        self.manifest["generations"] = [
            {"gen": gen, "rows": int(total), "metrics": {"compacted_from": len(old_dirs)}}
        ]
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f)
        os.replace(tmp, self.manifest_path)
        for d in old_dirs:
            shutil.rmtree(d, ignore_errors=True)
