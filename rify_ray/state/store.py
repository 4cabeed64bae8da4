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
import pyarrow.compute as pc

QUAD_COLS = ["s", "p", "o", "g"]

# fixed probe string whose hash pins the dictionary's hash function in
# the manifest (polars hash(seed=0) is stable across processes but only
# per polars version)
_HASH_PROBE = "rify-ray-hash-pin-v1"


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

    def set_terms_meta(self, meta: Dict) -> None:
        """Record dictionary-build provenance (term count, collision-check
        mode, polars version + probe hash pinning the hash function) in
        the manifest — the dictionary is only valid under the exact hash
        kernel that built it."""
        self.manifest["terms"] = meta
        self._write_manifest()

    def check_hash_pin(self) -> None:
        """Raise when the currently-installed polars hashes differently
        from the polars that built this store's term dictionary (term ids
        are ``polars.hash(seed=0)``, stable only per polars version):
        resuming/decoding under a different kernel would silently yield
        empty joins instead of wrong-but-plausible results."""
        meta = self.manifest.get("terms")
        if not meta or self.value_type != "int64":
            return
        import polars as pl

        probe = pl.Series("t", [_HASH_PROBE]).hash(seed=0).reinterpret(signed=True)[0]
        if meta.get("probe_hash") is not None and meta["probe_hash"] != probe:
            raise RuntimeError(
                f"store at {self.path} was dictionary-encoded by polars "
                f"{meta.get('polars_version')} whose hash(seed=0) differs from the "
                f"installed polars {pl.__version__}: term ids cannot be re-derived. "
                "Re-encode the store (rebuild from premises) or pin polars."
            )

    def _write_manifest(self) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f)
        os.replace(tmp, self.manifest_path)

    # -- reads --------------------------------------------------------------

    @property
    def generations(self) -> List[Dict]:
        return self.manifest["generations"]

    @property
    def next_gen(self) -> int:
        """Monotonic generation-directory number — never reused, even
        after :meth:`compact` shrinks the generations list (lineage
        directories are keyed by it, and resume logic reads per-gen
        ``round`` metrics rather than list positions)."""
        if "next_gen" in self.manifest:
            return self.manifest["next_gen"]
        return (self.generations[-1]["gen"] + 1) if self.generations else 0

    @property
    def tombstones(self) -> List[Dict]:
        """Committed tombstone parts: ``[{file, rows, max_gen}]``.  A
        part hides its quads from every generation numbered ≤ its
        ``max_gen`` (facts re-added AFTER the delete live in higher
        generations and stay visible).  Parts are bounded by the
        engine's ``max_overdelete`` contract, so they broadcast."""
        return self.manifest.get("tombstones", [])

    def count(self) -> int:
        return sum(g["rows"] for g in self.generations) - sum(
            t["rows"] for t in self.tombstones
        )

    def _tombstone_frame(self, parts: List[Dict]):
        """Union of the given tombstone parts as one polars frame
        (driver-resident by the max_overdelete bound; file contents are
        immutable so the per-file cache never staleys)."""
        import polars as pl

        cache = getattr(self, "_tomb_cache", None)
        if cache is None:
            cache = self._tomb_cache = {}
        frames = []
        for t in parts:
            f = os.path.join(self.path, t["file"])
            if f not in cache:
                cache[f] = pl.read_parquet(f).select(QUAD_COLS)
            frames.append(cache[f])
        return pl.concat(frames).unique() if frames else None

    def dataset(
        self,
        columns: Optional[List[str]] = None,
        *,
        first_gen: int = 0,
        last_gen: Optional[int] = None,
        derived_only: bool = False,
        premise_only: bool = False,
        filter_expr=None,
    ):
        """Streaming Dataset over committed generations
        ``[first_gen, last_gen]`` (inclusive; default: all).  Column
        pruning supported.

        ``derived_only`` additionally excludes every PREMISE generation:
        position 0 and any generation committed by
        :func:`rify_ray.engine.add_premises_store` (marked
        ``evaluator: premise-add``), so the read is exactly the facts
        the fixpoint DERIVED across the initial run and all incremental
        additions.  (:meth:`compact` keeps the distinction: the engine
        compacts only past the last premise generation.)"""
        import ray.data

        sel = list(enumerate(self.generations))[
            first_gen : (last_gen + 1 if last_gen is not None else None)
        ]
        if derived_only:
            sel = [
                (i, g)
                for i, g in sel
                if i > 0 and g.get("metrics", {}).get("evaluator") != "premise-add"
            ]
        if premise_only:
            # the exact complement of derived_only: position 0 plus the
            # incremental premise-add generations — a membership probe
            # for retracted PREMISES only needs to read these
            sel = [
                (i, g)
                for i, g in sel
                if i == 0 or g.get("metrics", {}).get("evaluator") == "premise-add"
            ]
        gens = [g for _i, g in sel]
        # Ray's read_parquet rejects a list of >1 DIRECTORIES — expand the
        # committed generations to concrete parquet file paths, grouped
        # by which tombstone parts apply (a part hides its quads only
        # from generations ≤ its max_gen — re-added facts stay visible)
        tombs = self.tombstones
        groups: Dict[tuple, List[str]] = {}
        for g in gens:
            gen_dir = os.path.join(self.path, f"gen={g['gen']:05d}")
            gfiles = []
            for root, _dirs, names in os.walk(gen_dir):
                gfiles.extend(
                    os.path.join(root, n) for n in names if n.endswith(".parquet")
                )
            if not gfiles:
                continue
            key = tuple(
                ti for ti, t in enumerate(tombs) if g["gen"] <= t["max_gen"]
            )
            groups.setdefault(key, []).extend(gfiles)
        if not groups:
            return ray.data.from_arrow(self.quad_schema().empty_table())
        # filter_expr (a pyarrow.dataset expression) pushes constant
        # predicates down to row-group statistics: a generation whose
        # whole p column is one derived predicate is SKIPPED at the
        # metadata level when probing for a different constant — the
        # seeded-rederive probes rely on this to avoid reading the big
        # derived generations at all
        kw = {"filter": filter_expr} if filter_expr is not None else {}
        want_cols = columns or QUAD_COLS
        out = None
        for key, files in sorted(groups.items()):
            if not key:
                part = ray.data.read_parquet(sorted(files), columns=want_cols, **kw)
            else:
                # tombstoned generations: read the full quad (the
                # anti-join needs all four columns), drop hidden rows per
                # block against the broadcast tombstone frame, project
                import ray as _ray

                tomb_df = self._tombstone_frame([tombs[ti] for ti in key])
                tref = _ray.put(tomb_df)
                cols_after = list(want_cols)

                def drop_hidden(batch: pa.Table, _tref=tref, _cols=cols_after):
                    import polars as pl

                    if batch.num_rows == 0:
                        return batch.select(_cols)
                    kept = pl.from_arrow(batch).join(
                        _ray.get(_tref), on=QUAD_COLS, how="anti"
                    )
                    return kept.to_arrow().cast(batch.schema).select(_cols)

                part = ray.data.read_parquet(
                    sorted(files), columns=QUAD_COLS, **kw
                ).map_batches(
                    drop_hidden, batch_format="pyarrow", zero_copy_batch=True
                )
            out = part if out is None else out.union(part)
        return out

    def decoded_dataset(self, *, broadcast_terms_rows: int = 20_000_000, **kw):
        """Like :meth:`dataset`, but with dictionary-encoded term ids
        joined back to term strings.  A no-op for string-typed stores.

        While the dictionary has at most ``broadcast_terms_rows`` rows it
        is broadcast (``ray.put`` once, read per block — the small-side
        join pattern, no exchange); above the bound the decode runs as
        four distributed hash joins of the fact stream against the terms
        Dataset (one per quad column) so driver/worker memory stays
        bounded at any dictionary size."""
        self.check_hash_pin()
        ds = self.dataset(**kw)
        if self.value_type != "int64" or not os.path.isdir(self.terms_dir):
            return ds
        return self.decode_columns(
            ds, QUAD_COLS, broadcast_terms_rows=broadcast_terms_rows
        )

    def decode_columns(
        self, ds, cols: List[str], *, broadcast_terms_rows: int = 20_000_000
    ):
        """Join term-id columns ``cols`` of ``ds`` back to term strings
        via this store's dictionary; other columns pass through.  Same
        two regimes as :meth:`decoded_dataset` (which delegates here
        with the quad columns): broadcast sorted-dictionary gather below
        ``broadcast_terms_rows``, distributed hash joins above.  Used by
        :func:`rify_ray.engine.query_store` to decode BINDING columns
        (named per pattern variable, not s/p/o/g)."""
        import ray

        files = sorted(
            os.path.join(self.terms_dir, n)
            for n in os.listdir(self.terms_dir)
            if n.endswith(".parquet")
        )
        n_terms = self.manifest.get("terms", {}).get("n_terms")
        if n_terms is not None and n_terms > broadcast_terms_rows:
            return self._decoded_dataset_joins(ds, files, cols)
        import pyarrow.parquet as pq

        import numpy as np

        terms_tbl = pa.concat_tables([pq.read_table(f) for f in files]).combine_chunks()
        tids = np.asarray(terms_tbl["tid"].to_numpy(zero_copy_only=False), dtype=np.int64)
        order = np.argsort(tids)
        # broadcast ONE tid-sorted dictionary; each batch decodes with a
        # searchsorted + take gather per column — a polars join here
        # would rebuild the lookup hash table once per batch per column
        ref = ray.put(
            (
                tids[order],
                pc.cast(terms_tbl["term"], pa.string())
                .take(pa.array(order, pa.int64()))
                .combine_chunks(),
            )
        )
        decode_cols = list(cols)

        def decode(batch: pa.Table) -> pa.Table:
            tid_sorted, term_arr = ray.get(ref)
            extra = [c for c in batch.column_names if c not in decode_cols]
            out = {}
            for c in decode_cols:
                ids = np.asarray(
                    pc.cast(batch[c], pa.int64()).to_numpy(zero_copy_only=False),
                    dtype=np.int64,
                )
                pos = np.searchsorted(tid_sorted, ids)
                pos_c = np.minimum(pos, tid_sorted.size - 1)
                valid = tid_sorted[pos_c] == ids  # left-join nulls for unknown ids
                out[c] = term_arr.take(
                    pa.array(pos_c, pa.int64(), mask=~valid)
                )
            for e in extra:
                out[e] = batch[e]
            return pa.table(out)

        return ds.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)

    def _decoded_dataset_joins(self, ds, term_files: List[str], cols=None):
        """Decode via distributed hash joins — the big-dictionary path.
        Each id column joins against the (term, tid) Dataset; blocks
        are materialized + empty-stripped between joins (Ray 2.49 chained
        lazy joins break on empty-schema blocks)."""
        import ray.data

        from ..util import drop_empty_blocks, ensure_schema_fn

        cols = list(cols) if cols is not None else list(QUAD_COLS)
        out = ds.materialize()
        extra = [c for c in out.schema().names if c not in cols]
        for c in cols:
            terms_ds = ray.data.read_parquet(term_files)
            stripped = drop_empty_blocks(out)
            if stripped is None:
                return ray.data.from_arrow(
                    pa.schema(
                        [(q, pa.string()) for q in cols]
                        + [(e, out.schema().field(e).type) for e in extra]
                    ).empty_table()
                )
            out = (
                stripped.join(
                    terms_ds,
                    "inner",
                    max(8, self.num_partitions // 8),
                    on=(c,),
                    right_on=("tid",),
                )
                .drop_columns([c])
                .rename_columns({"term": c})
                .materialize()
            )
        stripped = drop_empty_blocks(out)
        if stripped is None:
            return ray.data.from_arrow(
                pa.schema([(q, pa.string()) for q in cols]).empty_table()
            )
        schema = pa.schema(
            [(q, pa.string()) for q in cols]
            + [(e, stripped.schema().field(e).type) for e in extra]
        )
        return stripped.map_batches(
            ensure_schema_fn(schema), batch_format="pyarrow", zero_copy_batch=True
        )

    def contains(self, quads: pa.Table, *, premise_only: bool = False) -> pa.Table:
        """Semi-join membership check (``Reasoner::contains``,
        src/reasoner.rs:98-101): returns the subset of ``quads`` present
        in the store.

        The probe set is driver-resident by construction (an arrow
        table), so this is ONE broadcast probe scan of the store — each
        block semi-joins against the broadcast probe and ships back only
        its hits (≤ |probe| rows total); no shuffle exchange at any store
        size.  ``premise_only`` restricts the scan to the premise
        generations (position 0 + incremental premise-adds) — the right
        probe when the caller only cares about membership AS A PREMISE,
        e.g. retraction verifying a user-supplied retract batch without
        reading the (much larger) derived closure."""
        import polars as pl
        import ray

        if quads.num_rows == 0 or self.count() == 0:
            return self.quad_schema().empty_table()
        probe = pl.from_arrow(quads.select(QUAD_COLS)).unique()
        pref = ray.put(probe)

        def hits_fn(batch: pa.Table) -> pa.Table:
            blk = pl.from_arrow(batch.select(QUAD_COLS))
            hits = ray.get(pref).join(blk, on=QUAD_COLS, how="semi")
            from ..util import polars_to_arrow_string

            return polars_to_arrow_string(hits).cast(self.quad_schema())

        tabs = [
            b
            for b in self.dataset(premise_only=premise_only)
            .map_batches(hits_fn, batch_format="pyarrow", zero_copy_batch=True)
            .iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows and b.num_columns
        ]
        if not tabs:
            return self.quad_schema().empty_table()
        return (
            pl.from_arrow(pa.concat_tables(tabs))
            .unique()
            .to_arrow()
            .cast(self.quad_schema())
        )

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

        gen = self.next_gen
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
        self.manifest["next_gen"] = gen + 1
        self._write_manifest()
        return metrics

    def add_small(self, df, *, extra: Optional[Dict] = None) -> Dict:
        """Commit a SMALL, precleaned polars frame of quads as one new
        generation without any distributed execution — used by the hybrid
        fixpoint for per-round deltas already known to be duplicate-free
        and absent from the store.

        The delta is written as ONE parquet file (bounded row groups so
        a later distributed read still splits): nothing reads the store
        with per-part pruning — co-location at query time comes from
        exchange-time hashing, not file layout — so fanning a sub-
        ``broadcast_rows`` frame into ``num_partitions`` tiny files only
        buys 32× the write calls and an O(files) walk per
        :meth:`dataset`.  The distributed :meth:`add` keeps the
        hash-partitioned layout for real (multi-block) generations.
        Manifest semantics are identical to :meth:`add`."""
        import shutil
        import time

        import pyarrow.parquet as pq

        from ..util import polars_to_arrow_string

        t0 = time.monotonic()
        if df.height == 0:
            return {"added": 0, "sec": 0.0}
        gen = self.next_gen
        gen_dir = os.path.join(self.path, f"gen={gen:05d}")
        shutil.rmtree(gen_dir, ignore_errors=True)  # stale crashed attempt
        os.makedirs(gen_dir, exist_ok=True)
        # stay in arrow `string` (not polars large_string) so every file
        # in the store reads back with one schema
        tbl = polars_to_arrow_string(df.select(QUAD_COLS))
        pq.write_table(tbl, os.path.join(gen_dir, "data.parquet"), row_group_size=131_072)
        metrics = {
            "added": int(df.height),
            "sec": round(time.monotonic() - t0, 3),
            **(extra or {}),
        }
        self.manifest["generations"].append(
            {"gen": gen, "rows": int(df.height), "metrics": metrics}
        )
        self.manifest["next_gen"] = gen + 1
        self._write_manifest()
        return metrics

    def _gen_files(self, list_pos: int) -> List[str]:
        """Concrete parquet paths of the generation at list position
        ``list_pos``."""
        g = self.generations[list_pos]
        gen_dir = os.path.join(self.path, f"gen={g['gen']:05d}")
        files: List[str] = []
        for root, _dirs, names in os.walk(gen_dir):
            files.extend(os.path.join(root, n) for n in names if n.endswith(".parquet"))
        return sorted(files)

    def delete_tombstone(
        self,
        facts_df,
        *,
        verified_df=None,
        probe_premise_only: bool = False,
    ) -> Dict:
        """LSM-style logical delete: verify which of ``facts_df`` are
        present (ONE broadcast probe scan — :meth:`contains` already
        respects earlier tombstones, so double-deletes count zero), then
        commit the present subset as an immutable tombstone part hiding
        those quads from every CURRENT generation.  Writes scale with
        the deleted cone, not the store — the 100 TB retraction path;
        :meth:`compact`/:meth:`compact_derived` fold tombstones into a
        physical rewrite later (the LSM compaction discipline).

        ``verified_df``: rows the caller PROVES are live facts (the
        retraction engine's overdeletion heads — each heads a live
        lineage row, and lineage stays tombstone-synced with the fact
        store: a fact fully hidden by earlier parts has only hidden
        lineage rows, so the walk can never emit it), so they skip the
        presence probe entirely.  They are deliberately NOT anti-joined
        against existing tombstone parts: a fact tombstoned once and
        later REDERIVED lives in a generation above the old part's
        ``max_gen``, counts exactly once, and needs a NEW part row to
        die again — dropping it here would leave a live derived fact
        with no derivation.  :meth:`count` stays exact either way
        (each part subtracts one visible occurrence).
        ``probe_premise_only`` restricts the presence scan for the
        remaining rows to the premise generations — with both, a
        retraction never reads the derived closure to delete from it.

        Returns ``{"deleted": n, "gens_rewritten": []}`` (no generation
        is touched)."""
        import polars as pl

        from ..util import polars_to_arrow_string

        if facts_df.height == 0 or not self.generations:
            return {"deleted": 0, "gens_rewritten": []}
        cast_t = pl.Int64 if self.value_type == "int64" else pl.Utf8
        fdf = facts_df.select(
            [pl.col(c).cast(cast_t) for c in QUAD_COLS]
        ).unique()
        ver: Optional["pl.DataFrame"] = None
        if verified_df is not None and verified_df.height:
            ver = verified_df.select(
                [pl.col(c).cast(cast_t) for c in QUAD_COLS]
            ).unique()
            fdf = fdf.join(ver, on=QUAD_COLS, how="anti")
        parts = []
        if fdf.height:
            probed = self.contains(
                polars_to_arrow_string(fdf).cast(self.quad_schema()),
                premise_only=probe_premise_only,
            )
            if probed.num_rows:
                parts.append(
                    pl.from_arrow(probed).select(
                        [pl.col(c).cast(cast_t) for c in QUAD_COLS]
                    )
                )
        if ver is not None and ver.height:
            parts.append(ver)
        if not parts:
            return {"deleted": 0, "gens_rewritten": []}
        present = polars_to_arrow_string(pl.concat(parts).unique()).cast(
            self.quad_schema()
        )
        import pyarrow.parquet as pq

        tdir = os.path.join(self.path, "tombstones")
        os.makedirs(tdir, exist_ok=True)
        used = [
            int(t["file"].split("-")[-1].split(".")[0]) for t in self.tombstones
        ]
        idx = (max(used) + 1) if used else 0
        rel = os.path.join("tombstones", f"ts-{idx:05d}.parquet")
        fpath = os.path.join(self.path, rel)
        pq.write_table(present, fpath + ".tmp")
        os.replace(fpath + ".tmp", fpath)
        max_gen = max(g["gen"] for g in self.generations)
        entry = {"file": rel, "rows": int(present.num_rows), "max_gen": int(max_gen)}
        self.manifest["tombstones"] = [*self.tombstones, entry]
        self._write_manifest()  # atomic commit point
        return {"deleted": int(present.num_rows), "gens_rewritten": []}

    def materialize_tombstones(self) -> None:
        """Fold committed tombstone parts into physical generation
        rewrites (oldest part first — each part only touches generations
        ≤ its ``max_gen``, so a fact re-added after a delete survives).
        Called by :meth:`compact`/:meth:`compact_derived` so long-lived
        stores eventually pay the rewrite ONCE per compaction cycle, not
        per retraction."""
        import polars as pl

        while self.tombstones:
            t = self.tombstones[0]
            fdf = pl.read_parquet(os.path.join(self.path, t["file"])).select(QUAD_COLS)
            # drop the part from the IN-MEMORY manifest first: the
            # rewrite's own commit then atomically both shrinks the
            # generation rows and removes the part (no window where
            # count() double-subtracts)
            self.manifest["tombstones"] = self.tombstones[1:]
            res = self.delete_facts(fdf, mode="rewrite", gen_bound=t["max_gen"])
            if not res["gens_rewritten"]:
                # nothing physically hit (a crashed prior fold already
                # rewrote) — commit the part removal explicitly
                self._write_manifest()
            try:
                os.remove(os.path.join(self.path, t["file"]))
            except OSError:
                pass

    def delete_facts(
        self,
        facts_df,
        *,
        driver_rows: int = 2_000_000,
        mode: str = "rewrite",
        gen_bound: Optional[int] = None,
        verified_df=None,
        probe_premise_only: bool = False,
    ) -> Dict:
        """Physically remove the given quads (a driver-small polars
        frame — the engine bounds retraction batches) from every
        generation that holds any of them.

        Two regimes, both a FIXED number of scans (never one pair of
        Ray jobs per generation — at a few fixed seconds per exchange
        spin-up, a per-generation loop dominates retraction latency):

        - store ≤ ``driver_rows``: the affected generations are read,
          anti-joined and rewritten entirely in driver polars — zero
          distributed jobs;
        - above the bound: ONE broadcast semi-join scan over the whole
          store (tagged with its generation via file paths) finds the
          affected generations and per-gen hit counts, then ONE more
          pass over only the affected generations' files rewrites them
          filtered (each task writes straight into the new generation
          directory derived from its block's path).

        Same commit discipline as :meth:`compact`: each affected
        generation is rewritten FILTERED into a fresh generation
        directory (monotonic number), one atomic manifest write swaps
        all of them in (list positions, ``round`` metrics and the
        premise/derived boundary are preserved), and the old
        directories are removed only after the commit.
        Returns ``{"deleted": n, "gens_rewritten": [...]}``.
        """
        import shutil

        import polars as pl

        if mode == "tombstone":
            return self.delete_tombstone(
                facts_df,
                verified_df=verified_df,
                probe_premise_only=probe_premise_only,
            )
        if mode != "rewrite":
            raise ValueError(f"unknown delete mode {mode!r}")
        if facts_df.height == 0:
            return {"deleted": 0, "gens_rewritten": []}
        cast_t = pl.Int64 if self.value_type == "int64" else pl.Utf8
        fdf = facts_df.select(
            [pl.col(c).cast(cast_t) for c in QUAD_COLS]
        ).unique()

        if self.count() <= driver_rows:
            per_gen = self._delete_facts_driver(fdf, gen_bound=gen_bound)
        else:
            per_gen = self._delete_facts_distributed(fdf, gen_bound=gen_bound)

        new_entries = list(self.generations)
        rewritten: List[int] = []
        old_dirs: List[str] = []
        deleted_total = 0
        for i, (n_hits, new_gen, kept_rows) in sorted(per_gen.items()):
            g = self.generations[i]
            entry = dict(new_entries[i])
            entry["gen"] = new_gen
            entry["rows"] = int(kept_rows)
            entry["metrics"] = {**entry.get("metrics", {}), "deleted": int(n_hits)}
            new_entries[i] = entry
            rewritten.append(new_gen)
            old_dirs.append(os.path.join(self.path, f"gen={g['gen']:05d}"))
            deleted_total += n_hits
        if not rewritten:
            return {"deleted": 0, "gens_rewritten": []}
        self.manifest["generations"] = new_entries
        # max(), not rewritten[-1]: the loop orders by LIST POSITION but
        # new gen numbers were assigned in gen-number order — when those
        # orders differ, rewritten[-1]+1 can land next_gen on a live
        # committed generation, which the next add() would rmtree as a
        # "stale crashed attempt" (data loss)
        self.manifest["next_gen"] = max(self.next_gen, max(rewritten) + 1)
        self._write_manifest()  # atomic commit point
        for d in old_dirs:
            shutil.rmtree(d, ignore_errors=True)
        return {"deleted": int(deleted_total), "gens_rewritten": rewritten}

    def _delete_facts_driver(self, fdf, *, gen_bound: Optional[int] = None) -> Dict[int, tuple]:
        """Driver-polars regime of :meth:`delete_facts`: the whole store
        fits ``driver_rows``, so affected generations are found, filtered
        and rewritten without a single Ray job.  Returns
        ``{list_pos: (n_hits, new_gen_number, kept_rows)}`` with the new
        generation directories already written (uncommitted)."""
        import shutil

        import polars as pl
        import pyarrow.parquet as pq

        from ..util import polars_to_arrow_string

        out: Dict[int, tuple] = {}
        n_rewritten = 0
        for i, g in enumerate(self.generations):
            if g["rows"] == 0:
                continue
            if gen_bound is not None and g["gen"] > gen_bound:
                continue  # tombstone fold: re-added facts live above the bound
            files = self._gen_files(i)
            if not files:
                continue
            blk = pl.from_arrow(
                pa.concat_tables(
                    [pq.read_table(f, columns=QUAD_COLS) for f in files],
                    promote_options="permissive",
                )
            ).select(QUAD_COLS)
            kept = blk.join(fdf, on=QUAD_COLS, how="anti")
            n_hits = blk.height - kept.height
            if n_hits == 0:
                continue
            new_gen = self.next_gen + n_rewritten
            n_rewritten += 1
            new_dir = os.path.join(self.path, f"gen={new_gen:05d}")
            shutil.rmtree(new_dir, ignore_errors=True)  # stale crashed attempt
            os.makedirs(new_dir, exist_ok=True)
            if kept.height:
                pq.write_table(
                    polars_to_arrow_string(kept).cast(self.quad_schema()),
                    os.path.join(new_dir, "data.parquet"),
                    row_group_size=131_072,
                )
            out[i] = (int(n_hits), new_gen, int(kept.height))
        return out

    def _delete_facts_distributed(self, fdf, *, gen_bound: Optional[int] = None) -> Dict[int, tuple]:
        """Distributed regime of :meth:`delete_facts`: one broadcast
        semi-join scan over the whole store (rows tagged with their
        generation via file paths) finds affected generations, one more
        pass over only those generations' files rewrites them filtered.
        Each filter task writes its block directly into the (uncommitted)
        new generation directory — no per-generation job loop."""
        import shutil

        import polars as pl
        import ray
        import ray.data

        fref = ray.put(fdf)
        # rows are mapped back to their generation by the gen=NNNNN path
        # segment (robust against path normalization inside the reader);
        # the GENERATION NUMBER is unique (monotonic, never reused), the
        # list position is resolved on the driver
        pos_of_gen = {g["gen"]: i for i, g in enumerate(self.generations)}
        gen_expr = (
            pl.col("path")
            .str.extract_all(r"gen=(\d+)")
            .list.last()
            .str.strip_prefix("gen=")
            .cast(pl.Int64)
            .alias("_gen")
        )
        all_files: List[str] = []
        file_gen: Dict[str, int] = {}
        for i, g in enumerate(self.generations):
            if g["rows"] == 0:
                continue
            if gen_bound is not None and g["gen"] > gen_bound:
                continue  # tombstone fold: re-added facts live above the bound
            for f in self._gen_files(i):
                file_gen[f] = g["gen"]
                all_files.append(f)
        if not all_files:
            return {}

        def hits_fn(batch: pa.Table) -> pa.Table:
            blk = pl.from_arrow(batch).with_columns(gen_expr)
            h = (
                blk.join(ray.get(fref), on=QUAD_COLS, how="semi")
                .group_by("_gen")
                .len(name="n")
            )
            return h.to_arrow().cast(pa.schema([("_gen", pa.int64()), ("n", pa.int64())]))

        hit_tabs = [
            b
            for b in ray.data.read_parquet(all_files, include_paths=True)
            .map_batches(hits_fn, batch_format="pyarrow", zero_copy_batch=True)
            .iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows and b.num_columns
        ]
        if not hit_tabs:
            return {}
        hits = (
            pl.from_arrow(pa.concat_tables(hit_tabs)).group_by("_gen").agg(pl.col("n").sum())
        )
        affected = sorted(g for g in hits["_gen"].to_list() if g in pos_of_gen)
        n_hits_of = dict(zip(hits["_gen"].to_list(), hits["n"].to_list()))
        if not affected:
            return {}

        # pass 2: rewrite only the affected generations, one Ray job —
        # the filtered stream is written hive-partitioned by source
        # generation (Ray-managed writes: retry-safe, unlike side-effect
        # writes inside map tasks), then each partition's files move into
        # their new generation directory with plain renames
        new_gen_of = {g: self.next_gen + k for k, g in enumerate(affected)}
        affected_set = set(affected)
        affected_files = [f for f in all_files if file_gen[f] in affected_set]
        schema = self.quad_schema()
        out_schema = schema.append(pa.field("_gen", pa.int64()))

        def filter_fn(batch: pa.Table) -> pa.Table:
            blk = pl.from_arrow(batch).with_columns(gen_expr)
            kept = blk.join(ray.get(fref), on=QUAD_COLS, how="anti")
            return kept.select([*QUAD_COLS, "_gen"]).to_arrow().cast(out_schema)

        tmp_out = os.path.join(self.path, "_delete_tmp")
        shutil.rmtree(tmp_out, ignore_errors=True)
        ray.data.read_parquet(affected_files, include_paths=True).map_batches(
            filter_fn, batch_format="pyarrow", zero_copy_batch=True
        ).write_parquet(tmp_out, partition_cols=["_gen"])

        import pyarrow.parquet as pq

        kept_of: Dict[int, int] = {g: 0 for g in affected}
        out: Dict[int, tuple] = {}
        for g in affected:
            ng = new_gen_of[g]
            new_dir = os.path.join(self.path, f"gen={ng:05d}")
            shutil.rmtree(new_dir, ignore_errors=True)  # stale crashed attempt
            os.makedirs(new_dir, exist_ok=True)
            part_dir = os.path.join(tmp_out, f"_gen={g}")
            if os.path.isdir(part_dir):
                for n in sorted(os.listdir(part_dir)):
                    if not n.endswith(".parquet"):
                        continue
                    src = os.path.join(part_dir, n)
                    kept_of[g] += pq.read_metadata(src).num_rows
                    os.replace(src, os.path.join(new_dir, n))
            out[pos_of_gen[g]] = (int(n_hits_of[g]), ng, kept_of[g])
        shutil.rmtree(tmp_out, ignore_errors=True)
        return out

    def compact(self, first_gen: int = 0) -> None:
        """Rewrite generations ``[first_gen:]`` (list positions) as ONE
        new generation — bounds the store's file count on long fixpoints
        without losing the premise/derived boundary: a fixpoint compacts
        with ``first_gen=1`` so list position 0 stays the premise
        generation and ``dataset(first_gen=1)`` remains exactly the
        derived set.

        Generations are disjoint (every ``add`` is anti-joined), so the
        merged row count is the sum.  The merged entry keeps the LAST
        compacted generation's ``round`` metric, preserving resume round
        numbering; generation-directory numbers are monotonic
        (:attr:`next_gen`), so lineage directories keyed by them never
        collide.  Crash-safe: the manifest rewrite is the commit point —
        a crash before it leaves the old generations intact (plus one
        stale uncommitted dir that the next attempt clears)."""
        import shutil

        self.materialize_tombstones()
        victims = self.generations[first_gen:]
        if len(victims) <= 1:
            return
        ds = self.dataset(first_gen=first_gen).materialize()
        gen = self.next_gen
        gen_dir = os.path.join(self.path, f"gen={gen:05d}")
        shutil.rmtree(gen_dir, ignore_errors=True)  # stale uncommitted attempt
        parted = ds.map_batches(
            _hash_part_fn(self.num_partitions),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        parted.write_parquet(gen_dir, partition_cols=["part"])
        total = sum(g["rows"] for g in victims)
        old_dirs = [os.path.join(self.path, f"gen={g['gen']:05d}") for g in victims]
        merged_metrics = {"compacted_from": len(victims)}
        last_round = victims[-1].get("metrics", {}).get("round")
        if last_round is not None:
            merged_metrics["round"] = last_round
        self.manifest["generations"] = self.generations[:first_gen] + [
            {"gen": gen, "rows": int(total), "metrics": merged_metrics}
        ]
        self.manifest["next_gen"] = gen + 1
        self._write_manifest()
        for d in old_dirs:
            shutil.rmtree(d, ignore_errors=True)

    def compact_derived(self) -> None:
        """Fold every maximal run of CONSECUTIVE derived generations
        (list positions > 0 not marked ``evaluator: premise-add``) into
        one generation each — bounds the file count of a long-lived
        store that interleaves incremental premise-adds with derived
        rounds, where :meth:`compact` past the last premise generation
        would leave earlier derived runs exempt forever.  The premise
        generations keep their positions, so
        ``dataset(derived_only=True)`` is unaffected.  Same crash
        discipline as :meth:`compact`: merged dirs are written first,
        ONE manifest write commits all runs, old dirs are removed after.
        """
        import shutil

        self.materialize_tombstones()
        runs: List[List[int]] = []
        cur: List[int] = []
        for i, g in enumerate(self.generations):
            derived = i > 0 and g.get("metrics", {}).get("evaluator") != "premise-add"
            if derived:
                cur.append(i)
            else:
                if len(cur) > 1:
                    runs.append(cur)
                cur = []
        if len(cur) > 1:
            runs.append(cur)
        if not runs:
            return
        next_gen = self.next_gen
        old_dirs: List[str] = []
        replacements = []
        for run in runs:
            ds = self.dataset(first_gen=run[0], last_gen=run[-1]).materialize()
            gen = next_gen
            next_gen += 1
            gen_dir = os.path.join(self.path, f"gen={gen:05d}")
            shutil.rmtree(gen_dir, ignore_errors=True)
            parted = ds.map_batches(
                _hash_part_fn(self.num_partitions),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            parted.write_parquet(gen_dir, partition_cols=["part"])
            total = sum(self.generations[i]["rows"] for i in run)
            mm: Dict = {"compacted_from": len(run)}
            last_round = self.generations[run[-1]].get("metrics", {}).get("round")
            if last_round is not None:
                mm["round"] = last_round
            replacements.append((run, {"gen": gen, "rows": int(total), "metrics": mm}))
            old_dirs.extend(
                os.path.join(self.path, f"gen={self.generations[i]['gen']:05d}")
                for i in run
            )
        run_head = {run[0]: entry for run, entry in replacements}
        covered = {i for run, _e in replacements for i in run}
        out = []
        for i, g in enumerate(self.generations):
            if i in run_head:
                out.append(run_head[i])
            elif i in covered:
                continue
            else:
                out.append(g)
        self.manifest["generations"] = out
        self.manifest["next_gen"] = next_gen
        self._write_manifest()
        for d in old_dirs:
            shutil.rmtree(d, ignore_errors=True)

    def file_count(self) -> int:
        """Number of committed parquet files (compaction trigger input)."""
        n = 0
        for g in self.generations:
            gen_dir = os.path.join(self.path, f"gen={g['gen']:05d}")
            for _root, _dirs, names in os.walk(gen_dir):
                n += sum(1 for x in names if x.endswith(".parquet"))
        return n
