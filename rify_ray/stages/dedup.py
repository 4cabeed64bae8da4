"""Deduplication family over the ``documents`` / ``embeddings`` tables:

- **exact**: hash-partitioned ``groupby(key_hash).min(id)`` — the
  classic keep-first exact dedup; the shuffle key is a 128-bit digest so
  long texts never travel as shuffle keys.
- **MinHash + LSH**: shingle → minhash signature (vectorized numpy
  permutations) → banded bucket groupby → candidate pairs → exact
  n-gram-Jaccard verification via joins.
- **SimHash**: 64-bit signature; candidates via 16-bit chunk bucketing
  (any pair within Hamming distance 3 shares ≥1 of 4 chunks), verified
  by popcount.
- **embedding cosine near-dup**: brute per-batch matmul against a
  broadcast matrix (small side via ``ray.put``); the scale path buckets
  by random-hyperplane LSH first (see stages/similarity.py).

All signatures/params are seeded constants — no RNG state at run time,
so output is deterministic across runs and parallelism.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import distinct, drop_empty_blocks, ensure_schema_fn, string_schema

_MERSENNE = (1 << 61) - 1


# pair counts at or below this verify on the driver (single-threaded
# intersection loop, ~20 µs/pair); above it the loop must parallelize —
# crossover vs the distributed path's ~0.6 s of fixed executor overhead
_DRIVER_VERIFY_BOUND = 20_000


def _perm_params(num_perm: int, seed: int = 42) -> Tuple[np.ndarray, np.ndarray]:
    rs = np.random.RandomState(seed)
    a = rs.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rs.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs_ds, *, key_col: str = "text", id_col: str = "doc_id"):
    """Survivor ids (min id per exact key).  Returns a Dataset with one
    ``{id_col}`` column."""

    def key_fn(batch: pa.Table) -> pa.Table:
        keys = [
            hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else ""
            for t in batch[key_col].to_pylist()
        ]
        return pa.table({"khash": pa.array(keys, pa.string()), id_col: batch[id_col]})

    keyed = docs_ds.map_batches(key_fn, batch_format="pyarrow", zero_copy_batch=True)
    out = keyed.groupby("khash").min(id_col).materialize()
    out = drop_empty_blocks(out)
    if out is None:
        return None

    def project(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return pa.schema([(id_col, pa.int64())]).empty_table()
        return pa.table({id_col: pc.cast(batch[f"min({id_col})"], pa.int64())})

    return out.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def incremental_exact_dedup(
    new_ds,
    state_dir: str,
    *,
    key_col: str = "text",
    id_col: str = "doc_id",
    broadcast_rows: int = 20_000_000,
    num_partitions: int = 8,
    commit: bool = True,
):
    """Snapshot-incremental exact dedup against a PERSISTENT digest
    store — the recrawl shape: each new crawl snapshot keeps only
    documents whose content digest was never seen in any earlier
    snapshot (and dedupes within itself, min id per digest).

    ``state_dir`` holds the seen-digest store as append-only parquet
    parts (``digests-NNNNN.parquet``, one ``khash`` column).  The new
    snapshot's digests are computed distributed, deduped within the
    snapshot via one digest-keyed ``groupby.min`` exchange, then
    anti-filtered against the store — a ``ray.put`` broadcast of the
    seen set below ``broadcast_rows`` digests, a ``left_anti`` hash
    join above it (the store never lands on the driver in the scale
    regime).  ``commit=True`` appends the surviving digests as ONE new
    part via tmp+hardlink (O_EXCL semantics), so a crashed run never
    leaves a torn store and the snapshot is all-or-nothing: a rerun
    BEFORE the commit landed recomputes identically; after it, the same
    snapshot returns empty (its content is now "seen" — exactly the
    recrawl semantics).  The part index is ``max(existing)+1`` (gaps
    from manually removed parts never cause an overwrite), and the
    store is SINGLE-WRITER: two racing snapshot commits raise
    ``FileExistsError`` rather than silently losing seen digests.

    Returns ``(survivors_ds, n_seen_digests)`` — survivors as one
    ``{id_col}`` column, and the store size BEFORE this snapshot."""
    import os

    import pyarrow.parquet as pq
    import ray
    import ray.data

    os.makedirs(state_dir, exist_ok=True)
    parts = sorted(
        os.path.join(state_dir, n)
        for n in os.listdir(state_dir)
        if n.startswith("digests-") and n.endswith(".parquet")
    )
    n_seen = sum(pq.ParquetFile(p).metadata.num_rows for p in parts)

    def key_fn(batch: pa.Table) -> pa.Table:
        keys = [
            hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else ""
            for t in batch[key_col].to_pylist()
        ]
        return pa.table({"khash": pa.array(keys, pa.string()), id_col: batch[id_col]})

    keyed = new_ds.map_batches(key_fn, batch_format="pyarrow", zero_copy_batch=True)
    cand = drop_empty_blocks(keyed.groupby("khash").min(id_col).materialize())
    empty_ids = pa.schema([(id_col, pa.int64())]).empty_table()
    if cand is None:
        return ray.data.from_arrow(empty_ids), n_seen

    def project(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return pa.schema(
                [("khash", pa.string()), (id_col, pa.int64())]
            ).empty_table()
        return pa.table(
            {
                "khash": pc.cast(batch["khash"], pa.string()),
                id_col: pc.cast(batch[f"min({id_col})"], pa.int64()),
            }
        )

    cand = cand.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    if parts:
        seen_ds = ray.data.read_parquet(parts)
        if n_seen <= broadcast_rows:
            seen_tabs = [
                b
                for b in seen_ds.iter_batches(batch_size=None, batch_format="pyarrow")
                if b.num_rows and b.num_columns
            ]
            seen_ref = ray.put(
                pa.concat_tables(seen_tabs)["khash"].combine_chunks()
                if seen_tabs
                else pa.array([], pa.string())
            )

            def drop_seen(batch: pa.Table) -> pa.Table:
                seen = ray.get(seen_ref)
                return batch.filter(
                    pc.invert(pc.is_in(batch["khash"], value_set=seen))
                )

            cand = cand.map_batches(
                drop_seen, batch_format="pyarrow", zero_copy_batch=True
            )
        else:
            cand = cand.join(seen_ds, "left_anti", num_partitions, on=("khash",))
    cand = drop_empty_blocks(cand.materialize())
    if cand is None:
        return ray.data.from_arrow(empty_ids), n_seen

    if commit:
        # next index = max(existing)+1, NOT len(parts): a gap from a
        # manually removed part must never make a new commit land on an
        # existing number and silently clobber committed digests
        used = [
            int(os.path.basename(p)[len("digests-") : -len(".parquet")])
            for p in parts
        ]
        part = os.path.join(
            state_dir, f"digests-{(max(used) + 1 if used else 0):05d}.parquet"
        )
        writer = None
        try:
            for batch in cand.iter_batches(batch_size=65536, batch_format="pyarrow"):
                if batch.num_rows == 0:
                    continue
                tab = pa.table({"khash": pc.cast(batch["khash"], pa.string())})
                if writer is None:
                    writer = pq.ParquetWriter(part + ".tmp", tab.schema)
                writer.write_table(tab)
        finally:
            if writer is not None:
                writer.close()
        if writer is not None:
            # single-writer store: two racing snapshot runs are not
            # supported — fail loudly instead of overwriting a part
            # another writer committed after our directory listing
            os.link(part + ".tmp", part)  # O_EXCL-style: EEXIST on race
            os.remove(part + ".tmp")

    def ids_only(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return empty_ids
        return pa.table({id_col: pc.cast(batch[id_col], pa.int64())})

    return cand.map_batches(ids_only, batch_format="pyarrow", zero_copy_batch=True), n_seen


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------


_SHINGLE_MOD = np.uint64((1 << 61) - 1)
_SHINGLE_BASE = np.uint64(1_000_003)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Rolling polynomial hash of every k-byte shingle, fully vectorized
    (strided window view @ precomputed base powers — no Python loop over
    shingles)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    if b.size < k:
        windows = b[None, :]
        k_eff = b.size
    else:
        windows = np.lib.stride_tricks.sliding_window_view(b, k)
        k_eff = k
    # NOTE: this is a deterministic MIXING function, not exact modular
    # arithmetic — the scalar power recurrence wraps mod 2^64 before the
    # Mersenne reduction, and the final accumulation is uint64
    # wraparound.  Shingle hashes here are internal-only (compared to
    # each other, never to an external implementation; the SQL oracle
    # recomputes pairs from raw substrings), so only determinism and
    # near-injectivity matter — both hold.
    powers = np.empty(k_eff, dtype=np.uint64)
    powers[0] = 1
    with np.errstate(over="ignore"):
        for j in range(1, k_eff):
            powers[j] = (powers[j - 1] * _SHINGLE_BASE) % _SHINGLE_MOD
    # (byte < 256) × (power mod 2^53) fits uint64 per element; sums wrap
    powers_small = powers & np.uint64((1 << 53) - 1)
    h = (windows.astype(np.uint64) * powers_small[None, :]).sum(axis=1)
    return np.unique(h)


def minhash_signature_fn(*, k_shingles: int = 5, num_perm: int = 64, seed: int = 42):
    """map_batches fn: (doc_id, text) → (doc_id, sig list<uint64>).  The
    per-doc permutation min is a single numpy outer-product — no Python
    loop over permutations."""
    a, b = _perm_params(num_perm, seed)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        shingle_arrays = [_shingle_hashes(t or "", k_shingles) for t in texts]
        sig_arr = _sig_list_array(shingle_arrays, a, b)
        return pa.table({"doc_id": pa.array(ids, pa.int64()), "sig": sig_arr})

    return fn


def _sig_list_array(shingle_arrays, a: np.ndarray, b: np.ndarray) -> pa.ListArray:
    """Per-doc shingle-hash arrays → Arrow list<uint64> minhash
    signatures.  Batch-wide: concatenate every doc's shingle hashes, ONE
    (num_perm, total) universal hash, then a per-doc segmented min
    (minimum.reduceat) — no per-doc numpy dispatch."""
    lens = np.array([s.size for s in shingle_arrays], dtype=np.int64)
    n = len(shingle_arrays)
    sig_mat = np.zeros((n, len(a)), dtype=np.uint64)
    valid = lens > 0
    if valid.any():
        hs_all = np.concatenate([s for s in shingle_arrays if s.size])
        # in-place: the (num_perm, total) hash matrix is the batch's
        # dominant allocation — one buffer, not three temporaries
        with np.errstate(over="ignore"):
            vals = a[:, None] * hs_all[None, :]
            vals += b[:, None]
            vals %= _MERSENNE
        offsets = np.zeros(int(valid.sum()), dtype=np.int64)
        np.cumsum(lens[valid][:-1], out=offsets[1:])
        sig_mat[valid] = np.minimum.reduceat(vals, offsets, axis=1).T
    flat = sig_mat.reshape(-1)
    return pa.ListArray.from_arrays(
        pa.array(np.arange(0, (n + 1) * len(a), len(a), dtype=np.int32)),
        pa.array(flat, pa.uint64()),
    )


def _sig_shingle_fn(*, k_shingles: int = 5, num_perm: int = 64, seed: int = 42):
    """map_batches fn: (doc_id, text) → (doc_id, sig list<uint64>, sh
    binary) — signatures AND exact shingle sets from ONE shingle
    computation.  Small-corpus regime only: emitting ``sh`` inflates the
    scan output ~8× over the text (8 bytes per shingle), which is fine
    when the whole corpus fits the broadcast bound but wrong at web
    scale, where the verify path shingles only pair-involved docs
    instead (see :func:`_verify_pairs_distributed`)."""
    a, b = _perm_params(num_perm, seed)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        shingle_arrays = [_shingle_hashes(t or "", k_shingles) for t in texts]
        sig_arr = _sig_list_array(shingle_arrays, a, b)
        sh = pa.array([s.tobytes() for s in shingle_arrays], pa.binary())
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "sig": sig_arr, "sh": sh}
        )

    return fn


def minhash_band_fn(*, num_perm: int = 64, bands: int = 16):
    """(doc_id, sig) → (band, bkey, doc_id) rows, one per band.

    Fully vectorized: the signature matrix reshapes to (n, num_perm) and
    each band's rows fold into one uint64 bucket key with an FNV-1a-style
    mix — no per-row hashing loop.  ``bkey`` is Int64 (cheaper groupby
    key than a hex digest; 64-bit collisions are as unlikely as before)."""
    rows_per_band = num_perm // bands
    _FNV_OFF = np.uint64(0xCBF29CE484222325)
    _FNV_PRIME = np.uint64(0x100000001B3)

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        sig_col = batch["sig"].combine_chunks()
        flat = np.asarray(
            sig_col.values.to_numpy(zero_copy_only=False), dtype=np.uint64
        ).reshape(n, num_perm)
        keys = np.empty((n, bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for bi in range(bands):
                acc = np.full(n, _FNV_OFF, dtype=np.uint64)
                for j in range(rows_per_band):
                    acc = (acc ^ flat[:, bi * rows_per_band + j]) * _FNV_PRIME
                keys[:, bi] = acc
        band = np.tile(np.arange(bands, dtype=np.int32), n)
        return pa.table(
            {
                "band": pa.array(band, pa.int32()),
                "bkey": pa.array(keys.reshape(-1).view(np.int64), pa.int64()),
                "doc_id": pa.array(np.repeat(ids, bands), pa.int64()),
            }
        )

    return fn


def _salted_bucket_pairs(
    band: np.ndarray, bkey: np.ndarray, ids: np.ndarray, max_bucket_size: int,
    oversized: str = "salt",
) -> Tuple[np.ndarray, np.ndarray, dict]:
    """Vectorized pair expansion over MANY buckets at once.

    Input: parallel arrays of (band, bkey, doc_id) rows (any order).
    Buckets above ``max_bucket_size`` (boilerplate clusters whose O(n²)
    expansion would dominate the job) are, per ``oversized``:

    - ``"salt"`` (default): SALTED into id-sorted subgroups of at most
      ``max_bucket_size`` members; pairs are emitted within each
      subgroup plus one BRIDGE pair linking consecutive subgroups — so
      a hot bucket still forms one connected component (transitive
      dedup/clustering loses nothing), while the pairwise expansion
      stays O(bucket · max_bucket_size) instead of O(bucket²).
      Cross-subgroup pairs are the only ones skipped.
    - ``"drop"``: excluded entirely — the semantics of a document-
      frequency cap (a bucket key shared by more than ``max_bucket_size``
      documents is boilerplate and generates NO candidates), exactly
      mirroring a SQL ``HAVING count(*) <= max`` filter.

    Either way every skipped pair is COUNTED: the returned stats record
    ``{n_buckets, oversized_buckets, emitted_pairs, dropped_pairs}``.

    No per-bucket Python dispatch: groups are delimited with one
    lexsort, and pair generation batches all subgroups of equal size
    through a single ``triu_indices`` gather per size class."""
    n = ids.size
    empty = np.zeros(0, dtype=np.int64)
    if n == 0:
        return empty, empty, {
            "n_buckets": 0, "oversized_buckets": 0,
            "emitted_pairs": 0, "dropped_pairs": 0,
        }
    order = np.lexsort((ids, bkey, band))
    b2, k2, v = band[order], bkey[order], ids[order]
    new_bucket = np.ones(n, dtype=bool)
    new_bucket[1:] = (b2[1:] != b2[:-1]) | (k2[1:] != k2[:-1])
    starts = np.flatnonzero(new_bucket)
    sizes = np.diff(np.append(starts, n))
    if oversized == "drop":
        total_buckets = int(starts.size)
        n_over = int((sizes > max_bucket_size).sum())
        possible_all = int((sizes.astype(np.int64) * (sizes - 1) // 2).sum())
        keep_rows = np.repeat(sizes <= max_bucket_size, sizes)
        b2, k2, v = b2[keep_rows], k2[keep_rows], v[keep_rows]
        n = v.size
        if n == 0:
            return empty, empty, {
                "n_buckets": total_buckets, "oversized_buckets": n_over,
                "emitted_pairs": 0, "dropped_pairs": possible_all,
            }
        new_bucket = np.ones(n, dtype=bool)
        new_bucket[1:] = (b2[1:] != b2[:-1]) | (k2[1:] != k2[:-1])
        starts = np.flatnonzero(new_bucket)
        sizes = np.diff(np.append(starts, n))
        # remaining buckets all fit: subgroup machinery degenerates to
        # plain per-bucket expansion, no bridges fire
        id1, id2, stats = _salted_bucket_pairs(b2, k2, v, max_bucket_size)
        stats["n_buckets"] = total_buckets
        stats["oversized_buckets"] = n_over
        stats["dropped_pairs"] = possible_all - int(id1.size)
        return id1, id2, stats
    # position within bucket; subgroup boundaries every max_bucket_size
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
    new_sub = new_bucket | (pos % max_bucket_size == 0)
    substarts = np.flatnonzero(new_sub)
    subsizes = np.diff(np.append(substarts, n))
    out1, out2 = [], []
    for s in np.unique(subsizes):
        if s < 2:
            continue
        st = substarts[subsizes == s]
        mat = v[st[:, None] + np.arange(s)[None, :]]  # (groups, s)
        iu, ju = np.triu_indices(int(s), k=1)
        out1.append(mat[:, iu].ravel())
        out2.append(mat[:, ju].ravel())
    # bridges: subgroup starts that are NOT bucket starts pair with the
    # preceding member (ids are sorted and unique within a bucket, so
    # v[q-1] < v[q] holds)
    bridge_at = np.flatnonzero(new_sub & ~new_bucket)
    if bridge_at.size:
        out1.append(v[bridge_at - 1])
        out2.append(v[bridge_at])
    id1 = np.concatenate(out1) if out1 else empty
    id2 = np.concatenate(out2) if out2 else empty
    possible = int((sizes.astype(np.int64) * (sizes - 1) // 2).sum())
    stats = {
        "n_buckets": int(starts.size),
        "oversized_buckets": int((sizes > max_bucket_size).sum()),
        "emitted_pairs": int(id1.size),
        "dropped_pairs": possible - int(id1.size),
    }
    return id1, id2, stats


def _expand_bucket_pairs(
    banded,
    *,
    max_bucket_size: int = 2000,
    broadcast_rows: int = 2_000_000,
    driver_pair_bound: int = 20_000_000,
    num_parts: int = 64,
    stats_out: Optional[dict] = None,
    oversized: str = "salt",
):
    """(band, bkey, doc_id) rows → distinct candidate pairs (id1 < id2).

    Adaptive like the engine's hybrid rounds: a banded set at or below
    ``broadcast_rows`` collects to the driver and runs ONE vectorized
    pass (bucket delimit → salted pair gen → polars distinct) with zero
    exchanges — the whole groupby+map_groups+distinct cascade that used
    to cost two aggregator-actor spin-ups disappears.  Above the bound
    (the 100 TB regime) the rows pre-partition by ``hash(band, bkey) %
    num_parts`` and ONE ``groupby(part).map_groups`` runs the same
    vectorized kernel once per partition (not once per bucket — Ray's
    per-group dispatch over millions of tiny buckets is the other
    constant this kills), then a distributed distinct.

    Hot-bucket salting is observable: per-partition stats (oversized
    buckets, dropped cross-subgroup pairs) are logged, and the driver
    path also returns them via ``stats_out`` — a silent cap would lose
    exactly the boilerplate-cluster pairs web dedup cares about, so no
    pair inside a salt subgroup is lost and every dropped pair is
    counted (bridge pairs keep hot buckets connected for transitive
    clustering)."""
    import logging

    import ray.data

    from ..util import hash_rows_mod_fn

    log = logging.getLogger("rify_ray.dedup")
    banded = banded.materialize()
    n = banded.count()
    if n == 0:
        return None
    if n <= broadcast_rows:
        tabs = [
            b
            for b in banded.iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows and b.num_columns
        ]
        t = pa.concat_tables(tabs).combine_chunks()
        band = np.asarray(t["band"].to_numpy(zero_copy_only=False), dtype=np.int64)
        bkey = np.asarray(t["bkey"].to_numpy(zero_copy_only=False), dtype=np.int64)
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        # pre-check the emitted-pair count so a pathological bucket
        # distribution can't blow up the driver: fall through to the
        # distributed path instead
        order = np.lexsort((bkey, band))
        bb, kk = band[order], bkey[order]
        nb = np.ones(n, dtype=bool)
        nb[1:] = (bb[1:] != bb[:-1]) | (kk[1:] != kk[:-1])
        sizes = np.diff(np.append(np.flatnonzero(nb), n)).astype(np.int64)
        if oversized == "drop":
            kept = sizes[sizes <= max_bucket_size]
            est = int((kept * (kept - 1) // 2).sum())
        else:
            n_sub = -(-sizes // max_bucket_size)  # ceil — salt subgroups per bucket
            rem = sizes - (n_sub - 1) * max_bucket_size
            est = int(
                (
                    (n_sub - 1) * (max_bucket_size * (max_bucket_size - 1) // 2)
                    + rem * (rem - 1) // 2
                    + (n_sub - 1)  # bridge pairs
                ).sum()
            )
        if est <= driver_pair_bound:
            id1, id2, stats = _salted_bucket_pairs(
                band, bkey, ids, max_bucket_size, oversized=oversized
            )
            if stats_out is not None:
                stats_out.update(stats)
            if stats["dropped_pairs"]:
                if oversized == "drop":
                    log.info(
                        "df-capped buckets: %d bucket(s) above the cap excluded "
                        "(%d pair(s) not generated — the documented df-cap semantic)",
                        stats["oversized_buckets"], stats["dropped_pairs"],
                    )
                else:
                    log.warning(
                        "LSH hot-bucket salting: %d oversized bucket(s), %d cross-subgroup "
                        "pair(s) skipped (bridged for connectivity)",
                        stats["oversized_buckets"], stats["dropped_pairs"],
                    )
            if id1.size == 0:
                return None
            import polars as pl

            df = pl.DataFrame({"id1": id1, "id2": id2}).unique()
            return _from_arrow_blocks(
                df.to_arrow().cast(pa.schema([("id1", pa.int64()), ("id2", pa.int64())]))
            )

    def part_pairs(group: pa.Table) -> pa.Table:
        band = np.asarray(group["band"].to_numpy(zero_copy_only=False), dtype=np.int64)
        bkey = np.asarray(group["bkey"].to_numpy(zero_copy_only=False), dtype=np.int64)
        ids = np.asarray(group["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        id1, id2, stats = _salted_bucket_pairs(
            band, bkey, ids, max_bucket_size, oversized=oversized
        )
        if stats["dropped_pairs"] and oversized != "drop":
            logging.getLogger("rify_ray.dedup").warning(
                "LSH hot-bucket salting (partition): %d oversized bucket(s), "
                "%d cross-subgroup pair(s) skipped",
                stats["oversized_buckets"], stats["dropped_pairs"],
            )
        # local distinct before the exchange (combiner)
        import polars as pl

        df = pl.DataFrame({"id1": id1, "id2": id2}).unique()
        return df.to_arrow().cast(
            pa.schema([("id1", pa.int64()), ("id2", pa.int64())])
        )

    parted = banded.map_batches(
        hash_rows_mod_fn(["band", "bkey"], num_parts, "part"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = parted.groupby("part").map_groups(part_pairs, batch_format="pyarrow")
    return _distinct_pairs(pairs)


def _from_arrow_blocks(tbl: pa.Table, rows_per_block: int = 8192):
    """Driver table → Dataset SPLIT INTO BLOCKS: ``from_arrow`` of one
    table yields one block, which serializes every downstream
    ``map_batches`` onto a single core — the driver fast paths here feed
    distributed verify stages, so they must re-enter Ray parallel."""
    import ray.data

    if tbl.num_rows <= rows_per_block:
        return ray.data.from_arrow(tbl)
    return ray.data.from_arrow(
        [tbl.slice(o, rows_per_block) for o in range(0, tbl.num_rows, rows_per_block)]
    )


def _collect_tbl(ds) -> Optional[pa.Table]:
    """Driver-side collect of a (small, bound-checked by the caller)
    Dataset into one Arrow table; None when empty."""
    tabs = [
        b
        for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows and b.num_columns
    ]
    if not tabs:
        return None
    return pa.concat_tables(tabs).combine_chunks()


def _distinct_pairs(pairs, *, broadcast_rows: int = 2_000_000):
    """Distinct (id1, id2).  Adaptive like the engine's hybrid rounds: a
    pair set at or below ``broadcast_rows`` dedups on the driver (polars,
    no aggregator-actor spin-up); above it, the hash-partition groupby
    runs distributed."""
    pairs = pairs.materialize()
    n = pairs.count()
    if n == 0:
        return None
    if n <= broadcast_rows:
        import polars as pl
        import ray.data

        tabs = [
            b
            for b in pairs.iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows and b.num_columns
        ]
        df = pl.from_arrow(pa.concat_tables(tabs)).select(["id1", "id2"]).unique()
        return _from_arrow_blocks(
            df.to_arrow().cast(pa.schema([("id1", pa.int64()), ("id2", pa.int64())]))
        )
    out = pairs.groupby(["id1", "id2"]).count().drop_columns(["count()"]).materialize()
    out = drop_empty_blocks(out)
    if out is None:
        return None

    def project(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return pa.schema([("id1", pa.int64()), ("id2", pa.int64())]).empty_table()
        return pa.table(
            {"id1": pc.cast(batch["id1"], pa.int64()), "id2": pc.cast(batch["id2"], pa.int64())}
        )

    return out.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def minhash_lsh_candidates(
    docs_ds,
    *,
    k_shingles: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    max_bucket_size: int = 2000,
    _sigs=None,
    stats_out: Optional[dict] = None,
):
    """Candidate near-duplicate pairs (id1 < id2): shingle → minhash →
    band → bucketed pair expansion → distinct.  Buckets are the shuffle
    unit; hot buckets (boilerplate docs) are the skew risk — oversized
    buckets are salted into bridged subgroups and every skipped pair is
    counted (see :func:`_expand_bucket_pairs`; driver-path stats land in
    ``stats_out``).  ``_sigs`` lets a caller that already materialized
    the signatures reuse them."""
    sigs = _sigs
    if sigs is None:
        sigs = docs_ds.map_batches(
            minhash_signature_fn(k_shingles=k_shingles, num_perm=num_perm),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    banded = sigs.map_batches(
        minhash_band_fn(num_perm=num_perm, bands=bands),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return _expand_bucket_pairs(
        banded, max_bucket_size=max_bucket_size, stats_out=stats_out
    )


def _sig_binary_fn(num_perm: int):
    """(doc_id, sig list<uint64>) → (doc_id, sigb binary) — fixed-width
    signature bytes, joinable as a payload column (Acero rejects lists)."""

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        flat = np.asarray(
            batch["sig"].combine_chunks().values.to_numpy(zero_copy_only=False),
            dtype=np.uint64,
        ).reshape(n, num_perm)
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "sigb": pa.array([row.tobytes() for row in flat], pa.binary()),
            }
        )

    return fn


def minhash_verified_pairs(
    docs_ds,
    *,
    k_shingles: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    prefilter_margin: Optional[float] = 0.25,
    num_partitions: int = 8,
    broadcast_rows: int = 2_000_000,
    max_bucket_size: int = 2000,
):
    """End-to-end MinHash near-dup: signatures (computed ONCE) →
    LSH candidates → SIGNATURE prefilter → exact n-gram-Jaccard verify.

    The prefilter estimates Jaccard as the fraction of agreeing minhash
    slots and drops pairs with estimate < threshold −
    ``prefilter_margin``; only the small remainder pays the
    exact-shingle-set verification — at web scale the candidate set is
    orders of magnitude larger than the verified set, so this is where
    the verify cost goes from O(candidates) to O(matches).

    NOTE the prefilter makes the result slightly narrower than an exact
    verify of ALL LSH candidates: a true pair with Jaccard ≥ threshold
    whose 64-slot estimate falls below threshold − margin is missed.
    At the default margin 0.25 ≈ 4σ (σ = √(J(1−J)/64) ≤ 1/16), that
    false-negative probability is ~3e-5 per pair; pass
    ``prefilter_margin=None`` to disable the prefilter and verify every
    candidate exactly (the result is then a pure superset filter of the
    LSH candidates).

    Adaptive physicals, same bounds discipline as the engine's hybrid
    rounds: candidate/signature sets at or below ``broadcast_rows``
    prefilter on the driver with one vectorized numpy gather (no
    pair↔signature join exchange); above the bound the prefilter joins
    run distributed."""
    import logging

    n_docs = docs_ds.count()  # metadata-fast on parquet reads
    if prefilter_margin is not None and n_docs <= broadcast_rows:
        # driver fast path — the corpus fits the broadcast bound, so
        # ONE scan computes signatures + exact shingle sets together
        # (shingles hashed once, not twice) and everything downstream —
        # banding, bucket pair expansion, distinct, prefilter, exact
        # verify — runs as vectorized driver passes (identical kernels
        # to the distributed path).  The only other Ray execution is an
        # optional parallel verify when the survivor set is too big for
        # the driver loop.
        import polars as pl
        import ray.data

        st = _collect_tbl(
            docs_ds.map_batches(
                _sig_shingle_fn(k_shingles=k_shingles, num_perm=num_perm),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        )
        if st is None:
            return _empty_verified()
        banded_tbl = minhash_band_fn(num_perm=num_perm, bands=bands)(
            st.select(["doc_id", "sig"])
        )
        id1, id2, stats = _salted_bucket_pairs(
            np.asarray(banded_tbl["band"].to_numpy(zero_copy_only=False), dtype=np.int64),
            np.asarray(banded_tbl["bkey"].to_numpy(zero_copy_only=False), dtype=np.int64),
            np.asarray(banded_tbl["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64),
            max_bucket_size,
        )
        if stats["dropped_pairs"]:
            logging.getLogger("rify_ray.dedup").warning(
                "LSH hot-bucket salting: %d oversized bucket(s), %d cross-subgroup "
                "pair(s) skipped (bridged for connectivity)",
                stats["oversized_buckets"], stats["dropped_pairs"],
            )
        if id1.size == 0:
            return _empty_verified()
        pairs = pl.DataFrame({"id1": id1, "id2": id2}).unique()
        i1 = pairs["id1"].to_numpy()
        i2 = pairs["id2"].to_numpy()
        sid = np.asarray(st["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        smat = np.asarray(
            st["sig"].combine_chunks().values.to_numpy(zero_copy_only=False),
            dtype=np.uint64,
        ).reshape(len(sid), num_perm)
        order = np.argsort(sid)
        sid, smat = sid[order], smat[order]
        # column-wise agreement count: two (n_pairs, num_perm) fancy-index
        # gathers would allocate ~16·num_perm bytes per pair just to
        # compare them — the per-slot loop touches one column at a time
        # (num_perm tiny passes over the pair list, ~5× faster measured)
        p1 = np.searchsorted(sid, i1)
        p2 = np.searchsorted(sid, i2)
        smat_t = np.ascontiguousarray(smat.T)  # (num_perm, n_docs)
        agree = np.zeros(len(i1), dtype=np.int32)
        for j in range(num_perm):
            col = smat_t[j]
            agree += col[p1] == col[p2]
        est = agree / num_perm
        keep = est >= threshold - prefilter_margin
        i1k = np.ascontiguousarray(i1[keep])
        i2k = np.ascontiguousarray(i2[keep])
        if i1k.size == 0:
            return _empty_verified()
        # exact verify straight off the collected shingle sets — the
        # docs were already shingled in the combined scan, no re-scan
        inv = np.unique(np.concatenate([i1k, i2k]))
        sh_pos = np.searchsorted(sid, inv)
        sh_col = st["sh"].combine_chunks()
        if i1k.size <= _DRIVER_VERIFY_BOUND:
            sets = {int(i): sh_col[int(order[p])].as_py() for i, p in zip(inv, sh_pos)}
            jac = _jaccard_from_sets([sets[i] for i in i1k], [sets[i] for i in i2k])
            vkeep = jac >= threshold
            return ray.data.from_arrow(
                pa.table(
                    {
                        "id1": pa.array(i1k[vkeep], pa.int64()),
                        "id2": pa.array(i2k[vkeep], pa.int64()),
                        "jaccard": pa.array(jac[vkeep], pa.float64()),
                    }
                )
            )
        # large survivor set: the per-pair intersection loop must
        # parallelize — broadcast the (involved-only) shingle lookup and
        # run attach+verify as ONE map over survivor blocks
        import ray

        lut = pl.DataFrame(
            {
                "doc_id": inv,
                "sh": pl.Series(
                    [sh_col[int(order[p])].as_py() for p in sh_pos], dtype=pl.Binary
                ),
            }
        )
        lut_ref = ray.put(lut)
        survivors = _from_arrow_blocks(
            pa.table(
                {"id1": pa.array(i1k, pa.int64()), "id2": pa.array(i2k, pa.int64())}
            )
        )

        def attach_verify(batch: pa.Table) -> pa.Table:
            t: pl.DataFrame = ray.get(lut_ref)
            df = pl.from_arrow(batch)
            df = df.join(t.rename({"doc_id": "id1", "sh": "sh_id1"}), on="id1", how="inner")
            df = df.join(t.rename({"doc_id": "id2", "sh": "sh_id2"}), on="id2", how="inner")
            ids1 = df["id1"].to_numpy()
            ids2 = df["id2"].to_numpy()
            jac = _jaccard_from_sets(df["sh_id1"].to_list(), df["sh_id2"].to_list())
            vkeep = jac >= threshold
            return pa.table(
                {
                    "id1": pa.array(np.asarray(ids1)[vkeep], pa.int64()),
                    "id2": pa.array(np.asarray(ids2)[vkeep], pa.int64()),
                    "jaccard": pa.array(jac[vkeep], pa.float64()),
                }
            )

        return survivors.map_batches(
            attach_verify, batch_format="pyarrow", zero_copy_batch=True
        )

    # scale path (corpus above the broadcast bound, or prefilter
    # disabled): signatures materialize once and feed both the LSH
    # candidates and the signature prefilter join
    sigs = docs_ds.map_batches(
        minhash_signature_fn(k_shingles=k_shingles, num_perm=num_perm),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    cands = minhash_lsh_candidates(
        docs_ds, k_shingles=k_shingles, num_perm=num_perm, bands=bands,
        max_bucket_size=max_bucket_size, _sigs=sigs,
    )
    if cands is None:
        return _empty_verified()
    if prefilter_margin is None:
        return verify_pairs_jaccard(
            cands, docs_ds, k=k_shingles, threshold=threshold,
            num_partitions=num_partitions,
        )
    cutoff = threshold - prefilter_margin
    cands = cands.materialize()
    sigb = sigs.map_batches(
        _sig_binary_fn(num_perm), batch_format="pyarrow", zero_copy_batch=True
    )
    joined = _attach_pair_payload(cands, sigb, "sigb", num_partitions=num_partitions)
    if joined is None:
        return _empty_verified()

    def estimate(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        a = np.frombuffer(b"".join(batch["sigb_id1"].to_pylist()), dtype=np.uint64).reshape(n, num_perm)
        b_ = np.frombuffer(b"".join(batch["sigb_id2"].to_pylist()), dtype=np.uint64).reshape(n, num_perm)
        est = (a == b_).mean(axis=1)
        keep = est >= cutoff
        return pa.table(
            {
                "id1": pc.cast(batch["id1"], pa.int64()).filter(pa.array(keep)),
                "id2": pc.cast(batch["id2"], pa.int64()).filter(pa.array(keep)),
            }
        )

    survivors = joined.map_batches(estimate, batch_format="pyarrow", zero_copy_batch=True)
    return verify_pairs_jaccard(
        survivors, docs_ds, k=k_shingles, threshold=threshold, num_partitions=num_partitions
    )


def _attach_pair_payload(
    pairs_ds,
    lookup_ds,
    value_col: str,
    *,
    broadcast_rows: int = 2_000_000,
    num_partitions: int = 8,
):
    """Attach a per-doc payload to both sides of a pair stream:
    (id1, id2) + (doc_id, value) → (id1, id2, value_id1, value_id2).

    Adaptive join strategy (same rationale as the engine's hybrid
    rounds): a lookup table at or below ``broadcast_rows`` is broadcast
    once via ``ray.put`` and attached in ONE map over the pairs — no
    shuffle-actor spin-up; a bigger one goes through two hash-shuffle
    joins.  Returns a Dataset or None when nothing joins."""
    import ray

    from ..util import polars_to_arrow_string

    lookup = lookup_ds.materialize()
    n = lookup.count()
    if n == 0:
        return None
    if n <= broadcast_rows:
        import polars as pl

        tabs = [
            b
            for b in lookup.iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows and b.num_columns
        ]
        lut = pl.from_arrow(pa.concat_tables(tabs)).select(["doc_id", value_col])
        ref = ray.put(lut)

        def attach(batch: pa.Table) -> pa.Table:
            t: pl.DataFrame = ray.get(ref)
            df = pl.from_arrow(batch)
            df = df.join(
                t.rename({"doc_id": "id1", value_col: f"{value_col}_id1"}),
                on="id1",
                how="inner",
            )
            df = df.join(
                t.rename({"doc_id": "id2", value_col: f"{value_col}_id2"}),
                on="id2",
                how="inner",
            )
            return polars_to_arrow_string(df)

        return pairs_ds.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)

    def prep(name):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {name: batch["doc_id"], f"{value_col}_{name}": batch[value_col]}
            )

        return fn

    d1 = lookup.map_batches(prep("id1"), batch_format="pyarrow", zero_copy_batch=True).materialize()
    d2 = lookup.map_batches(prep("id2"), batch_format="pyarrow", zero_copy_batch=True).materialize()
    half = drop_empty_blocks(
        pairs_ds.join(d1, "inner", num_partitions, on=("id1",)).materialize()
    )
    if half is None:
        return None
    return drop_empty_blocks(
        half.join(d2, "inner", num_partitions, on=("id2",)).materialize()
    )


def _empty_verified():
    import ray.data

    return ray.data.from_arrow(
        pa.schema(
            [("id1", pa.int64()), ("id2", pa.int64()), ("jaccard", pa.float64())]
        ).empty_table()
    )


def _empty_counts():
    import ray.data

    return ray.data.from_arrow(
        pa.schema(
            [
                ("id1", pa.int64()),
                ("id2", pa.int64()),
                ("inter_n", pa.int64()),
                ("union_n", pa.int64()),
            ]
        ).empty_table()
    )


def ngram_jaccard(text1: str, text2: str, k: int = 5) -> float:
    """Exact k-char-shingle Jaccard (verification predicate)."""
    s1 = set(map(int, _shingle_hashes(text1 or "", k)))
    s2 = set(map(int, _shingle_hashes(text2 or "", k)))
    if not s1 and not s2:
        return 1.0
    inter = len(s1 & s2)
    return inter / (len(s1) + len(s2) - inter)


def _shingle_rows_fn(k: int):
    """(doc_id, text) → exploded (band=0, bkey=shingle-hash, doc_id)
    rows, distinct shingles per doc — the bucket-keyed input shape of
    :func:`_expand_bucket_pairs`, with the shingle itself as the bucket
    key (exact shared-shingle candidate generation, no minhash)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = np.asarray(
            pc.cast(batch["doc_id"], pa.int64()).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        arrs = [_shingle_hashes(t or "", k) for t in batch["text"].to_pylist()]
        lens = np.array([a.size for a in arrs], dtype=np.int64)
        sh = (
            np.concatenate(arrs) if arrs else np.zeros(0, dtype=np.uint64)
        ).view(np.int64)
        return pa.table(
            {
                "band": pa.array(np.zeros(sh.size, dtype=np.int64)),
                "bkey": pa.array(sh),
                "doc_id": pa.array(np.repeat(ids, lens)),
            }
        )

    return fn


def ngram_jaccard_pairs(
    docs_ds,
    *,
    k: int = 5,
    threshold_num: int = 4,
    threshold_den: int = 5,
    max_df: int = 50,
    driver_pairs_bound: int = 50_000,
    num_partitions: int = 8,
):
    """EXACT n-gram-Jaccard near-duplicate pairs — no minhash anywhere.

    The sketch-free member of the dedup family (exact / MinHash+LSH /
    SimHash / n-gram Jaccard / embedding-cosine): candidates are pairs
    of documents sharing at least one k-char shingle whose document
    frequency is ≤ ``max_df`` (higher-df shingles are boilerplate whose
    O(df²) pair expansion would dominate the job — the df cap is the
    documented semantic, identical to a SQL ``HAVING count(*) ≤
    max_df``, not a silent truncation: a pair whose ONLY shared
    shingles are boilerplate generates no candidate).  Verification
    computes the exact Jaccard over each pair's FULL shingle sets; the
    threshold is the rational ``threshold_num/threshold_den`` compared
    by integer cross-multiplication, so the output
    ``(id1, id2, inter_n, union_n)`` is bit-reproducible against a SQL
    oracle (shingles travel as 64-bit rolling hashes — distinct
    shingles collide with probability ~n²/2⁶² per corpus, negligible
    and documented).

    Scale shape: shingle explode is a pure map; candidate generation is
    one bucket-partitioned exchange with the df cap applied per bucket
    (a shingle's rows co-locate, so the cap is globally exact); verify
    touches only pair-involved docs.  100 TB knobs: ``max_df`` bounds
    per-bucket work, ``driver_pairs_bound`` gates the driver fast path.
    """
    keyed = docs_ds.map_batches(
        _shingle_rows_fn(k), batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = _expand_bucket_pairs(keyed, max_bucket_size=max_df, oversized="drop")
    if pairs is None:
        return _empty_counts()
    return verify_pairs_jaccard(
        pairs,
        docs_ds,
        k=k,
        threshold=threshold_num / threshold_den,
        num_partitions=num_partitions,
        driver_pairs_bound=driver_pairs_bound,
        counts=(threshold_num, threshold_den),
    )


def _shingle_sets_fn(k: int):
    """(doc_id, text) → (doc_id, sh: binary) — each doc's sorted unique
    shingle hashes as raw uint64 bytes, computed ONCE per doc (candidate
    verification used to re-shingle both texts per pair; a doc in p
    pairs was hashed p times).  Binary, not list<uint64>: Acero joins
    reject list-typed payload columns."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        sets = [
            _shingle_hashes(t or "", k).tobytes() for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": pc.cast(ids, pa.int64()),
                "sh": pa.array(sets, pa.binary()),
            }
        )

    return fn


def _inter_union_from_sets(sh1, sh2) -> Tuple[np.ndarray, np.ndarray]:
    """Exact per-pair intersection / union SIZES over sorted-unique
    shingle-hash byte blobs — the integer-valued sibling of
    :func:`_jaccard_from_sets` (a rational threshold compares these with
    cross-multiplication instead of a float division at the boundary)."""
    inter = np.empty(len(sh1), dtype=np.int64)
    uni = np.empty(len(sh1), dtype=np.int64)
    for i in range(len(sh1)):
        a = np.frombuffer(sh1[i], dtype=np.uint64)
        b = np.frombuffer(sh2[i], dtype=np.uint64)
        ii = np.intersect1d(a, b, assume_unique=True).size
        inter[i] = ii
        uni[i] = a.size + b.size - ii
    return inter, uni


def _jaccard_from_sets(sh1, sh2) -> np.ndarray:
    jac = np.empty(len(sh1), dtype=np.float64)
    for i in range(len(sh1)):
        a = np.frombuffer(sh1[i], dtype=np.uint64)
        b = np.frombuffer(sh2[i], dtype=np.uint64)
        if a.size == 0 and b.size == 0:
            jac[i] = 1.0
            continue
        inter = np.intersect1d(a, b, assume_unique=True).size
        jac[i] = inter / (a.size + b.size - inter)
    return jac


def _verify_pairs_driver(
    i1: np.ndarray, i2: np.ndarray, docs_ds, *, k: int, threshold: float,
    counts: Optional[Tuple[int, int]] = None,
):
    """Driver-side exact verify of a BOUNDED pair list (caller enforces
    the bound): ONE distributed pass computes shingle sets for only the
    docs that appear in a pair (broadcast ``is_in`` filter — O(matches)
    docs, not O(corpus)), then the jaccard predicate resolves
    in-process.  This is the single Ray execution on the small-pairs
    path; going through a Dataset round trip (from_arrow → materialize
    → count → iter) would spin the executor three extra times for
    driver-resident data."""
    import ray
    import ray.data

    if i1.size == 0:
        return _empty_counts() if counts is not None else _empty_verified()
    involved = np.unique(np.concatenate([i1, i2]))
    inv_ref = ray.put(pa.array(involved, pa.int64()))
    shingle = _shingle_sets_fn(k)

    def filtered_shingles(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(pc.cast(batch["doc_id"], pa.int64()), value_set=ray.get(inv_ref))
        return shingle(batch.filter(mask))

    sets: dict = {}
    for b in docs_ds.map_batches(
        filtered_shingles, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        if b.num_rows == 0 or b.num_columns == 0:
            continue
        sets.update(zip(b["doc_id"].to_pylist(), b["sh"].to_pylist()))
    sh1 = [sets[i] for i in i1]
    sh2 = [sets[i] for i in i2]
    if counts is not None:
        num, den = counts
        inter, uni = _inter_union_from_sets(sh1, sh2)
        keep = den * inter >= num * uni
        return ray.data.from_arrow(
            pa.table(
                {
                    "id1": pa.array(i1[keep], pa.int64()),
                    "id2": pa.array(i2[keep], pa.int64()),
                    "inter_n": pa.array(inter[keep], pa.int64()),
                    "union_n": pa.array(uni[keep], pa.int64()),
                }
            )
        )
    jac = _jaccard_from_sets(sh1, sh2)
    keep = jac >= threshold
    return ray.data.from_arrow(
        pa.table(
            {
                "id1": pa.array(i1[keep], pa.int64()),
                "id2": pa.array(i2[keep], pa.int64()),
                "jaccard": pa.array(jac[keep], pa.float64()),
            }
        )
    )


def verify_pairs_jaccard(
    pairs_ds,
    docs_ds,
    *,
    k: int = 5,
    threshold: float = 0.5,
    num_partitions: int = 8,
    driver_pairs_bound: int = 50_000,
    counts: Optional[Tuple[int, int]] = None,
):
    """Exact n-gram Jaccard over candidate pairs; keeps pairs ≥ threshold.

    ``counts=(num, den)`` switches to the integer-exact mode: the
    threshold is the rational num/den compared by cross-multiplication
    (``den·|∩| ≥ num·|∪|`` — no float boundary), and the output carries
    ``(id1, id2, inter_n, union_n)`` instead of a float ``jaccard``.

    A pair set at or below ``driver_pairs_bound`` verifies on the driver
    (:func:`_verify_pairs_driver` — one filtered-shingle scan, no join
    exchange).  Above the bound, every doc's shingle set is computed
    once and two hash-join shuffles attach them to the pairs
    (``_attach_pair_payload``); the per-pair predicate is a sorted-array
    intersection (numpy), not Python sets."""
    pairs_ds = pairs_ds.materialize()
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        return _empty_counts() if counts is not None else _empty_verified()
    if n_pairs <= driver_pairs_bound:
        pt = _collect_tbl(pairs_ds)
        if pt is None:
            return _empty_counts() if counts is not None else _empty_verified()
        i1 = np.asarray(pt["id1"].to_numpy(zero_copy_only=False), dtype=np.int64)
        i2 = np.asarray(pt["id2"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return _verify_pairs_driver(
            i1, i2, docs_ds, k=k, threshold=threshold, counts=counts
        )
    return _verify_pairs_distributed(
        pairs_ds, docs_ds, k=k, threshold=threshold,
        num_partitions=num_partitions, counts=counts,
    )


def _verify_pairs_distributed(
    pairs_ds, docs_ds, *, k, threshold, num_partitions, involved=None, counts=None
):
    """Distributed exact verify: shingle sets computed once per doc,
    attached to both pair sides (broadcast lookup below the bound in
    ``_attach_pair_payload``, hash joins above), per-pair sorted-array
    intersection inside ``map_batches`` — the pair loop parallelizes
    across the pool instead of serializing on the driver.

    ``involved`` (optional int64 numpy array of doc ids appearing in a
    pair) prunes the shingle scan to O(matched docs) — at web scale the
    pair-involved set is far smaller than the corpus."""
    shingle = _shingle_sets_fn(k)
    if involved is not None:
        import ray

        inv_ref = ray.put(pa.array(np.unique(involved), pa.int64()))

        def sh_fn(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(
                pc.cast(batch["doc_id"], pa.int64()), value_set=ray.get(inv_ref)
            )
            return shingle(batch.filter(mask))

    else:
        sh_fn = shingle
    sh_ds = docs_ds.map_batches(sh_fn, batch_format="pyarrow", zero_copy_batch=True)
    joined = _attach_pair_payload(pairs_ds, sh_ds, "sh", num_partitions=num_partitions)
    if joined is None:
        return _empty_counts() if counts is not None else _empty_verified()

    def verify(batch: pa.Table) -> pa.Table:
        ids1 = np.asarray(batch["id1"].to_numpy(zero_copy_only=False), dtype=np.int64)
        ids2 = np.asarray(batch["id2"].to_numpy(zero_copy_only=False), dtype=np.int64)
        sh1 = batch["sh_id1"].to_pylist()
        sh2 = batch["sh_id2"].to_pylist()
        if counts is not None:
            num, den = counts
            inter, uni = _inter_union_from_sets(sh1, sh2)
            keep = den * inter >= num * uni
            return pa.table(
                {
                    "id1": pa.array(ids1[keep], pa.int64()),
                    "id2": pa.array(ids2[keep], pa.int64()),
                    "inter_n": pa.array(inter[keep], pa.int64()),
                    "union_n": pa.array(uni[keep], pa.int64()),
                }
            )
        jac = _jaccard_from_sets(sh1, sh2)
        keep = jac >= threshold
        return pa.table(
            {
                "id1": pa.array(ids1[keep], pa.int64()),
                "id2": pa.array(ids2[keep], pa.int64()),
                "jaccard": pa.array(jac[keep], pa.float64()),
            }
        )

    return joined.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# duplicate clustering: connected components over a pair stream
# ---------------------------------------------------------------------------


def exact_dup_pairs(docs_ds, *, key_col: str = "text", id_col: str = "doc_id"):
    """Chained pairs of exact duplicates: per equal-``key_col`` group the
    id-sorted members link consecutively — (a,b),(b,c) not the O(n²)
    clique — which is exactly enough edge structure for
    :func:`duplicate_clusters` to recover the full group.  Shuffle key is
    a 128-bit digest (long texts never travel as keys); non-string keys
    are digested through their repr, so any hashable column works."""

    def key_fn(batch: pa.Table) -> pa.Table:
        vals = batch[key_col].to_pylist()
        if pa.types.is_string(batch[key_col].type) or pa.types.is_large_string(
            batch[key_col].type
        ):
            raw = (t.encode("utf-8") if t is not None else b"" for t in vals)
        else:
            raw = (repr(t).encode("utf-8") for t in vals)
        keys = [hashlib.md5(r).hexdigest() for r in raw]
        return pa.table({"khash": pa.array(keys, pa.string()), id_col: batch[id_col]})

    keyed = docs_ds.map_batches(key_fn, batch_format="pyarrow", zero_copy_batch=True)

    def chain(group: pa.Table) -> pa.Table:
        ids = np.sort(np.asarray(group[id_col].to_pylist(), dtype=np.int64))
        if ids.size < 2:
            return pa.table(
                {"id1": pa.array([], pa.int64()), "id2": pa.array([], pa.int64())}
            )
        return pa.table(
            {"id1": pa.array(ids[:-1], pa.int64()), "id2": pa.array(ids[1:], pa.int64())}
        )

    return keyed.groupby("khash").map_groups(chain, batch_format="pyarrow")


def duplicate_clusters(
    pairs_ds,
    *,
    broadcast_rows: int = 5_000_000,
    max_rounds: int = 64,
    num_partitions: int = 16,
):
    """Connected components over an (id1, id2) pair stream →
    ``(doc_id, cluster_id)`` rows, one per doc that appears in any pair,
    with ``cluster_id`` = the component's minimum doc id (the canonical
    survivor in keep-first dedup).

    Composes with every pair producer here: exact chains
    (:func:`exact_dup_pairs`), MinHash/SimHash verified pairs, embedding
    near-dup pairs — and the hot-bucket salting BRIDGES guarantee a
    salted cluster still comes out as one component.

    Physical plans: a pair set at or below ``broadcast_rows`` runs
    driver union-find with path compression (exact, one pass); above it,
    distributed min-label propagation — each round joins edge endpoints
    against current labels and takes a per-node ``groupby().min()``, so
    labels only ever decrease and the round count is bounded by the
    component diameter (pair streams from LSH buckets are
    near-star-shaped, so a handful of rounds in practice).  Convergence
    is detected by the (strictly decreasing) label sum — no extra
    compare join."""
    import ray.data

    pairs = pairs_ds.materialize()
    n = pairs.count()
    if n == 0:
        return ray.data.from_arrow(
            pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())]).empty_table()
        )
    if n <= broadcast_rows:
        t = _collect_tbl(pairs)
        a = np.asarray(t["id1"].to_numpy(zero_copy_only=False), dtype=np.int64)
        b = np.asarray(t["id2"].to_numpy(zero_copy_only=False), dtype=np.int64)
        nodes = np.unique(np.concatenate([a, b]))
        idx = {int(v): i for i, v in enumerate(nodes)}
        parent = np.arange(len(nodes), dtype=np.int64)

        def find(x: int) -> int:
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for u, v in zip(a.tolist(), b.tolist()):
            ru, rv = find(idx[u]), find(idx[v])
            if ru != rv:
                # union by min node value keeps roots canonical-ish; the
                # final pass below resolves true minima anyway
                parent[max(ru, rv)] = min(ru, rv)
        roots = np.array([find(i) for i in range(len(nodes))], dtype=np.int64)
        # min doc id per component (nodes are sorted, so the root's value
        # is NOT necessarily the min — map root → min member)
        order = np.argsort(roots, kind="stable")
        rs, ns = roots[order], nodes[order]
        starts = np.flatnonzero(np.r_[True, rs[1:] != rs[:-1]])
        mins = np.minimum.reduceat(ns, starts)
        comp_min = np.repeat(mins, np.diff(np.append(starts, len(rs))))
        out = np.empty_like(comp_min)
        out[order] = comp_min
        return _from_arrow_blocks(
            pa.table(
                {
                    "doc_id": pa.array(nodes, pa.int64()),
                    "cluster_id": pa.array(out, pa.int64()),
                }
            )
        )

    # distributed min-label propagation
    def both_dirs(batch: pa.Table) -> pa.Table:
        u = pc.cast(batch["id1"], pa.int64())
        v = pc.cast(batch["id2"], pa.int64())
        return pa.table(
            {
                "u": pa.concat_arrays([u.combine_chunks(), v.combine_chunks()]),
                "v": pa.concat_arrays([v.combine_chunks(), u.combine_chunks()]),
            }
        )

    edges = pairs.map_batches(
        both_dirs, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    from ..util import drop_empty_blocks

    lbl_schema = pa.schema([("v", pa.int64()), ("lbl", pa.int64())])
    # label(v) starts at min(v, min neighbor) — one groupby seeds it
    seed = edges.map_batches(
        lambda b: pa.table(
            {
                "v": pa.concat_arrays([b["u"].combine_chunks(), b["u"].combine_chunks()]),
                "lbl": pa.concat_arrays([b["v"].combine_chunks(), b["u"].combine_chunks()]),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    labels = seed.groupby("v").min("lbl").materialize()
    labels = drop_empty_blocks(labels)

    def canon(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return lbl_schema.empty_table()
        return pa.table(
            {"v": pc.cast(batch["v"], pa.int64()), "lbl": pc.cast(batch["min(lbl)"], pa.int64())}
        )

    labels = labels.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True).materialize()

    def label_sum(ds) -> int:
        return sum(
            pc.sum(b["lbl"]).as_py() or 0
            for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows
        )

    prev = label_sum(labels)
    for _ in range(max_rounds):
        # propagate: candidate label for v = label(u) over every edge
        # (u, v); combine with current labels, per-node min
        joined = drop_empty_blocks(
            edges.join(labels.rename_columns(["u", "lbl"]), "inner", num_partitions, on=("u",)).materialize()
        )
        if joined is None:
            break
        cand = joined.map_batches(
            lambda b: pa.table({"v": pc.cast(b["v"], pa.int64()), "lbl": pc.cast(b["lbl"], pa.int64())}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        merged = cand.union(labels).groupby("v").min("lbl").materialize()
        merged = drop_empty_blocks(merged)
        labels = merged.map_batches(
            canon, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        # pointer jumping: label(v) ← label(label(v)).  labels is keyed
        # by v, so the lbl-side join is many-to-one and needs no groupby;
        # doubling the propagation distance per round turns long chains
        # from O(diameter) rounds into O(log diameter)
        jump = drop_empty_blocks(
            labels.join(
                labels.rename_columns(["lbl", "lbl2"]),
                "left_outer",
                num_partitions,
                on=("lbl",),
            ).materialize()
        )
        if jump is not None:
            def shortcut(b: pa.Table) -> pa.Table:
                if b.num_columns == 0:
                    return lbl_schema.empty_table()
                l1 = pc.cast(b["lbl"], pa.int64())
                l2 = pc.cast(b["lbl2"], pa.int64())
                return pa.table(
                    {
                        "v": pc.cast(b["v"], pa.int64()),
                        "lbl": pc.min_element_wise(l1, pc.coalesce(l2, l1)),
                    }
                )

            labels = jump.map_batches(
                shortcut, batch_format="pyarrow", zero_copy_batch=True
            ).materialize()
        cur = label_sum(labels)
        if cur == prev:  # labels only decrease; equal sum ⇒ fixpoint
            break
        prev = cur

    return labels.map_batches(
        lambda b: pa.table(
            {"doc_id": pc.cast(b["v"], pa.int64()), "cluster_id": pc.cast(b["lbl"], pa.int64())}
        )
        if b.num_columns
        else pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())]).empty_table(),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash_fn(batch: pa.Table) -> pa.Table:
    """64-bit SimHash over whitespace tokens (crc32-seeded bit votes).

    Batched: all tokens of the batch hash into one array, per-doc bit
    votes via a single ``np.add.reduceat`` — no per-doc numpy setup."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    all_hashes: List[int] = []
    offsets = [0]
    for t in texts:
        tokens = (t or "").split()
        all_hashes.extend(zlib.crc32(w.encode("utf-8")) for w in tokens)
        offsets.append(len(all_hashes))
    out = np.zeros(len(texts), dtype=np.uint64)
    if all_hashes:
        hs = np.asarray(all_hashes, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        signs = (
            ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int32)
            * 2
            - 1
        )  # (total_tokens, 64) in {-1, +1}
        # docs with zero tokens get zero votes; segments of the valid
        # (non-empty) docs abut exactly, so one reduceat covers them all
        votes = np.zeros((len(texts), 64), dtype=np.int64)
        seg_lens = np.diff(offsets)
        valid = seg_lens > 0
        if valid.any():
            votes[valid] = np.add.reduceat(
                signs, np.asarray(offsets[:-1])[valid], axis=0
            )
        bitvals = (votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]
        out = bitvals.sum(axis=1)
    signed = out.view(np.int64)  # two's-complement reinterpret of the uint64 hash
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "simhash": pa.array(signed, pa.int64()),
        }
    )


def _simhash_chunk_fn(batch: pa.Table) -> pa.Table:
    """(doc_id, simhash) → (band, bkey, doc_id): 4×16-bit chunk banding,
    fully vectorized."""
    n = batch.num_rows
    ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
    sh = np.asarray(
        batch["simhash"].to_numpy(zero_copy_only=False), dtype=np.int64
    ).view(np.uint64)
    shifts = np.uint64(16) * np.arange(4, dtype=np.uint64)
    chunks = ((sh[:, None] >> shifts[None, :]) & np.uint64(0xFFFF)).astype(np.int64)
    return pa.table(
        {
            "band": pa.array(np.tile(np.arange(4, dtype=np.int32), n), pa.int32()),
            "bkey": pa.array(chunks.reshape(-1), pa.int64()),
            "doc_id": pa.array(np.repeat(ids, 4), pa.int64()),
        }
    )


def _simhash_verify_arrays(
    ids1: np.ndarray, ids2: np.ndarray, a: np.ndarray, b: np.ndarray, max_hamming: int
) -> pa.Table:
    """Popcount-verify simhash pairs (vectorized unpackbits)."""
    x = (a ^ b).view(np.uint64)
    d = (
        np.unpackbits(x.view(np.uint8)).reshape(len(x), 64).sum(axis=1)
        if len(x)
        else np.zeros(0, dtype=np.int64)
    )
    keep = d <= max_hamming
    return pa.table(
        {
            "id1": pa.array(ids1[keep], pa.int64()),
            "id2": pa.array(ids2[keep], pa.int64()),
            "hamming": pa.array(d[keep].astype(np.int64), pa.int64()),
        }
    )


def simhash_candidates(
    docs_ds, *, max_hamming: int = 3, broadcast_rows: int = 2_000_000
):
    """Near-dup candidates via 4×16-bit chunk bucketing (pigeonhole: any
    pair within Hamming distance 3 agrees on ≥1 chunk), verified by
    popcount.

    One distributed pass computes the 64-bit signatures (the real
    per-byte compute); when the signature table fits ``broadcast_rows``
    the chunking, bucket pair expansion, distinct and popcount verify
    all run as one vectorized driver pass (same kernels, no exchange).
    Above the bound the buckets expand via the partitioned
    :func:`_expand_bucket_pairs` path and verification joins
    signatures back through ``_attach_pair_payload``."""
    sigs = docs_ds.map_batches(
        simhash_fn, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if sigs.count() <= broadcast_rows:
        st = _collect_tbl(sigs)
        if st is None:
            return None
        chunk_tbl = _simhash_chunk_fn(st)
        id1, id2, _stats = _salted_bucket_pairs(
            np.asarray(chunk_tbl["band"].to_numpy(zero_copy_only=False), dtype=np.int64),
            np.asarray(chunk_tbl["bkey"].to_numpy(zero_copy_only=False), dtype=np.int64),
            np.asarray(chunk_tbl["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64),
            2000,
        )
        if id1.size == 0:
            return None
        import polars as pl
        import ray.data

        pairs = pl.DataFrame({"id1": id1, "id2": id2}).unique()
        i1 = pairs["id1"].to_numpy()
        i2 = pairs["id2"].to_numpy()
        sid = np.asarray(st["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        sh = np.asarray(st["simhash"].to_numpy(zero_copy_only=False), dtype=np.int64)
        order = np.argsort(sid)
        sid, sh = sid[order], sh[order]
        return ray.data.from_arrow(
            _simhash_verify_arrays(
                i1, i2, sh[np.searchsorted(sid, i1)], sh[np.searchsorted(sid, i2)],
                max_hamming,
            )
        )

    banded = sigs.map_batches(
        _simhash_chunk_fn, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = _expand_bucket_pairs(banded)
    if pairs is None:
        return None

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": pc.cast(batch["doc_id"], pa.int64()), "sh": batch["simhash"]}
        )

    sig_lookup = sigs.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)
    joined = _attach_pair_payload(pairs, sig_lookup, "sh")
    if joined is None:
        return None

    def verify(batch: pa.Table) -> pa.Table:
        return _simhash_verify_arrays(
            np.asarray(batch["id1"].to_numpy(zero_copy_only=False), dtype=np.int64),
            np.asarray(batch["id2"].to_numpy(zero_copy_only=False), dtype=np.int64),
            np.asarray(batch["sh_id1"].to_numpy(zero_copy_only=False), dtype=np.int64),
            np.asarray(batch["sh_id2"].to_numpy(zero_copy_only=False), dtype=np.int64),
            max_hamming,
        )

    return joined.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def _embed_band_fn(dim: int, bands: int, bits_per_band: int, seed: int = 7):
    """(vec_id, embedding) → (band, bkey, vec_id) rows: banded
    random-hyperplane LSH.  A pair at cosine θ agrees on one band with
    probability (1 − arccos(θ)/π)^bits; over B bands detection is
    1 − (1 − p)^B — sized so near-threshold pairs are found w.h.p."""
    rs = np.random.RandomState(seed)
    planes = rs.normal(size=(bands * bits_per_band, dim))
    weights = (1 << np.arange(bits_per_band, dtype=np.int64))[None, None, :]

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = np.asarray(batch["vec_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        vecs = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        signs = (vecs @ planes.T) >= 0  # (n, bands*bits)
        keys = (signs.reshape(n, bands, bits_per_band) * weights).sum(axis=2)  # (n, bands)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n), pa.int32()),
                "bkey": pa.array(keys.reshape(-1).astype(np.int64), pa.int64()),
                "doc_id": pa.array(np.repeat(ids, bands), pa.int64()),
            }
        )

    return fn


def _embed_binary_fn(batch: pa.Table) -> pa.Table:
    """(vec_id, embedding) → (doc_id, emb: binary float64 bytes) —
    fixed-width payload joinable/broadcastable for pair verification."""
    vecs = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
    return pa.table(
        {
            "doc_id": pc.cast(batch["vec_id"], pa.int64()),
            "emb": pa.array([v.tobytes() for v in vecs], pa.binary()),
        }
    )


def embedding_neardup_pairs(
    emb_ds,
    *,
    threshold: float = 0.95,
    bands: int = 48,
    bits_per_band: int = 4,
    method: str = "auto",
):
    """Pairs (id1 < id2) with cosine >= threshold.

    Two physical plans, picked by the threshold (``method="auto"``):

    - ``"lsh"`` (threshold ≥ 0.8): banded random-hyperplane LSH — bucket
      both sides, pair WITHIN buckets (same shuffle shape as MinHash
      LSH), verify candidates by exact cosine.  A hyperplane band only
      discriminates when the target angle is small; at 48×4 bands,
      detection at cos 0.8 is ≥ 1−(1−0.59)^48 ≈ 1.
    - ``"brute_blocks"`` (lower thresholds): hyperplane buckets stop
      separating (p_bit ≈ 0.65 ⇒ bucket sizes ≈ n/2^bits and the
      within-bucket pair expansion approaches all-pairs anyway), so run
      the honest all-pairs scan as block × block matmuls — every worker
      streams the OTHER blocks from the object store; the embedding
      matrix never materializes on the driver.

    Recall vs brute force is asserted in
    tests/test_stages.py::test_embed_neardup_recall_vs_brute."""
    if method == "auto":
        method = "lsh" if threshold >= 0.8 else "brute_blocks"
    if method == "brute_blocks":
        return _embedding_neardup_brute_blocks(emb_ds, threshold)
    dim = len(emb_ds.take(1)[0]["embedding"])
    banded = emb_ds.map_batches(
        _embed_band_fn(dim, bands, bits_per_band),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = _expand_bucket_pairs(banded)
    if pairs is None:
        return _empty_embed_pairs()
    emb_lookup = emb_ds.map_batches(
        _embed_binary_fn, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = _attach_pair_payload(pairs, emb_lookup, "emb")
    if joined is None:
        return _empty_embed_pairs()

    def verify(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids1 = np.asarray(batch["id1"].to_numpy(zero_copy_only=False), dtype=np.int64)
        ids2 = np.asarray(batch["id2"].to_numpy(zero_copy_only=False), dtype=np.int64)
        a = np.frombuffer(b"".join(batch["emb_id1"].to_pylist()), dtype=np.float64).reshape(n, -1)
        b = np.frombuffer(b"".join(batch["emb_id2"].to_pylist()), dtype=np.float64).reshape(n, -1)
        na = np.linalg.norm(a, axis=1)
        nb = np.linalg.norm(b, axis=1)
        na[na == 0] = 1.0
        nb[nb == 0] = 1.0
        cos = np.einsum("ij,ij->i", a, b) / (na * nb)
        keep = cos >= threshold
        return pa.table(
            {
                "id1": pa.array(ids1[keep], pa.int64()),
                "id2": pa.array(ids2[keep], pa.int64()),
                "cosine": pa.array(cos[keep], pa.float64()),
            }
        )

    return joined.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)


def _decode_emb_binary(batch: pa.Table):
    ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
    n = len(ids)
    mat = np.frombuffer(b"".join(batch["emb"].to_pylist()), dtype=np.float64).reshape(n, -1)
    return ids, mat


def _embedding_neardup_brute_blocks(emb_ds, threshold: float):
    """All-pairs cosine scan with NO driver-resident matrix: the
    normalized embeddings materialize once as object-store blocks; each
    map task matmuls its batch against every block (fetched ref-by-ref
    from the store) and emits pairs with batch-id < block-id, so every
    unordered pair is computed exactly once across the job."""
    import ray

    def norm_fn(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["vec_id"], pa.int64())
        vecs = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        nv = np.linalg.norm(vecs, axis=1)
        nv[nv == 0] = 1.0
        vecs = vecs / nv[:, None]
        return pa.table(
            {"doc_id": ids, "emb": pa.array([v.tobytes() for v in vecs], pa.binary())}
        )

    nds = emb_ds.map_batches(
        norm_fn, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    block_refs = [
        ref
        for bundle in nds.iter_internal_ref_bundles()
        for ref, meta in bundle.blocks
        if meta.num_rows is None or meta.num_rows > 0
    ]
    refs_ref = ray.put(block_refs)

    def fn(batch: pa.Table) -> pa.Table:
        ids, mat = _decode_emb_binary(batch)
        out1, out2, outc = [], [], []
        for blk_ref in ray.get(refs_ref):
            blk = ray.get(blk_ref)
            bids, bmat = _decode_emb_binary(blk)
            sims = mat @ bmat.T
            bi, bj = np.nonzero(sims >= threshold)
            keep = ids[bi] < bids[bj]
            out1.append(ids[bi][keep])
            out2.append(bids[bj][keep])
            outc.append(sims[bi, bj][keep])
        id1 = np.concatenate(out1) if out1 else np.zeros(0, dtype=np.int64)
        id2 = np.concatenate(out2) if out2 else np.zeros(0, dtype=np.int64)
        cos = np.concatenate(outc) if outc else np.zeros(0, dtype=np.float64)
        return pa.table(
            {
                "id1": pa.array(id1, pa.int64()),
                "id2": pa.array(id2, pa.int64()),
                "cosine": pa.array(cos, pa.float64()),
            }
        )

    return nds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=1024)


def _empty_embed_pairs():
    import ray.data

    return ray.data.from_arrow(
        pa.schema(
            [("id1", pa.int64()), ("id2", pa.int64()), ("cosine", pa.float64())]
        ).empty_table()
    )


def neardup_survivors(
    docs_ds,
    pairs_ds,
    *,
    key_col: str = "doc_id",
    broadcast_rows: int = 2_000_000,
    num_partitions: Optional[int] = None,
):
    """The end-to-end near-dedup output a training pipeline actually
    keeps: given the verified duplicate-pair stream, drop every cluster
    member except the minimum id (``duplicate_clusters``' canonical
    label) and return the surviving rows of ``docs_ds``.

    The victim set (cluster members other than the label) stays a
    Dataset end to end; below ``broadcast_rows`` victims it collapses
    to one broadcast ``is_in`` filter (no shuffle of the corpus), above
    it the filter runs as a ``left_anti`` hash join whose partition
    count is sized to the cluster (a partition count far above the CPU
    count can starve Ray's join aggregators)."""
    import ray
    import ray.data

    clusters = duplicate_clusters(pairs_ds)

    def victims_fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.schema([(key_col, pa.int64())]).empty_table()
        mask = pc.invert(pc.equal(batch["doc_id"], batch["cluster_id"]))
        return pa.table(
            {key_col: pc.cast(batch.filter(mask)["doc_id"], pa.int64())}
        )

    victims_ds = clusters.map_batches(
        victims_fn, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_victims = victims_ds.count()
    if n_victims == 0:
        return docs_ds
    if n_victims <= broadcast_rows:
        victims = pa.concat_arrays(
            [
                b[key_col].combine_chunks()
                for b in victims_ds.iter_batches(batch_size=None, batch_format="pyarrow")
                if b.num_rows and b.num_columns
            ]
        )
        vref = ray.put(victims)

        def keep(batch: pa.Table) -> pa.Table:
            v = ray.get(vref)
            return batch.filter(
                pc.invert(pc.is_in(pc.cast(batch[key_col], pa.int64()), value_set=v))
            )

        return docs_ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    if num_partitions is None:
        num_partitions = max(4, min(32, int(ray.cluster_resources().get("CPU", 8))))
    return docs_ds.join(victims_ds, "left_anti", num_partitions, on=(key_col,))
