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
    powers = np.empty(k_eff, dtype=np.uint64)
    powers[0] = 1
    for j in range(1, k_eff):
        powers[j] = (powers[j - 1] * _SHINGLE_BASE) % _SHINGLE_MOD
    # (n_windows, k) @ (k,) with modular reduction; uint64 products of
    # (byte < 256) * (power < 2^61) overflow — split bytes into the sum
    # directly: values fit since 256 * 2^61 overflows, so reduce powers
    # mod first and accumulate in python-object-free float? Use uint64
    # wraparound-safe scheme: (b * (powers mod 2^53)) fits in uint64.
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
        sigs = []
        for t in batch["text"].to_pylist():
            hs = _shingle_hashes(t or "", k_shingles)
            if hs.size == 0:
                sigs.append([0] * len(a))
                continue
            # (num_perm, n_shingles) universal hash, min over shingles
            vals = (a[:, None] * hs[None, :] + b[:, None]) % _MERSENNE
            sigs.append(vals.min(axis=1).tolist())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sig": pa.array(sigs, pa.list_(pa.uint64())),
            }
        )

    return fn


def minhash_band_fn(*, num_perm: int = 64, bands: int = 16):
    """(doc_id, sig) → (band, bkey, doc_id) rows, one per band."""
    rows_per_band = num_perm // bands

    def fn(batch: pa.Table) -> pa.Table:
        out_band, out_key, out_id = [], [], []
        ids = batch["doc_id"].to_pylist()
        for did, sig in zip(ids, batch["sig"].to_pylist()):
            for bi in range(bands):
                chunk = sig[bi * rows_per_band : (bi + 1) * rows_per_band]
                digest = hashlib.blake2b(
                    np.asarray(chunk, dtype=np.uint64).tobytes(), digest_size=8
                ).hexdigest()
                out_band.append(bi)
                out_key.append(digest)
                out_id.append(did)
        return pa.table(
            {
                "band": pa.array(out_band, pa.int32()),
                "bkey": pa.array(out_key, pa.string()),
                "doc_id": pa.array(out_id, pa.int64()),
            }
        )

    return fn


def _bucket_pairs_fn(id_col: str = "doc_id", max_bucket_size: int = 2000):
    """Per-bucket candidate pairs (id1 < id2), vectorized via triu
    indices.  Buckets above ``max_bucket_size`` are boilerplate clusters
    whose O(n²) pair expansion would dominate the job — they are capped
    to their first ``max_bucket_size`` members by id (standard LSH
    hot-bucket mitigation; the cap is logged via the pair counts)."""

    def fn(group: pa.Table) -> pa.Table:
        ids = np.sort(np.asarray(group[id_col].to_pylist(), dtype=np.int64))
        if ids.size > max_bucket_size:
            ids = ids[:max_bucket_size]
        x, y = np.triu_indices(ids.size, k=1)
        return pa.table(
            {"id1": pa.array(ids[x], pa.int64()), "id2": pa.array(ids[y], pa.int64())}
        )

    return fn


def _distinct_pairs(pairs):
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
):
    """Candidate near-duplicate pairs (id1 < id2): shingle → minhash →
    band → bucket groupby → per-bucket pairs → distinct.  Buckets are the
    shuffle unit; hot buckets (boilerplate docs) are the skew risk — at
    scale cap bucket size and salt (documented)."""
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
    pairs = banded.groupby(["band", "bkey"]).map_groups(
        _bucket_pairs_fn(), batch_format="pyarrow"
    )
    return _distinct_pairs(pairs)


def _empty_verified():
    import ray.data

    return ray.data.from_arrow(
        pa.schema(
            [("id1", pa.int64()), ("id2", pa.int64()), ("jaccard", pa.float64())]
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


def verify_pairs_jaccard(
    pairs_ds, docs_ds, *, k: int = 5, threshold: float = 0.5, num_partitions: int = 8
):
    """Join candidate pairs back to texts and keep pairs with exact
    n-gram Jaccard >= threshold.  Two hash-join shuffles keyed on doc id
    (the texts travel once each)."""

    def prep(name):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({name: pc.cast(batch["doc_id"], pa.int64()), f"text_{name}": batch["text"]})

        return fn

    d1 = docs_ds.map_batches(prep("id1"), batch_format="pyarrow", zero_copy_batch=True).materialize()
    d2 = docs_ds.map_batches(prep("id2"), batch_format="pyarrow", zero_copy_batch=True).materialize()
    half = drop_empty_blocks(
        pairs_ds.join(d1, "inner", num_partitions, on=("id1",)).materialize()
    )
    if half is None:
        return _empty_verified()
    joined = drop_empty_blocks(
        half.join(d2, "inner", num_partitions, on=("id2",)).materialize()
    )
    if joined is None:
        return _empty_verified()

    def verify(batch: pa.Table) -> pa.Table:
        keep1, keep2, jac = [], [], []
        for i1, i2, t1, t2 in zip(
            batch["id1"].to_pylist(),
            batch["id2"].to_pylist(),
            batch["text_id1"].to_pylist(),
            batch["text_id2"].to_pylist(),
        ):
            j = ngram_jaccard(t1, t2, k)
            if j >= threshold:
                keep1.append(i1)
                keep2.append(i2)
                jac.append(j)
        return pa.table(
            {
                "id1": pa.array(keep1, pa.int64()),
                "id2": pa.array(keep2, pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    return joined.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)


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


def simhash_candidates(docs_ds, *, max_hamming: int = 3):
    """Near-dup candidates via 4×16-bit chunk bucketing (pigeonhole: any
    pair within Hamming distance 3 agrees on ≥1 chunk), verified by
    popcount."""
    sigs = docs_ds.map_batches(simhash_fn, batch_format="pyarrow", zero_copy_batch=True)

    def chunk_fn(batch: pa.Table) -> pa.Table:
        cband, ckey, cid = [], [], []
        for did, sh in zip(batch["doc_id"].to_pylist(), batch["simhash"].to_pylist()):
            u = sh + (1 << 64) if sh < 0 else sh
            for ci in range(4):
                cband.append(ci)
                ckey.append(str((u >> (16 * ci)) & 0xFFFF))
                cid.append(did)
        return pa.table(
            {
                "band": pa.array(cband, pa.int32()),
                "bkey": pa.array(ckey, pa.string()),
                "doc_id": pa.array(cid, pa.int64()),
            }
        )

    banded = sigs.map_batches(chunk_fn, batch_format="pyarrow", zero_copy_batch=True)
    pairs = banded.groupby(["band", "bkey"]).map_groups(
        _bucket_pairs_fn(), batch_format="pyarrow"
    )
    pairs = _distinct_pairs(pairs)
    if pairs is None:
        return None
    sig_small = sigs.materialize()

    def rename(name):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({name: pc.cast(batch["doc_id"], pa.int64()), f"sh_{name}": batch["simhash"]})

        return fn

    s1 = sig_small.map_batches(rename("id1"), batch_format="pyarrow").materialize()
    s2 = sig_small.map_batches(rename("id2"), batch_format="pyarrow").materialize()
    half = drop_empty_blocks(pairs.join(s1, "inner", 8, on=("id1",)).materialize())
    if half is None:
        return None
    joined = drop_empty_blocks(half.join(s2, "inner", 8, on=("id2",)).materialize())
    if joined is None:
        return None

    def verify(batch: pa.Table) -> pa.Table:
        k1, k2, hd = [], [], []
        for i1, i2, a_, b_ in zip(
            batch["id1"].to_pylist(),
            batch["id2"].to_pylist(),
            batch["sh_id1"].to_pylist(),
            batch["sh_id2"].to_pylist(),
        ):
            d = bin((a_ ^ b_) & ((1 << 64) - 1)).count("1")
            if d <= max_hamming:
                k1.append(i1)
                k2.append(i2)
                hd.append(d)
        return pa.table(
            {
                "id1": pa.array(k1, pa.int64()),
                "id2": pa.array(k2, pa.int64()),
                "hamming": pa.array(hd, pa.int64()),
            }
        )

    return joined.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(emb_ds, *, threshold: float = 0.95):
    """Pairs (id1 < id2) with cosine >= threshold.  Brute per-batch
    matmul against the full matrix broadcast once via ``ray.put`` — the
    baseline; at 100 TB bucket by hyperplane LSH first
    (stages/similarity.py) so each batch only meets its bucket."""
    import ray

    tbl = pa.concat_tables(
        emb_ds.select_columns(["vec_id", "embedding"]).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    ids_all = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat_n = mat / norms[:, None]
    ref = ray.put((ids_all, mat_n))

    def fn(batch: pa.Table) -> pa.Table:
        ids_all_, mat_n_ = ray.get(ref)
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        vecs = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        nv = np.linalg.norm(vecs, axis=1)
        nv[nv == 0] = 1.0
        sims = (vecs / nv[:, None]) @ mat_n_.T
        bi, bj = np.nonzero(sims >= threshold)
        id1 = ids[bi]
        id2 = ids_all_[bj]
        keep = id1 < id2
        return pa.table(
            {
                "id1": pa.array(id1[keep], pa.int64()),
                "id2": pa.array(id2[keep], pa.int64()),
                "cosine": pa.array(sims[bi, bj][keep], pa.float64()),
            }
        )

    return emb_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=256)
