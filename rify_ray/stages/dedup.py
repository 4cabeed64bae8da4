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


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """crc32 of each k-char shingle (C-level, deterministic)."""
    if len(text) < k:
        data = [text]
    else:
        data = [text[i : i + k] for i in range(len(text) - k + 1)]
    return np.unique(
        np.fromiter((zlib.crc32(s.encode("utf-8")) for s in data), dtype=np.uint64)
    )


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


def _bucket_pairs_fn(id_col: str = "doc_id"):
    def fn(group: pa.Table) -> pa.Table:
        ids = sorted(group[id_col].to_pylist())
        i1, i2 = [], []
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                i1.append(ids[x])
                i2.append(ids[y])
        return pa.table(
            {"id1": pa.array(i1, pa.int64()), "id2": pa.array(i2, pa.int64())}
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
    """64-bit SimHash over whitespace tokens (crc32-seeded bit votes)."""
    ids = batch["doc_id"].to_pylist()
    out = []
    for t in batch["text"].to_pylist():
        tokens = (t or "").split()
        if not tokens:
            out.append(0)
            continue
        hs = np.fromiter(
            (zlib.crc32(w.encode("utf-8")) for w in tokens), dtype=np.uint64
        )
        # expand crc32 to 64 bits deterministically
        hs = hs * np.uint64(0x9E3779B97F4A7C15)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        sh = 0
        for bit_idx in np.nonzero(votes > 0)[0]:
            sh |= 1 << int(bit_idx)
        out.append(sh)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "simhash": pa.array([x - (1 << 64) if x >= (1 << 63) else x for x in out], pa.int64()),
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
