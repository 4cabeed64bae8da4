"""Similarity search over an embedding column (``list<float>``):

- **brute-force cosine top-k** (baseline): per-batch numpy matmul
  against a query matrix broadcast once via ``ray.put``; per-batch local
  top-k, global merge via ``groupby(query).map_groups``.
- **LSH-bucketed variant** (scale path): random-hyperplane sign buckets;
  a query is only compared against its bucket (and optionally multiple
  probes) — turns the all-pairs scan into bucket-local work.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    return mat / n[:, None]


def knn_brute(
    emb_ds,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    *,
    k: int = 5,
    exclude_self: bool = True,
    batch_size: int = 1024,
):
    """Top-k cosine neighbors for each query vector.

    Returns a Dataset (query_id, rank, neighbor_id, cosine) with rank
    1..k ordered by (cosine desc, neighbor_id asc) — the deterministic
    tie-break the SQL oracle mirrors.
    """
    import ray

    qn = _normalize(np.asarray(query_mat, dtype=np.float64))
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), qn))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, qmat = ray.get(qref)
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        vecs = _normalize(np.asarray(batch["embedding"].to_pylist(), dtype=np.float64))
        sims = qmat @ vecs.T  # (nq, nb)
        out_q, out_n, out_s = [], [], []
        kk = min(k + (1 if exclude_self else 0), sims.shape[1])
        for qi in range(sims.shape[0]):
            row = sims[qi]
            # batch-local candidates: top (k+1) by (sim desc, id asc)
            order = np.lexsort((ids, -row))[:kk]
            for j in order:
                if exclude_self and ids[j] == qids[qi]:
                    continue
                out_q.append(qids[qi])
                out_n.append(ids[j])
                out_s.append(row[j])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    cands = emb_ds.map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )

    def merge(group: pa.Table) -> pa.Table:
        qid = group["query_id"][0].as_py()
        nid = np.asarray(group["neighbor_id"].to_pylist(), dtype=np.int64)
        sim = np.asarray(group["cosine"].to_pylist(), dtype=np.float64)
        order = np.lexsort((nid, -sim))[:k]
        return pa.table(
            {
                "query_id": pa.array([qid] * len(order), pa.int64()),
                "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
                "neighbor_id": pa.array(nid[order], pa.int64()),
                "cosine": pa.array(sim[order], pa.float64()),
            }
        )

    return cands.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def hyperplane_bucket_fn(dim: int, nbits: int = 8, seed: int = 7):
    """Random-hyperplane LSH: bucket = sign pattern of ``nbits``
    projections (deterministic seeded planes)."""
    rs = np.random.RandomState(seed)
    planes = rs.normal(size=(nbits, dim))

    def fn(batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        signs = (vecs @ planes.T) >= 0
        buckets = (signs * (1 << np.arange(nbits))[None, :]).sum(axis=1).astype(np.int64)
        return batch.append_column("bucket", pa.array(buckets, pa.int64()))

    return fn


def knn_lsh(
    emb_ds,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    *,
    k: int = 5,
    nbits: int = 8,
    exclude_self: bool = True,
):
    """Approximate top-k: only vectors in the query's hyperplane bucket
    are scanned.  Same output schema as :func:`knn_brute`; recall < 1 by
    construction (measured in tests)."""
    dim = query_mat.shape[1]
    bf = hyperplane_bucket_fn(dim, nbits)
    bucketed = emb_ds.map_batches(bf, batch_format="pyarrow", zero_copy_batch=True)

    qtbl = pa.table(
        {
            "vec_id": pa.array(np.asarray(query_ids, dtype=np.int64)),
            "embedding": pa.array([list(map(float, r)) for r in query_mat], pa.list_(pa.float64())),
        }
    )
    qbuckets = bf(qtbl)["bucket"].to_pylist()

    out_parts = []
    qn = _normalize(np.asarray(query_mat, dtype=np.float64))
    by_bucket = {}
    for qi, bkt in enumerate(qbuckets):
        by_bucket.setdefault(bkt, []).append(qi)
    for bkt, qidx in by_bucket.items():
        sub = bucketed.filter(expr=f"bucket == {bkt}")
        part = knn_brute(
            sub,
            np.asarray(query_ids)[qidx],
            np.asarray(query_mat)[qidx],
            k=k,
            exclude_self=exclude_self,
        )
        out_parts.append(part)
    first = out_parts[0]
    return first.union(*out_parts[1:]) if len(out_parts) > 1 else first
