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
    return cands.groupby("query_id").map_groups(_merge_topk(k), batch_format="pyarrow")


def train_ivf_centroids(
    emb_ds, nlist: int, *, sample_rows: int = 65_536, iters: int = 10, seed: int = 13
) -> np.ndarray:
    """Coarse-quantizer training: Lloyd k-means on a bounded sample
    (deterministic — seeded init over the first ``sample_rows`` vectors).
    The sample is the ONLY thing fetched to the driver; at 100 TB train
    on a sample, never the full set (standard IVF practice)."""
    sample = pa.concat_tables(
        emb_ds.limit(sample_rows).select_columns(["embedding"]).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    mat = _normalize(np.asarray(sample["embedding"].to_pylist(), dtype=np.float64))
    rs = np.random.RandomState(seed)
    centroids = mat[rs.choice(len(mat), size=min(nlist, len(mat)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def knn_ivf(
    emb_ds,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    *,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    exclude_self: bool = True,
    batch_size: int = 1024,
):
    """IVF (inverted-file) approximate top-k — the coarse-quantization
    scale path next to :func:`knn_lsh`: vectors partition by nearest
    k-means centroid; each query scans only its ``nprobe`` nearest
    lists.  Single pass over the input (queries + centroids broadcast
    once), one groupby merge; same output schema / tie-break as
    :func:`knn_brute`."""
    import ray

    centroids = train_ivf_centroids(emb_ds, nlist)
    qids = np.asarray(query_ids, dtype=np.int64)
    qn = _normalize(np.asarray(query_mat, dtype=np.float64))
    # per query: the nprobe nearest lists
    qsims = qn @ centroids.T
    probe_lists = np.argsort(-qsims, axis=1)[:, : min(nprobe, len(centroids))]
    probe_map: dict = {}
    for qi, lists in enumerate(probe_lists):
        for li in lists:
            probe_map.setdefault(int(li), []).append(qi)
    probe_map = {b: np.asarray(v, dtype=np.int64) for b, v in probe_map.items()}
    ref = ray.put((qids, qn, centroids, probe_map))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids_, qn_, cents, probes = ray.get(ref)
        ids = np.asarray(batch["vec_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        vecs = _normalize(np.asarray(batch["embedding"].to_pylist(), dtype=np.float64))
        assign = np.argmax(vecs @ cents.T, axis=1)
        out_q, out_n, out_s = [], [], []
        for li in np.unique(assign):
            qidx = probes.get(int(li))
            if qidx is None:
                continue
            rows = np.nonzero(assign == li)[0]
            sims = qn_[qidx] @ vecs[rows].T
            kk = min(k + 1, rows.size)
            for r, qi in enumerate(qidx):
                row = sims[r]
                order = np.lexsort((ids[rows], -row))[:kk]
                for j in order:
                    if exclude_self and ids[rows[j]] == qids_[qi]:
                        continue
                    out_q.append(qids_[qi])
                    out_n.append(ids[rows[j]])
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
    return cands.groupby("query_id").map_groups(_merge_topk(k), batch_format="pyarrow")


def _merge_topk(k: int):
    """Per-query global merge of batch-local candidates: (cosine desc,
    neighbor_id asc), rank 1..k — deterministic tie-break shared by the
    brute and LSH paths (and mirrored by the SQL oracle)."""

    def merge(group: pa.Table) -> pa.Table:
        qid = group["query_id"][0].as_py()
        nid = np.asarray(group["neighbor_id"].to_pylist(), dtype=np.int64)
        sim = np.asarray(group["cosine"].to_pylist(), dtype=np.float64)
        # a neighbor can arrive via several probes — dedup before ranking
        _, uniq_idx = np.unique(nid, return_index=True)
        nid, sim = nid[uniq_idx], sim[uniq_idx]
        order = np.lexsort((nid, -sim))[:k]
        return pa.table(
            {
                "query_id": pa.array([qid] * len(order), pa.int64()),
                "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
                "neighbor_id": pa.array(nid[order], pa.int64()),
                "cosine": pa.array(sim[order], pa.float64()),
            }
        )

    return merge


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
    multiprobe: int = 1,
    batch_size: int = 1024,
):
    """Approximate top-k in ONE pass over the input: every vector batch
    computes its own buckets and is compared only against the queries
    probing those buckets (queries broadcast once via ``ray.put``), then
    per-query candidates merge through one groupby.  No per-bucket
    re-scan of the input, regardless of query count.

    ``multiprobe`` widens each query to buckets within that Hamming
    distance of its own sign pattern (0 hops = exact bucket only; 1 =
    also flip each bit), trading compute for recall — measured vs
    :func:`knn_brute` in tests/test_stages.py."""
    import ray

    dim = query_mat.shape[1]
    rs = np.random.RandomState(7)
    planes = rs.normal(size=(nbits, dim))
    weights = (1 << np.arange(nbits)).astype(np.int64)

    qids = np.asarray(query_ids, dtype=np.int64)
    qn = _normalize(np.asarray(query_mat, dtype=np.float64))
    qbuckets = (((qn @ planes.T) >= 0) * weights[None, :]).sum(axis=1)
    # bucket -> indices of queries probing it (multi-probe: flip bits)
    probe_map: dict = {}
    for qi, b in enumerate(qbuckets):
        buckets = {int(b)}
        frontier = {int(b)}
        for _hop in range(multiprobe):
            frontier = {fb ^ (1 << bit) for fb in frontier for bit in range(nbits)}
            buckets |= frontier
        for bb in buckets:
            probe_map.setdefault(bb, []).append(qi)
    probe_map = {b: np.asarray(v, dtype=np.int64) for b, v in probe_map.items()}
    ref = ray.put((qids, qn, probe_map))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids_, qn_, probes = ray.get(ref)
        ids = np.asarray(batch["vec_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        vecs = _normalize(np.asarray(batch["embedding"].to_pylist(), dtype=np.float64))
        vbuckets = (((vecs @ planes.T) >= 0) * weights[None, :]).sum(axis=1)
        out_q, out_n, out_s = [], [], []
        for b in np.unique(vbuckets):
            qidx = probes.get(int(b))
            if qidx is None:
                continue
            rows = np.nonzero(vbuckets == b)[0]
            sims = qn_[qidx] @ vecs[rows].T  # (nq_probing, n_rows)
            kk = min(k + 1, rows.size)
            for r, qi in enumerate(qidx):
                row = sims[r]
                order = np.lexsort((ids[rows], -row))[:kk]
                for j in order:
                    if exclude_self and ids[rows[j]] == qids_[qi]:
                        continue
                    out_q.append(qids_[qi])
                    out_n.append(ids[rows[j]])
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
    return cands.groupby("query_id").map_groups(_merge_topk(k), batch_format="pyarrow")


def embed_norm_topk(emb_ds, *, k: int = 10, batch_size: int = 4096):
    """Global top-``k`` vectors by L2 norm (rank + vec_id only — no
    floats in the output, so the DuckDB oracle hash is stable), ties
    broken by vec_id ascending.

    Per-block partial top-k (one vectorized float64 sum-of-squares +
    lexsort, at most ``k`` rows leave each block) → driver merge of the
    ≤ k·blocks survivors.  The squared norm orders identically to the
    norm, so no sqrt is taken.  SQL twin: ``row_number() OVER (ORDER BY
    list_sum(list_transform(embedding, x -> x*x)) DESC, vec_id)``."""
    import ray.data

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        if ids.size == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "ss": pa.array([], pa.float64())}
            )
        vecs = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        ss = np.einsum("ij,ij->i", vecs, vecs)
        order = np.lexsort((ids, -ss))[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[order], pa.int64()),
                "ss": pa.array(ss[order], pa.float64()),
            }
        )

    parts = emb_ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )
    all_ids, all_ss = [], []
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        if b.num_rows == 0 or b.num_columns == 0:
            continue
        all_ids.append(b["vec_id"].to_numpy(zero_copy_only=False))
        all_ss.append(b["ss"].to_numpy(zero_copy_only=False))
    schema = pa.schema([("rank", pa.int64()), ("vec_id", pa.int64())])
    if not all_ids:
        return ray.data.from_arrow(schema.empty_table())
    ids = np.concatenate(all_ids)
    ss = np.concatenate(all_ss)
    order = np.lexsort((ids, -ss))[:k]
    return ray.data.from_arrow(
        pa.table(
            {
                "rank": pa.array(np.arange(1, order.size + 1), pa.int64()),
                "vec_id": pa.array(ids[order], pa.int64()),
            }
        )
    )
