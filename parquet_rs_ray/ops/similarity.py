"""Similarity search over an embedding column (`list<float>`).

* brute_force_topk — exact cosine top-k: the query matrix is broadcast
  once via `ray.put`, each batch does one numpy matmul against it, and a
  final tiny reduction merges per-batch top-k. No shuffle of vectors.
* lsh_topk — scale path: random-hyperplane LSH buckets (signature =
  sign bits of projections), search only the query's bucket ring.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _stack(col, dtype=np.float32) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # zero-copy reshape when the list column is non-null and rectangular
    flat = col.flatten()
    lens = np.diff(col.offsets.to_numpy(zero_copy_only=False))
    vals = flat.to_numpy(zero_copy_only=False)
    if col.null_count == 0 and len(lens) and (lens == lens[0]).all():
        return vals.reshape(len(col), int(lens[0])).astype(dtype, copy=False)
    return np.vstack([np.asarray(v, dtype=dtype) for v in col.to_pylist()])


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(ds, queries: np.ndarray, *, k: int = 10,
                     vec_col: str = "embedding", key_col: str = "vec_id",
                     dtype=np.float32):
    """Exact cosine top-k for each query row. Returns a pa.Table
    (query_idx, vec_id, score) of k rows per query; per-batch partial
    top-ks reduce distributedly (groupby query_idx), so the driver only
    ever sees k × num_queries rows.

    ``dtype=np.float64`` gives oracle-exact doubles for verification;
    float32 is the scale default (half the bytes through the matmul)."""
    import ray
    q = _normalize(np.asarray(queries, dtype=dtype))
    q_ref = ray.put(q)

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        vecs = _normalize(_stack(batch.column(vec_col), dtype=dtype))
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        scores = vecs @ qm.T  # (n, nq)
        nq = qm.shape[0]
        kk = min(k, len(keys))
        part = np.argpartition(-scores, kk - 1, axis=0)[:kk]  # (kk, nq)
        rows = {"query_idx": [], "vec_id": [], "score": []}
        for qi in range(nq):
            idx = part[:, qi]
            rows["query_idx"].extend([qi] * kk)
            rows["vec_id"].extend(keys[idx].tolist())
            rows["score"].extend(scores[idx, qi].astype(float).tolist())
        return pa.table({"query_idx": pa.array(rows["query_idx"], pa.int32()),
                         "vec_id": pa.array(rows["vec_id"], pa.int64()),
                         "score": pa.array(rows["score"], pa.float64())})

    def final_topk(group: pa.Table) -> pa.Table:
        # distributed reduce: one group = one query; k rows survive, so
        # the driver collects only k × num_queries rows total
        scores = group.column("score").to_numpy(zero_copy_only=False)
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -scores))[:k]
        return pa.table({
            "query_idx": group.column("query_idx").take(pa.array(order)),
            "vec_id": pa.array(ids[order], pa.int64()),
            "score": pa.array(np.round(scores[order], 6), pa.float64()),
        })

    reduced = ds.map_batches(partial_topk, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby("query_idx").map_groups(final_topk, batch_format="pyarrow")
    return pa.concat_tables(reduced.iter_batches(batch_format="pyarrow"))


def _lsh_planes(dim: int, nbits: int, seed: int) -> np.ndarray:
    """The ONE hyperplane derivation both the index actors and the
    query side use — any drift between them silently collapses recall
    (query buckets stop matching index buckets)."""
    return np.random.default_rng(seed) \
        .standard_normal((dim, nbits)).astype(np.float32)


def _fold_buckets(bits: np.ndarray) -> np.ndarray:
    """(n, nbits) sign bits → int64 bucket ids (shared with queries)."""
    bucket = np.zeros(len(bits), dtype=np.int64)
    for j in range(bits.shape[1]):
        bucket |= bits[:, j].astype(np.int64) << j
    return bucket


class LshIndexActor:
    """Stateful bucketing stage: hyperplanes drawn once per actor from a
    fixed seed (identical across actors — deterministic bucketing)."""

    def __init__(self, dim: int, nbits: int = 12, vec_col: str = "embedding",
                 key_col: str = "vec_id", seed: int = 7):
        self.planes = _lsh_planes(dim, nbits, seed)
        self.vec_col, self.key_col = vec_col, key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(_stack(batch.column(self.vec_col)))
        bits = (vecs @ self.planes) > 0  # (n, nbits)
        bucket = _fold_buckets(bits)
        out = batch.select([self.key_col, self.vec_col])
        return out.append_column("bucket", pa.array(bucket))


def lsh_topk(ds, queries: np.ndarray, *, k: int = 10, nbits: int = 12,
             vec_col: str = "embedding", key_col: str = "vec_id",
             concurrency=4):
    """Approximate cosine top-k: search only vectors whose LSH bucket is
    within Hamming distance 1 of the query's bucket."""
    q = _normalize(np.asarray(queries, dtype=np.float32))
    dim = q.shape[1]
    bucketed = ds.map_batches(
        LshIndexActor,
        fn_constructor_kwargs={"dim": dim, "nbits": nbits,
                               "vec_col": vec_col, "key_col": key_col},
        batch_format="pyarrow", concurrency=concurrency)
    qbuckets = _fold_buckets((q @ _lsh_planes(dim, nbits, 7)) > 0)
    rings = set()
    for b in qbuckets.tolist():
        rings.add(b)
        for j in range(nbits):
            rings.add(b ^ (1 << j))
    ring_arr = np.sort(np.fromiter(rings, dtype=np.int64))

    def in_ring(batch: pa.Table) -> pa.Table:
        buckets = batch.column("bucket").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(buckets, ring_arr)))

    cand = bucketed.map_batches(in_ring, batch_format="pyarrow",
                                zero_copy_batch=True)
    return brute_force_topk(cand, q, k=k, vec_col=vec_col, key_col=key_col)


# ------------------------------------------------------------------ IVF

def _kmeans(sample: np.ndarray, nlist: int, iters: int = 8,
            seed: int = 7) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (seeded init,
    fixed iteration count). Returns L2-normalized centroids."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(nlist, len(sample)),
                     replace=False)
    cent = sample[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_topk(ds, queries: np.ndarray, *, k: int = 10, nlist: int = 16,
             nprobe: int = 4, sample_size: int = 4096,
             vec_col: str = "embedding", key_col: str = "vec_id",
             seed: int = 7):
    """IVF approximate cosine top-k: coarse k-means centroids trained on
    a driver-side sample, every vector assigned to its nearest centroid
    inside map_batches, and only vectors in the nprobe closest cells of
    any query are scored exactly.

    The centroid matrix (nlist × dim) is the broadcast small side; the
    corpus never shuffles — each batch self-filters to probed cells, so
    ~nprobe/nlist of the data reaches the exact scorer."""
    q = _normalize(np.asarray(queries, dtype=np.float32))
    sample = _normalize(_stack(pa.concat_tables(
        ds.select_columns([vec_col]).limit(sample_size).iter_batches(
            batch_format="pyarrow")).column(vec_col)))
    cent = _kmeans(sample, nlist, seed=seed)
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]
    probed = np.unique(probe.ravel())

    def in_cells(batch: pa.Table) -> pa.Table:
        vecs = _normalize(_stack(batch.column(vec_col)))
        cells = np.argmax(vecs @ cent.T, axis=1)
        return batch.filter(pa.array(np.isin(cells, probed)))

    cand = ds.map_batches(in_cells, batch_format="pyarrow",
                          zero_copy_batch=True)
    return brute_force_topk(cand, q, k=k, vec_col=vec_col, key_col=key_col)
