"""Similarity search over an embedding column (list<float>).

- brute_force_topk: the exact baseline — the query matrix is broadcast
  once with ray.put; every map_batches task computes a (batch × queries)
  cosine matmul with numpy and keeps its LOCAL top-k per query; the tiny
  per-batch top-k tables are merged in one final reduction. Shuffle
  volume: O(num_batches · Q · k), never the corpus.
- ivf_topk: the scale path — a one-pass sampled k-means builds C
  centroids (broadcast), vectors are assigned to their nearest centroid
  (one map_batches), and a query only scans the `nprobe` closest
  centroids' partitions. Recall < 1.0 by construction; the brute-force
  path is the oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datavec_ray.steps.base import combine


def _matrix(col) -> np.ndarray:
    arr = combine(col)
    width = len(arr[0]) if len(arr) else 0
    return arr.flatten().to_numpy(zero_copy_only=False).reshape(-1, width) \
        .astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0, 1, n)


class _BatchTopK:
    def __init__(self, query_ref, vec_col: str, id_col: str, k: int):
        self.query_ref, self.vec_col, self.id_col, self.k = query_ref, vec_col, id_col, k
        self.q = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray
        if self.q is None:
            self.q = _normalize(np.asarray(ray.get(self.query_ref)))
        m = _normalize(_matrix(batch[self.vec_col]))
        ids = combine(batch[self.id_col]).to_numpy(zero_copy_only=False)
        sims = m @ self.q.T                      # (batch, Q)
        k = min(self.k, len(ids))
        top = np.argpartition(-sims, k - 1, axis=0)[:k]  # (k, Q)
        qi, rows, scores = [], [], []
        for q in range(sims.shape[1]):
            sel = top[:, q]
            qi.extend([q] * len(sel))
            rows.extend(ids[sel].tolist())
            scores.extend(sims[sel, q].tolist())
        return pa.table({"query_id": pa.array(qi, pa.int64()),
                         "match_id": pa.array(rows, pa.int64()),
                         "cosine": pa.array(scores, pa.float64())})


class _MergeTopK:
    def __init__(self, k: int):
        self.k = k
        self.__name__ = "merge_topk"

    def __call__(self, group: pa.Table) -> pa.Table:
        g = group.sort_by([("cosine", "descending"), ("match_id", "ascending")])
        return g.slice(0, self.k)


def brute_force_topk(ds, queries: np.ndarray, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id"):
    """Exact cosine top-k of each query row against the whole dataset.
    Ties broken by ascending match_id (deterministic)."""
    import ray
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    per_batch = ds.map_batches(_BatchTopK(qref, vec_col, id_col, k),
                               batch_format="pyarrow")
    return per_batch.groupby("query_id").map_groups(_MergeTopK(k),
                                                    batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF (inverted-file) variant
# ---------------------------------------------------------------------------

def _kmeans(sample: np.ndarray, c: int, iters: int = 8, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(c, len(sample)), replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(len(cent)):
            pts = sample[assign == j]
            if len(pts):
                cent[j] = pts.mean(axis=0)
    return cent


def ivf_topk(ds, queries: np.ndarray, k: int = 10, num_centroids: int = 16,
             nprobe: int = 4, sample_frac: float = 0.1,
             vec_col: str = "embedding", id_col: str = "vec_id", seed: int = 11):
    """Approximate top-k: sampled k-means → centroid assignment
    (map_batches) → probe only the nprobe closest centroid partitions."""
    import ray

    sample_tbl = ds.random_sample(sample_frac, seed=seed) \
        .materialize()
    from datavec_ray.util import dataset_to_table
    sample = _matrix(dataset_to_table(sample_tbl)[vec_col])
    cents = _kmeans(sample, num_centroids)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    # centroid probe set per query (cosine against normalized centroids)
    ncents = _normalize(cents)
    probe = np.argsort(-(q @ ncents.T), axis=1)[:, :nprobe]   # (Q, nprobe)
    probe_sets = [set(row.tolist()) for row in probe]
    pref = ray.put((cents, probe_sets))
    qref = ray.put(q)

    class _ProbeTopK:
        def __init__(self):
            self.cents, self.probe_sets = ray.get(pref)
            self.q = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _matrix(batch[vec_col])
            ids = combine(batch[id_col]).to_numpy(zero_copy_only=False)
            d = ((m[:, None, :] - self.cents[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            mn = _normalize(m)
            sims = mn @ self.q.T
            qi, rows, scores = [], [], []
            for qx, pset in enumerate(self.probe_sets):
                mask = np.isin(assign, list(pset))
                if not mask.any():
                    continue
                s = sims[mask, qx]
                sub_ids = ids[mask]
                kk = min(k, len(sub_ids))
                sel = np.argpartition(-s, kk - 1)[:kk]
                qi.extend([qx] * kk)
                rows.extend(sub_ids[sel].tolist())
                scores.extend(s[sel].tolist())
            return pa.table({"query_id": pa.array(qi, pa.int64()),
                             "match_id": pa.array(rows, pa.int64()),
                             "cosine": pa.array(scores, pa.float64())})

    per_batch = ds.map_batches(_ProbeTopK, batch_format="pyarrow",
                               concurrency=(1, 8))
    return per_batch.groupby("query_id").map_groups(_MergeTopK(k),
                                                    batch_format="pyarrow")
