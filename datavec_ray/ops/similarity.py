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
# exact cosine similarity self-join (all pairs >= threshold)
# ---------------------------------------------------------------------------

class _CosinePairs:
    """Per-batch exact pair scan: one (batch x corpus) matmul against the
    broadcast normalized corpus, masked to id_a < id_b (each unordered
    pair emitted exactly once, by the task holding its lower id)."""

    def __init__(self, corpus_ref, threshold: float, vec_col: str, id_col: str):
        import ray
        ids, mat = ray.get(corpus_ref)
        self.cids, self.cmat = ids, mat           # (N,), (N, dim) normalized
        self.threshold, self.vec_col, self.id_col = threshold, vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch[self.vec_col]))
        ids = combine(batch[self.id_col]).to_numpy(zero_copy_only=False)
        sims = m @ self.cmat.T                    # (batch, N)
        mask = (sims >= self.threshold) & (ids[:, None] < self.cids[None, :])
        r, c = np.nonzero(mask)
        return pa.table({"id_a": pa.array(ids[r], pa.int64()),
                         "id_b": pa.array(self.cids[c], pa.int64()),
                         "cosine": pa.array(np.round(sims[r, c], 6),
                                            pa.float64())})


def cosine_pairs_exact(ds, threshold: float = 0.35,
                       vec_col: str = "embedding", id_col: str = "vec_id",
                       max_corpus_rows: int = 2_000_000):
    """EXACT cosine similarity self-join: every unordered pair of rows
    with cosine >= threshold. This is the op the LSH-bucketed
    ``embedding_cosine_pairs`` near-dup approximates — and its oracle.

    Scale contract: O(N^2) similarity work split across batches; the
    normalized corpus (ids + matrix, ~N*dim*8 bytes) is broadcast ONCE
    with ray.put and read zero-copy by every task — fine to ~10^6x1k
    dims per worker heap. Beyond that use ``embedding_cosine_pairs``
    (bucketed, approximate) or a physical ``ivf_build`` partitioning;
    exact all-pairs at 100 TB is inherently quadratic and not a
    streaming op."""
    import ray

    from datavec_ray.util import dataset_to_table

    corpus = dataset_to_table(
        ds.select_columns([id_col, vec_col]).materialize())
    if corpus.num_rows > max_corpus_rows:
        raise ValueError(
            f"cosine_pairs_exact broadcasts the whole normalized corpus "
            f"to every task; {corpus.num_rows} rows exceeds "
            f"max_corpus_rows={max_corpus_rows}. Use the bucketed "
            f"embedding_cosine_pairs (LSH) or ivf_topk for large "
            f"corpora — exact all-pairs is inherently quadratic.")
    ids = combine(corpus[id_col]).to_numpy(zero_copy_only=False).astype(np.int64)
    mat = _normalize(_matrix(corpus[vec_col]))
    ref = ray.put((ids, mat))
    return ds.map_batches(
        _CosinePairs, batch_format="pyarrow",
        fn_constructor_args=(ref, threshold, vec_col, id_col),
        concurrency=(1, 8), max_restarts=0)


# ---------------------------------------------------------------------------
# IVF (inverted-file) variant
# ---------------------------------------------------------------------------

def _kmeans(sample: np.ndarray, c: int, iters: int = 8, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    # k-means++ seeding (Arthur & Vassilvitskii 2007): each next centroid
    # drawn proportionally to squared distance from the chosen set —
    # deterministic given the (canonicalized) sample order and far less
    # likely than uniform choice to drop two centroids in one cluster
    n, c = len(sample), min(c, len(sample))
    cent = np.empty((c, sample.shape[1]), np.float64)
    cent[0] = sample[rng.integers(n)]
    d2 = ((sample - cent[0]) ** 2).sum(axis=1)
    for j in range(1, c):
        tot = d2.sum()
        cent[j] = sample[rng.choice(n, p=d2 / tot) if tot > 0
                         else rng.integers(n)]
        d2 = np.minimum(d2, ((sample - cent[j]) ** 2).sum(axis=1))
    for _ in range(iters):
        assign = _assign_centroids(sample, cent)  # matmul, no (N,C,dim) blowup
        for j in range(len(cent)):
            pts = sample[assign == j]
            if len(pts):
                cent[j] = pts.mean(axis=0)
    return cent


def _assign_centroids(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest-centroid assignment via the |x-c|² = |x|² - 2x·c + |c|²
    expansion (one matmul, no (N, C, dim) broadcast blowup)."""
    cross = m @ cents.T                             # (N, C)
    c2 = (cents ** 2).sum(axis=1)[None, :]
    return (c2 - 2 * cross).argmin(axis=1)


def _fit_centroids(ds, num_centroids: int, sample_frac: float,
                   vec_col: str, seed: int) -> np.ndarray:
    from datavec_ray.util import dataset_to_table
    sample_tbl = ds.select_columns([vec_col]) \
        .random_sample(sample_frac, seed=seed).materialize()
    sample = _matrix(dataset_to_table(sample_tbl)[vec_col])
    # canonicalize row order: the collected sample's block order is not
    # stable across executions (observed permutations under executor
    # load), and the seeded init picks rows BY POSITION — without this
    # the same seed can yield different centroids run to run
    sample = sample[np.lexsort(sample.T[::-1])]
    return _kmeans(sample, num_centroids)


class _ProbeTopK:
    """Per-batch IVF scoring: rows grouped by their assigned centroid,
    ONE small matmul per (centroid, probing-queries) pair — only the
    probed (row, query) dot products are ever computed, never the full
    batch × query matrix. Work per batch = Σ_c n_c · |queries probing c|
    ≤ nprobe/C of brute force on average."""

    def __init__(self, cents_ref, q_ref, probe_ref, vec_col: str,
                 id_col: str, k: int):
        import ray
        self.cents = ray.get(cents_ref)
        self.q = ray.get(q_ref)                     # normalized (Q, dim)
        probe = ray.get(probe_ref)                  # (Q, nprobe)
        C = len(self.cents)
        self.queries_of = [np.flatnonzero((probe == c).any(axis=1))
                           for c in range(C)]      # centroid → query ids
        self.vec_col, self.id_col, self.k = vec_col, id_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch[self.vec_col])
        ids = combine(batch[self.id_col]).to_numpy(zero_copy_only=False)
        assign = _assign_centroids(m, self.cents)
        mn = _normalize(m)
        qi, rows, scores = [], [], []
        for c in np.unique(assign):
            qs = self.queries_of[int(c)]
            if qs.size == 0:
                continue
            rmask = assign == c
            sub = mn[rmask] @ self.q[qs].T          # (n_c, |qs|) ONLY
            sub_ids = ids[rmask]
            kk = min(self.k, len(sub_ids))
            top = np.argpartition(-sub, kk - 1, axis=0)[:kk] \
                if kk < len(sub_ids) else np.arange(len(sub_ids))[:, None] \
                .repeat(len(qs), axis=1)
            for j, qx in enumerate(qs):
                sel = top[:, j]
                qi.extend([int(qx)] * len(sel))
                rows.extend(sub_ids[sel].tolist())
                scores.extend(sub[sel, j].tolist())
        return pa.table({"query_id": pa.array(qi, pa.int64()),
                         "match_id": pa.array(rows, pa.int64()),
                         "cosine": pa.array(scores, pa.float64())})


def ivf_topk(ds, queries: np.ndarray, k: int = 10, num_centroids: int = 16,
             nprobe: int = 4, sample_frac: float = 0.1,
             vec_col: str = "embedding", id_col: str = "vec_id", seed: int = 11):
    """Approximate top-k: sampled k-means → per-batch centroid assignment
    → score ONLY rows whose centroid is probed by a query (the pruning
    that makes IVF cheaper than brute force). One-shot over an in-memory
    Dataset; for a reusable corpus build a physical index with
    ``ivf_build`` + ``ivf_query`` so non-probed partitions are never
    read at all."""
    import ray

    cents = _fit_centroids(ds, num_centroids, sample_frac, vec_col, seed)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    ncents = _normalize(cents)
    probe = np.argsort(-(q @ ncents.T), axis=1)[:, :nprobe]   # (Q, nprobe)
    refs = (ray.put(cents), ray.put(q), ray.put(probe))
    per_batch = ds.map_batches(
        _ProbeTopK, batch_format="pyarrow",
        fn_constructor_args=(*refs, vec_col, id_col, k),
        concurrency=(1, 8), max_restarts=0)
    return per_batch.groupby("query_id").map_groups(_MergeTopK(k),
                                                    batch_format="pyarrow")


# ---------------------------------------------------------------------------
# physical IVF index: partition the corpus by centroid so non-probed
# partitions are never READ (the 100 TB scale path)
# ---------------------------------------------------------------------------

def ivf_build(ds, index_dir: str, num_centroids: int = 16,
              sample_frac: float = 0.1, vec_col: str = "embedding",
              id_col: str = "vec_id", seed: int = 11) -> np.ndarray:
    """Build a centroid-partitioned parquet index: one directory per
    centroid (``cent=<c>/``) written by a streaming pass, plus
    ``centroids.npy``. Queries then read ONLY the probed directories."""
    import os

    cents = _fit_centroids(ds, num_centroids, sample_frac, vec_col, seed)

    def _assign(batch: pa.Table) -> pa.Table:
        m = _matrix(batch[vec_col])
        assign = _assign_centroids(m, cents)
        return batch.append_column(pa.field("cent", pa.int64()),
                                   pa.array(assign.astype(np.int64)))

    os.makedirs(index_dir, exist_ok=True)
    (ds.map_batches(_assign, batch_format="pyarrow")
       .write_parquet(index_dir, partition_cols=["cent"]))
    np.save(os.path.join(index_dir, "centroids.npy"), cents)
    return cents


def ivf_query(index_dir: str, queries: np.ndarray, k: int = 10,
              nprobe: int = 4, vec_col: str = "embedding",
              id_col: str = "vec_id"):
    """Query a physical IVF index: reads only the ``nprobe`` closest
    centroid partitions per query (union over queries), brute-force
    cosine within them."""
    import os

    import ray
    import ray.data as rd

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    q = _normalize(np.asarray(queries, dtype=np.float64))
    ncents = _normalize(cents)
    probe = np.argsort(-(q @ ncents.T), axis=1)[:, :nprobe]
    needed = sorted({int(c) for c in probe.reshape(-1)})
    paths = []
    for c in needed:  # expand each probed partition dir to its files
        d = os.path.join(index_dir, f"cent={c}")
        if os.path.isdir(d):
            paths.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
    if not paths:
        return rd.from_arrow(pa.table({"query_id": pa.array([], pa.int64()),
                                       "match_id": pa.array([], pa.int64()),
                                       "cosine": pa.array([], pa.float64())}))
    ds = rd.read_parquet(paths, columns=[id_col, vec_col])
    refs = (ray.put(cents), ray.put(q), ray.put(probe))
    per_batch = ds.map_batches(
        _ProbeTopK, batch_format="pyarrow",
        fn_constructor_args=(*refs, vec_col, id_col, k),
        concurrency=(1, 8), max_restarts=0)
    return per_batch.groupby("query_id").map_groups(_MergeTopK(k),
                                                    batch_format="pyarrow")


# ---------------------------------------------------------------------------
# distributed k-means (Lloyd's) and SemDeDup-style semantic dedup
# ---------------------------------------------------------------------------

class _KMeansPartial:
    """map_batches body for one Lloyd iteration: assign the batch to the
    broadcast centroids and emit the per-cluster (sum-vector, count)
    partial — k x d floats per batch, the classic combiner. The corpus
    never crosses the wire; only these tiny partials do."""

    def __init__(self, cents_ref, vec_col: str):
        import ray
        self.cents = np.asarray(ray.get(cents_ref))
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch[self.vec_col])
        k, d = self.cents.shape
        if len(m) == 0:
            sums = np.zeros((k, d)); counts = np.zeros(k, dtype=np.int64)
        else:
            a = _assign_centroids(m, self.cents)
            # d bincounts (vectorized over rows) instead of slow np.add.at
            sums = np.stack([np.bincount(a, weights=m[:, j], minlength=k)
                             for j in range(d)], axis=1)
            counts = np.bincount(a, minlength=k).astype(np.int64)
        return pa.table({
            "cluster": pa.array(np.arange(k, dtype=np.int64)),
            "vsum": pa.array(list(sums), pa.list_(pa.float64())),
            "n": pa.array(counts)})


def kmeans_fit(ds, vec_col: str = "embedding", k: int = 8, iters: int = 5,
               seed: int = 11, init_sample_frac: float = 0.25) -> np.ndarray:
    """Distributed Lloyd's k-means over an embedding column.

    Init: deterministic seeded k-means on a driver-side sample (the IVF
    path's ``_fit_centroids``). Refinement: ``iters`` full passes, each
    ONE streaming ``map_batches`` emitting per-batch (cluster, sum,
    count) partials reduced by a small Arrow groupby — shuffle volume
    per pass is O(num_batches * k * d), independent of corpus size.
    Empty clusters keep their previous centroid (standard Lloyd fix).
    """
    import ray

    from datavec_ray.util import dataset_to_table

    cents = _fit_centroids(ds, k, init_sample_frac, vec_col, seed)
    k, d = cents.shape
    for _ in range(iters):
        ref = ray.put(cents)
        parts = dataset_to_table(
            ds.map_batches(_KMeansPartial, batch_format="pyarrow",
                           fn_constructor_args=(ref, vec_col),
                           concurrency=(1, 8), max_restarts=0))
        sums = _matrix(parts["vsum"])
        cl = parts["cluster"].to_numpy(zero_copy_only=False)
        n = parts["n"].to_numpy(zero_copy_only=False)
        tot = np.stack([np.bincount(cl, weights=sums[:, j], minlength=k)
                        for j in range(d)], axis=1)
        cnt = np.bincount(cl, weights=n, minlength=k)
        nz = cnt > 0
        cents = cents.copy()
        cents[nz] = tot[nz] / cnt[nz, None]
    return cents


def kmeans_assign(ds, cents: np.ndarray, vec_col: str = "embedding"):
    """Append a ``cluster`` int64 column: nearest broadcast centroid."""
    import ray

    ref = ray.put(np.asarray(cents))

    class _Assign:
        def __init__(self):
            self.cents = np.asarray(ray.get(ref))
            self.__name__ = "kmeans_assign"

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _matrix(batch[vec_col])
            a = _assign_centroids(m, self.cents) if len(m) else \
                np.zeros(0, dtype=np.int64)
            return batch.append_column(pa.field("cluster", pa.int64()),
                                       pa.array(a.astype(np.int64)))

    # max_restarts=0: the constructor closure reads a ray.put ref —
    # a restart after the ref is lost would fail anyway (ray#53727)
    return ds.map_batches(_Assign, batch_format="pyarrow",
                          concurrency=(1, 8), max_restarts=0)


def semantic_dedup_pairs(ds, vec_col: str = "embedding",
                         id_col: str = "vec_id", k: int = 8,
                         threshold: float = 0.95, iters: int = 3,
                         seed: int = 11, num_partitions: int = 32):
    """SemDeDup (Abbas et al. 2023) candidate pairs: k-means-cluster the
    embeddings, then exact pairwise cosine WITHIN each cluster — the
    quadratic work drops from corpus^2 to sum of cluster_size^2, and
    cross-cluster pairs are pruned by construction (the SemDeDup
    approximation; recall vs the exact join rises with k-means quality).

    Shuffle discipline matches the LSH ops: clusters are co-located by
    ONE hash-partition groupby (one Ray group per PARTITION, segment
    scan per cluster in process). Returns (id_a, id_b, cosine) pairs
    with cosine >= threshold, id_a < id_b, sorted.
    """
    from datavec_ray.ops.dedup import _PerBucket, _tag_bucket_partition

    cents = kmeans_fit(ds, vec_col, k=k, iters=iters, seed=seed)
    assigned = kmeans_assign(ds.select_columns([id_col, vec_col]), cents,
                             vec_col)
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})

    class _ClusterPairs:
        __name__ = "semantic_pairs"

        def __call__(self, grp: pa.Table) -> pa.Table:
            ids = combine(grp[id_col]).cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            mn = _normalize(_matrix(grp[vec_col]))
            sims = mn @ mn.T
            ai, bi = np.triu_indices(len(ids), k=1)
            keep = sims[ai, bi] >= threshold
            ai, bi = ai[keep], bi[keep]
            a, b = ids[ai], ids[bi]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            return pa.table({"id_a": pa.array(lo), "id_b": pa.array(hi),
                             "cosine": pa.array(sims[ai, bi])})

    return (_tag_bucket_partition(assigned, ["cluster"], num_partitions)
            .groupby("__bpart")
            .map_groups(_PerBucket(_ClusterPairs(), ["cluster"], empty),
                        batch_format="pyarrow")
            .sort(["id_a", "id_b"]))


def semantic_dedup(ds, vec_col: str = "embedding", id_col: str = "vec_id",
                   k: int = 8, threshold: float = 0.95, iters: int = 3,
                   seed: int = 11):
    """Full SemDeDup: semantic pairs → connected components → keep the
    min-id representative of every duplicate cluster. Returns the
    deduplicated dataset (all columns of ``ds``)."""
    from datavec_ray.ops.graph import dedup_by_components

    pairs = semantic_dedup_pairs(ds, vec_col, id_col, k=k,
                                 threshold=threshold, iters=iters, seed=seed)
    return dedup_by_components(ds, pairs, id_col)


# ---------------------------------------------------------------------------
# product quantization (Jégou, Douze, Schmid 2011 — public): the ANN
# MEMORY path. IVF prunes which rows are read; PQ shrinks what a row
# costs — m uint8 codes per vector (dim x float32 → m bytes, 32x at
# dim=64/m=8), scored against queries via per-subspace lookup tables
# (ADC) without ever reconstructing the vectors.
# ---------------------------------------------------------------------------

def pq_train(ds, m: int = 8, nbits: int = 8, sample_frac: float = 0.1,
             vec_col: str = "embedding", seed: int = 11,
             normalize: bool = True) -> np.ndarray:
    """Train PQ codebooks on a canonicalized sample: the vector space is
    split into ``m`` equal subspaces, each clustered to ``2**nbits``
    codewords with the engine's deterministic k-means++ — returns
    codebooks of shape (m, 2**nbits, dim//m). ``normalize=True`` trains
    in the unit-sphere space so ADC inner products approximate cosine."""
    from datavec_ray.util import dataset_to_table
    sample_tbl = ds.select_columns([vec_col]) \
        .random_sample(sample_frac, seed=seed).materialize()
    sample = _matrix(dataset_to_table(sample_tbl)[vec_col])
    sample = sample[np.lexsort(sample.T[::-1])]     # stable across runs
    if normalize:
        sample = _normalize(sample)
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub, c = dim // m, 1 << nbits
    return np.stack([_kmeans(np.ascontiguousarray(
        sample[:, j * dsub:(j + 1) * dsub]), c, seed=seed + j)
        for j in range(m)])


class _PQEncode:
    """Actor-pool encode stage: codebooks broadcast once (ray.put →
    __init__), each batch = m small assignment matmuls → a
    fixed-size-list<uint8> code column."""

    def __init__(self, cb_ref, vec_col: str, id_col: str, normalize: bool):
        import ray
        self.cb = ray.get(cb_ref)                   # (m, c, dsub)
        self.vec_col, self.id_col = vec_col, id_col
        self.normalize = normalize

    def __call__(self, batch: pa.Table) -> pa.Table:
        mt = _matrix(batch[self.vec_col])
        if self.normalize:
            mt = _normalize(mt)
        m, _, dsub = self.cb.shape
        codes = np.empty((len(mt), m), np.uint8)
        for j in range(m):
            codes[:, j] = _assign_centroids(
                np.ascontiguousarray(mt[:, j * dsub:(j + 1) * dsub]),
                self.cb[j])
        flat = pa.array(codes.reshape(-1), pa.uint8())
        return pa.table({
            self.id_col: batch[self.id_col],
            "pq_code": pa.FixedSizeListArray.from_arrays(flat, m)})


def pq_encode(ds, codebooks: np.ndarray, vec_col: str = "embedding",
              id_col: str = "vec_id", normalize: bool = True):
    """Vectors → m-byte PQ codes (Dataset of id + pq_code)."""
    import ray
    return ds.map_batches(
        _PQEncode, batch_format="pyarrow",
        fn_constructor_args=(ray.put(codebooks), vec_col, id_col, normalize),
        concurrency=(1, 8), max_restarts=0)


class _PQScore:
    """ADC scoring: per query and subspace, LUT[q, j, c] = q_sub · cb
    entry (built ONCE per actor from the broadcast query matrix); a
    batch of codes scores as Σ_j LUT[q, j, code_j] — pure fancy-indexed
    adds, no vector reconstruction."""

    def __init__(self, cb_ref, q_ref, id_col: str, k: int):
        import ray
        cb = ray.get(cb_ref)                        # (m, c, dsub)
        q = ray.get(q_ref)                          # normalized (Q, dim)
        m, c, dsub = cb.shape
        # (Q, m, c): einsum over the shared dsub axis
        self.lut = np.einsum("qjd,jcd->qjc",
                             q.reshape(len(q), m, dsub), cb)
        self.id_col, self.k, self.m = id_col, k, m

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = combine(batch[self.id_col]).to_numpy(zero_copy_only=False)
        codes = np.asarray(combine(batch["pq_code"]).values) \
            .reshape(len(ids), self.m)
        Q = self.lut.shape[0]
        # scores (N, Q): sum LUT slices along subspaces
        scores = np.zeros((len(ids), Q), np.float64)
        for j in range(self.m):
            scores += self.lut[:, j, codes[:, j]].T    # (N, Q)
        kk = min(self.k, len(ids))
        top = (np.argpartition(-scores, kk - 1, axis=0)[:kk]
               if kk < len(ids) else
               np.arange(len(ids))[:, None].repeat(Q, axis=1))
        qi = np.repeat(np.arange(Q, dtype=np.int64), kk)
        sel = top.T.reshape(-1)
        return pa.table({
            "query_id": pa.array(qi),
            "match_id": pa.array(ids[sel]),
            "cosine": pa.array(scores[sel, qi])})


def pq_topk(codes_ds, codebooks: np.ndarray, queries: np.ndarray,
            k: int = 10, id_col: str = "vec_id"):
    """Approximate top-k over PQ codes: per-batch ADC partial top-k →
    one tiny merge per query (same merge stage as brute force). The
    corpus pass reads only (id, m-byte code) — the 100 TB memory
    story."""
    import ray
    q = _normalize(np.asarray(queries, dtype=np.float64))
    per_batch = codes_ds.map_batches(
        _PQScore, batch_format="pyarrow",
        fn_constructor_args=(ray.put(codebooks), ray.put(q), id_col, k),
        concurrency=(1, 8), max_restarts=0)
    return per_batch.groupby("query_id").map_groups(_MergeTopK(k),
                                                    batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF-PQ: the two scale levers composed (Jégou et al. 2011 §V) — the
# coarse quantizer prunes which partitions are READ, the product
# quantizer shrinks what each row costs, and codes encode RESIDUALS
# (x_n - centroid) so the fine quantizer only has to cover the
# within-cell spread: cos(q, x) ≈ q·c + ADC(q, residual code).
# ---------------------------------------------------------------------------

def ivfpq_build(ds, index_dir: str, num_centroids: int = 16, m: int = 8,
                nbits: int = 8, sample_frac: float = 0.1,
                vec_col: str = "embedding", id_col: str = "vec_id",
                seed: int = 11) -> None:
    """Build a physical IVF-PQ index: coarse k-means in the normalized
    space, per-subspace residual codebooks trained on the same sample,
    then ONE streaming encode pass writing (id, cent, pq_code) parquet
    partitioned by centroid. Artifacts: ``centroids.npy`` +
    ``codebooks.npy``."""
    import os

    import ray
    from datavec_ray.util import dataset_to_table

    sample_tbl = ds.select_columns([vec_col]) \
        .random_sample(sample_frac, seed=seed).materialize()
    sample = _matrix(dataset_to_table(sample_tbl)[vec_col])
    sample = _normalize(sample[np.lexsort(sample.T[::-1])])
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub, c = dim // m, 1 << nbits
    cents = _kmeans(sample, num_centroids, seed=seed)
    resid = sample - cents[_assign_centroids(sample, cents)]
    codebooks = np.stack([_kmeans(np.ascontiguousarray(
        resid[:, j * dsub:(j + 1) * dsub]), c, seed=seed + j)
        for j in range(m)])

    cents_ref, cb_ref = ray.put(cents), ray.put(codebooks)

    def _enc(batch: pa.Table) -> pa.Table:
        cn, cb = ray.get(cents_ref), ray.get(cb_ref)
        mt = _normalize(_matrix(batch[vec_col]))
        a = _assign_centroids(mt, cn)
        r = mt - cn[a]
        codes = np.empty((len(mt), m), np.uint8)
        for j in range(m):
            codes[:, j] = _assign_centroids(
                np.ascontiguousarray(r[:, j * dsub:(j + 1) * dsub]), cb[j])
        cent = pa.array(a.astype(np.int64))
        return pa.table({
            id_col: batch[id_col],
            "cent": cent,          # partition key (hive dir, not in file)
            "cent_id": cent,       # kept IN the file for the scorer
            "pq_code": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1), pa.uint8()), m)})

    _enc.__name__ = "ivfpq_encode"
    os.makedirs(index_dir, exist_ok=True)
    (ds.map_batches(_enc, batch_format="pyarrow")
       .write_parquet(index_dir, partition_cols=["cent"]))
    np.save(os.path.join(index_dir, "centroids.npy"), cents)
    np.save(os.path.join(index_dir, "codebooks.npy"), codebooks)


class _IVFPQScore:
    """ADC over residual codes + the per-row coarse offset q·c_row."""

    def __init__(self, cents_ref, cb_ref, q_ref, id_col: str, k: int):
        import ray
        self.cents = ray.get(cents_ref)
        cb = ray.get(cb_ref)
        q = ray.get(q_ref)
        mm, c, dsub = cb.shape
        self.lut = np.einsum("qjd,jcd->qjc",
                             q.reshape(len(q), mm, dsub), cb)   # (Q, m, c)
        self.qc = q @ self.cents.T                              # (Q, C)
        self.id_col, self.k, self.m = id_col, k, mm

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = combine(batch[self.id_col]).to_numpy(zero_copy_only=False)
        cent = combine(batch["cent_id"]).to_numpy(
            zero_copy_only=False).astype(np.int64)
        codes = np.asarray(combine(batch["pq_code"]).values) \
            .reshape(len(ids), self.m)
        scores = self.qc[:, cent].T.astype(np.float64).copy()   # (N, Q)
        for j in range(self.m):
            scores += self.lut[:, j, codes[:, j]].T
        Q = self.lut.shape[0]
        kk = min(self.k, len(ids))
        top = (np.argpartition(-scores, kk - 1, axis=0)[:kk]
               if kk < len(ids) else
               np.arange(len(ids))[:, None].repeat(Q, axis=1))
        qi = np.repeat(np.arange(Q, dtype=np.int64), kk)
        sel = top.T.reshape(-1)
        return pa.table({
            "query_id": pa.array(qi),
            "match_id": pa.array(ids[sel]),
            "cosine": pa.array(scores[sel, qi])})


def ivfpq_query(index_dir: str, queries: np.ndarray, k: int = 10,
                nprobe: int = 4, id_col: str = "vec_id"):
    """Query a physical IVF-PQ index: only the probed centroid
    partitions are READ (union over queries), and what is read is
    (id, cent, m-byte code) — never the vectors."""
    import os

    import ray
    import ray.data as rd

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    cb = np.load(os.path.join(index_dir, "codebooks.npy"))
    q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]
    needed = sorted({int(c) for c in probe.reshape(-1)})
    paths = []
    for c in needed:
        d = os.path.join(index_dir, f"cent={c}")
        if os.path.isdir(d):
            paths.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "match_id": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})
    if not paths:
        return rd.from_arrow(empty)
    ds = rd.read_parquet(paths, columns=[id_col, "cent_id", "pq_code"])
    refs = (ray.put(cents), ray.put(cb), ray.put(q))
    per_batch = ds.map_batches(
        _IVFPQScore, batch_format="pyarrow",
        fn_constructor_args=(*refs, id_col, k),
        concurrency=(1, 8), max_restarts=0)
    return per_batch.groupby("query_id").map_groups(_MergeTopK(k),
                                                    batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Streaming PCA (dimensionality reduction / whitening before ANN)
# ---------------------------------------------------------------------------

def _moment_pass(ds, vec_col: str):
    """ONE streaming pass over a vector column → (n, mean (d,),
    sample covariance (d, d)). Per batch the partial is a single
    (1 + d + d*d) float64 array — count, sum vector, Gram matrix —
    merged by addition (Ray tree reduce); d is the embedding width,
    never the corpus."""
    from ray.data.aggregate import AggregateFn

    def acc_block(state, blk: pa.Table):
        x = _matrix(blk[vec_col]).astype(np.float64)
        d = x.shape[1]
        out = (np.zeros(1 + d + d * d) if state is None
               else state.copy())
        out[0] += len(x)
        out[1:d + 1] += x.sum(axis=0)
        out[d + 1:] += (x.T @ x).ravel()
        return out

    agg = AggregateFn(
        init=lambda _: None,
        accumulate_block=acc_block,
        merge=lambda a, b: b if a is None else (a if b is None else a + b),
        finalize=lambda s: s, name="mom")
    state = np.asarray(ds.select_columns([vec_col]).aggregate(agg)["mom"])
    # solve 1 + d + d^2 = len(state) for the embedding width d
    d = int((-1 + (1 + 4 * (len(state) - 1)) ** 0.5) / 2)
    n = int(state[0])
    mean = state[1:d + 1] / max(n, 1)
    g = state[d + 1:].reshape(d, d)
    cov = (g - n * np.outer(mean, mean)) / max(n - 1, 1)
    return n, mean, cov


def embedding_cov(ds, vec_col: str = "embedding",
                  dims: int | None = None) -> pa.Table:
    """Tidy sample-covariance entries (dim_a <= dim_b) of a vector
    column — the oracle-checkable face of the streaming moment pass
    PCA rides on (SQL mirror: covar_samp over list elements)."""
    _, _, cov = _moment_pass(ds, vec_col)
    if dims is not None:
        cov = cov[:dims, :dims]
    a, b = np.triu_indices(cov.shape[0])
    return pa.table({"dim_a": pa.array(a.astype(np.int64)),
                     "dim_b": pa.array(b.astype(np.int64)),
                     "cov": pa.array(cov[a, b], pa.float64())})


def pca_fit(ds, vec_col: str = "embedding", k: int = 8) -> dict:
    """Principal components of an embedding column in ONE streaming
    pass: per batch a (1 + d + d*d) float64 partial — count, sum
    vector, Gram matrix — merged by addition (Ray tree reduce); the
    d×d eigendecomposition runs on the driver (d is the embedding
    width, never the corpus). Deterministic sign convention: each
    component's largest-|coefficient| entry is made positive, so the
    model is reproducible across partitionings and platforms.

    Returns {"mean": (d,), "components": (k, d) rows = components in
    descending explained-variance order, "explained_var": (k,)}.
    """
    n, mean, cov = _moment_pass(ds, vec_col)
    if n < 2:
        raise ValueError("need at least 2 vectors to fit PCA")
    w, v = np.linalg.eigh(cov)               # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T                    # (k, d)
    sign = np.sign(comps[np.arange(len(comps)),
                         np.abs(comps).argmax(axis=1)])
    sign[sign == 0] = 1.0
    comps = comps * sign[:, None]
    return {"mean": mean, "components": comps,
            "explained_var": np.clip(w[order], 0, None)}


def pca_transform(ds, model: dict, vec_col: str = "embedding",
                  out_col: str = "pca"):
    """Project vectors onto a fitted PCA basis — one shuffle-free
    broadcast map (the model ships via ray.put once, never per batch)."""
    import ray

    ref = ray.put((model["mean"], model["components"]))

    def _project(batch: pa.Table) -> pa.Table:
        mean, comps = ray.get(ref)        # zero-copy plasma read per task
        x = _matrix(batch[vec_col]).astype(np.float64)
        y = (x - mean) @ comps.T
        return batch.append_column(
            pa.field(out_col, pa.list_(pa.float64())),
            pa.array(list(y)))

    _project.__name__ = "pca_project"
    return ds.map_batches(_project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# incremental IVF maintenance: LSM-style vector upserts over the physical
# centroid-partitioned index (the "vector lake" path — embeddings change
# through CDC, the ANN index follows without a rebuild)
# ---------------------------------------------------------------------------

_LEDGER = "_ledger.parquet"


def _read_ivf_ledger(index_dir: str):
    """(sorted ids, latest ver per id, deleted flag) or None."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(index_dir, _LEDGER)
    if not os.path.exists(path):
        return None
    t = pq.read_table(path)
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ver = t["ver"].to_numpy(zero_copy_only=False).astype(np.int64)
    dele = t["deleted"].to_numpy(zero_copy_only=False).astype(bool)
    order = np.argsort(ids, kind="stable")
    return ids[order], ver[order], dele[order]


def ivf_upsert(index_dir: str, delta: pa.Table,
               vec_col: str = "embedding", id_col: str = "vec_id") -> dict:
    """Apply a CHANGE batch to a physical IVF index without rebuilding
    — the vector-lake counterpart of the CDC lake's delta commit. A
    delta row with a vector upserts (insert or replace; the vector may
    MOVE to a different centroid), a null vector deletes. Mechanism:

    - upserted vectors are assigned to the FIXED centroid geometry and
      appended as one versioned ``upsert-<ver>`` file per affected
      centroid directory (delta-proportional writes; heavy drift
      eventually warrants an ``ivf_build`` rebuild — the metrics report
      mean assignment distance so the caller can tell),
    - a ledger (id → latest ver, deleted flag) records every changed
      id; queries treat an index row as live iff its id is absent from
      the ledger or carries the ledger's latest version — so a stale
      copy in the vector's OLD centroid can never surface, even when
      only the old centroid is probed,
    - ``ivf_compact`` folds upsert files + ledger back into plain base
      partitions (read amplification bounded the LSM way).

    The delta is delta-sized by contract (a change batch, not a bulk
    load); ledger size is bounded by ids changed since the last
    compact. Returns metrics."""
    import os

    import pyarrow.parquet as pq

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    led = _read_ivf_ledger(index_dir)
    ver = int(led[1].max()) + 1 if led is not None else 1

    null_vec = pc.is_null(delta[vec_col])
    dels = delta.filter(null_vec)
    ups = delta.filter(pc.invert(null_vec))
    mean_dist = None
    affected: list[int] = []
    if ups.num_rows:
        m = _matrix(ups[vec_col])
        assign = _assign_centroids(m, cents)
        mn = _normalize(m)
        mean_dist = float(
            1.0 - (mn * _normalize(cents)[assign]).sum(axis=1).mean())
        ids = combine(ups[id_col]).cast(pa.int64())
        for c in np.unique(assign):
            rmask = assign == c
            sub = pa.table({
                id_col: ids.filter(pa.array(rmask)),
                vec_col: combine(ups[vec_col]).filter(pa.array(rmask)),
                "ver": pa.array(np.full(int(rmask.sum()), ver, np.int64)),
            })
            d = os.path.join(index_dir, f"cent={int(c)}")
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"upsert-{ver:08d}.parquet")
            tmp = f"{path}.tmp.{os.getpid()}"
            pq.write_table(sub, tmp)
            os.replace(tmp, path)
            affected.append(int(c))
    # merge the ledger: latest ver per id wins
    new_ids = np.concatenate([
        combine(ups[id_col]).to_numpy(zero_copy_only=False).astype(
            np.int64) if ups.num_rows else np.empty(0, np.int64),
        combine(dels[id_col]).to_numpy(zero_copy_only=False).astype(
            np.int64) if dels.num_rows else np.empty(0, np.int64)])
    new_del = np.concatenate([np.zeros(ups.num_rows, bool),
                              np.ones(dels.num_rows, bool)])
    if led is not None:
        keep = ~np.isin(led[0], new_ids)
        all_ids = np.concatenate([led[0][keep], new_ids])
        all_ver = np.concatenate([led[1][keep],
                                  np.full(len(new_ids), ver, np.int64)])
        all_del = np.concatenate([led[2][keep], new_del])
    else:
        all_ids = new_ids
        all_ver = np.full(len(new_ids), ver, np.int64)
        all_del = new_del
    path = os.path.join(index_dir, _LEDGER)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(pa.table({"vec_id": pa.array(all_ids),
                             "ver": pa.array(all_ver),
                             "deleted": pa.array(all_del)}), tmp)
    os.replace(tmp, path)
    return {"ver": ver, "upserts": ups.num_rows, "deletes": dels.num_rows,
            "affected_centroids": sorted(set(affected)),
            "ledger_ids": len(all_ids),
            "mean_assign_dist": mean_dist}


def _ivf_live_filter(index_dir: str, id_col: str):
    """Batch filter dropping rows superseded or deleted per the ledger.
    Returns None when no ledger exists (pure base index)."""
    led = _read_ivf_ledger(index_dir)
    if led is None or len(led[0]) == 0:
        return None
    lid, lver, ldel = led

    def live(b: pa.Table) -> pa.Table:
        ids = combine(b[id_col]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ver = (b["ver"].to_numpy(zero_copy_only=False).astype(np.int64)
               if "ver" in b.column_names
               else np.zeros(len(ids), np.int64))
        pos = np.minimum(np.searchsorted(lid, ids), len(lid) - 1)
        hit = lid[pos] == ids
        ok = ~hit | ((ver == lver[pos]) & ~ldel[pos])
        out = b.filter(pa.array(ok))
        return out.drop_columns(["ver"]) if "ver" in out.column_names \
            else out

    live.__name__ = "ivf_live_filter"
    return live


def ivf_query_live(index_dir: str, queries: np.ndarray, k: int = 10,
                   nprobe: int = 4, vec_col: str = "embedding",
                   id_col: str = "vec_id"):
    """``ivf_query`` over an index with pending upserts: probed BASE
    files and versioned upsert files are read separately (upserts carry
    their ver column), the broadcast ledger filter drops superseded /
    deleted rows, then the ordinary probe-masked scoring runs."""
    import os

    import ray
    import ray.data as rd

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    q = _normalize(np.asarray(queries, dtype=np.float64))
    ncents = _normalize(cents)
    probe = np.argsort(-(q @ ncents.T), axis=1)[:, :nprobe]
    needed = sorted({int(c) for c in probe.reshape(-1)})
    base_paths, up_paths = [], []
    for c in needed:
        d = os.path.join(index_dir, f"cent={c}")
        if not os.path.isdir(d):
            continue
        for f in sorted(os.listdir(d)):
            if not f.endswith(".parquet"):
                continue
            (up_paths if f.startswith("upsert-") else base_paths).append(
                os.path.join(d, f))
    parts = []
    if base_paths:
        parts.append(rd.read_parquet(base_paths,
                                     columns=[id_col, vec_col]))
    if up_paths:
        parts.append(rd.read_parquet(up_paths,
                                     columns=[id_col, vec_col, "ver"]))
    if not parts:
        return rd.from_arrow(pa.table({
            "query_id": pa.array([], pa.int64()),
            "match_id": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64())}))
    ds = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    flt = _ivf_live_filter(index_dir, id_col)
    if flt is not None:
        ds = ds.map_batches(flt, batch_format="pyarrow")
    refs = (ray.put(cents), ray.put(q), ray.put(probe))
    per_batch = ds.map_batches(
        _ProbeTopK, batch_format="pyarrow",
        fn_constructor_args=(*refs, vec_col, id_col, k),
        concurrency=(1, 8), max_restarts=0)
    return per_batch.groupby("query_id").map_groups(_MergeTopK(k),
                                                    batch_format="pyarrow")


def ivf_compact(index_dir: str, id_col: str = "vec_id",
                vec_col: str = "embedding") -> dict:
    """Fold upsert files + ledger back into plain base partitions: per
    centroid, read every file, keep live rows (ledger-latest version,
    tombstones dropped), write ONE base file, remove the rest; the
    ledger is deleted last (idempotent on crash — re-running re-folds
    the same state)."""
    import os

    import pyarrow.parquet as pq

    flt = _ivf_live_filter(index_dir, id_col)
    folded = rows = 0
    for name in sorted(os.listdir(index_dir)):
        d = os.path.join(index_dir, name)
        if not (name.startswith("cent=") and os.path.isdir(d)):
            continue
        files = [os.path.join(d, f) for f in sorted(os.listdir(d))
                 if f.endswith(".parquet")]
        if not files or (len(files) == 1
                         and not os.path.basename(files[0])
                         .startswith("upsert-")):
            continue
        tabs = []
        for f in files:
            t = pq.read_table(f)
            if "ver" not in t.column_names:
                t = t.append_column(
                    "ver", pa.array(np.zeros(t.num_rows, np.int64)))
            tabs.append(t.select([id_col, vec_col, "ver"]))
        merged = pa.concat_tables(tabs)
        live = flt(merged) if flt is not None else \
            merged.drop_columns(["ver"])
        base = os.path.join(d, "base-0.parquet")
        tmp = f"{base}.tmp.{os.getpid()}"
        pq.write_table(live.sort_by([(id_col, "ascending")]), tmp)
        os.replace(tmp, base)
        for f in files:
            if os.path.abspath(f) != os.path.abspath(base):
                try:
                    os.remove(f)
                except FileNotFoundError:
                    pass
        folded += 1
        rows += live.num_rows
    led_path = os.path.join(index_dir, _LEDGER)
    if os.path.exists(led_path):
        os.remove(led_path)
    return {"centroids_folded": folded, "live_rows": rows}
