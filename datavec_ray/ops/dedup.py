"""Deduplication at training-data scale. SURVEY.md north-rule extras.

All variants follow the same shuffle discipline as the CDC upsert:
vectorized per-batch work (hash/sketch computation as map_batches over
Arrow), hash partitioning on a signature column, ONE groupby shuffle of
P partitions (never one group per key), then vectorized per-partition
resolution — so shuffle volume is bounded by signatures, not documents.

- exact_dedup: content-hash partition + keep min-id row per distinct text.
- minhash_lsh_pairs: word-shingle MinHash (Broder 1997) + LSH banding
  (Leskovec/Rajaraman/Ullman ch.3): shingle→minhash per batch (vectorized
  universal hashing), explode to (band, band_hash, doc_id) rows, bucket
  groupby, emit verified candidate pairs with exact n-gram Jaccard.
- simhash64: Charikar 2002 sign-random-projection over token hashes;
  near-dup = Hamming distance ≤ k (banded lookup on 16-bit chunks).
- embedding_nearduplicate_pairs: random-hyperplane LSH buckets over an
  embedding column, verify cosine within buckets.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datavec_ray.hll import hash64
from datavec_ray.steps.base import combine

_MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

class _HashPartition:
    def __init__(self, text_col: str, num_partitions: int):
        self.text_col, self.P = text_col, num_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = hash64(combine(batch[self.text_col]))
        batch = batch.append_column(pa.field("__h", pa.uint64()), pa.array(h))
        return batch.append_column(
            pa.field("__part", pa.int64()),
            pa.array((h % np.uint64(self.P)).astype(np.int64)))


class _DedupPartition:
    """Vectorized keep-first (min id) per distinct text within a partition."""

    def __init__(self, text_col: str, id_col: str):
        self.text_col, self.id_col = text_col, id_col
        self.__name__ = "dedup_partition"

    def __call__(self, group: pa.Table) -> pa.Table:
        g = group.sort_by([(self.text_col, "ascending"), (self.id_col, "ascending")])
        txt = g[self.text_col].combine_chunks()
        n = g.num_rows
        first = np.ones(n, dtype=bool)
        if n > 1:
            same = pc.equal(txt.slice(0, n - 1), txt.slice(1)).to_numpy(zero_copy_only=False)
            first[1:] = ~same
        return g.filter(pa.array(first)).drop_columns(
            [c for c in ("__h", "__part") if c in g.column_names])


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                num_partitions: int = 32):
    """Keep the min-`id_col` row per distinct `text_col` value."""
    return (ds.map_batches(_HashPartition(text_col, num_partitions),
                           batch_format="pyarrow")
            .groupby("__part")
            .map_groups(_DedupPartition(text_col, id_col), batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingle_hashes(texts: list, k: int) -> list[np.ndarray]:
    """Word k-gram shingle hash sets per document (vectorized hashing of
    the shingle strings via blake2-backed hash64)."""
    out = []
    for t in texts:
        toks = (t or "").lower().split()
        if len(toks) < k:
            shingles = [" ".join(toks)] if toks else []
        else:
            shingles = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
        if not shingles:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        out.append(np.unique(hash64(np.array(shingles, dtype=object))))
    return out


class _MinHashBands:
    """map_batches: doc → (band, band_hash, doc_id) rows (exploded)."""

    def __init__(self, text_col: str, id_col: str, num_hashes: int,
                 num_bands: int, shingle_k: int, seed: int = 1234):
        self.text_col, self.id_col = text_col, id_col
        self.num_hashes, self.num_bands, self.k = num_hashes, num_bands, shingle_k
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_hashes, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_hashes, dtype=np.int64).astype(np.uint64)

    def signature(self, sh: np.ndarray) -> np.ndarray:
        if len(sh) == 0:
            return np.full(self.num_hashes, np.uint64(0xFFFFFFFFFFFFFFFF))
        # universal hashing h_i(x) = (a_i*x + b_i) mod p, vectorized (H, S)
        v = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = combine(batch[self.text_col]).to_pylist()
        ids = combine(batch[self.id_col]).to_numpy(zero_copy_only=False)
        shingles = _shingle_hashes(texts, self.k)
        rows_band, rows_hash, rows_id = [], [], []
        r = self.num_hashes // self.num_bands
        for i, sh in enumerate(shingles):
            sig = self.signature(sh)
            for band in range(self.num_bands):
                chunk = sig[band * r:(band + 1) * r]
                bh = np.uint64(0)
                for x in chunk:  # tiny loop (r elements)
                    bh = bh * np.uint64(1000003) + x
                rows_band.append(band)
                rows_hash.append(int(bh))
                rows_id.append(int(ids[i]))
        return pa.table({
            "band": pa.array(rows_band, pa.int32()),
            "band_hash": pa.array(rows_hash, pa.uint64()),
            "doc_id": pa.array(rows_id, pa.int64()),
        })


class _BucketPairs:
    """map_groups over (band, band_hash) buckets → candidate pairs."""

    def __init__(self, max_bucket: int = 200):
        self.max_bucket = max_bucket
        self.__name__ = "bucket_pairs"

    def __call__(self, group: pa.Table) -> pa.Table:
        ids = np.unique(group["doc_id"].to_numpy(zero_copy_only=False))
        if len(ids) < 2 or len(ids) > self.max_bucket:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        a, b = np.triu_indices(len(ids), k=1)
        return pa.table({"id_a": pa.array(ids[a]), "id_b": pa.array(ids[b])})


def minhash_lsh_pairs(ds, text_lookup: Optional[dict] = None,
                      text_col: str = "text", id_col: str = "doc_id",
                      num_hashes: int = 128, num_bands: int = 32,
                      shingle_k: int = 3, jaccard_threshold: float = 0.7):
    """Return verified near-duplicate pairs (id_a < id_b, jaccard ≥ thr).

    text_lookup: {doc_id: text} for the verification stage; broadcast via
    ray.put once. If None, pairs are returned unverified (candidates).
    """
    import ray

    bands = ds.map_batches(_MinHashBands(text_col, id_col, num_hashes,
                                         num_bands, shingle_k),
                           batch_format="pyarrow")
    pairs = bands.groupby(["band", "band_hash"]).map_groups(
        _BucketPairs(), batch_format="pyarrow")
    # candidate set is small after banding; dedupe pairs
    pairs = pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")
    if text_lookup is None:
        return pairs
    ref = ray.put(text_lookup)
    k = shingle_k
    thr = jaccard_threshold

    class _Verify:
        def __init__(self):
            self.texts = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ia = batch["id_a"].to_pylist()
            ib = batch["id_b"].to_pylist()
            jac = []
            for x, y in zip(ia, ib):
                sa = set(map(int, _shingle_hashes([self.texts.get(x, "")], k)[0]))
                sb = set(map(int, _shingle_hashes([self.texts.get(y, "")], k)[0]))
                u = len(sa | sb)
                jac.append(len(sa & sb) / u if u else 0.0)
            out = batch.append_column(pa.field("jaccard", pa.float64()),
                                      pa.array(jac))
            return out.filter(pc.greater_equal(out["jaccard"], thr))

    return pairs.map_batches(_Verify, batch_format="pyarrow", concurrency=(1, 4))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(texts: list, shingle_k: int = 2) -> np.ndarray:
    """64-bit SimHash per text (Charikar 2002): sign of summed ±1 feature
    hash bits. Features are word k-gram shingles (k=2 default) — single
    tokens make short documents with a shared vocabulary collapse to
    near-identical hashes (degenerate banding)."""
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = (t or "").lower().split()
        if not toks:
            continue
        if len(toks) >= shingle_k:
            feats = [" ".join(toks[j:j + shingle_k])
                     for j in range(len(toks) - shingle_k + 1)]
        else:
            feats = [" ".join(toks)]
        h = hash64(np.array(feats, dtype=object))
        bits = np.unpackbits(h.view(np.uint8)).reshape(len(h), 64)
        votes = bits.sum(axis=0) * 2 - len(h)   # (+1/-1 summed)
        sim_bits = (votes > 0).astype(np.uint8)
        out[i] = np.packbits(sim_bits).view(np.uint64)[0]
    return out


class AddSimHash:
    def __init__(self, text_col: str = "text", out_col: str = "simhash"):
        self.text_col, self.out_col = text_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        sh = simhash64(combine(batch[self.text_col]).to_pylist())
        return batch.append_column(pa.field(self.out_col, pa.uint64()),
                                   pa.array(sh))


def simhash_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3):
    """Near-dup pairs by SimHash banding: 4 bands of 16 bits — any pair
    within Hamming distance ≤ 3 of 64 bits shares at least one exact
    16-bit band (pigeonhole)."""
    with_h = ds.map_batches(AddSimHash(text_col), batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].to_numpy(zero_copy_only=False)
        ids = combine(batch[id_col]).to_numpy(zero_copy_only=False)
        bands, keys, out_ids, hashes = [], [], [], []
        for band in range(4):
            chunk = ((h >> np.uint64(band * 16)) & np.uint64(0xFFFF)).astype(np.int64)
            bands.extend([band] * len(h))
            keys.extend(chunk.tolist())
            out_ids.extend(ids.tolist())
            hashes.extend(h.tolist())
        return pa.table({"band": pa.array(bands, pa.int32()),
                         "key": pa.array(keys, pa.int64()),
                         "doc_id": pa.array(out_ids, pa.int64()),
                         "simhash": pa.array(hashes, pa.uint64())})

    exploded = with_h.map_batches(explode, batch_format="pyarrow")
    hmax = max_hamming

    class _Pairs:
        def __init__(self):
            self.__name__ = "simhash_bucket_pairs"

        def __call__(self, group: pa.Table) -> pa.Table:
            ids = group["doc_id"].to_numpy(zero_copy_only=False)
            hs = group["simhash"].to_numpy(zero_copy_only=False)
            uniq, idx = np.unique(ids, return_index=True)
            ids, hs = uniq, hs[idx]
            if len(ids) < 2 or len(ids) > 500:
                return pa.table({"id_a": pa.array([], pa.int64()),
                                 "id_b": pa.array([], pa.int64()),
                                 "hamming": pa.array([], pa.int64())})
            a, b = np.triu_indices(len(ids), k=1)
            x = hs[a] ^ hs[b]
            ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                                axis=1).sum(axis=1)
            keep = ham <= hmax
            return pa.table({"id_a": pa.array(ids[a][keep], pa.int64()),
                             "id_b": pa.array(ids[b][keep], pa.int64()),
                             "hamming": pa.array(ham[keep].astype(np.int64))})

    pairs = exploded.groupby(["band", "key"]).map_groups(
        _Pairs(), batch_format="pyarrow")
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding near-dup (cosine LSH)
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(ds, vec_col: str = "embedding",
                            id_col: str = "vec_id", num_planes: int = 16,
                            cos_threshold: float = 0.95, seed: int = 5):
    """Random-hyperplane LSH buckets, verify cosine within bucket."""
    class _Bucket:
        def __init__(self):
            self.planes = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            arr = combine(batch[vec_col])
            width = len(arr[0])
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            m = flat.reshape(-1, width).astype(np.float64)
            if self.planes is None:
                rng = np.random.default_rng(seed)  # same planes every actor
                self.planes = rng.standard_normal((width, num_planes))
            signs = (m @ self.planes) > 0
            weights = (1 << np.arange(num_planes, dtype=np.int64))
            key = signs.astype(np.int64) @ weights
            return pa.table({
                "bucket": pa.array(key),
                "vec_id": combine(batch[id_col]).cast(pa.int64()),
                "vec": arr,
            })

    thr = cos_threshold

    class _Pairs:
        def __init__(self):
            self.__name__ = "embedding_bucket_pairs"

        def __call__(self, group: pa.Table) -> pa.Table:
            ids = group["vec_id"].to_numpy(zero_copy_only=False)
            arr = group["vec"].combine_chunks()
            width = len(arr[0]) if len(arr) else 0
            if len(ids) < 2 or len(ids) > 1000:
                return pa.table({"id_a": pa.array([], pa.int64()),
                                 "id_b": pa.array([], pa.int64()),
                                 "cosine": pa.array([], pa.float64())})
            m = arr.flatten().to_numpy(zero_copy_only=False).reshape(-1, width)
            m = m.astype(np.float64)
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            m = m / np.where(norms == 0, 1, norms)
            sims = m @ m.T
            a, b = np.triu_indices(len(ids), k=1)
            cs = sims[a, b]
            keep = cs >= thr
            return pa.table({"id_a": pa.array(ids[a][keep].astype(np.int64)),
                             "id_b": pa.array(ids[b][keep].astype(np.int64)),
                             "cosine": pa.array(cs[keep])})

    buckets = ds.map_batches(_Bucket, batch_format="pyarrow", concurrency=(1, 4))
    pairs = buckets.groupby("bucket").map_groups(_Pairs(), batch_format="pyarrow")
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")
