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
  groupby, emit verified candidate pairs with exact shingle-set Jaccard.
  Verification never materializes the corpus: a column-pruned second
  pass emits sketches for CANDIDATE docs only (output-sized memory).
- simhash64: Charikar 2002 sign-random-projection over token hashes;
  near-dup = Hamming distance ≤ k (banded lookup on 16-bit chunks).
- embedding_nearduplicate_pairs: random-hyperplane LSH buckets over an
  embedding column, verify cosine within buckets.

Sketching is ONE set of numpy/Arrow kernels per batch (no per-document
Python loops): tokenize the whole batch with Arrow string kernels,
hash every token once, form k-gram shingle hashes by a rolling combine
over the flat token-hash array, and reduce per document with
``np.minimum.reduceat`` / ``np.add.reduceat`` on the list offsets.

Oversized LSH buckets (where the duplicates usually ARE) are never
silently dropped: they are sub-split by a secondary hash of the full
signature — identical documents have identical signatures, so true
duplicate clusters stay together — and a still-oversized sub-bucket
(a mass-duplicate cluster) emits star pairs to its min-id
representative: O(n) pairs, same connected components.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datavec_ray.hll import hash64
from datavec_ray.steps.base import combine

_MERSENNE = (1 << 61) - 1
_FNV = np.uint64(1099511628211)   # k-gram combiner (wraps mod 2^64)
_POLY = np.uint64(1000003)        # band/signature combiner

log = logging.getLogger("datavec_ray.dedup")


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
# flat (whole-batch) tokenize + shingle kernels
# ---------------------------------------------------------------------------

def _segment_arange(lengths: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated (vectorized per-segment arange)."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    return (np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(lengths) - lengths, lengths))


def _tokenize_flat(texts) -> tuple[np.ndarray, np.ndarray]:
    """Lowercased whitespace tokens for a WHOLE batch via Arrow kernels.

    Returns (token_hashes uint64 flat, doc offsets int64 of length D+1)
    — tokens of doc d are flat[offsets[d]:offsets[d+1]]. Every token in
    the batch is hashed in one vectorized hash64 call.
    """
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(list(texts), pa.string())
    texts = combine(texts) if isinstance(texts, pa.ChunkedArray) else texts
    low = pc.utf8_lower(pc.fill_null(texts, ""))
    parts = pc.utf8_split_whitespace(low)
    flat = pc.list_flatten(parts)
    offsets = np.asarray(parts.offsets, dtype=np.int64).copy()
    # split_whitespace emits "" fragments at string edges; drop them and
    # fix the offsets (vectorized per-doc nonempty counts)
    nonempty = pc.not_equal(flat, "")
    ne = nonempty.to_numpy(zero_copy_only=False)
    if not ne.all():
        counts = np.diff(offsets)
        row_of = np.repeat(np.arange(len(counts)), counts)
        kept = np.zeros(len(counts), dtype=np.int64)
        np.add.at(kept, row_of, ne.astype(np.int64))
        flat = flat.filter(nonempty)
        offsets = np.concatenate(([0], np.cumsum(kept)))
    if len(flat) == 0:
        return np.empty(0, dtype=np.uint64), offsets
    return hash64(flat).astype(np.uint64), offsets


def _shingle_hashes_flat(texts, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Word k-gram shingle hashes per doc, flat + offsets layout.

    A k-gram hash is the rolling FNV-style combine of its k token hashes
    — computed for ALL docs at once by k shifted multiply-adds over the
    flat token-hash array, masking windows that cross doc boundaries.
    Docs with 0 < tokens < k yield ONE shingle over all their tokens
    (matching the reference semantics of the string-join variant).
    Shingles are a MULTISET (duplicates kept): min-hash over a multiset
    equals min-hash over the set, and the verify path uniquifies.
    """
    th, offs = _tokenize_flat(texts)
    D = len(offs) - 1
    counts = np.diff(offs)
    n = len(th)
    if n == 0 or k <= 1:
        return th, offs
    m = n - k + 1
    if m > 0:
        acc = th[:m].copy()
        for j in range(1, k):
            acc = acc * _FNV + th[j:j + m]
        doc_of = np.repeat(np.arange(D), counts)
        valid = doc_of[:m] == doc_of[k - 1:k - 1 + m]
    else:
        acc = np.empty(0, dtype=np.uint64)
        valid = np.empty(0, dtype=bool)
    full = np.where(counts >= k, counts - (k - 1), 0)
    short = (counts > 0) & (counts < k)
    out_counts = np.where(short, 1, full)
    out_offs = np.concatenate(([0], np.cumsum(out_counts)))
    sh = np.empty(int(out_offs[-1]), dtype=np.uint64)
    # full-window shingles: acc[valid] is doc-ascending, scatter into the
    # output segments of docs with counts >= k
    full_mask = counts >= k
    if full_mask.any():
        w = full[full_mask]
        starts = out_offs[:-1][full_mask]
        pos = np.repeat(starts, w) + _segment_arange(w)
        sh[pos] = acc[valid]
    # short docs (rare): one rolling hash over all tokens each.
    # uint64 wraparound is intentional; suppress the scalar-overflow
    # RuntimeWarning so a session-level "warnings as errors" filter
    # can't turn the by-design wrap into a flaky failure.
    with np.errstate(over="ignore"):
        for d in np.flatnonzero(short):
            seg = th[offs[d]:offs[d + 1]]
            h = seg[0]
            for x in seg[1:]:
                h = h * _FNV + x
            sh[out_offs[d]] = h
    return sh, out_offs


def _shingle_hashes(texts: list, k: int) -> list[np.ndarray]:
    """Per-doc UNIQUE shingle-hash sets (the verify-path representation)."""
    sh, offs = _shingle_hashes_flat(texts, k)
    return [np.unique(sh[offs[d]:offs[d + 1]]) for d in range(len(offs) - 1)]


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class _MinHashBands:
    """map_batches: doc → (band, band_hash, doc_id, sig_hash) rows.

    Whole-batch vectorization: signatures via H universal hashes over the
    flat shingle array + per-doc ``np.minimum.reduceat``; band hashes via
    r multiply-adds over signature columns. No per-document Python loop.
    """

    def __init__(self, text_col: str, id_col: str, num_hashes: int,
                 num_bands: int, shingle_k: int, seed: int = 1234):
        self.text_col, self.id_col = text_col, id_col
        self.num_hashes, self.num_bands, self.k = num_hashes, num_bands, shingle_k
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_hashes, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_hashes, dtype=np.int64).astype(np.uint64)

    def signatures(self, sh: np.ndarray, offs: np.ndarray) -> np.ndarray:
        """(D, H) min-hash signature matrix; empty docs get all-ones."""
        D = len(offs) - 1
        sig = np.full((D, self.num_hashes), np.uint64(0xFFFFFFFFFFFFFFFF))
        counts = np.diff(offs)
        nonempty = counts > 0
        starts = offs[:-1][nonempty]
        if starts.size:
            p = np.uint64(_MERSENNE)
            for i in range(self.num_hashes):
                v = (self.a[i] * sh + self.b[i]) % p
                sig[nonempty, i] = np.minimum.reduceat(v, starts)
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = combine(batch[self.text_col])
        ids = combine(batch[self.id_col]).to_numpy(zero_copy_only=False).astype(np.int64)
        sh, offs = _shingle_hashes_flat(texts, self.k)
        sig = self.signatures(sh, offs)
        D, B = len(ids), self.num_bands
        r = self.num_hashes // B
        band_hash = np.zeros((D, B), dtype=np.uint64)
        for band in range(B):
            acc = np.zeros(D, dtype=np.uint64)
            for j in range(r):
                acc = acc * _POLY + sig[:, band * r + j]
            band_hash[:, band] = acc
        sig_hash = np.zeros(D, dtype=np.uint64)
        for i in range(self.num_hashes):
            sig_hash = sig_hash * _POLY + sig[:, i]
        return pa.table({
            "band": pa.array(np.tile(np.arange(B, dtype=np.int32), D)),
            "band_hash": pa.array(band_hash.reshape(-1)),   # doc-major
            "doc_id": pa.array(np.repeat(ids, B)),
            "sig_hash": pa.array(np.repeat(sig_hash, B)),
        })


def _pair_indices(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    a, b = np.triu_indices(len(ids), k=1)
    return ids[a], ids[b]


def _tag_bucket_partition(ds, cols, num_partitions: int = 64):
    """Tag rows with ``hash(bucket key) % P``: ONE ``groupby(__bpart)``
    co-locates whole buckets while invoking the per-bucket logic once
    per PARTITION — at corpus scale a per-bucket ``map_groups`` is one
    Ray group dispatch per LSH bucket (millions); the partition form
    replaces that with an in-process numpy segment scan."""
    from datavec_ray.config import partitions_override
    num_partitions = partitions_override(num_partitions,
                                         library_default=64)
    def tag(batch: pa.Table) -> pa.Table:
        h = np.zeros(batch.num_rows, dtype=np.uint64)
        for c in cols:
            h = h * _FNV + hash64(combine(batch[c]))
            h ^= h >> np.uint64(29)
        return batch.append_column(
            pa.field("__bpart", pa.int64()),
            pa.array((h % np.uint64(num_partitions)).astype(np.int64)))

    return ds.map_batches(tag, batch_format="pyarrow")


class _PerBucket:
    """Adapt a per-bucket callable to a per-PARTITION ``map_groups``
    body: sort by the bucket key, segment with a run scan, call the
    inner once per bucket slice in process (numpy work per call; no Ray
    dispatch per bucket)."""

    def __init__(self, inner, bucket_cols, empty: pa.Table):
        self.inner, self.bucket_cols, self.empty = inner, list(bucket_cols), empty
        self.__name__ = getattr(inner, "__name__", "per_bucket")

    def __call__(self, part: pa.Table) -> pa.Table:
        g = part.drop_columns(["__bpart"]).sort_by(
            [(c, "ascending") for c in self.bucket_cols])
        n = g.num_rows
        if n == 0:
            return self.empty
        new = np.ones(n, dtype=bool)
        new[1:] = False
        for c in self.bucket_cols:
            a = combine(g[c]).to_numpy(zero_copy_only=False)
            new[1:] |= a[1:] != a[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        outs = [self.inner(g.slice(s, e - s))
                for s, e in zip(starts, ends) if e - s >= 2]
        outs = [o for o in outs if o.num_rows]
        return pa.concat_tables(outs) if outs else self.empty


def distinct_pairs(pairs, num_partitions: int = 32):
    """Distinct (id_a, id_b) rows, keeping the first row's extra columns
    — hash-partitioned with a vectorized run dedupe per partition (the
    per-pair ``groupby([id_a, id_b])`` form would dispatch one Ray group
    per candidate pair)."""
    def tag(batch: pa.Table) -> pa.Table:
        a = combine(batch["id_a"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64).astype(np.uint64)
        b = combine(batch["id_b"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64).astype(np.uint64)
        h = (a * _FNV) ^ b
        return batch.append_column(
            pa.field("__ppart", pa.int64()),
            pa.array((h % np.uint64(num_partitions)).astype(np.int64)))

    def dd(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["__ppart"]).sort_by(
            [("id_a", "ascending"), ("id_b", "ascending")])
        a = combine(g["id_a"]).to_numpy(zero_copy_only=False)
        b = combine(g["id_b"]).to_numpy(zero_copy_only=False)
        first = np.ones(len(a), dtype=bool)
        if len(a) > 1:
            first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return g.filter(pa.array(first))

    dd.__name__ = "distinct_pairs"
    return (pairs.map_batches(tag, batch_format="pyarrow")
            .groupby("__ppart").map_groups(dd, batch_format="pyarrow"))


_EMPTY_PAIRS = pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64())})


class _BucketPairs:
    """map_groups over (band, band_hash) buckets → candidate pairs.

    Buckets over ``max_bucket`` docs are SUB-SPLIT by a secondary hash of
    the full minhash signature (identical docs share identical signatures
    → true dup clusters stay together); a sub-bucket still over the cap
    is a mass-duplicate cluster and emits star pairs to its min-id
    representative (O(n) pairs, same connected components). Counts are
    logged, never silently dropped.
    """

    def __init__(self, max_bucket: int = 256):
        self.max_bucket = max_bucket
        self.__name__ = "bucket_pairs"

    def __call__(self, group: pa.Table) -> pa.Table:
        ids_np = group["doc_id"].to_numpy(zero_copy_only=False)
        uq, idx = np.unique(ids_np, return_index=True)
        if len(uq) < 2:
            return _EMPTY_PAIRS
        if len(uq) <= self.max_bucket:
            ia, ib = _pair_indices(uq)
            return pa.table({"id_a": pa.array(ia), "id_b": pa.array(ib)})
        sig = group["sig_hash"].to_numpy(zero_copy_only=False)[idx]
        nsub = int(np.ceil(len(uq) / self.max_bucket))
        sub = (sig % np.uint64(nsub)).astype(np.int64)
        log.warning("oversized LSH bucket: %d docs sub-split into %d "
                    "sub-buckets by signature hash", len(uq), nsub)
        outs_a, outs_b = [], []
        for s in range(nsub):
            sids = uq[sub == s]
            if len(sids) < 2:
                continue
            if len(sids) > self.max_bucket:
                log.warning("mass-duplicate cluster of %d docs: star-linked "
                            "to representative %d", len(sids), int(sids[0]))
                outs_a.append(np.full(len(sids) - 1, sids[0], dtype=np.int64))
                outs_b.append(sids[1:])
            else:
                ia, ib = _pair_indices(sids)
                outs_a.append(ia)
                outs_b.append(ib)
        if not outs_a:
            return _EMPTY_PAIRS
        return pa.table({"id_a": pa.array(np.concatenate(outs_a)),
                         "id_b": pa.array(np.concatenate(outs_b))})


def _dedupe_pairs(tbl: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side pair dedupe — memory is bounded by the candidate-pair
    count (the OUTPUT size), never the corpus."""
    a = tbl["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = tbl["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(a) == 0:
        return a, b
    key = np.stack([a, b], axis=1)
    uniq = np.unique(key, axis=0)
    return uniq[:, 0], uniq[:, 1]


class _CandidateSketches:
    """Column-pruned corpus pass emitting UNIQUE shingle-hash sets for
    candidate docs only (broadcast id set via ray.put)."""

    def __init__(self, needed_ref, text_col: str, id_col: str, k: int):
        import ray
        self.needed = ray.get(needed_ref)
        self.text_col, self.id_col, self.k = text_col, id_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = combine(batch[self.id_col]).to_numpy(zero_copy_only=False).astype(np.int64)
        mask = np.isin(ids, self.needed)
        if not mask.any():
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "shingles": pa.array([], pa.list_(pa.uint64()))})
        sub = batch.filter(pa.array(mask))
        sub_ids = ids[mask]
        sh, offs = _shingle_hashes_flat(combine(sub[self.text_col]), self.k)
        sets = [np.unique(sh[offs[d]:offs[d + 1]])
                for d in range(len(offs) - 1)]
        return pa.table({
            "doc_id": pa.array(sub_ids),
            "shingles": pa.array([s.tolist() for s in sets],
                                 pa.list_(pa.uint64())),
        })


def minhash_lsh_pairs(ds, verify: bool = True,
                      text_col: str = "text", id_col: str = "doc_id",
                      num_hashes: int = 128, num_bands: int = 32,
                      shingle_k: int = 3, jaccard_threshold: float = 0.7,
                      max_bucket: int = 256) -> pa.Table:
    """Near-duplicate pairs (id_a < id_b), verified with exact
    shingle-set Jaccard ≥ threshold when ``verify`` (else raw candidates).

    Scale shape: sketch+band (map) → bucket groupby (ONE shuffle of
    signature rows, not documents) → candidate pairs (output-sized) →
    one column-pruned corpus pass computing sketches for candidate docs
    only → driver-side Jaccard over those sketches. The corpus text is
    never materialized on the driver.
    """
    import ray

    from datavec_ray.util import dataset_to_table

    bands = ds.map_batches(_MinHashBands(text_col, id_col, num_hashes,
                                         num_bands, shingle_k),
                           batch_format="pyarrow", batch_size=4096)
    pairs_ds = _tag_bucket_partition(bands, ["band", "band_hash"]) \
        .groupby("__bpart").map_groups(
            _PerBucket(_BucketPairs(max_bucket), ["band", "band_hash"],
                       _EMPTY_PAIRS),
            batch_format="pyarrow")
    ia, ib = _dedupe_pairs(dataset_to_table(pairs_ds))
    if not verify:
        return pa.table({"id_a": pa.array(ia), "id_b": pa.array(ib)})
    if len(ia) == 0:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    needed = np.unique(np.concatenate([ia, ib]))
    ref = ray.put(needed)
    sk = dataset_to_table(
        ds.map_batches(_CandidateSketches, batch_format="pyarrow",
                       fn_constructor_args=(ref, text_col, id_col, shingle_k),
                       concurrency=(1, 8), max_restarts=0))
    lookup = {int(i): np.asarray(s, dtype=np.uint64)
              for i, s in zip(sk["doc_id"].to_pylist(),
                              sk["shingles"].to_pylist())}
    empty = np.empty(0, dtype=np.uint64)
    jac = np.empty(len(ia), dtype=np.float64)
    for i, (x, y) in enumerate(zip(ia, ib)):
        sa = lookup.get(int(x), empty)
        sb = lookup.get(int(y), empty)
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        jac[i] = inter / union if union else 0.0
    keep = jac >= jaccard_threshold
    return pa.table({"id_a": pa.array(ia[keep]), "id_b": pa.array(ib[keep]),
                     "jaccard": pa.array(jac[keep])})


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(texts: list, shingle_k: int = 2) -> np.ndarray:
    """64-bit SimHash per text (Charikar 2002): sign of summed ±1 feature
    hash bits. Features are word k-gram shingles (k=2 default) — single
    tokens make short documents with a shared vocabulary collapse to
    near-identical hashes (degenerate banding).

    Whole-batch vectorized: one unpackbits over ALL feature hashes, one
    ``np.add.reduceat`` per-doc bit vote, one packbits.
    """
    sh, offs = _shingle_hashes_flat(texts, shingle_k)
    D = len(offs) - 1
    out = np.zeros(D, dtype=np.uint64)
    counts = np.diff(offs)
    nonempty = counts > 0
    if not nonempty.any():
        return out
    bits = np.unpackbits(sh.view(np.uint8)).reshape(len(sh), 64)
    starts = offs[:-1][nonempty]
    votes = np.add.reduceat(bits.astype(np.int32), starts, axis=0)
    sim_bits = (votes * 2 > counts[nonempty, None]).astype(np.uint8)
    out[nonempty] = np.packbits(sim_bits, axis=1).view(np.uint64)[:, 0]
    return out


class AddSimHash:
    def __init__(self, text_col: str = "text", out_col: str = "simhash"):
        self.text_col, self.out_col = text_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        sh = simhash64(combine(batch[self.text_col]))
        return batch.append_column(pa.field(self.out_col, pa.uint64()),
                                   pa.array(sh))


def simhash_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, max_bucket: int = 512,
                  hash_col: str | None = None):
    """Near-dup pairs by SimHash banding: 4 bands of 16 bits — any pair
    within Hamming distance ≤ 3 of 64 bits shares at least one exact
    16-bit band (pigeonhole). Oversized buckets sub-split by a secondary
    hash of the FULL simhash (exact dups always stay together); a
    still-oversized sub-bucket compares its members against the min-id
    representative (O(n), keeps exact-dup components connected).

    ``hash_col`` supplies a PRECOMPUTED 64-bit sketch column instead of
    text SimHashing — any Hamming-locality hash rides the same banding
    (e.g. ``multimodal.ImagePHash`` perceptual image hashes)."""
    if hash_col is not None:
        def _alias(b: pa.Table) -> pa.Table:
            return b.append_column(
                pa.field("simhash", pa.uint64()),
                combine(b[hash_col]).cast(pa.uint64()))
        with_h = ds.map_batches(_alias, batch_format="pyarrow")
    else:
        with_h = ds.map_batches(AddSimHash(text_col),
                                batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].to_numpy(zero_copy_only=False)
        ids = combine(batch[id_col]).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(h)
        bands = np.repeat(np.arange(4, dtype=np.int32), n)
        shifts = (np.arange(4, dtype=np.uint64) * np.uint64(16))
        keys = ((h[None, :] >> shifts[:, None]) &
                np.uint64(0xFFFF)).astype(np.int64).reshape(-1)
        return pa.table({"band": pa.array(bands),
                         "key": pa.array(keys),
                         "doc_id": pa.array(np.tile(ids, 4)),
                         "simhash": pa.array(np.tile(h, 4))})

    exploded = with_h.map_batches(explode, batch_format="pyarrow")
    hmax = max_hamming
    cap = max_bucket

    def _ham(x: np.ndarray) -> np.ndarray:
        return np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                             axis=1).sum(axis=1)

    class _Pairs:
        def __init__(self):
            self.__name__ = "simhash_bucket_pairs"

        @staticmethod
        def _emit(ids, hs):
            a, b = np.triu_indices(len(ids), k=1)
            ham = _ham(hs[a] ^ hs[b])
            keep = ham <= hmax
            return ids[a][keep], ids[b][keep], ham[keep]

        def __call__(self, group: pa.Table) -> pa.Table:
            ids = group["doc_id"].to_numpy(zero_copy_only=False)
            hs = group["simhash"].to_numpy(zero_copy_only=False)
            uniq, idx = np.unique(ids, return_index=True)
            ids, hs = uniq, hs[idx]
            empty = pa.table({"id_a": pa.array([], pa.int64()),
                              "id_b": pa.array([], pa.int64()),
                              "hamming": pa.array([], pa.int64())})
            if len(ids) < 2:
                return empty
            if len(ids) <= cap:
                ia, ib, hm = self._emit(ids, hs)
            else:
                nsub = int(np.ceil(len(ids) / cap))
                sub = ((hs * _POLY) % np.uint64(nsub)).astype(np.int64)
                log.warning("oversized SimHash bucket: %d docs sub-split "
                            "into %d sub-buckets", len(ids), nsub)
                outs = []
                for s in range(nsub):
                    m = sub == s
                    sids, shs = ids[m], hs[m]
                    if len(sids) < 2:
                        continue
                    if len(sids) > cap:
                        log.warning("mass-dup simhash cluster of %d docs: "
                                    "comparing against representative %d",
                                    len(sids), int(sids[0]))
                        hm = _ham(shs[1:] ^ shs[0])
                        keep = hm <= hmax
                        outs.append((np.full(keep.sum(), sids[0],
                                             dtype=np.int64),
                                     sids[1:][keep], hm[keep]))
                    else:
                        outs.append(self._emit(sids, shs))
                if not outs:
                    return empty
                ia = np.concatenate([o[0] for o in outs])
                ib = np.concatenate([o[1] for o in outs])
                hm = np.concatenate([o[2] for o in outs])
            return pa.table({"id_a": pa.array(ia.astype(np.int64)),
                             "id_b": pa.array(ib.astype(np.int64)),
                             "hamming": pa.array(hm.astype(np.int64))})

    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int64())})
    pairs = _tag_bucket_partition(exploded, ["band", "key"]) \
        .groupby("__bpart").map_groups(
            _PerBucket(_Pairs(), ["band", "key"], empty),
            batch_format="pyarrow")
    return distinct_pairs(pairs)


# ---------------------------------------------------------------------------
# embedding near-dup (cosine LSH)
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(ds, vec_col: str = "embedding",
                            id_col: str = "vec_id", num_planes: int = 16,
                            cos_threshold: float = 0.95, seed: int = 5,
                            max_bucket: int = 1024):
    """Random-hyperplane LSH buckets, verify cosine within bucket.
    Oversized buckets sub-split by EXTRA hyperplane sign bits
    (near-identical vectors agree on them w.h.p.); a still-oversized
    sub-bucket verifies members against its min-id representative."""
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
    cap = max_bucket

    class _Pairs:
        def __init__(self):
            self.__name__ = "embedding_bucket_pairs"
            self.extra = None

        def _extra_key(self, m: np.ndarray) -> np.ndarray:
            if self.extra is None:
                rng = np.random.default_rng(seed + 1)
                self.extra = rng.standard_normal((m.shape[1], 16))
            signs = (m @ self.extra) > 0
            return signs.astype(np.int64) @ (1 << np.arange(16, dtype=np.int64))

        @staticmethod
        def _emit(ids, m):
            sims = m @ m.T
            a, b = np.triu_indices(len(ids), k=1)
            cs = sims[a, b]
            keep = cs >= thr
            return ids[a][keep], ids[b][keep], cs[keep]

        def __call__(self, group: pa.Table) -> pa.Table:
            ids = group["vec_id"].to_numpy(zero_copy_only=False)
            arr = group["vec"].combine_chunks()
            width = len(arr[0]) if len(arr) else 0
            empty = pa.table({"id_a": pa.array([], pa.int64()),
                              "id_b": pa.array([], pa.int64()),
                              "cosine": pa.array([], pa.float64())})
            if len(ids) < 2:
                return empty
            m = arr.flatten().to_numpy(zero_copy_only=False) \
                .reshape(-1, width).astype(np.float64)
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            m = m / np.where(norms == 0, 1, norms)
            if len(ids) <= cap:
                ia, ib, cs = self._emit(ids, m)
            else:
                nsub = int(np.ceil(len(ids) / cap))
                sub = (self._extra_key(m) % nsub).astype(np.int64)
                log.warning("oversized embedding bucket: %d vectors "
                            "sub-split into %d sub-buckets", len(ids), nsub)
                outs = []
                for s in range(nsub):
                    msk = sub == s
                    sids, sm = ids[msk], m[msk]
                    if len(sids) < 2:
                        continue
                    if len(sids) > cap:
                        log.warning("mass-dup embedding cluster of %d: "
                                    "verifying against representative %d",
                                    len(sids), int(sids[0]))
                        cs = sm[1:] @ sm[0]
                        keep = cs >= thr
                        outs.append((np.full(keep.sum(), sids[0],
                                             dtype=np.int64),
                                     sids[1:][keep], cs[keep]))
                    else:
                        outs.append(self._emit(sids, sm))
                if not outs:
                    return empty
                ia = np.concatenate([o[0] for o in outs])
                ib = np.concatenate([o[1] for o in outs])
                cs = np.concatenate([o[2] for o in outs])
            return pa.table({"id_a": pa.array(ia.astype(np.int64)),
                             "id_b": pa.array(ib.astype(np.int64)),
                             "cosine": pa.array(cs)})

    buckets = ds.map_batches(_Bucket, batch_format="pyarrow", concurrency=(1, 4))
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})
    pairs = _tag_bucket_partition(buckets, ["bucket"]) \
        .groupby("__bpart").map_groups(
            _PerBucket(_Pairs(), ["bucket"], empty),
            batch_format="pyarrow")
    return distinct_pairs(pairs)


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard similarity join (inverted index — no sketching)
# ---------------------------------------------------------------------------

class _DistinctGrams:
    """map_batches body: one (did, g) row per DISTINCT word n-gram per
    document (g = rolling FNV hash of the n token hashes; docs with
    0 < tokens < n contribute one gram over all their tokens, matching
    _shingle_hashes_flat)."""

    def __init__(self, text_col: str, id_col: str, n: int):
        self.text_col, self.id_col, self.n = text_col, id_col, n

    def __call__(self, b: pa.Table) -> pa.Table:
        hashes, offs = _shingle_hashes_flat(b[self.text_col], self.n)
        ids = np.repeat(
            combine(b[self.id_col]).cast(pa.int64()).to_numpy(
                zero_copy_only=False), np.diff(offs))
        h = hashes.view(np.int64)
        order = np.lexsort((h, ids))
        di, hi = ids[order], h[order]
        keep = np.ones(len(di), dtype=bool)
        if len(di) > 1:
            keep[1:] = (di[1:] != di[:-1]) | (hi[1:] != hi[:-1])
        return pa.table({"did": pa.array(di[keep]), "g": pa.array(hi[keep])})


class _GramPairs:
    """map_groups body on g: emit every doc pair sharing this gram.
    Grams shared by more than ``max_df`` documents are stop-shingles
    ("the quick brown" of the corpus): they generate O(df^2) pairs while
    contributing one unit of intersection, so at scale they are dropped
    and LOGGED — pairs whose similarity rests only on ubiquitous grams
    fall below any useful threshold anyway."""

    def __init__(self, max_df: int | None):
        self.max_df = max_df
        self.__name__ = "gram_pairs"

    def __call__(self, grp: pa.Table) -> pa.Table:
        ids = np.unique(grp["did"].to_numpy(zero_copy_only=False))
        if len(ids) < 2:
            return _EMPTY_PAIRS
        if self.max_df and len(ids) > self.max_df:
            log.warning("dropping stop-shingle shared by %d docs "
                        "(max_df=%d)", len(ids), self.max_df)
            return _EMPTY_PAIRS
        a, b = _pair_indices(ids)
        return pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})


def ngram_jaccard_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, threshold: float = 0.4,
                        max_df: int | None = None):
    """EXACT word-n-gram Jaccard similarity join — the oracle-checkable
    near-dup op (MinHash/SimHash approximate it; this computes it).

    Inverted-index shape (no O(corpus^2) scan):
        distinct (doc, gram) rows                      # map, vectorized
          -> groupby(gram): emit co-occurring pairs    # shuffle 1
          -> groupby(pair): count = |A n B|            # shuffle 2
          -> join |A|, |B| (per-doc gram counts, broadcast when small)
          -> jaccard = inter / (|A| + |B| - inter) >= threshold

    All-to-all traffic is bounded by sum of df^2 over grams; ``max_df``
    caps the quadratic head at scale (default None = exact, for oracle
    parity at test scale). Returns (id_a, id_b, jaccard) sorted by pair,
    jaccard rounded to 6 decimals.
    """
    from datavec_ray.join import JoinStep

    grams = ds.map_batches(_DistinctGrams(text_col, id_col, n),
                           batch_format="pyarrow").materialize()
    # materialize: BOTH size joins read this — lazy would re-run the
    # groupby once per join side
    sizes = grams.groupby("did").count().materialize()

    def _sz(name):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({name: t["did"],
                             f"sz_{name[-1]}": t["count()"]})
        return f

    from datavec_ray.reduce import Reducer

    co = (_tag_bucket_partition(grams, ["g"])
          .groupby("__bpart")
          .map_groups(_PerBucket(_GramPairs(max_df), ["g"],
                                 _EMPTY_PAIRS),
                      batch_format="pyarrow"))
    # |A n B| per pair through the map-side-combining Reducer (partial
    # counts per batch, ONE shuffle of partials) instead of a second
    # native sort-groupby over raw pair rows
    cnt = Reducer(["id_a", "id_b"], [["id_a", "Count", "count()"]])
    cnt._in_schema_hint = pa.schema([("id_a", pa.int64()),
                                     ("id_b", pa.int64())])
    pairs = cnt.apply_dataset(co)
    j1 = JoinStep(sizes.map_batches(_sz("id_a"), batch_format="pyarrow"),
                  keys=["id_a"])
    # static schema hints: a standalone JoinStep would otherwise probe
    # ds.schema(), running the whole pairs pipeline once extra
    j1._in_schema_hint = pa.schema([("id_a", pa.int64()),
                                    ("id_b", pa.int64()),
                                    ("count()", pa.int64())])
    j = j1.apply_dataset(pairs)
    j2 = JoinStep(sizes.map_batches(_sz("id_b"), batch_format="pyarrow"),
                  keys=["id_b"])
    j2._in_schema_hint = pa.schema([("id_a", pa.int64()),
                                    ("id_b", pa.int64()),
                                    ("count()", pa.int64()),
                                    ("sz_a", pa.int64())])
    j = j2.apply_dataset(j)

    def _finish(t: pa.Table) -> pa.Table:
        inter = t["count()"].cast(pa.float64())
        denom = pc.subtract(pc.add(t["sz_a"].cast(pa.float64()),
                                   t["sz_b"].cast(pa.float64())), inter)
        jac = pc.divide(inter, denom)
        out = pa.table({"id_a": t["id_a"], "id_b": t["id_b"],
                        "jaccard": pc.round(jac, 6)})
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return (j.map_batches(_finish, batch_format="pyarrow")
            .sort(["id_a", "id_b"]))


# ---------------------------------------------------------------------------
# line-level exact dedup (C4-style: Raffel et al. 2020 kept one occurrence
# of every three-sentence span; here the unit is a delimiter-separated
# line, exact string equality, first occurrence in (doc_id, line_idx)
# order wins)
# ---------------------------------------------------------------------------

def chunk_words_to_lines(texts, words_per_line: int = 10,
                         word_sep: str = " ", line_sep: str = "\n"):
    """Re-chunk each text into fixed-size word lines (vectorized: one
    split + two offset-arithmetic ListArray rebuilds + two binary_join
    kernels per batch, no per-row loop). Gives line structure to corpora
    stored as single-line strings so line-level ops have a unit to work
    on."""
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(list(texts), pa.string())
    texts = combine(texts)
    words = pc.split_pattern(pc.fill_null(texts, ""), word_sep)
    flat = combine(pc.list_flatten(words))
    offs = np.asarray(words.offsets, dtype=np.int64)
    counts = np.diff(offs)
    # per-doc line counts and the flat word index of every line start
    nlines = (counts + words_per_line - 1) // words_per_line
    line_of_doc = _segment_arange(nlines)                 # 0..nlines_d per doc
    line_starts = (np.repeat(offs[:-1], nlines)
                   + line_of_doc * words_per_line)
    line_ends = np.minimum(line_starts + words_per_line,
                           np.repeat(offs[1:], nlines))
    line_offsets = np.concatenate(([0], np.cumsum(line_ends - line_starts)))
    # ListArray of words per LINE → join with word_sep
    order = pa.array(
        (np.repeat(line_starts, line_ends - line_starts)
         + _segment_arange(line_ends - line_starts)), type=pa.int64())
    line_words = pa.ListArray.from_arrays(
        pa.array(line_offsets, type=pa.int32()), pc.take(flat, order))
    lines = combine(pc.binary_join(line_words, word_sep))
    # ListArray of lines per DOC → join with line_sep
    doc_offsets = np.concatenate(([0], np.cumsum(nlines)))
    doc_lines = pa.ListArray.from_arrays(
        pa.array(doc_offsets, type=pa.int32()), lines)
    return pc.binary_join(doc_lines, line_sep)


class _ExplodeLines:
    """doc rows → one row per line: (id, line_idx, line). Per-batch
    combiner: only the first in-batch occurrence of each line survives
    (global first is resolved after the shuffle), so shuffle volume is
    bounded by distinct lines per batch."""

    def __init__(self, id_col: str, text_col: str, delimiter: str,
                 num_buckets: int, min_chars: int = 0):
        self.id_col, self.text_col = id_col, text_col
        self.delimiter, self.nb = delimiter, num_buckets
        self.min_chars = min_chars

    def __call__(self, batch: pa.Table) -> pa.Table:
        lst = pc.split_pattern(
            pc.fill_null(combine(batch[self.text_col]), ""), self.delimiter)
        counts = np.diff(np.asarray(lst.offsets, dtype=np.int64))
        ids = np.repeat(combine(batch[self.id_col]).to_numpy(
            zero_copy_only=False), counts)
        out = pa.table({
            self.id_col: pa.array(ids, type=batch[self.id_col].type),
            "line_idx": pa.array(_segment_arange(counts)),
            "line": combine(pc.list_flatten(lst)),
        })
        # in-batch combine: sort to (id, line_idx) first — batches are
        # NOT guaranteed id-ordered, and the survivor shipped to the
        # bucket resolver must be the batch's min-(id, line_idx)
        # occurrence or a later doc could win the global tiebreak;
        # exempt (short) lines are NEVER combined — every occurrence
        # is kept
        import pandas as pd
        out = out.sort_by([(self.id_col, "ascending"),
                           ("line_idx", "ascending")])
        first = ~pd.Index(out["line"].to_pandas()).duplicated(keep="first")
        if self.min_chars > 0:
            short = pc.less(pc.utf8_length(out["line"]),
                            self.min_chars).to_numpy(zero_copy_only=False)
            first |= short
        out = out.filter(pa.array(first))
        b = (hash64(combine(out["line"])) % np.uint64(self.nb)).astype(np.int32)
        return out.append_column(pa.field("__b", pa.int32()), pa.array(b))


def _first_per_line(part: pa.Table) -> pa.Table:
    """Within one hash bucket (ALL occurrences of a line share its
    bucket): global first occurrence per distinct line string. Arrow
    in / arrow out (pandas only INSIDE — arrow-format group concat
    keeps block schemas hashable, avoiding Ray's schema-dedup warning
    storm in every group task), pandas sort+drop_duplicates kernel."""
    df = part.to_pandas()
    df = df.sort_values([df.columns[0], "line_idx"], kind="mergesort")
    df = df.drop_duplicates("line", keep="first").drop(columns="__b")
    # strip from_pandas' b'pandas' schema metadata: metadata-bearing
    # schemas are unhashable and trip Ray's schema-dedup warning in
    # every downstream shuffle task
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


class _RebuildDocs:
    """kept (id, line_idx, line) rows of one doc-hash partition → one
    row per doc with the surviving lines re-joined in order."""

    def __init__(self, id_col: str, text_col: str, delimiter: str):
        self.id_col, self.text_col, self.delimiter = id_col, text_col, delimiter
        self.__name__ = "rebuild_docs"

    def __call__(self, part: pa.Table) -> pa.Table:
        part = part.sort_by([(self.id_col, "ascending"),
                             ("line_idx", "ascending")])
        ids = part[self.id_col].to_numpy(zero_copy_only=False)
        # group boundaries on the sorted partition (vectorized)
        change = np.nonzero(np.concatenate(([True], ids[1:] != ids[:-1])))[0]
        offsets = np.concatenate((change, [len(ids)])).astype(np.int32)
        doc_lines = pa.ListArray.from_arrays(
            pa.array(offsets), combine(part["line"]))
        return pa.table({
            self.id_col: pa.array(ids[change],
                                  type=part[self.id_col].type),
            self.text_col: pc.binary_join(doc_lines, self.delimiter),
        })


def line_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
               delimiter: str = "\n", min_chars: int = 0,
               num_buckets: int = 64):
    """Corpus-wide exact line dedup (C4-style): split every document
    into delimiter-separated lines, keep only the globally FIRST
    occurrence of each distinct line (order = (doc_id, line_idx)),
    reassemble documents from their surviving lines; documents whose
    every line was a duplicate disappear. Lines shorter than
    ``min_chars`` are exempt (always kept) — the C4 heuristic of only
    deduplicating substantial spans.

    Plan: explode+in-batch combine (narrow) → ONE line-hash bucket
    shuffle picking global firsts (bounded by distinct lines) → ONE
    doc-hash shuffle to reassemble. All kernels vectorized; per-bucket
    resolution is a pandas sort + drop_duplicates (hash collisions are
    safe: winners are chosen per exact line string within the bucket).
    """
    lines = ds.map_batches(_ExplodeLines(id_col, text_col, delimiter,
                                         num_buckets, min_chars),
                           batch_format="pyarrow")
    if min_chars > 0:
        def _short(batch: pa.Table) -> pa.Table:
            m = pc.less(pc.utf8_length(batch["line"]), min_chars)
            return batch.filter(m).drop_columns(["__b"])

        def _long(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.greater_equal(pc.utf8_length(batch["line"]), min_chars))

        exempt = lines.map_batches(_short, batch_format="pyarrow")
        dedupable = lines.map_batches(_long, batch_format="pyarrow")
    else:
        exempt, dedupable = None, lines
    winners = dedupable.groupby("__b").map_groups(
        _first_per_line, batch_format="pyarrow")
    kept = winners.union(exempt) if exempt is not None else winners

    def _doc_bucket(batch: pa.Table) -> pa.Table:
        b = (hash64(combine(batch[id_col])) % np.uint64(num_buckets)) \
            .astype(np.int32)
        return batch.append_column(pa.field("__db", pa.int32()), pa.array(b))

    return (kept.map_batches(_doc_bucket, batch_format="pyarrow")
            .groupby("__db")
            .map_groups(_RebuildDocs(id_col, text_col, delimiter),
                        batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# benchmark decontamination (exact n-gram overlap vs an eval set)
# ---------------------------------------------------------------------------

class _ContamCount:
    """map_batches actor: per document, count DISTINCT word n-grams that
    appear in the broadcast benchmark gram set. The gram representation
    is the same rolling-FNV shingle hash as ``ngram_jaccard_pairs``
    (``_shingle_hashes_flat``), so counting over hashes equals counting
    over gram strings modulo negligible 64-bit collisions — the same
    assumption the oracle-checked jaccard join already rests on.

    The benchmark side is ray.put ONCE as a sorted int64 array and read
    zero-copy by every actor; membership is one ``searchsorted`` per
    batch. No shuffle: each row (document) is wholly contained in its
    batch, so per-batch counts are final.
    """

    def __init__(self, bench_ref, text_col: str, id_col: str, n: int):
        import ray
        self.bench = np.asarray(ray.get(bench_ref))   # sorted, unique int64
        self.text_col, self.id_col, self.n = text_col, id_col, n

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = combine(b[self.id_col]).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        out_t = pa.table({self.id_col: pa.array([], pa.int64()),
                          "n_hits": pa.array([], pa.int64())})
        if len(ids) == 0 or len(self.bench) == 0:
            return out_t
        hashes, offs = _shingle_hashes_flat(b[self.text_col], self.n)
        h = hashes.view(np.int64)
        row = np.repeat(np.arange(len(ids), dtype=np.int64), np.diff(offs))
        order = np.lexsort((h, row))
        r, hh = row[order], h[order]
        keep = np.ones(len(r), dtype=bool)
        if len(r) > 1:                                # distinct per doc
            keep[1:] = (r[1:] != r[:-1]) | (hh[1:] != hh[:-1])
        r, hh = r[keep], hh[keep]
        pos = np.searchsorted(self.bench, hh).clip(0, len(self.bench) - 1)
        hit = self.bench[pos] == hh
        hits = np.bincount(r[hit], minlength=len(ids))
        mask = hits > 0
        return pa.table({self.id_col: pa.array(ids[mask]),
                         "n_hits": pa.array(hits[mask].astype(np.int64))})


def decontaminate(ds, bench_ds, text_col: str = "text",
                  id_col: str = "doc_id", n: int = 3):
    """Training-set decontamination: flag documents sharing at least one
    exact word ``n``-gram with an evaluation/benchmark corpus (the
    GPT-3 appendix-C / PaLM overlap rule). Returns one row per
    contaminated document: ``(id_col, n_hits)`` with n_hits = number of
    the document's DISTINCT n-grams found in the benchmark (row order
    unspecified — sorting a possibly-large flag set would be a needless
    all-to-all; sort downstream if needed).

    Scale shape: the benchmark side is the SMALL side by definition
    (eval sets are a few thousand documents against a 100 TB corpus) —
    its distinct gram hashes are collected to the driver once, sorted,
    and broadcast via ``ray.put``; the corpus side is one streaming
    column-pruned ``map_batches`` with zero shuffles. Tokenization is
    lowercase + whitespace split; documents with 0 < tokens < n
    contribute a single gram over all their tokens (matching
    ``_shingle_hashes_flat`` and the jaccard SQL oracle).
    """
    import ray

    from datavec_ray.util import dataset_to_table

    bench_grams = bench_ds.map_batches(
        _DistinctGrams(text_col, id_col, n), batch_format="pyarrow")
    tbl = dataset_to_table(bench_grams)
    # a 0-row bench dataset never runs the map, leaving the input schema
    g = (tbl["g"].to_numpy(zero_copy_only=False)
         if "g" in tbl.column_names else np.array([], np.int64))
    uniq = np.unique(g)
    if len(uniq) == 0:    # empty benchmark → nothing can be contaminated
        import ray.data as rd
        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64()),
                                       "n_hits": pa.array([], pa.int64())}))
    bench_ref = ray.put(uniq)                         # sorted unique int64
    # max_restarts=0: the constructor args carry an ObjectRef, which
    # lives in the object store — a restart after that ref is lost
    # would fail anyway (ray#53727), so disable actor restart and let
    # the stage's task-level retry resubmit cleanly instead
    return ds.map_batches(_ContamCount, batch_format="pyarrow",
                          fn_constructor_args=(bench_ref, text_col,
                                               id_col, n),
                          concurrency=(1, 8), max_restarts=0)


# ---------------------------------------------------------------------------
# exact duplicated-substring signals (Lee et al. 2022, arXiv:2107.06499)
# ---------------------------------------------------------------------------

class _EmitPosGrams:
    """map_batches: explode every FULL k-token window of every document
    into one ``(g, doc, pos, __part)`` row — g is the rolling-FNV hash
    of the window's k token hashes (the `_shingle_hashes_flat` combiner,
    full windows only: substring dedup has no short-doc fallback because
    a duplicated span must be at least k tokens long).

    One vectorized kernel per batch: tokenize+hash the whole batch with
    Arrow kernels, then k shifted multiply-adds over the flat token-hash
    array; positions fall out as flat-index minus doc offset.
    """

    def __init__(self, text_col: str, id_col: str, k: int, P: int):
        self.text_col, self.id_col, self.k, self.P = text_col, id_col, k, P

    def _empty(self) -> pa.Table:
        return pa.table({"g": pa.array([], pa.int64()),
                         "doc": pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64()),
                         "__part": pa.array([], pa.int64())})

    def __call__(self, b: pa.Table) -> pa.Table:
        k = self.k
        th, offs = _tokenize_flat(b[self.text_col])
        n, D = len(th), len(offs) - 1
        m = n - k + 1
        if D == 0 or m <= 0:
            return self._empty()
        with np.errstate(over="ignore"):
            acc = th[:m].copy()
            for j in range(1, k):
                acc = acc * _FNV + th[j:j + m]
        counts = np.diff(offs)
        doc_of = np.repeat(np.arange(D, dtype=np.int64), counts)
        valid = doc_of[:m] == doc_of[k - 1:k - 1 + m]
        if not valid.any():
            return self._empty()
        idx = np.flatnonzero(valid)
        g = np.ascontiguousarray(acc[idx])
        docrow = doc_of[idx]
        pos = idx - offs[docrow]
        ids = combine(b[self.id_col]).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "g": pa.array(g.view(np.int64)),
            "doc": pa.array(ids[docrow]),
            "pos": pa.array(pos),
            "__part": pa.array((g % np.uint64(self.P)).astype(np.int64)),
        })


def _dup_gram_hits(grp: pa.Table) -> pa.Table:
    """Per gram-hash partition: keep the (doc, pos) occurrences of every
    gram that appears in >= 2 DISTINCT documents. One lexsort + run
    arithmetic over the whole partition — never per-gram Python work."""
    g = combine(grp["g"]).to_numpy(zero_copy_only=False)
    d = combine(grp["doc"]).to_numpy(zero_copy_only=False)
    p = combine(grp["pos"]).to_numpy(zero_copy_only=False)
    n = len(g)
    out = {"doc": pa.array([], pa.int64()), "pos": pa.array([], pa.int64())}
    if n == 0:
        return pa.table(out)
    order = np.lexsort((d, g))
    gs, ds_, ps = g[order], d[order], p[order]
    starts = np.concatenate(([0], np.flatnonzero(gs[1:] != gs[:-1]) + 1))
    ends = np.concatenate((starts[1:], [n]))
    multi = ds_[starts] != ds_[ends - 1]      # sorted by doc within run
    keep = np.repeat(multi, ends - starts)
    if not keep.any():
        return pa.table(out)
    return pa.table({"doc": pa.array(ds_[keep]), "pos": pa.array(ps[keep])})


class _SpanSignals:
    """Per doc-partition: merge each document's duplicated-gram positions
    into covered-token counts. With sorted positions p_0 < ... < p_{m-1}
    the union of the k-token intervals [p_j, p_j + k) has size
    sum_{j<m-1} min(p_{j+1} - p_j, k) + k — one vectorized diff +
    reduceat per partition."""

    def __init__(self, id_col: str, k: int):
        self.id_col, self.k = id_col, k
        self.__name__ = "span_signals"

    def __call__(self, grp: pa.Table) -> pa.Table:
        d = combine(grp["doc"]).to_numpy(zero_copy_only=False)
        p = combine(grp["pos"]).to_numpy(zero_copy_only=False)
        n = len(d)
        if n == 0:
            return pa.table({self.id_col: pa.array([], pa.int64()),
                             "dup_grams": pa.array([], pa.int64()),
                             "covered_tokens": pa.array([], pa.int64())})
        order = np.lexsort((p, d))
        ds_, ps = d[order], p[order]
        starts = np.concatenate(([0], np.flatnonzero(ds_[1:] != ds_[:-1]) + 1))
        lens = np.diff(np.concatenate((starts, [n])))
        contrib = np.full(n, self.k, dtype=np.int64)
        if n > 1:
            gap = np.minimum(ps[1:] - ps[:-1], self.k)
            last = np.zeros(n, dtype=bool)
            last[starts + lens - 1] = True
            contrib[:-1] = np.where(last[:-1], self.k, gap)
        covered = np.add.reduceat(contrib, starts)
        return pa.table({self.id_col: pa.array(ds_[starts]),
                         "dup_grams": pa.array(lens),
                         "covered_tokens": pa.array(covered)})


def substring_dup_signals(ds, text_col: str = "text", id_col: str = "doc_id",
                          k: int = 8, num_partitions: int = 64):
    """Exact duplicated-substring detection (the signal half of Lee et
    al. 2022's "Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499): for every document, count the k-token
    windows whose exact content also appears in ANOTHER document, and
    the number of tokens covered by the union of those windows. Returns
    one row per affected document: ``(id_col, dup_grams,
    covered_tokens)`` sorted by id. Downstream policy (drop doc, cut
    span, weight down) composes on top.

    Scale shape: the corpus explodes to one 24-byte row per token —
    that IS the intrinsic cost of exact substring matching (a suffix
    array is likewise a global sort of every token position); both
    shuffles are hash-partition groupbys (P groups total, vectorized
    run arithmetic inside), and the second shuffle moves only the
    duplicated positions, which at web scale is a few percent of the
    first. Matching on 64-bit rolling hashes equals matching on gram
    strings modulo negligible collisions — the same assumption as the
    oracle-checked ngram_jaccard join.

    Reference parity: the DataVec reference has no substring dedup;
    this is a north-rule extra specified against the paper.
    """
    grams = ds.map_batches(_EmitPosGrams(text_col, id_col, k,
                                         num_partitions),
                           batch_format="pyarrow")
    _dup_gram_hits.__name__ = "dup_gram_hits"
    hits = (grams.groupby("__part")
            .map_groups(_dup_gram_hits, batch_format="pyarrow"))

    def _tag_doc(b: pa.Table) -> pa.Table:
        d = combine(b["doc"]).to_numpy(zero_copy_only=False)
        part = (d.astype(np.uint64) % np.uint64(num_partitions)) \
            .astype(np.int64)
        return b.append_column(pa.field("__dpart", pa.int64()),
                               pa.array(part))

    return (hits.map_batches(_tag_doc, batch_format="pyarrow")
            .groupby("__dpart")
            .map_groups(_SpanSignals(id_col, k), batch_format="pyarrow")
            .sort(id_col))


# ---------------------------------------------------------------------------
# incremental dedup against an existing corpus
# ---------------------------------------------------------------------------

def dedup_against(ds, ref_ds, text_col: str = "text",
                  id_col: str = "doc_id", **join_kw):
    """Incremental exact dedup: drop incoming rows whose content
    fingerprint already exists in a reference corpus (the
    "new-crawl-versus-lake" step of a continuously-ingesting training
    pipeline). Purely *against* the reference — internal duplicates
    within the incoming batch are kept (compose ``exact_dedup``
    afterwards for those), matching SQL
    ``WHERE md5(text) NOT IN (SELECT md5(text) FROM ref)``.

    Scale shape: fingerprint both sides per batch with a fully
    VECTORIZED 128-bit content hash — normalize (lowercase, strip all
    whitespace) via Arrow kernels, then two independent-seed `hash64`
    passes (no per-document Python, unlike md5) — then the
    Bloom-prefiltered hash ANTI join (`join.SemiJoinStep`): one
    aggregate pass builds a Bloom filter over the reference
    fingerprints, definite non-matches — the overwhelming majority of a
    fresh crawl — bypass the shuffle entirely, and only Bloom-positive
    rows are confirmed by bucketed exact anti join on BOTH hash halves
    (collision mass ~n^2/2^128: negligible at any corpus size). The
    reference side ships fingerprints only (16 bytes/doc), never text.
    """
    from datavec_ray.join import anti_join

    def fp(b: pa.Table) -> pa.Table:
        norm = pc.replace_substring_regex(
            pc.utf8_lower(pc.fill_null(combine(b[text_col]), "")),
            r"\s", "")
        return b.append_column(
            pa.field("__fp0", pa.uint64()),
            pa.array(hash64(norm, seed=0))).append_column(
            pa.field("__fp1", pa.uint64()),
            pa.array(hash64(norm, seed=1)))

    left = ds.map_batches(fp, batch_format="pyarrow")
    right = ref_ds.map_batches(fp, batch_format="pyarrow") \
        .select_columns(["__fp0", "__fp1"])
    out = anti_join(left, right, keys=["__fp0", "__fp1"], **join_kw)
    return out.drop_columns(["__fp0", "__fp1"])


def conversation_dedup(ds, key: str = "conv_id",
                       order_cols=("turn_idx",),
                       role_col: str = "role", text_col: str = "text",
                       num_partitions: int = 32):
    """CONVERSATION-level exact dedup: fingerprint each conversation as
    the md5 of its ordered turn contents (``role\\x1ftext`` per turn,
    turns joined by ``\\x1e`` in ``order_cols`` order) and keep the
    min-``key`` conversation per fingerprint — the transcript-native
    counterpart of document exact_dedup (a re-imported conversation
    with a fresh id is one fingerprint bucket, not a new corpus row).

    Shape: ONE key-hash exchange; per partition one sort + vectorized
    Arrow per-turn concat + polars Rust group-join reduce turns to ONE
    row per conversation, and md5 runs on that already-reduced side
    (one digest per conversation — the per-turn hot path stays
    vectorized, and md5 keeps the fingerprint mirrorable as DuckDB's
    ``md5()``). Stage 2 is a tiny (hash, key, n_turns) exchange —
    min-key-per-fingerprint over one row per conversation.

    Returns survivors: (key, content_hash, n_turns).
    """
    import hashlib

    from datavec_ray.misc import _GPART, _group_partition, _key_run_starts

    sort_cols = [key] + list(order_cols)

    def fingerprint(group: pa.Table) -> pa.Table:
        import polars as pl
        g = group.drop_columns([_GPART]).sort_by(
            [(c, "ascending") for c in sort_cols])
        part = pc.binary_join_element_wise(
            pc.fill_null(combine(g[role_col]).cast(pa.string()), ""),
            pc.fill_null(combine(g[text_col]).cast(pa.string()), ""),
            "\x1f")
        df = pl.DataFrame({key: pl.Series(combine(g[key])),
                           "part": pl.Series(part)})
        out = df.group_by(key, maintain_order=True).agg(
            pl.col("part").str.join("\x1e").alias("__content"),
            pl.len().alias("n_turns"))
        t = out.to_arrow()
        h = pa.array([hashlib.md5(s.encode()).hexdigest()
                      for s in t["__content"].cast(pa.string()).to_pylist()],
                     pa.string())
        return pa.table({key: t[key].cast(pa.string()),
                         "content_hash": h,
                         "n_turns": t["n_turns"].cast(pa.int64())})

    fingerprint.__name__ = "conv_fingerprint"

    def keep_first(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART]).sort_by(
            [("content_hash", "ascending"), (key, "ascending")])
        first = _key_run_starts(g, ["content_hash"])
        return g.filter(pa.array(first))

    keep_first.__name__ = "conv_keep_first"
    fps = _group_partition(ds, [key], num_partitions) \
        .groupby(_GPART).map_groups(fingerprint, batch_format="pyarrow")
    return _group_partition(fps, ["content_hash"], num_partitions) \
        .groupby(_GPART).map_groups(keep_first, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# cross-corpus NEAR-duplicate detection (new crawl vs existing lake) —
# the near-dup counterpart of dedup_against (which is exact full-text):
# jaccard_against computes the exact n-gram Jaccard join ACROSS the two
# corpora (oracle-checkable), minhash_against is the LSH-banded scale
# path with the same contract as minhash_lsh_pairs.
# ---------------------------------------------------------------------------

class _CrossGramPairs:
    """Per-gram body: emit every (ref_id, new_id) CROSS-side pair
    sharing this gram. Grams shared by more than ``max_df`` docs total
    are stop-shingles (same rationale + logging as _GramPairs)."""

    def __init__(self, max_df: int | None):
        self.max_df = max_df
        self.__name__ = "cross_gram_pairs"

    def __call__(self, grp: pa.Table) -> pa.Table:
        side = grp["side"].to_numpy(zero_copy_only=False)
        did = grp["did"].to_numpy(zero_copy_only=False)
        ref = np.unique(did[side == 0])
        new = np.unique(did[side == 1])
        if not len(ref) or not len(new):
            return _EMPTY_PAIRS
        if self.max_df and len(ref) + len(new) > self.max_df:
            log.warning("dropping cross-corpus stop-shingle shared by "
                        "%d docs (max_df=%d)", len(ref) + len(new),
                        self.max_df)
            return _EMPTY_PAIRS
        a = np.repeat(ref, len(new))
        b = np.tile(new, len(ref))
        return pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})


def jaccard_against(ds, ref_ds, text_col: str = "text",
                    id_col: str = "doc_id", n: int = 3,
                    threshold: float = 0.5, max_df: int | None = None):
    """EXACT cross-corpus word-n-gram Jaccard join: every (ref doc,
    new doc) pair with Jaccard ≥ threshold — the incremental-crawl
    near-dup gate ("is this new page a near-copy of something already
    in the lake?"), the oracle-checkable counterpart of
    ``minhash_against``. Same inverted-index shape as
    ``ngram_jaccard_pairs`` but pairs are emitted ONLY across sides —
    within-corpus duplicates are out of contract (run the single-corpus
    op for those), which also cuts the per-gram pair fan-out from
    O(df²) to O(df_ref · df_new).

    Returns (ref_id, doc_id, jaccard) sorted, jaccard rounded to 6.
    """
    import ray.data as rd

    from datavec_ray.join import JoinStep
    from datavec_ray.reduce import Reducer

    def _side(tag: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                pa.field("side", pa.int8()),
                pa.array(np.full(t.num_rows, tag, np.int8)))
        f.__name__ = f"side_{tag}"
        return f

    grams_ref = ref_ds.map_batches(_DistinctGrams(text_col, id_col, n),
                                   batch_format="pyarrow") \
        .map_batches(_side(0), batch_format="pyarrow")
    grams_new = ds.map_batches(_DistinctGrams(text_col, id_col, n),
                               batch_format="pyarrow") \
        .map_batches(_side(1), batch_format="pyarrow")
    grams = grams_ref.union(grams_new).materialize()

    # ONE combiner pass counts both sides' distinct-gram set sizes
    # (keyed (did, side)); split into the two broadcast tables after —
    # halves the exchanges of the former per-side passes
    def _ones(t: pa.Table) -> pa.Table:
        return pa.table({"did": t["did"], "side": t["side"],
                         "sz": pa.nulls(t.num_rows,
                                        pa.int64()).fill_null(1)})
    _ones.__name__ = "gram_ones"
    sizes_red = Reducer(["did", "side"], [["sz", "Sum", "sz"]])
    sizes_red._in_schema_hint = pa.schema(
        [("did", pa.int64()), ("side", pa.int8()), ("sz", pa.int64())])
    from datavec_ray.util import dataset_to_table
    sizes_all = dataset_to_table(sizes_red.apply_dataset(
        grams.map_batches(_ones, batch_format="pyarrow")))
    ref_mask = pc.equal(sizes_all["side"], 0)
    sizes_ref = pa.table(
        {"id_a": sizes_all.filter(ref_mask)["did"],
         "sz_a": sizes_all.filter(ref_mask)["sz"]})
    inv = pc.invert(ref_mask)
    sizes_new = pa.table(
        {"id_b": sizes_all.filter(inv)["did"],
         "sz_b": sizes_all.filter(inv)["sz"]})

    co = (_tag_bucket_partition(grams, ["g"])
          .groupby("__bpart")
          .map_groups(_PerBucket(_CrossGramPairs(max_df), ["g"],
                                 _EMPTY_PAIRS),
                      batch_format="pyarrow"))
    cnt = Reducer(["id_a", "id_b"], [["id_a", "Count", "count()"]])
    cnt._in_schema_hint = pa.schema([("id_a", pa.int64()),
                                     ("id_b", pa.int64())])
    pairs = cnt.apply_dataset(co)
    j1 = JoinStep(sizes_ref, keys=["id_a"],
                  broadcast=True)
    j1._in_schema_hint = pa.schema([("id_a", pa.int64()),
                                    ("id_b", pa.int64()),
                                    ("count()", pa.int64())])
    j = j1.apply_dataset(pairs)
    j2 = JoinStep(sizes_new, keys=["id_b"],
                  broadcast=True)
    j2._in_schema_hint = pa.schema([("id_a", pa.int64()),
                                    ("id_b", pa.int64()),
                                    ("count()", pa.int64()),
                                    ("sz_a", pa.int64())])
    j = j2.apply_dataset(j)

    def _finish(t: pa.Table) -> pa.Table:
        inter = t["count()"].cast(pa.float64())
        denom = pc.subtract(pc.add(t["sz_a"].cast(pa.float64()),
                                   t["sz_b"].cast(pa.float64())), inter)
        jac = pc.divide(inter, denom)
        out = pa.table({"ref_id": t["id_a"], "doc_id": t["id_b"],
                        "jaccard": pc.round(jac, 6)})
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    def _sort_local(t: pa.Table) -> pa.Table:
        return t.sort_by([("ref_id", "ascending"),
                          ("doc_id", "ascending")])
    _sort_local.__name__ = "pair_sort"
    # the thresholded pair set is SMALL — one-block local sort beats
    # Ray's range-partitioned sort floor (same lesson as decontaminate)
    return (j.map_batches(_finish, batch_format="pyarrow")
            .repartition(1).map_batches(_sort_local,
                                        batch_format="pyarrow"))


def minhash_against(ds, ref_ds, text_col: str = "text",
                    id_col: str = "doc_id", num_hashes: int = 128,
                    num_bands: int = 32, shingle_k: int = 3,
                    jaccard_threshold: float = 0.7,
                    max_bucket: int = 256, verify: bool = True) -> pa.Table:
    """Cross-corpus MinHash+LSH near-duplicate candidates: new docs
    whose signature collides with an EXISTING-corpus doc in any band,
    verified with exact shingle Jaccard (``verify=True``). The LSH
    scale path whose exact counterpart is ``jaccard_against``.

    Scale shape: both corpora stream through the SAME seeded sketcher
    (signatures comparable by construction); one bucket exchange of
    signature metadata; per bucket only REF × NEW pairs emit; exact
    verification gathers shingle sketches for candidate ids only, per
    side (the corpora never materialize).

    Returns (ref_id, doc_id[, jaccard]) — one row per cross-corpus
    near-dup pair, id-sorted.
    """
    import ray

    from datavec_ray.util import dataset_to_table

    sketcher_args = (text_col, id_col, num_hashes, num_bands, shingle_k)

    def _side(tag: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                pa.field("side", pa.int8()),
                pa.array(np.full(t.num_rows, tag, np.int8)))
        f.__name__ = f"side_{tag}"
        return f

    bands_ref = ref_ds.map_batches(_MinHashBands(*sketcher_args),
                                   batch_format="pyarrow",
                                   batch_size=4096) \
        .map_batches(_side(0), batch_format="pyarrow")
    bands_new = ds.map_batches(_MinHashBands(*sketcher_args),
                               batch_format="pyarrow", batch_size=4096) \
        .map_batches(_side(1), batch_format="pyarrow")

    class _CrossBucket:
        """Per (band, band_hash) bucket: REF × NEW pairs, capped like
        _BucketPairs (an oversized bucket star-links to the smallest
        ref id instead of exploding quadratically)."""

        def __init__(self, cap: int):
            self.cap = cap
            self.__name__ = "cross_bucket_pairs"

        def __call__(self, grp: pa.Table) -> pa.Table:
            side = grp["side"].to_numpy(zero_copy_only=False)
            did = grp["doc_id"].to_numpy(zero_copy_only=False)
            ref = np.unique(did[side == 0])
            new = np.unique(did[side == 1])
            if not len(ref) or not len(new):
                return _EMPTY_PAIRS
            if len(ref) + len(new) > self.cap:
                log.warning(
                    "cross-corpus LSH bucket of %d docs exceeds "
                    "max_bucket=%d: star-linking to min ref id",
                    len(ref) + len(new), self.cap)
                return pa.table({
                    "id_a": pa.array(np.full(len(new), ref.min())),
                    "id_b": pa.array(new)})
            a = np.repeat(ref, len(new))
            b = np.tile(new, len(ref))
            return pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})

    pairs_ds = _tag_bucket_partition(bands_ref.union(bands_new),
                                     ["band", "band_hash"]) \
        .groupby("__bpart").map_groups(
            _PerBucket(_CrossBucket(max_bucket), ["band", "band_hash"],
                       _EMPTY_PAIRS),
            batch_format="pyarrow")
    ia, ib = _dedupe_pairs(dataset_to_table(pairs_ds))
    if not verify:
        return pa.table({"ref_id": pa.array(ia), "doc_id": pa.array(ib)})
    empty_out = pa.table({"ref_id": pa.array([], pa.int64()),
                          "doc_id": pa.array([], pa.int64()),
                          "jaccard": pa.array([], pa.float64())})
    if len(ia) == 0:
        return empty_out

    def _sketches(side_ds, needed: np.ndarray) -> dict:
        ref = ray.put(np.unique(needed))
        sk = dataset_to_table(side_ds.map_batches(
            _CandidateSketches, batch_format="pyarrow",
            fn_constructor_args=(ref, text_col, id_col, shingle_k),
            concurrency=(1, 8), max_restarts=0))
        return {int(i): np.asarray(s, dtype=np.uint64)
                for i, s in zip(sk["doc_id"].to_pylist(),
                                sk["shingles"].to_pylist())}

    look_a = _sketches(ref_ds, ia)
    look_b = _sketches(ds, ib)
    empty = np.empty(0, dtype=np.uint64)
    jac = np.empty(len(ia), dtype=np.float64)
    for i, (x, y) in enumerate(zip(ia, ib)):
        sa = look_a.get(int(x), empty)
        sb = look_b.get(int(y), empty)
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        jac[i] = inter / union if union else 0.0
    keep = jac >= jaccard_threshold
    return pa.table({"ref_id": pa.array(ia[keep]),
                     "doc_id": pa.array(ib[keep]),
                     "jaccard": pa.array(jac[keep])})
