"""Bounded-edit-distance fuzzy duplicate pairs (SymSpell banding).

The entity-resolution / near-identical-short-field op of a curation
pipeline (dup titles, user handles, product names) — absent from the
reference (closest: string quality + RegexReplace, see
datavec-api/transform/quality); built here the Ray-Data-first way.

Candidate generation uses Garbe's SymSpell deletion-neighborhood
guarantee: if lev(a, b) <= k, an optimal alignment's matched characters
form a string reachable from BOTH a and b by <= k deletions, so the
<=k-deletion neighborhoods intersect. We therefore bucket on deletion-
variant HASHES — never materializing variant strings: with a polynomial
rolling hash over an odd (hence invertible mod 2^64) base, the hash of
"s with position i (and j) deleted" is an O(1) expression in the
string's prefix-hash array, so ALL variants of ALL strings in a batch
come from a handful of vectorized passes over the flat byte buffer.
Hash collisions only ADD candidates (exact Levenshtein verification
removes them); equal variant strings always hash equal, so no true pair
is ever missed.

Scale shape: variants are output-sized metadata (id + uint64), one
bucket-hash shuffle co-locates them (`_tag_bucket_partition`), pairs are
emitted per PARTITION with an in-process segment scan (`_PerBucket`),
deduped by `distinct_pairs`, and verified with a batch-vectorized
Levenshtein DP (prefix-min insert-chain trick) against texts gathered
for CANDIDATE ids only (broadcast id set; memory bounded by the
candidate-pair count, the minhash-verify discipline, dedup.py:404).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datavec_ray.steps.base import combine

log = logging.getLogger(__name__)

_B = np.uint64(0x100000001B3)                       # odd → invertible mod 2^64
_BINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))


def _flat_bytes(col) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint64 byte values, int64 offsets of length n+1) for an
    Arrow string column — zero-copy views of the Arrow buffers."""
    arr = pa.chunked_array([pc.fill_null(combine(col), "")]) \
        .cast(pa.large_binary()).combine_chunks()
    off = np.frombuffer(arr.buffers()[1], np.int64)[
        arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
    flat = np.frombuffer(arr.buffers()[2] or b"", np.uint8) \
        .astype(np.uint64)[off[0]:off[-1]]
    return flat, off - off[0]


def deletion_variant_hashes(col, max_edits: int,
                            max_len: int = 256) -> tuple[np.ndarray,
                                                         np.ndarray,
                                                         np.ndarray]:
    """All <=``max_edits``-deletion variant hashes for a batch of
    strings: (variant hashes uint64 flat, source row indices int64
    flat, deleted-position int32 flat: -1 = whole string, i >= 0 =
    single deletion at byte i, -2 = double deletion). Includes the
    0-deletion (whole-string) hash for every row. Rows longer than
    ``max_len`` bytes contribute only their whole-string hash (logged)
    — edit distance over long documents is the wrong tool (use
    minhash/simhash); exact-equality pairs still pair.
    """
    if max_edits not in (1, 2):
        raise ValueError("max_edits must be 1 or 2")
    flat, off = _flat_bytes(col)
    n = len(off) - 1
    lens = np.diff(off)
    row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    long_rows = lens > max_len
    if long_rows.any():
        log.warning("fuzzy: %d rows longer than %d bytes get whole-"
                    "string variants only", int(long_rows.sum()), max_len)
    with np.errstate(over="ignore"):
        pos = (np.arange(len(flat), dtype=np.int64)
               - np.repeat(off[:-1], lens))
        maxlen = int(lens.max()) if n else 0
        pw = np.ones(max(maxlen, 1), dtype=np.uint64)
        for j in range(1, maxlen):
            pw[j] = pw[j - 1] * _B
        term = flat * pw[pos]
        cs = np.cumsum(term, dtype=np.uint64)
        seg_base = np.where(off[:-1] > 0, cs[off[:-1] - 1], np.uint64(0))
        p_next = cs - np.repeat(seg_base, lens)      # prefix incl. this char
        p_cur = p_next - term                        # prefix excl. this char
        full = np.where(lens > 0, p_next[np.maximum(off[1:] - 1, 0)],
                        np.uint64(0))                # whole-string hash
        full_flat = np.repeat(full, lens)
        outs_h = [full]                              # 0 deletions
        outs_r = [np.arange(n, dtype=np.int64)]
        outs_p = [np.full(n, -1, dtype=np.int32)]
        ok = ~long_rows[row_of]
        # 1 deletion: one vectorized expression per flat char
        h1 = p_cur + (full_flat - p_next) * _BINV
        outs_h.append(h1[ok])
        outs_r.append(row_of[ok])
        outs_p.append(pos[ok].astype(np.int32))
        if max_edits == 2:
            binv2 = _BINV * _BINV
            for d in range(1, maxlen):
                g = np.flatnonzero((pos + d < lens[row_of]) & ok)
                if len(g) == 0:
                    continue
                g2 = g + d
                h2 = (p_cur[g] + (p_cur[g2] - p_next[g]) * _BINV
                      + (full_flat[g2] - p_next[g2]) * binv2)
                outs_h.append(h2)
                outs_r.append(row_of[g])
                outs_p.append(np.full(len(g), -2, dtype=np.int32))
    return (np.concatenate(outs_h), np.concatenate(outs_r),
            np.concatenate(outs_p))


def levenshtein_batch(a_col, b_col) -> np.ndarray:
    """Exact Levenshtein distances for N string pairs, vectorized
    ACROSS the pair axis: the DP advances one row of all pairs at once;
    the insert chain (new[j] = min(cand[j], new[j-1]+1)) resolves as
    j + minimum.accumulate(cand - j) — no Python per pair."""
    fa, offa = _flat_bytes(a_col)
    fb, offb = _flat_bytes(b_col)
    la, lb = np.diff(offa), np.diff(offb)
    N = len(la)
    if N == 0:
        return np.empty(0, dtype=np.int64)
    ma, mb = int(la.max()), int(lb.max())
    A = np.zeros((N, max(ma, 1)), dtype=np.uint8)
    B = np.zeros((N, max(mb, 1)), dtype=np.uint8)
    A[np.repeat(np.arange(N), la),
      np.arange(len(fa)) - np.repeat(offa[:-1], la)] = fa
    B[np.repeat(np.arange(N), lb),
      np.arange(len(fb)) - np.repeat(offb[:-1], lb)] = fb
    ar = np.arange(mb + 1, dtype=np.int64)
    prev = np.broadcast_to(ar, (N, mb + 1)).copy()
    res = np.empty(N, dtype=np.int64)
    done0 = la == 0
    res[done0] = lb[done0]
    for i in range(1, ma + 1):
        cost = (A[:, i - 1:i] != B).astype(np.int64)
        cand = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)
        row = np.concatenate([(prev[:, :1] + 1), cand], axis=1)
        row = ar + np.minimum.accumulate(row - ar, axis=1)
        hit = la == i
        if hit.any():
            res[hit] = row[hit, lb[hit]]
        prev = row
    return res


class _VariantEmit:
    def __init__(self, text_col: str, id_col: str, max_edits: int,
                 max_len: int):
        self.text_col, self.id_col = text_col, id_col
        self.max_edits, self.max_len = max_edits, max_len
        self.__name__ = "fuzzy_variants"

    def __call__(self, batch: pa.Table) -> pa.Table:
        vh, rows, posn = deletion_variant_hashes(
            batch[self.text_col], self.max_edits, self.max_len)
        ids = combine(batch[self.id_col]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "vh": pa.array(vh.view(np.int64)),
            "doc_id": pa.array(ids[rows]),
            "pos": pa.array(posn),
        })


class _VariantPairs:
    """Per-bucket candidate pairs.

    ``max_edits == 1`` applies the position-compatibility refinement:
    within a bucket (equal variant hash), a pair is admissible iff the
    two deletion positions are EQUAL (a substitution: del_i(a) ==
    del_i(b) with a != b at i → lev exactly 1) or either side is the
    whole string (an indel: del_i(a) == b → lev 1; full == full → lev
    0). This is complete for lev <= 1 — every true pair falls in one of
    those three cases — and prunes the cross-position del×del pairs,
    which are lev-2 candidates (on near-identical corpora like
    serial-number-style keys they otherwise dominate the bucket
    quadratically). ``max_edits == 2`` keeps all-pairs generation.

    Buckets past ``max_bucket`` unique ids are logged and emitted in
    full anyway by default (exactness over silence) unless ``cap=True``,
    which star-links to the min id (connected-components-preserving,
    NOT pair-exact)."""

    def __init__(self, max_bucket: int = 4096, cap: bool = False,
                 max_edits: int = 2):
        self.max_bucket, self.cap = max_bucket, cap
        self.max_edits = max_edits
        self.__name__ = "fuzzy_bucket_pairs"

    @staticmethod
    def _allpairs(ids: np.ndarray) -> pa.Table:
        from datavec_ray.ops.dedup import _pair_indices
        ia, ib = _pair_indices(ids)
        return pa.table({"id_a": pa.array(ia), "id_b": pa.array(ib)})

    def _pairs_k1(self, group: pa.Table) -> pa.Table:
        from datavec_ray.ops.dedup import _EMPTY_PAIRS, _pair_indices
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        posn = group["pos"].to_numpy(zero_copy_only=False)
        fulls = np.unique(ids[posn == -1])
        outs_a, outs_b = [], []
        # full × full (exact-equal strings) + full × deletion (indels)
        dels = np.unique(ids[posn >= 0])
        if len(fulls) >= 2:
            ia, ib = _pair_indices(fulls)
            outs_a.append(ia)
            outs_b.append(ib)
        if len(fulls) and len(dels):
            fa = np.repeat(fulls, len(dels))
            da = np.tile(dels, len(fulls))
            m = fa != da
            outs_a.append(np.minimum(fa[m], da[m]))
            outs_b.append(np.maximum(fa[m], da[m]))
        # del × del, SAME position only (substitutions)
        dmask = posn >= 0
        if dmask.any():
            dp, di = posn[dmask], ids[dmask]
            order = np.lexsort((di, dp))
            dp, di = dp[order], di[order]
            new = np.ones(len(dp), dtype=bool)
            new[1:] = dp[1:] != dp[:-1]
            starts = np.flatnonzero(new)
            ends = np.append(starts[1:], len(dp))
            for s, e in zip(starts, ends):
                u = di[s:e][np.concatenate(
                    ([True], di[s + 1:e] != di[s:e - 1]))] \
                    if e - s > 1 else di[s:e]
                if len(u) >= 2:
                    ia, ib = _pair_indices(u)
                    outs_a.append(ia)
                    outs_b.append(ib)
        if not outs_a:
            return _EMPTY_PAIRS
        return pa.table({"id_a": pa.array(np.concatenate(outs_a)),
                         "id_b": pa.array(np.concatenate(outs_b))})

    def __call__(self, group: pa.Table) -> pa.Table:
        from datavec_ray.ops.dedup import _EMPTY_PAIRS
        uq = np.unique(group["doc_id"].to_numpy(zero_copy_only=False))
        if len(uq) < 2:
            return _EMPTY_PAIRS
        if len(uq) > self.max_bucket:
            if self.cap:
                log.warning("fuzzy: bucket of %d ids star-linked (cap)",
                            len(uq))
                return pa.table({
                    "id_a": pa.array(np.full(len(uq) - 1, uq[0])),
                    "id_b": pa.array(uq[1:])})
            log.warning("fuzzy: oversized bucket of %d ids emitted in "
                        "full", len(uq))
        if self.max_edits == 1:
            return self._pairs_k1(group)
        return self._allpairs(uq)


class _VerifyPairs:
    """Attach candidate texts (broadcast sorted-id arrays of candidate
    ids only, looked up by searchsorted — no Python per pair) and keep
    pairs with exact Levenshtein <= k."""

    def __init__(self, texts_ref, max_edits: int):
        import ray
        ids, txts = ray.get(texts_ref)
        order = np.argsort(ids)
        self.ids = ids[order]
        self.txts = txts.take(pa.array(order, pa.int64()))
        self.max_edits = max_edits
        self.__name__ = "fuzzy_verify"

    def _lookup(self, want: np.ndarray) -> pa.Array:
        idx = np.searchsorted(self.ids, want)
        idx[idx == len(self.ids)] = 0
        hit = self.ids[idx] == want
        out = self.txts.take(pa.array(np.where(hit, idx, 0), pa.int64()))
        if not hit.all():
            out = pc.if_else(pa.array(hit), out, "")
        return out

    def __call__(self, pairs: pa.Table) -> pa.Table:
        a = pairs["id_a"].to_numpy(zero_copy_only=False)
        b = pairs["id_b"].to_numpy(zero_copy_only=False)
        dist = levenshtein_batch(self._lookup(a), self._lookup(b))
        keep = dist <= self.max_edits
        return pa.table({"id_a": pa.array(a[keep]),
                         "id_b": pa.array(b[keep]),
                         "dist": pa.array(dist[keep])})


def fuzzy_dup_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                    max_edits: int = 1, num_partitions: int = 64,
                    verify: bool = True, max_bucket: int = 4096,
                    cap_buckets: bool = False,
                    max_len: int = 256) -> pa.Table:
    """All pairs (id_a < id_b) with byte-level Levenshtein distance
    <= ``max_edits``, plus the exact distance — EXACT output (the
    SymSpell neighborhood is a complete candidate generator and every
    candidate is verified). ``verify=False`` returns raw candidates.

    Texts gathered for verification are bounded by the candidate count
    (broadcast needed-id set, column-pruned corpus pass) — the corpus
    itself never moves.
    """
    import ray

    from datavec_ray.ops.dedup import (_PerBucket, _EMPTY_PAIRS,
                                       _tag_bucket_partition,
                                       distinct_pairs)
    from datavec_ray.util import dataset_to_table

    variants = ds.map_batches(
        _VariantEmit(text_col, id_col, max_edits, max_len),
        batch_format="pyarrow")
    tagged = _tag_bucket_partition(variants, ["vh"], num_partitions)
    pairs = tagged.groupby("__bpart").map_groups(
        _PerBucket(_VariantPairs(max_bucket, cap_buckets, max_edits),
                   ["vh"], _EMPTY_PAIRS),
        batch_format="pyarrow")
    cand = dataset_to_table(distinct_pairs(pairs))
    if not verify or cand.num_rows == 0:
        return cand.sort_by([("id_a", "ascending"), ("id_b", "ascending")])
    needed = np.unique(np.concatenate([
        cand["id_a"].to_numpy(zero_copy_only=False),
        cand["id_b"].to_numpy(zero_copy_only=False)])).astype(np.int64)
    needed_ref = ray.put(needed)

    def gather(batch: pa.Table) -> pa.Table:
        import ray as _ray
        want = _ray.get(needed_ref)
        ids = combine(batch[id_col]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = np.isin(ids, want)
        sub = batch.filter(pa.array(m))
        return pa.table({"id": pa.array(ids[m]),
                         "txt": pc.fill_null(
                             pc.cast(combine(sub[text_col]), pa.string()),
                             "")})

    tex = dataset_to_table(ds.map_batches(gather, batch_format="pyarrow"))
    texts_ref = ray.put((tex["id"].to_numpy(zero_copy_only=False),
                         combine(tex["txt"])))
    # slice candidates into blocks driver-side so the verify DP
    # parallelizes (from_arrow of one table is one block = one task)
    step = 20_000
    chunks = [cand.slice(i, step) for i in range(0, cand.num_rows, step)]
    out = ray.data.from_arrow(chunks).map_batches(
        _VerifyPairs(texts_ref, max_edits), batch_format="pyarrow",
        concurrency=min(16, len(chunks)))
    return dataset_to_table(out).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")])
