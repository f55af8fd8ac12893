"""Bounded-state frequency sketches for corpus-scale reporting.

``frequent_items`` / ``frequent_tokens``: EXACT top-k heavy hitters in
two streaming passes with a shuffle bounded by ``capacity`` rows per
block — never the corpus vocabulary:

1. Candidate pass — each block counts its values vectorized (Acero)
   and keeps only those with block count > block_len / capacity. By
   pigeonhole, any value with GLOBAL frequency > N / capacity must
   exceed that threshold in at least one block, so the union of block
   candidates is a superset of every global heavy hitter (the
   Misra-Gries guarantee, applied block-wise). At most ``capacity - 1``
   candidates leave each block regardless of vocabulary size.
2. Refine pass — the deduplicated candidate set is broadcast
   (``ray.put`` once, read per task) and counted EXACTLY per block;
   one tiny groupby-sum + total-order sort yields the top k with true
   counts and a deterministic tie-break (count desc, value asc).

The result is exact whenever the k-th true count exceeds N / capacity
— the returned guarantee flag says whether that held, so callers can
re-run with a larger capacity instead of silently trusting a miss
(compare ops.textstats.top_ngrams, which is always exact but shuffles
every block's full vocabulary).
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

log = logging.getLogger(__name__)


def _tokenize(batch: pa.Table, text_col: str, sep: str) -> pa.Array:
    from datavec_ray.steps.base import combine
    lst = pc.split_pattern(pc.fill_null(combine(batch[text_col]), ""), sep)
    flat = combine(pc.list_flatten(lst))
    return flat.filter(pc.not_equal(flat, ""))


def _freq_over(ds, values_of, k: int, capacity: int):
    """Shared two-pass plan over ``values_of(batch) -> pa.Array``."""
    import ray

    from datavec_ray.util import dataset_to_table

    if capacity < 2:
        raise ValueError("capacity must be >= 2")

    def _cands(batch: pa.Table) -> pa.Table:
        v = values_of(batch)
        if len(v) == 0:
            return pa.table({"value": pa.array([], pa.string())})
        g = pa.table({"value": v}).group_by("value") \
            .aggregate([("value", "count")])
        keep = pc.greater(pc.multiply(
            g["value_count"].cast(pa.int64()), capacity), len(v))
        return pa.table({"value": g["value"].filter(keep)})

    cands = dataset_to_table(
        ds.map_batches(_cands, batch_format="pyarrow").groupby("value")
        .count())
    if cands.num_rows == 0:
        return pa.table({"value": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    cand_ref = ray.put(cands["value"].combine_chunks())

    def _exact(batch: pa.Table) -> pa.Table:
        v = values_of(batch)
        cset = ray.get(cand_ref)
        hit = v.filter(pc.is_in(v, value_set=cset))
        g = pa.table({"value": hit}).group_by("value") \
            .aggregate([("value", "count")])
        return pa.table({"value": g["value"],
                         "cnt": g["value_count"].cast(pa.int64())})

    agg = dataset_to_table(
        ds.map_batches(_exact, batch_format="pyarrow")
        .groupby("value").sum("cnt"))
    return pa.table({"value": agg["value"],
                     "cnt": agg["sum(cnt)"].cast(pa.int64())}) \
        .sort_by([("cnt", "descending"), ("value", "ascending")]) \
        .slice(0, k)


def frequent_items(ds, col: str, k: int = 25, capacity: int = 2000):
    """Exact top-k most frequent values of ``col`` (see module doc).
    Logs a warning when the k-th count is at or under N / capacity —
    the guarantee did not hold, raise capacity. N is the row count
    (an upper bound on the value-stream length when nulls exist, which
    only makes the check stricter)."""
    from datavec_ray.steps.base import combine

    def values_of(batch: pa.Table) -> pa.Array:
        return combine(batch[col]).drop_null().cast(pa.string())

    out = _freq_over(ds, values_of, k, capacity)
    _check_guarantee(out, ds.count(), capacity)
    return out


def frequent_tokens(ds, text_col: str = "text", k: int = 25,
                    capacity: int = 2000, sep: str = " "):
    """Exact top-k most frequent whitespace tokens (same ``sep``-split
    tokenization as textstats — SQL oracles reproduce it verbatim).
    The token-stream length is not tracked (it would cost a second
    tokenize pass); size ``capacity`` > total_tokens / expected_kth_count
    — for natural text the default is generous at report scales."""
    def values_of(batch: pa.Table) -> pa.Array:
        return _tokenize(batch, text_col, sep)

    return _freq_over(ds, values_of, k, capacity)


# ---------------------------------------------------------------------------
# t-digest: mergeable per-group quantile sketch with RANK-error bounds
# ---------------------------------------------------------------------------

def _td_compress(means: np.ndarray, weights: np.ndarray, seg: np.ndarray,
                 delta: int):
    """Segment-wise t-digest compression, fully vectorized across groups.

    ``means``/``weights`` are flat centroid arrays tagged with group id
    ``seg`` (non-decreasing); within each segment centroids must be
    sorted by mean. Centroids are bucketed by the k1 scale function
    k(q) = delta * (asin(2q-1)/pi + 1/2) evaluated at each centroid's
    mid-rank quantile, and adjacent centroids sharing a bucket merge by
    weighted mean — <= delta clusters per group, tighter near q=0/1
    (that is the t-digest tail-accuracy property). Returns the merged
    flat (means, weights, seg)."""
    if len(means) == 0:
        return means, weights, seg
    seg_starts = np.flatnonzero(np.r_[True, seg[1:] != seg[:-1]])
    W = np.add.reduceat(weights, seg_starts)
    cum = np.cumsum(weights)
    base = np.repeat(np.r_[0.0, cum[seg_starts[1:] - 1]],
                     np.diff(np.r_[seg_starts, len(seg)]))
    mid = (cum - base - 0.5 * weights) \
        / np.repeat(W, np.diff(np.r_[seg_starts, len(seg)]))
    mid = np.clip(mid, 0.0, 1.0)
    k = np.floor(delta * (np.arcsin(2.0 * mid - 1.0) / np.pi + 0.5))
    k = np.minimum(k, delta - 1)
    new = np.r_[True, (seg[1:] != seg[:-1]) | (k[1:] != k[:-1])]
    starts = np.flatnonzero(new)
    w2 = np.add.reduceat(weights, starts)
    m2 = np.add.reduceat(means * weights, starts) / w2
    return m2, w2, seg[starts]


def _td_quantile(m: np.ndarray, w: np.ndarray, lo: float, hi: float,
                 q: float) -> float:
    """Standard t-digest quantile read: linear interpolation between
    centroid mid-ranks, anchored at the exact group min/max."""
    W = w.sum()
    if W <= 0 or len(m) == 0:
        return float("nan")
    r = q * W
    centers = np.cumsum(w) - 0.5 * w
    if r <= centers[0]:
        return lo + (m[0] - lo) * (r / centers[0]) if centers[0] > 0 \
            else float(m[0])
    if r >= centers[-1]:
        d = W - centers[-1]
        return hi - (hi - m[-1]) * ((W - r) / d) if d > 0 else float(m[-1])
    i = int(np.searchsorted(centers, r))
    span = centers[i] - centers[i - 1]
    frac = (r - centers[i - 1]) / span if span > 0 else 0.0
    return float(m[i - 1] + (m[i] - m[i - 1]) * frac)


def tdigest_quantiles(ds, keys: Sequence[str], column: str,
                      qs: Sequence[float],
                      names: Optional[Sequence[str]] = None,
                      delta: int = 200, num_partitions: int = 32):
    """Approximate per-group quantiles via MERGEABLE t-digests
    (Dunning & Ertl, "Computing extremely accurate quantiles using
    t-digests", 2019): each block compresses each group's values to
    <= ``delta`` centroids (k1 scale function, so clusters are tiny
    near q=0 and q=1 — RELATIVE rank accuracy at the tails), ships only
    (key, centroid means[], weights[], min, max, count) partial rows,
    and one hash partition merges per-group digests by
    concat -> sort-by-mean -> re-compress.

    Scale contract vs the exact/histogram siblings:
    - ``grouped_quantile``: exact, but every RAW row crosses the
      exchange — right at report scale, wrong at 10^10 rows.
    - ``grouped_quantile_hist``: bounded shuffle, deterministic,
      SQL-mirrorable — but its error is (hi-lo)/bins of the VALUE
      range, which a single outlier can make arbitrarily bad.
    - this: bounded shuffle (groups x delta centroids), rank error
      O(1/delta) regardless of the value distribution — the right
      sketch for heavy-tailed columns. Estimates depend (within the
      rank-error bound) on block partitioning, so the query entry is
      rows-only; tests assert the rank-error bound against the exact
      quantiles under multiple blockings.

    Output: one row per key group with float64 columns ``names``
    (default ``p{q*100}``) plus ``n`` (exact non-null count). Groups
    with no non-null values are absent (as in the SQL join form).
    """
    from datavec_ray.misc import _GPART, _group_partition, _key_run_starts
    from datavec_ray.steps.base import combine

    qs = list(qs)
    names = list(names) if names else [f"p{int(round(q * 100))}" for q in qs]
    keys = list(keys)
    delta = int(delta)
    if delta < 8:
        raise ValueError("delta must be >= 8")

    def _partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch[column]))
        empty = {
            **{k: pa.array([], batch.schema.field(k).type) for k in keys},
            "__m": pa.array([], pa.list_(pa.float64())),
            "__w": pa.array([], pa.list_(pa.float64())),
            "__lo": pa.array([], pa.float64()),
            "__hi": pa.array([], pa.float64()),
            "__n": pa.array([], pa.int64()),
        }
        if batch.num_rows == 0:
            return pa.table(empty)
        g = batch.sort_by([(k, "ascending") for k in keys]
                          + [(column, "ascending")])
        starts = np.flatnonzero(_key_run_starts(g, keys))
        lens = np.diff(np.r_[starts, g.num_rows])
        vals = combine(g[column]).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        seg = np.repeat(np.arange(len(starts)), lens)
        m2, w2, s2 = _td_compress(vals, np.ones(len(vals)), seg, delta)
        offs = np.flatnonzero(np.r_[True, s2[1:] != s2[:-1]])
        take = pa.array(starts, pa.int64())
        cols = {k: combine(g[k]).take(take) for k in keys}
        cols["__m"] = pa.ListArray.from_arrays(
            pa.array(np.r_[offs, len(m2)], pa.int32()), pa.array(m2))
        cols["__w"] = pa.ListArray.from_arrays(
            pa.array(np.r_[offs, len(w2)], pa.int32()), pa.array(w2))
        cols["__lo"] = pa.array(vals[starts])
        cols["__hi"] = pa.array(vals[starts + lens - 1])
        cols["__n"] = pa.array(lens, pa.int64())
        return pa.table(cols)

    def _final(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART]).sort_by(
            [(k, "ascending") for k in keys])
        if g.num_rows == 0:
            return pa.table({
                **{k: pa.array([], g.schema.field(k).type) for k in keys},
                **{nm: pa.array([], pa.float64()) for nm in names},
                "n": pa.array([], pa.int64())})
        starts = np.flatnonzero(_key_run_starts(g, keys))
        lens = np.diff(np.r_[starts, g.num_rows])
        ml = combine(g["__m"])
        flat_m = ml.flatten().to_numpy(zero_copy_only=False)
        flat_w = combine(g["__w"]).flatten().to_numpy(zero_copy_only=False)
        row_len = np.diff(ml.offsets.to_numpy(zero_copy_only=False))
        seg = np.repeat(np.repeat(np.arange(len(starts)), lens), row_len)
        order = np.lexsort((flat_m, seg))
        m2, w2, s2 = _td_compress(flat_m[order], flat_w[order], seg[order],
                                  delta)
        lo_all = combine(g["__lo"]).to_numpy(zero_copy_only=False)
        hi_all = combine(g["__hi"]).to_numpy(zero_copy_only=False)
        n_all = combine(g["__n"]).to_numpy(zero_copy_only=False)
        take = pa.array(starts, pa.int64())
        cols = {k: combine(g[k]).take(take) for k in keys}
        lo = np.minimum.reduceat(lo_all, starts)
        hi = np.maximum.reduceat(hi_all, starts)
        outs = {nm: np.empty(len(starts)) for nm in names}
        g_starts = np.flatnonzero(np.r_[True, s2[1:] != s2[:-1]])
        g_ends = np.r_[g_starts[1:], len(s2)]
        for gi in range(len(starts)):
            sl = slice(g_starts[gi], g_ends[gi])
            for q, nm in zip(qs, names):
                outs[nm][gi] = _td_quantile(m2[sl], w2[sl],
                                            float(lo[gi]), float(hi[gi]), q)
        for nm in names:
            cols[nm] = pa.array(outs[nm])
        cols["n"] = pa.array(np.add.reduceat(n_all, starts), pa.int64())
        return pa.table(cols)

    _partial.__name__ = "tdigest_partial"
    _final.__name__ = "tdigest_merge"
    return _group_partition(
        ds.map_batches(_partial, batch_format="pyarrow"),
        keys, num_partitions) \
        .groupby(_GPART).map_groups(_final, batch_format="pyarrow")


def _check_guarantee(out: pa.Table, n_total: int, capacity: int) -> bool:
    if out.num_rows == 0:
        return True
    kth = out["cnt"][out.num_rows - 1].as_py()
    ok = kth * capacity > n_total
    if not ok:
        log.warning(
            "frequent_items: k-th count %d <= N/capacity = %.0f — "
            "top-k below that bar may be incomplete; raise capacity",
            kth, n_total / capacity)
    return ok
