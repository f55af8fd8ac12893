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
