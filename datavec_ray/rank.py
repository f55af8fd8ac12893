"""CalculateSortedRank — global sort + 0-based rank column. SURVEY.md §2.13.

Parity target: ``transform/rank/CalculateSortedRank.java:53`` — sort the
whole dataset on one column with a comparator, append a Long ``rank``
column 0..n-1. Spark executes it as sortByKey + zipWithIndex
(``SparkTransformExecutor.java:292-311``) — a range-partition shuffle
plus a cheap metadata pass for the per-partition offsets.

Ray-Data-first execution mirrors that exactly: ``ds.sort`` (range
shuffle), then a metadata-only pass over the sorted blocks to compute
per-block row-count prefix sums, then a per-block rank append — no
global materialization on the driver; blocks stay in the object store.
Ties: extra ``order_by`` columns make the order total (the reference's
tie order is arbitrary — pass a unique tiebreak column for determinism).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import pyarrow as pa

from datavec_ray.registry import register
from datavec_ray.schema import ColumnMeta, Schema
from datavec_ray.steps.base import WideStep


@register("step")
class CalculateSortedRank(WideStep):
    def __init__(self, sort_columns: Sequence[str] | str,
                 rank_column: str = "rank", descending: bool = False):
        self.sort_columns = [sort_columns] if isinstance(sort_columns, str) \
            else list(sort_columns)
        self.rank_column = rank_column
        self.descending = descending

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(*self.sort_columns)
        return schema.with_column(self.rank_column, pa.int64(), ColumnMeta("Long"))

    def apply_dataset(self, ds):
        import ray

        sorted_ds = ds.sort(self.sort_columns, descending=self.descending)
        # zipWithIndex: block sizes → prefix sums → per-block rank append.
        mat = sorted_ds.materialize()

        @ray.remote
        def _count(block: pa.Table) -> int:
            return block.num_rows

        @ray.remote
        def _with_rank(block: pa.Table, offset: int, name: str) -> pa.Table:
            ranks = pa.array(np.arange(offset, offset + block.num_rows),
                             type=pa.int64())
            return block.append_column(pa.field(name, pa.int64()), ranks)

        try:
            # block counts ride the bundle metadata — no extra pass, and
            # no to_arrow_refs (its schema fetch can re-run the plan)
            refs, counts = [], []
            for bundle in mat.iter_internal_ref_bundles():
                for ref, meta in bundle.blocks:
                    refs.append(ref)
                    counts.append(meta.num_rows)
            if any(c is None for c in counts):
                counts = ray.get([_count.remote(r) for r in refs])
        except AttributeError:                   # Ray internals moved
            refs = mat.to_arrow_refs()
            counts = ray.get([_count.remote(r) for r in refs])
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]) if counts else []
        out_refs = [_with_rank.remote(r, int(off), self.rank_column)
                    for r, off in zip(refs, offsets)]
        import ray.data as rd
        return rd.from_arrow_refs(out_refs)

    def apply_local(self, table: pa.Table) -> pa.Table:
        order = "descending" if self.descending else "ascending"
        out = table.sort_by([(c, order) for c in self.sort_columns])
        return out.append_column(
            pa.field(self.rank_column, pa.int64()),
            pa.array(np.arange(out.num_rows), type=pa.int64()))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "CalculateSortedRank", "sort_columns": self.sort_columns,
                "rank_column": self.rank_column, "descending": self.descending}


def grouped_topk(ds, keys, order_col: str, k: int, descending: bool = True,
                 tiebreak=None):
    """Keep the top-k rows per key group, ordered by `order_col`
    (descending=True keeps the largest) — the curation primitive behind
    "best N documents per domain/source".

    Shuffle discipline: a per-batch COMBINER first prunes every batch to
    at most k rows per key present in that batch (one vectorized sort +
    segmented cumcount, no Python loop), so the groupby that follows
    moves at most k rows per (key, upstream batch) instead of the whole
    table; the per-group finalizer re-applies the same top-k. With B
    batches the shuffle carries <= k*B rows per key regardless of skew.

    `tiebreak` columns (default: none) make the order total — pass a
    unique id for deterministic output.
    """
    import numpy as np

    key_list = [keys] if isinstance(keys, str) else list(keys)
    tb = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak or [])
    order = "descending" if descending else "ascending"
    sort_spec = ([(c, "ascending") for c in key_list]
                 + [(order_col, order)] + [(c, "ascending") for c in tb])

    def _prune(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        s = batch.sort_by(sort_spec)
        # segmented cumcount over the (already grouped) key run-lengths
        import pyarrow.compute as pc
        change = np.zeros(s.num_rows, dtype=bool)
        for c in key_list:
            arr = s[c].combine_chunks()
            ne = pc.not_equal(arr.slice(1), arr.slice(0, len(arr) - 1))
            change[1:] |= pc.fill_null(ne, True).to_numpy(zero_copy_only=False)
        idx = np.arange(s.num_rows)
        seg_start = np.maximum.accumulate(np.where(change, idx, 0))
        seg_start[0] = 0
        keep = (idx - seg_start) < k
        return s.filter(pa.array(keep))

    class _Final:
        def __init__(self):
            self.__name__ = "grouped_topk_final"

        def __call__(self, group: pa.Table) -> pa.Table:
            return group.sort_by(sort_spec).slice(0, k)

    pruned = ds.map_batches(_prune, batch_format="pyarrow")
    return pruned.groupby(key_list[0] if len(key_list) == 1 else key_list) \
                 .map_groups(_Final(), batch_format="pyarrow")
