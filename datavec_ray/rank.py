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
        refs = mat.to_arrow_refs()

        @ray.remote
        def _count(block: pa.Table) -> int:
            return block.num_rows

        @ray.remote
        def _with_rank(block: pa.Table, offset: int, name: str) -> pa.Table:
            ranks = pa.array(np.arange(offset, offset + block.num_rows),
                             type=pa.int64())
            return block.append_column(pa.field(name, pa.int64()), ranks)

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
