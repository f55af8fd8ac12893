"""Distributed multi-column set operations: DISTINCT / UNION /
INTERSECT / EXCEPT with ANSI-SQL set semantics (result rows are
distinct; NULLs compare equal, as in SQL DISTINCT).

The reference has no set operators at all (SURVEY.md §2.13 "Set ops /
dedup: absent") — provided first-class because corpus curation
constantly needs them (held-out split exclusion = EXCEPT, cross-snapshot
overlap = INTERSECT, shard merge = UNION DISTINCT).

Shuffle discipline (same as exact_dedup): a 64-bit row hash over all
compared columns buckets rows into P partitions — ONE groupby shuffle of
P groups, never one group per row value. A map-side combiner first
reduces each batch to its distinct rows (with a per-side presence
bitmask), so shuffle volume is bounded by per-batch distinct rows, not
input rows. Within a partition, resolution is EXACT: rows are sorted by
the real column values and adjacency-compared (hash only routes; equal
hashes with different values are still distinguished), so there is no
collision failure mode.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datavec_ray.hll import hash64
from datavec_ray.steps.base import combine

_POLY = np.uint64(0x100000001B3)      # FNV-ish column combiner
_NULL_MARK = np.uint64(0x9E3779B97F4A7C15)

_SIDE = "__setop_side"
_PART = "__setop_part"


def _row_hash(batch: pa.Table, columns: Sequence[str]) -> np.ndarray:
    """Order-sensitive combine of per-column 64-bit value hashes; nulls
    hash to a fixed marker so SQL null-equality semantics hold."""
    h = np.zeros(batch.num_rows, dtype=np.uint64)
    for c in columns:
        col = combine(batch[c])
        ch = hash64(col).astype(np.uint64)
        nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
        if nulls.any():
            ch = np.where(nulls, _NULL_MARK, ch)
        h = h * _POLY + ch
        h ^= h >> np.uint64(29)
    return h


def _runs_equal(tbl: pa.Table, columns: Sequence[str]) -> np.ndarray:
    """Boolean array marking the FIRST row of each run of value-equal
    consecutive rows (tbl must already be sorted by ``columns``); null
    equals null."""
    n = tbl.num_rows
    first = np.ones(n, dtype=bool)
    if n <= 1:
        return first
    same = np.ones(n - 1, dtype=bool)
    for c in columns:
        col = combine(tbl[c])
        a, b = col.slice(0, n - 1), col.slice(1)
        eq = pc.fill_null(pc.equal(a, b), False)
        both_null = pc.and_(pc.is_null(a), pc.is_null(b))
        same &= pc.or_(eq, both_null).to_numpy(zero_copy_only=False)
    first[1:] = ~same
    return first


class _TagHashDistinct:
    """Map-side combiner: per-batch distinct rows + side bitmask +
    hash partition id."""

    def __init__(self, columns: Sequence[str], side: int, num_partitions: int):
        self.columns, self.side, self.P = list(columns), side, num_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.select(self.columns)
        h = _row_hash(batch, self.columns)
        batch = batch.append_column(pa.field("__h", pa.uint64()), pa.array(h))
        batch = batch.sort_by([("__h", "ascending")]
                              + [(c, "ascending") for c in self.columns])
        batch = batch.filter(pa.array(_runs_equal(batch, self.columns)))
        hh = combine(batch["__h"]).to_numpy(zero_copy_only=False)
        batch = batch.append_column(
            pa.field(_SIDE, pa.int8()),
            pa.array(np.full(batch.num_rows, self.side, dtype=np.int8)))
        return batch.append_column(
            pa.field(_PART, pa.int64()),
            pa.array((hh % np.uint64(self.P)).astype(np.int64)))


class _Resolve:
    """Per-partition exact resolution: sort by values, OR the side masks
    per distinct row, keep rows whose mask satisfies the operation."""

    def __init__(self, columns: Sequence[str], want: Optional[int]):
        self.columns = list(columns)
        self.want = want          # None = any (union/distinct)
        self.__name__ = "setop_resolve"

    def __call__(self, group: pa.Table) -> pa.Table:
        g = group.sort_by([(c, "ascending") for c in self.columns])
        first = _runs_equal(g, self.columns)
        starts = np.flatnonzero(first)
        sides = combine(g[_SIDE]).to_numpy(zero_copy_only=False)
        mask = np.bitwise_or.reduceat(sides, starts) if len(starts) \
            else np.zeros(0, dtype=np.int8)
        keep = starts if self.want is None else starts[mask == self.want]
        return g.take(pa.array(keep, type=pa.int64())).drop_columns(
            ["__h", _SIDE, _PART])


def _tagged(ds, columns, side, num_partitions):
    from datavec_ray.config import partitions_override
    num_partitions = partitions_override(num_partitions)
    return ds.map_batches(_TagHashDistinct(columns, side, num_partitions),
                          batch_format="pyarrow")


def _resolve(tagged, columns, want):
    return tagged.groupby(_PART).map_groups(
        _Resolve(columns, want), batch_format="pyarrow")


def _columns_of(a, b, columns):
    ca = a.schema().base_schema.names
    if columns is not None:
        return list(columns)
    if b is not None and list(ca) != list(b.schema().base_schema.names):
        raise ValueError(
            f"schemas differ: {ca} vs {b.schema().base_schema.names}; "
            "pass columns= explicitly")
    return list(ca)


def distinct_rows(ds, columns: Optional[Sequence[str]] = None,
                  num_partitions: int = 32):
    """SQL ``SELECT DISTINCT columns`` (all columns when omitted)."""
    cols = columns if columns is not None \
        else ds.schema().base_schema.names
    return _resolve(_tagged(ds, cols, 1, num_partitions), cols, None)


def union_distinct(a, b, columns: Optional[Sequence[str]] = None,
                   num_partitions: int = 32):
    """SQL ``a UNION b`` (distinct rows of either side)."""
    cols = _columns_of(a, b, columns)
    t = _tagged(a, cols, 1, num_partitions).union(
        _tagged(b, cols, 2, num_partitions))
    return _resolve(t, cols, None)


def intersect_rows(a, b, columns: Optional[Sequence[str]] = None,
                   num_partitions: int = 32):
    """SQL ``a INTERSECT b`` (distinct rows present in both sides)."""
    cols = _columns_of(a, b, columns)
    t = _tagged(a, cols, 1, num_partitions).union(
        _tagged(b, cols, 2, num_partitions))
    return _resolve(t, cols, 3)


def except_rows(a, b, columns: Optional[Sequence[str]] = None,
                num_partitions: int = 32):
    """SQL ``a EXCEPT b`` (distinct rows of ``a`` absent from ``b``)."""
    cols = _columns_of(a, b, columns)
    t = _tagged(a, cols, 1, num_partitions).union(
        _tagged(b, cols, 2, num_partitions))
    return _resolve(t, cols, 1)


class _TagSides:
    """Map-side combiner for the one-scan path: the batch already
    carries its side assignment; distinct is per (row value, side)."""

    def __init__(self, columns: Sequence[str], side_col: str,
                 num_partitions: int):
        self.columns, self.side_col, self.P = \
            list(columns), side_col, num_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        side = combine(batch[self.side_col]).cast(pa.int8())
        batch = batch.select(self.columns).append_column(
            pa.field(_SIDE, pa.int8()), side)
        batch = batch.filter(pc.greater(batch[_SIDE], 0))
        h = _row_hash(batch, self.columns)
        batch = batch.append_column(pa.field("__h", pa.uint64()),
                                    pa.array(h))
        batch = batch.sort_by(
            [("__h", "ascending")]
            + [(c, "ascending") for c in self.columns]
            + [(_SIDE, "ascending")])
        batch = batch.filter(pa.array(
            _runs_equal(batch, self.columns + [_SIDE])))
        hh = combine(batch["__h"]).to_numpy(zero_copy_only=False)
        return batch.append_column(
            pa.field(_PART, pa.int64()),
            pa.array((hh % np.uint64(self.P)).astype(np.int64)))


def setop_with_sides(ds, side_col: str, op: str,
                     columns: Optional[Sequence[str]] = None,
                     num_partitions: int = 32):
    """ONE-SCAN set operation: when both operands are filters of the
    same table, building them as two Datasets scans the source twice.
    Instead, compute a per-row side assignment upstream (``side_col``
    int8: 1 = left only, 2 = right only, 3 = both, 0 = neither) in the
    same map that reads the batch — one scan, the same single
    hash-partition exchange, identical exact resolution.

    ``op``: 'except' (left \\ right), 'intersect', 'union'/'distinct'.
    """
    want = {"union": None, "distinct": None,
            "intersect": 3, "except": 1}[op]
    cols = list(columns) if columns is not None else \
        [c for c in ds.schema().base_schema.names if c != side_col]
    tagged = ds.map_batches(_TagSides(cols, side_col, num_partitions),
                            batch_format="pyarrow")
    return _resolve(tagged, cols, want)
