"""Nested sequence representation: whole sequence = one row.

SURVEY.md §1.2 representation (b): a DataVec *sequence*
(List<List<Writable>>) as a single row with ``pa.list_(struct)`` step
columns — the exact shape the reference's SequenceRecord holds in
memory. The flat representation (GroupedSequence) is the default for
wide work; packing is for sinks/models that want one row per
conversation (e.g. exporting whole transcripts for training).

pack_sequences: groupby(keys) → one row per key with a `steps`
list<struct> column ordered by the comparator. unpack_sequences: the
inverse explode. Round-trip tested.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

from datavec_ray.steps.base import combine


def pack_table(tbl: pa.Table, keys: Sequence[str], order_by: Sequence[str],
               steps_col: str = "steps") -> pa.Table:
    """One partition/group table → packed rows (vectorized: one sort +
    run-length offsets; no per-group Python)."""
    keys, order_by = list(keys), list(order_by)
    if tbl.num_rows == 0:
        step_fields = [f for f in tbl.schema if f.name not in keys]
        out_schema = pa.schema(
            [tbl.schema.field(k) for k in keys]
            + [pa.field(steps_col, pa.list_(pa.struct(step_fields)))])
        return out_schema.empty_table()
    tbl = tbl.sort_by([(k, "ascending") for k in keys]
                      + [(c, "ascending") for c in order_by])
    n = tbl.num_rows
    # run boundaries over the key columns
    same = np.ones(n - 1, dtype=bool) if n > 1 else np.zeros(0, dtype=bool)
    for k in keys:
        col = combine(tbl[k])
        import pyarrow.compute as pc
        eq = pc.equal(col.slice(0, n - 1), col.slice(1)).to_numpy(
            zero_copy_only=False) if n > 1 else np.zeros(0, dtype=bool)
        same &= eq.astype(bool)
    starts = np.concatenate([[0], np.nonzero(~same)[0] + 1]) if n > 1 \
        else np.array([0])
    offsets = np.concatenate([starts, [n]]).astype(np.int32)
    step_cols = [f for f in tbl.schema if f.name not in keys]
    struct_arr = pa.StructArray.from_arrays(
        [combine(tbl[f.name]) for f in step_cols],
        fields=list(step_cols))
    steps = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct_arr)
    head = tbl.take(pa.array(starts, pa.int64())).select(keys)
    return head.append_column(pa.field(steps_col, steps.type), steps)


def unpack_table(tbl: pa.Table, steps_col: str = "steps") -> pa.Table:
    """Packed rows → flat rows (ConvertFromSequence for the nested form)."""
    steps = combine(tbl[steps_col])
    counts = np.diff(np.asarray(steps.offsets))
    keys = [c for c in tbl.column_names if c != steps_col]
    row_of = np.repeat(np.arange(tbl.num_rows), counts)
    out = tbl.select(keys).take(pa.array(row_of, pa.int64()))
    flat = steps.flatten()
    for field in flat.type:
        out = out.append_column(pa.field(field.name, field.type),
                                flat.field(field.name))
    return out


def pack_sequences(ds, keys: Sequence[str], order_by: Sequence[str],
                   steps_col: str = "steps", num_partitions: int = 32):
    """Distributed pack: hash-partition on keys, vectorized pack per
    partition (one shuffle, group-count-independent)."""
    from datavec_ray.hll import hash64

    keys = list(keys)

    def add_part(batch: pa.Table) -> pa.Table:
        h = hash64(combine(batch[keys[0]]))
        for k in keys[1:]:
            h = h ^ (hash64(combine(batch[k])) * np.uint64(0x9E3779B97F4A7C15))
        return batch.append_column(
            pa.field("__part", pa.int64()),
            pa.array((h % np.uint64(num_partitions)).astype(np.int64)))

    def pack_part(group: pa.Table) -> pa.Table:
        return pack_table(group.drop_columns(["__part"]), keys, order_by,
                          steps_col)

    pack_part.__name__ = "pack_sequences_partition"
    return (ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
            .groupby("__part").map_groups(pack_part, batch_format="pyarrow"))


def unpack_sequences(ds, steps_col: str = "steps"):
    return ds.map_batches(lambda b: unpack_table(b, steps_col),
                          batch_format="pyarrow", batch_size=None)
