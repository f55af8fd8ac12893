"""Equi-join. SURVEY.md §2.12.

Parity target: ``transform/join/Join.java:47-49`` — Inner / LeftOuter /
RightOuter / FullOuter multi-column equi-join; output schema = left
columns + right-minus-key columns; the missing side null-filled with
keys recovered from the present side (``Join.java:181-265``). Spark
executes it as a cogroup shuffle + per-key cartesian emit
(``SparkTransformExecutor.java:332-354``).

Ray-Data-first execution:
- both sides large → ``Dataset.join`` (Ray's hash-partitioned shuffle
  join, the cogroup equivalent), ``num_partitions`` sized to the input;
- small right side (dimension table) → broadcast hash join: the right
  table is ``ray.put`` once and each map task merges per batch — no
  shuffle at all (preferred at 100 TB for dim tables).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import pyarrow as pa

from datavec_ray.registry import register
from datavec_ray.schema import Schema
from datavec_ray.steps.base import WideStep

JOIN_TYPES = {"Inner": "inner", "LeftOuter": "left_outer",
              "RightOuter": "right_outer", "FullOuter": "full_outer"}


def _join_local(left: pa.Table, right: pa.Table, keys: list[str],
                right_keys: list[str], how: str) -> pa.Table:
    how_pa = {"Inner": "inner", "LeftOuter": "left outer",
              "RightOuter": "right outer", "FullOuter": "full outer"}[how]
    out = left.join(right, keys=keys, right_keys=right_keys, join_type=how_pa)
    return out


@register("step")
class JoinStep(WideStep):
    """Join the pipeline's dataset (left) with another dataset (right).

    ``right`` is bound at construction (a pyarrow Table, a ray Dataset, or
    a callable returning either). ``broadcast=True`` uses the broadcast
    hash join (right side must fit in worker memory).
    """

    # below this many right-side rows, a broadcast hash join beats the
    # shuffle join's fixed per-partition cost (measured: Dataset.join has
    # a 2-5 s floor at any size on this Ray version)
    AUTO_BROADCAST_ROWS = 2_000_000

    def __init__(self, right, keys: Sequence[str],
                 right_keys: Optional[Sequence[str]] = None,
                 join_type: str = "Inner",
                 broadcast: Optional[bool] = None,
                 num_partitions: int = 32):
        if join_type not in JOIN_TYPES:
            raise ValueError(f"join_type must be one of {sorted(JOIN_TYPES)}")
        self.right = right
        self.keys = list(keys)
        self.right_keys = list(right_keys) if right_keys else list(keys)
        self.join_type = join_type
        self.broadcast = broadcast
        self.num_partitions = num_partitions

    # -- helpers -------------------------------------------------------------
    def _resolved_right(self):
        """Resolve the right side exactly once per JoinStep instance.

        A callable right side is invoked once; a Ray Dataset is
        materialized once (spill-safe: blocks pin in the object store)
        so that count / table conversion / join never re-execute it.
        """
        r = getattr(self, "_right_cache", None)
        if r is None:
            r = self.right() if callable(self.right) else self.right
            if not isinstance(r, pa.Table):
                r = r.materialize()
            self._right_cache = r
        return r

    def _right_table(self) -> pa.Table:
        r = self._resolved_right()
        if isinstance(r, pa.Table):
            return r
        from datavec_ray.util import dataset_to_table
        return dataset_to_table(r)  # ray Dataset → Table (small side only)

    def _right_dataset(self):
        import ray.data as rd
        r = self._resolved_right()
        if isinstance(r, pa.Table):
            return rd.from_arrow(r)
        return r

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(*self.keys)
        r = self.right() if callable(self.right) else self.right
        r_schema = Schema(r.schema if isinstance(r, pa.Table)
                          else r.schema().base_schema)
        r_schema.require(*self.right_keys)
        out = schema
        for n in r_schema.names:
            if n in self.right_keys:
                continue
            name = n if not out.has(n) else f"{n}_r"
            out = out.with_column(name, r_schema.type_of(n), r_schema.meta_of(n))
        return out

    # -- execution -----------------------------------------------------------
    def _should_broadcast(self) -> bool:
        if self.broadcast is not None:
            return self.broadcast
        if self.join_type not in ("Inner", "LeftOuter"):
            return False  # right/full outer need the shuffle join
        r = self._resolved_right()
        try:
            n = r.num_rows if isinstance(r, pa.Table) else r.count()
        except Exception:  # noqa: BLE001
            return False
        return n <= self.AUTO_BROADCAST_ROWS

    def apply_dataset(self, ds):
        if self._should_broadcast():
            return self._broadcast_join(ds)
        right_ds = self._right_dataset()
        return ds.join(right_ds, join_type=JOIN_TYPES[self.join_type],
                       num_partitions=self.num_partitions,
                       on=tuple(self.keys), right_on=tuple(self.right_keys),
                       right_suffix="_r")

    def _suffixed_right(self, left_names) -> pa.Table:
        """Right table with colliding non-key columns renamed to ``{n}_r``,
        matching output_schema's contract and the shuffle path's
        ``right_suffix='_r'``."""
        right = self._right_table()
        renames = {}
        for n in right.column_names:
            if n not in self.right_keys and n in left_names:
                renames[n] = f"{n}_r"
        if renames:
            right = right.rename_columns(
                [renames.get(n, n) for n in right.column_names])
        return right

    def _broadcast_join(self, ds):
        """ray.put the right table once; pyarrow hash-join per batch in map
        tasks. Only Inner / LeftOuter make sense broadcast-side-right."""
        import ray
        if self.join_type not in ("Inner", "LeftOuter"):
            raise ValueError("broadcast join supports Inner/LeftOuter only")
        left_schema = ds.schema()
        if left_schema is None:
            # fully-empty upstream (e.g. every group filtered out): an
            # Inner/LeftOuter join of nothing is nothing — pass through
            return ds
        left_names = [f.name for f in left_schema.base_schema]
        right_ref = ray.put(self._suffixed_right(left_names))
        keys, right_keys, how = self.keys, self.right_keys, self.join_type

        class _BcastJoin:
            def __init__(self):
                self.right = ray.get(right_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                return _join_local(batch, self.right, keys, right_keys, how)

        return ds.map_batches(_BcastJoin, batch_format="pyarrow",
                              concurrency=(1, 8))

    def apply_local(self, table: pa.Table) -> pa.Table:
        right = self._suffixed_right(table.column_names)
        return _join_local(table, right, self.keys, self.right_keys, self.join_type)

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "JoinStep", "keys": self.keys, "right_keys": self.right_keys,
                "join_type": self.join_type, "broadcast": self.broadcast,
                "num_partitions": self.num_partitions}
