"""Step base classes.

Parity target: the reference's ``Transform`` interface — a pure
per-record function plus an eager schema mapping
(``transform/Transform.java:103-121``, ``transform/ColumnOp.java:13``) —
re-expressed as a pure per-BATCH function ``apply(pa.Table) -> pa.Table``
so a chain of narrow steps compiles into ONE fused ``map_batches`` call
over zero-copy Arrow (SURVEY.md §2.1 mapping).

Narrow step: row-local, batch in → batch out (may drop rows: filters).
Wide step (``is_wide=True``): needs a shuffle (groupby/sort/join); it
implements ``apply_dataset(ds) -> Dataset`` and a single-process
``apply_local(table)`` used by tests as the executor-parity oracle
(mirrors the reference's local-vs-Spark ``ExecutionTest`` pattern,
``datavec-spark/src/test/.../ExecutionTest.java:41-117``).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from datavec_ray.schema import Schema


def set_column(table: pa.Table, name: str, arr: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Replace column `name` in place (position preserved)."""
    i = table.schema.get_field_index(name)
    return table.set_column(i, pa.field(name, arr.type), arr)


def append_column(table: pa.Table, name: str, arr: pa.Array | pa.ChunkedArray) -> pa.Table:
    return table.append_column(pa.field(name, arr.type), arr)


def combine(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


class Step:
    kind = "step"
    is_wide = False

    def output_schema(self, schema: Schema) -> Schema:
        """Eager schema propagation; raise on mismatch (fail fast at build
        time, parity: TransformProcess ctor, TransformProcess.java:110-156)."""
        raise NotImplementedError

    def apply(self, table: pa.Table) -> pa.Table:
        raise NotImplementedError

    def to_dict(self) -> dict[str, Any]:
        raise NotImplementedError

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Step":
        kwargs = {k: v for k, v in d.items() if k != "cls"}
        return cls(**kwargs)

    def __repr__(self) -> str:
        d = {k: v for k, v in self.to_dict().items() if k != "cls" and v is not None}
        args = ", ".join(f"{k}={v!r}" for k, v in d.items())
        return f"{type(self).__name__}({args})"


class WideStep(Step):
    """A step that requires an all-to-all exchange (shuffle)."""

    is_wide = True

    def apply(self, table: pa.Table) -> pa.Table:
        return self.apply_local(table)

    def _input_arrow_schema(self, ds) -> "pa.Schema | None":
        """Input schema WITHOUT executing the plan: inside a
        TransformPipeline the statically-propagated schema is handed
        over via ``_in_schema_hint``; standalone use falls back to
        ``ds.schema()``, which may run the whole upstream (joins,
        sorts) through a limit(1) probe when Ray can't infer it."""
        hint = getattr(self, "_in_schema_hint", None)
        if hint is not None:
            return hint.arrow() if hasattr(hint, "arrow") else hint
        s = ds.schema()
        if s is None:
            return None
        return s.base_schema if hasattr(s, "base_schema") else s

    def apply_dataset(self, ds):  # ray.data.Dataset -> ray.data.Dataset
        raise NotImplementedError

    def apply_local(self, table: pa.Table) -> pa.Table:
        """Single-process reference semantics (test oracle)."""
        raise NotImplementedError
