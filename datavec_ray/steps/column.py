"""Column / projection steps (schema reshaping). SURVEY.md §2.2.

Parity targets (datavec-api/.../transform/transform/column/):
RemoveColumnsTransform.java:38, RemoveAllColumnsExceptForTransform.java:39,
RenameColumnsTransform.java:37, ReorderColumnsTransform.java:39,
DuplicateColumnsTransform.java:40, AddConstantColumnTransform.java:36.
"""

from __future__ import annotations

from typing import Any, Sequence

import pyarrow as pa

from datavec_ray.registry import register
from datavec_ray.schema import ColumnMeta, Schema, arrow_type_for, column_type_for
from datavec_ray.steps.base import Step


@register("step")
class RemoveColumns(Step):
    def __init__(self, columns: Sequence[str]):
        self.columns = list(columns)

    def output_schema(self, schema: Schema) -> Schema:
        return schema.without_columns(self.columns)

    def apply(self, table: pa.Table) -> pa.Table:
        return table.drop_columns(self.columns)

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "RemoveColumns", "columns": self.columns}


@register("step")
class KeepColumns(Step):
    """Keep-only projection (RemoveAllColumnsExceptForTransform); keeps the
    listed order, like the reference which reorders to the given list."""

    def __init__(self, columns: Sequence[str]):
        self.columns = list(columns)

    def output_schema(self, schema: Schema) -> Schema:
        return schema.select(self.columns)

    def apply(self, table: pa.Table) -> pa.Table:
        return table.select(self.columns)

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "KeepColumns", "columns": self.columns}


@register("step")
class RenameColumns(Step):
    def __init__(self, mapping: dict[str, str]):
        self.mapping = dict(mapping)

    def output_schema(self, schema: Schema) -> Schema:
        return schema.renamed(self.mapping)

    def apply(self, table: pa.Table) -> pa.Table:
        return table.rename_columns([self.mapping.get(n, n) for n in table.column_names])

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "RenameColumns", "mapping": self.mapping}


@register("step")
class ReorderColumns(Step):
    """Named columns first in the given order; unnamed keep their relative
    order after them (ReorderColumnsTransform.java:39 semantics)."""

    def __init__(self, columns: Sequence[str]):
        self.columns = list(columns)

    def _order(self, names: Sequence[str]) -> list[str]:
        missing = [c for c in self.columns if c not in names]
        if missing:
            raise KeyError(f"reorder names columns not in schema: {missing}")
        rest = [n for n in names if n not in self.columns]
        return self.columns + rest

    def output_schema(self, schema: Schema) -> Schema:
        return schema.select(self._order(schema.names))

    def apply(self, table: pa.Table) -> pa.Table:
        return table.select(self._order(table.column_names))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "ReorderColumns", "columns": self.columns}


@register("step")
class DuplicateColumns(Step):
    """Copy columns under new names, appended at the end."""

    def __init__(self, columns: Sequence[str], new_names: Sequence[str]):
        if len(columns) != len(new_names):
            raise ValueError("columns and new_names must have equal length")
        self.columns, self.new_names = list(columns), list(new_names)

    def output_schema(self, schema: Schema) -> Schema:
        out = schema
        for src, dst in zip(self.columns, self.new_names):
            out = out.with_column(dst, schema.type_of(src), schema.meta_of(src))
        return out

    def apply(self, table: pa.Table) -> pa.Table:
        for src, dst in zip(self.columns, self.new_names):
            table = table.append_column(pa.field(dst, table[src].type), table[src])
        return table

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "DuplicateColumns", "columns": self.columns,
                "new_names": self.new_names}


@register("step")
class AddConstantColumn(Step):
    """Append a typed literal column (AddConstantColumnTransform.java:36)."""

    def __init__(self, name: str, column_type: str, value: Any):
        self.name, self.column_type, self.value = name, column_type, value

    def output_schema(self, schema: Schema) -> Schema:
        typ = arrow_type_for(self.column_type)
        return schema.with_column(self.name, typ, ColumnMeta(self.column_type))

    def apply(self, table: pa.Table) -> pa.Table:
        typ = arrow_type_for(self.column_type)
        arr = pa.array([self.value] * table.num_rows, type=typ)
        return table.append_column(pa.field(self.name, typ), arr)

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "AddConstantColumn", "name": self.name,
                "column_type": self.column_type, "value": self.value}


@register("step")
class RoundColumns(Step):
    """Round float columns to `digits` decimals (pc.round, half-to-even).

    Used to pin float outputs for cross-engine comparison (parallel
    summation order differs between engines at ~1e-12 relative)."""

    def __init__(self, columns: Sequence[str], digits: int = 4):
        self.columns, self.digits = list(columns), digits

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(*self.columns)
        return schema

    def apply(self, table: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        for c in self.columns:
            i = table.schema.get_field_index(c)
            table = table.set_column(
                i, pa.field(c, pa.float64()),
                pc.round(pc.cast(table[c], pa.float64()), ndigits=self.digits))
        return table

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "RoundColumns", "columns": self.columns,
                "digits": self.digits}


@register("step")
class Melt(Step):
    """Unpivot: widen-to-long reshape — each input row yields one output
    row per value column, as (id_cols..., var_name, value_name). SQL
    ``UNPIVOT tbl ON cols INTO NAME var VALUE val``. No reference
    counterpart (DataVec's Pivot goes the other way); provided because
    long-format metric tables are the standard input to grouped
    analysis/plotting stages.

    Narrow (row-local) despite changing the row count: one
    ``pa.concat_tables`` of V zero-copy column selections per batch —
    no shuffle, no per-row loop. Value columns are cast to a common
    type (identical types kept; numerics promoted to float64)."""

    def __init__(self, id_columns: Sequence[str], value_columns: Sequence[str],
                 var_name: str = "variable", value_name: str = "value"):
        if not value_columns:
            raise ValueError("value_columns must be non-empty")
        self.id_columns = list(id_columns)
        self.value_columns = list(value_columns)
        self.var_name, self.value_name = var_name, value_name

    def _value_type(self, types: Sequence[pa.DataType]) -> pa.DataType:
        if all(t == types[0] for t in types):
            return types[0]
        if all(pa.types.is_integer(t) or pa.types.is_floating(t)
               for t in types):
            return pa.float64()
        raise ValueError(
            f"value columns mix incompatible types: {list(map(str, types))}")

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(*self.id_columns, *self.value_columns)
        vt = self._value_type([schema.type_of(c) for c in self.value_columns])
        out = schema.select(self.id_columns)
        out = out.with_column(self.var_name, pa.string())
        return out.with_column(self.value_name, vt)

    def apply(self, table: pa.Table) -> pa.Table:
        vt = self._value_type([table.schema.field(c).type
                               for c in self.value_columns])
        parts = []
        for c in self.value_columns:
            t = table.select(self.id_columns)
            t = t.append_column(
                pa.field(self.var_name, pa.string()),
                pa.nulls(table.num_rows, pa.string()).fill_null(c))
            t = t.append_column(pa.field(self.value_name, vt),
                                table[c].cast(vt))
            parts.append(t)
        return pa.concat_tables(parts)

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "Melt", "id_columns": self.id_columns,
                "value_columns": self.value_columns,
                "var_name": self.var_name, "value_name": self.value_name}
