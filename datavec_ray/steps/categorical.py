"""Categorical steps. SURVEY.md §2.5.

Parity targets (datavec-api/.../transform/transform/categorical/ and
integer/): CategoricalToIntegerTransform.java:37,
CategoricalToOneHotTransform.java:37, IntegerToCategoricalTransform.java:35,
StringToCategoricalTransform.java:34, integer/IntegerToOneHotTransform.java:43,
categorical/PivotTransform.java:46.

Categorical columns are Arrow strings with a declared, ordered state list
carried in ColumnMeta (SURVEY.md §1.3) — state order defines integer codes,
matching the reference where codes follow the state-name declaration order.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from datavec_ray.registry import register
from datavec_ray.schema import ColumnMeta, Schema
from datavec_ray.steps.base import Step, combine, set_column


def _states(schema: Schema, column: str, explicit: Optional[Sequence[str]]) -> list[str]:
    if explicit is not None:
        return list(explicit)
    states = schema.meta_of(column).states
    if not states:
        raise ValueError(
            f"column {column!r} has no declared categorical states; pass states=")
    return list(states)


@register("step")
class CategoricalToInteger(Step):
    """state → 0..k-1 by state order (CategoricalToIntegerTransform.java:37)."""

    def __init__(self, column: str, states: Optional[Sequence[str]] = None):
        self.column = column
        self.states = list(states) if states is not None else None

    def output_schema(self, schema: Schema) -> Schema:
        self.states = _states(schema, self.column, self.states)
        return schema.with_type(self.column, pa.int32(),
                                ColumnMeta("Integer", min_value=0,
                                           max_value=len(self.states) - 1))

    def apply(self, table: pa.Table) -> pa.Table:
        idx = pc.index_in(table[self.column],
                          value_set=pa.array(self.states, type=pa.string()))
        return set_column(table, self.column, combine(idx).cast(pa.int32()))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "CategoricalToInteger", "column": self.column,
                "states": self.states}


@register("step")
class CategoricalToOneHot(Step):
    """1 column → k 0/1 integer columns named `col[state]`, replacing the
    original at its position (CategoricalToOneHotTransform.java:37)."""

    def __init__(self, column: str, states: Optional[Sequence[str]] = None):
        self.column = column
        self.states = list(states) if states is not None else None

    def _names(self) -> list[str]:
        return [f"{self.column}[{s}]" for s in self.states]

    def output_schema(self, schema: Schema) -> Schema:
        self.states = _states(schema, self.column, self.states)
        idx = schema.index_of(self.column)
        out = schema.without_columns([self.column])
        for j, name in enumerate(self._names()):
            out = out.with_column(name, pa.int32(),
                                  ColumnMeta("Integer", min_value=0, max_value=1),
                                  index=idx + j)
        return out

    def apply(self, table: pa.Table) -> pa.Table:
        col = table[self.column]
        idx = table.schema.get_field_index(self.column)
        table = table.drop_columns([self.column])
        for j, (name, state) in enumerate(zip(self._names(), self.states)):
            onehot = pc.cast(pc.fill_null(pc.equal(col, state), False), pa.int32())
            table = table.add_column(idx + j, pa.field(name, pa.int32()),
                                     combine(onehot))
        return table

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "CategoricalToOneHot", "column": self.column,
                "states": self.states}


@register("step")
class IntegerToCategorical(Step):
    """code → state name (IntegerToCategoricalTransform.java:35)."""

    def __init__(self, column: str, states: Sequence[str]):
        self.column, self.states = column, list(states)

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        return schema.with_type(self.column, pa.string(),
                                ColumnMeta("Categorical", states=self.states))

    def apply(self, table: pa.Table) -> pa.Table:
        vals = pa.array(self.states, type=pa.string())
        out = pc.take(vals, combine(table[self.column]).cast(pa.int64()))
        return set_column(table, self.column, combine(out))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "IntegerToCategorical", "column": self.column,
                "states": self.states}


@register("step")
class StringToCategorical(Step):
    """Re-type String as Categorical with declared states
    (StringToCategoricalTransform.java:34). Data unchanged; schema metadata
    gains the state list (used by downstream one-hot / to-integer)."""

    def __init__(self, column: str, states: Sequence[str]):
        self.column, self.states = column, list(states)

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        return schema.with_type(self.column, pa.string(),
                                ColumnMeta("Categorical", states=self.states))

    def apply(self, table: pa.Table) -> pa.Table:
        return table

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "StringToCategorical", "column": self.column,
                "states": self.states}


@register("step")
class IntegerToOneHot(Step):
    """int in [min,max] → (max-min+1) 0/1 columns `col[v]`
    (integer/IntegerToOneHotTransform.java:43)."""

    def __init__(self, column: str, min_value: int, max_value: int):
        self.column, self.min_value, self.max_value = column, min_value, max_value

    def _names(self) -> list[str]:
        return [f"{self.column}[{v}]"
                for v in range(self.min_value, self.max_value + 1)]

    def output_schema(self, schema: Schema) -> Schema:
        idx = schema.index_of(self.column)
        out = schema.without_columns([self.column])
        for j, name in enumerate(self._names()):
            out = out.with_column(name, pa.int32(),
                                  ColumnMeta("Integer", min_value=0, max_value=1),
                                  index=idx + j)
        return out

    def apply(self, table: pa.Table) -> pa.Table:
        col = table[self.column]
        idx = table.schema.get_field_index(self.column)
        table = table.drop_columns([self.column])
        for j, v in enumerate(range(self.min_value, self.max_value + 1)):
            onehot = pc.cast(pc.fill_null(pc.equal(col, v), False), pa.int32())
            table = table.add_column(idx + j, pa.field(self._names()[j], pa.int32()),
                                     combine(onehot))
        return table

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "IntegerToOneHot", "column": self.column,
                "min_value": self.min_value, "max_value": self.max_value}


@register("step")
class Pivot(Step):
    """Per-row pivot of a (key, value) column pair into k value columns named
    `key[state]`; the non-matching columns get `default_value`
    (categorical/PivotTransform.java:46 — no aggregation, one output row per
    input row)."""

    def __init__(self, key_column: str, value_column: str,
                 states: Optional[Sequence[str]] = None, default_value: Any = 0):
        self.key_column, self.value_column = key_column, value_column
        self.states = list(states) if states is not None else None
        self.default_value = default_value

    def _names(self) -> list[str]:
        return [f"{self.key_column}[{s}]" for s in self.states]

    def output_schema(self, schema: Schema) -> Schema:
        self.states = _states(schema, self.key_column, self.states)
        vtype = schema.type_of(self.value_column)
        vmeta = schema.meta_of(self.value_column)
        idx = min(schema.index_of(self.key_column), schema.index_of(self.value_column))
        out = schema.without_columns([self.key_column, self.value_column])
        for j, name in enumerate(self._names()):
            out = out.with_column(name, vtype, vmeta, index=idx + j)
        return out

    def apply(self, table: pa.Table) -> pa.Table:
        key, val = table[self.key_column], table[self.value_column]
        vtype = val.type
        idx = min(table.schema.get_field_index(self.key_column),
                  table.schema.get_field_index(self.value_column))
        table = table.drop_columns([self.key_column, self.value_column])
        default = pa.scalar(self.default_value, type=vtype)
        for j, (name, state) in enumerate(zip(self._names(), self.states)):
            m = pc.fill_null(pc.equal(key, state), False)
            out = pc.if_else(m, val, default)
            table = table.add_column(idx + j, pa.field(name, vtype), combine(out))
        return table

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "Pivot", "key_column": self.key_column,
                "value_column": self.value_column, "states": self.states,
                "default_value": self.default_value}
