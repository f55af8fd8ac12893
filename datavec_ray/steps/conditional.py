"""Conditional-value steps and filters. SURVEY.md §2.10.

Parity targets:
- ConditionalReplaceValueTransform.java:44 — if cond(row): col := value.
- ConditionalReplaceValueTransformWithDefault.java:46 — col := cond ? yes : no.
- ConditionalCopyValueTransform.java:48 — if cond(row): colA := colB.
- filter/ConditionFilter.java:37 — remove records where condition true.
- filter/FilterInvalidValues.java:35 — drop rows with schema-invalid cells.

All compile the condition tree (datavec_ray.conditions) to one boolean
mask per batch and apply it with pc.if_else / Table.filter — no row loops.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from datavec_ray.conditions import Condition, InvalidValueCondition, condition_from_dict
from datavec_ray.registry import register
from datavec_ray.schema import Schema
from datavec_ray.steps.base import Step, combine, set_column


def _cond(c: Condition | dict) -> Condition:
    return condition_from_dict(c) if isinstance(c, dict) else c


@register("step")
class ConditionalReplaceValue(Step):
    """if condition(row): column := value (ConditionalReplaceValueTransform.java:44).

    Named in the north star as a required CDC transform step.
    """

    def __init__(self, column: str, value: Any, condition: Condition | dict):
        self.column, self.value = column, value
        self.condition = _cond(condition)

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        self.condition.validate(schema)
        return schema

    def apply(self, table: pa.Table) -> pa.Table:
        mask = self.condition.mask(table)
        col = table[self.column]
        out = pc.if_else(mask, pa.scalar(self.value, type=col.type), col)
        return set_column(table, self.column, combine(out))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "ConditionalReplaceValue", "column": self.column,
                "value": self.value, "condition": self.condition.to_dict()}


@register("step")
class ConditionalReplaceValueWithDefault(Step):
    """column := condition ? yes_value : no_value
    (ConditionalReplaceValueTransformWithDefault.java:46)."""

    def __init__(self, column: str, yes_value: Any, no_value: Any,
                 condition: Condition | dict):
        self.column, self.yes_value, self.no_value = column, yes_value, no_value
        self.condition = _cond(condition)

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        self.condition.validate(schema)
        return schema

    def apply(self, table: pa.Table) -> pa.Table:
        mask = self.condition.mask(table)
        typ = table[self.column].type
        out = pc.if_else(mask, pa.scalar(self.yes_value, type=typ),
                         pa.scalar(self.no_value, type=typ))
        return set_column(table, self.column, combine(out))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "ConditionalReplaceValueWithDefault", "column": self.column,
                "yes_value": self.yes_value, "no_value": self.no_value,
                "condition": self.condition.to_dict()}


@register("step")
class ConditionalCopyValue(Step):
    """if condition(row): column_to_set := column_to_copy_from
    (ConditionalCopyValueTransform.java:48)."""

    def __init__(self, column_to_set: str, column_to_copy_from: str,
                 condition: Condition | dict):
        self.column_to_set = column_to_set
        self.column_to_copy_from = column_to_copy_from
        self.condition = _cond(condition)

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column_to_set, self.column_to_copy_from)
        self.condition.validate(schema)
        return schema

    def apply(self, table: pa.Table) -> pa.Table:
        mask = self.condition.mask(table)
        out = pc.if_else(mask, table[self.column_to_copy_from],
                         table[self.column_to_set])
        return set_column(table, self.column_to_set, combine(out))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "ConditionalCopyValue", "column_to_set": self.column_to_set,
                "column_to_copy_from": self.column_to_copy_from,
                "condition": self.condition.to_dict()}


@register("step")
class ConditionFilter(Step):
    """REMOVE rows where the condition is true (filter/ConditionFilter.java:37)."""

    def __init__(self, condition: Condition | dict):
        self.condition = _cond(condition)

    def output_schema(self, schema: Schema) -> Schema:
        self.condition.validate(schema)
        return schema

    def apply(self, table: pa.Table) -> pa.Table:
        mask = self.condition.mask(table)
        return table.filter(pc.invert(mask))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "ConditionFilter", "condition": self.condition.to_dict()}


@register("step")
class FilterInvalidValues(Step):
    """Drop rows with schema-invalid cells in the given columns (or all)
    (filter/FilterInvalidValues.java:35). Validity per ColumnMeta constraints
    (null / min-max / NaN-Inf / regex / length / categorical states)."""

    def __init__(self, columns: Optional[Sequence[str]] = None,
                 metas: Optional[dict[str, dict]] = None):
        self.columns = list(columns) if columns is not None else None
        self._metas = metas  # bound at output_schema time

    def output_schema(self, schema: Schema) -> Schema:
        cols = self.columns if self.columns is not None else schema.names
        schema.require(*cols)
        self._metas = {c: schema.meta_of(c).to_dict() for c in cols}
        return schema

    def apply(self, table: pa.Table) -> pa.Table:
        metas = self._metas or {c: {} for c in (self.columns or table.column_names)}
        bad = None
        for col, meta in metas.items():
            if col not in table.column_names:
                continue
            m = InvalidValueCondition(col, meta).mask(table)
            bad = m if bad is None else pc.or_(bad, m)
        if bad is None:
            return table
        return table.filter(pc.invert(bad))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "FilterInvalidValues", "columns": self.columns,
                "metas": self._metas}


@register("step")
class LambdaStep(Step):
    """Escape hatch: arbitrary user batch function table→table with an
    explicit output schema — the plugin surface (custom Transform classes,
    TransformProcess.java:483-584). Not JSON-serializable unless the user
    registers a named subclass."""

    def __init__(self, fn, schema_fn=None, name: str = "lambda"):
        self.fn, self.schema_fn, self.name = fn, schema_fn, name

    def output_schema(self, schema: Schema) -> Schema:
        return self.schema_fn(schema) if self.schema_fn else schema

    def apply(self, table: pa.Table) -> pa.Table:
        return self.fn(table)

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "LambdaStep", "name": self.name}
