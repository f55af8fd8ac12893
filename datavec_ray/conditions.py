"""Condition expression tree → vectorized boolean masks over Arrow batches.

Parity target: the reference's ``Condition`` interface and implementations
(``datavec-api/.../transform/condition/Condition.java:55-106``,
``condition/ConditionOp.java:24-25`` — LessThan, LessOrEqual, GreaterThan,
GreaterOrEqual, Equal, NotEqual, InSet, NotInSet — plus the column
conditions under ``condition/column/*.java``, regex condition
``condition/string/StringRegexColumnCondition.java:36`` and the nestable
``BooleanCondition`` AND/OR/NOT/XOR at ``condition/BooleanCondition.java:36``).

Instead of a per-row ``condition(List<Writable>)`` call, every condition
compiles to a single vectorized ``mask(pa.Table) -> pa.BooleanArray``
evaluated per batch inside ``map_batches`` — this is the building block
for ConditionFilter, ConditionalReplaceValueTransform and conditional
reductions. Null handling: a null cell never satisfies a value
comparison (mask=False), matching the reference where NullWritable fails
numeric parses; ``IsNullCondition`` targets nulls explicitly.
"""

from __future__ import annotations

from typing import Any, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from datavec_ray.registry import register
from datavec_ray.schema import Schema

__all__ = [
    "Condition", "ColumnCondition", "StringRegexCondition", "IsNullCondition",
    "NaNCondition", "InfiniteCondition", "InvalidValueCondition",
    "TrivialCondition", "BooleanCondition", "condition_from_dict",
]


def _as_array(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def _false_to_null_filled(mask: pa.Array) -> pa.Array:
    """Nulls in a comparison result become False (reference: null never matches)."""
    return _as_array(pc.fill_null(mask, False))


class Condition:
    """Base: boolean mask over a batch; serializable; composable."""

    kind: str = "condition"

    def mask(self, table: pa.Table) -> pa.Array:  # pragma: no cover - abstract
        raise NotImplementedError

    def validate(self, schema: Schema) -> None:
        """Fail fast at pipeline-build time (columns exist)."""

    def to_dict(self) -> dict[str, Any]:  # pragma: no cover - abstract
        raise NotImplementedError

    # composition sugar
    def __and__(self, other: "Condition") -> "BooleanCondition":
        return BooleanCondition("AND", [self, other])

    def __or__(self, other: "Condition") -> "BooleanCondition":
        return BooleanCondition("OR", [self, other])

    def __invert__(self) -> "BooleanCondition":
        return BooleanCondition("NOT", [self])


_OPS = {"LessThan", "LessOrEqual", "GreaterThan", "GreaterOrEqual",
        "Equal", "NotEqual", "InSet", "NotInSet"}

_OP_FN = {
    "LessThan": pc.less,
    "LessOrEqual": pc.less_equal,
    "GreaterThan": pc.greater,
    "GreaterOrEqual": pc.greater_equal,
    "Equal": pc.equal,
    "NotEqual": pc.not_equal,
}


@register("condition")
class ColumnCondition(Condition):
    """value-vs-scalar / value-vs-set condition on one column.

    Covers Integer/Long/Double/Float/Time/String/Categorical/Boolean column
    conditions (``condition/column/*.java``): all eight ConditionOps for
    numeric/time columns; Equal/NotEqual/InSet/NotInSet for strings —
    pyarrow compares any ordered type uniformly so we allow all ops on all
    comparable types.
    """

    kind = "condition"

    def __init__(self, column: str, op: str, value: Any = None,
                 value_set: Sequence[Any] | None = None):
        if op not in _OPS:
            raise ValueError(f"unknown ConditionOp {op!r} (valid: {sorted(_OPS)})")
        if op in ("InSet", "NotInSet") and value_set is None:
            raise ValueError(f"{op} requires value_set")
        if op not in ("InSet", "NotInSet") and value is None:
            raise ValueError(f"{op} requires value")
        self.column, self.op, self.value = column, op, value
        self.value_set = list(value_set) if value_set is not None else None

    def validate(self, schema: Schema) -> None:
        schema.require(self.column)

    def mask(self, table: pa.Table) -> pa.Array:
        col = table[self.column]
        if self.op == "InSet":
            m = pc.is_in(col, value_set=pa.array(self.value_set))
        elif self.op == "NotInSet":
            m = pc.invert(pc.is_in(col, value_set=pa.array(self.value_set)))
        else:
            m = _OP_FN[self.op](col, self.value)
        return _false_to_null_filled(m)

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "ColumnCondition", "column": self.column, "op": self.op,
                "value": self.value, "value_set": self.value_set}


@register("condition")
class StringRegexCondition(Condition):
    """Full-string regex match (``StringRegexColumnCondition.java:36``
    uses Java ``String.matches`` = anchored match)."""

    kind = "condition"

    def __init__(self, column: str, pattern: str):
        self.column, self.pattern = column, pattern

    def validate(self, schema: Schema) -> None:
        schema.require(self.column)

    def mask(self, table: pa.Table) -> pa.Array:
        pat = self.pattern
        if not pat.startswith("^"):
            pat = "^(?:" + pat + ")$"
        m = pc.match_substring_regex(table[self.column], pat)
        return _false_to_null_filled(m)

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "StringRegexCondition", "column": self.column,
                "pattern": self.pattern}


@register("condition")
class IsNullCondition(Condition):
    """``NullWritableColumnCondition.java:31``; also matches missing values."""

    kind = "condition"

    def __init__(self, column: str):
        self.column = column

    def validate(self, schema: Schema) -> None:
        schema.require(self.column)

    def mask(self, table: pa.Table) -> pa.Array:
        return _as_array(pc.is_null(table[self.column]))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "IsNullCondition", "column": self.column}


@register("condition")
class NaNCondition(Condition):
    """``NaNColumnCondition.java:27`` — true where the float cell is NaN."""

    kind = "condition"

    def __init__(self, column: str):
        self.column = column

    def validate(self, schema: Schema) -> None:
        schema.require(self.column)

    def mask(self, table: pa.Table) -> pa.Array:
        return _false_to_null_filled(pc.is_nan(table[self.column]))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "NaNCondition", "column": self.column}


@register("condition")
class InfiniteCondition(Condition):
    """``InfiniteColumnCondition.java:27`` — true where the float cell is ±Inf."""

    kind = "condition"

    def __init__(self, column: str):
        self.column = column

    def validate(self, schema: Schema) -> None:
        schema.require(self.column)

    def mask(self, table: pa.Table) -> pa.Array:
        return _false_to_null_filled(pc.is_inf(table[self.column]))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "InfiniteCondition", "column": self.column}


@register("condition")
class InvalidValueCondition(Condition):
    """True where the cell fails the schema's ColumnMeta constraints.

    Parity: ``InvalidValueColumnCondition.java:30`` +
    ``ColumnMetaData.isValid`` (``transform/metadata/ColumnMetaData.java:89``).
    Constraints checked: null, min/max (numeric), NaN/Inf (double unless
    allowed), regex + length bounds (string), state membership (categorical).
    The Schema must be bound at build time via ``bind_schema``.
    """

    kind = "condition"

    def __init__(self, column: str, meta: dict[str, Any] | None = None):
        self.column = column
        self._meta = meta  # serialized ColumnMeta dict

    def validate(self, schema: Schema) -> None:
        schema.require(self.column)
        if self._meta is None:
            self._meta = schema.meta_of(self.column).to_dict()

    def mask(self, table: pa.Table) -> pa.Array:
        from datavec_ray.schema import ColumnMeta
        meta = ColumnMeta.from_dict(self._meta or {})
        col = table[self.column]
        invalid = pc.is_null(col)
        typ = col.type
        if pa.types.is_floating(typ):
            if not meta.allow_nan:
                invalid = pc.or_(invalid, pc.fill_null(pc.is_nan(col), False))
            if not meta.allow_infinite:
                invalid = pc.or_(invalid, pc.fill_null(pc.is_inf(col), False))
        if meta.min_value is not None:
            invalid = pc.or_(invalid, pc.fill_null(pc.less(col, meta.min_value), False))
        if meta.max_value is not None:
            invalid = pc.or_(invalid, pc.fill_null(pc.greater(col, meta.max_value), False))
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            if meta.regex:
                pat = meta.regex
                if not pat.startswith("^"):
                    pat = "^(?:" + pat + ")$"
                invalid = pc.or_(invalid, pc.fill_null(
                    pc.invert(pc.match_substring_regex(col, pat)), False))
            if meta.min_length is not None:
                invalid = pc.or_(invalid, pc.fill_null(
                    pc.less(pc.utf8_length(col), meta.min_length), False))
            if meta.max_length is not None:
                invalid = pc.or_(invalid, pc.fill_null(
                    pc.greater(pc.utf8_length(col), meta.max_length), False))
            if meta.states is not None:
                invalid = pc.or_(invalid, pc.fill_null(pc.invert(
                    pc.is_in(col, value_set=pa.array(meta.states))), False))
        return _as_array(invalid)

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "InvalidValueCondition", "column": self.column,
                "meta": self._meta}


@register("condition")
class TrivialCondition(Condition):
    """Always true (``TrivialColumnCondition.java:14``)."""

    kind = "condition"

    def __init__(self, value: bool = True):
        self.value = value

    def mask(self, table: pa.Table) -> pa.Array:
        import numpy as np
        return pa.array(np.full(table.num_rows, self.value, dtype=bool))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "TrivialCondition", "value": self.value}


@register("condition")
class BooleanCondition(Condition):
    """AND / OR / NOT / XOR over sub-conditions, arbitrarily nested
    (``condition/BooleanCondition.java:36``)."""

    kind = "condition"

    def __init__(self, op: str, conditions: Sequence[Condition]):
        op = op.upper()
        if op not in ("AND", "OR", "NOT", "XOR"):
            raise ValueError(f"unknown boolean op {op!r}")
        if op == "NOT" and len(conditions) != 1:
            raise ValueError("NOT takes exactly one condition")
        if op == "XOR" and len(conditions) != 2:
            raise ValueError("XOR takes exactly two conditions")
        if op in ("AND", "OR") and len(conditions) < 1:
            raise ValueError(f"{op} needs at least one condition")
        self.op, self.conditions = op, list(conditions)

    def validate(self, schema: Schema) -> None:
        for c in self.conditions:
            c.validate(schema)

    def mask(self, table: pa.Table) -> pa.Array:
        masks = [c.mask(table) for c in self.conditions]
        if self.op == "NOT":
            return _as_array(pc.invert(masks[0]))
        if self.op == "XOR":
            return _as_array(pc.xor(masks[0], masks[1]))
        fn = pc.and_ if self.op == "AND" else pc.or_
        out = masks[0]
        for m in masks[1:]:
            out = fn(out, m)
        return _as_array(out)

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "BooleanCondition", "op": self.op,
                "conditions": [c.to_dict() for c in self.conditions]}


def condition_from_dict(d: dict[str, Any]) -> Condition:
    from datavec_ray.registry import resolve
    cls = resolve("condition", d["cls"])
    if d["cls"] == "BooleanCondition":
        return BooleanCondition(d["op"], [condition_from_dict(c) for c in d["conditions"]])
    kwargs = {k: v for k, v in d.items() if k != "cls"}
    return cls(**kwargs)
