"""Math / numeric scalar steps. SURVEY.md §2.3.

Parity targets (datavec-api/.../transform/transform/):
- ``MathOp`` enum (Add, Subtract, Multiply, Divide, Modulus,
  ReverseSubtract, ReverseDivide, ScalarMin, ScalarMax) —
  ``transform/MathOp.java:34-36``.
- ``IntegerMathOpTransform.java:34``, ``longtransform/LongMathOpTransform.java:34``,
  ``doubletransform/DoubleMathOpTransform.java:37`` — in-place ``col ⊕ scalar``.
- ``*ColumnsMathOpTransform`` — new column = fold(⊕, columns...),
  appended at the end (``integer/IntegerColumnsMathOpTransform.java:47`` etc.).
- ``MathFunction`` enum (17 fns) + ``DoubleMathFunctionTransform.java:32``.
- casts: ``ConvertToInteger/ConvertToDouble/ConvertToString`` and
  ``parse/ParseDoubleTransform.java:18``.
- ``ReplaceEmptyIntegerWithValueTransform.java:30``,
  ``ReplaceInvalidWithIntegerTransform.java:26``.

Java semantics preserved: integer division truncates toward zero;
``Modulus`` is Java ``%`` (remainder, sign of the dividend).
All kernels vectorized (pyarrow.compute / numpy); no per-row loops.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datavec_ray.registry import register
from datavec_ray.schema import ColumnMeta, Schema, arrow_type_for, column_type_for
from datavec_ray.steps.base import Step, combine, set_column

MATH_OPS = ("Add", "Subtract", "Multiply", "Divide", "Modulus",
            "ReverseSubtract", "ReverseDivide", "ScalarMin", "ScalarMax")

MATH_FUNCTIONS = ("ABS", "ACOS", "ASIN", "ATAN", "CEIL", "COS", "COSH", "EXP",
                  "FLOOR", "LOG", "LOG10", "SIGNUM", "SIN", "SINH", "SQRT",
                  "TAN", "TANH")


def _apply_math_op(col: pa.ChunkedArray | pa.Array, op: str, scalar: Any,
                   integral: bool) -> pa.Array:
    """col ⊕ scalar with Java numeric semantics."""
    if op == "Add":
        out = pc.add(col, scalar)
    elif op == "Subtract":
        out = pc.subtract(col, scalar)
    elif op == "Multiply":
        out = pc.multiply(col, scalar)
    elif op == "Divide":
        if integral:
            # Java int division truncates toward zero; Arrow int divide is
            # already truncating (divide_checked); keep it.
            out = pc.divide(col, scalar)
        else:
            out = pc.divide(col, scalar)
    elif op == "Modulus":
        a = combine(col).to_numpy(zero_copy_only=False)
        out = pa.array(np.fmod(a, scalar), type=combine(col).type)
    elif op == "ReverseSubtract":
        out = pc.subtract(scalar, col)
    elif op == "ReverseDivide":
        if integral:
            out = pc.divide(pa.scalar(scalar, type=combine(col).type), col)
        else:
            out = pc.divide(scalar, col)
    elif op == "ScalarMin":
        # DataVec ScalarMin = Math.min(x, scalar)
        out = pc.min_element_wise(col, pa.scalar(scalar, type=combine(col).type))
    elif op == "ScalarMax":
        out = pc.max_element_wise(col, pa.scalar(scalar, type=combine(col).type))
    else:
        raise ValueError(f"unknown MathOp {op!r}")
    return combine(out)


class _BaseScalarMathOp(Step):
    _expected: tuple[str, ...] = ()

    def __init__(self, column: str, op: str, scalar: Any):
        if op not in MATH_OPS:
            raise ValueError(f"unknown MathOp {op!r}")
        self.column, self.op, self.scalar = column, op, scalar

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        ct = schema.meta_of(self.column).column_type
        if self._expected and ct not in self._expected:
            raise TypeError(f"{type(self).__name__} on {self.column!r}: "
                            f"column type {ct} not in {self._expected}")
        return schema

    def apply(self, table: pa.Table) -> pa.Table:
        col = table[self.column]
        integral = pa.types.is_integer(col.type)
        out = _apply_math_op(col, self.op, self.scalar, integral)
        return set_column(table, self.column, out.cast(col.type))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": type(self).__name__, "column": self.column,
                "op": self.op, "scalar": self.scalar}


@register("step")
class IntegerMathOp(_BaseScalarMathOp):
    _expected = ("Integer",)


@register("step")
class LongMathOp(_BaseScalarMathOp):
    _expected = ("Long",)


@register("step")
class DoubleMathOp(_BaseScalarMathOp):
    _expected = ("Double", "Float")


@register("step")
class FloatMathOp(_BaseScalarMathOp):
    _expected = ("Float",)


@register("step")
class TimeMathOp(Step):
    """Add/Subtract/ScalarMin/ScalarMax a TimeUnit quantity on a Time column
    (``time/TimeMathOpTransform.java:39``)."""

    _MS = {"MILLISECONDS": 1, "SECONDS": 1000, "MINUTES": 60_000,
           "HOURS": 3_600_000, "DAYS": 86_400_000}

    def __init__(self, column: str, op: str, amount: int, unit: str = "MILLISECONDS"):
        if op not in ("Add", "Subtract", "ScalarMin", "ScalarMax"):
            raise ValueError(f"TimeMathOp supports Add/Subtract/ScalarMin/ScalarMax, got {op!r}")
        if unit not in self._MS:
            raise ValueError(f"unknown TimeUnit {unit!r}")
        self.column, self.op, self.amount, self.unit = column, op, amount, unit

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        if not pa.types.is_timestamp(schema.type_of(self.column)):
            raise TypeError(f"TimeMathOp on non-timestamp column {self.column!r}")
        return schema

    def apply(self, table: pa.Table) -> pa.Table:
        col = table[self.column]
        unit = col.type.unit
        per_ms = {"s": 0.001, "ms": 1, "us": 1000, "ns": 1_000_000}[unit]
        delta = int(self.amount * self._MS[self.unit] * per_ms)
        ints = combine(col).cast(pa.int64())
        out = _apply_math_op(ints, self.op, delta, True)
        return set_column(table, self.column, out.cast(col.type))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "TimeMathOp", "column": self.column, "op": self.op,
                "amount": self.amount, "unit": self.unit}


class _BaseColumnsMathOp(Step):
    """new column = fold(op, columns...) appended at end
    (BaseColumnsMathOpTransform.java:1)."""

    _out_type: pa.DataType = pa.float64()
    _out_ct: str = "Double"

    def __init__(self, new_column: str, op: str, columns: Sequence[str]):
        if op not in ("Add", "Subtract", "Multiply", "Divide", "Modulus",
                      "ScalarMin", "ScalarMax"):
            raise ValueError(f"unsupported columns MathOp {op!r}")
        if len(columns) < 2 and op in ("Subtract", "Divide", "Modulus"):
            pass  # reference requires exactly 2 for these; we fold pairwise
        self.new_column, self.op, self.columns = new_column, op, list(columns)

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(*self.columns)
        return schema.with_column(self.new_column, self._out_type,
                                  ColumnMeta(self._out_ct))

    def apply(self, table: pa.Table) -> pa.Table:
        cols = [combine(table[c]).cast(self._out_type) for c in self.columns]
        acc = cols[0]
        integral = pa.types.is_integer(self._out_type)
        for nxt in cols[1:]:
            if self.op == "Add":
                acc = pc.add(acc, nxt)
            elif self.op == "Subtract":
                acc = pc.subtract(acc, nxt)
            elif self.op == "Multiply":
                acc = pc.multiply(acc, nxt)
            elif self.op == "Divide":
                acc = pc.divide(acc, nxt)
            elif self.op == "Modulus":
                a = combine(acc).to_numpy(zero_copy_only=False)
                b = combine(nxt).to_numpy(zero_copy_only=False)
                acc = pa.array(np.fmod(a, b), type=self._out_type)
            elif self.op == "ScalarMin":
                acc = pc.min_element_wise(acc, nxt)
            elif self.op == "ScalarMax":
                acc = pc.max_element_wise(acc, nxt)
        return table.append_column(
            pa.field(self.new_column, self._out_type), combine(acc).cast(self._out_type))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": type(self).__name__, "new_column": self.new_column,
                "op": self.op, "columns": self.columns}


@register("step")
class IntegerColumnsMathOp(_BaseColumnsMathOp):
    _out_type, _out_ct = pa.int32(), "Integer"


@register("step")
class LongColumnsMathOp(_BaseColumnsMathOp):
    _out_type, _out_ct = pa.int64(), "Long"


@register("step")
class DoubleColumnsMathOp(_BaseColumnsMathOp):
    _out_type, _out_ct = pa.float64(), "Double"


@register("step")
class DoubleMathFunction(Step):
    """In-place f(x) on a Double column; 17 functions
    (``transform/MathFunction.java:24-26``,
    ``doubletransform/DoubleMathFunctionTransform.java:32``)."""

    _PC = {"ABS": "abs", "ACOS": "acos", "ASIN": "asin", "ATAN": "atan",
           "CEIL": "ceil", "COS": "cos", "EXP": "exp", "FLOOR": "floor",
           "LOG": "ln", "LOG10": "log10", "SIGNUM": "sign", "SIN": "sin",
           "SQRT": "sqrt", "TAN": "tan"}
    _NP = {"COSH": np.cosh, "SINH": np.sinh, "TANH": np.tanh}

    def __init__(self, column: str, function: str):
        if function not in MATH_FUNCTIONS:
            raise ValueError(f"unknown MathFunction {function!r}")
        self.column, self.function = column, function

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        return schema

    def apply(self, table: pa.Table) -> pa.Table:
        col = combine(table[self.column]).cast(pa.float64())
        if self.function in self._PC:
            out = pc.call_function(self._PC[self.function], [col])
        else:
            fn = self._NP[self.function]
            out = pa.array(fn(col.to_numpy(zero_copy_only=False)), type=pa.float64())
        return set_column(table, self.column, combine(out))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "DoubleMathFunction", "column": self.column,
                "function": self.function}


class _BaseCast(Step):
    _target: pa.DataType = pa.string()
    _ct: str = "String"

    def __init__(self, column: str):
        self.column = column

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        return schema.with_type(self.column, self._target, ColumnMeta(self._ct))

    def apply(self, table: pa.Table) -> pa.Table:
        col = table[self.column]
        if pa.types.is_floating(col.type) and pa.types.is_integer(self._target):
            # Java (int) cast truncates toward zero; Arrow cast would error on
            # fractional values → truncate explicitly, then cast.
            col = pc.trunc(col)
        out = combine(pc.cast(col, self._target))
        return set_column(table, self.column, out)

    def to_dict(self) -> dict[str, Any]:
        return {"cls": type(self).__name__, "column": self.column}


@register("step")
class ConvertToInteger(_BaseCast):
    _target, _ct = pa.int32(), "Integer"


@register("step")
class ConvertToLong(_BaseCast):
    _target, _ct = pa.int64(), "Long"


@register("step")
class ConvertToDouble(_BaseCast):
    _target, _ct = pa.float64(), "Double"


@register("step")
class ConvertToFloat(_BaseCast):
    _target, _ct = pa.float32(), "Float"


@register("step")
class ConvertToString(_BaseCast):
    _target, _ct = pa.string(), "String"


@register("step")
class ParseDouble(_BaseCast):
    """String column → Double (``parse/ParseDoubleTransform.java:18``)."""
    _target, _ct = pa.float64(), "Double"


@register("step")
class ReplaceEmptyWithValue(Step):
    """Parse a string column to a numeric type, mapping empty-string/null
    cells to `value` (``ReplaceEmptyIntegerWithValueTransform.java:30``)."""

    def __init__(self, column: str, value: Any, column_type: str = "Integer"):
        self.column, self.value, self.column_type = column, value, column_type

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        return schema.with_type(self.column, arrow_type_for(self.column_type),
                                ColumnMeta(self.column_type))

    def apply(self, table: pa.Table) -> pa.Table:
        col = table[self.column]
        target = arrow_type_for(self.column_type)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            empty = pc.or_kleene(pc.is_null(col), pc.equal(col, ""))
            filled = pc.if_else(empty, pa.scalar(str(self.value)), col)
            out = pc.cast(filled, target)
        else:
            out = pc.fill_null(pc.cast(col, target), self.value)
        return set_column(table, self.column, combine(out))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "ReplaceEmptyWithValue", "column": self.column,
                "value": self.value, "column_type": self.column_type}


@register("step")
class ReplaceInvalidWithValue(Step):
    """Parse a string column to a numeric type; unparseable cells → `value`
    (``ReplaceInvalidWithIntegerTransform.java:26``)."""

    def __init__(self, column: str, value: Any, column_type: str = "Integer"):
        self.column, self.value, self.column_type = column, value, column_type

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        return schema.with_type(self.column, arrow_type_for(self.column_type),
                                ColumnMeta(self.column_type))

    def apply(self, table: pa.Table) -> pa.Table:
        col = combine(table[self.column])
        target = arrow_type_for(self.column_type)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            # vectorized "is parseable" probe: regex for a number literal
            pat = r"^[+-]?\d+$" if pa.types.is_integer(target) \
                else r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$"
            ok = pc.fill_null(pc.match_substring_regex(col, pat), False)
            safe = pc.if_else(ok, col, pa.scalar(str(self.value)))
            out = pc.cast(safe, target)
        else:
            out = pc.fill_null(pc.cast(col, target), self.value)
        return set_column(table, self.column, combine(out))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "ReplaceInvalidWithValue", "column": self.column,
                "value": self.value, "column_type": self.column_type}
