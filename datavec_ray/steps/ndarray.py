"""NDArray (vector-column) steps. SURVEY.md §2.7.

Parity targets (datavec-api/.../transform/ndarray/):
NDArrayScalarOpTransform.java:36, NDArrayColumnsMathOpTransform.java:40,
NDArrayMathFunctionTransform.java:35, NDArrayDistanceTransform.java:42
(Distance enum COSINE/EUCLIDEAN/MANHATTAN, transform/Distance.java:22-24).

Vector columns are Arrow list<float> arrays; kernels run on the flat
values buffer with numpy (zero-copy where possible), never per row.
Assumes equal-length vectors within a batch for the binary ops (the
reference requires matching NDArray shapes).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datavec_ray.registry import register
from datavec_ray.schema import ColumnMeta, Schema
from datavec_ray.steps.base import Step, combine, set_column

_NP_FNS = {"ABS": np.abs, "ACOS": np.arccos, "ASIN": np.arcsin,
           "ATAN": np.arctan, "CEIL": np.ceil, "COS": np.cos, "COSH": np.cosh,
           "EXP": np.exp, "FLOOR": np.floor, "LOG": np.log, "LOG10": np.log10,
           "SIGNUM": np.sign, "SIN": np.sin, "SINH": np.sinh, "SQRT": np.sqrt,
           "TAN": np.tan, "TANH": np.tanh}


def _as_matrix(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray, pa.DataType]:
    """list<float> column → (flat values, offsets, value type)."""
    arr = combine(col)
    if isinstance(arr, pa.FixedSizeListArray):
        width = arr.type.list_size
        offsets = np.arange(0, (len(arr) + 1) * width, width)
        flat = arr.flatten()
    else:
        offsets = np.asarray(arr.offsets)
        flat = arr.flatten()
    return flat.to_numpy(zero_copy_only=False), offsets, arr.type.value_type


def _rebuild(flat: np.ndarray, offsets: np.ndarray, vtype: pa.DataType) -> pa.Array:
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                    pa.array(flat, type=vtype))


@register("step")
class NDArrayScalarOp(Step):
    """Elementwise col ⊕ scalar in place (NDArrayScalarOpTransform.java:36)."""

    def __init__(self, column: str, op: str, scalar: float):
        if op not in ("Add", "Subtract", "Multiply", "Divide", "Modulus",
                      "ReverseSubtract", "ReverseDivide", "ScalarMin", "ScalarMax"):
            raise ValueError(f"unknown MathOp {op!r}")
        self.column, self.op, self.scalar = column, op, scalar

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        return schema

    def apply(self, table: pa.Table) -> pa.Table:
        flat, offsets, vtype = _as_matrix(table[self.column])
        s = self.scalar
        out = {"Add": lambda x: x + s, "Subtract": lambda x: x - s,
               "Multiply": lambda x: x * s, "Divide": lambda x: x / s,
               "Modulus": lambda x: np.fmod(x, s),
               "ReverseSubtract": lambda x: s - x,
               "ReverseDivide": lambda x: s / x,
               "ScalarMin": lambda x: np.minimum(x, s),
               "ScalarMax": lambda x: np.maximum(x, s)}[self.op](flat)
        return set_column(table, self.column,
                          _rebuild(out.astype(flat.dtype, copy=False), offsets, vtype))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "NDArrayScalarOp", "column": self.column, "op": self.op,
                "scalar": self.scalar}


@register("step")
class NDArrayColumnsMathOp(Step):
    """New vector column = a ⊕ b elementwise (NDArrayColumnsMathOpTransform.java:40)."""

    def __init__(self, new_column: str, op: str, columns: list[str]):
        if len(columns) != 2:
            raise ValueError("NDArrayColumnsMathOp takes exactly two columns")
        self.new_column, self.op, self.columns = new_column, op, list(columns)

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(*self.columns)
        return schema.with_column(self.new_column, schema.type_of(self.columns[0]),
                                  schema.meta_of(self.columns[0]))

    def apply(self, table: pa.Table) -> pa.Table:
        a, offsets, vtype = _as_matrix(table[self.columns[0]])
        b, _, _ = _as_matrix(table[self.columns[1]])
        with np.errstate(divide="ignore", invalid="ignore"):
            # 0/0 → nan, x/0 → inf by design (Java broadcast-div parity)
            out = {"Add": a + b, "Subtract": a - b, "Multiply": a * b,
                   "Divide": a / b}[self.op]
        return table.append_column(
            pa.field(self.new_column, pa.list_(vtype)),
            _rebuild(out.astype(a.dtype, copy=False), offsets, vtype))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "NDArrayColumnsMathOp", "new_column": self.new_column,
                "op": self.op, "columns": self.columns}


@register("step")
class NDArrayMathFunction(Step):
    """Elementwise ufunc in place (NDArrayMathFunctionTransform.java:35)."""

    def __init__(self, column: str, function: str):
        if function not in _NP_FNS:
            raise ValueError(f"unknown MathFunction {function!r}")
        self.column, self.function = column, function

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        return schema

    def apply(self, table: pa.Table) -> pa.Table:
        flat, offsets, vtype = _as_matrix(table[self.column])
        out = _NP_FNS[self.function](flat)
        return set_column(table, self.column,
                          _rebuild(out.astype(flat.dtype, copy=False), offsets, vtype))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "NDArrayMathFunction", "column": self.column,
                "function": self.function}


@register("step")
class NDArrayDistance(Step):
    """New Double column = distance(colA, colB) per row
    (NDArrayDistanceTransform.java:42). distance ∈ COSINE | EUCLIDEAN |
    MANHATTAN | DOT (dot product added beyond the reference for the
    similarity-search path)."""

    def __init__(self, new_column: str, distance: str, first: str, second: str):
        if distance not in ("COSINE", "EUCLIDEAN", "MANHATTAN", "DOT"):
            raise ValueError(f"unknown Distance {distance!r}")
        self.new_column, self.distance = new_column, distance
        self.first, self.second = first, second

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.first, self.second)
        return schema.with_column(self.new_column, pa.float64(), ColumnMeta("Double"))

    def apply(self, table: pa.Table) -> pa.Table:
        a_flat, offsets, _ = _as_matrix(table[self.first])
        b_flat, _, _ = _as_matrix(table[self.second])
        widths = np.diff(offsets)
        if len(set(widths.tolist())) <= 1 and len(widths) > 0:
            w = int(widths[0]) if len(widths) else 0
            a = a_flat.reshape(-1, w).astype(np.float64)
            b = b_flat.reshape(-1, w).astype(np.float64)
            if self.distance == "COSINE":
                num = (a * b).sum(axis=1)
                den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
                out = num / np.where(den == 0, 1, den)
            elif self.distance == "EUCLIDEAN":
                out = np.linalg.norm(a - b, axis=1)
            elif self.distance == "MANHATTAN":
                out = np.abs(a - b).sum(axis=1)
            else:
                out = (a * b).sum(axis=1)
        else:
            # ragged: segment-reduce on the flat buffer
            d = (a_flat.astype(np.float64), b_flat.astype(np.float64))
            seg = np.repeat(np.arange(len(widths)), widths)
            prod = np.zeros(len(widths)); na = np.zeros(len(widths)); nb = np.zeros(len(widths))
            np.add.at(prod, seg, d[0] * d[1])
            np.add.at(na, seg, d[0] ** 2)
            np.add.at(nb, seg, d[1] ** 2)
            if self.distance == "COSINE":
                den = np.sqrt(na) * np.sqrt(nb)
                out = prod / np.where(den == 0, 1, den)
            elif self.distance == "EUCLIDEAN":
                diff2 = np.zeros(len(widths))
                np.add.at(diff2, seg, (d[0] - d[1]) ** 2)
                out = np.sqrt(diff2)
            elif self.distance == "MANHATTAN":
                absd = np.zeros(len(widths))
                np.add.at(absd, seg, np.abs(d[0] - d[1]))
                out = absd
            else:
                out = prod
        return table.append_column(pa.field(self.new_column, pa.float64()),
                                   pa.array(out, type=pa.float64()))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "NDArrayDistance", "new_column": self.new_column,
                "distance": self.distance, "first": self.first,
                "second": self.second}
