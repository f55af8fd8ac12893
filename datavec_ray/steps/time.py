"""Time steps. SURVEY.md §2.6.

Parity targets (datavec-api/.../transform/transform/time/):
StringToTimeTransform.java:41 (Joda-format parse → long-millis Time column),
DeriveColumnsFromTimeTransform.java:58 (derive year/month/day/... columns).
TimeMathOp lives in steps/math.py (TimeMathOpTransform.java:39).

Timestamps are UTC-naive Arrow timestamps (DataVec stores UTC millis; the
reference's timezone metadata is carried in ColumnMeta.timezone).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from datavec_ray.registry import register
from datavec_ray.schema import ColumnMeta, Schema
from datavec_ray.steps.base import Step, combine, set_column

# Joda/Java pattern → strptime pattern (common subset)
_JODA_MAP = [
    ("YYYY", "%Y"), ("yyyy", "%Y"), ("MM", "%m"), ("dd", "%d"),
    ("HH", "%H"), ("mm", "%M"), ("ss", "%S"),
]


def _to_strptime(fmt: str) -> str:
    if "%" in fmt:
        return fmt  # already strptime
    for j, s in _JODA_MAP:
        fmt = fmt.replace(j, s)
    return fmt


@register("step")
class StringToTime(Step):
    """Parse a date string column → timestamp[ms] (StringToTimeTransform.java:41).

    Accepts either a Joda-style pattern ("YYYY-MM-dd HH:mm:ss") or a
    strptime pattern ("%Y-%m-%d %H:%M:%S").
    """

    def __init__(self, column: str, fmt: str = "YYYY-MM-dd HH:mm:ss",
                 timezone: Optional[str] = None):
        self.column, self.fmt, self.timezone = column, fmt, timezone

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        return schema.with_type(self.column, pa.timestamp("ms"),
                                ColumnMeta("Time", timezone=self.timezone))

    def apply(self, table: pa.Table) -> pa.Table:
        out = pc.strptime(table[self.column], format=_to_strptime(self.fmt),
                          unit="ms")
        return set_column(table, self.column, combine(out))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "StringToTime", "column": self.column, "fmt": self.fmt,
                "timezone": self.timezone}


_DERIVE_FNS = {
    "year": (pc.year, pa.int32(), "Integer"),
    "month": (pc.month, pa.int32(), "Integer"),
    "day": (pc.day, pa.int32(), "Integer"),
    "day_of_week": (pc.day_of_week, pa.int32(), "Integer"),
    "day_of_year": (pc.day_of_year, pa.int32(), "Integer"),
    "hour": (pc.hour, pa.int32(), "Integer"),
    "minute": (pc.minute, pa.int32(), "Integer"),
    "second": (pc.second, pa.int32(), "Integer"),
    "millisecond": (pc.millisecond, pa.int32(), "Integer"),
    "epoch_ms": (None, pa.int64(), "Long"),
}


@register("step")
class DeriveColumnsFromTime(Step):
    """Append derived columns from a Time column
    (DeriveColumnsFromTimeTransform.java:58).

    ``fields`` is a list of [field, new_column] pairs; field ∈
    year/month/day/day_of_week/day_of_year/hour/minute/second/millisecond/
    epoch_ms, or a strptime format string → a formatted String column
    (the reference's "string output" mode).
    """

    def __init__(self, column: str, fields: Sequence[Sequence[str]]):
        self.column = column
        self.fields = [list(f) for f in fields]

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        if not pa.types.is_timestamp(schema.type_of(self.column)):
            raise TypeError(f"DeriveColumnsFromTime on non-Time column {self.column!r}")
        out = schema
        for field, new_name in self.fields:
            if field in _DERIVE_FNS:
                _, typ, ct = _DERIVE_FNS[field]
                out = out.with_column(new_name, typ, ColumnMeta(ct))
            else:
                out = out.with_column(new_name, pa.string(), ColumnMeta("String"))
        return out

    def apply(self, table: pa.Table) -> pa.Table:
        col = table[self.column]
        for field, new_name in self.fields:
            if field == "epoch_ms":
                arr = combine(col).cast(pa.int64())
                ms_per = {"s": 1000, "ms": 1, "us": 1 / 1000, "ns": 1 / 1_000_000}[col.type.unit]
                if ms_per != 1:
                    arr = combine(pc.cast(pc.multiply(
                        pc.cast(arr, pa.float64()), ms_per), pa.int64()))
                table = table.append_column(pa.field(new_name, pa.int64()), arr)
            elif field in _DERIVE_FNS:
                fn, typ, _ = _DERIVE_FNS[field]
                arr = combine(pc.cast(fn(col), typ))
                table = table.append_column(pa.field(new_name, typ), arr)
            else:
                arr = combine(pc.strftime(col, format=_to_strptime(field)))
                table = table.append_column(pa.field(new_name, pa.string()), arr)
        return table

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "DeriveColumnsFromTime", "column": self.column,
                "fields": self.fields}
