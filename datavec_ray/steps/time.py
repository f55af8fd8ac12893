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

# Joda/Java token run → strptime directive. Keyed by (letter, run length
# bucket); None length = any run length of that letter.
_JODA_TOKENS = {
    ("y", 2): "%y", ("y", None): "%Y",
    ("Y", 2): "%y", ("Y", None): "%Y",   # year-of-era ≈ year for CE dates
    ("M", 3): "%b", ("M", 4): "%B", ("M", None): "%m",
    ("d", None): "%d",
    ("E", 4): "%A", ("E", None): "%a",
    ("H", None): "%H",
    ("h", None): "%I",
    ("m", None): "%M",
    ("s", None): "%S",
    ("S", None): "%f",                    # fraction-of-second (parse-ok)
    ("a", None): "%p",
    ("D", None): "%j",
    ("Z", None): "%z",
    ("z", None): "%Z",
}


def joda_to_strptime(fmt: str) -> str:
    """Strict Joda/Java date pattern → strptime conversion
    (``time/StringToTimeTransform.java:41`` supports full Joda patterns).

    Tokenizes the pattern (letter runs, ``'...'`` quoted literals) and
    raises ``ValueError`` at BUILD time on any Joda token without a
    strptime equivalent (era ``G``, week-year ``x``/``w``, numeric
    day-of-week ``e``, clockhour variants ``K``/``k``) — never silently
    mis-parses.
    """
    out = []
    i, n = 0, len(fmt)
    while i < n:
        ch = fmt[i]
        if ch == "'":                      # Joda literal quoting
            j = i + 1
            while j < n:
                if fmt[j] == "'":
                    if j + 1 < n and fmt[j + 1] == "'":  # escaped ''
                        out.append("'")
                        j += 2
                        continue
                    break
                out.append(fmt[j].replace("%", "%%"))
                j += 1
            else:
                raise ValueError(f"unterminated quote in pattern {fmt!r}")
            i = j + 1
            continue
        if ch.isalpha():
            j = i
            while j < n and fmt[j] == ch:
                j += 1
            run = j - i
            tok = _JODA_TOKENS.get((ch, run)) or _JODA_TOKENS.get((ch, None))
            if tok is None:
                raise ValueError(
                    f"unsupported Joda token {ch * run!r} in pattern {fmt!r}; "
                    f"supported letters: "
                    f"{sorted({k[0] for k in _JODA_TOKENS})}")
            out.append(tok)
            i = j
        else:
            out.append("%%" if ch == "%" else ch)
            i += 1
    return "".join(out)


def _to_strptime(fmt: str) -> str:
    if "%" in fmt:
        return fmt  # already strptime
    return joda_to_strptime(fmt)


@register("step")
class StringToTime(Step):
    """Parse a date string column → timestamp[ms] (StringToTimeTransform.java:41).

    Accepts either a Joda-style pattern ("YYYY-MM-dd HH:mm:ss") or a
    strptime pattern ("%Y-%m-%d %H:%M:%S").
    """

    def __init__(self, column: str, fmt: str = "YYYY-MM-dd HH:mm:ss",
                 timezone: Optional[str] = None):
        self.column, self.fmt, self.timezone = column, fmt, timezone
        _to_strptime(fmt)  # fail fast at BUILD time on unsupported patterns

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
