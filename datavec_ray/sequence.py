"""Sequence (time-series) operators. SURVEY.md §2.8.

Parity targets (datavec-api/.../transform/sequence/):
- ``ConvertToSequence.java:41-103`` — group rows by key column(s), order
  each group by a comparator column (``comparator/NumericalColumnComparator``).
- ``SequenceOffsetTransform.java:57`` — lag/lead chosen columns by ±n
  steps, InPlace or NewColumn, edge handling TrimSequence/SpecifiedValue.
- ``SequenceDifferenceTransform.java:50`` — x(t) − x(t−s).
- ``SequenceMovingWindowReduceTransform.java:54`` — trailing-window reduce.
- ``trim/SequenceTrimTransform.java:38``, ``split/SequenceSplitTimeSeparation.java:43``,
  ``split/SplitMaxLengthSequence.java:38``, ``ReduceSequenceTransform.java:42``,
  ``window/TimeWindowFunction.java:32-44`` (tumbling),
  ``window/OverlappingTimeWindowFunction.java:56`` (sliding),
  ``condition/sequence/SequenceLengthCondition.java:39``.

Representation: a sequence is the flat group of rows sharing the key
column(s) (SURVEY.md §1.2 option (a)); transcripts use key=conv_id,
comparator=turn_idx. Execution = ONE ``groupby(keys).map_groups`` shuffle
per GroupedSequence stage; the group fn re-sorts by the comparator (the
"stable total order within key group" invariant, tiebreak by extra order
columns) then applies the whole op chain vectorized (numpy/pandas on the
sorted group). This mirrors Spark's groupByKey + in-group sort
(``SparkTransformExecutor.java:216-236``) with the map-side work fused.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datavec_ray.registry import register, resolve
from datavec_ray.reduce import _Acc, _out_type
from datavec_ray.schema import ColumnMeta, Schema
from datavec_ray.steps.base import WideStep, combine


# ---------------------------------------------------------------------------
# Per-sequence ops (applied to one sorted group table)
# ---------------------------------------------------------------------------

class SequenceOp:
    def output_schema(self, schema: Schema) -> Schema:
        raise NotImplementedError

    def apply_group(self, table: pa.Table) -> pa.Table:
        raise NotImplementedError

    # Optional fast path: vectorized across ALL groups of one hash
    # partition at once (pandas groupby kernels), df already sorted by
    # (keys..., order_by...). Ops without it force the per-group path.
    apply_partition = None

    def supports_partition(self) -> bool:
        return getattr(self, "apply_partition", None) is not None

    def to_dict(self) -> dict[str, Any]:
        raise NotImplementedError

    @classmethod
    def from_dict(cls, d):
        kwargs = {k: v for k, v in d.items() if k != "cls"}
        return cls(**kwargs)


@register("seqop")
class SequenceOffset(SequenceOp):
    """Shift chosen columns by ±n steps (SequenceOffsetTransform.java:57).

    offset > 0: value at step t becomes the value from step t-offset (lag);
    offset < 0: lead. mode: "InPlace" | "NewColumn" (suffix "_offset{n}").
    edge: "TrimSequence" (drop steps lacking data) | "SpecifiedValue".
    """

    def __init__(self, columns: Sequence[str], offset: int, mode: str = "InPlace",
                 edge: str = "TrimSequence", value: Any = None):
        if mode not in ("InPlace", "NewColumn"):
            raise ValueError("mode must be InPlace or NewColumn")
        if edge not in ("TrimSequence", "SpecifiedValue"):
            raise ValueError("edge must be TrimSequence or SpecifiedValue")
        self.columns, self.offset, self.mode, self.edge, self.value = \
            list(columns), offset, mode, edge, value

    def _new_names(self) -> list[str]:
        return [f"{c}_offset{self.offset}" for c in self.columns]

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(*self.columns)
        out = schema
        if self.mode == "NewColumn":
            for c, n in zip(self.columns, self._new_names()):
                out = out.with_column(n, schema.type_of(c), schema.meta_of(c))
        return out

    def apply_group(self, table: pa.Table) -> pa.Table:
        n = table.num_rows
        k = self.offset
        for c, new in zip(self.columns, self._new_names()):
            col = combine(table[c])
            if k >= 0:
                idx = np.arange(n) - k
            else:
                idx = np.arange(n) - k  # lead: idx > n-1 out of range
            valid = (idx >= 0) & (idx < n)
            take_idx = pa.array(np.where(valid, idx, 0), type=pa.int64())
            shifted = pc.take(col, take_idx)
            if self.edge == "SpecifiedValue":
                fillval = pa.scalar(self.value, type=col.type)
                shifted = pc.if_else(pa.array(valid), shifted, fillval)
            else:
                shifted = pc.if_else(pa.array(valid), shifted,
                                     pa.scalar(None, type=col.type))
            target = c if self.mode == "InPlace" else new
            if target in table.column_names:
                i = table.schema.get_field_index(target)
                table = table.set_column(i, pa.field(target, col.type), combine(shifted))
            else:
                table = table.append_column(pa.field(target, col.type), combine(shifted))
        if self.edge == "TrimSequence":
            if k >= 0:
                table = table.slice(k)
            else:
                table = table.slice(0, max(0, n + k))
        return table

    def apply_partition(self, df, keys):
        import pandas as pd
        g = df.groupby(keys, sort=False, group_keys=False)
        k = self.offset
        # Edge positions = steps that have no source step to shift from.
        # Only THESE get the specified fill — genuine nulls shifted in
        # from the data stay null, matching apply_group's pc.if_else on
        # the out-of-range mask (parity contract with _GroupFn).
        pos = g.cumcount()
        n = g[keys[0]].transform("size")
        edge = (pos < k) if k >= 0 else (pos >= n + k)
        for c, new in zip(self.columns, self._new_names()):
            target = c if self.mode == "InPlace" else new
            shifted = g[c].shift(k)
            if (pd.api.types.is_integer_dtype(df[c].dtype)
                    and not pd.api.types.is_extension_array_dtype(shifted.dtype)):
                # keep integer columns integral (nullable) instead of the
                # float64 that pandas shift() produces
                shifted = shifted.astype("Int64")
            if self.edge == "SpecifiedValue":
                shifted = shifted.mask(edge, self.value)
            df[target] = shifted
        if self.edge == "TrimSequence":
            if k >= 0:
                df = df[pos >= k]
            else:
                df = df[pos < n + k]
        return df

    def to_dict(self):
        return {"cls": "SequenceOffset", "columns": self.columns,
                "offset": self.offset, "mode": self.mode, "edge": self.edge,
                "value": self.value}


@register("seqop")
class SequenceCumulativeSum(SequenceOp):
    """Running (prefix) sum of chosen columns within each sequence — the
    windowed-aggregate ``SUM() OVER (PARTITION BY key ORDER BY comparator
    ROWS UNBOUNDED PRECEDING)``. No direct reference counterpart (the
    reference reaches for SequenceMovingWindowReduce with an unbounded
    window); provided first-class because running totals over event
    streams are a standard training-data feature.

    Null semantics match SQL: a null value leaves the running sum
    unchanged (row still emitted with the current total); rows before
    the first non-null value emit null.
    """

    def __init__(self, columns: Sequence[str], mode: str = "NewColumn"):
        if mode not in ("InPlace", "NewColumn"):
            raise ValueError("mode must be InPlace or NewColumn")
        self.columns, self.mode = list(columns), mode

    def _new_names(self) -> list[str]:
        return [f"{c}_cumsum" for c in self.columns]

    def _out_type(self, typ: pa.DataType) -> pa.DataType:
        return pa.int64() if pa.types.is_integer(typ) else pa.float64()

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(*self.columns)
        out = schema
        for c, n in zip(self.columns, self._new_names()):
            t = self._out_type(schema.type_of(c))
            out = (out.with_type(c, t) if self.mode == "InPlace"
                   else out.with_column(n, t))
        return out

    def apply_group(self, table: pa.Table) -> pa.Table:
        for c, new in zip(self.columns, self._new_names()):
            col = combine(table[c])
            out_t = self._out_type(col.type)
            if pa.types.is_integer(col.type) and col.null_count == 0:
                # exact int64 prefix sum (no float round-trip)
                s = np.cumsum(col.to_numpy(zero_copy_only=False)
                              .astype(np.int64))
                out = pa.array(s, type=out_t)
            else:
                a = col.to_numpy(zero_copy_only=False).astype(np.float64)
                nulls = np.isnan(a)
                s = np.cumsum(np.where(nulls, 0.0, a))
                seen = np.cumsum(~nulls) > 0
                vals = s.astype(np.int64) if pa.types.is_int64(out_t) else s
                out = pa.array(vals, type=out_t, mask=~seen)
            target = c if self.mode == "InPlace" else new
            if target in table.column_names:
                i = table.schema.get_field_index(target)
                table = table.set_column(i, pa.field(target, out_t), out)
            else:
                table = table.append_column(pa.field(target, out_t), out)
        return table

    def apply_partition(self, df, keys):
        import pandas as pd
        key_cols = [df[k] for k in keys]
        for c, new in zip(self.columns, self._new_names()):
            col = df[c]
            filled = col.fillna(0)
            cs = filled.groupby(key_cols, sort=False).cumsum()
            seen = col.notna().astype("int64").groupby(
                key_cols, sort=False).cumsum() > 0
            cs = cs.where(seen)
            target = c if self.mode == "InPlace" else new
            if pd.api.types.is_integer_dtype(col.dtype):
                df[target] = (cs.astype("Int64") if cs.isna().any()
                              else cs.astype("int64"))
            else:
                df[target] = cs.astype("float64")
        return df

    def to_dict(self):
        return {"cls": "SequenceCumulativeSum", "columns": self.columns,
                "mode": self.mode}


@register("seqop")
class SequenceDifference(SequenceOp):
    """x(t) − x(t−lookback) in place (SequenceDifferenceTransform.java:50).
    first_mode "Default" → first `lookback` steps get 0; "SpecifiedValue" →
    `value`."""

    def __init__(self, column: str, lookback: int = 1,
                 first_mode: str = "Default", value: Any = None,
                 new_column: Optional[str] = None):
        self.column, self.lookback = column, lookback
        self.first_mode, self.value, self.new_column = first_mode, value, new_column

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        typ = schema.type_of(self.column)
        out_t = pa.int64() if pa.types.is_timestamp(typ) else typ
        if self.new_column:
            return schema.with_column(self.new_column, out_t)
        return schema.with_type(self.column, out_t)

    def apply_group(self, table: pa.Table) -> pa.Table:
        n = table.num_rows
        col = combine(table[self.column])
        is_ts = pa.types.is_timestamp(col.type)
        work = col.cast(pa.int64()) if is_ts else col
        k = self.lookback
        idx = np.maximum(np.arange(n) - k, 0)
        prev = pc.take(work, pa.array(idx, type=pa.int64()))
        diff = pc.subtract(work, prev)
        first = np.arange(n) < k
        if self.first_mode == "SpecifiedValue":
            fv = pa.scalar(self.value, type=diff.type)
        else:
            fv = pa.scalar(0, type=diff.type)
        out = combine(pc.if_else(pa.array(first), fv, diff))
        target = self.new_column or self.column
        if target in table.column_names:
            i = table.schema.get_field_index(target)
            return table.set_column(i, pa.field(target, out.type), out)
        return table.append_column(pa.field(target, out.type), out)

    def apply_partition(self, df, keys):
        import pandas as pd
        g = df.groupby(keys, sort=False, group_keys=False)
        col = df[self.column]
        is_ts = str(col.dtype).startswith("datetime")
        work = col.astype("int64") if is_ts else col
        shifted = work.groupby([df[k] for k in keys], sort=False).shift(self.lookback)
        diff = work - shifted
        fv = self.value if self.first_mode == "SpecifiedValue" else 0
        # fill ONLY the first `lookback` edge steps of each sequence —
        # null data values keep producing null diffs, matching
        # apply_group's out-of-range mask (parity contract with _GroupFn)
        edge = g.cumcount() < self.lookback
        diff = diff.mask(edge, fv)
        target = self.new_column or self.column
        if is_ts or pd.api.types.is_integer_dtype(col.dtype):
            if diff.isna().any():
                df[target] = diff.astype("Int64")
            else:
                df[target] = diff.astype("int64")
        else:
            df[target] = diff
        return df

    def to_dict(self):
        return {"cls": "SequenceDifference", "column": self.column,
                "lookback": self.lookback, "first_mode": self.first_mode,
                "value": self.value, "new_column": self.new_column}


@register("seqop")
class MovingWindowReduce(SequenceOp):
    """new col = ReduceOp over the trailing window of N values (incl.
    current; fewer at sequence start → reduce over available)
    (SequenceMovingWindowReduceTransform.java:54). op ∈ Sum/Mean/Min/Max/
    Stdev/Count."""

    def __init__(self, column: str, window: int, op: str, new_column: str):
        self.column, self.window, self.op, self.new_column = column, window, op, new_column

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        return schema.with_column(self.new_column,
                                  _out_type(self.op, schema.type_of(self.column)))

    def apply_group(self, table: pa.Table) -> pa.Table:
        import pandas as pd
        s = pd.Series(combine(table[self.column]).to_numpy(zero_copy_only=False))
        r = s.rolling(self.window, min_periods=1)
        fn = {"Sum": r.sum, "Mean": r.mean, "Min": r.min, "Max": r.max,
              "Stdev": r.std, "Count": r.count}[self.op]
        vals = fn()
        out_t = _out_type(self.op, combine(table[self.column]).type)
        arr = pa.array(vals.to_numpy(), type=out_t)
        return table.append_column(pa.field(self.new_column, out_t), arr)

    def apply_partition(self, df, keys):
        g = df.groupby(keys, sort=False, group_keys=False)[self.column]
        r = g.rolling(self.window, min_periods=1)
        fn = {"Sum": r.sum, "Mean": r.mean, "Min": r.min, "Max": r.max,
              "Stdev": r.std, "Count": r.count}[self.op]
        vals = fn().reset_index(drop=True)
        vals.index = df.index
        df[self.new_column] = vals
        if self.op == "Count":
            df[self.new_column] = df[self.new_column].astype("int64")
        return df

    def to_dict(self):
        return {"cls": "MovingWindowReduce", "column": self.column,
                "window": self.window, "op": self.op, "new_column": self.new_column}


@register("seqop")
class SequenceTrim(SequenceOp):
    """Drop the first (or last) N steps (trim/SequenceTrimTransform.java:38)."""

    def __init__(self, num_steps: int, from_start: bool = True):
        self.num_steps, self.from_start = num_steps, from_start

    def output_schema(self, schema: Schema) -> Schema:
        return schema

    def apply_group(self, table: pa.Table) -> pa.Table:
        if self.from_start:
            return table.slice(self.num_steps)
        return table.slice(0, max(0, table.num_rows - self.num_steps))

    def apply_partition(self, df, keys):
        g = df.groupby(keys, sort=False, group_keys=False)
        pos = g.cumcount()
        if self.from_start:
            return df[pos >= self.num_steps]
        n = g[keys[0]].transform("size")
        return df[pos < n - self.num_steps]

    def to_dict(self):
        return {"cls": "SequenceTrim", "num_steps": self.num_steps,
                "from_start": self.from_start}


@register("seqop")
class SplitTimeSeparation(SequenceOp):
    """Append a sub-sequence id that increments wherever the gap between
    consecutive time steps exceeds the threshold
    (split/SequenceSplitTimeSeparation.java:43). The original sequence is
    thereby split into (key, sub_id) sequences."""

    def __init__(self, time_column: str, threshold_ms: int,
                 new_column: str = "sub_seq"):
        self.time_column, self.threshold_ms, self.new_column = \
            time_column, threshold_ms, new_column

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.time_column)
        return schema.with_column(self.new_column, pa.int64(), ColumnMeta("Long"))

    def apply_group(self, table: pa.Table) -> pa.Table:
        col = combine(table[self.time_column])
        unit = col.type.unit if pa.types.is_timestamp(col.type) else None
        t = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        scale = {"s": 0.001, "ms": 1, "us": 1000, "ns": 1_000_000}.get(unit, 1)
        thresh = self.threshold_ms * scale
        gaps = np.diff(t, prepend=t[0] if len(t) else 0) > thresh
        sub = np.cumsum(gaps).astype(np.int64)
        return table.append_column(pa.field(self.new_column, pa.int64()),
                                   pa.array(sub))

    def apply_partition(self, df, keys):
        col = df[self.time_column]
        dt = str(col.dtype)
        t = col.astype("int64")
        unit_scale = {"datetime64[s]": 0.001, "datetime64[ms]": 1,
                      "datetime64[us]": 1000,
                      "datetime64[ns]": 1_000_000}.get(dt, 1)
        thresh = self.threshold_ms * unit_scale
        gaps = t.groupby([df[k] for k in keys], sort=False).diff().fillna(0)
        over = (gaps > thresh).astype("int64")
        df[self.new_column] = over.groupby(
            [df[k] for k in keys], sort=False).cumsum()
        return df

    def to_dict(self):
        return {"cls": "SplitTimeSeparation", "time_column": self.time_column,
                "threshold_ms": self.threshold_ms, "new_column": self.new_column}


@register("seqop")
class SplitMaxLength(SequenceOp):
    """Append sub-sequence id = step_index // max_length
    (split/SplitMaxLengthSequence.java:38, equal-split mode)."""

    def __init__(self, max_length: int, new_column: str = "sub_seq"):
        self.max_length, self.new_column = max_length, new_column

    def output_schema(self, schema: Schema) -> Schema:
        return schema.with_column(self.new_column, pa.int64(), ColumnMeta("Long"))

    def apply_group(self, table: pa.Table) -> pa.Table:
        sub = (np.arange(table.num_rows) // self.max_length).astype(np.int64)
        return table.append_column(pa.field(self.new_column, pa.int64()),
                                   pa.array(sub))

    def apply_partition(self, df, keys):
        pos = df.groupby(keys, sort=False, group_keys=False).cumcount()
        df[self.new_column] = (pos // self.max_length).astype("int64")
        return df

    def to_dict(self):
        return {"cls": "SplitMaxLength", "max_length": self.max_length,
                "new_column": self.new_column}


@register("seqop")
class ReduceSequence(SequenceOp):
    """Reduce the whole sequence to one row (ReduceSequenceTransform.java:42)
    using the ReduceOp monoid set. specs: [column, op, out_name]."""

    def __init__(self, keys: Sequence[str], specs: Sequence[Sequence[Any]],
                 append_delimiter: str = ","):
        self.keys = list(keys)
        self.specs = [[s[0], s[1], (s[2] if len(s) > 2 and s[2] else f"{s[1].lower()}({s[0]})")]
                      for s in specs]
        self.append_delimiter = append_delimiter

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(*self.keys)
        fields = [(k, schema.type_of(k)) for k in self.keys]
        for col, op, out in self.specs:
            schema.require(col)
            fields.append((out, _out_type(op, schema.type_of(col))))
        return Schema(fields)

    def apply_group(self, table: pa.Table) -> pa.Table:
        out_schema = self.output_schema(Schema(table.schema))
        data = {}
        for k in self.keys:
            data[k] = [table[k][0].as_py()] if table.num_rows else []
        for col, op, out in self.specs:
            acc = _Acc(op)
            st = acc.accumulate(acc.zero(), table[col])
            data[out] = [acc.finalize(st, self.append_delimiter)]
        return pa.table({n: pa.array(data[n], type=out_schema.type_of(n))
                         for n in out_schema.names}, schema=out_schema.arrow())

    def supports_partition(self) -> bool:
        return all(op in _PD_AGG for _, op, _ in self.specs)

    def apply_partition(self, df, keys):
        return _pandas_group_agg(df, list(self.keys), self.specs)

    def to_dict(self):
        return {"cls": "ReduceSequence", "keys": self.keys, "specs": self.specs,
                "append_delimiter": self.append_delimiter}


def _validate_window_ms(unit: str, window_ms: int, offset_ms: int,
                        separation_ms: Optional[int] = None):
    """Window params are in ms; validate against the time column's unit."""
    vals = [int(window_ms), int(offset_ms)] + (
        [int(separation_ms)] if separation_ms is not None else [])
    if vals[0] < 1 or (separation_ms is not None and vals[2] < 1):
        raise ValueError(f"window_ms/separation_ms must be >= 1 (got "
                         f"window_ms={window_ms}, separation_ms={separation_ms})")
    if unit == "s" and any(v % 1000 for v in vals):
        raise ValueError(
            "time column has second resolution; window_ms/offset_ms/"
            f"separation_ms must be whole seconds (got {vals})")
    return tuple(vals) if separation_ms is not None else (vals[0], vals[1])


def _raw_to_ms(t, unit: str):
    if unit == "s":
        return t * 1000
    if unit == "us":
        return t // 1000
    if unit == "ns":
        return t // 1_000_000
    return t


def _ms_to_raw(v, unit: str):
    if unit == "s":
        return v // 1000
    if unit == "us":
        return v * 1000
    if unit == "ns":
        return v * 1_000_000
    return v


def _ms_to_raw_scalar(v: int, unit: str) -> int:
    return int(_ms_to_raw(np.int64(v), unit))


@register("seqop")
class TumblingTimeWindowReduce(SequenceOp):
    """Non-overlapping time windows, reduced per window
    (window/TimeWindowFunction.java:32-44 + ReduceSequenceByWindowTransform).

    Window start T such that (T + offset) % window_ms == 0; each step
    belongs to exactly one window. Output: one row per non-empty window:
    keys + window_start (+window_end) + reductions. Empty windows are NOT
    emitted (reference's default excludeEmptyWindows=false emits them; we
    document the difference — emitting empties over a 100 TB stream is an
    anti-pattern)."""

    def __init__(self, keys: Sequence[str], time_column: str, window_ms: int,
                 specs: Sequence[Sequence[Any]], offset_ms: int = 0,
                 emit_window_bounds: bool = True, append_delimiter: str = ","):
        self.keys = list(keys)
        self.time_column, self.window_ms, self.offset_ms = time_column, window_ms, offset_ms
        self.specs = [[s[0], s[1], (s[2] if len(s) > 2 and s[2] else f"{s[1].lower()}({s[0]})")]
                      for s in specs]
        self.emit_window_bounds = emit_window_bounds
        self.append_delimiter = append_delimiter

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.time_column, *self.keys)
        fields = [(k, schema.type_of(k)) for k in self.keys]
        tcol_t = schema.type_of(self.time_column)
        fields.append(("window_start", tcol_t))
        if self.emit_window_bounds:
            fields.append(("window_end", tcol_t))
        for col, op, out in self.specs:
            schema.require(col)
            fields.append((out, _out_type(op, schema.type_of(col))))
        return Schema(fields)

    def _windows(self, table: pa.Table) -> tuple[np.ndarray, np.ndarray, Any]:
        col = combine(table[self.time_column])
        is_ts = pa.types.is_timestamp(col.type)
        unit = col.type.unit if is_ts else "ms"
        t_raw = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        # All window math happens in MILLISECONDS (the reference stores
        # time as long millis, TimeWindowFunction.java:32); converting the
        # column to ms — not the window into the column's unit — avoids
        # w=0 / silent truncation for sub-unit windows.
        w, off = _validate_window_ms(unit, self.window_ms, self.offset_ms)
        t_ms = _raw_to_ms(t_raw, unit)
        start_ms = ((t_ms + off) // w) * w - off
        return t_raw, _ms_to_raw(start_ms, unit), (col.type, _ms_to_raw_scalar(w, unit))

    def apply_group(self, table: pa.Table) -> pa.Table:
        out_schema = self.output_schema(Schema(table.schema))
        t, start, (tcol_t, w) = self._windows(table)
        uniq, codes = np.unique(start, return_inverse=True)
        data: dict[str, list] = {}
        for k in self.keys:
            data[k] = [table[k][0].as_py()] * len(uniq) if table.num_rows else []
        data["window_start"] = list(uniq)
        if self.emit_window_bounds:
            data["window_end"] = list(uniq + w)
        for col_name, op, out in self.specs:
            acc = _Acc(op)
            vals = []
            for g in range(len(uniq)):
                sub = table[col_name].filter(pa.array(codes == g))
                st = acc.accumulate(acc.zero(), sub)
                vals.append(acc.finalize(st, self.append_delimiter))
            data[out] = vals
        arrays = {}
        for n in out_schema.names:
            typ = out_schema.type_of(n)
            if n in ("window_start", "window_end") and pa.types.is_timestamp(typ):
                arrays[n] = pa.array(np.array(data[n], dtype=np.int64)).cast(typ)
            else:
                arrays[n] = pa.array(data[n], type=typ)
        return pa.table(arrays, schema=out_schema.arrow())

    def supports_partition(self) -> bool:
        return all(op in _PD_AGG for _, op, _ in self.specs)

    def apply_partition(self, df, keys):
        import pandas as pd
        col = df[self.time_column]
        dt = str(col.dtype)
        unit = {"datetime64[s]": "s", "datetime64[ms]": "ms",
                "datetime64[us]": "us", "datetime64[ns]": "ns"}.get(dt)
        w, off = _validate_window_ms(unit or "ms", self.window_ms, self.offset_ms)
        t_ms = _raw_to_ms(col.astype("int64"), unit or "ms")
        start = _ms_to_raw(((t_ms + off) // w) * w - off, unit or "ms")
        w = _ms_to_raw_scalar(w, unit or "ms")
        work = df.assign(window_start=start)
        out = _pandas_group_agg(work, list(self.keys) + ["window_start"],
                                self.specs)
        if unit is not None:
            out["window_start"] = pd.to_datetime(out["window_start"], unit=unit)
        if self.emit_window_bounds:
            we = out["window_start"] + (pd.Timedelta(w, unit=unit) if unit
                                        else w)
            out.insert(out.columns.get_loc("window_start") + 1, "window_end", we)
        return out

    def to_dict(self):
        return {"cls": "TumblingTimeWindowReduce", "keys": self.keys,
                "time_column": self.time_column, "window_ms": self.window_ms,
                "specs": self.specs, "offset_ms": self.offset_ms,
                "emit_window_bounds": self.emit_window_bounds,
                "append_delimiter": self.append_delimiter}


@register("seqop")
class OverlappingTimeWindowReduce(TumblingTimeWindowReduce):
    """Sliding windows (window_ms size, separation_ms stride) — a step may
    fall in several windows (window/OverlappingTimeWindowFunction.java:56).
    Reduced per window like the tumbling variant."""

    def supports_partition(self) -> bool:
        # overlapping-aware pandas fast path below (NOT the inherited
        # tumbling one): available for the pandas-aggregable ops
        return all(op in _PD_AGG for _, op, _ in self.specs)

    def __init__(self, keys, time_column, window_ms, separation_ms, specs,
                 offset_ms: int = 0, emit_window_bounds: bool = True,
                 append_delimiter: str = ","):
        super().__init__(keys, time_column, window_ms, specs, offset_ms,
                         emit_window_bounds, append_delimiter)
        self.separation_ms = separation_ms

    def apply_group(self, table: pa.Table) -> pa.Table:
        out_schema = self.output_schema(Schema(table.schema))
        col = combine(table[self.time_column])
        unit = col.type.unit if pa.types.is_timestamp(col.type) else "ms"
        w, off, sep = _validate_window_ms(unit, self.window_ms, self.offset_ms,
                                          self.separation_ms)
        t = _raw_to_ms(col.cast(pa.int64()).to_numpy(zero_copy_only=False), unit)
        if len(t) == 0:
            return out_schema.arrow().empty_table()
        # windows are [k*sep - off, k*sep - off + w); step t is in windows
        # with k in [ceil((t+off-w+1)/sep), floor((t+off)/sep)]
        k_lo = np.ceil((t + off - w + 1) / sep).astype(np.int64)
        k_hi = np.floor((t + off) / sep).astype(np.int64)
        counts = (k_hi - k_lo + 1).clip(min=0)
        row_of = np.repeat(np.arange(len(t)), counts)
        ks = np.concatenate([np.arange(lo, hi + 1)
                             for lo, hi in zip(k_lo, k_hi)]) if counts.sum() else np.array([], dtype=np.int64)
        starts = ks * sep - off
        uniq, codes = np.unique(starts, return_inverse=True)
        uniq_raw = _ms_to_raw(uniq, unit)
        w_raw = _ms_to_raw_scalar(w, unit)
        data: dict[str, list] = {}
        for key in self.keys:
            data[key] = [table[key][0].as_py()] * len(uniq)
        data["window_start"] = list(uniq_raw)
        if self.emit_window_bounds:
            data["window_end"] = list(uniq_raw + w_raw)
        for col_name, op, out in self.specs:
            acc = _Acc(op)
            vals = []
            base = combine(table[col_name])
            expanded = pc.take(base, pa.array(row_of, type=pa.int64()))
            for g in range(len(uniq)):
                sub = expanded.filter(pa.array(codes == g))
                st = acc.accumulate(acc.zero(), sub)
                vals.append(acc.finalize(st, self.append_delimiter))
            data[out] = vals
        arrays = {}
        for n in out_schema.names:
            typ = out_schema.type_of(n)
            if n in ("window_start", "window_end") and pa.types.is_timestamp(typ):
                arrays[n] = pa.array(np.array(data[n], dtype=np.int64)).cast(typ)
            else:
                arrays[n] = pa.array(data[n], type=typ)
        return pa.table(arrays, schema=out_schema.arrow())

    def apply_partition(self, df, keys):
        """Vectorized across ALL sequences in the partition: expand each
        row into the windows containing it (np.repeat + one arange, no
        per-sequence Python), then ONE pandas groupby over
        (keys, window_start). Expansion factor is ~window/separation —
        callers with extreme overlap ratios pay proportional memory,
        same as the reference's per-window iteration."""
        import pandas as pd
        col = df[self.time_column]
        dt = str(col.dtype)
        unit = {"datetime64[s]": "s", "datetime64[ms]": "ms",
                "datetime64[us]": "us", "datetime64[ns]": "ns"}.get(dt)
        w, off, sep = _validate_window_ms(unit or "ms", self.window_ms,
                                          self.offset_ms, self.separation_ms)
        t_ms = _raw_to_ms(col.astype("int64").to_numpy(), unit or "ms")
        k_lo = np.ceil((t_ms + off - w + 1) / sep).astype(np.int64)
        k_hi = np.floor((t_ms + off) / sep).astype(np.int64)
        counts = (k_hi - k_lo + 1).clip(min=0)
        total = int(counts.sum())
        row_of = np.repeat(np.arange(len(t_ms)), counts)
        if total:
            offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
            ks = (np.arange(total) - np.repeat(offs, counts)
                  + np.repeat(k_lo, counts))
        else:
            ks = np.array([], dtype=np.int64)
        start = _ms_to_raw(ks * sep - off, unit or "ms")
        work = df.iloc[row_of].reset_index(drop=True)
        work = work.assign(window_start=start)
        out = _pandas_group_agg(work, list(self.keys) + ["window_start"],
                                self.specs)
        if unit is not None:
            out["window_start"] = pd.to_datetime(out["window_start"],
                                                 unit=unit)
        w_raw = _ms_to_raw_scalar(w, unit or "ms")
        if self.emit_window_bounds:
            we = out["window_start"] + (pd.Timedelta(w_raw, unit=unit)
                                        if unit else w_raw)
            out.insert(out.columns.get_loc("window_start") + 1,
                       "window_end", we)
        return out

    def to_dict(self):
        d = super().to_dict()
        d["cls"] = "OverlappingTimeWindowReduce"
        d["separation_ms"] = self.separation_ms
        return d


@register("seqop")
class SequenceLengthFilter(SequenceOp):
    """Drop whole sequences whose length is outside [min,max]
    (condition/sequence/SequenceLengthCondition.java:39 + ConditionFilter)."""

    def __init__(self, min_length: int = 0, max_length: Optional[int] = None):
        self.min_length, self.max_length = min_length, max_length

    def output_schema(self, schema: Schema) -> Schema:
        return schema

    def apply_group(self, table: pa.Table) -> pa.Table:
        n = table.num_rows
        if n < self.min_length or (self.max_length is not None and n > self.max_length):
            return table.schema.empty_table()
        return table

    def apply_partition(self, df, keys):
        n = df.groupby(keys, sort=False, group_keys=False)[keys[0]] \
            .transform("size")
        mask = n >= self.min_length
        if self.max_length is not None:
            mask &= n <= self.max_length
        return df[mask]

    def to_dict(self):
        return {"cls": "SequenceLengthFilter", "min_length": self.min_length,
                "max_length": self.max_length}


_PD_AGG = {"Sum": "sum", "Mean": "mean", "Min": "min", "Max": "max",
           "Count": "size", "Stdev": "std"}


def _pandas_group_agg(df, group_cols, specs):
    named = {out: (col, _PD_AGG[op]) for col, op, out in specs}
    g = df.groupby(group_cols, sort=False)
    out = g.agg(**named).reset_index()
    for col, op, name in specs:
        if op == "Stdev":
            out[name] = out[name].fillna(0.0)  # single-element groups
        elif op == "Count":
            out[name] = out[name].astype("int64")
    return out


# ---------------------------------------------------------------------------
# The wide step: groupby(keys) → sort in group → apply op chain
# ---------------------------------------------------------------------------

class _PartitionFn:
    """Pandas map_groups body for the vectorized fast path: processes one
    HASH PARTITION (many groups) at once — per-group work happens inside
    pandas groupby kernels, so per-sequence Python overhead is O(P), not
    O(#groups). Semantics identical to _GroupFn (parity-tested)."""

    def __init__(self, keys: list[str], order_by: list[str], descending: bool,
                 ops: list[SequenceOp]):
        self.keys, self.order_by, self.descending = keys, order_by, descending
        self.ops = ops
        self.__name__ = "sequence_partition"

    def __call__(self, df):
        if len(df) == 0:
            return df
        df = df.sort_values(self.keys + self.order_by,
                            ascending=[True] * len(self.keys)
                            + [not self.descending] * len(self.order_by),
                            kind="stable").reset_index(drop=True)
        for op in self.ops:
            df = op.apply_partition(df, self.keys)
        return df.drop(columns=["__gpart"], errors="ignore")


class _GroupFn:
    """Picklable map_groups body: sort the group, run the op chain."""

    def __init__(self, order_by: list[str], descending: bool, ops: list[SequenceOp],
                 out_schema: pa.Schema):
        self.order_by, self.descending, self.ops = order_by, descending, ops
        self.out_schema = out_schema
        self.__name__ = "sequence_group"  # map_groups wants a named callable

    def __call__(self, table: pa.Table) -> pa.Table:
        if table.num_rows == 0:
            return self.out_schema.empty_table()
        order = "descending" if self.descending else "ascending"
        table = table.sort_by([(c, order) for c in self.order_by])
        for op in self.ops:
            table = op.apply_group(table)
        if table.num_rows == 0:
            return self.out_schema.empty_table()
        return table


@register("step")
class GroupedSequence(WideStep):
    """ConvertToSequence(keys, comparator=order_by) + per-sequence op chain,
    executed as one groupby shuffle (ConvertToSequence.java:41-103 →
    ``ds.groupby(keys).map_groups``). ConvertFromSequence is the implicit
    flat output (ConvertFromSequence.java:39 is a no-op in flat
    representation)."""

    def __init__(self, keys: Sequence[str], order_by: Sequence[str],
                 ops: Sequence[SequenceOp | dict] = (), descending: bool = False):
        self.keys = list(keys)
        self.order_by = list(order_by)
        self.ops = [self._op(o) for o in ops]
        self.descending = descending

    @staticmethod
    def _op(o):
        if isinstance(o, dict):
            cls = resolve("seqop", o["cls"])
            return cls.from_dict(o)
        return o

    def add(self, op: SequenceOp) -> "GroupedSequence":
        self.ops.append(op)
        return self

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(*self.keys, *self.order_by)
        out = schema
        for op in self.ops:
            out = op.output_schema(out)
        return out

    def apply_dataset(self, ds, num_partitions: int = 32):
        out = self.output_schema(Schema(self._input_arrow_schema(ds)))
        vectorizable = bool(self.ops) and all(
            op.supports_partition() for op in self.ops)
        if not vectorizable:
            # per-group path: exact per-sequence semantics for ops that
            # cannot vectorize across groups (window reduces etc.)
            fn = _GroupFn(self.order_by, self.descending, self.ops, out.arrow())
            return ds.groupby(self.keys).map_groups(fn, batch_format="pyarrow")
        # fast path: hash-partition on the sequence key, ONE map_groups
        # call per partition, pandas groupby kernels vectorized across all
        # sequences in the partition (per-group Python cost would dominate
        # with millions of small conversations)
        from datavec_ray.hll import hash64
        keys = self.keys

        def add_part(batch: pa.Table) -> pa.Table:
            h = hash64(batch[keys[0]].combine_chunks() if
                       isinstance(batch[keys[0]], pa.ChunkedArray)
                       else batch[keys[0]])
            for k in keys[1:]:
                h = h ^ (hash64(batch[k].combine_chunks()
                                if isinstance(batch[k], pa.ChunkedArray)
                                else batch[k]) * np.uint64(0x9E3779B97F4A7C15))
            part = (h % np.uint64(num_partitions)).astype(np.int64)
            return batch.append_column(pa.field("__gpart", pa.int64()),
                                       pa.array(part))

        pfn = _PartitionFn(self.keys, self.order_by, self.descending, self.ops)
        grouped = (ds.map_batches(add_part, batch_format="pyarrow",
                                  batch_size=None)
                   .groupby("__gpart")
                   .map_groups(pfn, batch_format="pandas"))
        target = out.arrow()

        def cast_schema(batch: pa.Table) -> pa.Table:
            from datavec_ray.cdc.engine import normalize_to_schema
            if batch.num_rows == 0:
                return target.empty_table()
            return normalize_to_schema(batch, target)

        return grouped.map_batches(cast_schema, batch_format="pyarrow",
                                   batch_size=None)

    def apply_local(self, table: pa.Table) -> pa.Table:
        import pandas as pd
        out = self.output_schema(Schema(table.schema))
        fn = _GroupFn(self.order_by, self.descending, self.ops, out.arrow())
        df_keys = table.select(self.keys).to_pandas()
        codes, _ = pd.factorize(
            pd.MultiIndex.from_frame(df_keys) if len(self.keys) > 1
            else df_keys[self.keys[0]], use_na_sentinel=False)
        parts = []
        for g in range(codes.max() + 1 if len(codes) else 0):
            sub = table.take(pa.array(np.nonzero(codes == g)[0]))
            parts.append(fn(sub))
        parts = [p for p in parts if p.num_rows > 0]
        if not parts:
            return out.arrow().empty_table()
        return pa.concat_tables(parts)

    def to_dict(self):
        return {"cls": "GroupedSequence", "keys": self.keys,
                "order_by": self.order_by, "ops": [o.to_dict() for o in self.ops],
                "descending": self.descending}

    @classmethod
    def from_dict(cls, d):
        return cls(d["keys"], d["order_by"], d.get("ops", ()), d.get("descending", False))
