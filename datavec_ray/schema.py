"""Schema: an ordered, typed, constraint-carrying column list.

Parity target: DataVec's ``Schema`` (reference
``datavec-api/src/main/java/org/datavec/api/transform/schema/Schema.java:51-90``)
— ordered column names + per-column ``ColumnMetaData`` constraints
(min/max for numerics, regex/length for strings, state set for
categoricals: ``transform/metadata/*.java``) — re-expressed over
``pyarrow.Schema``. ColumnType → Arrow mapping follows SURVEY.md §1.1:

    String→string, Integer→int32, Long→int64, Double→float64,
    Float→float32, Boolean→bool, Time→timestamp[ms],
    Categorical→string + declared state list (constraint metadata),
    NDArray→list<float32> (or fixed_size_list), Bytes→binary.

Like the reference's ``TransformProcess`` constructor
(``transform/TransformProcess.java:110-156``), every pipeline step maps
an input Schema to an output Schema eagerly, before any data flows, so
schema mismatches fail fast at build time.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Iterable, Optional, Sequence

import pyarrow as pa

# -- ColumnType names (parity with transform/ColumnType.java:24-26) -----------

_TYPE_TO_ARROW = {
    "String": pa.string(),
    "Integer": pa.int32(),
    "Long": pa.int64(),
    "Double": pa.float64(),
    "Float": pa.float32(),
    "Categorical": pa.string(),
    "Time": pa.timestamp("ms"),
    "Bytes": pa.binary(),
    "Boolean": pa.bool_(),
    "NDArray": pa.list_(pa.float32()),
}


def arrow_type_for(column_type: str) -> pa.DataType:
    try:
        return _TYPE_TO_ARROW[column_type]
    except KeyError:
        raise ValueError(f"unknown ColumnType {column_type!r}") from None


def column_type_for(dtype: pa.DataType) -> str:
    """Best-effort reverse mapping (for inference / analysis display)."""
    if pa.types.is_string(dtype) or pa.types.is_large_string(dtype):
        return "String"
    if pa.types.is_int32(dtype) or pa.types.is_int16(dtype) or pa.types.is_int8(dtype):
        return "Integer"
    if pa.types.is_int64(dtype) or pa.types.is_uint32(dtype) or pa.types.is_uint64(dtype):
        return "Long"
    if pa.types.is_float64(dtype):
        return "Double"
    if pa.types.is_float32(dtype) or pa.types.is_float16(dtype):
        return "Float"
    if pa.types.is_boolean(dtype):
        return "Boolean"
    if pa.types.is_timestamp(dtype) or pa.types.is_date(dtype):
        return "Time"
    if pa.types.is_binary(dtype) or pa.types.is_large_binary(dtype):
        return "Bytes"
    if pa.types.is_list(dtype) or pa.types.is_large_list(dtype) or pa.types.is_fixed_size_list(dtype):
        return "NDArray"
    if pa.types.is_dictionary(dtype):
        return "Categorical"
    return "String"


@dataclasses.dataclass
class ColumnMeta:
    """Per-column constraint metadata.

    Parity: ``transform/metadata/ColumnMetaData.java:89`` (``isValid``),
    ``IntegerMetaData``/``DoubleMetaData`` (min/max, allowNaN/allowInf),
    ``StringMetaData`` (regex, length bounds), ``CategoricalMetaData``
    (state names), ``TimeMetaData`` (timezone), ``NDArrayMetaData`` (shape).
    """

    column_type: str = "String"
    min_value: Optional[float] = None
    max_value: Optional[float] = None
    allow_nan: bool = False
    allow_infinite: bool = False
    regex: Optional[str] = None
    min_length: Optional[int] = None
    max_length: Optional[int] = None
    states: Optional[list[str]] = None  # Categorical state names, ordered
    timezone: Optional[str] = None
    shape: Optional[list[int]] = None  # NDArray

    def to_dict(self) -> dict[str, Any]:
        d = dataclasses.asdict(self)
        return {k: v for k, v in d.items()
                if (v is not None and v is not False) or k == "column_type"}

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ColumnMeta":
        return cls(**d)


class Schema:
    """Ordered (name, arrow type, ColumnMeta) triples with a name→index map."""

    def __init__(self, fields: Sequence[tuple[str, pa.DataType]] | pa.Schema,
                 meta: Optional[dict[str, ColumnMeta]] = None):
        if isinstance(fields, pa.Schema):
            fields = [(f.name, f.type) for f in fields]
        self._names: list[str] = [n for n, _ in fields]
        self._types: list[pa.DataType] = [t for _, t in fields]
        if len(set(self._names)) != len(self._names):
            dupes = sorted({n for n in self._names if self._names.count(n) > 1})
            raise ValueError(f"duplicate column names: {dupes}")
        self.meta: dict[str, ColumnMeta] = dict(meta or {})
        for name, typ in zip(self._names, self._types):
            if name not in self.meta:
                self.meta[name] = ColumnMeta(column_type=column_type_for(typ))
        self._index = {n: i for i, n in enumerate(self._names)}

    # -- builder (parity: Schema.Builder, schema/Schema.java:384-744) --------
    @classmethod
    def builder(cls) -> "SchemaBuilder":
        return SchemaBuilder()

    # -- accessors -----------------------------------------------------------
    @property
    def names(self) -> list[str]:
        return list(self._names)

    def arrow(self) -> pa.Schema:
        return pa.schema([pa.field(n, t) for n, t in zip(self._names, self._types)])

    def type_of(self, name: str) -> pa.DataType:
        return self._types[self.index_of(name)]

    def meta_of(self, name: str) -> ColumnMeta:
        return self.meta[name]

    def index_of(self, name: str) -> int:
        try:
            return self._index[name]
        except KeyError:
            raise KeyError(
                f"column {name!r} not in schema (have {self._names})") from None

    def has(self, name: str) -> bool:
        return name in self._index

    def require(self, *names: str) -> None:
        for n in names:
            self.index_of(n)

    def __len__(self) -> int:
        return len(self._names)

    def __eq__(self, other: object) -> bool:
        return (isinstance(other, Schema) and self._names == other._names
                and self._types == other._types)

    def __repr__(self) -> str:
        cols = ", ".join(f"{n}:{t}" for n, t in zip(self._names, self._types))
        return f"Schema({cols})"

    # -- functional edits (each returns a NEW Schema) ------------------------
    def with_column(self, name: str, typ: pa.DataType,
                    meta: Optional[ColumnMeta] = None, index: Optional[int] = None) -> "Schema":
        if name in self._index:
            raise ValueError(f"column {name!r} already exists")
        fields = list(zip(self._names, self._types))
        if index is None:
            fields.append((name, typ))
        else:
            fields.insert(index, (name, typ))
        m = dict(self.meta)
        if meta is not None:
            m[name] = meta
        return Schema(fields, m)

    def without_columns(self, names: Iterable[str]) -> "Schema":
        drop = set(names)
        for n in drop:
            self.index_of(n)
        fields = [(n, t) for n, t in zip(self._names, self._types) if n not in drop]
        m = {k: v for k, v in self.meta.items() if k not in drop}
        return Schema(fields, m)

    def select(self, names: Sequence[str]) -> "Schema":
        fields = [(n, self.type_of(n)) for n in names]
        m = {n: self.meta[n] for n in names}
        return Schema(fields, m)

    def renamed(self, mapping: dict[str, str]) -> "Schema":
        for old in mapping:
            self.index_of(old)
        fields = [(mapping.get(n, n), t) for n, t in zip(self._names, self._types)]
        m = {mapping.get(k, k): v for k, v in self.meta.items()}
        return Schema(fields, m)

    def with_type(self, name: str, typ: pa.DataType,
                  meta: Optional[ColumnMeta] = None) -> "Schema":
        i = self.index_of(name)
        fields = list(zip(self._names, self._types))
        fields[i] = (name, typ)
        m = dict(self.meta)
        m[name] = meta if meta is not None else ColumnMeta(column_type=column_type_for(typ))
        return Schema(fields, m)

    # -- serde ---------------------------------------------------------------
    def to_dict(self) -> dict[str, Any]:
        return {
            "columns": [
                {"name": n, "type": str(t), "meta": self.meta[n].to_dict()}
                for n, t in zip(self._names, self._types)
            ]
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Schema":
        fields, meta = [], {}
        for c in d["columns"]:
            m = ColumnMeta.from_dict(c.get("meta", {}))
            fields.append((c["name"], arrow_type_for(m.column_type)
                           if str(arrow_type_for(m.column_type)) == c["type"]
                           else _parse_arrow_type(c["type"])))
            meta[c["name"]] = m
        return cls(fields, meta)

    @classmethod
    def from_json(cls, s: str) -> "Schema":
        return cls.from_dict(json.loads(s))

    @classmethod
    def from_table(cls, table: pa.Table) -> "Schema":
        return cls(table.schema)


def _parse_arrow_type(s: str) -> pa.DataType:
    simple = {
        "string": pa.string(), "large_string": pa.large_string(),
        "int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32(),
        "int64": pa.int64(), "float": pa.float32(), "double": pa.float64(),
        "halffloat": pa.float16(), "bool": pa.bool_(), "binary": pa.binary(),
        "large_binary": pa.large_binary(),
        "timestamp[ms]": pa.timestamp("ms"), "timestamp[us]": pa.timestamp("us"),
        "timestamp[ns]": pa.timestamp("ns"), "timestamp[s]": pa.timestamp("s"),
        "date32[day]": pa.date32(),
        "list<element: float>": pa.list_(pa.float32()),
        "list<item: float>": pa.list_(pa.float32()),
        "list<element: double>": pa.list_(pa.float64()),
        "list<item: double>": pa.list_(pa.float64()),
        "list<element: int64>": pa.list_(pa.int64()),
        "list<item: int64>": pa.list_(pa.int64()),
        "list<element: int32>": pa.list_(pa.int32()),
        "list<item: int32>": pa.list_(pa.int32()),
    }
    if s in simple:
        return simple[s]
    raise ValueError(f"cannot parse arrow type {s!r}")


class SchemaBuilder:
    """Fluent builder, parity with ``Schema.Builder`` (schema/Schema.java:384-744)."""

    def __init__(self):
        self._fields: list[tuple[str, pa.DataType]] = []
        self._meta: dict[str, ColumnMeta] = {}

    def _add(self, name: str, typ: pa.DataType, meta: ColumnMeta) -> "SchemaBuilder":
        self._fields.append((name, typ))
        self._meta[name] = meta
        return self

    def add_string(self, name: str, regex: str | None = None,
                   min_length: int | None = None, max_length: int | None = None):
        return self._add(name, pa.string(), ColumnMeta(
            "String", regex=regex, min_length=min_length, max_length=max_length))

    def add_integer(self, name: str, min_value=None, max_value=None):
        return self._add(name, pa.int32(), ColumnMeta(
            "Integer", min_value=min_value, max_value=max_value))

    def add_long(self, name: str, min_value=None, max_value=None):
        return self._add(name, pa.int64(), ColumnMeta(
            "Long", min_value=min_value, max_value=max_value))

    def add_double(self, name: str, min_value=None, max_value=None,
                   allow_nan=False, allow_infinite=False):
        return self._add(name, pa.float64(), ColumnMeta(
            "Double", min_value=min_value, max_value=max_value,
            allow_nan=allow_nan, allow_infinite=allow_infinite))

    def add_float(self, name: str, min_value=None, max_value=None):
        return self._add(name, pa.float32(), ColumnMeta(
            "Float", min_value=min_value, max_value=max_value))

    def add_boolean(self, name: str):
        return self._add(name, pa.bool_(), ColumnMeta("Boolean"))

    def add_categorical(self, name: str, states: Sequence[str]):
        return self._add(name, pa.string(), ColumnMeta("Categorical", states=list(states)))

    def add_time(self, name: str, timezone: str | None = None, unit: str = "ms"):
        return self._add(name, pa.timestamp(unit), ColumnMeta("Time", timezone=timezone))

    def add_bytes(self, name: str):
        return self._add(name, pa.binary(), ColumnMeta("Bytes"))

    def add_ndarray(self, name: str, shape: Sequence[int] | None = None,
                    value_type: pa.DataType = pa.float32()):
        return self._add(name, pa.list_(value_type),
                         ColumnMeta("NDArray", shape=list(shape) if shape else None))

    def build(self) -> Schema:
        return Schema(self._fields, self._meta)
