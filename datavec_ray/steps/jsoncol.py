"""JSON payload-column extraction.

The reference parses JSON at the *reader* (Jackson record readers,
``datavec-api/src/main/java/org/datavec/api/records/reader/impl/jackson/
JacksonRecordReader.java:52`` with ``FieldSelection``); once data is
columnar there is no JSON column op. Web-scale event streams carry
semi-structured payload columns (``events.props`` here), so this is the
columnar analogue of FieldSelection: pull scalar fields out of a
JSON-string column into typed columns.

Vectorized end to end: polars' Rust JSON kernel
(``Series.str.json_path_match``) extracts per path with zero per-row
Python; invalid JSON or a missing path yields NULL (lenient, matching
DuckDB ``json_extract_string``). The extracted strings are cast to the
declared column type with one Arrow cast.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

try:  # imported at module load so workers finish the (large) polars
    # import during step unpickling, not concurrently inside UDF calls
    # (observed: a partially-initialized polars._reexport when first
    # imported from within a running map task)
    import polars as _pl
except ImportError:  # pragma: no cover - polars is in the base image
    _pl = None

from datavec_ray.registry import register
from datavec_ray.schema import ColumnMeta, Schema, arrow_type_for
from datavec_ray.steps.base import Step


@register("step")
class JsonExtract(Step):
    """Extract scalar JSONPath fields from a JSON-string column.

    ``fields`` maps output column name -> ``(json_path, column_type)``;
    ``json_path`` is the ``$.a.b`` subset polars supports, column_type
    one of the engine's declared types (integer/long/double/string/...).
    Booleans arrive as the strings ``true``/``false`` and cast cleanly.
    """

    def __init__(self, column: str, fields: dict[str, Any],
                 keep_source: bool = True):
        self.column = column
        # normalize to {name: [path, type]} (JSON serde round-trips lists)
        self.fields = {k: list(v) for k, v in fields.items()}
        self.keep_source = keep_source

    def output_schema(self, schema: Schema) -> Schema:
        if schema.type_of(self.column) != pa.string():
            raise TypeError(
                f"JsonExtract needs a string column, got "
                f"{schema.type_of(self.column)} for {self.column!r}")
        out = schema if self.keep_source else schema.without_columns(
            [self.column])
        for name, (_path, ctype) in self.fields.items():
            out = out.with_column(name, arrow_type_for(ctype),
                                  ColumnMeta(ctype))
        return out

    def apply(self, table: pa.Table) -> pa.Table:
        if _pl is None:  # pragma: no cover
            raise ImportError("JsonExtract requires polars")
        s = _pl.from_arrow(table[self.column])
        for name, (path, ctype) in self.fields.items():
            raw = s.str.json_path_match(path).to_arrow()
            if isinstance(raw, pa.ChunkedArray):
                raw = raw.combine_chunks()
            typ = arrow_type_for(ctype)
            if pa.types.is_string(typ) or pa.types.is_large_string(typ):
                arr = raw.cast(typ) if raw.type != typ else raw
            elif pa.types.is_boolean(typ):
                arr = pc.equal(raw, "true")
                arr = pc.if_else(pc.is_null(raw), pa.nulls(len(raw),
                                                           pa.bool_()), arr)
            else:
                # numeric paths may match floats for an int target
                # ("1.0"): go through double for integer types
                if pa.types.is_integer(typ):
                    arr = raw.cast(pa.float64()).cast(typ)
                else:
                    arr = raw.cast(typ)
            table = table.append_column(pa.field(name, typ), arr)
        if not self.keep_source:
            table = table.drop_columns([self.column])
        return table

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "JsonExtract", "column": self.column,
                "fields": self.fields, "keep_source": self.keep_source}
