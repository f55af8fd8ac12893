"""String steps. SURVEY.md §2.4.

Parity targets (datavec-api/.../transform/transform/string/):
AppendStringColumnTransform.java:34, ChangeCaseStringTransform.java:12,
ConcatenateStringColumns.java:27, MapAllStringsExceptListTransform.java:32,
RemoveWhiteSpaceTransform.java:30, ReplaceEmptyStringTransform.java:30,
ReplaceStringTransform.java:16, StringMapTransform.java:38,
StringListToCategoricalSetTransform.java:41,
StringListToCountsNDArrayTransform.java:29,
StringListToIndicesNDArrayTransform.java:20.

All vectorized with pyarrow.compute string kernels.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datavec_ray.registry import register
from datavec_ray.schema import ColumnMeta, Schema
from datavec_ray.steps.base import Step, combine, set_column


@register("step")
class AppendString(Step):
    """Append a literal suffix to every value in a string column."""

    def __init__(self, column: str, suffix: str):
        self.column, self.suffix = column, suffix

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        return schema

    def apply(self, table: pa.Table) -> pa.Table:
        out = pc.binary_join_element_wise(table[self.column], self.suffix, "")
        return set_column(table, self.column, combine(out))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "AppendString", "column": self.column, "suffix": self.suffix}


@register("step")
class ChangeCase(Step):
    def __init__(self, column: str, mode: str = "LOWER"):
        if mode.upper() not in ("LOWER", "UPPER"):
            raise ValueError("mode must be LOWER or UPPER")
        self.column, self.mode = column, mode.upper()

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        return schema

    def apply(self, table: pa.Table) -> pa.Table:
        fn = pc.utf8_lower if self.mode == "LOWER" else pc.utf8_upper
        return set_column(table, self.column, combine(fn(table[self.column])))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "ChangeCase", "column": self.column, "mode": self.mode}


@register("step")
class ConcatenateStringColumns(Step):
    """New column = delimiter-join of columns; originals retained
    (ConcatenateStringColumns.java:27)."""

    def __init__(self, new_column: str, delimiter: str, columns: Sequence[str]):
        self.new_column, self.delimiter, self.columns = new_column, delimiter, list(columns)

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(*self.columns)
        return schema.with_column(self.new_column, pa.string(), ColumnMeta("String"))

    def apply(self, table: pa.Table) -> pa.Table:
        cols = [combine(table[c]).cast(pa.string()) for c in self.columns]
        out = pc.binary_join_element_wise(*cols, self.delimiter)
        return table.append_column(pa.field(self.new_column, pa.string()), combine(out))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "ConcatenateStringColumns", "new_column": self.new_column,
                "delimiter": self.delimiter, "columns": self.columns}


@register("step")
class NormalizeText(Step):
    """Unicode/whitespace text normalization — the canonicalization pass
    a curation pipeline runs before hashing, dedup or tokenization
    (beyond the reference, which has no Unicode handling): NFC
    normalization (``pc.utf8_normalize``; combining sequences →
    precomposed), control-character strip, whitespace-run collapse to a
    single space, edge trim, optional lowercase — in that fixed order,
    each an RE2/Arrow kernel that DuckDB reproduces verbatim
    (``nfc_normalize`` + ``regexp_replace`` + ``trim`` + ``lower``).
    """

    CTRL = r"[\x00-\x1f\x7f]"

    def __init__(self, column: str, form: str = "NFC",
                 strip_control: bool = True,
                 collapse_whitespace: bool = True,
                 trim: bool = True, lower: bool = False):
        if form not in ("NFC", "NFKC", "NFD", "NFKD", None):
            raise ValueError("form must be an NF* form or None")
        self.column = column
        self.form = form
        self.strip_control = strip_control
        self.collapse_whitespace = collapse_whitespace
        self.trim = trim
        self.lower = lower

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        return schema

    def apply(self, table: pa.Table) -> pa.Table:
        col = combine(table[self.column])
        if self.form:
            # NOT pc.utf8_normalize: pyarrow 16's kernel decomposes no
            # matter which form is asked for (NFC of a precomposed char
            # returns the combining sequence), so it cannot round-trip
            # against SQL nfc_normalize. Gate the per-row unicodedata
            # path behind a vectorized non-ASCII scan — ASCII batches
            # (the overwhelming common case) never leave Arrow, and
            # every NF* form is the identity on them.
            import unicodedata
            has_non_ascii = pc.any(pc.match_substring_regex(
                pc.fill_null(col, ""), "[^\\x00-\\x7f]")).as_py()
            if has_non_ascii:
                col = pa.array(
                    [s if s is None or s.isascii()
                     else unicodedata.normalize(self.form, s)
                     for s in col.to_pylist()], pa.string())
        if self.strip_control:
            col = pc.replace_substring_regex(col, self.CTRL, "")
        if self.collapse_whitespace:
            col = pc.replace_substring_regex(col, r"\s+", " ")
        if self.trim:
            col = pc.utf8_trim_whitespace(col)
        if self.lower:
            col = pc.utf8_lower(col)
        return set_column(table, self.column, combine(col))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "NormalizeText", "column": self.column,
                "form": self.form, "strip_control": self.strip_control,
                "collapse_whitespace": self.collapse_whitespace,
                "trim": self.trim, "lower": self.lower}


@register("step")
class MapAllStringsExceptList(Step):
    """Values not in the keep-list → replacement (MapAllStringsExceptListTransform)."""

    def __init__(self, column: str, keep: Sequence[str], replacement: str):
        self.column, self.keep, self.replacement = column, list(keep), replacement

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        return schema

    def apply(self, table: pa.Table) -> pa.Table:
        col = table[self.column]
        m = pc.is_in(col, value_set=pa.array(self.keep, type=pa.string()))
        out = pc.if_else(m, col, pa.scalar(self.replacement))
        return set_column(table, self.column, combine(out))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "MapAllStringsExceptList", "column": self.column,
                "keep": self.keep, "replacement": self.replacement}


@register("step")
class RemoveWhiteSpace(Step):
    """Strip all whitespace characters (RemoveWhiteSpaceTransform.java:30)."""

    def __init__(self, column: str):
        self.column = column

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        return schema

    def apply(self, table: pa.Table) -> pa.Table:
        out = pc.replace_substring_regex(table[self.column], r"\s", "")
        return set_column(table, self.column, combine(out))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "RemoveWhiteSpace", "column": self.column}


@register("step")
class ReplaceEmptyString(Step):
    """"" → value (ReplaceEmptyStringTransform.java:30); nulls too."""

    def __init__(self, column: str, value: str):
        self.column, self.value = column, value

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        return schema

    def apply(self, table: pa.Table) -> pa.Table:
        col = table[self.column]
        empty = pc.or_kleene(pc.is_null(col), pc.equal(col, ""))
        out = pc.if_else(pc.fill_null(empty, True), pa.scalar(self.value), col)
        return set_column(table, self.column, combine(out))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "ReplaceEmptyString", "column": self.column, "value": self.value}


@register("step")
class RegexReplace(Step):
    """Ordered {pattern → replacement} regex map (ReplaceStringTransform.java:16).

    ``rules`` is a list of [pattern, replacement] pairs applied in order
    (dict ordering in the reference is insertion order of a LinkedHashMap).
    """

    def __init__(self, column: str, rules: Sequence[Sequence[str]]):
        self.column = column
        self.rules = [list(r) for r in rules]

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        return schema

    def apply(self, table: pa.Table) -> pa.Table:
        col = table[self.column]
        for pat, repl in self.rules:
            col = pc.replace_substring_regex(col, pat, repl)
        return set_column(table, self.column, combine(col))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "RegexReplace", "column": self.column, "rules": self.rules}


@register("step")
class RegexExtract(Step):
    """Named-capture-group regex extraction to NEW columns (the
    column-side counterpart of the reader-side
    ``RegexLineRecordReader.java:43``, which splits lines into fields
    by a pattern at read time; here any string column can be exploded
    mid-pipeline). Non-matching rows yield nulls. Vectorized via
    Arrow's ``extract_regex`` — one pass, no Python per row.

    ``pattern`` must use named groups, e.g.
    ``r"(?P<k>\\w+)=(?P<v>\\d+)"``.
    """

    def __init__(self, column: str, pattern: str):
        import re as _re
        self.column, self.pattern = column, pattern
        self.group_names = list(_re.compile(pattern).groupindex)
        if not self.group_names:
            raise ValueError("RegexExtract needs named capture groups "
                             "(?P<name>...)")

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        out = schema
        for g in self.group_names:
            if g in out.names:  # collision: overwrite in place as string
                out = out.without_columns([g]).with_column(
                    g, pa.string(), index=out.index_of(g))
            else:
                out = out.with_column(g, pa.string())
        return out

    def apply(self, table: pa.Table) -> pa.Table:
        col = pc.fill_null(combine(table[self.column]), "")
        st = pc.extract_regex(col, self.pattern)  # struct or null/row
        for g in self.group_names:
            arr = combine(pc.struct_field(st, g))
            if g in table.column_names:
                table = set_column(table, g, arr)
            else:
                table = table.append_column(pa.field(g, arr.type), arr)
        return table

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "RegexExtract", "column": self.column,
                "pattern": self.pattern}


@register("step")
class StringMap(Step):
    """Exact-match dictionary replace (StringMapTransform.java:38).

    Vectorized via index_in against the key list + take on the value list;
    unmapped values pass through unchanged.
    """

    def __init__(self, column: str, mapping: dict[str, str]):
        self.column, self.mapping = column, dict(mapping)

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        return schema

    def apply(self, table: pa.Table) -> pa.Table:
        col = combine(table[self.column])
        keys = pa.array(list(self.mapping.keys()), type=pa.string())
        vals = pa.array(list(self.mapping.values()), type=pa.string())
        idx = pc.index_in(col, value_set=keys)
        mapped = pc.take(vals, idx)  # null where not found
        out = pc.if_else(pc.is_valid(idx), mapped, col)
        return set_column(table, self.column, combine(out))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "StringMap", "column": self.column, "mapping": self.mapping}


@register("step")
class StringListToCategoricalSet(Step):
    """Delimited string → k boolean membership columns, one per category
    (StringListToCategoricalSetTransform.java:41). Original column replaced
    by columns named per `new_columns`."""

    def __init__(self, column: str, new_columns: Sequence[str],
                 categories: Sequence[str], delimiter: str = ","):
        if len(new_columns) != len(categories):
            raise ValueError("new_columns and categories must align")
        self.column = column
        self.new_columns, self.categories = list(new_columns), list(categories)
        self.delimiter = delimiter

    def output_schema(self, schema: Schema) -> Schema:
        idx = schema.index_of(self.column)
        out = schema.without_columns([self.column])
        for j, (n, _) in enumerate(zip(self.new_columns, self.categories)):
            out = out.with_column(n, pa.bool_(), ColumnMeta("Boolean"), index=idx + j)
        return out

    def apply(self, table: pa.Table) -> pa.Table:
        col = combine(table[self.column])
        parts = pc.split_pattern(pc.fill_null(col, ""), self.delimiter)
        idx = table.schema.get_field_index(self.column)
        table = table.drop_columns([self.column])
        # membership per category: flatten once, test, and reduce per row
        flat = pc.list_flatten(parts)
        offsets = np.asarray(parts.offsets)
        row_of = np.repeat(np.arange(len(parts)), np.diff(offsets))
        n = len(parts)
        for j, (name, cat) in enumerate(zip(self.new_columns, self.categories)):
            hits = pc.equal(flat, cat).to_numpy(zero_copy_only=False)
            out = np.zeros(n, dtype=bool)
            if len(row_of):
                np.logical_or.at(out, row_of, np.nan_to_num(
                    hits.astype(float), nan=0.0).astype(bool))
            table = table.add_column(idx + j, pa.field(name, pa.bool_()),
                                     pa.array(out))
        return table

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "StringListToCategoricalSet", "column": self.column,
                "new_columns": self.new_columns, "categories": self.categories,
                "delimiter": self.delimiter}


@register("step")
class StringListToCounts(Step):
    """Delimited string → bag-of-words count vector over a fixed vocab,
    replacing the column (StringListToCountsNDArrayTransform.java:29).
    Unknown tokens ignored (reference's ignoreUnknown=true path)."""

    _binary = False

    def __init__(self, column: str, vocabulary: Sequence[str], delimiter: str = ","):
        self.column, self.vocabulary, self.delimiter = column, list(vocabulary), delimiter

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        return schema.with_type(self.column, pa.list_(pa.int32()),
                                ColumnMeta("NDArray", shape=[len(self.vocabulary)]))

    def apply(self, table: pa.Table) -> pa.Table:
        col = combine(table[self.column])
        parts = pc.split_pattern(pc.fill_null(col, ""), self.delimiter)
        flat = pc.list_flatten(parts)
        offsets = np.asarray(parts.offsets)
        row_of = np.repeat(np.arange(len(parts)), np.diff(offsets))
        vocab = pa.array(self.vocabulary, type=pa.string())
        idx_arr = pc.index_in(flat, value_set=vocab)
        tok_idx = idx_arr.to_numpy(zero_copy_only=False)
        k = len(self.vocabulary)
        n = len(parts)
        counts = np.zeros((n, k), dtype=np.int32)
        valid = pc.is_valid(idx_arr).to_numpy(zero_copy_only=False)
        r = row_of[valid]
        c = tok_idx[valid].astype(np.int64)
        np.add.at(counts, (r, c), 1)
        if self._binary:
            counts = (counts > 0).astype(np.int32)
        out = pa.FixedSizeListArray.from_arrays(pa.array(counts.ravel()), k) \
            .cast(pa.list_(pa.int32()))
        return set_column(table, self.column, out)

    def to_dict(self) -> dict[str, Any]:
        return {"cls": type(self).__name__, "column": self.column,
                "vocabulary": self.vocabulary, "delimiter": self.delimiter}


@register("step")
class StringListToIndicator(StringListToCounts):
    """0/1 presence instead of counts (reference's binary mode)."""
    _binary = True


@register("step")
class StringListToIndices(Step):
    """Delimited string → vector of vocab indices, in token order, unknown
    tokens dropped (StringListToIndicesNDArrayTransform.java:20)."""

    def __init__(self, column: str, vocabulary: Sequence[str], delimiter: str = ","):
        self.column, self.vocabulary, self.delimiter = column, list(vocabulary), delimiter

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        return schema.with_type(self.column, pa.list_(pa.int32()),
                                ColumnMeta("NDArray"))

    def apply(self, table: pa.Table) -> pa.Table:
        col = combine(table[self.column])
        parts = pc.split_pattern(pc.fill_null(col, ""), self.delimiter)
        flat = pc.list_flatten(parts)
        vocab = pa.array(self.vocabulary, type=pa.string())
        idx = pc.index_in(flat, value_set=vocab)
        offsets = np.asarray(parts.offsets)
        row_of = np.repeat(np.arange(len(parts)), np.diff(offsets))
        keep = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        kept_rows = row_of[keep]
        kept_idx = idx.to_numpy(zero_copy_only=False)[keep].astype(np.int32)
        new_counts = np.bincount(kept_rows, minlength=len(parts))
        new_offsets = np.concatenate([[0], np.cumsum(new_counts)]).astype(np.int32)
        out = pa.ListArray.from_arrays(pa.array(new_offsets, type=pa.int32()),
                                       pa.array(kept_idx, type=pa.int32()))
        return set_column(table, self.column, out)

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "StringListToIndices", "column": self.column,
                "vocabulary": self.vocabulary, "delimiter": self.delimiter}
