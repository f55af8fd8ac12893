"""NLP expansion + tokenization steps. SURVEY.md §2.8 (expansions), §2.17.

Parity targets:
- ``nlp/TextToCharacterIndexTransform.java:39`` — each text step expands
  to one step per character (its index in a char alphabet), duplicating
  the other columns (base: ``expansion/BaseSequenceExpansionTransform.java:39``).
- ``nlp/TextToTermIndexSequenceTransform.java:45`` — same per vocab term.
- ``datavec-data-nlp/.../tokenization/`` DefaultTokenizer + stopwords and
  ``TfidfVectorizer.java:38`` (vocab+IDF build = aggregate pass, then a
  broadcast vectorize pass — the reference's 2-pass stateful vectorizer).

Expansions are narrow steps (map_batches may emit more rows than it
received) — explode via numpy repeat + Arrow take, no Python row loop
except the tokenizer itself.
"""

from __future__ import annotations

import math
import re
from typing import Any, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datavec_ray.registry import register
from datavec_ray.schema import ColumnMeta, Schema
from datavec_ray.steps.base import Step, combine


def _explode(table: pa.Table, counts: np.ndarray, drop: str) -> tuple[pa.Table, np.ndarray]:
    row_of = np.repeat(np.arange(table.num_rows), counts)
    base = table.drop_columns([drop]).take(pa.array(row_of, pa.int64()))
    return base, row_of


@register("step")
class TextToCharacterIndex(Step):
    """text column → one row per character with columns (char_idx:int32
    position-in-alphabet, seq_pos:int32). Characters outside the alphabet
    are dropped (reference behavior for unknown chars)."""

    def __init__(self, column: str, alphabet: str, new_column: str = "char_idx",
                 pos_column: str = "seq_pos"):
        self.column, self.alphabet = column, alphabet
        self.new_column, self.pos_column = new_column, pos_column

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        out = schema.without_columns([self.column])
        out = out.with_column(self.new_column, pa.int32(), ColumnMeta("Integer"))
        return out.with_column(self.pos_column, pa.int32(), ColumnMeta("Integer"))

    def apply(self, table: pa.Table) -> pa.Table:
        lut = {c: i for i, c in enumerate(self.alphabet)}
        texts = combine(table[self.column]).to_pylist()
        idx_lists = [[lut[c] for c in (t or "") if c in lut] for t in texts]
        counts = np.array([len(x) for x in idx_lists])
        base, _ = _explode(table, counts, self.column)
        flat = np.concatenate(idx_lists) if len(idx_lists) else np.array([], np.int32)
        pos = np.concatenate([np.arange(c) for c in counts]) if len(counts) else \
            np.array([], np.int32)
        base = base.append_column(pa.field(self.new_column, pa.int32()),
                                  pa.array(flat.astype(np.int32)))
        return base.append_column(pa.field(self.pos_column, pa.int32()),
                                  pa.array(pos.astype(np.int32)))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "TextToCharacterIndex", "column": self.column,
                "alphabet": self.alphabet, "new_column": self.new_column,
                "pos_column": self.pos_column}


@register("step")
class TextToTermIndex(Step):
    """text column → one row per known vocab term (term_idx:int32,
    seq_pos:int32); unknown terms dropped
    (TextToTermIndexSequenceTransform.java:45)."""

    def __init__(self, column: str, vocabulary: Sequence[str],
                 new_column: str = "term_idx", pos_column: str = "seq_pos",
                 delimiter: str = " "):
        self.column, self.vocabulary = column, list(vocabulary)
        self.new_column, self.pos_column, self.delimiter = \
            new_column, pos_column, delimiter

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        out = schema.without_columns([self.column])
        out = out.with_column(self.new_column, pa.int32(), ColumnMeta("Integer"))
        return out.with_column(self.pos_column, pa.int32(), ColumnMeta("Integer"))

    def apply(self, table: pa.Table) -> pa.Table:
        col = combine(table[self.column])
        parts = pc.split_pattern(pc.fill_null(col, ""), self.delimiter)
        flat = pc.list_flatten(parts)
        vocab = pa.array(self.vocabulary, pa.string())
        idx = pc.index_in(flat, value_set=vocab)
        offsets = np.asarray(parts.offsets)
        row_of_tok = np.repeat(np.arange(len(parts)), np.diff(offsets))
        keep = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        kept_rows = row_of_tok[keep]
        kept_idx = idx.to_numpy(zero_copy_only=False)[keep].astype(np.int32)
        counts = np.bincount(kept_rows, minlength=table.num_rows)
        base, _ = _explode(table, counts, self.column)
        pos = np.concatenate([np.arange(c) for c in counts]) if len(counts) else \
            np.array([], np.int32)
        base = base.append_column(pa.field(self.new_column, pa.int32()),
                                  pa.array(kept_idx))
        return base.append_column(pa.field(self.pos_column, pa.int32()),
                                  pa.array(pos.astype(np.int32)))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "TextToTermIndex", "column": self.column,
                "vocabulary": self.vocabulary, "new_column": self.new_column,
                "pos_column": self.pos_column, "delimiter": self.delimiter}


# ---------------------------------------------------------------------------
# TF-IDF (two-pass stateful vectorizer)
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"[\w']+", re.UNICODE)


def _tokenize_batch(col) -> list[list[str]]:
    return [_TOKEN_RE.findall((t or "").lower())
            for t in combine(col).to_pylist()]


def fit_tfidf_vocab(ds_or_table, text_col: str = "text",
                    max_vocab: int = 10_000, min_df: int = 1) -> dict:
    """Pass 1: document frequencies → vocab + IDF weights.

    Distributed: per-batch partial DF counts (one row per term per batch)
    → groupby(term).sum — the combiner pattern; vocab capped by DF rank.
    """
    if isinstance(ds_or_table, pa.Table):
        from collections import Counter
        df_counts: Counter = Counter()
        n_docs = ds_or_table.num_rows
        for toks in _tokenize_batch(ds_or_table[text_col]):
            df_counts.update(set(toks))
        items = [(t, c) for t, c in df_counts.items() if c >= min_df]
    else:
        def partial(batch: pa.Table) -> pa.Table:
            from collections import Counter
            c: Counter = Counter()
            for toks in _tokenize_batch(batch[text_col]):
                c.update(set(toks))
            terms = list(c.keys())
            return pa.table({"term": pa.array(terms, pa.string()),
                            "df": pa.array([c[t] for t in terms], pa.int64()),
                            "docs": pa.array([batch.num_rows] +
                                             [0] * (len(terms) - 1)
                                             if terms else [], pa.int64())})
        from datavec_ray.util import dataset_to_table
        agg = dataset_to_table(
            ds_or_table.map_batches(partial, batch_format="pyarrow")
            .groupby("term").sum(["df", "docs"]))
        n_docs = int(pc.sum(agg["sum(docs)"]).as_py() or 0)
        items = [(t, c) for t, c in zip(agg["term"].to_pylist(),
                                        agg["sum(df)"].to_pylist())
                 if c >= min_df]
    items.sort(key=lambda kv: (-kv[1], kv[0]))
    items = items[:max_vocab]
    vocab = {t: i for i, (t, _) in enumerate(items)}
    idf = {t: math.log((n_docs + 1) / (c + 1)) + 1.0 for t, c in items}
    return {"vocab": vocab, "idf": idf, "n_docs": n_docs}


class TfidfVectorize:
    """Pass 2 (actor-pool stage): broadcast vocab/IDF via ray.put, emit a
    dense list<float32> tfidf column per document
    (TfidfVectorizer.java:38 semantics: tf·idf, no normalization)."""

    def __init__(self, model_ref, text_col: str = "text",
                 out_col: str = "tfidf", dtype=np.float32):
        import ray
        model = ray.get(model_ref) if not isinstance(model_ref, dict) else model_ref
        self.vocab, self.idf = model["vocab"], model["idf"]
        self.text_col, self.out_col = text_col, out_col
        self.dtype = np.dtype(dtype)
        self.width = len(self.vocab)
        self.idf_arr = np.zeros(self.width, dtype=self.dtype)
        for t, i in self.vocab.items():
            self.idf_arr[i] = self.idf[t]

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks_per_doc = _tokenize_batch(batch[self.text_col])
        mat = np.zeros((len(toks_per_doc), self.width), dtype=self.dtype)
        for i, toks in enumerate(toks_per_doc):
            for t in toks:
                j = self.vocab.get(t)
                if j is not None:
                    mat[i, j] += 1.0
        mat *= self.idf_arr
        out_t = pa.float64() if self.dtype == np.float64 else pa.float32()
        arr = pa.FixedSizeListArray.from_arrays(pa.array(mat.ravel()),
                                                self.width) \
            .cast(pa.list_(out_t))
        return batch.append_column(pa.field(self.out_col, pa.list_(out_t)),
                                   arr)
