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


# ---------------------------------------------------------------------------
# token preprocessors: ending-stripper, Porter stemmer, stopword removal
# (reference: tokenization/tokenizer/preprocessor/EndingPreProcessor.java,
#  stopwords/StopWords.java — the repo-side counterparts operate on token
#  COLUMNS, vectorized by stemming each batch's DISTINCT tokens once)
# ---------------------------------------------------------------------------

# the reference's /stopwords classpath resource is the standard English
# list (StopWords.java loads it verbatim); artifacts like '----s' and
# quoted duplicates are dropped, words kept
STOP_WORDS = frozenset("""
a about above after again against all am an and any are aren't as at be
because been before being below between both but by can't cannot could
couldn't did didn't do does doesn't doing don't down during each few for
from further had hadn't has hasn't haven't having he he'd he'll he's her
here here's hers herself him himself his how how's i i'd i'll i'm i've
if in into is isn't it it's its itself let's me more most mustn't my
myself no nor not of off on once only or other ought our ours ourselves
out over own same shan't she she'd she'll she's should shouldn't so some
such than that that's the their theirs them themselves then there
there's these they they'd they'll they're they've this those through to
too under until up very was wasn't we we'd we'll we're we've were
weren't what what's when when's where where's which while who who's whom
why why's with won't would wouldn't you you'd you'll you're you've your
yours yourself yourselves
""".split())


def ending_stem_array(tokens: pa.Array) -> pa.Array:
    """EndingPreProcessor.java parity, fully vectorized Arrow kernels —
    strip (in this order, each conditionally) a trailing
    's' (not 'ss'), '.', 'ed', 'ing', 'ly'. SQL-mirrorable: five nested
    regexp_replace calls reproduce it term for term."""
    t = tokens
    # trailing 's' unless 'ss' (RE2 has no lookbehind: backref keeps
    # the preceding char; a bare "s" token is handled by ^s$)
    t = pc.replace_substring_regex(t, r"^s$", "")
    t = pc.replace_substring_regex(t, r"([^s])s$", r"\1")
    for pat in (r"\.$", r"ed$", r"ing$", r"ly$"):
        t = pc.replace_substring_regex(t, pat, "")
    return t


# -- Porter stemmer (Porter 1980, public algorithm) -------------------------

_VOWELS = set("aeiou")


def _cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences (the m in Porter's paper)."""
    m, prev_c = 0, True
    started = False
    for i in range(len(stem)):
        c = _cons(stem, i)
        if started and prev_c and not c:
            pass
        if not c:
            started = True
        if c and started and not prev_c:
            m += 1
        prev_c = c
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    return (_cons(w, len(w) - 3) and not _cons(w, len(w) - 2)
            and _cons(w, len(w) - 1) and w[-1] not in "wxy")


_STEP2 = [("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
          ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
          ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
          ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
          ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
          ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
          ("biliti", "ble")]
_STEP3 = [("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
          ("ical", "ic"), ("ful", ""), ("ness", "")]
_STEP4 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
          "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize"]


def porter_stem(word: str) -> str:
    """Porter (1980) stemming algorithm, the classic 5-step definition
    (the standard stemmer the reference's NLP pipeline family builds on;
    EndingPreProcessor is its crude sibling)."""
    w = word.lower()
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]
    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            if _measure(w[:-len(suf)]) > 0:
                w = w[:-len(suf)] + rep
            break
    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            if _measure(w[:-len(suf)]) > 0:
                w = w[:-len(suf)] + rep
            break
    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[:-len(suf)]
            if suf == "ion":
                pass
            if _measure(stem) > 1:
                if suf == "ion" and not stem.endswith(("s", "t")):
                    break
                w = stem
            break
    else:
        if w.endswith("ion") and _measure(w[:-3]) > 1 \
                and w[:-3].endswith(("s", "t")):
            w = w[:-3]
    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if _ends_double_cons(w) and w[-1] == "l" and _measure(w) > 1:
        w = w[:-1]
    return w


@register("step")
class StemTokens(Step):
    """Stem a token column in place. ``mode='ending'`` is
    EndingPreProcessor.java parity (vectorized Arrow regex chain,
    SQL-mirrorable); ``mode='porter'`` is the full Porter algorithm,
    applied once per DISTINCT batch token via dictionary encoding —
    cost scales with vocabulary, not corpus."""

    def __init__(self, column: str, mode: str = "porter"):
        if mode not in ("porter", "ending"):
            raise ValueError(f"mode must be 'porter' or 'ending', got {mode!r}")
        self.column, self.mode = column, mode

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        return schema

    def apply(self, table: pa.Table) -> pa.Table:
        col = combine(table[self.column])
        i = table.schema.get_field_index(self.column)
        if self.mode == "ending":
            out = ending_stem_array(col)
        else:
            d = col.dictionary_encode()
            toks = d.dictionary.to_pylist()
            stemmed = pa.array([porter_stem(t) if t is not None else None
                                for t in toks], pa.string())
            out = pa.DictionaryArray.from_arrays(d.indices, stemmed) \
                .cast(pa.string())
        return table.set_column(i, pa.field(self.column, pa.string()), out)

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "StemTokens", "column": self.column, "mode": self.mode}


@register("step")
class RemoveStopWords(Step):
    """Drop rows whose token column is a stop word (StopWords.java:
    the classpath English list), case-insensitive; composes with
    TextToTermIndex / StemTokens in token-per-row pipelines."""

    def __init__(self, column: str, stopwords: Optional[Sequence[str]] = None):
        self.column = column
        self.stopwords = sorted(stopwords) if stopwords is not None else None

    def output_schema(self, schema: Schema) -> Schema:
        schema.require(self.column)
        return schema

    def apply(self, table: pa.Table) -> pa.Table:
        sw = pa.array(sorted(self.stopwords if self.stopwords is not None
                             else STOP_WORDS), pa.string())
        low = pc.utf8_lower(pc.fill_null(combine(table[self.column]), ""))
        return table.filter(pc.invert(pc.is_in(low, value_set=sw)))

    def to_dict(self) -> dict[str, Any]:
        return {"cls": "RemoveStopWords", "column": self.column,
                "stopwords": self.stopwords}


# ---------------------------------------------------------------------------
# moving-window context windows (movingwindow/Windows.java:146 —
# windowForWordInPosition: per token, a window of contextSize =
# floor((windowSize-1)/2) neighbors each side, '<s>'/'</s>' padding)
# ---------------------------------------------------------------------------

def context_windows(ds, text_col: str = "text", id_col: str = "doc_id",
                    window_size: int = 5):
    """One row per (document, token position): the focus word plus its
    padded context window (list<string> of length 2*contextSize+1) —
    the word2vec-style training-window expansion of Windows.java.

    Fully vectorized: ONE whitespace split per batch, every window
    column gathered by a shifted take over the flat token array with
    boundary masks — no per-document Python. Narrow op (no shuffle):
    each document's windows come from its own batch."""
    c = (window_size - 1) // 2
    W = 2 * c + 1

    def w(batch: pa.Table) -> pa.Table:
        col = combine(batch[text_col])
        parts = pc.split_pattern(pc.fill_null(col, ""), " ")
        flat = pc.list_flatten(parts)
        offs = np.asarray(parts.offsets, dtype=np.int64)
        row_of = np.repeat(np.arange(len(parts)), np.diff(offs))
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        toks = flat.filter(pa.array(nonempty))
        row_of = row_of[nonempty]
        n = len(row_of)
        ids = combine(batch[id_col]).take(pa.array(row_of, pa.int64()))
        # per-doc [start, end) over the filtered flat token array
        starts_mask = np.ones(n, dtype=bool)
        starts_mask[1:] = row_of[1:] != row_of[:-1]
        doc_start = np.maximum.accumulate(
            np.where(starts_mask, np.arange(n), 0))
        doc_len = np.diff(np.append(np.flatnonzero(starts_mask), n)) \
            if n else np.array([], np.int64)
        doc_end = doc_start + np.repeat(doc_len, doc_len) \
            if n else np.zeros(0, np.int64)
        pos = np.arange(n) - doc_start
        cols: list[pa.Array] = []
        for delta in range(-c, c + 1):
            idx = np.arange(n) + delta
            valid = (idx >= doc_start) & (idx < doc_end)
            got = toks.take(pa.array(np.where(valid, idx, 0), pa.int64()))
            pad = "<s>" if delta < 0 else "</s>"
            cols.append(pc.if_else(pa.array(valid), got,
                                   pa.scalar(pad, pa.string())))
        inter = np.empty(n * W, dtype=object)
        for j, arr in enumerate(cols):
            inter[j::W] = arr.to_pylist()
        win = pa.FixedSizeListArray.from_arrays(
            pa.array(inter, pa.string()), W).cast(pa.list_(pa.string()))
        return pa.table({
            id_col: ids,
            "seq_pos": pa.array(pos.astype(np.int32)),
            "focus": toks,
            "window": win,
        })

    w.__name__ = "context_windows"
    return ds.map_batches(w, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# context-label extraction (movingwindow/ContextLabelRetriever.java:52 —
# strip <LABEL>...</LABEL> span markers from a sentence, return the clean
# text plus (begin_char, end_char, label) spans over the STRIPPED text;
# unmarked stretches get label 'NONE')
# ---------------------------------------------------------------------------

_BEGIN_LABEL = re.compile(r"^<([A-Za-z]+|\d+)>$")
_END_LABEL = re.compile(r"^</([A-Za-z]+|\d+)>$")


def string_with_labels(sentence: str) -> tuple[str, list[tuple[int, int, str]]]:
    """One sentence → (stripped sentence, [(begin, end, label), ...]).
    Mismatched begin/end labels raise, an end without a begin raises —
    the reference's invariants."""
    segments: list[tuple[str, list[str]]] = []
    curr: list[str] = []
    curr_label = None
    for token in sentence.split():
        mb = _BEGIN_LABEL.match(token)
        me = _END_LABEL.match(token)
        if mb:
            if curr:
                segments.append(("NONE", curr))
                curr = []
            curr_label = mb.group(1)
        elif me:
            if curr_label is None:
                raise ValueError(
                    "found an ending label with no matching begin label")
            if me.group(1) != curr_label:
                raise ValueError(
                    f"label mismatch: <{curr_label}> ended by {token}")
            segments.append((curr_label, curr))
            curr = []
            curr_label = None
        else:
            curr.append(token)
    if curr:
        segments.append(("none", curr))
    stripped = ""
    spans: list[tuple[int, int, str]] = []
    for label, toks in segments:
        joined = " ".join(toks)
        if stripped:
            stripped += " "
        stripped += joined
        # the reference's indexOf-after-append (first occurrence wins
        # for repeated span text — quirk preserved)
        begin = stripped.find(joined) if joined else len(stripped)
        spans.append((begin, begin + len(joined), label))
    return stripped, spans


def extract_context_labels(ds, text_col: str = "text",
                           id_col: str = "doc_id"):
    """Dataset version: one output row per labeled span —
    (id, begin, end, label, span_text, stripped). Narrow map_batches
    (label markup never crosses documents); the per-row parse is the
    reference's sequential grammar, applied over each batch."""
    def run(batch: pa.Table) -> pa.Table:
        ids, begins, ends, labels, span_txt, stripped_out = \
            [], [], [], [], [], []
        id_vals = combine(batch[id_col]).to_pylist()
        for rid, txt in zip(id_vals,
                            combine(batch[text_col]).to_pylist()):
            stripped, spans = string_with_labels(txt or "")
            for b, e, lab in spans:
                ids.append(rid)
                begins.append(b)
                ends.append(e)
                labels.append(lab)
                span_txt.append(stripped[b:e])
                stripped_out.append(stripped)
        return pa.table({
            id_col: pa.array(ids),
            "begin": pa.array(begins, pa.int64()),
            "end": pa.array(ends, pa.int64()),
            "label": pa.array(labels, pa.string()),
            "span_text": pa.array(span_txt, pa.string()),
            "stripped": pa.array(stripped_out, pa.string()),
        })

    run.__name__ = "extract_context_labels"
    return ds.map_batches(run, batch_format="pyarrow")
