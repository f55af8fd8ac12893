"""Text analysis for training-data curation: token counting, quality
scoring, language ID, document fingerprinting.

All stages are vectorized ``map_batches`` bodies over Arrow batches;
the regex/token machinery is compiled once per actor when used through
``TextStats`` as an actor pool (``map_batches(TextStats, concurrency=N)``)
— the reference's "heavy resource per worker" pattern
(``datavec-geo/.../IPAddressToCoordinatesTransform.java:31``).

Definitions are chosen to be EXACTLY SQL-expressible where the driver's
DuckDB oracle needs them (token = space-separated non-empty run;
fingerprint = md5 of case/whitespace-normalized text).
"""

from __future__ import annotations

import hashlib
import re
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datavec_ray.hll import hash64
from datavec_ray.steps.base import combine

_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on "
    "with as at by from not but".split())

# crude character-frequency profiles for latin-script language ID
_LANG_MARKERS = {
    "en": frozenset([" the ", " and ", " of ", " to ", " is ", " that "]),
    "fr": frozenset([" le ", " la ", " les ", " de ", " et ", " est ", " une "]),
    "de": frozenset([" der ", " die ", " das ", " und ", " ist ", " nicht "]),
    "es": frozenset([" el ", " la ", " los ", " de ", " que ", " es ", " una "]),
    "it": frozenset([" il ", " la ", " di ", " che ", " e ", " una ", " per "]),
}


def token_count(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Number of space-separated non-empty tokens.

    SQL equivalent: len(list_filter(string_split(text, ' '), x -> x <> '')).
    """
    col = combine(col)
    parts = pc.split_pattern(pc.fill_null(col, ""), " ")
    flat = pc.list_flatten(parts)
    nonempty = pc.cast(pc.not_equal(flat, ""), pa.int64())
    offsets = np.asarray(parts.offsets)
    row_of = np.repeat(np.arange(len(parts)), np.diff(offsets))
    out = np.zeros(len(parts), dtype=np.int64)
    np.add.at(out, row_of, nonempty.to_numpy(zero_copy_only=False))
    return pa.array(out)


# GPT-2-style pre-tokenizer pattern, lookahead-free so it runs
# identically on RE2 (pyarrow / DuckDB) and Python re: contractions,
# space-prefixed letter runs, digit runs, punctuation runs, whitespace.
BPE_PATTERN = r"'(s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"


def bpe_token_count(col: pa.ChunkedArray | pa.Array,
                    pattern: str = BPE_PATTERN) -> pa.Array:
    """BPE-ish token count: non-overlapping matches of a GPT-2-style
    pre-tokenizer regex, in ONE vectorized RE2 kernel
    (pc.count_substring_regex). SQL equivalent (same RE2 engine):
    len(regexp_extract_all(text, pattern))."""
    return pc.count_substring_regex(
        pc.fill_null(combine(col), ""), pattern).cast(pa.int64())


def add_text_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_chars_c, n_tokens, alpha_ratio, upper_ratio, space_ratio,
    quality_score — all pyarrow kernels."""
    col = combine(batch[text_col])
    filled = pc.fill_null(col, "")
    n_chars = pc.utf8_length(filled)
    n_tokens = token_count(col)
    n_alpha = pc.utf8_length(pc.replace_substring_regex(filled, r"[^\pL]", ""))
    n_upper = pc.utf8_length(pc.replace_substring_regex(filled, r"[^\p{Lu}]", ""))
    n_space = pc.utf8_length(pc.replace_substring_regex(filled, r"[^ ]", ""))
    denom = pc.max_element_wise(n_chars, 1)
    alpha_ratio = pc.divide(pc.cast(n_alpha, pa.float64()), pc.cast(denom, pa.float64()))
    upper_ratio = pc.divide(pc.cast(n_upper, pa.float64()), pc.cast(denom, pa.float64()))
    space_ratio = pc.divide(pc.cast(n_space, pa.float64()), pc.cast(denom, pa.float64()))
    # simple quality score in [0,1]: length-capped * alpha-weighted
    len_score = pc.min_element_wise(
        pc.divide(pc.cast(n_chars, pa.float64()), 200.0), 1.0)
    quality = pc.multiply(pc.add(pc.multiply(alpha_ratio, 0.7),
                                 pc.multiply(pc.subtract(1.0, upper_ratio), 0.3)),
                          len_score)
    for name, arr in [("n_chars_c", pc.cast(n_chars, pa.int64())),
                      ("n_tokens", n_tokens),
                      ("alpha_ratio", alpha_ratio),
                      ("upper_ratio", upper_ratio),
                      ("space_ratio", space_ratio),
                      ("quality_score", quality)]:
        batch = batch.append_column(pa.field(name, arr.type), combine(arr))
    return batch


def fingerprint_md5(batch: pa.Table, text_col: str = "text",
                    out_col: str = "fp") -> pa.Table:
    """md5 of lower(remove-all-whitespace(text)) — SQL-checkable:
    md5(regexp_replace(lower(text), '\\s', '', 'g'))."""
    norm = pc.replace_substring_regex(
        pc.utf8_lower(pc.fill_null(combine(batch[text_col]), "")), r"\s", "")
    vals = norm.to_pylist()
    fps = [hashlib.md5(v.encode("utf-8")).hexdigest() for v in vals]
    return batch.append_column(pa.field(out_col, pa.string()),
                               pa.array(fps, pa.string()))


def rolling_fingerprint(batch: pa.Table, text_col: str = "text",
                        out_col: str = "rfp", window: int = 8) -> pa.Table:
    """Polynomial rolling-hash document fingerprint: min of rolling hashes
    over byte windows (a winnowing-style signature; Schleimer et al. 2003).

    Vectorized over the WHOLE BATCH: one flat uint8 view of the Arrow
    string buffer, one sliding-window hash pass over all documents at
    once, per-document mins via ``np.minimum.reduceat`` — no Python
    loop over documents (a loop bounded by ``window`` handles the few
    docs shorter than the window, one iteration per distinct length)."""
    col = combine(batch[text_col])
    nrows = len(col)
    out = np.zeros(nrows, dtype=np.uint64)
    if nrows == 0:
        return batch.append_column(pa.field(out_col, pa.uint64()),
                                   pa.array(out))
    B = np.uint64(1000003)
    arr = pa.chunked_array([pc.fill_null(col, "")]) \
        .cast(pa.large_binary()).combine_chunks()
    off = np.frombuffer(arr.buffers()[1], np.int64)[
        arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
    flat = np.frombuffer(arr.buffers()[2] or b"", np.uint8) \
        .astype(np.uint64)[off[0]:off[-1]]
    off = off - off[0]
    lens = np.diff(off)
    # uint64 wraparound is intentional (modular polynomial hash); keep
    # numpy from emitting scalar-overflow RuntimeWarnings for it.
    with np.errstate(over="ignore"):
        pw = np.ones(window, dtype=np.uint64)
        for j in range(1, window):
            pw[j] = pw[j - 1] * B
        if len(flat) >= window:
            # hash of window starting at k: sum flat[k+j] * B^(w-1-j)
            mat = np.lib.stride_tricks.sliding_window_view(flat, window)
            hashes = (mat * pw[::-1]).sum(axis=1, dtype=np.uint64)
            # valid window starts per doc: off[d] .. off[d]+len-window
            full = lens >= window
            if full.any():
                counts = (lens[full] - window + 1).astype(np.int64)
                starts = off[:-1][full]
                idx = np.repeat(starts, counts) + _pos_in_segment(counts)
                segs = np.concatenate(([0], np.cumsum(counts)[:-1]))
                out[full] = np.minimum.reduceat(hashes[idx], segs)
        # short docs (0 < len < window): prefix hash, one vectorized
        # pass per distinct length (< window iterations total)
        for ln in np.unique(lens[(lens > 0) & (lens < window)]):
            sel = lens == ln
            starts = off[:-1][sel]
            mat = flat[starts[:, None] + np.arange(ln)]
            out[sel] = (mat * pw[:ln][::-1]).sum(axis=1, dtype=np.uint64)
    return batch.append_column(pa.field(out_col, pa.uint64()), pa.array(out))


def _pos_in_segment(counts: np.ndarray) -> np.ndarray:
    """[3, 2] -> [0, 1, 2, 0, 1] (vectorized per-segment arange)."""
    total = int(counts.sum())
    ids = np.repeat(np.arange(len(counts)), counts)
    base = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return np.arange(total, dtype=np.int64) - base[ids]


_QS_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


def quality_signals(batch: pa.Table, text_col: str = "text",
                    min_words: int = 20, max_words: int = 5000,
                    max_top_word_frac: float = 0.12,
                    min_distinct_frac: float = 0.5,
                    stopword_band: tuple = (0.02, 0.3)) -> pa.Table:
    """Gopher-style repetition/quality signals per document (Rae et al.
    2021, "Scaling Language Models", §A1.1 — public), adapted to
    single-line docs: word count, mean word length, top-word fraction
    (repetition), distinct-word fraction, stopword fraction, and a
    boolean `keep` applying the banded thresholds.

    Fully vectorized: ONE split per batch, dictionary-encoded words,
    per-doc aggregation via segmented bincount / np.maximum.at — no
    per-document Python loop. Every signal is exactly SQL-expressible
    (unnest + group by) so the driver's DuckDB oracle hash-checks it.
    """
    col = combine(batch[text_col])
    parts = pc.split_pattern(pc.fill_null(col, ""), " ")
    flat = pc.list_flatten(parts)
    offsets = np.asarray(parts.offsets)
    row_of = np.repeat(np.arange(len(parts)), np.diff(offsets))
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    row_of = row_of[nonempty]
    words = flat.filter(pa.array(nonempty))

    ndocs = len(parts)
    n_words = np.bincount(row_of, minlength=ndocs).astype(np.int64)
    denom = np.maximum(n_words, 1).astype(np.float64)

    wlen = pc.utf8_length(words).to_numpy(zero_copy_only=False)
    mean_word_len = np.bincount(row_of, weights=wlen, minlength=ndocs) / denom

    dic = pc.dictionary_encode(words)
    codes = np.asarray(dic.indices, dtype=np.int64)
    vocab = max(len(dic.dictionary), 1)
    uniq, counts = np.unique(row_of.astype(np.int64) * vocab + codes,
                             return_counts=True)
    urow = (uniq // vocab).astype(np.int64)
    distinct_frac = np.bincount(urow, minlength=ndocs) / denom
    topc = np.zeros(ndocs, dtype=np.int64)
    np.maximum.at(topc, urow, counts)
    top_word_frac = topc / denom

    stop = pc.is_in(words, value_set=pa.array(list(_QS_STOPWORDS))) \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    stopword_frac = np.bincount(row_of, weights=stop, minlength=ndocs) / denom

    keep = ((n_words >= min_words) & (n_words <= max_words)
            & (top_word_frac <= max_top_word_frac)
            & (distinct_frac >= min_distinct_frac)
            & (stopword_frac >= stopword_band[0])
            & (stopword_frac <= stopword_band[1])).astype(np.int32)

    for name, arr in [("n_words", pa.array(n_words)),
                      ("mean_word_len", pa.array(np.round(mean_word_len, 6))),
                      ("top_word_frac", pa.array(np.round(top_word_frac, 6))),
                      ("distinct_frac", pa.array(np.round(distinct_frac, 6))),
                      ("stopword_frac", pa.array(np.round(stopword_frac, 6))),
                      ("keep", pa.array(keep))]:
        batch = batch.append_column(pa.field(name, arr.type), arr)
    return batch


class TextStats:
    """Actor-pool stage: regexes/profiles compiled once per actor
    (__init__), batches scored in __call__ — language ID + stats."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"\w+", re.UNICODE)

    def _lang_batch(self, texts: pa.Array) -> pa.Array:
        """Vectorized language ID: script ranges by one regex count per
        script, marker frequencies by one substring-count kernel per
        marker — no per-document Python loop. Semantics identical to
        the original scalar heuristic (same prefixes, thresholds,
        non-overlapping counts, first-language tie-break)."""
        t = pc.fill_null(texts, "")
        head = pc.utf8_slice_codeunits(t, 0, 200)
        hlen = pc.utf8_length(head).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cjk = pc.count_substring_regex(head, "[一-鿿぀-ヿ]") \
            .to_numpy(zero_copy_only=False)
        cyr = pc.count_substring_regex(head, "[Ѐ-ӿ]") \
            .to_numpy(zero_copy_only=False)
        padded = pc.binary_join_element_wise(
            " ", pc.utf8_lower(pc.utf8_slice_codeunits(t, 0, 1000)), " ",
            "")
        langs = list(_LANG_MARKERS)
        counts = np.zeros((len(langs), len(t)), np.int64)
        for i, lang in enumerate(langs):
            for m in _LANG_MARKERS[lang]:
                counts[i] += pc.count_substring(padded, m) \
                    .to_numpy(zero_copy_only=False)
        best = np.argmax(counts, axis=0)          # first max wins ties
        out = np.array(langs, object)[best]
        out[counts.max(axis=0) == 0] = "unknown"
        out[cyr > hlen * 0.2] = "ru"
        out[cjk > hlen * 0.2] = "cjk"
        return pa.array(out, pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = add_text_stats(batch, self.text_col)
        return batch.append_column(
            pa.field("lang_id", pa.string()),
            self._lang_batch(combine(batch[self.text_col])))


# PII scrubbing patterns. RE2 syntax ONLY (no lookaround/backrefs) so
# the exact same strings run on pyarrow's replace_substring_regex and
# DuckDB's regexp_replace — the oracle shares them verbatim. Order
# matters: email before ipv4 (a dotted-quad inside a hostname must be
# consumed by the email rule first).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}[ -]\d{3}[ -]\d{3,4}[ -]\d{2,4}", "<PHONE>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
]


def redact_pii(col: pa.ChunkedArray | pa.Array,
               kinds: list[str] | None = None) -> pa.Array:
    """Replace every PII match with its placeholder — chained global
    vectorized RE2 replacements (one ``replace_substring_regex`` kernel
    per pattern per batch, no Python row loop). The standard scrub
    stage of a training-data pipeline; patterns are deliberately
    conservative (precision over recall) and extensible via
    ``PII_PATTERNS``-shaped tuples."""
    out = combine(col)
    for name, pat, repl in PII_PATTERNS:
        if kinds is not None and name not in kinds:
            continue
        out = pc.replace_substring_regex(out, pattern=pat, replacement=repl)
    return out


def top_ngrams(ds, text_col: str = "text", n: int = 2, k: int = 50,
               sep: str = " "):
    """Corpus-wide top-k most frequent word n-grams — the vocabulary /
    boilerplate report a curation pipeline runs before choosing dedup
    and filter thresholds.

    Plan: per-batch vectorized gram counting (one split + one
    element-wise join + one Acero hash count per batch = the map-side
    combiner, so the shuffle moves (gram, partial_count) rows bounded
    by per-batch vocabulary, never raw grams) → ``groupby(gram).sum``
    → total-order sort (count desc, gram asc — deterministic under
    ties) → ``limit(k)``. Tokenization is exact ``sep``-split (no
    lowercasing) so SQL oracles reproduce it verbatim.
    """
    import numpy as np

    from datavec_ray.steps.base import combine as _combine

    def _counts(batch: pa.Table) -> pa.Table:
        lst = pc.split_pattern(pc.fill_null(_combine(batch[text_col]), ""),
                               sep)
        flat = _combine(pc.list_flatten(lst))
        m = len(flat) - n + 1
        if m <= 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        counts = np.diff(np.asarray(lst.offsets, dtype=np.int64))
        row_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        valid = row_of[:m] == row_of[n - 1:]
        grams = pc.binary_join_element_wise(
            *(flat.slice(i, m) for i in range(n)), sep)
        grams = grams.filter(pa.array(valid))
        agg = pa.table({"gram": grams}).group_by("gram") \
            .aggregate([("gram", "count")])
        return pa.table({"gram": agg["gram"],
                         "n": agg["gram_count"].cast(pa.int64())})

    def _rename(batch: pa.Table) -> pa.Table:
        return pa.table({"gram": batch["gram"],
                         "n": batch["sum(n)"].cast(pa.int64())})

    return (ds.map_batches(_counts, batch_format="pyarrow")
            .groupby("gram").sum("n")
            .map_batches(_rename, batch_format="pyarrow")
            .sort(["n", "gram"], descending=[True, False])
            .limit(k))


def chunk_words(ds, text_col: str = "text", id_cols: Sequence[str] = ("doc_id",),
                chunk: int = 128, overlap: int = 0,
                chunk_idx_col: str = "chunk_idx"):
    """Context-window chunking: split each document's word sequence into
    windows of ``chunk`` words advancing by ``chunk - overlap`` (so
    consecutive chunks share ``overlap`` words) — the standard
    max-sequence-length preparation step before tokenize-and-pack.
    Output: one row per chunk with the id columns, ``chunk_idx_col``
    (0-based) and ``text_col`` replaced by the chunk text. A document
    with W words yields ceil(W/step) chunks (W=0 → one empty chunk), so
    every input row survives.

    Narrow (row-local, no shuffle) and fully vectorized: one
    whitespace split per batch, chunk index ranges built by a
    repeat/cumsum gather on the flat word array, one ``binary_join``
    to materialize chunk strings.
    """
    if overlap >= chunk:
        raise ValueError("overlap must be < chunk")
    step = chunk - overlap
    id_cols = list(id_cols)

    def _chunk(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(
            pc.fill_null(combine(batch[text_col]), ""), " ")
        off = words.offsets.to_numpy(zero_copy_only=False)
        lens = off[1:] - off[:-1]
        n_chunks = np.maximum(1, np.ceil(lens / step)).astype(np.int64)
        doc_of_chunk = np.repeat(np.arange(len(lens)), n_chunks)
        # j = chunk ordinal within its doc: global arange minus each
        # doc's first-chunk position
        first = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
        j = np.arange(n_chunks.sum()) - first[doc_of_chunk]
        starts = off[:-1][doc_of_chunk] + j * step
        ends = np.minimum(starts + chunk, off[1:][doc_of_chunk])
        clens = ends - starts
        # flat gather indices: one arange per chunk, built vectorized
        coff = np.concatenate([[0], np.cumsum(clens)])
        idx = np.arange(coff[-1]) - np.repeat(coff[:-1], clens) \
            + np.repeat(starts, clens)
        flat = words.values.take(pa.array(idx, type=pa.int64()))
        if coff[-1] < 2**31:
            la = pa.ListArray.from_arrays(pa.array(coff, pa.int32()), flat)
            texts = pc.binary_join(la.cast(pa.list_(pa.string())),
                                   pa.scalar(" "))
        else:       # >2^31 words in one batch: large_list offsets
            la = pa.LargeListArray.from_arrays(pa.array(coff, pa.int64()),
                                               flat)
            texts = pc.binary_join(la.cast(pa.large_list(pa.string())),
                                   pa.scalar(" ")).cast(pa.string())
        cols = {c: combine(batch[c]).take(
            pa.array(doc_of_chunk, type=pa.int64())) for c in id_cols}
        cols[chunk_idx_col] = pa.array(j, type=pa.int64())
        cols[text_col] = texts
        return pa.table(cols)

    return ds.map_batches(_chunk, batch_format="pyarrow")


# Abbreviations whose trailing dot must NOT end a sentence. Fixed
# order — the SQL oracle mirrors the replacement chain term-for-term
# (each dot temporarily becomes \x01, restored after the split).
SENT_ABBREVS = ("Mr.", "Mrs.", "Ms.", "Dr.", "Prof.", "St.", "vs.",
                "etc.", "e.g.", "i.e.", "No.", "U.S.")
SENT_SPLIT_RE = r"[.!?]+[ \t\r\n]+"
_SENT_WS = " \t\r\n"


def split_sentences(ds, text_col: str = "text",
                    id_cols: Sequence[str] = ("doc_id",),
                    out_col: str = "sentence",
                    idx_col: str = "sent_idx"):
    """Rule-based sentence splitting: break each document at runs of
    ``.!?`` followed by whitespace, with an abbreviation guard
    (``Mr. Smith`` stays one sentence). Output: one row per non-empty
    sentence with the id columns, a 0-based ``idx_col`` and the
    sentence text (terminal punctuation stripped, abbreviation dots
    kept). Composes with ``chunk_words`` / ``context_windows`` for
    sentence-aware packing — the rule-based counterpart of the
    reference's UIMA sentence annotator (datavec-data-nlp
    PosUimaTokenizer.java), whose external models stay out of scope.

    Narrow (row-local, no shuffle) and vectorized: chained RE2-free
    substring replacements for the abbreviation guard, ONE
    split_pattern_regex per batch, flat-array cleanup kernels, and a
    segmented cumcount for the per-document ordinals. Every kernel is
    mirrored term-for-term in the SQL oracle (replace → regexp_split →
    trim → strip-terminal-punctuation → restore dots → drop empties)."""
    id_cols = list(id_cols)

    def _split(batch: pa.Table) -> pa.Table:
        txt = pc.fill_null(combine(batch[text_col]), "")
        for a in SENT_ABBREVS:
            txt = pc.replace_substring(
                txt, pattern=a, replacement=a.replace(".", "\x01"))
        parts = pc.split_pattern_regex(txt, SENT_SPLIT_RE)
        off = parts.offsets.to_numpy(zero_copy_only=False)
        flat = pc.utf8_trim(parts.values, characters=_SENT_WS)
        flat = pc.replace_substring_regex(flat, pattern=r"[.!?]+$",
                                          replacement="")
        flat = pc.replace_substring(flat, pattern="\x01", replacement=".")
        keep = pc.not_equal(pc.fill_null(flat, ""), "") \
            .to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(off) - 1), np.diff(off))
        kidx = np.flatnonzero(keep)
        kd = doc_of[kidx]
        pos = np.arange(len(kd), dtype=np.int64)
        new_doc = np.ones(len(kd), dtype=bool)
        if len(kd) > 1:
            new_doc[1:] = kd[1:] != kd[:-1]
        first = np.maximum.accumulate(np.where(new_doc, pos, 0))
        cols = {c: combine(batch[c]).take(pa.array(kd, pa.int64()))
                for c in id_cols}
        cols[idx_col] = pa.array(pos - first, pa.int64())
        cols[out_col] = flat.take(pa.array(kidx, pa.int64()))
        return pa.table(cols)

    return ds.map_batches(_split, batch_format="pyarrow")


def unigram_logprob(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Unigram language-model scoring: per document, the mean natural
    log-probability per token under the corpus's OWN unigram
    distribution — the cheap perplexity proxy curation pipelines use to
    rank documents by "typicality" before (or instead of) a real LM
    (CCNet trains KenLM for the same role; the unigram version is its
    zero-dependency floor). Low scores = rare-token-heavy documents
    (gibberish, boilerplate-free noise); returns ``(id_col, n_tokens,
    logprob_per_token)`` sorted by id, empty-token docs excluded.

    Two passes, no shuffle of documents:
    1. corpus token frequencies — per-batch vectorized hash counting
       (the map-side combiner: one `_tokenize_flat` + np.unique per
       batch, shuffle moves (token_hash, partial_count) rows bounded by
       per-batch vocabulary) → one small ``groupby(h).sum``;
    2. the vocabulary ships back as TWO ray.put'd sorted arrays (hash,
       ln-prob) read zero-copy by every map task; per-doc scoring is a
       searchsorted + add.reduceat per batch. Web-scale vocabularies
       are Zipf-bounded (counts, not text), but if the vocab ever
       outgrew worker memory the broadcast would become a hash-partition
       join on token hash — same layout the LSH stages already use.

    Matching on 64-bit token hashes equals matching on token strings
    modulo negligible collisions (the assumption every oracle-checked
    gram op here rests on).
    """
    import ray

    from datavec_ray.ops.dedup import _tokenize_flat
    from datavec_ray.util import dataset_to_table

    def _vocab_counts(b: pa.Table) -> pa.Table:
        th, _ = _tokenize_flat(b[text_col])
        if len(th) == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        u, c = np.unique(th, return_counts=True)
        return pa.table({"h": pa.array(u.view(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    vocab = dataset_to_table(
        ds.map_batches(_vocab_counts, batch_format="pyarrow")
        .groupby("h").sum("c"))
    if vocab.num_rows == 0 or "h" not in vocab.column_names:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "logprob_per_token": pa.array([], pa.float64())}))
    h = vocab["h"].to_numpy(zero_copy_only=False)
    c = vocab["sum(c)"].to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.argsort(h)
    h, c = h[order], c[order]
    lp = np.log(c / c.sum())
    h_ref, lp_ref = ray.put(h), ray.put(lp)

    class _Score:
        def __init__(self):
            self.h = ray.get(h_ref)
            self.lp = ray.get(lp_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = combine(b[id_col]).cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            th, offs = _tokenize_flat(b[text_col])
            counts = np.diff(offs)
            pos = np.searchsorted(self.h, th.view(np.int64))
            tok_lp = self.lp[pos]         # every token is in the vocab
            starts = offs[:-1]
            nz = counts > 0
            if not nz.any():
                return pa.table({
                    id_col: pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "logprob_per_token": pa.array([], pa.float64())})
            sums = np.add.reduceat(np.append(tok_lp, 0.0),
                                   np.minimum(starts[nz], len(th)))
            return pa.table({
                id_col: pa.array(ids[nz]),
                "n_tokens": pa.array(counts[nz]),
                "logprob_per_token": pa.array(sums / counts[nz],
                                              pa.float64())})

    return ds.map_batches(_Score, batch_format="pyarrow",
                          concurrency=(1, 8)).sort(id_col)


def importance_resample(ds, target_ds, text_col: str = "text",
                        id_col: str = "doc_id", tau: float = 1.0,
                        seed: int = 0):
    """DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169 —
    Data Selection with Importance Resampling, hashed-unigram variant):
    score every raw document by its mean per-token log importance
    ``ln p_target(t) - ln p_raw(t)`` under two unigram LMs — the raw
    LM unsmoothed over its own corpus (every scored token exists
    there), the TARGET LM add-one smoothed over the UNION vocabulary so
    tokens unseen in the target keep finite mass — then keep a row iff
    its deterministic uniform draw (the hash_sample splitmix64 chain on
    the id, per-mille resolution) lands under
    ``min(1, exp(score) / tau)``. Higher tau = stricter selection.

    Fully deterministic: scores, probabilities and the kept set are
    pure functions of the data and seed, reproducible across reruns /
    partitionings / engines (the oracle reproduces both LMs, the score
    and the splitmix chain in SQL). Returns kept rows
    ``(id_col, n_tokens, log_importance_per_token)``, empty-token
    documents excluded.

    Scale shape: two frequency passes with map-side combining (shuffle
    = per-batch vocabularies, Zipf-bounded), two broadcast sorted
    arrays (union token hash → precomputed lp difference), then ONE
    streaming score+filter map — documents never shuffle.
    """
    import ray

    from datavec_ray.ops.dedup import _tokenize_flat
    from datavec_ray.util import dataset_to_table

    def _vocab_counts(b: pa.Table) -> pa.Table:
        th, _ = _tokenize_flat(b[text_col])
        if len(th) == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        u, c = np.unique(th, return_counts=True)
        return pa.table({"h": pa.array(u.view(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    def _freq(d):
        t = dataset_to_table(d.map_batches(_vocab_counts,
                                           batch_format="pyarrow")
                             .groupby("h").sum("c"))
        if t.num_rows == 0 or "h" not in t.column_names:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        h = t["h"].to_numpy(zero_copy_only=False)
        c = t["sum(c)"].to_numpy(zero_copy_only=False).astype(np.float64)
        o = np.argsort(h)
        return h[o], c[o]

    rh, rc = _freq(ds)
    th_, tc = _freq(target_ds)
    if len(rh) == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "log_importance_per_token": pa.array([], pa.float64())}))
    n_raw, n_tgt = rc.sum(), tc.sum()
    vocab_union = len(np.union1d(rh, th_))
    # per-RAW-token precomputed lp difference (scored tokens are always
    # in the raw vocabulary)
    pos = np.searchsorted(th_, rh)
    pos_c = np.minimum(pos, max(len(th_) - 1, 0))
    in_tgt = (th_[pos_c] == rh) if len(th_) else np.zeros(len(rh), bool)
    c_tgt = np.where(in_tgt, tc[pos_c] if len(tc) else 0.0, 0.0)
    lp_diff = (np.log((c_tgt + 1.0) / (n_tgt + vocab_union))
               - np.log(rc / n_raw))
    h_ref, d_ref = ray.put(rh), ray.put(lp_diff)
    seed_mix = np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))

    class _ScoreKeep:
        def __init__(self):
            self.h = ray.get(h_ref)
            self.d = ray.get(d_ref)
            self.__name__ = "importance_resample"

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = combine(b[id_col]).cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            th, offs = _tokenize_flat(b[text_col])
            counts = np.diff(offs)
            pos = np.searchsorted(self.h, th.view(np.int64))
            tok_d = self.d[pos]
            starts = offs[:-1]
            nz = counts > 0
            empty = pa.table({
                id_col: pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "log_importance_per_token": pa.array([], pa.float64())})
            if not nz.any():
                return empty
            sums = np.add.reduceat(np.append(tok_d, 0.0),
                                   np.minimum(starts[nz], len(th)))
            score = sums / counts[nz]
            p = np.minimum(1.0, np.exp(score) / tau)
            u = (hash64(ids[nz]) ^ seed_mix) % np.uint64(10000)
            keep = u < np.floor(10000.0 * p).astype(np.uint64)
            if not keep.any():
                return empty
            return pa.table({
                id_col: pa.array(ids[nz][keep]),
                "n_tokens": pa.array(counts[nz][keep]),
                "log_importance_per_token": pa.array(score[keep],
                                                     pa.float64())})

    return ds.map_batches(_ScoreKeep, batch_format="pyarrow",
                          concurrency=(1, 8))


def bigram_logprob(ds, text_col: str = "text", id_col: str = "doc_id",
                   alpha: float = 0.4, lm_ds=None):
    """Bigram language-model scoring with stupid backoff (Brants et al.
    2007, "Large Language Models in Machine Translation" — the
    standard web-scale smoothing): per document of ``ds``, the mean
    natural-log score per transition under the LM built from ``lm_ds``
    (default: ``ds`` itself). score(w2 | w1) = c(w1 w2) / c(w1) when
    the LM saw the bigram, else ``alpha`` * p_add1(w2) (add-one
    unigram over the LM vocabulary, so OOV words keep finite mass).
    A sharper typicality proxy than ``unigram_logprob`` (word order
    counts); documents with < 2 tokens are excluded.

    Same scale shape as the unigram scorer: two map-side-combined
    frequency passes over the LM corpus (unigrams + bigram hashes;
    shuffle volume is the per-batch vocabularies), broadcast sorted
    arrays, then one shuffle-free searchsorted + reduceat scoring map.
    Bigrams match on the splitmix-combined hash of the two token
    hashes — the same hash-equals-string assumption every gram op
    here makes.
    """
    import ray

    from datavec_ray.ops.dedup import _tokenize_flat
    from datavec_ray.util import dataset_to_table

    corpus = lm_ds if lm_ds is not None else ds
    GOLD = np.uint64(0x9E3779B97F4A7C15)

    def _big_hash(th: np.ndarray, offs: np.ndarray) -> np.ndarray:
        """Hashes of consecutive-token pairs WITHIN each doc."""
        if len(th) < 2:
            return np.empty(0, np.uint64)
        h = th[:-1] * GOLD ^ th[1:]
        # drop pairs that straddle a document boundary
        counts = np.diff(offs)
        row_of = np.repeat(np.arange(len(counts)), counts)
        keep = row_of[:-1] == row_of[1:]
        return h[keep]

    def _uni_counts(b: pa.Table) -> pa.Table:
        th, _ = _tokenize_flat(b[text_col])
        if len(th) == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        u, c = np.unique(th, return_counts=True)
        return pa.table({"h": pa.array(u.view(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    def _big_counts(b: pa.Table) -> pa.Table:
        th, offs = _tokenize_flat(b[text_col])
        bh = _big_hash(th, offs)
        if len(bh) == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        u, c = np.unique(bh, return_counts=True)
        return pa.table({"h": pa.array(u.view(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    def _freq(fn):
        t = dataset_to_table(
            corpus.map_batches(fn, batch_format="pyarrow")
            .groupby("h").sum("c"))
        if t.num_rows == 0 or "h" not in t.column_names:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        h = t["h"].to_numpy(zero_copy_only=False).view(np.uint64)
        c = t["sum(c)"].to_numpy(zero_copy_only=False).astype(np.float64)
        o = np.argsort(h)
        return h[o], c[o]

    uh, uc = _freq(_uni_counts)
    bh_, bc = _freq(_big_counts)
    n_uni = uc.sum() if len(uc) else 1.0
    vocab = float(max(len(uh), 1))
    refs = tuple(ray.put(x) for x in (uh, uc, bh_, bc))
    log_alpha = float(np.log(alpha))
    log_denom = float(np.log(n_uni + vocab))

    class _Score:
        def __init__(self):
            self.uh, self.uc, self.bh, self.bc = (ray.get(r) for r in refs)
            self.__name__ = "bigram_logprob"

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = combine(b[id_col]).cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            th, offs = _tokenize_flat(b[text_col])
            counts = np.diff(offs)
            empty = pa.table({
                id_col: pa.array([], pa.int64()),
                "n_bigrams": pa.array([], pa.int64()),
                "logprob_per_bigram": pa.array([], pa.float64())})
            if len(th) < 2:
                return empty
            pair_h = th[:-1] * GOLD ^ th[1:]
            row_of = np.repeat(np.arange(len(counts)), counts)
            within = row_of[:-1] == row_of[1:]
            bpos = np.searchsorted(self.bh, pair_h)
            bpos_c = np.minimum(bpos, max(len(self.bh) - 1, 0))
            hit = (self.bh[bpos_c] == pair_h) if len(self.bh) \
                else np.zeros(len(pair_h), bool)
            cb = np.where(hit, self.bc[bpos_c] if len(self.bc) else 1.0,
                          1.0)
            # left/right unigram counts (0 when OOV for the LM corpus)
            upos1 = np.searchsorted(self.uh, th[:-1])
            upos2 = np.searchsorted(self.uh, th[1:])
            u1c = np.minimum(upos1, max(len(self.uh) - 1, 0))
            u2c = np.minimum(upos2, max(len(self.uh) - 1, 0))
            if len(self.uh):
                c1 = np.where(self.uh[u1c] == th[:-1], self.uc[u1c], 0.0)
                c2 = np.where(self.uh[u2c] == th[1:], self.uc[u2c], 0.0)
            else:
                c1 = c2 = np.zeros(len(pair_h))
            # ln(cb/c1) (not ln(cb)-ln(c1)) — term-for-term float parity
            # with the SQL oracle's expression
            seen = np.log(cb / np.maximum(c1, 1.0))
            backoff = log_alpha + np.log(c2 + 1.0) - log_denom
            lp = np.where(hit, seen, backoff)
            lp = np.where(within, lp, 0.0)
            nb = np.maximum(counts - 1, 0)
            nz = nb > 0
            if not nz.any():
                return empty
            starts = offs[:-1][nz]
            sums = np.add.reduceat(np.append(lp, 0.0),
                                   np.minimum(starts, len(lp)))
            return pa.table({
                id_col: pa.array(ids[nz]),
                "n_bigrams": pa.array(nb[nz]),
                "logprob_per_bigram": pa.array(sums / nb[nz],
                                               pa.float64())})

    return ds.map_batches(_Score, batch_format="pyarrow",
                          concurrency=(1, 8))


def _group_counts(strs: pa.Array, doc_of: np.ndarray):
    """(doc, string) multiplicity counting WITHOUT a string groupby:
    dictionary-encode once (Arrow hash kernel), fold (doc, code) into
    one int64 key, count with a single integer np.unique. Returns
    (doc_ids, counts, dict_codes, dictionary_array) per distinct pair."""
    dic = pc.dictionary_encode(strs)
    codes = np.asarray(dic.indices, dtype=np.int64)
    v = max(len(dic.dictionary), 1)
    uk, counts = np.unique(doc_of * v + codes, return_counts=True)
    return ((uk // v).astype(np.int64), counts.astype(np.int64),
            (uk % v).astype(np.int64), dic)


def _dict_lengths(dic) -> np.ndarray:
    return pc.utf8_length(dic.dictionary).to_numpy(
        zero_copy_only=False).astype(np.int64)


def repetition_signals(ds, text_col: str = "text", id_col: str = "doc_id",
                       words_per_line: int = 10,
                       top_ns: Sequence[int] = (2, 3, 4),
                       dup_ns: Sequence[int] = (5, 10)):
    """Gopher repetition filters (Rae et al. 2021 §A1.1, public) — the
    n-gram and line half of the family (``quality_signals`` covers the
    word-level half):

    - ``dup_line_frac``        lines that duplicate another line in the
      SAME doc / total lines (docs are re-chunked into
      ``words_per_line``-word lines first, as ``line_dedup`` does);
    - ``dup_line_char_frac``   chars in those duplicate occurrences /
      total line chars;
    - ``top{n}gram_char_frac`` (n in ``top_ns``): chars covered by all
      occurrences of the doc's MOST FREQUENT word n-gram / total chars
      (ties broken to the lexicographically smallest gram, so the
      signal is deterministic and SQL-mirrorable);
    - ``dup{n}gram_char_frac`` (n in ``dup_ns``): chars in beyond-first
      occurrences of duplicated n-grams / total chars.

    Token = space-separated non-empty run (the file-wide convention);
    total chars = length of the single-space-normalized text. All
    numerators/denominators are exact int64 sums divided once, rounded
    to 6 — the oracle SQL reproduces every expression term for term.

    Row-local (shuffle-free) and vectorized: ONE split per batch, line
    and gram strings built with offset-arithmetic ListArray /
    binary_join kernels, per-(doc, gram) counting in a hash groupby —
    no per-document Python loop.
    """
    import pandas as pd

    from datavec_ray.util import round_half_away

    top_set, dup_set = set(top_ns), set(dup_ns)
    all_ns = sorted(top_set | dup_set)
    wpl = int(words_per_line)

    def _empty_cols(ndocs):
        z = np.zeros(ndocs, np.float64)
        return z

    def _sig(batch: pa.Table) -> pa.Table:
        col = combine(batch[text_col])
        ndocs = len(col)
        parts = pc.split_pattern(pc.fill_null(col, ""), " ")
        flat = combine(pc.list_flatten(parts))
        offsets = np.asarray(parts.offsets, dtype=np.int64)
        row_of = np.repeat(np.arange(ndocs, dtype=np.int64),
                           np.diff(offsets))
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        row_of = row_of[nonempty]
        words = flat.filter(pa.array(nonempty))
        n_words = np.bincount(row_of, minlength=ndocs).astype(np.int64)
        wlen = pc.utf8_length(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
        char_sum = np.bincount(row_of, weights=wlen,
                               minlength=ndocs).astype(np.int64)
        total_chars = char_sum + np.maximum(n_words - 1, 0)
        denom = np.maximum(total_chars, 1).astype(np.float64)

        out = {id_col: batch[id_col],
               "n_words": pa.array(n_words)}

        # ---- line repetition over `wpl`-word lines ------------------------
        nlines = -(-n_words // wpl)
        out["n_lines"] = pa.array(nlines.astype(np.int64))
        doc_of_line = np.repeat(np.arange(ndocs, dtype=np.int64), nlines)
        first_word = np.concatenate(([0], np.cumsum(n_words)[:-1])) \
            if ndocs else np.array([], np.int64)
        j = _pos_in_segment(nlines)
        ends = np.minimum(first_word[doc_of_line] + (j + 1) * wpl,
                          (first_word + n_words)[doc_of_line])
        # lines tile each doc's word run contiguously → offsets = [0, ends...]
        la = pa.ListArray.from_arrays(
            pa.array(np.concatenate(([0], ends)), pa.int32()), words)
        lines = pc.binary_join(la.cast(pa.list_(pa.string())),
                               pa.scalar(" "))
        # count (doc, line) multiplicities WITHOUT a string groupby:
        # dictionary-encode once, then one integer np.unique
        gd, kk, lcode, ldic = _group_counts(lines, doc_of_line)
        LL = _dict_lengths(ldic)[lcode]
        dup_lines = np.bincount(gd, weights=kk - 1, minlength=ndocs)
        dup_chars = np.bincount(gd, weights=(kk - 1) * LL, minlength=ndocs)
        tot_lchars = np.bincount(gd, weights=kk * LL, minlength=ndocs)
        out["dup_line_frac"] = pa.array(round_half_away(
            dup_lines / np.maximum(nlines, 1), 6))
        out["dup_line_char_frac"] = pa.array(round_half_away(
            dup_chars / np.maximum(tot_lchars, 1), 6))

        # ---- n-gram repetition --------------------------------------------
        m_total = len(words)
        for n in all_ns:
            m = m_total - n + 1
            top = _empty_cols(ndocs)
            dup = _empty_cols(ndocs)
            if m > 0:
                valid = row_of[:m] == row_of[n - 1:]
                grams = pc.binary_join_element_wise(
                    *(words.slice(i, m) for i in range(n)), " ") \
                    .filter(pa.array(valid))
                gdoc = row_of[:m][valid]
                if len(grams):
                    ud, kv, ucode, dic = _group_counts(grams, gdoc)
                    Lv = _dict_lengths(dic)[ucode]
                    if n in dup_set:
                        dup = np.bincount(ud, weights=(kv - 1) * Lv,
                                          minlength=ndocs) / denom
                    if n in top_set:
                        # per-doc max count, then lexicographically
                        # smallest gram among the (few) tied candidates
                        maxc = np.zeros(ndocs, np.int64)
                        np.maximum.at(maxc, ud, kv)
                        tied = kv == maxc[ud]
                        td, tc, tl, tk = ud[tied], ucode[tied], \
                            Lv[tied], kv[tied]
                        multi = np.bincount(td, minlength=ndocs) > 1
                        if multi.any():
                            # strings only for docs with a real tie
                            sel = multi[td]
                            sub = pd.DataFrame({
                                "d": td[sel],
                                "g": dic.dictionary.take(
                                    pa.array(tc[sel])).to_pylist(),
                                "L": tl[sel], "k": tk[sel]})
                            best = sub.sort_values(
                                ["d", "g"], kind="stable") \
                                .drop_duplicates("d")
                            num = np.zeros(ndocs, np.float64)
                            keep = ~sel
                            num[td[keep]] = tk[keep] * tl[keep]
                            num[best["d"].to_numpy()] = \
                                (best["k"].to_numpy(dtype=np.int64)
                                 * best["L"].to_numpy(dtype=np.int64))
                        else:
                            num = np.zeros(ndocs, np.float64)
                            num[td] = tk * tl
                        top = num / denom
            if n in top_set:
                out[f"top{n}gram_char_frac"] = pa.array(round_half_away(top, 6))
            if n in dup_set:
                out[f"dup{n}gram_char_frac"] = pa.array(round_half_away(dup, 6))
        return pa.table(out)

    _sig.__name__ = "repetition_signals"
    return ds.map_batches(_sig, batch_format="pyarrow")


def hashing_vectorize(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id", dim: int = 1024,
                      seed: int = 0, signed: bool = True) -> pa.Table:
    """Feature-hashing text vectorization (HashingVectorizer /
    Weinberger et al. 2009): token → ``hash64(token) mod dim`` bucket,
    counted per document — ONE pass, NO vocabulary fit, which is the
    property that makes it the at-scale alternative to TF-IDF (whose
    vocab pass is a corpus-wide shuffle). ``signed=True`` applies the
    standard ±1 sign hash (an independent hash bit) so collisions
    cancel in expectation instead of inflating counts.

    Returns EXPLODED sparse rows (id_col, bucket:int64, weight:float64)
    — the shuffle-friendly layout (hash-partition by bucket for
    feature-major ops, by id for doc-major ops); densify per use.
    Whole-batch vectorized: one RE2 split, one polars hash over the
    flat token array, one bincount over (row, bucket) codes.
    """
    col = combine(batch[text_col])
    parts = pc.split_pattern(pc.fill_null(col, ""), " ")
    flat = pc.list_flatten(parts)
    keep = pc.not_equal(flat, "")
    offsets = np.asarray(parts.offsets)
    row_of = np.repeat(np.arange(len(parts), dtype=np.int64),
                       np.diff(offsets))
    flat = flat.filter(keep)
    row_of = row_of[keep.to_numpy(zero_copy_only=False)]
    h = hash64(flat, seed=seed)
    bucket = (h % np.uint64(dim)).astype(np.int64)
    sign = np.where((h >> np.uint64(63)).astype(bool), -1.0, 1.0) \
        if signed else np.ones(len(h))
    # combine (row, bucket) pairs in one bincount
    codes = row_of * dim + bucket
    uniq, inv = np.unique(codes, return_inverse=True)
    w = np.bincount(inv, weights=sign, minlength=len(uniq))
    nz = w != 0.0  # signed collisions may cancel exactly
    uniq, w = uniq[nz], w[nz]
    ids = combine(batch[id_col]).take(pa.array(uniq // dim))
    return pa.table({id_col: ids,
                     "bucket": pa.array(uniq % dim),
                     "weight": pa.array(w, pa.float64())})


def bm25_score(ds, query_terms: Sequence[str], text_col: str = "text",
               id_col: str = "doc_id", k1: float = 1.2, b: float = 0.75):
    """Okapi BM25 relevance of every document against a fixed query —
    the lexical-retrieval scorer (Robertson & Zaragoza 2009) curation
    pipelines use for retrieval-based filtering / hard-negative mining
    alongside TF-IDF (``fit_tfidf_vocab``). idf uses the always-positive
    "plus one" form ``ln(1 + (N - df + 0.5)/(df + 0.5))``.

    Scale shape — two shuffle-free streaming passes, NO corpus shuffle:
    1. corpus stats: per batch ONE ``_tokenize_flat`` + searchsorted
       membership against the (tiny, sorted) query-hash array → one
       partial row ``(n_docs, sum_dl, df_0..df_{Q-1})`` per batch; the
       driver sums #blocks tiny rows (bytes per block, any scale).
    2. scoring: (query hashes, idf vector, N, avgdl) ship once via
       ``ray.put``; per batch one tokenize + searchsorted + bincount
       over (doc, term) codes → vectorized BM25 over a D×Q tf matrix.

    Emits ``(id_col, bm25)`` for documents matching >=1 query term,
    rounded to 4 dp (mirrored in the driver's SQL oracle), sorted by id.
    Token membership matches on hash64 — string-equal modulo negligible
    collisions, the standing assumption of every gram op here.
    """
    import ray
    import ray.data as rd

    from datavec_ray.ops.dedup import _tokenize_flat
    from datavec_ray.util import dataset_to_table

    terms = list(dict.fromkeys(query_terms))  # dedup, keep order
    if not terms:
        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64()),
                                       "bm25": pa.array([], pa.float64())}))
    qh = hash64(pa.array([t.lower() for t in terms], pa.string())) \
        .astype(np.uint64)
    qorder = np.argsort(qh)
    qh_sorted = qh[qorder]
    Q = len(terms)

    def _hits(th: np.ndarray, offs: np.ndarray):
        """(doc_idx, sorted-term_idx) of every query-term token."""
        pos = np.searchsorted(qh_sorted, th)
        pos_c = np.minimum(pos, Q - 1)
        hit = qh_sorted[pos_c] == th
        doc_of = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
        return doc_of[hit], pos_c[hit]

    def _stats(batch: pa.Table) -> pa.Table:
        th, offs = _tokenize_flat(batch[text_col])
        n = np.int64(len(offs) - 1)
        sum_dl = np.int64(len(th))
        doc_idx, term_idx = _hits(th, offs)
        # distinct (doc, term) presence -> per-term df partial
        pres = np.unique(doc_idx * Q + term_idx)
        df = np.bincount((pres % Q).astype(np.int64), minlength=Q)
        return pa.table({"n": pa.array([n]), "sum_dl": pa.array([sum_dl]),
                         "df": pa.array([df.astype(np.int64)],
                                        pa.list_(pa.int64()))})

    parts = dataset_to_table(
        ds.map_batches(_stats, batch_format="pyarrow"))
    n_docs = int(pc.sum(parts["n"]).as_py() or 0)
    if n_docs == 0:
        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64()),
                                       "bm25": pa.array([], pa.float64())}))
    sum_dl = int(pc.sum(parts["sum_dl"]).as_py() or 0)
    df = np.zeros(Q, dtype=np.int64)
    for row in parts["df"].to_pylist():
        df += np.asarray(row, dtype=np.int64)
    avgdl = sum_dl / n_docs
    idf = np.log1p((n_docs - df + 0.5) / (df + 0.5))
    ref = ray.put((qh_sorted, idf, avgdl))

    class _Score:
        def __init__(self):
            self.qh, self.idf, self.avgdl = ray.get(ref)
            self.__name__ = "bm25"

        def __call__(self, batch: pa.Table) -> pa.Table:
            th, offs = _tokenize_flat(batch[text_col])
            dl = np.diff(offs).astype(np.float64)
            doc_idx, term_idx = _hits(th, offs)
            if len(doc_idx) == 0:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "bm25": pa.array([], pa.float64())})
            D = len(dl)
            tf = np.bincount(doc_idx * Q + term_idx,
                             minlength=D * Q).reshape(D, Q).astype(np.float64)
            denom = tf + k1 * (1.0 - b + b * (dl / self.avgdl))[:, None]
            score = ((self.idf * tf * (k1 + 1.0)) / denom).sum(axis=1)
            matched = tf.any(axis=1)
            ids = combine(batch[id_col]).cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            return pa.table({
                id_col: pa.array(ids[matched]),
                "bm25": pa.array(np.round(score[matched], 4), pa.float64())})

    return ds.map_batches(_Score, batch_format="pyarrow",
                          concurrency=(1, 8)).sort(id_col)


def compression_signal(ds, text_col: str = "text", level: int = 6,
                       window: int = 0) -> "ray.data.Dataset":
    """Per-document zlib compression-ratio quality signal — the classic
    repetition detector of C4/Gopher-class curation (highly repetitive
    or templated text compresses far below ~0.4; near-random or
    already-compressed payloads approach 1.0). Appends
    ``n_bytes`` (raw UTF-8 length), ``n_compressed`` (zlib at
    ``level``), and ``compress_ratio`` (compressed/raw; 0 for empty
    docs). ``window > 0`` additionally scores only the FIRST ``window``
    bytes (``head_ratio``) — a cheap proxy that bounds cost on huge
    documents.

    Scale shape: zlib is intrinsically per-document C work (same
    recursive-format boundary as the codecs); the loop below is a thin
    Python dispatch around the C deflate over one pre-materialized
    bytes list per batch — no SQL oracle exists (DEFLATE is not
    expressible), so the driver query is rows-only and correctness is
    a direct-zlib parity test."""
    import zlib

    def score(b: pa.Table) -> pa.Table:
        col = pc.cast(pc.fill_null(combine(b[text_col]), ""),
                      pa.large_binary())
        raw = col.to_pylist()
        n_raw = np.fromiter((len(r) for r in raw), np.int64, len(raw))
        n_cmp = np.fromiter(
            (len(zlib.compress(r, level)) for r in raw), np.int64,
            len(raw))
        with np.errstate(invalid="ignore", divide="ignore"):
            ratio = np.where(n_raw > 0, n_cmp / np.maximum(n_raw, 1), 0.0)
        out = b.append_column(pa.field("n_bytes", pa.int64()),
                              pa.array(n_raw))
        out = out.append_column(pa.field("n_compressed", pa.int64()),
                                pa.array(n_cmp))
        out = out.append_column(pa.field("compress_ratio", pa.float64()),
                                pa.array(np.round(ratio, 6)))
        if window > 0:
            n_h = np.fromiter(
                (len(zlib.compress(r[:window], level)) for r in raw),
                np.int64, len(raw))
            hr = np.where(n_raw > 0,
                          n_h / np.maximum(np.minimum(n_raw, window), 1),
                          0.0)
            out = out.append_column(pa.field("head_ratio", pa.float64()),
                                    pa.array(np.round(hr, 6)))
        return out

    score.__name__ = "compression_signal"
    return ds.map_batches(score, batch_format="pyarrow")
