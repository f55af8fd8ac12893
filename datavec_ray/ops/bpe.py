"""Distributed BPE (byte-pair encoding) vocabulary training + encoding.

Sennrich, Haddow & Birch 2016 ("Neural Machine Translation of Rare
Words with Subword Units", arXiv:1508.07909 — public): learn a subword
vocabulary by repeatedly merging the most frequent adjacent symbol
pair. Beyond the reference (its NLP family stops at tokenizers/TF-IDF);
a core LLM-training-data operation.

Scale shape — the classic algorithm is ALREADY the right distributed
decomposition:

1. ``word_frequencies``: ONE streaming corpus pass — per-batch word
   counts (map-side combiner, one dictionary-encode + value_counts per
   batch) then a single ``groupby(word).sum`` of partial rows. The
   corpus (100 TB) never moves again; everything after operates on the
   word-frequency table, which is vocabulary-sized (Heaps' law: tens of
   millions of rows at web scale, ~16 bytes/row — driver-feasible; cap
   with ``min_count``/``max_words`` for the long tail, which cannot
   win merges anyway).
2. ``train_bpe``: the merge loop over (word, freq) with incremental
   pair-count maintenance — only words CONTAINING the merged pair are
   re-examined per iteration (inverted pair→words index), the standard
   fast-BPE bookkeeping. Deterministic: ties broken by lexicographic
   pair order.
3. ``BpeEncode``: actor-pool ``map_batches`` stage — merge ranks built
   once per actor in ``__init__``; per batch, each DISTINCT word is
   encoded once (dictionary encoding), then token lists are scattered
   back through the indices. Cost scales with per-batch vocabulary,
   not corpus tokens.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datavec_ray.steps.base import combine

_EOW = "</w>"     # end-of-word marker (Sennrich convention)


def word_frequencies(ds, text_col: str = "text",
                     lowercase: bool = True):
    """One streaming pass → Dataset[(word, n)] — the map-side combiner
    reduces each batch to its distinct words before the ONE exchange."""
    def partial(batch: pa.Table) -> pa.Table:
        col = combine(batch[text_col])
        if lowercase:
            col = pc.utf8_lower(col)
        flat = pc.list_flatten(pc.split_pattern_regex(
            pc.fill_null(col, ""), r"\s+"))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table({"word": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    partial.__name__ = "word_count_partial"
    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("word").sum("n")


def train_bpe(word_freqs, num_merges: int = 1000,
              min_count: int = 1,
              max_words: Optional[int] = None) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a word-frequency table
    (``word_frequencies`` output Dataset, or a pa.Table / dict).
    Returns the ordered merge list [(left, right), ...].

    Incremental pair-count maintenance: a pair→word inverted index
    means each merge touches only the words containing that pair.
    Deterministic: the winning pair is (count DESC, pair ASC)."""
    if isinstance(word_freqs, dict):
        items = sorted(word_freqs.items())
    else:
        if not isinstance(word_freqs, pa.Table):
            from datavec_ray.util import dataset_to_table
            word_freqs = dataset_to_table(word_freqs)
        ncol = "sum(n)" if "sum(n)" in word_freqs.column_names else "n"
        items = sorted(zip(word_freqs["word"].to_pylist(),
                           word_freqs[ncol].to_pylist()))
    items = [(w, int(c)) for w, c in items if w and c >= min_count]
    if max_words is not None and len(items) > max_words:
        items.sort(key=lambda wc: (-wc[1], wc[0]))
        items = items[:max_words]
        items.sort()
    words = [tuple(w) + (_EOW,) for w, _ in items]
    freqs = [c for _, c in items]

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, sym in enumerate(words):
        f = freqs[wi]
        for a, b in zip(sym, sym[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
            pair_words.setdefault((a, b), set()).add(wi)

    def _account(wi: int, sign: int) -> None:
        sym, f = words[wi], freqs[wi] * sign
        for p in zip(sym, sym[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + f
            if sign > 0:
                pair_words.setdefault(p, set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        for p, c in pair_counts.items():
            if c <= 0:
                continue
            if best is None or c > best[0] or (c == best[0] and p < best[1]):
                best = (c, p)
        if best is None:
            break
        pair = best[1]
        merges.append(pair)
        merged = pair[0] + pair[1]
        for wi in list(pair_words.get(pair, ())):
            sym = words[wi]
            _account(wi, -1)
            out = []
            k = 0
            while k < len(sym):
                if (k + 1 < len(sym)
                        and (sym[k], sym[k + 1]) == pair):
                    out.append(merged)
                    k += 2
                else:
                    out.append(sym[k])
                    k += 1
            words[wi] = tuple(out)
            _account(wi, 1)
        pair_counts.pop(pair, None)
        pair_words.pop(pair, None)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges greedily by rank (lowest rank first) — the standard
    BPE encode over one word + end-of-word marker."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


class BpeEncode:
    """Actor-pool map_batches stage: text column → ``tokens``
    (list<string>) + ``n_subwords`` (int64). Merge ranks built once per
    actor; each batch encodes only its DISTINCT words."""

    def __init__(self, merges_ref, text_col: str = "text",
                 out_col: str = "tokens", lowercase: bool = True):
        import ray
        merges = (ray.get(merges_ref)
                  if not isinstance(merges_ref, list) else merges_ref)
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.text_col, self.out_col = text_col, out_col
        self.lowercase = lowercase
        self._cache: dict[str, list[str]] = {}
        self.__name__ = "bpe_encode"

    def _encode(self, w: str) -> list[str]:
        got = self._cache.get(w)
        if got is None:
            got = self._cache[w] = encode_word(w, self.ranks)
            if len(self._cache) > 1_000_000:   # bound actor memory
                self._cache.clear()
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = combine(batch[self.text_col])
        if self.lowercase:
            col = pc.utf8_lower(col)
        parts = pc.split_pattern_regex(pc.fill_null(col, ""), r"\s+")
        flat = pc.list_flatten(parts)
        row_of = np.repeat(np.arange(len(parts)),
                           np.diff(np.asarray(parts.offsets)))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, row_of = flat.filter(pa.array(keep)), row_of[keep]
        # encode DISTINCT words once, scatter through indices
        d = flat.dictionary_encode()
        uniq_tokens = [self._encode(w) for w in d.dictionary.to_pylist()]
        idx = d.indices.to_numpy(zero_copy_only=False)
        n_tok = np.array([len(t) for t in uniq_tokens], np.int64)
        per_word = n_tok[idx] if len(idx) else np.zeros(0, np.int64)
        per_row = np.bincount(row_of, weights=per_word,
                              minlength=batch.num_rows).astype(np.int64)
        flat_tokens: list[str] = []
        order = np.argsort(row_of, kind="stable")
        for j in order:
            flat_tokens.extend(uniq_tokens[idx[j]])
        offsets = np.concatenate(([0], np.cumsum(per_row))).astype(np.int64)
        toks = pa.ListArray.from_arrays(pa.array(offsets, pa.int64()),
                                        pa.array(flat_tokens, pa.string()))
        return batch.append_column(
            pa.field(self.out_col, pa.list_(pa.string())), toks) \
            .append_column(pa.field("n_subwords", pa.int64()),
                           pa.array(per_row))


def bpe_pipeline(ds, text_col: str = "text", num_merges: int = 200,
                 min_count: int = 1, encode: bool = True,
                 concurrency=(1, 8)):
    """Train on ``ds`` then (optionally) encode ``ds`` with the learned
    merges broadcast via ray.put — the two-pass stateful-vectorizer
    shape (same as TF-IDF)."""
    import ray
    merges = train_bpe(word_frequencies(ds, text_col),
                       num_merges=num_merges, min_count=min_count)
    if not encode:
        return merges
    ref = ray.put(merges)
    return ds.map_batches(BpeEncode, batch_format="pyarrow",
                          fn_constructor_args=(ref, text_col),
                          concurrency=concurrency)
