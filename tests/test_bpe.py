"""Distributed BPE training/encoding (Sennrich et al. 2016): merge
order vs a brute-force reference, encode consistency, determinism."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from datavec_ray.util import dataset_to_table


def brute_bpe(word_freqs: dict, num_merges: int):
    """Textbook O(V * merges) reference: full pair recount per merge."""
    words = {tuple(w) + ("</w>",): c for w, c in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        counts = {}
        for sym, c in words.items():
            for p in zip(sym, sym[1:]):
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = max(counts.items(), key=lambda kv: (kv[1], [-ord(ch) for ch
                   in "\x00".join(kv[0])]))
        # deterministic tie-break: count desc, pair asc
        bc = max(counts.values())
        best = min(p for p, c in counts.items() if c == bc)
        merges.append(best)
        merged = best[0] + best[1]
        out = {}
        for sym, c in words.items():
            lst, k = [], 0
            while k < len(sym):
                if k + 1 < len(sym) and (sym[k], sym[k + 1]) == best:
                    lst.append(merged)
                    k += 2
                else:
                    lst.append(sym[k])
                    k += 1
            out[tuple(lst)] = out.get(tuple(lst), 0) + c
        words = out
    return merges


def test_train_bpe_matches_bruteforce():
    from datavec_ray.ops.bpe import train_bpe

    # the classic example corpus from the BPE paper
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    got = train_bpe(wf, num_merges=10)
    exp = brute_bpe(wf, 10)
    assert got == exp
    # first merges: ('e','s') count 9, then ('es','t') 9, ('est','</w>') 9
    assert got[0] == ("e", "s")
    assert got[1] == ("es", "t")
    assert got[2] == ("est", "</w>")


def test_train_bpe_random_corpus_matches_bruteforce():
    from datavec_ray.ops.bpe import train_bpe

    rng = np.random.default_rng(7)
    vocab = ["aab", "abab", "bba", "aaab", "caa", "cab", "bcb", "ccc",
             "ab", "ba", "abcabc", "aabbcc"]
    wf = {w: int(rng.integers(1, 40)) for w in vocab}
    assert train_bpe(wf, num_merges=25) == brute_bpe(wf, 25)


def test_encode_word_applies_merges_by_rank():
    from datavec_ray.ops.bpe import encode_word, train_bpe

    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    ranks = {p: i for i, p in enumerate(train_bpe(wf, 10))}
    assert "".join(encode_word("lowest", ranks)).replace(" ", "") \
        == "lowest</w>"
    # 'est</w>' must come out as one learned subword
    assert "est</w>" in encode_word("lowest", ranks)
    # unseen characters survive as singletons
    toks = encode_word("zq", ranks)
    assert toks[0] == "z" and "q" in "".join(toks)


def test_bpe_pipeline_end_to_end(ray_session):
    from datavec_ray.ops.bpe import (bpe_pipeline, encode_word, train_bpe,
                                     word_frequencies)

    texts = ["the lowest lower low", "newest widest low lower",
             "the newest newest"] * 4
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(3)
    # distributed word counts == local Counter
    wf = dataset_to_table(word_frequencies(ds)).to_pandas()
    wf_map = dict(zip(wf["word"], wf["sum(n)"]))
    from collections import Counter
    exp = Counter(w for t in texts for w in t.split())
    assert wf_map == dict(exp)

    out = dataset_to_table(
        bpe_pipeline(ds, num_merges=30)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert "tokens" in out and "n_subwords" in out
    # encode agrees with the single-word reference path
    merges = train_bpe(wf_map, num_merges=30)
    ranks = {p: i for i, p in enumerate(merges)}
    row0 = list(out.loc[0, "tokens"])
    exp0 = [t for w in texts[0].split() for t in encode_word(w, ranks)]
    assert row0 == exp0
    assert out.loc[0, "n_subwords"] == len(exp0)
    # deterministic across runs
    again = dataset_to_table(
        bpe_pipeline(ds, num_merges=30)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(again.loc[0, "tokens"]) == row0
