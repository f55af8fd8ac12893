"""repetition_signals: hand-computed Gopher n-gram/line fractions."""

import pyarrow as pa
import pytest

from datavec_ray.util import dataset_to_table, round_half_away


def _run(texts, **kw):
    import ray.data as rd

    from datavec_ray.ops.textstats import repetition_signals

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = dataset_to_table(repetition_signals(
        rd.from_arrow(t), "text", "doc_id", **kw))
    return out.sort_by("doc_id")


def test_repetition_hand_computed(ray_session):
    # doc 0: "ab cd ab cd ab" with 2-word lines
    #   words=5, chars = 2*5 + 4 = 14
    #   lines(2): "ab cd" "ab cd" "ab"  -> 3 lines, 1 dup
    #     dup_line_frac = 1/3; line chars: 5,5,2 -> dup_chars=5, tot=12
    #   2-grams: "ab cd"x2 "cd ab"x2 -> top = "ab cd" (tie on count,
    #     lexicographic) -> 2*5/14; dup2 = (1*5 + 1*5)/14
    doc0 = "ab cd ab cd ab"
    # doc 1: no repetition at all
    doc1 = "one two three four"
    out = _run([doc0, doc1], words_per_line=2, top_ns=(2,), dup_ns=(2,))
    r0 = {c: out[c][0].as_py() for c in out.column_names}
    assert r0["n_words"] == 5 and r0["n_lines"] == 3
    assert r0["dup_line_frac"] == pytest.approx(
        float(round_half_away(1 / 3)), abs=1e-9)
    assert r0["dup_line_char_frac"] == pytest.approx(
        float(round_half_away(5 / 12)), abs=1e-9)
    assert r0["top2gram_char_frac"] == pytest.approx(
        float(round_half_away(10 / 14)), abs=1e-9)
    assert r0["dup2gram_char_frac"] == pytest.approx(
        float(round_half_away(10 / 14)), abs=1e-9)
    r1 = {c: out[c][1].as_py() for c in out.column_names}
    assert r1["dup_line_frac"] == 0.0
    assert r1["dup_line_char_frac"] == 0.0
    assert r1["dup2gram_char_frac"] == 0.0
    # no duplicate 2-gram: top is the lexicographically smallest,
    # "four" never starts one -> "one two" (k=1, L=7, chars=18)
    assert r1["top2gram_char_frac"] == pytest.approx(
        float(round_half_away(7 / 18)), abs=1e-9)


def test_repetition_edge_cases(ray_session):
    out = _run(["", "   ", "solo", None], words_per_line=10,
               top_ns=(2,), dup_ns=(5,))
    nw = out["n_words"].to_pylist()
    assert nw == [0, 0, 1, 0]
    assert out["n_lines"].to_pylist() == [0, 0, 1, 0]
    for c in ("dup_line_frac", "dup_line_char_frac",
              "top2gram_char_frac", "dup5gram_char_frac"):
        assert out[c].to_pylist() == [0.0] * 4, c


def test_round_half_away_matches_duckdb():
    import duckdb
    import numpy as np

    rng = np.random.default_rng(7)
    # adversarial: many exact k/2^m ties plus random values
    vals = np.concatenate([
        rng.integers(0, 1 << 20, 300).astype(np.float64) / (1 << 8),
        rng.integers(0, 1 << 20, 300).astype(np.float64) / (1 << 21),
        rng.random(300) * 10])
    got = round_half_away(vals, 6)
    exp = [r[0] for r in duckdb.connect().execute(
        "select round(x::double, 6) from (select unnest(?) as x)",
        [list(map(float, vals))]).fetchall()]
    assert np.array_equal(got, np.array(exp)), \
        np.flatnonzero(got != np.array(exp))[:5]
