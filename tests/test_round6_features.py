"""Tests for exact duplicated-substring signals (Lee et al. 2022),
incremental dedup-against-corpus, range-frame windowed aggregates,
unigram-LM document scoring, and flat-event sessionization
(round-6 additions)."""

import numpy as np
import pyarrow as pa
import pytest

from datavec_ray.util import dataset_to_table


def _docs(texts, start_id=0):
    return pa.table({
        "doc_id": pa.array(range(start_id, start_id + len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})


def _brute_substring_signals(texts, k):
    """Pure-Python reference: per doc, positions of k-gram windows whose
    gram string occurs in another doc; covered = union of [p, p+k)."""
    grams = {}
    per_doc = []
    for d, t in enumerate(texts):
        w = t.lower().split()
        gs = [" ".join(w[i:i + k]) for i in range(len(w) - k + 1)]
        per_doc.append(gs)
        for g in gs:
            grams.setdefault(g, set()).add(d)
    out = {}
    for d, gs in enumerate(per_doc):
        pos = [i for i, g in enumerate(gs) if len(grams[g]) > 1]
        if not pos:
            continue
        covered = set()
        for p in pos:
            covered.update(range(p, p + k))
        out[d] = (len(pos), len(covered))
    return out


def test_substring_dup_signals_vs_brute(ray_session):
    import ray.data as rd

    from datavec_ray.ops.dedup import substring_dup_signals

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    texts = [
        f"intro words here {shared} and a unique tail one",
        f"{shared} completely different continuation of this document two",
        "no overlap at all in this third document of many words",
        "short doc",                                    # < k tokens
        # internal-only repetition: same span twice in ONE doc only
        "x1 x2 x3 x4 x5 x6 x7 x8 filler x1 x2 x3 x4 x5 x6 x7 x8",
    ]
    k = 8
    expect = _brute_substring_signals(texts, k)
    got = dataset_to_table(
        substring_dup_signals(rd.from_arrow(_docs(texts)), k=k,
                              num_partitions=4))
    res = {int(d): (int(g), int(c)) for d, g, c in
           zip(got["doc_id"].to_pylist(), got["dup_grams"].to_pylist(),
               got["covered_tokens"].to_pylist())}
    assert res == expect
    assert 0 in res and 1 in res          # the shared span is found
    assert 2 not in res and 3 not in res  # unique + short docs untouched
    assert 4 not in res                   # internal repetition != cross-doc


def test_substring_overlapping_spans_union(ray_session):
    """Two overlapping duplicated windows must count tokens once."""
    import ray.data as rd

    from datavec_ray.ops.dedup import substring_dup_signals

    # doc0/doc1 share a 9-token run -> two overlapping 8-gram windows,
    # union covers 9 tokens, not 16
    run = "a b c d e f g h i"
    texts = [f"{run} tail0 unique0 here0", f"pre1 {run} tail1 x y"]
    got = dataset_to_table(
        substring_dup_signals(rd.from_arrow(_docs(texts)), k=8,
                              num_partitions=2))
    by = {int(d): (int(g), int(c)) for d, g, c in
          zip(got["doc_id"].to_pylist(), got["dup_grams"].to_pylist(),
              got["covered_tokens"].to_pylist())}
    assert by[0] == (2, 9) and by[1] == (2, 9)


def test_dedup_against(ray_session):
    import ray.data as rd

    from datavec_ray.ops.dedup import dedup_against

    ref = rd.from_arrow(_docs(["the quick brown fox", "hello world"]))
    inc = rd.from_arrow(_docs([
        "THE quick   brown fox",   # matches ref modulo case/whitespace
        "hello world",             # exact match
        "brand new document",      # kept
        "brand new document",      # internal dup: BOTH kept (vs-ref only)
        "another fresh one",       # kept
    ], start_id=100))
    out = dataset_to_table(dedup_against(inc, ref).sort("doc_id"))
    assert out["doc_id"].to_pylist() == [102, 103, 104]
    assert set(out.column_names) == {"doc_id", "text"}


def test_range_window_agg_vs_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from datavec_ray.misc import range_window_agg

    rng = np.random.default_rng(5)
    n = 400
    t = pa.table({
        "k": pa.array(rng.integers(0, 7, n), pa.int64()),
        "t": pa.array(np.sort(rng.integers(0, 500, n)), pa.int64()),
        "v": pa.array(np.round(rng.normal(10, 5, n), 3), pa.float64()),
    })
    for agg, out_col in (("sum", "s"), ("count", "c"), ("mean", "m")):
        got = dataset_to_table(
            range_window_agg(rd.from_arrow(t), ["k"], "t", "v", width=25,
                             out_col=out_col, agg=agg,
                             num_partitions=3)).to_pandas() \
            .sort_values(["k", "t", "v"]).reset_index(drop=True)
        fn = {"sum": "sum(v)", "count": "count(*)", "mean": "avg(v)"}[agg]
        ora = duckdb.sql(f"""
            select k, t, v, {fn} over (partition by k order by t
              range between 25 preceding and current row) as {out_col}
            from t order by k, t, v""").df().reset_index(drop=True)
        assert len(got) == len(ora)
        assert np.allclose(got[out_col].astype(float),
                           ora[out_col].astype(float), rtol=1e-9)


def test_range_window_agg_nulls_and_peers(ray_session):
    """Null values: excluded from sum/mean (NULL only if the whole frame
    is null); peers (equal timestamps) always in each other's frame."""
    import ray.data as rd

    from datavec_ray.misc import range_window_agg

    t = pa.table({
        "k": pa.array([1, 1, 1, 1], pa.int64()),
        "t": pa.array([0, 10, 10, 100], pa.int64()),
        "v": pa.array([None, 2.0, 3.0, None], pa.float64()),
    })
    got = dataset_to_table(
        range_window_agg(rd.from_arrow(t), ["k"], "t", "v", width=15,
                         out_col="s", agg="sum", num_partitions=1)
    ).sort_by("t")
    s = got["s"].to_pylist()
    assert s[0] is None            # frame = {null} -> NULL
    assert s[1] == 5.0 and s[2] == 5.0   # peers see each other, null skipped
    assert s[3] is None            # frame = {null row 3} only


def test_unigram_logprob_vs_brute(ray_session):
    import math

    import ray.data as rd

    from datavec_ray.ops.textstats import unigram_logprob

    texts = ["the cat sat on the mat",
             "the dog sat",
             "a completely different sentence here",
             "",                       # empty -> excluded
             "the the the"]
    # brute-force reference
    from collections import Counter
    toks = [t.lower().split() for t in texts]
    freq = Counter(w for ws in toks for w in ws)
    total = sum(freq.values())
    expect = {i: (len(ws), sum(math.log(freq[w] / total) for w in ws) / len(ws))
              for i, ws in enumerate(toks) if ws}

    got = dataset_to_table(unigram_logprob(rd.from_arrow(_docs(texts))))
    res = {int(d): (int(n), float(p)) for d, n, p in
           zip(got["doc_id"].to_pylist(), got["n_tokens"].to_pylist(),
               got["logprob_per_token"].to_pylist())}
    assert set(res) == set(expect)
    for i in expect:
        assert res[i][0] == expect[i][0]
        assert abs(res[i][1] - expect[i][1]) < 1e-9
    # common-token docs score higher than the rare-token doc
    assert res[4][1] > res[2][1]


def test_sessionize_vs_brute(ray_session):
    import ray.data as rd

    from datavec_ray.misc import sessionize

    rng = np.random.default_rng(7)
    n = 300
    t = pa.table({
        "eid": pa.array(np.arange(n), pa.int64()),
        "u": pa.array(rng.integers(0, 5, n), pa.int64()),
        "t": pa.array(np.sort(rng.integers(0, 3000, n)), pa.int64()),
    })
    got = dataset_to_table(
        sessionize(rd.from_arrow(t), ["u"], "t", gap=50, tiebreak="eid",
                   num_partitions=3)).to_pandas() \
        .sort_values("eid").reset_index(drop=True)

    df = t.to_pandas().sort_values(["u", "t", "eid"])
    sess = {}
    for u, grp in df.groupby("u"):
        sid, prev = 0, None
        for eid, tt in zip(grp["eid"], grp["t"]):
            if prev is not None and tt - prev > 50:
                sid += 1
            sess[eid] = sid
            prev = tt
    assert got.set_index("eid")["session_id"].to_dict() == sess


@pytest.mark.parametrize("how", ["Inner", "LeftOuter", "RightOuter",
                                 "FullOuter"])
def test_bucket_shuffle_join_parity(ray_session, how):
    """strategy='bucket' (tagged-union + per-bucket pyarrow join) must
    equal the local pyarrow join for every join type, including a
    colliding non-key column renamed to _r."""
    import ray.data as rd

    from datavec_ray.join import JoinStep

    left = pa.table({
        "k": pa.array([1, 2, 3, 4, 4, None], pa.int64()),
        "v": pa.array([10., 20., 30., 40., 41., 50.], pa.float64()),
    })
    right = pa.table({
        "rk": pa.array([2, 3, 3, 5, None], pa.int64()),
        "v": pa.array(["b", "c1", "c2", "e", "n"], pa.string()),
        "w": pa.array([200, 300, 301, 500, 600], pa.int64()),
    })

    def mk(strategy):
        return JoinStep(right, ["k"], ["rk"], how, broadcast=False,
                        num_partitions=4, strategy=strategy)

    got = dataset_to_table(
        mk("bucket").apply_dataset(rd.from_arrow(left))).to_pandas()
    exp = mk("bucket").apply_local(left).to_pandas()
    cols = sorted(exp.columns)
    assert sorted(got.columns) == cols
    g = got[cols].sort_values(cols).reset_index(drop=True)
    e = exp[cols].sort_values(cols).reset_index(drop=True)
    assert g.astype(str).equals(e.astype(str))


def test_rollup_agg_vs_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from datavec_ray.misc import rollup_agg

    rng = np.random.default_rng(3)
    n = 500
    t = pa.table({
        "a": pa.array(rng.choice(["x", "y", "z"], n)),
        "b": pa.array(rng.integers(0, 4, n), pa.int64()),
        "v": pa.array(np.round(rng.normal(5, 2, n), 2), pa.float64()),
    })
    got = dataset_to_table(
        rollup_agg(rd.from_arrow(t), ["a", "b"],
                   [("v", "Count", "n"), ("v", "Sum", "s"),
                    ("v", "Min", "lo"), ("v", "Max", "hi")],
                   num_partitions=4)).to_pandas()
    ora = duckdb.sql("""
        select a, b, count(v) n, sum(v) s, min(v) lo, max(v) hi
        from t group by rollup(a, b)""").df()
    key = ["a", "b"]
    g = got.sort_values(key, na_position="last").reset_index(drop=True)
    e = ora.sort_values(key, na_position="last").reset_index(drop=True)
    assert len(g) == len(e)
    assert g["a"].fillna("∅").tolist() == e["a"].fillna("∅").tolist()
    assert np.allclose(g["b"].fillna(-1).astype(float),
                       e["b"].fillna(-1).astype(float))
    for c in ("n", "s", "lo", "hi"):
        assert np.allclose(g[c].astype(float), e[c].astype(float),
                           rtol=1e-9)


def test_rollup_grouping_sets(ray_session):
    """Arbitrary GROUPING SETS, not just prefixes."""
    import duckdb
    import ray.data as rd

    from datavec_ray.misc import rollup_agg

    t = pa.table({
        "a": pa.array(["x", "x", "y", "y"]),
        "b": pa.array([1, 2, 1, 2], pa.int64()),
        "v": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
    })
    got = dataset_to_table(
        rollup_agg(rd.from_arrow(t), ["a", "b"], [("v", "Sum", "s")],
                   sets=[["a"], ["b"]], num_partitions=2)).to_pandas()
    ora = duckdb.sql("""
        select a, b, sum(v) s from t
        group by grouping sets ((a), (b))""").df()
    g = got.sort_values(["a", "b"], na_position="last") \
        .reset_index(drop=True)
    e = ora.sort_values(["a", "b"], na_position="last") \
        .reset_index(drop=True)
    assert g["a"].fillna("∅").tolist() == e["a"].fillna("∅").tolist()
    assert np.allclose(g["s"].astype(float), e["s"].astype(float))
