"""pivot_table / window_rank / weighted_sample / group_normalize."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from datavec_ray.util import dataset_to_table


def _rand(seed=0, n=400):
    rng = np.random.default_rng(seed)
    return pa.table({
        "g": pa.array(rng.integers(0, 6, n), pa.int64()),
        "s": pa.array(rng.choice(list("ABC"), n)),
        "v": pa.array(rng.normal(10, 3, n), pa.float64()),
        "id": pa.array(np.arange(n), pa.int64()),
    })


@pytest.mark.parametrize("agg", ["sum", "min", "max", "count", "mean"])
def test_pivot_table_matches_pandas(ray_session, agg):
    import ray.data as rd

    from datavec_ray.misc import pivot_table

    t = _rand(1)
    got = dataset_to_table(pivot_table(
        rd.from_arrow(t).repartition(5), ["g"], "s", "v", agg,
        states=["A", "B", "C"])).to_pandas().sort_values("g")
    exp = (t.to_pandas().pivot_table(index="g", columns="s", values="v",
                                     aggfunc=agg)
           .reindex(columns=["A", "B", "C"]).reset_index())
    exp.columns.name = None
    got = got.reset_index(drop=True)
    for c in ("A", "B", "C"):
        np.testing.assert_allclose(got[c].to_numpy(dtype=float),
                                   exp[c].to_numpy(dtype=float),
                                   rtol=1e-12, err_msg=f"{agg}/{c}")


def test_pivot_table_missing_state_is_null(ray_session):
    import ray.data as rd

    from datavec_ray.misc import pivot_table

    t = pa.table({"g": [1, 1, 2], "s": ["A", "B", "A"],
                  "v": [1.0, 2.0, 3.0]})
    got = dataset_to_table(pivot_table(
        rd.from_arrow(t), ["g"], "s", "v", "sum",
        states=["A", "B"])).sort_by("g")
    assert got["A"].to_pylist() == [1.0, 3.0]
    assert got["B"].to_pylist() == [2.0, None]


def test_window_rank_methods_match_duckdb(ray_session):
    import ray.data as rd

    from datavec_ray.misc import window_rank

    rng = np.random.default_rng(4)
    # integer values => plenty of ties
    t = pa.table({"g": pa.array(rng.integers(0, 5, 300), pa.int64()),
                  "v": pa.array(rng.integers(0, 12, 300), pa.int64()),
                  "id": pa.array(np.arange(300), pa.int64())})
    con = duckdb.connect()
    con.register("t", t)
    for method, fn in (("rank", "rank()"), ("dense_rank", "dense_rank()"),
                       ("row_number", "row_number()")):
        order = "v desc, id" if method == "row_number" else "v desc"
        exp = con.sql(f"select id, {fn} over (partition by g "
                      f"order by {order}) as r from t order by id").df()
        got = dataset_to_table(window_rank(
            rd.from_arrow(t).repartition(4), ["g"], "v", rank_col="r",
            method=method, descending=True,
            tiebreak=["id"] if method == "row_number" else None)
        ).to_pandas().sort_values("id")
        assert got["r"].tolist() == exp["r"].tolist(), method


def test_window_rank_row_number_requires_tiebreak():
    from datavec_ray.misc import window_rank
    with pytest.raises(ValueError, match="tiebreak"):
        window_rank(None, ["g"], "v", method="row_number")


def test_weighted_sample_deterministic_and_proportional(ray_session):
    import ray.data as rd

    from datavec_ray.misc import weighted_sample

    n = 20000
    t = pa.table({"id": pa.array(np.arange(n), pa.int64()),
                  "w": pa.array(np.tile([0, 2, 5, 10], n // 4), pa.int64())})
    a = dataset_to_table(weighted_sample(
        rd.from_arrow(t).repartition(3), "id", "w", denom=10, seed=1))
    b = dataset_to_table(weighted_sample(
        rd.from_arrow(t).repartition(9), "id", "w", denom=10, seed=1))
    assert sorted(a["id"].to_pylist()) == sorted(b["id"].to_pylist())
    df = a.to_pandas()
    rates = df.groupby("w").size() / (n // 4)
    assert 0 not in rates.index                 # weight 0 never survives
    assert rates[10] == 1.0                     # weight >= denom always
    assert abs(rates[2] - 0.2) < 0.03
    assert abs(rates[5] - 0.5) < 0.03


def test_group_normalize_standardize_matches_pandas(ray_session):
    import ray.data as rd

    from datavec_ray.steps.normalize import group_normalize

    t = _rand(7)
    got = dataset_to_table(group_normalize(
        rd.from_arrow(t).repartition(4), ["g"], ["v"], "Standardize",
        suffix="_z")).to_pandas().sort_values("id")
    df = t.to_pandas()
    exp = (df["v"] - df.groupby("g")["v"].transform("mean")) \
        / df.groupby("g")["v"].transform("std")
    np.testing.assert_allclose(
        got.sort_values("id")["v_z"].to_numpy(),
        exp.to_numpy(), rtol=1e-9)
    assert list(got.columns) == ["g", "s", "v", "id", "v_z"]


def test_group_normalize_minmax_and_degenerate_groups(ray_session):
    import ray.data as rd

    from datavec_ray.steps.normalize import group_normalize

    t = pa.table({"g": [1, 1, 1, 2, 3, 3],
                  "v": [0.0, 5.0, 10.0, 7.0, 4.0, 4.0]})
    got = dataset_to_table(group_normalize(
        rd.from_arrow(t), ["g"], ["v"], "MinMax")).to_pandas() \
        .sort_values(["g", "v"]).reset_index(drop=True)
    assert got["v_norm"].tolist()[:3] == [0.0, 0.5, 1.0]
    assert pd.isna(got["v_norm"][3])            # single-row group
    assert pd.isna(got["v_norm"][4]) and pd.isna(got["v_norm"][5])  # zero range


def test_approx_quantile_within_bucket_error(ray_session):
    import ray.data as rd

    from datavec_ray.analysis import approx_quantile

    rng = np.random.default_rng(12)
    v = rng.lognormal(2.0, 1.0, 50000)
    t = pa.table({"v": pa.array(v, pa.float64())})
    got = approx_quantile(rd.from_arrow(t).repartition(8), "v",
                          [0.1, 0.5, 0.9, 0.99], bins=4096)
    tol = (v.max() - v.min()) / 4096 + 1e-9
    for q in (0.1, 0.5, 0.9, 0.99):
        exact = np.quantile(v, q)
        assert abs(got[f"p{int(q*100)}"] - exact) <= tol, q
    # local table path agrees with the dataset path
    local = approx_quantile(t, "v", [0.5], bins=4096)
    assert abs(local["p50"] - got["p50"]) < 1e-9


def test_chunk_words_reconstruction_and_overlap(ray_session):
    import ray.data as rd

    from datavec_ray.ops.textstats import chunk_words

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["w0 w1 w2 w3 w4 w5 w6 w7 w8 w9",   # 10 words
                 "a b c",                            # < chunk
                 "",                                 # empty
                 " ".join(f"t{i}" for i in range(25))],
    })
    got = dataset_to_table(chunk_words(
        rd.from_arrow(docs).repartition(2), "text", ["doc_id"],
        chunk=4, overlap=1)).to_pandas().sort_values(
        ["doc_id", "chunk_idx"]).reset_index(drop=True)
    d1 = got[got.doc_id == 1]
    # step 3: starts 0,3,6,9 -> 4 chunks; neighbors share 1 word
    assert d1.text.tolist() == ["w0 w1 w2 w3", "w3 w4 w5 w6",
                                "w6 w7 w8 w9", "w9"]
    assert got[got.doc_id == 2].text.tolist() == ["a b c"]
    assert got[got.doc_id == 3].text.tolist() == [""]
    d4 = got[got.doc_id == 4]
    assert len(d4) == int(np.ceil(25 / 3))
    # de-overlapped concatenation reconstructs the document
    rec = d4.text.iloc[0].split(" ")
    for t in d4.text.iloc[1:]:
        rec += t.split(" ")[1:]
    assert rec == [f"t{i}" for i in range(25)]


def test_chunk_words_overlap_must_be_smaller():
    from datavec_ray.ops.textstats import chunk_words
    with pytest.raises(ValueError):
        chunk_words(None, chunk=8, overlap=8)


def test_interleave_corpora_rates_and_determinism(ray_session):
    import ray.data as rd

    from datavec_ray.misc import interleave_corpora

    n = 10000
    a = pa.table({"id": pa.array(np.arange(n), pa.int64()),
                  "src": ["a"] * n})
    b = pa.table({"id": pa.array(np.arange(n, 2 * n), pa.int64()),
                  "src": ["b"] * n})
    out = dataset_to_table(interleave_corpora(
        [rd.from_arrow(a).repartition(3), rd.from_arrow(b).repartition(2)],
        [1.0, 0.25], "id", seed=4))
    df = out.to_pandas()
    assert (df.src == "a").sum() == n                  # rate 1.0 keeps all
    frac_b = (df.src == "b").sum() / n
    assert abs(frac_b - 0.25) < 0.02
    out2 = dataset_to_table(interleave_corpora(
        [rd.from_arrow(a), rd.from_arrow(b)], [1.0, 0.25], "id", seed=4))
    assert sorted(out2["id"].to_pylist()) == sorted(df["id"].tolist())


def test_interleave_corpora_rate_count_mismatch():
    from datavec_ray.misc import interleave_corpora
    with pytest.raises(ValueError):
        interleave_corpora([None, None], [0.5], "id")
