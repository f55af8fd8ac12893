"""Round-3 additions: grouped higher moments (skew/kurtosis),
grouped Shannon entropy, regular-grid time resampling with linear
interpolation, MAD (Hampel) outlier detection, and the zlib
compression-ratio quality signal."""

import zlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from datavec_ray.util import dataset_to_table


def _moments_ref(x: np.ndarray) -> tuple[float, float]:
    n = len(x)
    m2 = ((x - x.mean()) ** 2).mean()
    m3 = ((x - x.mean()) ** 3).mean()
    m4 = ((x - x.mean()) ** 4).mean()
    return m3 / m2 ** 1.5, m4 / m2 ** 2 - 3.0


def test_grouped_moments_matches_numpy(ray_session):
    from datavec_ray.ops.analytics import grouped_moments

    rng = np.random.default_rng(7)
    k = np.repeat(["a", "b", "c"], 400)
    v = np.concatenate([
        rng.integers(0, 50, 400),          # ~uniform: kurt ≈ -1.2
        rng.integers(0, 5, 400) ** 3,      # right-skewed
        np.full(400, 7),                   # zero variance -> null
    ]).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": k, "v": v})).repartition(5)
    out = dataset_to_table(grouped_moments(ds, ["k"], "v")) \
        .sort_by([("k", "ascending")])
    assert out["n"].to_pylist() == [400, 400, 400]
    for i, key in enumerate(["a", "b"]):
        want_s, want_k = _moments_ref(v[k == key].astype(float))
        assert abs(out["skew"][i].as_py() - want_s) < 1e-9
        assert abs(out["kurt"][i].as_py() - want_k) < 1e-9
    assert out["skew"][2].as_py() is None       # zero variance
    assert out["kurt"][2].as_py() is None


def test_grouped_moments_partition_invariant(ray_session):
    from datavec_ray.ops.analytics import grouped_moments

    rng = np.random.default_rng(11)
    t = pa.table({"k": rng.integers(0, 4, 1000).astype(str),
                  "v": rng.integers(-20, 20, 1000)})
    a = dataset_to_table(grouped_moments(
        rd.from_arrow(t).repartition(1), ["k"], "v")) \
        .sort_by([("k", "ascending")])
    b = dataset_to_table(grouped_moments(
        rd.from_arrow(t).repartition(13), ["k"], "v")) \
        .sort_by([("k", "ascending")])
    # exact integer partials -> bit-identical under any partitioning
    assert a.equals(b)


def test_grouped_entropy_matches_scipy_formula(ray_session):
    from datavec_ray.ops.analytics import grouped_entropy

    vals = ["x"] * 50 + ["y"] * 30 + ["z"] * 20
    t = pa.table({"k": ["g"] * 100, "v": vals})
    out = dataset_to_table(grouped_entropy(
        rd.from_arrow(t).repartition(7), ["k"], "v"))
    p = np.array([0.5, 0.3, 0.2])
    want = float(-(p * np.log2(p)).sum())
    assert out["n"].to_pylist() == [100]
    assert abs(out["entropy"][0].as_py() - want) < 1e-6
    # uniform over 4 values -> exactly 2 bits
    t2 = pa.table({"k": ["u"] * 8, "v": list("abcdabcd")})
    out2 = dataset_to_table(grouped_entropy(rd.from_arrow(t2), ["k"], "v"))
    assert abs(out2["entropy"][0].as_py() - 2.0) < 1e-12


def test_time_resample_linear_and_locf(ray_session):
    from datavec_ray.misc import time_resample

    # key "a": points at t=5, 25 with v=10, 30 -> grid 10, 20 (step 10)
    #   linear: v(10)=15, v(20)=25 ; locf: v=10, 10
    # key "b": single point ON the grid -> emitted verbatim
    t = pa.table({
        "k": ["a", "a", "b"],
        "ts": pa.array([5, 25, 40], pa.int64()),
        "v": pa.array([10.0, 30.0, 7.0]),
    })
    lin = dataset_to_table(time_resample(
        rd.from_arrow(t).repartition(3), ["k"], "ts", "v", step_ms=10)) \
        .sort_by([("k", "ascending"), ("ts_ms", "ascending")])
    assert lin["ts_ms"].to_pylist() == [10, 20, 40]
    assert lin["v"].to_pylist() == [15.0, 25.0, 7.0]
    locf = dataset_to_table(time_resample(
        rd.from_arrow(t), ["k"], "ts", "v", step_ms=10, method="locf")) \
        .sort_by([("k", "ascending"), ("ts_ms", "ascending")])
    assert locf["v"].to_pylist() == [10.0, 10.0, 7.0]


def test_time_resample_duplicate_ts_and_empty_grid(ray_session):
    from datavec_ray.misc import time_resample

    # duplicate timestamps reduce to MAX; a key whose span contains no
    # grid point emits nothing
    t = pa.table({
        "k": ["a", "a", "a", "c", "c"],
        "ts": pa.array([0, 0, 10, 12, 18], pa.int64()),
        "v": pa.array([1.0, 5.0, 9.0, 2.0, 4.0]),
    })
    out = dataset_to_table(time_resample(
        rd.from_arrow(t).repartition(2), ["k"], "ts", "v", step_ms=10)) \
        .sort_by([("k", "ascending"), ("ts_ms", "ascending")])
    assert out["k"].to_pylist() == ["a", "a"]      # c: span (12,18), no grid
    assert out["ts_ms"].to_pylist() == [0, 10]
    assert out["v"].to_pylist() == [5.0, 9.0]      # max at t=0, exact at 10


def test_mad_outliers_flags_planted(ray_session):
    from datavec_ray.misc import mad_outliers

    rng = np.random.default_rng(3)
    base = rng.normal(100, 1, 500)
    vals = np.concatenate([base, [500.0, -200.0]])
    t = pa.table({"k": ["g"] * len(vals), "v": pa.array(vals)})
    out = dataset_to_table(mad_outliers(
        rd.from_arrow(t).repartition(4), ["k"], "v", k=5.0, summary=True))
    assert out["n"].to_pylist() == [502]
    assert out["n_outliers"].to_pylist() == [2]
    med = float(np.median(vals))
    assert abs(out["median"][0].as_py() - med) < 1e-9
    mad = float(np.median(np.abs(vals - med)))
    assert abs(out["mad"][0].as_py() - mad) < 1e-9
    # row mode: exactly the two planted rows carry the flag
    rows = dataset_to_table(mad_outliers(
        rd.from_arrow(t), ["k"], "v", k=5.0))
    flagged = rows.filter(rows["is_outlier"].combine_chunks())
    assert sorted(flagged["v"].to_pylist()) == [-200.0, 500.0]


def test_mad_outliers_nulls_never_flagged(ray_session):
    from datavec_ray.misc import mad_outliers

    t = pa.table({"k": ["g"] * 5,
                  "v": pa.array([1.0, 2.0, 3.0, None, 100.0])})
    out = dataset_to_table(mad_outliers(rd.from_arrow(t), ["k"], "v",
                                        k=3.0, summary=True))
    assert out["n"].to_pylist() == [4]            # null not counted
    assert out["n_outliers"].to_pylist() == [1]   # only the 100


def test_compression_signal_parity_with_zlib(ray_session):
    from datavec_ray.ops.textstats import compression_signal

    docs = ["a" * 1000,                       # trivially compressible
            "the quick brown fox " * 30,      # templated
            "", None]                         # empty + null
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    out = dataset_to_table(compression_signal(
        rd.from_arrow(t).repartition(2))).sort_by([("doc_id", "ascending")])
    for i, d in enumerate(docs):
        raw = (d or "").encode()
        assert out["n_bytes"][i].as_py() == len(raw)
        assert out["n_compressed"][i].as_py() == len(zlib.compress(raw, 6))
    r = out["compress_ratio"].to_pylist()
    assert r[0] < 0.05 and r[1] < 0.2          # repetitive text compresses
    assert r[2] == 0.0 and r[3] == 0.0          # empty/null -> 0


def _two_corpora():
    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the rain falls softly on the quiet green meadow")
    ref = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            base,
            "completely different reference text about distributed "
            "systems and arrow tables flowing through object stores",
            # within-ref near-dup of doc 0: must NOT appear (cross only)
            base + " tonight",
        ]),
    })
    new = pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),
        "text": pa.array([
            base + " tomorrow",               # near-dup of ref 0 and 2
            "a brand new page with entirely novel words nothing shared "
            "with anything stored before in the lake at all honestly",
        ]),
    })
    return ref, new


def test_jaccard_against_cross_side_only(ray_session):
    from datavec_ray.ops.dedup import jaccard_against

    ref, new = _two_corpora()
    out = dataset_to_table(jaccard_against(
        rd.from_arrow(new), rd.from_arrow(ref), n=3, threshold=0.5))
    pairs = list(zip(out["ref_id"].to_pylist(), out["doc_id"].to_pylist()))
    assert pairs == [(0, 10), (2, 10)]
    assert all(j > 0.8 for j in out["jaccard"].to_pylist())


def test_minhash_against_matches_exact(ray_session):
    from datavec_ray.ops.dedup import jaccard_against, minhash_against

    ref, new = _two_corpora()
    exact = dataset_to_table(jaccard_against(
        rd.from_arrow(new), rd.from_arrow(ref), n=3, threshold=0.7))
    approx = minhash_against(rd.from_arrow(new), rd.from_arrow(ref),
                             shingle_k=3, jaccard_threshold=0.7)
    want = set(zip(exact["ref_id"].to_pylist(),
                   exact["doc_id"].to_pylist()))
    got = set(zip(approx["ref_id"].to_pylist(),
                  approx["doc_id"].to_pylist()))
    assert got == want        # verified candidates == exact join
    # unverified mode returns (ref_id, doc_id) candidates, a superset
    cand = minhash_against(rd.from_arrow(new), rd.from_arrow(ref),
                           shingle_k=3, verify=False)
    assert want <= set(zip(cand["ref_id"].to_pylist(),
                           cand["doc_id"].to_pylist()))


def test_table_digest_portable_matches_duckdb(ray_session):
    import duckdb

    from datavec_ray.misc import table_digest

    t = pa.table({
        "k": pa.array(["a", "b", None, "d"], pa.string()),
        "i": pa.array([1, -7, 3, None], pa.int64()),
        "s": pa.array(["x", None, "z z", ""], pa.string()),
    })
    got = table_digest(rd.from_arrow(t).repartition(3), ["k", "i", "s"])
    want = duckdb.sql("""
        with ser as (
          select coalesce(k, chr(0)) || chr(31)
              || coalesce(cast(i as varchar), chr(0)) || chr(31)
              || coalesce(s, chr(0)) as s
          from t
        )
        select cast(count(*) as bigint) n,
               cast(sum(cast(md5_number_lower(s) as hugeint))
                    % 18446744073709551616 as ubigint) d
        from ser""").fetchone()
    assert got["n"] == want[0]
    assert got["digest"] == int(want[1])


def test_table_digest_order_and_partition_invariant(ray_session):
    from datavec_ray.misc import table_digest

    rng = np.random.default_rng(5)
    ids = np.arange(2000, dtype=np.int64)
    t = pa.table({"id": pa.array(ids),
                  "v": pa.array(rng.integers(0, 100, 2000))})
    perm = rng.permutation(2000)
    t_shuf = t.take(pa.array(perm, pa.int64()))
    for mode in ("portable", "fast"):
        a = table_digest(rd.from_arrow(t).repartition(1), ["id", "v"], mode)
        b = table_digest(rd.from_arrow(t_shuf).repartition(17),
                         ["id", "v"], mode)
        assert a == b, mode
        # a single changed cell must change the digest
        t2 = t.set_column(1, "v", pa.array(
            np.where(ids == 137, 999, t["v"].to_numpy()), pa.int64()))
        c = table_digest(rd.from_arrow(t2), ["id", "v"], mode)
        assert c["digest"] != a["digest"], mode


def test_benford_profile_digits_and_shares(ray_session):
    from datavec_ray.ops.analytics import benford_profile

    # 30x leading-1 (10..19, 100..119 subset), 10x leading-2, 5x 9xx;
    # plus excluded rows: 0.4 (floor 0), null, -0 -> magnitude 0
    vals = ([float(v) for v in range(10, 20)] * 3
            + [2.0, 25.0, 299.0, 21.5, 2e3] * 2
            + [900.0, 91.0, 9.9, 95.0, 999999.0]
            + [0.4, None, 0.0])
    t = pa.table({"k": ["g"] * len(vals),
                  "v": pa.array(vals, pa.float64())})
    out = dataset_to_table(benford_profile(
        rd.from_arrow(t).repartition(4), ["k"], "v")) \
        .sort_by([("digit", "ascending")])
    assert out["digit"].to_pylist() == [1, 2, 9]
    assert out["n"].to_pylist() == [30, 10, 5]
    assert out["share"].to_pylist() == [
        round(30 / 45, 6), round(10 / 45, 6), round(5 / 45, 6)]
    import math
    for d, b in zip(out["digit"].to_pylist(), out["benford"].to_pylist()):
        assert abs(b - round(math.log10(1 + 1 / d), 6)) < 1e-12


def test_pipeline_explain_reports_stages():
    from datavec_ray import Schema, TransformPipeline
    from datavec_ray.reduce import Reducer
    from datavec_ray.steps.column import KeepColumns
    from datavec_ray.steps.math import DoubleMathOp

    sch = Schema.builder().add_string("k").add_double("v").build()
    p = TransformPipeline(sch)
    p.add(DoubleMathOp("v", "Multiply", 2.0))
    p.add(KeepColumns(["k", "v"]))
    p.add(Reducer(["k"], [["v", "Sum", "s"]]))
    text = p.explain()
    assert "narrow map_batches [DoubleMathOp, KeepColumns]" in text
    assert "WIDE Reducer (exchange)" in text
    assert "1 exchange(s)" in text


def test_group_normalize_robust_mode(ray_session):
    from datavec_ray.steps.normalize import group_normalize

    v = np.array([1.0, 2.0, 3.0, 4.0, 100.0])   # outlier-heavy group
    t = pa.table({"k": ["g"] * 5, "v": pa.array(v)})
    out = dataset_to_table(group_normalize(
        rd.from_arrow(t).repartition(2), ["k"], ["v"], "Robust")) \
        .sort_by([("v", "ascending")])
    med = np.median(v)
    q25, q75 = np.quantile(v, 0.25), np.quantile(v, 0.75)
    want = (np.sort(v) - med) / (q75 - q25)
    got = np.array(out["v_norm"].to_pylist())
    assert np.allclose(got, want, atol=1e-9)
    # zero-IQR group -> null
    t2 = pa.table({"k": ["z"] * 4, "v": pa.array([7.0] * 4)})
    out2 = dataset_to_table(group_normalize(
        rd.from_arrow(t2), ["k"], ["v"], "Robust"))
    assert all(x is None for x in out2["v_norm"].to_pylist())


def test_audio_mfcc_known_signal(ray_session):
    from datavec_ray.ops.codecs import encode_wav
    from datavec_ray.ops.multimodal import AudioMFCC

    rate = 16000
    t = np.arange(rate, dtype=np.float64) / rate
    tone = np.sin(2 * np.pi * 440.0 * t)            # pure A4
    noise = np.random.default_rng(0).normal(0, 0.5, rate)
    tbl = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([encode_wav(tone, rate),
                             encode_wav(noise, rate)], pa.binary()),
        "sample_rate": pa.array([rate, rate], pa.int64()),
    })
    out = dataset_to_table(
        rd.from_arrow(tbl).map_batches(AudioMFCC, batch_format="pyarrow",
                                       concurrency=1))
    assert out["mfcc_mean"].type == pa.list_(pa.float32())
    m = np.array(out["mfcc_mean"].to_pylist())
    s = np.array(out["mfcc_std"].to_pylist())
    assert m.shape == (2, 13) and s.shape == (2, 13)
    # a stationary tone has near-zero frame-to-frame variation; noise
    # spreads energy -> clearly different embeddings, stable tone
    assert np.abs(s[0, 1:]).max() < np.abs(s[1, 1:]).max()
    assert np.linalg.norm(m[0] - m[1]) > 1.0
    # determinism across runs
    out2 = dataset_to_table(
        rd.from_arrow(tbl).map_batches(AudioMFCC, batch_format="pyarrow",
                                       concurrency=1))
    assert np.allclose(m, np.array(out2["mfcc_mean"].to_pylist()))


def test_skew_join_hot_path_equals_plain_join(ray_session):
    from datavec_ray.join import JoinStep, skew_join

    rng = np.random.default_rng(9)
    # one Zipf-head key (60% of rows) + a cold tail
    k = np.concatenate([np.zeros(600, np.int64),
                        rng.integers(1, 50, 400)])
    left = pa.table({"k": pa.array(k),
                     "x": pa.array(np.arange(1000, dtype=np.int64))})
    right = pa.table({"k": pa.array(np.arange(50, dtype=np.int64)),
                      "lbl": pa.array([f"u{i}" for i in range(50)])})
    got = dataset_to_table(skew_join(
        rd.from_arrow(left).repartition(4), rd.from_arrow(right),
        ["k"], hot_share=0.1)).sort_by(
        [("x", "ascending")])
    want = dataset_to_table(JoinStep(right, ["k"]).apply_dataset(
        rd.from_arrow(left))).sort_by([("x", "ascending")])
    assert got.select(["k", "x", "lbl"]).equals(
        want.select(["k", "x", "lbl"]))
    # left-outer keeps unmatched left rows (key 49 removed from right)
    r2 = right.slice(0, 49)
    lo = dataset_to_table(skew_join(
        rd.from_arrow(left), rd.from_arrow(r2), ["k"],
        join_type="LeftOuter", hot_share=0.1))
    assert lo.num_rows == 1000
    nulls = lo.filter(lo["lbl"].combine_chunks().is_null())
    assert set(nulls["k"].to_pylist()) == {49}


def test_copartitioned_lake_join(ray_session, tmp_path):
    import pytest

    from datavec_ray.cdc.binlog import synth_binlog
    from datavec_ray.cdc.engine import (CdcIngestEngine,
                                        copartitioned_lake_join)

    binlog = synth_binlog(3000, num_convs=40, seed=11)
    ea = CdcIngestEngine(str(tmp_path / "a"), num_partitions=4)
    ea.replay(rd.from_arrow(binlog), checkpoint_name="x")
    eb = CdcIngestEngine(str(tmp_path / "b"), num_partitions=4)
    half = binlog.filter(
        pa.compute.less_equal(binlog["lsn"], 1500))
    eb.replay(rd.from_arrow(half), checkpoint_name="x")

    out = dataset_to_table(copartitioned_lake_join(
        ea, eb, on=["conv_id", "turn_idx"]))
    # oracle: plain pyarrow join of the two full states
    sa = dataset_to_table(ea.read_lake_dataset())
    sb = dataset_to_table(eb.read_lake_dataset())
    want = sa.join(sb, keys=["conv_id", "turn_idx"], join_type="inner",
                   right_suffix="_r")
    key = [("conv_id", "ascending"), ("turn_idx", "ascending")]
    assert out.num_rows == want.num_rows
    assert out.sort_by(key).select(["conv_id", "turn_idx", "text",
                                    "text_r"]).equals(
        want.sort_by(key).select(["conv_id", "turn_idx", "text",
                                  "text_r"]))
    # misaligned layouts refuse
    ec = CdcIngestEngine(str(tmp_path / "c"), num_partitions=8)
    with pytest.raises(ValueError, match="not co-partitioned"):
        copartitioned_lake_join(ea, ec)
    es = CdcIngestEngine(str(tmp_path / "s"), num_partitions=4,
                         salt_turns=3, hot_convs=["conv-1"])
    with pytest.raises(ValueError, match="unsalted"):
        copartitioned_lake_join(ea, es)
    for e in (ea, eb, ec, es):
        e.shutdown()


def test_ivf_upsert_delete_move_and_compact(ray_session, tmp_path):
    import os

    from datavec_ray.ops.similarity import (ivf_build, ivf_compact,
                                            ivf_query_live, ivf_upsert)

    rng = np.random.default_rng(21)
    dim, n = 8, 300
    base = rng.normal(0, 1, (n, dim))
    base[:150] += 6.0          # two well-separated blobs
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({"vec_id": pa.array(ids),
                    "embedding": pa.array(list(base))})
    idx = str(tmp_path / "ivf")
    ivf_build(rd.from_arrow(tbl), idx, num_centroids=6, sample_frac=1.0)

    moved = base[170] + 6.0     # vec 170 moves into the other blob
    newv = rng.normal(0, 1, dim) + 6.0
    delta = pa.table({
        "vec_id": pa.array([170, 5, 999], pa.int64()),
        "embedding": pa.array([list(moved), None, list(newv)],
                              pa.list_(pa.float64())),
    })
    m = ivf_upsert(idx, delta)
    assert m["upserts"] == 2 and m["deletes"] == 1 and m["ver"] == 1

    # probe everything -> must equal brute force over the NEW corpus
    updated = {i: v for i, v in zip(ids, base)}
    updated[170] = moved
    del updated[5]
    updated[999] = newv
    q = np.stack([moved, base[5]])
    got = dataset_to_table(ivf_query_live(idx, q, k=3, nprobe=6)) \
        .sort_by([("query_id", "ascending"), ("cosine", "descending")])
    all_ids = np.array(sorted(updated), dtype=np.int64)
    mat = np.stack([updated[i] for i in all_ids])
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    for qi in range(2):
        cos = mn @ qn[qi]
        want = all_ids[np.argsort(-cos)][:3].tolist()
        sub = got.filter(pa.compute.equal(got["query_id"], qi))
        assert sub["match_id"].to_pylist() == want, qi
    assert 5 not in got["match_id"].to_pylist()        # deleted
    # a query AT the inserted vector finds it first
    res_new = dataset_to_table(ivf_query_live(idx, np.stack([newv]),
                                              k=1, nprobe=6))
    assert res_new["match_id"].to_pylist() == [999]

    # the moved vector's STALE copy may share a probed centroid with
    # queries at its old location, but the ledger suppresses it: the
    # old-location query must rank 170 by its NEW (far) vector or not
    # return it at all among close matches
    old_q = np.stack([base[170]])
    res_old = dataset_to_table(ivf_query_live(idx, old_q, k=5, nprobe=6))
    if 170 in res_old["match_id"].to_pylist():
        i = res_old["match_id"].to_pylist().index(170)
        new_cos = float(
            (moved / np.linalg.norm(moved))
            @ (base[170] / np.linalg.norm(base[170])))
        assert abs(res_old["cosine"][i].as_py() - new_cos) < 1e-9

    # compact folds everything back; results unchanged, ledger gone
    c = ivf_compact(idx)
    assert c["centroids_folded"] >= 1
    assert not os.path.exists(os.path.join(idx, "_ledger.parquet"))
    got2 = dataset_to_table(ivf_query_live(idx, q, k=3, nprobe=6)) \
        .sort_by([("query_id", "ascending"), ("cosine", "descending")])
    assert got2.equals(got)
    for d in os.listdir(idx):
        p = os.path.join(idx, d)
        if d.startswith("cent=") and os.path.isdir(p):
            assert len([f for f in os.listdir(p)
                        if f.endswith(".parquet")]) == 1


def test_zorder_key_locality(ray_session):
    from datavec_ray.misc import zorder_key

    # interleave is exact: zkey(1, 0) = 1, zkey(0, 1) = 2, zkey(1, 1)=3
    t = pa.table({"a": pa.array([1, 0, 1, 3], pa.int64()),
                  "b": pa.array([0, 1, 1, 3], pa.int64())})
    out = dataset_to_table(zorder_key(rd.from_arrow(t), ["a", "b"],
                                      bits=4))
    assert out["zkey"].to_pylist() == [1, 2, 3, 15]
    # locality: sorting a 2-d grid by zkey keeps small-radius neighbors
    # closer in rank than a row-major sort does on the y axis
    g = 16
    xs, ys = np.meshgrid(np.arange(g), np.arange(g))
    grid = pa.table({"a": pa.array(xs.ravel().astype(np.int64)),
                     "b": pa.array(ys.ravel().astype(np.int64))})
    z = dataset_to_table(zorder_key(rd.from_arrow(grid), ["a", "b"],
                                    bits=4))
    rank = np.argsort(np.argsort(np.array(z["zkey"].to_pylist())))
    rank = rank.reshape(g, g)
    # mean rank distance to the +1-in-y neighbor is far below the
    # row-major layout's constant g*g/g = g rows = 16*16/16... in
    # row-major, +1 in y costs g ranks * g cols; z-order keeps it small
    zd = np.abs(np.diff(rank, axis=0)).mean()
    assert zd < g * g / 4           # strictly better than row-major g*g/g
    import pytest
    # Ray wraps the worker's ValueError in RayTaskError(UserCodeException)
    with pytest.raises(Exception, match="negative"):
        dataset_to_table(zorder_key(
            rd.from_arrow(pa.table({"a": pa.array([-1], pa.int64()),
                                    "b": pa.array([0], pa.int64())})),
            ["a", "b"]))


def test_time_resample_matches_bruteforce_random(ray_session):
    from datavec_ray.misc import time_resample

    for seed in (1, 2, 3, 4, 5):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(5, 120))
        keys = rng.integers(0, 6, n).astype(np.int64)
        ts = rng.integers(0, 500, n).astype(np.int64)
        vs = np.round(rng.normal(0, 10, n), 3)
        step = int(rng.choice([7, 10, 25]))
        t = pa.table({"k": pa.array(keys), "ts": pa.array(ts),
                      "v": pa.array(vs)})
        got = dataset_to_table(time_resample(
            rd.from_arrow(t).repartition(3), ["k"], "ts", "v", step)) \
            .sort_by([("k", "ascending"), ("ts_ms", "ascending")])
        # brute-force reference: per key, dedup ts by max, grid, interp
        want_rows = []
        for k in np.unique(keys):
            pts = {}
            for tt, vv in zip(ts[keys == k], vs[keys == k]):
                pts[tt] = max(pts.get(tt, -np.inf), vv)
            st_, en = min(pts), max(pts)
            g0 = -(-st_ // step) * step
            tlist = sorted(pts)
            for gt in range(g0, en + 1, step):
                import bisect
                i = bisect.bisect_right(tlist, gt) - 1
                j = bisect.bisect_left(tlist, gt)
                pt_, nt_ = tlist[i], tlist[j]
                if pt_ == nt_:
                    val = pts[pt_]
                else:
                    val = pts[pt_] + (pts[nt_] - pts[pt_]) * (
                        float(gt - pt_) / float(nt_ - pt_))
                want_rows.append((int(k), gt, val))
        want_rows.sort()
        assert got["k"].to_pylist() == [r[0] for r in want_rows], seed
        assert got["ts_ms"].to_pylist() == [r[1] for r in want_rows], seed
        assert np.allclose(got["v"].to_pylist(),
                           [r[2] for r in want_rows], atol=1e-12), seed


def test_table_digest_additive_over_union(ray_session):
    from datavec_ray.misc import table_digest

    a = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "s": pa.array(["x", "y", "z"])})
    b = pa.table({"id": pa.array([4, 5], pa.int64()),
                  "s": pa.array(["u", None])})
    da = table_digest(rd.from_arrow(a), ["id", "s"])
    db = table_digest(rd.from_arrow(b), ["id", "s"])
    dab = table_digest(rd.from_arrow(pa.concat_tables([a, b])),
                       ["id", "s"])
    assert dab["n"] == da["n"] + db["n"]
    assert dab["digest"] == (da["digest"] + db["digest"]) % (1 << 64)


def test_render_view_advance_equals_rebuild(ray_session, tmp_path):
    from datavec_ray.cdc.aggview import RenderView
    from datavec_ray.cdc.binlog import synth_binlog
    from datavec_ray.cdc.engine import CdcIngestEngine

    binlog = synth_binlog(2000, num_convs=25, seed=13)
    eng = CdcIngestEngine(str(tmp_path / "lake"), num_partitions=4)
    try:
        eng.replay(rd.from_arrow(binlog.filter(
            pa.compute.less_equal(binlog["lsn"], 1000))),
            checkpoint_name="v1")
        eng.replay(rd.from_arrow(binlog.filter(
            pa.compute.greater(binlog["lsn"], 1000))),
            checkpoint_name="v2")
        tt = eng.time_travel()
        view = RenderView()
        v1 = view.build(tt.read_state_at("v1"))
        advanced = view.advance(v1, tt.retract_feed("v1", "v2"),
                                tt.read_state_at("v2"))
        rebuilt = view.build(tt.read_state_at("v2"))
        assert advanced.equals(rebuilt)
        assert not advanced.equals(v1)      # the delta changed things
    finally:
        eng.shutdown()


def test_transition_counts_matches_pandas(ray_session):
    from datavec_ray.misc import transition_counts

    rng = np.random.default_rng(17)
    conv = rng.integers(0, 8, 200).astype(str)
    turn = np.zeros(200, np.int64)
    for c in np.unique(conv):            # unique turn order per conv
        m = conv == c
        turn[m] = np.arange(m.sum())
    role = rng.choice(["user", "assistant", "tool"], 200)
    t = pa.table({"conv_id": conv, "turn_idx": pa.array(turn),
                  "role": pa.array(role)})
    out = dataset_to_table(transition_counts(
        rd.from_arrow(t).repartition(5), ["conv_id"], "turn_idx",
        "role")).sort_by([("from_state", "ascending"),
                          ("to_state", "ascending")])
    import pandas as pd
    df = pd.DataFrame({"c": conv, "t": turn, "r": role}) \
        .sort_values(["c", "t"])
    prev = df.groupby("c")["r"].shift()
    want = pd.DataFrame({"f": prev, "to": df["r"]}).dropna() \
        .value_counts().sort_index()
    assert out["n"].to_pylist() == want.values.tolist()
    assert list(zip(out["from_state"].to_pylist(),
                    out["to_state"].to_pylist())) \
        == [tuple(i) for i in want.index]


def test_copartitioned_join_delta_mode_lakes(ray_session, tmp_path):
    from datavec_ray.cdc.binlog import synth_binlog
    from datavec_ray.cdc.engine import (CdcIngestEngine,
                                        copartitioned_lake_join)

    binlog = synth_binlog(1500, num_convs=20, seed=5)
    # lake A: LSM delta commits across two replays; lake B: rewrite mode
    ea = CdcIngestEngine(str(tmp_path / "da"), num_partitions=4,
                         commit_mode="delta")
    ea.replay(rd.from_arrow(binlog.filter(
        pa.compute.less_equal(binlog["lsn"], 700))), checkpoint_name="a1")
    ea.replay(rd.from_arrow(binlog.filter(
        pa.compute.greater(binlog["lsn"], 700))), checkpoint_name="a2")
    eb = CdcIngestEngine(str(tmp_path / "db"), num_partitions=4)
    eb.replay(rd.from_arrow(binlog), checkpoint_name="b")

    out = dataset_to_table(copartitioned_lake_join(
        ea, eb, on=["conv_id", "turn_idx"]))
    # both lakes hold the SAME final state -> inner join is a full
    # match and text == text_r everywhere
    sb = dataset_to_table(eb.read_lake_dataset())
    assert out.num_rows == sb.num_rows
    eq = pa.compute.equal(
        pa.compute.fill_null(out["text"].combine_chunks(), ""),
        pa.compute.fill_null(out["text_r"].combine_chunks(), ""))
    assert pa.compute.all(eq).as_py()
    ea.shutdown()
    eb.shutdown()


def test_cross_join_collisions_and_cap(ray_session):
    import pytest

    from datavec_ray.join import cross_join

    left = pa.table({"k": pa.array([1, 2], pa.int64()),
                     "x": pa.array(["a", "b"])})
    right = pa.table({"k": pa.array([10, 20, 30], pa.int64()),
                      "y": pa.array(["p", "q", "r"])})
    out = dataset_to_table(cross_join(rd.from_arrow(left), right)) \
        .sort_by([("k", "ascending"), ("k_r", "ascending")])
    assert out.num_rows == 6
    assert out.column_names == ["k", "x", "k_r", "y"]   # collision suffix
    assert out["k_r"].to_pylist() == [10, 20, 30, 10, 20, 30]
    with pytest.raises(ValueError, match="max_right_rows"):
        cross_join(rd.from_arrow(left), right, max_right_rows=2)
