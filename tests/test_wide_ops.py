"""Executor-parity tests: distributed (Ray Data) vs single-process oracle —
the reference's ExecutionTest pattern
(``datavec-spark/src/test/.../ExecutionTest.java:41-117``)."""

import numpy as np
import pyarrow as pa
import pytest

from datavec_ray.conditions import ColumnCondition
from datavec_ray.join import JoinStep
from datavec_ray.rank import CalculateSortedRank
from datavec_ray.reduce import Reducer
from datavec_ray.sequence import (GroupedSequence, MovingWindowReduce,
                                  OverlappingTimeWindowReduce, ReduceSequence,
                                  SequenceDifference, SequenceLengthFilter,
                                  SequenceOffset, SequenceTrim, SplitMaxLength,
                                  SplitTimeSeparation, TumblingTimeWindowReduce)
from datavec_ray.util import dataset_to_table

from tests.conftest import tables_equal


def groups_table():
    return pa.table({
        "key": ["a"] * 4 + ["b"] * 3 + ["c"],
        "key2": ["x", "x", "y", "y", "x", "x", "y", "x"],
        "val_i": pa.array([1, 2, 3, 4, 10, 20, 30, 100], pa.int64()),
        "val_d": pa.array([1.0, 2.0, 2.0, 4.0, 1.5, 2.5, 3.5, -1.0]),
        "val_s": ["p", "q", "r", "s", "t", "u", "v", "w"],
        "seq_ts": pa.array([0, 1000, 2000, 9000, 0, 5000, 6000, 0],
                           pa.timestamp("ms")),
    })


def _ray_table(ray_session, step, tbl, nparts=3, sort_cols=None):
    import ray.data as rd
    out = dataset_to_table(step.apply_dataset(rd.from_arrow(tbl).repartition(nparts)))
    if sort_cols:
        out = out.sort_by([(c, "ascending") for c in sort_cols])
    return out


# -- Reducer golden values (hand-computed, TestMultiOpReduce style) ----------

def test_reducer_golden_local():
    r = Reducer(["key"], [["val_i", "Sum", "s"], ["val_i", "Mean", "m"],
                          ["val_i", "Stdev", "sd"], ["val_i", "Range", "rg"],
                          ["val_d", "CountUniqueExact", "cu"],
                          ["val_s", "TakeFirst", "f"], ["val_s", "Append", "app"]])
    out = r.apply_local(groups_table()).sort_by("key")
    assert out["s"].to_pylist() == [10, 60, 100]
    assert out["m"].to_pylist() == [2.5, 20.0, 100.0]
    assert abs(out["sd"][0].as_py() - np.std([1, 2, 3, 4], ddof=1)) < 1e-12
    assert out["rg"].to_pylist() == [3, 20, 0]
    assert out["cu"].to_pylist() == [3, 3, 1]  # a: {1,2,4}, b: {1.5,2.5,3.5}
    assert out["app"].to_pylist() == ["p,q,r,s", "t,u,v", "w"]


def test_reducer_parity(ray_session):
    r = Reducer(["key", "key2"],
                [["val_i", "Sum", "s"], ["val_d", "Variance", "v"],
                 ["val_i", "Count", "n"], ["val_i", "Prod", "p"],
                 ["val_d", "Min", "mn"], ["val_d", "Max", "mx"]])
    loc = r.apply_local(groups_table()).sort_by([("key", "ascending"),
                                                 ("key2", "ascending")])
    dist = _ray_table(ray_session, r, groups_table(), sort_cols=["key", "key2"])
    assert tables_equal(loc, dist, 1e-12)


def test_reducer_conditional(ray_session):
    cond = ColumnCondition("val_i", "GreaterThan", 1)
    r = Reducer(["key"], [["val_i", "Sum", "s"]], condition=cond)
    loc = r.apply_local(groups_table()).sort_by("key")
    assert loc["s"].to_pylist() == [9, 60, 100]
    dist = _ray_table(ray_session, r, groups_table(), sort_cols=["key"])
    assert tables_equal(loc, dist)


def test_hll_tolerance():
    from datavec_ray.hll import HyperLogLog, hash64
    h = HyperLogLog()
    n = 50_000
    h.add_hashes(hash64(np.arange(n)))
    est = h.cardinality()
    assert abs(est - n) / n < 0.06  # rel err ~1.04/sqrt(512) = 4.6%


# -- sequence ops ------------------------------------------------------------

def seq_table():
    return pa.table({
        "k": ["a"] * 5 + ["b"] * 2,
        "i": pa.array([4, 2, 0, 1, 3, 1, 0], pa.int64()),
        "v": pa.array([40.0, 20.0, 0.0, 10.0, 30.0, 100.0, 0.0]),
        "ts": pa.array([40000, 20000, 0, 1000, 21000, 5000, 0],
                       pa.timestamp("ms")),
    })


def test_sequence_offset_golden():
    gs = GroupedSequence(["k"], ["i"], [SequenceOffset(["v"], 1, "NewColumn",
                                                       "SpecifiedValue", -1.0)])
    out = gs.apply_local(seq_table())
    a = out.filter(pa.compute.equal(out["k"], "a"))
    assert a["v_offset1"].to_pylist() == [-1.0, 0.0, 10.0, 20.0, 30.0]
    gs2 = GroupedSequence(["k"], ["i"], [SequenceOffset(["v"], 1, "InPlace",
                                                        "TrimSequence")])
    out2 = gs2.apply_local(seq_table())
    a2 = out2.filter(pa.compute.equal(out2["k"], "a"))
    assert a2["v"].to_pylist() == [0.0, 10.0, 20.0, 30.0]
    assert a2["i"].to_pylist() == [1, 2, 3, 4]


def test_sequence_ops_parity(ray_session):
    ops = [SequenceDifference("v", 1, new_column="dv"),
           MovingWindowReduce("v", 3, "Max", "mw"),
           SplitTimeSeparation("ts", 10_000, "sub")]
    gs = GroupedSequence(["k"], ["i"], ops)
    loc = gs.apply_local(seq_table()).sort_by([("k", "ascending"), ("i", "ascending")])
    dist = _ray_table(ray_session, gs, seq_table(), sort_cols=["k", "i"])
    assert tables_equal(loc, dist)


def test_sequence_trim_filter_split():
    gs = GroupedSequence(["k"], ["i"], [SequenceTrim(1, True)])
    out = gs.apply_local(seq_table())
    assert out.num_rows == 5  # a:4, b:1
    gs = GroupedSequence(["k"], ["i"], [SequenceLengthFilter(min_length=3)])
    assert gs.apply_local(seq_table()).num_rows == 5  # only a survives
    gs = GroupedSequence(["k"], ["i"], [SplitMaxLength(2, "sub")])
    out = gs.apply_local(seq_table())
    a = out.filter(pa.compute.equal(out["k"], "a"))
    assert a["sub"].to_pylist() == [0, 0, 1, 1, 2]


def test_reduce_sequence():
    gs = GroupedSequence(["k"], ["ts"], [ReduceSequence(["k"],
                                                        [["v", "Sum", "sv"],
                                                         ["v", "TakeLast", "lv"]])])
    out = gs.apply_local(seq_table()).sort_by("k")
    assert out["sv"].to_pylist() == [100.0, 100.0]
    assert out["lv"].to_pylist() == [40.0, 100.0]  # last by ts order


def test_windows_golden():
    gs = GroupedSequence(["k"], ["ts"],
                         [TumblingTimeWindowReduce(["k"], "ts", 10_000,
                                                   [["v", "Sum", "sv"],
                                                    ["v", "Count", "n"]])])
    out = gs.apply_local(seq_table()).sort_by([("k", "ascending"),
                                               ("window_start", "ascending")])
    a = out.filter(pa.compute.equal(out["k"], "a"))
    # a: ts 0,1000 → window 0 (v 0+10); ts 20000,21000 → window 20000
    # (v 20+30); ts 40000 → window 40000 (v 40)
    assert a["sv"].to_pylist() == [10.0, 50.0, 40.0]
    assert a["n"].to_pylist() == [2, 2, 1]
    gs2 = GroupedSequence(["k"], ["ts"],
                          [OverlappingTimeWindowReduce(["k"], "ts", 10_000, 5_000,
                                                       [["v", "Count", "n"]])])
    out2 = gs2.apply_local(seq_table())
    b = out2.filter(pa.compute.equal(out2["k"], "b"))
    # b: steps at 0 and 5000; windows(start): -5000(0), 0(0,5000), 5000(5000)
    assert b["n"].to_pylist() == [1, 2, 1]


# -- rank / join -------------------------------------------------------------

def test_rank_parity(ray_session):
    r = CalculateSortedRank(["val_i"], "rank", descending=True)
    loc = r.apply_local(groups_table())
    dist = _ray_table(ray_session, r, groups_table(), sort_cols=["rank"])
    assert tables_equal(loc, dist)
    assert loc["val_i"].to_pylist()[0] == 100 and loc["rank"].to_pylist()[0] == 0


def test_join_types(ray_session):
    left = pa.table({"k": ["a", "b", "d"], "lv": [1, 2, 3]})
    right = pa.table({"k": ["a", "b", "c"], "rv": [10, 20, 30]})
    for jt, expected in [("Inner", 2), ("LeftOuter", 3), ("RightOuter", 3),
                         ("FullOuter", 4)]:
        j = JoinStep(right, ["k"], join_type=jt, num_partitions=2)
        loc = j.apply_local(left)
        assert loc.num_rows == expected, jt
        dist = _ray_table(ray_session, j, left, nparts=2, sort_cols=["k"])
        assert dist.num_rows == expected, jt
        sel = sorted(set(loc.column_names))
        assert tables_equal(loc.sort_by([("k", "ascending")]).select(sel),
                            dist.select(sel))


def test_broadcast_join(ray_session):
    import ray.data as rd
    left = pa.table({"k": ["a", "b", "d"], "lv": [1, 2, 3]})
    right = pa.table({"k": ["a", "b", "c"], "rv": [10, 20, 30]})
    j = JoinStep(right, ["k"], join_type="LeftOuter", broadcast=True)
    out = dataset_to_table(j.apply_dataset(rd.from_arrow(left))).sort_by("k")
    assert out["rv"].to_pylist() == [10, 20, None]


def test_vectorized_partition_path_parity(ray_session):
    """Every vectorizable op: fast (pandas-partition) path vs the
    per-group oracle, including edge trims and filters."""
    import ray.data as rd
    chains = [
        [SequenceOffset(["v"], 1, "NewColumn", "SpecifiedValue", -1.0)],
        [SequenceOffset(["v"], 1, "InPlace", "TrimSequence")],
        [SequenceOffset(["v"], -1, "NewColumn", "TrimSequence")],
        [SequenceTrim(1, True)],
        [SequenceTrim(2, False)],
        [SequenceLengthFilter(min_length=3)],
        [SplitMaxLength(2, "sub")],
        [SequenceDifference("v", 2, "SpecifiedValue", -9.0, "dv"),
         MovingWindowReduce("v", 2, "Sum", "mw"), SequenceTrim(1, True)],
    ]
    for ops in chains:
        gs = GroupedSequence(["k"], ["i"], ops)
        loc = gs.apply_local(seq_table())
        dist = dataset_to_table(gs.apply_dataset(
            rd.from_arrow(seq_table()).repartition(3)))
        key = [("k", "ascending"), ("i", "ascending")]
        assert tables_equal(loc.sort_by(key), dist.sort_by(key)), ops


def test_vectorized_reduce_and_window_parity(ray_session):
    """ReduceSequence / TumblingTimeWindowReduce vectorized partition path
    vs the per-group oracle."""
    import ray.data as rd
    for ops in [
        [ReduceSequence(["k"], [["v", "Sum", "sv"], ["v", "Mean", "mv"],
                                ["v", "Count", "n"], ["v", "Stdev", "sd"]])],
        [TumblingTimeWindowReduce(["k"], "ts", 10_000,
                                  [["v", "Sum", "sv"], ["v", "Count", "n"]])],
        [TumblingTimeWindowReduce(["k"], "ts", 7_000,
                                  [["v", "Max", "mx"]], offset_ms=1000,
                                  emit_window_bounds=False)],
        [OverlappingTimeWindowReduce(["k"], "ts", 10_000, 5_000,
                                     [["v", "Sum", "sv"], ["v", "Count", "n"]])],
        [OverlappingTimeWindowReduce(["k"], "ts", 9_000, 4_000,
                                     [["v", "Min", "mn"], ["v", "Mean", "mv"]],
                                     offset_ms=2000,
                                     emit_window_bounds=False)],
    ]:
        gs = GroupedSequence(["k"], ["ts"], ops)
        loc = gs.apply_local(seq_table())
        dist = dataset_to_table(gs.apply_dataset(
            rd.from_arrow(seq_table()).repartition(3)))
        sort_cols = [c for c in loc.column_names
                     if c in ("k", "window_start")]
        key = [(c, "ascending") for c in sort_cols]
        assert tables_equal(loc.sort_by(key), dist.select(
            loc.column_names).sort_by(key)), ops


def test_asof_join(ray_session):
    """asof_join vs a hand-computed point-in-time merge: backward
    direction, int dtype preservation, and a key with no right rows."""
    import ray.data as rd
    from datavec_ray.join import asof_join

    left = pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "k": pa.array(["a", "a", "b", "b", "c"]),
        "t": pa.array([10, 20, 15, 5, 30], pa.int64()),
    })
    right = pa.table({
        "k": pa.array(["a", "a", "b"]),
        "t": pa.array([8, 18, 10], pa.int64()),
        "px": pa.array([100, 200, 300], pa.int64()),
    })
    out = dataset_to_table(
        asof_join(rd.from_arrow(left).repartition(3),
                  rd.from_arrow(right), on="t", by="k", num_buckets=4)
    ).to_pandas().sort_values("id").reset_index(drop=True)
    # id1 t=10 -> right a@8 (100); id2 t=20 -> a@18 (200);
    # id3 t=15 -> b@10 (300); id4 t=5 -> none; id5 k=c -> none
    assert out["px_r"].tolist() == [100, 200, 300] + [None, None] \
        or (out["px_r"][:3].tolist() == [100, 200, 300]
            and out["px_r"][3:].isna().all())
    assert out["t_r"][:3].tolist() == [8, 18, 10]
    assert str(out["id"].dtype) in ("int64", "Int64")  # ints survive
    # forward direction: id4 t=5 -> b@10
    fwd = dataset_to_table(
        asof_join(rd.from_arrow(left), rd.from_arrow(right),
                  on="t", by="k", direction="forward", num_buckets=4)
    ).to_pandas().sort_values("id").reset_index(drop=True)
    assert fwd.loc[3, "px_r"] == 300


def test_range_join(ray_session):
    """Banded range join: inclusive bounds, fan-out, no-match keys."""
    import ray.data as rd
    from datavec_ray.join import range_join

    left = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "k": pa.array(["a", "a", "b"]),
        "t": pa.array([100, 200, 100], pa.int64()),
    })
    right = pa.table({
        "k": pa.array(["a", "a", "a", "b"]),
        "t": pa.array([90, 100, 150, 300], pa.int64()),
        "v": pa.array([1, 2, 3, 4], pa.int64()),
    })
    out = dataset_to_table(
        range_join(rd.from_arrow(left).repartition(2), rd.from_arrow(right),
                   on="t", by="k", lower=-10, upper=0, num_buckets=4)
    ).to_pandas().sort_values(["id", "t_r"]).reset_index(drop=True)
    # id1 t=100 band [90,100] -> v1@90, v2@100 (both bounds inclusive)
    # id2 t=200 band [190,200] -> none; id3 k=b band [90,100] -> none
    assert out["id"].tolist() == [1, 1]
    assert out["v_r"].tolist() == [1, 2]
    assert out["t_r"].tolist() == [90, 100]


def test_range_join_empty_bucket_nullable_restore():
    """A zero-match bucket whose restore map reinstates pandas nullable
    dtypes (Int64) must still emit a typed empty Arrow table —
    pa.from_numpy_dtype can't interpret extension dtypes (the
    stream_join sf0.01 crash this regression pins)."""
    import pandas as pd
    from datavec_ray.join import _RangeMerge

    out = pd.DataFrame({
        "id": pd.array([], dtype="Int64"),
        "k": pd.Series([], dtype=object),
        "x": pd.Series([], dtype="float64"),
    })
    t = _RangeMerge._typed_empty(out)
    assert t.num_rows == 0
    assert t.schema.field("id").type == pa.int64()
    assert t.schema.field("k").type == pa.string()
    assert t.schema.field("x").type == pa.float64()


def test_range_join_overflow_fallback(ray_session):
    """on-values spanning ~2^61 force the per-key-segment fallback."""
    import ray.data as rd
    from datavec_ray.join import range_join

    big = 2 ** 61
    left = pa.table({"id": pa.array([1, 2], pa.int64()),
                     "k": pa.array(["a", "b"]),
                     "t": pa.array([0, big], pa.int64())})
    right = pa.table({"k": pa.array(["a", "b", "b"]),
                      "t": pa.array([5, big - 3, big + 1], pa.int64()),
                      "v": pa.array([10, 20, 30], pa.int64())})
    out = dataset_to_table(
        range_join(rd.from_arrow(left), rd.from_arrow(right),
                   on="t", by="k", lower=-5, upper=5, num_buckets=2)
    ).to_pandas().sort_values(["id", "t_r"]).reset_index(drop=True)
    assert out["id"].tolist() == [1, 2, 2]
    assert out["v_r"].tolist() == [10, 20, 30]


def test_grouped_topk(ray_session):
    """Per-key top-k with combiner prune: ties broken by id, groups
    smaller than k kept whole, prune across batch boundaries correct."""
    import ray.data as rd
    from datavec_ray.rank import grouped_topk

    t = pa.table({
        "id": pa.array(range(10), pa.int64()),
        "g": pa.array(["a"] * 6 + ["b"] * 3 + ["c"]),
        "v": pa.array([5, 9, 9, 1, 7, 3, 2, 8, 8, 4], pa.int64()),
    })
    out = dataset_to_table(
        grouped_topk(rd.from_arrow(t).repartition(5), keys="g",
                     order_col="v", k=2, descending=True, tiebreak="id")
    ).to_pandas().sort_values(["g", "v", "id"],
                              ascending=[True, False, True])
    # a: v9@id1, v9@id2; b: v8@id7, v8@id8; c: lone v4@id9
    assert out[out.g == "a"]["id"].tolist() == [1, 2]
    assert out[out.g == "b"]["id"].tolist() == [7, 8]
    assert out[out.g == "c"]["id"].tolist() == [9]


def test_pca_parity_with_numpy(ray_session):
    import ray
    from datavec_ray.ops.similarity import pca_fit, pca_transform
    from datavec_ray.util import dataset_to_table

    rng = np.random.default_rng(3)
    # anisotropic data so the spectrum is well separated
    base = rng.normal(size=(400, 6)) * np.array([5.0, 3.0, 2.0, 1.0, 0.5, 0.1])
    mix = rng.normal(size=(6, 6))
    x = base @ mix
    t = pa.table({"vec_id": pa.array(range(400), pa.int64()),
                  "embedding": pa.array([row.tolist() for row in x],
                                        pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t).repartition(5)
    model = pca_fit(ds, k=3)

    xf = x.astype(np.float32).astype(np.float64)
    cov = np.cov(xf, rowvar=False)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:3]
    ref = v[:, order].T
    sign = np.sign(ref[np.arange(3), np.abs(ref).argmax(axis=1)])
    ref = ref * sign[:, None]
    assert np.allclose(model["components"], ref, atol=1e-6)
    assert np.allclose(model["explained_var"], w[order], atol=1e-6)

    out = dataset_to_table(pca_transform(ds, model)).sort_by(
        [("vec_id", "ascending")])
    proj = np.stack(out["pca"].to_numpy(zero_copy_only=False))
    expd = (xf - xf.mean(axis=0)) @ ref.T
    assert np.allclose(proj, expd, atol=1e-6)

    # partition invariance: different block structure, same model
    model2 = pca_fit(ray.data.from_arrow(t).repartition(11), k=3)
    assert np.allclose(model["components"], model2["components"], atol=1e-9)
