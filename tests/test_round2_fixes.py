"""Regression tests for the round-1 review findings (ADVICE.md):

1. broadcast join renames colliding non-key right columns to '_r'
2. JoinStep resolves a callable right side exactly once
3. CDC commit() re-flushes partitions whose lsn_hi advanced since the
   last commit (ingest -> commit -> ingest -> commit is not a no-op)
4. sequence partition fast path fills ONLY edge positions, leaving
   genuine null data values null (parity with the per-group path)
5. tumbling windows with sub-second window_ms work on ms columns and
   raise clearly on second-resolution columns
"""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datavec_ray.cdc import CdcIngestEngine, replay_oracle, synth_binlog
from datavec_ray.cdc.binlog import split_segments
from datavec_ray.join import JoinStep
from datavec_ray.sequence import (GroupedSequence, SequenceDifference,
                                  SequenceOffset, TumblingTimeWindowReduce)
from datavec_ray.util import dataset_to_table


# -- 1. broadcast join collision suffix --------------------------------------

def test_broadcast_join_collision_suffix(ray_session):
    import ray.data as rd
    left = pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    right = pa.table({"k": [1, 2], "v": ["x", "y"], "extra": [10, 20]})
    step = JoinStep(right, keys=["k"], join_type="Inner", broadcast=True)
    out = dataset_to_table(step.apply_dataset(rd.from_arrow(left))).sort_by("k")
    assert out.column_names.count("v") == 1
    assert "v_r" in out.column_names
    assert out["v"].to_pylist() == ["a", "b"]
    assert out["v_r"].to_pylist() == ["x", "y"]
    # shuffle path and local path must agree on the schema contract
    shuffle = JoinStep(right, keys=["k"], join_type="Inner", broadcast=False,
                       num_partitions=2)
    out2 = dataset_to_table(shuffle.apply_dataset(rd.from_arrow(left))).sort_by("k")
    assert sorted(out2.column_names) == sorted(out.column_names)
    local = step.apply_local(left).sort_by("k")
    assert sorted(local.column_names) == sorted(out.column_names)


# -- 2. right side resolved once ---------------------------------------------

def test_join_right_callable_resolved_once(ray_session):
    import ray.data as rd
    calls = {"n": 0}

    def make_right():
        calls["n"] += 1
        return pa.table({"k": [1, 2], "w": [10.0, 20.0]})

    step = JoinStep(make_right, keys=["k"])  # auto-broadcast decides via count
    left = pa.table({"k": [1, 2, 3], "v": [7, 8, 9]})
    dataset_to_table(step.apply_dataset(rd.from_arrow(left)))
    assert calls["n"] == 1


# -- 3. commit freshness ------------------------------------------------------

def test_commit_reflushes_after_new_ingest(ray_session, tmp_path):
    binlog = synth_binlog(3000, seed=11)
    seg1, seg2 = split_segments(binlog, 2)
    eng = CdcIngestEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.ingest(seg1)
    eng.commit()
    mid = eng.read_lake()
    eng.ingest(seg2)
    lineages = eng.commit()  # must NOT be a silent no-op
    assert lineages, "second commit skipped every partition"
    final = eng.read_lake()
    assert final.equals(replay_oracle(binlog))
    assert not final.equals(mid)
    # third commit with no new data IS a no-op (idempotent)
    assert eng.commit() == []
    eng.shutdown()


# -- 4. null-preserving sequence fast path ------------------------------------

def _null_seq_table():
    return pa.table({
        "key": ["a"] * 4 + ["b"] * 3,
        "t": pa.array([0, 1, 2, 3, 0, 1, 2], pa.int64()),
        "x": pa.array([1, None, 3, 4, 10, 20, None], pa.int64()),
    })


def test_offset_fast_path_keeps_shifted_nulls(ray_session):
    import ray.data as rd
    tbl = _null_seq_table()
    step = GroupedSequence(["key"], ["t"], [
        SequenceOffset(["x"], 1, mode="NewColumn", edge="SpecifiedValue",
                       value=-1)])
    ray_out = dataset_to_table(step.apply_dataset(rd.from_arrow(tbl))) \
        .sort_by([("key", "ascending"), ("t", "ascending")])
    local_out = step.apply_local(tbl) \
        .sort_by([("key", "ascending"), ("t", "ascending")])
    # edge fill -1 at each sequence start; the null at a/t=1 SHIFTS to
    # a/t=2 and must stay null in both paths
    assert local_out["x_offset1"].to_pylist() == [-1, 1, None, 3, -1, 10, 20]
    assert ray_out["x_offset1"].to_pylist() == local_out["x_offset1"].to_pylist()


def test_difference_fast_path_keeps_null_diffs(ray_session):
    import ray.data as rd
    tbl = _null_seq_table()
    step = GroupedSequence(["key"], ["t"], [
        SequenceDifference("x", lookback=1, first_mode="SpecifiedValue",
                           value=0, new_column="dx")])
    ray_out = dataset_to_table(step.apply_dataset(rd.from_arrow(tbl))) \
        .sort_by([("key", "ascending"), ("t", "ascending")])
    local_out = step.apply_local(tbl) \
        .sort_by([("key", "ascending"), ("t", "ascending")])
    # diffs touching a null operand are null; only the first step gets 0
    assert local_out["dx"].to_pylist() == [0, None, None, 1, 0, 10, None]
    assert ray_out["dx"].to_pylist() == local_out["dx"].to_pylist()


# -- 5. sub-second tumbling windows -------------------------------------------

def test_tumbling_subsecond_window_on_ms():
    tbl = pa.table({
        "key": ["a"] * 5,
        "ts": pa.array([0, 400, 900, 1300, 1800], pa.timestamp("ms")),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
    })
    step = GroupedSequence(["key"], ["ts"], [
        TumblingTimeWindowReduce(["key"], "ts", 500, [["v", "Sum", "s"]],
                                 emit_window_bounds=False)])
    out = step.apply_local(tbl).sort_by("window_start")
    assert out["window_start"].cast(pa.int64()).to_pylist() == [0, 500, 1000, 1500]
    assert out["s"].to_pylist() == [3.0, 3.0, 4.0, 5.0]


def test_tumbling_subsecond_window_on_seconds_raises():
    tbl = pa.table({
        "key": ["a", "a"],
        "ts": pa.array([0, 3], pa.timestamp("s")),
        "v": pa.array([1.0, 2.0]),
    })
    step = GroupedSequence(["key"], ["ts"], [
        TumblingTimeWindowReduce(["key"], "ts", 500, [["v", "Sum", "s"]])])
    with pytest.raises(ValueError, match="second"):
        step.apply_local(tbl)
