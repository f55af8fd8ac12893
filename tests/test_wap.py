"""Write-audit-publish staged commits (cdc/wap.py): staged replays are
invisible until publish, publish is atomic + conflict-checked +
crash-rerunnable, abort leaves the lake untouched — in BOTH commit
modes, with prior-state merge and schema evolution flowing through."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datavec_ray.cdc import (CdcIngestEngine, StageConflictError,
                             replay_oracle, synth_binlog)
from datavec_ray.cdc.binlog import split_segments


@pytest.fixture(scope="module")
def binlog():
    return synth_binlog(5000, seed=33)


@pytest.fixture(scope="module")
def oracle(binlog):
    return replay_oracle(binlog)


@pytest.mark.parametrize("mode", ["rewrite", "delta"])
def test_stage_publish_equals_direct_replay(ray_session, binlog, oracle,
                                            tmp_path, mode):
    lake = str(tmp_path / f"lake_{mode}")
    eng = CdcIngestEngine(lake, num_partitions=4, commit_mode=mode)
    seg1, seg2 = split_segments(binlog, 2)
    eng.replay(seg1, checkpoint_name="v1")
    base_state = eng.read_lake()

    st = eng.stage("nightly")
    st.replay(seg2)
    # staged rows are INVISIBLE to lake readers until publish
    assert eng.read_lake().equals(base_state)
    # ...but visible through the stage's own view
    staged = st.read_staged().count()
    assert staged >= base_state.num_rows
    entry = st.publish()
    assert entry["type"] == "publish" and entry["files"] >= 1
    assert eng.read_lake().equals(oracle)
    # manifest carries the staged checkpoint + the publish marker
    types = [e.get("type") for e in eng.manifest.entries]
    assert "publish" in types
    assert eng.manifest.watermark() == int(pc.max(binlog["lsn"]).as_py())
    # staging dir is gone
    assert not os.path.isdir(os.path.join(lake, "_stage_nightly"))
    eng.shutdown()


def test_audit_gate_and_abort(ray_session, binlog, tmp_path):
    lake = str(tmp_path / "lake")
    eng = CdcIngestEngine(lake, num_partitions=4)
    seg1, seg2 = split_segments(binlog, 2)
    eng.replay(seg1, checkpoint_name="v1")
    before = eng.read_lake()

    st = eng.stage("bad")
    # corrupt the payload: every staged turn_idx negative
    poisoned = seg2.set_column(
        seg2.schema.get_field_index("turn_idx"), "turn_idx",
        pc.multiply(seg2["turn_idx"], pa.scalar(-1, pa.int32())))
    st.replay(poisoned)
    report = st.audit([{"column": "turn_idx", "check": "min_ge", "value": 0}])
    assert st.audit_passed is False
    assert report.num_rows == 1
    with pytest.raises(RuntimeError, match="audit"):
        st.publish(require_audit=True)
    st.abort()
    # the live lake never saw the poisoned rows
    assert eng.read_lake().equals(before)
    assert not any(e.get("type") == "publish" for e in eng.manifest.entries)
    assert not os.path.isdir(os.path.join(lake, "_stage_bad"))
    # a clean stage over the SAME data publishes fine afterwards
    st2 = eng.stage("good")
    st2.replay(seg2)
    assert st2.audit([{"column": "turn_idx", "check": "min_ge",
                       "value": 0}]).num_rows == 1
    assert st2.audit_passed is True
    st2.publish(require_audit=True)
    assert eng.read_lake().equals(replay_oracle(binlog))
    eng.shutdown()


def test_publish_conflict_detection(ray_session, binlog, tmp_path):
    lake = str(tmp_path / "lake")
    eng = CdcIngestEngine(lake, num_partitions=4)
    seg1, seg2, seg3 = split_segments(binlog, 3)
    eng.replay(seg1, checkpoint_name="v1")
    st = eng.stage("concurrent")
    st.replay(seg2)
    # the parent advances while the stage is open
    eng.replay(seg3, checkpoint_name="v2")
    with pytest.raises(StageConflictError):
        st.publish()
    st.abort()
    eng.shutdown()


def test_publish_rerun_after_simulated_crash(ray_session, binlog, oracle,
                                             tmp_path):
    """Crash between the manifest publish entry and staging cleanup:
    re-opening the stage and calling publish() again only cleans up."""
    lake = str(tmp_path / "lake")
    eng = CdcIngestEngine(lake, num_partitions=4)
    seg1, seg2 = split_segments(binlog, 2)
    eng.replay(seg1, checkpoint_name="v1")
    st = eng.stage("crashy")
    st.replay(seg2)
    real_cleanup = st._cleanup
    st._cleanup = lambda: None          # crash before cleanup
    entry = st.publish()
    st._cleanup = real_cleanup
    assert os.path.isdir(st.dir)        # staging dir survived the "crash"
    # a fresh process re-opens the stage and re-runs publish
    st2 = eng.stage("crashy")
    entry2 = st2.publish()
    assert entry2 == entry              # found the durable publish entry
    assert not os.path.isdir(st2.dir)
    assert eng.read_lake().equals(oracle)
    # exactly one publish entry in the manifest
    assert sum(1 for e in eng.manifest.entries
               if e.get("type") == "publish") == 1
    eng.shutdown()


def test_staged_schema_evolution_flows_to_parent(ray_session, tmp_path):
    lake = str(tmp_path / "lake")
    eng = CdcIngestEngine(lake, num_partitions=2)
    base = synth_binlog(800, seed=7)
    no_tool = base.drop_columns(["tool"])
    eng.replay(no_tool, checkpoint_name="v1")
    v1 = eng.read_lake()
    # lake contract: tool exists but is entirely null-backfilled
    assert v1["tool"].null_count == v1.num_rows
    more = synth_binlog(800, seed=8)
    more = more.set_column(
        more.schema.get_field_index("lsn"), "lsn",
        pc.add(more["lsn"], pa.scalar(10_000, pa.int64())))
    st = eng.stage("evolve")
    st.replay(more)                      # carries real tool values
    st.publish()
    final = eng.read_lake()
    assert final["tool"].null_count < final.num_rows  # published values
    assert final.num_rows > v1.num_rows
    eng.shutdown()


def test_multi_segment_stage_and_metrics(ray_session, binlog, oracle,
                                         tmp_path):
    lake = str(tmp_path / "lake")
    eng = CdcIngestEngine(lake, num_partitions=4)
    segs = split_segments(binlog, 4)
    eng.replay(segs[0], checkpoint_name="v1")
    st = eng.stage("multi")
    st.replay(segs[1], checkpoint_name="m1")
    st.replay(segs[2], checkpoint_name="m2")
    st.replay(segs[3], checkpoint_name="m3")
    st.publish()
    assert eng.read_lake().equals(oracle)
    # staged commits are visible in the ops rollup
    m = eng.metrics()
    assert m["checkpoints"] >= 4 and m["watermark"] == \
        int(pc.max(binlog["lsn"]).as_py())
    eng.shutdown()


def test_vacuum_drops_abandoned_stage(ray_session, binlog, tmp_path):
    lake = str(tmp_path / "lake")
    eng = CdcIngestEngine(lake, num_partitions=4)
    seg1, seg2 = split_segments(binlog, 2)
    eng.replay(seg1, checkpoint_name="v1")
    st = eng.stage("orphan")
    st.replay(seg2)
    # producer "crashes" here — neither publish nor abort
    before = eng.read_lake()
    res = eng.vacuum(drop_stages=True)
    assert res["stages_removed"] == ["orphan"]
    assert not os.path.isdir(os.path.join(lake, "_stage_orphan"))
    assert eng.read_lake().equals(before)   # live lake untouched
    eng.shutdown()
