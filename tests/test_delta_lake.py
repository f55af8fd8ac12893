"""Delta (LSM merge-on-read) commit mode: replay writes per-commit
delta segments instead of rewriting full partition files; readers
merge-on-read; compact() folds deltas into the base. Semantics must be
IDENTICAL to rewrite mode — same oracle, same time travel, same
exactly-once resume."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datavec_ray.cdc import CdcIngestEngine, replay_oracle, synth_binlog
from datavec_ray.cdc.binlog import split_segments


@pytest.fixture(scope="module")
def binlog():
    return synth_binlog(6000, seed=21)


@pytest.fixture(scope="module")
def oracle(binlog):
    return replay_oracle(binlog)


def _lake_files(lake):
    return sorted(f for f in os.listdir(lake) if f.endswith(".parquet"))


def test_delta_replay_matches_oracle_and_writes_deltas(
        ray_session, binlog, oracle, tmp_path):
    lake = str(tmp_path / "lake")
    eng = CdcIngestEngine(lake, num_partitions=4, commit_mode="delta")
    segs = split_segments(binlog, 3)
    lin1 = eng.replay(segs[0], checkpoint_name="v1")
    files1 = _lake_files(lake)
    assert files1 and all(".base." in f for f in files1)  # bootstrap
    lin2 = eng.replay(segs[1], checkpoint_name="v2")
    lin3 = eng.replay(segs[2], checkpoint_name="v3")
    files3 = _lake_files(lake)
    assert sum(".delta-" in f for f in files3) >= 4  # per-commit deltas
    # write amplification: a delta commit ships only CHANGED winners
    state_rows = sum(l["rows"] for l in lin3)
    delta_rows = sum(l["delta_rows"] for l in lin2 + lin3)
    assert all(l["delta_rows"] <= l["events_applied"] for l in lin2 + lin3)
    assert delta_rows < 2 * state_rows  # far below two full rewrites
    assert eng.read_lake().equals(oracle)
    eng.shutdown()


def test_delta_matches_rewrite_mode_exactly(ray_session, binlog, tmp_path):
    segs = split_segments(binlog, 2)
    lakes = {}
    for mode in ("rewrite", "delta"):
        eng = CdcIngestEngine(str(tmp_path / mode), num_partitions=4,
                              commit_mode=mode)
        eng.replay(segs[0], checkpoint_name="a")
        eng.replay(segs[1], checkpoint_name="b")
        lakes[mode] = eng.read_lake()
        eng.shutdown()
    assert lakes["delta"].equals(lakes["rewrite"])


def test_compact_preserves_state(ray_session, binlog, oracle, tmp_path):
    lake = str(tmp_path / "lake")
    eng = CdcIngestEngine(lake, num_partitions=4, commit_mode="delta")
    for i, seg in enumerate(split_segments(binlog, 4)):
        eng.replay(seg, checkpoint_name=f"v{i}")
    assert sum(".delta-" in f for f in _lake_files(lake)) >= 8
    results = eng.compact()
    assert results and all(r["segments_merged"] >= 2 for r in results)
    files = _lake_files(lake)
    assert all(".base." in f for f in files)          # deltas folded
    assert len(files) == 4                            # one per partition
    assert eng.read_lake().equals(oracle)
    # manifest records the compaction
    assert any(e.get("type") == "compact" for e in eng.manifest.entries)
    # point lookups still work post-compaction
    some = oracle["conv_id"].to_pylist()[:3]
    hit = eng.lookup(some)
    exp = oracle.filter(pc.is_in(oracle["conv_id"], pa.array(set(some))))
    assert hit.equals(exp)
    eng.shutdown()


def test_replay_after_compact_and_crash_resume(ray_session, binlog,
                                               oracle, tmp_path):
    """Compaction between replays + a crash/reopen + duplicate delivery:
    exactly-once state must survive all three."""
    lake = str(tmp_path / "lake")
    segs = split_segments(binlog, 3)
    eng = CdcIngestEngine(lake, num_partitions=4, commit_mode="delta")
    eng.replay(segs[0], checkpoint_name="v1")
    eng.replay(segs[1], checkpoint_name="v2")
    eng.compact()
    del eng  # crash
    eng2 = CdcIngestEngine(lake, num_partitions=4, commit_mode="delta")
    # at-least-once delivery: seg2 replayed with overlap of seg1+2
    eng2.replay(pa.concat_tables([segs[1], segs[2]]), checkpoint_name="v3")
    assert eng2.read_lake().equals(oracle)
    eng2.shutdown()


def test_delta_lookup_and_dataset_read(ray_session, binlog, oracle,
                                       tmp_path):
    from datavec_ray.util import dataset_to_table
    lake = str(tmp_path / "lake")
    eng = CdcIngestEngine(lake, num_partitions=4, commit_mode="delta")
    for i, seg in enumerate(split_segments(binlog, 2)):
        eng.replay(seg, checkpoint_name=f"v{i}")
    ds = eng.read_lake_dataset()
    out = dataset_to_table(ds).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert out.equals(oracle)
    some = sorted(set(oracle["conv_id"].to_pylist()))[:5]
    hit = eng.lookup(some)
    exp = oracle.filter(pc.is_in(oracle["conv_id"], pa.array(set(some))))
    assert hit.equals(exp)
    eng.shutdown()


def test_tombstone_survives_compaction_for_late_events(ray_session,
                                                       tmp_path):
    """A deleted key must NOT be resurrected by a LATE (older-ts) event
    arriving after a compaction. Compaction retains tombstones exactly
    because the NEXT checkpoint hardlinks the compacted base — dropping
    them there would erase them from the checkpoint chain and let the
    stale event win (a real bug the auto-compaction test caught)."""
    lake = str(tmp_path / "lake")

    def bl(lsns, ops, ts, texts):
        n = len(lsns)
        return pa.table({
            "lsn": pa.array(lsns, pa.int64()),
            "op": pa.array(ops, pa.string()),
            "conv_id": pa.array(["c"] * n, pa.string()),
            "turn_idx": pa.array([0] * n, pa.int32()),
            "role": pa.array(["user"] * n, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array(ts, pa.timestamp("ms")),
        })

    eng = CdcIngestEngine(lake, num_partitions=2, commit_mode="delta")
    eng.replay(bl([1], ["I"], [100], ["hello"]), checkpoint_name="v1")
    eng.replay(bl([2], ["D"], [500], [None]), checkpoint_name="v2")
    eng.compact()
    assert eng.read_lake().num_rows == 0
    # late event: ts BEFORE the delete; must lose LWW
    eng.replay(bl([3], ["U"], [200], ["zombie"]),
               checkpoint_name="v3", min_lsn_exclusive=2)
    assert eng.read_lake().num_rows == 0
    eng.shutdown()


def test_time_travel_and_change_feed_in_delta_mode(ray_session, binlog,
                                                   tmp_path):
    lake = str(tmp_path / "lake")
    segs = split_segments(binlog, 2)
    eng = CdcIngestEngine(lake, num_partitions=4, commit_mode="delta")
    eng.replay(segs[0], checkpoint_name="v1")
    eng.replay(segs[1], checkpoint_name="v2")
    tt = eng.time_travel()
    from datavec_ray.util import dataset_to_table
    v1 = dataset_to_table(tt.read_state_at("v1")).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    exp1 = replay_oracle(segs[0])
    assert v1.rename_columns(exp1.column_names).cast(
        exp1.schema).equals(exp1)
    feed = dataset_to_table(tt.change_feed("v1", "v2"))
    assert feed.num_rows > 0
    assert set(feed["change_type"].to_pylist()) <= {
        "insert", "update", "delete"}
    eng.shutdown()


def test_ingest_path_refuses_delta_mode(ray_session, binlog, tmp_path):
    eng = CdcIngestEngine(str(tmp_path / "lake"), num_partitions=2,
                          commit_mode="delta")
    with pytest.raises(NotImplementedError):
        eng.ingest(binlog)
    eng.shutdown()


def test_rewrite_lake_migrates_to_delta(ray_session, binlog, oracle,
                                        tmp_path):
    """Opening an existing rewrite-mode lake with commit_mode='delta'
    bootstraps each touched partition into a base segment."""
    lake = str(tmp_path / "lake")
    segs = split_segments(binlog, 2)
    eng = CdcIngestEngine(lake, num_partitions=4)
    eng.replay(segs[0], checkpoint_name="v1")
    eng.shutdown(gc_spill=False)
    eng2 = CdcIngestEngine(lake, num_partitions=4, commit_mode="delta")
    eng2.replay(segs[1], checkpoint_name="v2")
    files = _lake_files(lake)
    assert all(".base." in f or ".delta-" in f for f in files)
    assert eng2.read_lake().equals(oracle)
    eng2.shutdown()


def test_tail_wal_in_delta_mode(ray_session, binlog, oracle, tmp_path):
    """WAL tailing — the frequent-small-commit pattern LSM mode is FOR:
    each segment lands as deltas, state matches the oracle, and a
    restarted tailer skips finished segments."""
    import pyarrow.parquet as pq

    wal = tmp_path / "wal"
    wal.mkdir()
    for i, seg in enumerate(split_segments(binlog, 4)):
        pq.write_table(seg, str(wal / f"seg-{i:03d}.parquet"))
    lake = str(tmp_path / "lake")
    eng = CdcIngestEngine(lake, num_partitions=4, commit_mode="delta")
    stats = eng.tail(str(wal), poll_interval=0.05, idle_rounds=2)
    assert stats["segments"] == 4
    assert stats["watermark"] == int(pc.max(binlog["lsn"]).as_py())
    assert any(".delta-" in f for f in _lake_files(lake))
    assert eng.read_lake().equals(oracle)
    del eng  # crash; a fresh tailer must re-ingest nothing
    eng2 = CdcIngestEngine(lake, num_partitions=4, commit_mode="delta")
    stats2 = eng2.tail(str(wal), poll_interval=0.05, idle_rounds=2)
    assert stats2["segments"] == 0
    assert eng2.read_lake().equals(oracle)
    eng2.shutdown()


def test_auto_compaction_caps_segments(ray_session, binlog, oracle,
                                       tmp_path):
    lake = str(tmp_path / "lake")
    eng = CdcIngestEngine(lake, num_partitions=4, commit_mode="delta",
                          auto_compact_segments=3)
    for i, seg in enumerate(split_segments(binlog, 6)):
        eng.replay(seg, checkpoint_name=f"v{i}")
        for pid in range(4):
            from datavec_ray.cdc.engine import _delta_segment_files
            assert len(_delta_segment_files(lake, pid)) < 3 + 1
    assert any(e.get("type") == "compact" for e in eng.manifest.entries)
    assert eng.read_lake().equals(oracle)
    eng.shutdown()


def test_delete_where_in_delta_mode(ray_session, binlog, oracle, tmp_path):
    """GDPR-style predicate erasure over a delta lake: the predicate
    must evaluate against the MERGED live state (raw delta segments
    hold superseded payload versions that must not match), and the
    tombstones land as ordinary delta commits visible to time travel."""
    lake = str(tmp_path / "lake")
    eng = CdcIngestEngine(lake, num_partitions=4, commit_mode="delta")
    for i, seg in enumerate(split_segments(binlog, 3)):
        eng.replay(seg, checkpoint_name=f"v{i}")
    victims = sorted(set(oracle["conv_id"].to_pylist()))[:3]

    def pred(t):
        return pc.is_in(t["conv_id"], pa.array(set(victims)))

    n_victim_rows = oracle.filter(
        pc.is_in(oracle["conv_id"], pa.array(set(victims)))).num_rows
    res = eng.delete_where(pred, checkpoint_name="gdpr")
    assert res["deleted"] == n_victim_rows
    got = eng.read_lake()
    exp = oracle.filter(pc.invert(
        pc.is_in(oracle["conv_id"], pa.array(set(victims)))))
    assert got.equals(exp)
    # erasure is idempotent on the live state
    assert eng.delete_where(pred, checkpoint_name="gdpr2")["deleted"] == 0
    eng.shutdown()
