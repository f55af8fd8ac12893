"""CDC engine tests: replay equality vs the single-process oracle, under
clean replay / crash+resume / schema evolution / salting / two
parallelism levels (FIXTURES.md §5 conventions)."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datavec_ray.cdc import (CdcIngestEngine, lww_compact_dataset, replay_oracle,
                             synth_binlog)
from datavec_ray.cdc.binlog import binlog_from_events, split_segments, strip_tool_column
from datavec_ray.cdc.engine import assign_partitions, lww_compact_table
from datavec_ray.util import dataset_to_table


@pytest.fixture(scope="module")
def binlog():
    return synth_binlog(8000, seed=7)


@pytest.fixture(scope="module")
def oracle(binlog):
    return replay_oracle(binlog)


def test_binlog_properties(binlog):
    ops, counts = np.unique(binlog["op"].to_numpy(zero_copy_only=False),
                            return_counts=True)
    mix = dict(zip(ops, counts))
    assert mix["I"] > mix["U"] > mix["D"] > 0
    lsn = binlog["lsn"].to_numpy(zero_copy_only=False)
    assert (np.diff(lsn) > 0).all()  # strictly monotonic unique
    # updates/deletes reference existing keys
    keys = set(zip(binlog["conv_id"].to_pylist(), binlog["turn_idx"].to_pylist()))
    ins = binlog.filter(pc.equal(binlog["op"], "I"))
    ikeys = set(zip(ins["conv_id"].to_pylist(), ins["turn_idx"].to_pylist()))
    assert keys == ikeys


def test_lww_compact_table_is_orderless(binlog):
    key = [("conv_id", "ascending"), ("turn_idx", "ascending")]
    fwd = lww_compact_table(binlog, drop_tombstones=True).sort_by(key)
    perm = binlog.take(pa.array(np.random.default_rng(0).permutation(binlog.num_rows)))
    bwd = lww_compact_table(perm, drop_tombstones=True).sort_by(key)
    assert fwd.equals(bwd)


def test_dataset_compaction_matches_oracle(ray_session, binlog, oracle):
    import ray.data as rd
    out = dataset_to_table(
        lww_compact_dataset(rd.from_arrow(binlog).repartition(6), 8))
    out = out.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert out.equals(oracle)


def test_engine_clean_replay(ray_session, binlog, oracle, tmp_path):
    eng = CdcIngestEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.ingest(binlog)
    lineages = eng.commit()
    assert sum(l["rows"] for l in lineages) == oracle.num_rows
    assert all("lsn_hi" in l and "stale_dropped" in l for l in lineages)
    assert eng.read_lake().equals(oracle)


def test_engine_crash_resume(ray_session, binlog, oracle, tmp_path):
    lake = str(tmp_path / "lake2")
    segs = split_segments(binlog, 4)
    eng = CdcIngestEngine(lake, num_partitions=4)
    for i, seg in enumerate(segs[:2]):
        eng.ingest(seg)
        eng.checkpoint(f"seg{i}", pc.max(seg["lsn"]).as_py())
    # crash: drop the engine (actor state lost), start a fresh one
    del eng
    eng2 = CdcIngestEngine(lake, num_partitions=4)
    wm = eng2.resume_from_checkpoint()
    assert wm == pc.max(segs[1]["lsn"]).as_py()
    for seg in segs:  # at-least-once replay of everything; watermark filters
        eng2.ingest(seg, min_lsn_exclusive=wm)
    eng2.commit()
    assert eng2.read_lake().equals(oracle)


def test_engine_idempotent_double_apply(ray_session, binlog, oracle, tmp_path):
    """Duplicate delivery (retry semantics) must not change the result."""
    eng = CdcIngestEngine(str(tmp_path / "lake3"), num_partitions=4)
    eng.ingest(binlog)
    eng.ingest(binlog)  # apply everything twice
    eng.commit()
    assert eng.read_lake().equals(oracle)


def test_engine_schema_evolution(ray_session, binlog, tmp_path):
    seg1, seg2 = split_segments(binlog, 2)
    seg1s = strip_tool_column(seg1)
    i = seg2.schema.get_field_index("turn_idx")
    seg2w = seg2.set_column(i, pa.field("turn_idx", pa.int64()),
                            seg2["turn_idx"].cast(pa.int64()))
    eng = CdcIngestEngine(str(tmp_path / "lake4"), num_partitions=4)
    eng.ingest(seg1s)
    eng.ingest(seg2w)
    eng.commit()
    out = eng.read_lake()
    assert pa.types.is_int64(out.schema.field("turn_idx").type)  # widened
    # oracle: seg1 events have null tool
    j = seg1.schema.get_field_index("tool")
    seg1n = seg1.set_column(j, pa.field("tool", pa.string()),
                            pa.nulls(seg1.num_rows, pa.string()))
    exp = replay_oracle(pa.concat_tables([seg1n, seg2]))
    out32 = out.set_column(out.schema.get_field_index("turn_idx"),
                           pa.field("turn_idx", pa.int32()),
                           out["turn_idx"].cast(pa.int32()))
    assert out32.equals(exp)


def test_salting_preserves_key_ownership(ray_session, binlog, oracle, tmp_path):
    hot = [f"conv-{i:08d}" for i in range(4)]
    eng = CdcIngestEngine(str(tmp_path / "lake5"), num_partitions=4,
                          salt_turns=3, hot_convs=hot)
    eng.ingest(binlog)
    eng.commit()
    assert eng.read_lake().equals(oracle)
    # same (conv, turn) key always maps to the same partition
    conv = pa.array(["conv-00000001"] * 2)
    turn = pa.array([5, 5], pa.int32())
    p = assign_partitions(conv, turn, 4, 3, frozenset(hot))
    assert p[0] == p[1]
    # different turns of a hot conversation may land on different partitions
    turns = pa.array(list(range(30)), pa.int32())
    convs = pa.array(["conv-00000001"] * 30)
    ps = assign_partitions(convs, turns, 4, 3, frozenset(hot))
    assert len(set(ps.tolist())) > 1


def test_two_parallelism_levels_identical(ray_session, binlog, oracle):
    """Determinism check: identical output regardless of partitioning."""
    import ray.data as rd
    a = dataset_to_table(lww_compact_dataset(rd.from_arrow(binlog).repartition(2), 4))
    b = dataset_to_table(lww_compact_dataset(rd.from_arrow(binlog).repartition(13), 32))
    key = [("conv_id", "ascending"), ("turn_idx", "ascending")]
    assert a.sort_by(key).equals(b.sort_by(key))


def test_binlog_from_events_deterministic():
    import pyarrow.parquet as pq
    ev = pq.read_table("/root/testdata/sf0.001/events.parquet")
    a = binlog_from_events(ev)
    b = binlog_from_events(ev)
    assert a.equals(b)
    assert a.column_names == ["lsn", "op", "conv_id", "turn_idx", "role",
                              "text", "tool", "ts"]


def test_detect_hot_convs(ray_session, binlog):
    import ray.data as rd
    from datavec_ray.cdc.engine import detect_hot_convs
    hot = detect_hot_convs(rd.from_arrow(binlog), sample_frac=0.3,
                           hot_multiple=5)
    # zipf-ish conversation sizes guarantee some hot conversations
    assert len(hot) >= 1
    # detected convs really are heavy: each has more events than average
    counts = binlog.group_by("conv_id").aggregate([("conv_id", "count")])
    import pyarrow.compute as pc
    mean = binlog.num_rows / counts.num_rows
    lookup = dict(zip(counts["conv_id"].to_pylist(),
                      counts["conv_id_count"].to_pylist()))
    assert all(lookup[c] > mean for c in hot)


def test_wal_tail(ray_session, tmp_path):
    """Tail mode: segments appearing over time are ingested incrementally;
    a restarted tail skips completed segments via the manifest."""
    import threading
    import time as _time

    import pyarrow.parquet as pq

    bl = synth_binlog(6000, seed=3)
    segs = split_segments(bl, 3)
    wal = tmp_path / "wal"
    wal.mkdir()

    def writer():
        for i, seg in enumerate(segs):
            # segments must appear atomically (tail's contract)
            tmp = str(wal / f"seg-{i:04d}.tmp")
            pq.write_table(seg, tmp)
            os.replace(tmp, str(wal / f"seg-{i:04d}.parquet"))
            _time.sleep(0.4)

    t = threading.Thread(target=writer)
    t.start()
    eng = CdcIngestEngine(str(tmp_path / "lake"), num_partitions=4)
    stats = eng.tail(str(wal), poll_interval=0.2, idle_rounds=15)
    t.join()
    assert stats["segments"] == 3
    eng.commit()
    assert eng.read_lake().equals(replay_oracle(bl))
    # restart: nothing new to do, watermark preserved
    eng2 = CdcIngestEngine(str(tmp_path / "lake"), num_partitions=4)
    stats2 = eng2.tail(str(wal), poll_interval=0.1, idle_rounds=2)
    assert stats2["segments"] == 0
    assert stats2["watermark"] == stats["watermark"]


# -- batch replay fast path (round 2) -----------------------------------------

def test_replay_clean_matches_oracle(ray_session, binlog, oracle, tmp_path):
    eng = CdcIngestEngine(str(tmp_path / "rlake"), num_partitions=4)
    lineages = eng.replay(binlog)
    assert sum(l["rows"] for l in lineages) == oracle.num_rows
    assert eng.read_lake().equals(oracle)
    # shard actors were never created (replay is actor-free)
    assert eng._shards is None
    eng.shutdown()


def test_replay_incremental_merges_prior_state(ray_session, binlog, oracle,
                                               tmp_path):
    segs = split_segments(binlog, 3)
    eng = CdcIngestEngine(str(tmp_path / "rlake2"), num_partitions=4)
    for i, seg in enumerate(segs):
        eng.replay(seg, checkpoint_name=f"seg{i}")
    assert eng.read_lake().equals(oracle)
    eng.shutdown()


def test_replay_crash_rerun_idempotent(ray_session, binlog, oracle, tmp_path):
    """Re-running replay over already-applied segments (at-least-once
    delivery after a crash) must not change the lake or duplicate
    manifest commits."""
    segs = split_segments(binlog, 2)
    eng = CdcIngestEngine(str(tmp_path / "rlake3"), num_partitions=4)
    eng.replay(segs[0], checkpoint_name="a")
    n_commits = len([e for e in eng.manifest.entries if e["type"] == "commit"])
    # crash: new engine over the same lake; replay EVERYTHING again
    del eng
    eng2 = CdcIngestEngine(str(tmp_path / "rlake3"), num_partitions=4)
    eng2.replay(pa.concat_tables(segs), checkpoint_name="b")
    assert eng2.read_lake().equals(oracle)
    # seg0-only partitions whose lsn_hi did not advance are not re-committed
    commits = [e for e in eng2.manifest.entries if e["type"] == "commit"]
    assert len(commits) >= n_commits
    eng2.shutdown()


def test_replay_quiet_partition_carries_state_forward(ray_session, tmp_path):
    """A segment with NO events for some partition must not drop that
    partition's state from the new checkpoint: seg1 populates all
    partitions, seg2 touches only one conversation, seg3 merges from
    seg2's checkpoint — earlier state must survive."""
    from datavec_ray.cdc import replay_oracle
    from datavec_ray.cdc.binlog import synth_binlog

    bl = synth_binlog(4000, num_convs=60, seed=11)
    # seg2/seg3: single-conversation updates (leave other partitions quiet)
    one = bl.slice(0, 1)
    mx = int(pc.max(bl["lsn"]).as_py())
    seg2 = one.set_column(one.schema.get_field_index("lsn"), "lsn",
                          pa.array([mx + 1], pa.int64()))
    seg3 = one.set_column(one.schema.get_field_index("lsn"), "lsn",
                          pa.array([mx + 2], pa.int64()))
    eng = CdcIngestEngine(str(tmp_path / "qlake"), num_partitions=8)
    eng.replay(bl, checkpoint_name="s1")
    eng.replay(seg2, checkpoint_name="s2")
    eng.replay(seg3, checkpoint_name="s3")
    expect = replay_oracle(pa.concat_tables([bl, seg2, seg3]))
    assert eng.read_lake().equals(expect)
    # every checkpoint is a complete state set
    ck = tmp_path / "qlake" / "_checkpoints" / "s3"
    sidecars = [p for p in ck.glob("part-*.parquet")
                if not p.name.endswith(".payload.parquet")]
    assert len(sidecars) == 8
    eng.shutdown()


def test_shard_spill_level(ray_session, binlog, oracle, tmp_path):
    """With a tiny spill threshold the shard actors push their compacted
    base to parquet runs; flush/snapshot must merge disk + memory and the
    committed lake must still match the oracle."""
    import ray
    eng = CdcIngestEngine(str(tmp_path / "slake"), num_partitions=4,
                          ingest_mode="router",
                          shard_spill_threshold_rows=500)
    segs = split_segments(binlog, 4)
    for s in segs:
        eng.ingest(s)
        # force compaction + spill check between segments
        import ray as _r
        _r.get([sh._compact.remote() for sh in eng.shards])
        _r.get([sh._maybe_spill.remote() for sh in eng.shards])
    stats = ray.get([s.stats.remote() for s in eng.shards])
    assert sum(st["spilled_rows"] for st in stats) > 0, stats
    assert any(st["spill_runs"] > 0 for st in stats)
    eng.commit()
    assert eng.read_lake().equals(oracle)
    eng.shutdown()


def test_replay_then_ingest_resume(ray_session, binlog, oracle, tmp_path):
    """replay() checkpoints are loadable by the incremental shard path."""
    segs = split_segments(binlog, 2)
    eng = CdcIngestEngine(str(tmp_path / "rlake4"), num_partitions=4)
    eng.replay(segs[0], checkpoint_name="bulk")
    wm = eng.resume_from_checkpoint()
    assert wm == pc.max(segs[0]["lsn"]).as_py()
    eng.ingest(segs[1], min_lsn_exclusive=wm)
    eng.commit()
    assert eng.read_lake().equals(oracle)
    eng.shutdown()


def test_dead_letter_queue(ray_session, tmp_path):
    """Malformed events (null keys, bad op, null ts) are dead-lettered
    with a reason instead of entering LWW state; the lake matches the
    oracle on the valid subset; re-running the same segment is
    idempotent (content-hash file names)."""
    import pyarrow.compute as pc

    from datavec_ray.cdc.engine import CdcIngestEngine
    from datavec_ray.cdc.oracle import replay_oracle

    good = synth_binlog(2000, seed=41)
    bad = pa.table({
        "lsn": pa.array([None, 990001, 990002, 990003], pa.int64()),
        "op": pa.array(["I", "X", "I", "I"], pa.string()),
        "conv_id": pa.array(["c-a", "c-b", None, "c-d"], pa.string()),
        "turn_idx": pa.array([1, 2, 3, 4],
                             good.schema.field("turn_idx").type),
        "role": pa.array(["user"] * 4, pa.string()),
        "text": pa.array(["x"] * 4, pa.string()),
        "tool": pa.array([None] * 4, pa.string()),
        "ts": pa.array([1000, 2000, 3000, None], pa.timestamp("ms")),
    }).cast(good.schema)
    seg = pa.concat_tables([good, bad]).combine_chunks()

    eng = CdcIngestEngine(str(tmp_path / "dlake"), num_partitions=4,
                          dlq=True)
    eng.replay(seg, checkpoint_name="v1")
    dlq = eng.read_dlq()
    assert dlq.num_rows == 4
    assert sorted(dlq["reason"].to_pylist()) == \
        ["bad_op", "null_conv_id", "null_lsn", "null_ts"]
    # lake equals the oracle of the VALID events only
    lake = eng.read_lake()
    expect = replay_oracle(good)
    assert lake.num_rows == expect.num_rows
    assert lake["conv_id"].to_pylist() == expect["conv_id"].to_pylist()
    assert eng.metrics()["dlq_rows"] == 4
    # idempotent rerun: same content-hashed files, no duplicates
    eng2 = CdcIngestEngine(str(tmp_path / "dlake"), num_partitions=4,
                           dlq=True)
    eng2.replay(seg, checkpoint_name="v1", min_lsn_exclusive=0)
    assert eng2.read_dlq().num_rows == 4
    eng.shutdown()
    eng2.shutdown()


# -- snapshot-then-stream bootstrap --------------------------------------------

def test_bootstrap_then_stream(ray_session, tmp_path):
    """bootstrap() seeds the lake from a plain transcript table; a
    subsequent WAL ingest wins ties via the LSN tiebreaker, and the
    final state equals a full-history replay oracle."""
    snap = pa.table({
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "role": ["user", "assistant", "user"],
        "text": ["hi", "hello!", "solo"],
        "tool": ["", "", ""],
        "ts": pa.array([1000, 2000, 1500], pa.timestamp("ms")),
    })
    eng = CdcIngestEngine(str(tmp_path / "blake"), num_partitions=4)
    lineage = eng.bootstrap(snap)
    assert sum(l["rows"] for l in lineage) == 3
    # stream: same-ts update to (c1,1) must WIN via lsn>base_lsn;
    # delete (c2,0); insert (c1,2)
    wal = pa.table({
        "lsn": pa.array([1, 2, 3], pa.int64()),
        "op": ["U", "D", "I"],
        "conv_id": ["c1", "c2", "c1"],
        "turn_idx": pa.array([1, 0, 2], pa.int32()),
        "role": ["assistant", "user", "user"],
        "text": ["hello — edited!", "", "bye"],
        "tool": ["", "", ""],
        "ts": pa.array([2000, 3000, 4000], pa.timestamp("ms")),
    })
    wm = eng.resume_from_checkpoint()     # hydrate shards (crash-resume contract)
    assert wm == 0                        # bootstrap watermark = base_lsn
    eng.ingest(wal, min_lsn_exclusive=wm)
    eng.commit()
    got = eng.read_lake()
    framed_snap = pa.table({
        "lsn": pa.array([0, 0, 0], pa.int64()),
        "op": ["I"] * 3,
        **{c: snap[c] for c in snap.column_names}})
    want = replay_oracle(pa.concat_tables([framed_snap, wal]))
    assert got.equals(want), (got.to_pydict(), want.to_pydict())
    eng.shutdown()


def test_writer_epoch_fencing(ray_session, tmp_path):
    """A newer engine open on the same lake fences the old one: the
    zombie's next commit raises, the new writer proceeds; sequential
    reopen (crash/resume) keeps working; fencing can be disabled."""
    from datavec_ray.cdc.engine import CdcIngestEngine, WriterFencedError

    binlog = synth_binlog(2000, seed=41)
    lake = str(tmp_path / "flake")
    a = CdcIngestEngine(lake, num_partitions=4)
    a.replay(binlog.slice(0, 1000), checkpoint_name="v1")

    b = CdcIngestEngine(lake, num_partitions=4)     # takes over: fences a
    assert b.writer_epoch > a.writer_epoch
    with pytest.raises(WriterFencedError):
        a.replay(binlog.slice(1000, 500), checkpoint_name="zombie")
    # the new writer commits fine and the lake equals the oracle
    b.replay(binlog.slice(1000, 1000), checkpoint_name="v2")
    got = b.read_lake().sort_by([("conv_id", "ascending"),
                                 ("turn_idx", "ascending")])
    exp = replay_oracle(binlog)
    assert got["text"].to_pylist() == exp["text"].to_pylist()
    # fencing off: a third engine does not take an epoch
    c = CdcIngestEngine(lake, num_partitions=4, fence_writer=False)
    assert c.manifest.max_epoch() == b.writer_epoch
    a.shutdown(); b.shutdown(); c.shutdown()


def test_delete_where_gdpr_erasure(ray_session, tmp_path):
    """Bulk predicate delete: tombstones flow through the normal
    exactly-once replay, survive in time travel, and the erased keys
    are gone from the live lake."""
    import pyarrow.compute as pc2

    from datavec_ray.cdc.engine import CdcIngestEngine

    binlog = synth_binlog(3000, seed=43)
    eng = CdcIngestEngine(str(tmp_path / "glake"), num_partitions=4)
    eng.replay(binlog, checkpoint_name="v1")
    before = eng.read_lake()
    victim = before["conv_id"].to_pylist()[0]

    res = eng.delete_where(
        lambda t: pc2.equal(t["conv_id"], victim), checkpoint_name="gdpr")
    n_victim = before.filter(pc2.equal(before["conv_id"], victim)).num_rows
    assert res["deleted"] == n_victim > 0

    after = eng.read_lake()
    assert after.filter(pc2.equal(after["conv_id"], victim)).num_rows == 0
    assert after.num_rows == before.num_rows - n_victim
    # everything else untouched
    keep = before.filter(pc2.not_equal(before["conv_id"], victim))
    a = after.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    k = keep.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert a["text"].to_pylist() == k["text"].to_pylist()
    # time travel still shows the pre-delete state at v1
    tt = eng.time_travel()
    v1 = dataset_to_table(tt.read_state_at("v1"))
    assert v1.filter(pc2.equal(v1["conv_id"], victim)).num_rows == n_victim
    # idempotent: deleting again matches nothing
    assert eng.delete_where(
        lambda t: pc2.equal(t["conv_id"], victim))["deleted"] == 0
    eng.shutdown()


def test_router_mode_dlq(ray_session, tmp_path):
    """Router-mode ingest (the <32-partition path) quarantines
    malformed events too — regression for the gap the cdc_dlq driver
    query exposed (DLQ was only wired into the shuffle/replay paths)."""
    binlog = synth_binlog(2000, seed=17)
    i = binlog.schema.get_field_index("conv_id")
    lsn = binlog["lsn"].to_numpy(zero_copy_only=False)
    bad_mask = (lsn % 53) == 0
    conv = binlog["conv_id"].to_pylist()
    conv = [None if b else c for c, b in zip(conv, bad_mask)]
    corrupted = binlog.set_column(i, pa.field("conv_id", pa.string()),
                                  pa.array(conv, pa.string()))
    eng = CdcIngestEngine(str(tmp_path / "rdlq"), num_partitions=4,
                          ingest_mode="router", dlq=True)
    try:
        eng.ingest(corrupted)
        eng.commit()
        assert eng.read_dlq().num_rows == int(bad_mask.sum())
        exp = replay_oracle(binlog.filter(pa.array(~bad_mask)))
        assert eng.read_lake().equals(exp)
    finally:
        eng.shutdown()


def test_scd2_history_versions(ray_session):
    """SCD2: versions chain by LSN per key; D closes without opening."""
    import ray
    from datavec_ray.cdc.binlog import scd2_history

    t = pa.table({
        "lsn": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "op": ["I", "U", "D", "I", "I"],
        "conv_id": ["c1", "c1", "c1", "c1", "c2"],
        "turn_idx": pa.array([0, 0, 0, 0, 0], pa.int32()),
        "text": ["a", "b", None, "c", "x"],
    })
    out = dataset_to_table(scd2_history(ray.data.from_arrow(t),
                                        keys=["conv_id", "turn_idx"])) \
        .sort_by([("conv_id", "ascending"), ("valid_from", "ascending")])
    assert out["valid_from"].to_pylist() == [1, 2, 4, 5]
    # v1 closed by v2, v2 closed by the DELETE at lsn 3, v4/v5 current
    assert out["valid_to"].to_pylist() == [2, 3, None, None]
    assert out["text"].to_pylist() == ["a", "b", "c", "x"]


def test_patch_upsert_partial_updates(ray_session):
    """Null payload columns in updates mean UNCHANGED; deletes reset."""
    import ray
    from datavec_ray.cdc.binlog import patch_upsert

    t = pa.table({
        "lsn": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "op": ["I", "U", "U", "D", "I", "U"],
        "conv_id": ["c1"] * 4 + ["c1", "c1"],
        "turn_idx": pa.array([0, 0, 0, 0, 0, 0], pa.int32()),
        "role": ["user", None, None, None, "assistant", None],
        "text": ["a", "b", None, None, "fresh", None],
        "tool": [None, "t1", "t2", None, None, "t3"],
        "ts": pa.array([10, 20, 30, 40, 50, 60], pa.int64()),
    })
    out = dataset_to_table(patch_upsert(
        ray.data.from_arrow(t), order_cols=["ts", "lsn"]))
    assert out.num_rows == 1
    r = out.to_pylist()[0]
    # delete at lsn 4 wiped the first lifetime; only lsn 5-6 survive
    assert r["role"] == "assistant"
    assert r["text"] == "fresh"      # U at 6 patched only tool
    assert r["tool"] == "t3"
    assert r["ts"] == 60 and r["lsn"] == 6

    # key fully deleted -> absent
    t2 = t.slice(0, 4)
    out2 = dataset_to_table(patch_upsert(ray.data.from_arrow(t2),
                                         order_cols=["ts", "lsn"]))
    assert out2.num_rows == 0


def test_merge_into_clause_semantics(ray_session, binlog, tmp_path):
    """MERGE INTO: delete takes precedence over update; update pulls
    the full source payload; unmatched rows insert only when the
    insert clause passes; untouched lake rows survive verbatim."""
    import pandas as pd

    eng = CdcIngestEngine(str(tmp_path / "mlake"), num_partitions=4)
    eng.replay(binlog, checkpoint_name="base")
    lake0 = eng.read_lake().to_pandas()

    # source: half existing keys, half new keys; ts strictly newer
    ex = lake0.head(40)[["conv_id", "turn_idx"]].reset_index(drop=True)
    new = pd.DataFrame({
        "conv_id": [f"conv-x{i}" for i in range(30)],
        "turn_idx": np.arange(30, dtype=np.int32),
    })
    src = pd.concat([ex, new], ignore_index=True)
    n = len(src)
    src["role"] = "merged"
    src["text"] = [f"m{i}" for i in range(n)]
    src["tool"] = "merge"
    src["ts"] = pd.Timestamp("2031-01-01") + pd.to_timedelta(
        np.arange(n), unit="s")
    src_tbl = pa.Table.from_pandas(src, preserve_index=False)

    res = eng.merge_into(
        src_tbl,
        when_matched_delete=lambda s, t: (
            s["turn_idx"].to_numpy(zero_copy_only=False) % 2 == 0),
        when_matched_update=True,
        when_not_matched_insert=lambda s: (
            s["turn_idx"].to_numpy(zero_copy_only=False) % 3 == 0),
    )
    lake1 = eng.read_lake().to_pandas()

    key0 = set(zip(lake0.conv_id, lake0.turn_idx))
    matched = src[[tuple(r) in key0
                   for r in zip(src.conv_id, src.turn_idx)]]
    deleted = matched[matched.turn_idx % 2 == 0]
    updated = matched[matched.turn_idx % 2 != 0]
    unmatched = src[[tuple(r) not in key0
                     for r in zip(src.conv_id, src.turn_idx)]]
    inserted = unmatched[unmatched.turn_idx % 3 == 0]
    assert res["deleted"] == len(deleted)
    assert res["updated"] == len(updated)
    assert res["inserted"] == len(inserted)

    key1 = set(zip(lake1.conv_id, lake1.turn_idx))
    for r in zip(deleted.conv_id, deleted.turn_idx):
        assert tuple(r) not in key1
    lk = lake1.set_index(["conv_id", "turn_idx"])
    for cid, ti, txt in zip(updated.conv_id, updated.turn_idx,
                            updated.text):
        assert lk.loc[(cid, ti), "text"] == txt
        assert lk.loc[(cid, ti), "role"] == "merged"
    for cid, ti, txt in zip(inserted.conv_id, inserted.turn_idx,
                            inserted.text):
        assert lk.loc[(cid, ti), "text"] == txt
    skipped = unmatched[unmatched.turn_idx % 3 != 0]
    for r in zip(skipped.conv_id, skipped.turn_idx):
        assert tuple(r) not in key1
    # untouched rows identical
    touched = set(zip(matched.conv_id, matched.turn_idx))
    rest0 = lake0[[tuple(r) not in touched
                   for r in zip(lake0.conv_id, lake0.turn_idx)]]
    rest1 = lake1[[tuple(r) in
                   set(zip(rest0.conv_id, rest0.turn_idx))
                   for r in zip(lake1.conv_id, lake1.turn_idx)]]
    s0 = rest0.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    s1 = rest1.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(s0, s1)
    eng.shutdown()


def test_merge_into_target_condition_and_noop(ray_session, binlog,
                                              tmp_path):
    """Matched clauses can condition on the TARGET row; a merge whose
    clauses match nothing leaves the lake bit-identical and advances
    nothing."""
    eng = CdcIngestEngine(str(tmp_path / "mlake2"), num_partitions=4)
    eng.replay(binlog, checkpoint_name="base")
    lake0 = eng.read_lake()
    src = lake0.select(["conv_id", "turn_idx", "role", "text",
                        "tool", "ts"]).slice(0, 50)
    import pandas as pd
    sp = src.to_pandas()
    sp["ts"] = pd.Timestamp("2031-01-01")
    sp["text"] = "redacted"
    res = eng.merge_into(
        pa.Table.from_pandas(sp, preserve_index=False),
        when_matched_update=lambda s, t: pc.equal(t["role"], "assistant"),
        when_not_matched_insert=False,
    )
    lake1 = eng.read_lake().to_pandas()
    n_asst = int((src.to_pandas().role == "assistant").sum())
    assert res["updated"] == n_asst
    assert res["inserted"] == res["deleted"] == 0
    red = lake1[lake1.text == "redacted"]
    assert len(red) == n_asst
    assert (red.role == "assistant").all()

    wm = eng.manifest.watermark()
    res2 = eng.merge_into(
        pa.Table.from_pandas(sp.head(0), preserve_index=False),
        when_matched_update=True)
    assert res2 == {"updated": 0, "deleted": 0, "inserted": 0,
                    "watermark": wm}
    eng.shutdown()


def test_replicate_to_incremental_mirror(ray_session, binlog, tmp_path):
    """Lake→lake replication: a cross-layout mirror (different
    num_partitions) converges to the source's live state after the
    initial full feed and again after an incremental catch-up; a
    repeat catch-up is a no-op; crash-replayed catch-up (position
    entry lost) is idempotent."""
    src = CdcIngestEngine(str(tmp_path / "src"), num_partitions=8)
    mir = CdcIngestEngine(str(tmp_path / "mir"), num_partitions=3)
    try:
        src.replay(binlog.slice(0, 4000), checkpoint_name="v1")
        r1 = src.replicate_to(mir)
        assert r1["from"] is None and r1["to"] == "v1" and not r1["noop"]
        assert mir.read_lake().equals(src.read_lake())

        src.replay(binlog.slice(4000), checkpoint_name="v2")
        r2 = src.replicate_to(mir)
        assert r2["from"] == "v1" and r2["to"] == "v2"
        assert mir.read_lake().equals(src.read_lake())
        # incremental: the catch-up shipped only the delta, not the lake
        assert 0 < r2["events"] < mir.read_lake().num_rows

        # repeat catch-up: no-op, nothing re-applied
        r3 = src.replicate_to(mir)
        assert r3["noop"] and r3["events"] == 0
        assert mir.read_lake().equals(src.read_lake())

        # crash between mirror commit and position append: drop the
        # replication entries and catch up again — the replayed feed is
        # entirely below the mirror's watermark, so state is unchanged
        mir.manifest.entries = [e for e in mir.manifest.entries
                                if e.get("type") != "replication"]
        before = mir.read_lake()
        r4 = src.replicate_to(mir)
        assert r4["from"] is None and r4["to"] == "v2" and r4["events"] == 0
        assert mir.read_lake().equals(before)
    finally:
        src.shutdown()
        mir.shutdown()


def test_replicate_to_guards(ray_session, binlog, tmp_path):
    """Pruned-on-source position and stale ``upto`` raise instead of
    silently corrupting the mirror."""
    import pytest as _pytest
    src = CdcIngestEngine(str(tmp_path / "src2"), num_partitions=4)
    mir = CdcIngestEngine(str(tmp_path / "mir2"), num_partitions=4)
    try:
        src.replay(binlog.slice(0, 2000), checkpoint_name="v1")
        src.replicate_to(mir)
        src.replay(binlog.slice(2000, 2000), checkpoint_name="v2")
        src.replay(binlog.slice(4000, 2000), checkpoint_name="v3")
        # re-requesting the current position is a harmless no-op ...
        assert src.replicate_to(mir, upto="v1")["noop"]
        src.replicate_to(mir, upto="v2")
        # ... but a position strictly behind the mirror raises
        with _pytest.raises(ValueError, match="older than"):
            src.replicate_to(mir, upto="v1")
        src.time_travel().prune_versions(keep_last=1)  # drops v1, v2
        with _pytest.raises(ValueError, match="pruned"):
            src.replicate_to(mir)
    finally:
        src.shutdown()
        mir.shutdown()


def test_merge_into_delta_mode_parity(ray_session, binlog, tmp_path):
    """merge_into evaluates clauses against MERGED live state in
    delta (LSM) commit mode — final lake equals the rewrite-mode run
    of the identical operations."""
    import pandas as pd

    outs = []
    for mode in ("rewrite", "delta"):
        eng = CdcIngestEngine(str(tmp_path / f"m_{mode}"),
                              num_partitions=4, commit_mode=mode)
        eng.replay(binlog.slice(0, 3000), checkpoint_name="v1")
        eng.replay(binlog.slice(3000, 3000), checkpoint_name="v2")
        lake = eng.read_lake().to_pandas()
        src = lake.head(60)[["conv_id", "turn_idx"]].copy()
        src["role"] = "merged"
        src["text"] = "patched"
        src["tool"] = "merge"
        src["ts"] = pd.Timestamp("2031-06-01")
        eng.merge_into(
            pa.Table.from_pandas(src, preserve_index=False),
            when_matched_delete=lambda s, t: pc.equal(t["role"], "user"),
            when_matched_update=True,
            when_not_matched_insert=False,
        )
        outs.append(eng.read_lake())
        eng.shutdown()
    assert outs[0].equals(outs[1])
    # and the merge actually did something in both modes
    roles = outs[0]["role"].to_pylist()
    assert "merged" in roles


def test_read_lake_dataset_column_pruning(ray_session, binlog, tmp_path):
    """columns= prunes the lake scan in BOTH commit modes and matches
    the unpruned read's projection."""
    for mode in ("rewrite", "delta"):
        eng = CdcIngestEngine(str(tmp_path / f"prune_{mode}"),
                              num_partitions=4, commit_mode=mode)
        eng.replay(binlog.slice(0, 3000), checkpoint_name="v1")
        eng.replay(binlog.slice(3000, 2000), checkpoint_name="v2")
        full = dataset_to_table(eng.read_lake_dataset())
        slim = dataset_to_table(
            eng.read_lake_dataset(columns=["conv_id", "text"]))
        assert slim.column_names == ["conv_id", "text"]
        key = [("conv_id", "ascending"), ("text", "ascending")]
        assert slim.sort_by(key).equals(
            full.select(["conv_id", "text"]).sort_by(key))
        eng.shutdown()


def test_vacuum_and_chained_replication(ray_session, binlog, tmp_path):
    """vacuum removes crash-orphaned tmp files but never committed
    data; replication CHAINS (source → mirror → second-tier mirror)
    because a mirror's snapshots are first-class."""
    src = CdcIngestEngine(str(tmp_path / "c_src"), num_partitions=4)
    mid = CdcIngestEngine(str(tmp_path / "c_mid"), num_partitions=3)
    leaf = CdcIngestEngine(str(tmp_path / "c_leaf"), num_partitions=2)
    try:
        src.replay(binlog.slice(0, 4000), checkpoint_name="v1")
        src.replicate_to(mid)
        mid.replicate_to(leaf)
        assert leaf.read_lake().equals(src.read_lake())

        src.replay(binlog.slice(4000), checkpoint_name="v2")
        src.replicate_to(mid)
        r = mid.replicate_to(leaf)
        assert not r["noop"]
        assert leaf.read_lake().equals(src.read_lake())

        # orphaned tmp files (simulated crash mid-write) are vacuumed
        orphan = os.path.join(src.lake_dir, "part-0001.parquet.tmp.999")
        with open(orphan, "wb") as f:
            f.write(b"junk")
        before = src.read_lake()
        res = src.vacuum(prune_keep_last=1)
        assert res["tmp_removed"] >= 1
        assert not os.path.exists(orphan)
        assert res["versions_pruned"] == ["v1"]
        assert src.read_lake().equals(before)
    finally:
        src.shutdown()
        mid.shutdown()
        leaf.shutdown()


def test_manifest_append_only_crash_tolerance(tmp_path):
    """Manifest appends are O(1) (no history rewrite); a torn trailing
    line from a crash mid-append is dropped on load and later appends
    stay parseable."""
    from datavec_ray.cdc.engine import Manifest
    p = str(tmp_path / "m" / "_manifest.jsonl")
    m = Manifest(p)
    m.append({"type": "commit", "partition": 0, "lsn_hi": 5})
    m.append({"type": "checkpoint", "name": "v1", "lsn_hi": 5})
    with open(p, "a") as f:        # crash mid-append: no newline
        f.write('{"type": "com')
    m2 = Manifest(p)
    assert len(m2.entries) == 2
    assert m2.watermark() == 5
    m2.append({"type": "commit", "partition": 1, "lsn_hi": 9})
    m3 = Manifest(p)
    assert [e["lsn_hi"] for e in m3.entries
            if e.get("type") == "commit"] == [5, 9]
    assert m3.watermark() == 9


def test_follow_into_continuous_replication(ray_session, binlog, tmp_path):
    """A follower polls the source lake and replicates each new
    snapshot as it commits; the mirror converges to the source's
    final state and records one position entry per hop."""
    import threading

    src = CdcIngestEngine(str(tmp_path / "f_src"), num_partitions=4)
    mir = CdcIngestEngine(str(tmp_path / "f_mir"), num_partitions=4)
    try:
        def writer():
            for i, lo in enumerate(range(0, 8000, 2000)):
                src.replay(binlog.slice(lo, 2000),
                           checkpoint_name=f"v{i + 1}")

        t = threading.Thread(target=writer)
        t.start()
        res = src.follow_into(mir, poll_interval=0.5, idle_rounds=10)
        t.join()
        # the follower may batch several snapshots into one hop, but
        # must have caught everything by the time it went idle
        assert 1 <= res["hops"] <= 4
        assert mir.read_lake().equals(src.read_lake())
    finally:
        src.shutdown()
        mir.shutdown()
