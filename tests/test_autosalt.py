"""Auto-salting as a durable lake layout: auto_salt=True detects hot
conversations on the first replay and records the salt config in the
manifest; every later writer (same or fresh process) routes with the
SAME layout; resalt() migrates an existing lake to a new hot set."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datavec_ray.cdc import CdcIngestEngine, replay_oracle, synth_binlog
from datavec_ray.cdc.binlog import split_segments


def _skewed_binlog(n: int = 8000, seed: int = 5) -> pa.Table:
    """Synthetic binlog where one conversation owns ~40% of all events."""
    base = synth_binlog(n, seed=seed)
    rng = np.random.default_rng(seed)
    hot_mask = rng.random(n) < 0.4
    conv = base["conv_id"].to_numpy(zero_copy_only=False).astype(object)
    conv[hot_mask] = "conv-hot"
    # hot conv needs distinct turn_idx values to spread over salts
    turn = base["turn_idx"].to_numpy(zero_copy_only=False).copy()
    turn[hot_mask] = np.arange(int(hot_mask.sum())) % 500
    t = base.set_column(base.schema.get_field_index("conv_id"),
                        "conv_id", pa.array(conv, pa.string()))
    return t.set_column(t.schema.get_field_index("turn_idx"),
                        "turn_idx", pa.array(turn, pa.int32()))


@pytest.fixture(scope="module")
def skewed():
    return _skewed_binlog()


def test_auto_salt_detects_and_records(ray_session, skewed, tmp_path):
    lake = str(tmp_path / "lake")
    eng = CdcIngestEngine(lake, num_partitions=4, auto_salt=True)
    seg1, seg2 = split_segments(skewed, 2)
    eng.replay(seg1, checkpoint_name="v1")
    assert eng.hot_convs and "conv-hot" in eng.hot_convs
    assert eng.salt_turns > 1
    salt_entries = [e for e in eng.manifest.entries
                    if e.get("type") == "salt"]
    assert len(salt_entries) == 1 and salt_entries[0]["auto"]
    # second replay in the SAME engine keeps the layout and stays exact
    eng.replay(seg2, checkpoint_name="v2")
    assert eng.read_lake().equals(replay_oracle(skewed))
    # the hot conversation actually spreads across >1 partition
    from datavec_ray.cdc.engine import assign_partitions
    turns = pa.array(list(range(50)), pa.int32())
    convs = pa.array(["conv-hot"] * 50)
    ps = assign_partitions(convs, turns, 4, eng.salt_turns, eng.hot_convs)
    assert len(set(ps.tolist())) > 1
    eng.shutdown()


def test_sticky_layout_across_engine_opens(ray_session, skewed, tmp_path):
    lake = str(tmp_path / "lake")
    seg1, seg2 = split_segments(skewed, 2)
    eng1 = CdcIngestEngine(lake, num_partitions=4, auto_salt=True)
    eng1.replay(seg1, checkpoint_name="v1")
    hot1, turns1 = eng1.hot_convs, eng1.salt_turns
    eng1.shutdown()
    # a FRESH engine (even without auto_salt and with different ctor
    # salt args) must load the recorded layout — routing consistency
    eng2 = CdcIngestEngine(lake, num_partitions=4, salt_turns=7,
                           hot_convs=["conv-00000099"])
    assert eng2.hot_convs == hot1 and eng2.salt_turns == turns1
    eng2.replay(seg2, checkpoint_name="v2")
    assert eng2.read_lake().equals(replay_oracle(skewed))
    # salted point lookup still resolves every turn of the hot conv
    got = eng2.lookup(["conv-hot"])
    oracle = replay_oracle(skewed)
    want = oracle.filter(pc.equal(oracle["conv_id"], "conv-hot"))
    assert got.num_rows == want.num_rows
    eng2.shutdown()


def test_no_hot_convs_records_unsalted(ray_session, tmp_path):
    uniform = synth_binlog(3000, seed=11)
    eng = CdcIngestEngine(str(tmp_path / "lake"), num_partitions=4,
                          auto_salt=True)
    eng.replay(uniform, checkpoint_name="v1")
    assert eng.hot_convs is None and eng.salt_turns == 1
    entry = [e for e in eng.manifest.entries if e.get("type") == "salt"][0]
    assert entry["hot_convs"] == [] and entry["salt_turns"] == 1
    assert eng.read_lake().equals(replay_oracle(uniform))
    eng.shutdown()


def test_resalt_migrates_existing_lake(ray_session, skewed, tmp_path):
    lake = str(tmp_path / "lake")
    seg1, seg2 = split_segments(skewed, 2)
    eng = CdcIngestEngine(lake, num_partitions=4)   # unsalted at first
    eng.replay(seg1, checkpoint_name="v1")
    eng.resalt(["conv-hot"], salt_turns=3)
    assert eng.hot_convs == frozenset({"conv-hot"})
    # post-migration replays route with the new layout; state stays exact
    eng.replay(seg2, checkpoint_name="v2")
    assert eng.read_lake().equals(replay_oracle(skewed))
    # watermark never regressed through the migration
    assert eng.manifest.watermark() == int(pc.max(skewed["lsn"]).as_py())
    eng.shutdown()
    # the migrated layout is sticky for the next open
    eng2 = CdcIngestEngine(lake, num_partitions=4)
    assert eng2.hot_convs == frozenset({"conv-hot"}) and eng2.salt_turns == 3
    eng2.shutdown()
