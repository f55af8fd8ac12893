"""Incremental JDBC mirror (cdc/jdbc_mirror.py): the external DB table
tracks the lake's live state snapshot-by-snapshot — initial sync ships
everything, catch-ups ship only the changeset, deletes propagate,
re-running a crashed catch-up is idempotent, and the position survives
in the target DB across engine opens."""

import sqlite3

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datavec_ray.cdc import CdcIngestEngine, replay_oracle, synth_binlog
from datavec_ray.cdc.binlog import split_segments
from datavec_ray.sources import sqlite_connection


@pytest.fixture(scope="module")
def binlog():
    return synth_binlog(4000, seed=44)


def _db_state(db: str) -> pa.Table:
    con = sqlite3.connect(db)
    rows = con.execute(
        "SELECT conv_id, turn_idx, role, text, tool, ts_ms FROM mirror "
        "ORDER BY conv_id, turn_idx").fetchall()
    con.close()
    cols = list(zip(*rows)) if rows else [[]] * 6
    return pa.table({
        "conv_id": pa.array(cols[0], pa.string()),
        "turn_idx": pa.array(cols[1], pa.int64()),
        "role": pa.array(cols[2], pa.string()),
        "text": pa.array(cols[3], pa.string()),
        "tool": pa.array(cols[4], pa.string()),
        "ts_ms": pa.array(cols[5], pa.int64()),
    })


def _lake_as_mirror_shape(t: pa.Table) -> pa.Table:
    return pa.table({
        "conv_id": t["conv_id"],
        "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
        "role": t["role"], "text": t["text"], "tool": t["tool"],
        "ts_ms": pc.cast(t["ts"], pa.int64()),
    }).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def test_initial_and_incremental_mirror(ray_session, binlog, tmp_path):
    lake, db = str(tmp_path / "lake"), str(tmp_path / "m.db")
    eng = CdcIngestEngine(lake, num_partitions=4)
    seg1, seg2 = split_segments(binlog, 2)
    eng.replay(seg1, checkpoint_name="v1")
    r1 = eng.mirror_to_jdbc(sqlite_connection(db), "mirror")
    assert r1["from"] is None and r1["to"] == "v1" and r1["deletes"] == 0
    assert _db_state(db).equals(_lake_as_mirror_shape(eng.read_lake()))

    eng.replay(seg2, checkpoint_name="v2")
    r2 = eng.mirror_to_jdbc(sqlite_connection(db), "mirror")
    assert r2["from"] == "v1" and r2["to"] == "v2" and not r2["noop"]
    # incremental: far fewer rows shipped than the full state
    assert r2["upserts"] + r2["deletes"] < eng.read_lake().num_rows
    # deletes actually propagate (the binlog contains D ops)
    assert r2["deletes"] > 0 or r1["upserts"] > 0
    assert _db_state(db).equals(
        _lake_as_mirror_shape(replay_oracle(binlog)))
    # already caught up → noop
    r3 = eng.mirror_to_jdbc(sqlite_connection(db), "mirror")
    assert r3["noop"]
    eng.shutdown()


def test_rerun_is_idempotent_and_position_survives(ray_session, binlog,
                                                   tmp_path):
    lake, db = str(tmp_path / "lake"), str(tmp_path / "m.db")
    seg1, seg2 = split_segments(binlog, 2)
    eng = CdcIngestEngine(lake, num_partitions=4)
    eng.replay(seg1, checkpoint_name="v1")
    eng.mirror_to_jdbc(sqlite_connection(db), "mirror")
    eng.replay(seg2, checkpoint_name="v2")
    # simulate a crash AFTER apply but BEFORE the position advanced:
    # wipe the state row, leaving the applied data in place
    eng.mirror_to_jdbc(sqlite_connection(db), "mirror")
    con = sqlite3.connect(db)
    con.execute("UPDATE _datavec_mirror_state SET snapshot = 'v1'")
    con.commit(); con.close()
    r = eng.mirror_to_jdbc(sqlite_connection(db), "mirror")  # re-apply
    assert r["from"] == "v1" and r["to"] == "v2"
    assert _db_state(db).equals(
        _lake_as_mirror_shape(replay_oracle(binlog)))
    eng.shutdown()
    # a FRESH engine open continues from the DB-stored position
    eng2 = CdcIngestEngine(lake, num_partitions=4)
    assert eng2.mirror_to_jdbc(sqlite_connection(db), "mirror")["noop"]
    eng2.shutdown()


def test_pruned_position_refuses(ray_session, binlog, tmp_path):
    lake, db = str(tmp_path / "lake"), str(tmp_path / "m.db")
    segs = split_segments(binlog, 3)
    eng = CdcIngestEngine(lake, num_partitions=4)
    eng.replay(segs[0], checkpoint_name="v1")
    eng.mirror_to_jdbc(sqlite_connection(db), "mirror")
    eng.replay(segs[1], checkpoint_name="v2")
    eng.replay(segs[2], checkpoint_name="v3")
    eng.time_travel().prune_versions(keep_last=1)
    with pytest.raises(ValueError, match="pruned"):
        eng.mirror_to_jdbc(sqlite_connection(db), "mirror")
    eng.shutdown()
