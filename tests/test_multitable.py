"""Atomic multi-table transactional replay
(``datavec_ray/cdc/multitable.py``): one binlog routed to several lake
tables under a SHARED committed-txn gate must become visible in ALL
tables or NONE — across crashes before and after the commit point."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datavec_ray.cdc import CdcIngestEngine
from datavec_ray.cdc.multitable import (_journal_path, recover_tables,
                                        replay_tables)
from datavec_ray.cdc.oracle import replay_oracle
from datavec_ray.cdc.txn import synth_txn_binlog


@pytest.fixture(scope="module")
def txn_binlog():
    return synth_txn_binlog(4_000, seed=11)


def _route(bl: pa.Table, side: int) -> pa.Table:
    """Events whose turn_idx parity is ``side``, plus ALL commit
    markers (the transaction-boundary stream reaches every sink)."""
    par = pc.bit_wise_and(pc.fill_null(bl["turn_idx"], -1),
                          pa.scalar(1, pa.int32()))
    keep = pc.or_(pc.equal(par, pa.scalar(side, pa.int32())),
                  pc.equal(bl["op"], "C"))
    return bl.filter(keep)


def _expected(bl: pa.Table, side: int) -> pa.Table:
    committed = set(bl.filter(pc.equal(bl["op"], "C"))["txn_id"]
                    .to_pylist())
    routed = _route(bl, side)
    ev = routed.filter(pc.not_equal(routed["op"], "C"))
    mask = pc.is_in(ev["txn_id"], value_set=pa.array(sorted(committed)))
    return replay_oracle(ev.filter(mask).drop_columns(["txn_id"]))


def _assert_lake_equals(eng: CdcIngestEngine, want: pa.Table):
    got = eng.read_lake().sort_by([("conv_id", "ascending"),
                                   ("turn_idx", "ascending")])
    want = want.sort_by([("conv_id", "ascending"),
                        ("turn_idx", "ascending")])
    assert got.num_rows == want.num_rows
    for c in ("conv_id", "turn_idx", "role", "text", "ts"):
        assert got[c].equals(want[c]) or \
            got[c].to_pylist() == want[c].to_pylist(), c


def test_replay_tables_atomic_commit(ray_session, txn_binlog, tmp_path):
    ray = ray_session
    base = str(tmp_path / "mt1")
    tables = {"A": ray.data.from_arrow(_route(txn_binlog, 0)),
              "B": ray.data.from_arrow(_route(txn_binlog, 1))}
    out = replay_tables(base, tables, txn_col="txn_id", op_col="op",
                        commit_op="C", num_partitions=4)
    assert out["recovered"] == "clean"
    for side, name in ((0, "A"), (1, "B")):
        _assert_lake_equals(out["engines"][name],
                            _expected(txn_binlog, side))
    assert not os.path.exists(_journal_path(base))
    for eng in out["engines"].values():
        eng.shutdown()


def test_crash_before_commit_point_leaves_nothing(ray_session, txn_binlog,
                                                  tmp_path, monkeypatch):
    """A crash after PREPARING both stages but before the journal is
    written must leave both tables empty; the next replay_tables run
    aborts the leftovers and completes normally."""
    ray = ray_session
    base = str(tmp_path / "mt2")
    tables = {"A": ray.data.from_arrow(_route(txn_binlog, 0)),
              "B": ray.data.from_arrow(_route(txn_binlog, 1))}
    import datavec_ray.cdc.multitable as mt

    def boom(*a, **k):
        raise RuntimeError("crash before commit point")
    monkeypatch.setattr(mt, "_write_journal", boom)
    with pytest.raises(RuntimeError, match="commit point"):
        replay_tables(base, tables, txn_col="txn_id", op_col="op",
                      commit_op="C", num_partitions=4)
    monkeypatch.undo()
    # neither table is visible; the staging dirs are on disk
    engines = mt.open_table_engines(base, ["A", "B"], num_partitions=4)
    assert all(e.read_lake().num_rows == 0 for e in engines.values())
    assert any(f.startswith("_stage_mtx_")
               for f in os.listdir(engines["A"].lake_dir))
    # the retry recovers (abort) and commits
    out = replay_tables(base, tables, txn_col="txn_id", op_col="op",
                        commit_op="C", num_partitions=4, engines=engines)
    assert out["recovered"] == "aborted"
    for side, name in ((0, "A"), (1, "B")):
        _assert_lake_equals(engines[name], _expected(txn_binlog, side))
    for eng in engines.values():
        eng.shutdown()


def test_crash_mid_publish_recovers_both(ray_session, txn_binlog,
                                         tmp_path, monkeypatch):
    """A crash after the journal (commit point) with only ONE table
    published must finish BOTH on recovery — never one-visible."""
    ray = ray_session
    base = str(tmp_path / "mt3")
    tables = {"A": ray.data.from_arrow(_route(txn_binlog, 0)),
              "B": ray.data.from_arrow(_route(txn_binlog, 1))}
    from datavec_ray.cdc.wap import StagedCommit
    orig = StagedCommit.publish
    calls = {"n": 0}

    def publish_once(self, *a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("crash mid-publish")
        return orig(self, *a, **k)
    monkeypatch.setattr(StagedCommit, "publish", publish_once)
    with pytest.raises(RuntimeError, match="mid-publish"):
        replay_tables(base, tables, txn_col="txn_id", op_col="op",
                      commit_op="C", num_partitions=4)
    monkeypatch.undo()
    assert os.path.exists(_journal_path(base))   # commit point reached
    engines = __import__("datavec_ray.cdc.multitable",
                         fromlist=["open_table_engines"]) \
        .open_table_engines(base, ["A", "B"], num_partitions=4)
    # recovery must complete the second publish
    assert recover_tables(base, engines) == "committed"
    assert not os.path.exists(_journal_path(base))
    for side, name in ((0, "A"), (1, "B")):
        _assert_lake_equals(engines[name], _expected(txn_binlog, side))
    # idempotent: a second recovery is a no-op
    assert recover_tables(base, engines) == "clean"
    for eng in engines.values():
        eng.shutdown()


def test_gate_shared_across_tables(ray_session, txn_binlog, tmp_path):
    """Markers stripped from table B's stream: the SHARED gate still
    commits B's events because the union sees A's markers."""
    ray = ray_session
    base = str(tmp_path / "mt4")
    a = _route(txn_binlog, 0)
    b = _route(txn_binlog, 1).filter(
        pc.not_equal(_route(txn_binlog, 1)["op"], "C"))
    out = replay_tables(base, {"A": ray.data.from_arrow(a),
                               "B": ray.data.from_arrow(b)},
                        txn_col="txn_id", op_col="op", commit_op="C",
                        num_partitions=4)
    _assert_lake_equals(out["engines"]["B"], _expected(txn_binlog, 1))
    for eng in out["engines"].values():
        eng.shutdown()


def test_sequential_batches_both_commit(ray_session, txn_binlog, tmp_path):
    """Two successive replay_tables on the same base_dir must BOTH
    land: the stage name is sequenced per invocation, so WAP's
    crash-resume shortcut (publish entry with the same stage name)
    never swallows a fresh batch."""
    import pyarrow.compute as pc

    from datavec_ray.cdc.binlog import split_segments
    ray = ray_session
    base = str(tmp_path / "mt_seq")
    segs = list(split_segments(txn_binlog, 2))
    engines = None
    for seg in segs:
        tabs = {"A": ray.data.from_arrow(_route(seg, 0)),
                "B": ray.data.from_arrow(_route(seg, 1))}
        out = replay_tables(base, tabs, txn_col="txn_id", op_col="op",
                            commit_op="C", num_partitions=4,
                            engines=engines)
        engines = out["engines"]
    # both batches' committed events are visible. Each call gates ITS
    # OWN batch (a txn whose marker lands in a later batch stays out —
    # carry pending events forward via txn_split for streaming use),
    # so the oracle applies the gate per segment before the LWW
    for side, name in ((0, "A"), (1, "B")):
        kept = []
        for seg in segs:
            committed = set(seg.filter(pc.equal(seg["op"], "C"))
                            ["txn_id"].to_pylist())
            routed = _route(seg, side)
            ev = routed.filter(pc.not_equal(routed["op"], "C"))
            mask = pc.is_in(ev["txn_id"],
                            value_set=pa.array(sorted(committed)))
            kept.append(ev.filter(mask).drop_columns(["txn_id"]))
        want = replay_oracle(pa.concat_tables(kept))
        _assert_lake_equals(engines[name], want)
    for eng in engines.values():
        eng.shutdown()
