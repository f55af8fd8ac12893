"""Transactional CDC visibility (``datavec_ray/cdc/txn.py``): only
committed transactions apply, atomically, across segment boundaries
and crash/resume."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datavec_ray.cdc.binlog import split_segments
from datavec_ray.cdc.txn import committed_txns, synth_txn_binlog, txn_split


@pytest.fixture(scope="module")
def txn_binlog():
    return synth_txn_binlog(5_000, seed=3)


def _marked(bl: pa.Table) -> set:
    return set(bl.filter(pc.equal(bl["op"], "C"))["txn_id"].to_pylist())


def test_synth_txn_binlog_shape(txn_binlog):
    bl = txn_binlog
    lsn = np.asarray(bl["lsn"])
    assert (np.diff(lsn) == 1).all()  # strictly monotone, re-issued
    marked = _marked(bl)
    n_txn = len(set(bl["txn_id"].to_pylist()))
    assert 0 < len(marked) < n_txn  # some committed, some not
    # each marker sits AFTER every event of its txn
    df = bl.to_pandas()
    last_ev = df[df["op"] != "C"].groupby("txn_id")["lsn"].max()
    mk = df[df["op"] == "C"].set_index("txn_id")["lsn"]
    assert (mk > last_ev.loc[mk.index]).all()


def test_txn_split_membership(ray_session, txn_binlog):
    ray = ray_session
    bl = txn_binlog
    ds = ray.data.from_arrow(bl).repartition(5)
    apply_ds, pending, nc = txn_split(ds)
    a, p = apply_ds.to_pandas(), pending.to_pandas()
    marked = _marked(bl)
    assert nc == len(marked)
    ev = bl.filter(pc.not_equal(bl["op"], "C")).to_pandas()
    assert not (a["op"] == "C").any() and not (p["op"] == "C").any()
    assert set(a["txn_id"]) <= marked and not (set(p["txn_id"]) & marked)
    assert len(a) == int(ev["txn_id"].isin(marked).sum())
    assert len(a) + len(p) == len(ev)
    assert len(p) > 0


def test_txn_split_semijoin_path_matches_broadcast(ray_session, txn_binlog):
    ray = ray_session
    ds = ray.data.from_arrow(txn_binlog).repartition(4)
    a1, p1, n1 = txn_split(ds)
    a2, p2, n2 = txn_split(ds, broadcast_limit=0)  # force semi-join path
    assert n1 == n2
    k1 = sorted(a1.to_pandas()["lsn"])
    k2 = sorted(a2.to_pandas()["lsn"])
    assert k1 == k2
    assert sorted(p1.to_pandas()["lsn"]) == sorted(p2.to_pandas()["lsn"])


def test_segment_boundary_atomicity(ray_session, txn_binlog):
    """Stream segments with carry-over of pending events: every
    committed txn applies exactly once (at the segment where its
    marker lands); uncommitted txns never apply."""
    ray = ray_session
    bl = txn_binlog
    marked = _marked(bl)
    ev = bl.filter(pc.not_equal(bl["op"], "C")).to_pandas()
    carry, applied = None, []
    for seg in split_segments(bl, 4):
        window = seg if carry is None else pa.concat_tables([carry, seg])
        ap, pend, _ = txn_split(ray.data.from_arrow(window))
        applied.append(ap.to_pandas())
        pt = pend.to_pandas()
        carry = (pa.Table.from_pandas(pt, preserve_index=False)
                 .cast(window.schema) if len(pt) else None)
    allap = pd.concat(applied)
    assert allap["lsn"].is_unique  # exactly once
    assert len(allap) == int(ev["txn_id"].isin(marked).sum())
    # a txn is never partially visible within any prefix
    seen = set()
    for a in applied:
        for t, n in a.groupby("txn_id").size().items():
            assert t not in seen  # whole txn applies in ONE window
            seen.add(t)
            assert n == int((ev["txn_id"] == t).sum())


def test_txn_replay_crash_resume(ray_session, txn_binlog, tmp_path):
    """Compose txn_split with the engine: crash after segment 1,
    resume, finish — final lake equals the LWW oracle over committed
    txns only."""
    ray = ray_session
    from datavec_ray.cdc.engine import CdcIngestEngine
    from datavec_ray.cdc.oracle import replay_oracle
    bl = txn_binlog
    marked = _marked(bl)
    committed_events = bl.filter(pc.and_(
        pc.not_equal(bl["op"], "C"),
        pc.is_in(bl["txn_id"], value_set=pa.array(sorted(marked)))))
    expect = replay_oracle(committed_events.drop_columns(["txn_id"]))

    segs = split_segments(bl, 3)
    lake = str(tmp_path / "lake")

    def run(engine, seg_tables, carry):
        for seg in seg_tables:
            window = seg if carry is None else pa.concat_tables([carry, seg])
            ap, pend, _ = txn_split(ray.data.from_arrow(window))
            # min_lsn_exclusive=0: carried pending events sit BELOW the
            # engine's lsn watermark by construction; txn_split already
            # guarantees exactly-once presentation, and LWW merge is
            # idempotent either way
            engine.replay(ap.drop_columns(["txn_id"]),
                          checkpoint_name=f"seg{int(seg['lsn'][0].as_py())}",
                          min_lsn_exclusive=0)
            pt = pend.to_pandas()
            carry = (pa.Table.from_pandas(pt, preserve_index=False)
                     .cast(window.schema) if len(pt) else None)
        return carry

    eng = CdcIngestEngine(lake, num_partitions=4)
    try:
        carry = run(eng, segs[:1], None)
    finally:
        eng.shutdown()
    # "crash": new engine over the same lake resumes from checkpoints
    eng2 = CdcIngestEngine(lake, num_partitions=4)
    try:
        eng2.resume_from_checkpoint()
        run(eng2, segs[1:], carry)
        got = eng2.read_lake()
    finally:
        eng2.shutdown()
    g = got.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(
        drop=True)
    e = expect.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(
        drop=True)
    assert len(g) == len(e)
    for c in ("conv_id", "turn_idx", "role", "text", "tool"):
        assert g[c].fillna("\0").tolist() == e[c].fillna("\0").tolist()


def test_committed_txns_payload_marker(ray_session):
    """Payload-based commit predicate (op_col/commit_op pointing at a
    payload column with nulls) stays null-safe."""
    ray = ray_session
    t = pa.table({
        "txn_id": pa.array([0, 0, 1, 1], pa.int64()),
        "op": ["I", "I", "I", "D"],
        "tool": ["signup", "x", None, None],
    })
    ds = ray.data.from_arrow(t)
    ids = committed_txns(ds, op_col="tool", commit_op="signup")
    assert ids.to_pylist() == [0]
    ap, pend, n = txn_split(ds, op_col="tool", commit_op="signup",
                            drop_markers=False)
    assert n == 1
    assert sorted(ap.to_pandas()["txn_id"]) == [0, 0]
    assert sorted(pend.to_pandas()["txn_id"]) == [1, 1]
