"""Zonemap (min/max statistics) data skipping + OPTIMIZE clustering.

OPTIMIZE rewrites each partition clustered by the given columns with
small row groups; ZoneMapIndex records footer stats per (file, row
group); scan_where reads only intersecting files/row groups. Results
must equal a full-scan filter in every mode — skipping is an
optimization, never a semantics change.
"""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from datavec_ray.cdc import CdcIngestEngine, replay_oracle, synth_binlog
from datavec_ray.cdc.binlog import split_segments
from datavec_ray.cdc.index import _zone_intersects


@pytest.fixture(scope="module")
def binlog():
    return synth_binlog(6000, seed=33)


@pytest.fixture(scope="module")
def oracle(binlog):
    return replay_oracle(binlog)


def _full_filter(state: pa.Table, lo, hi) -> pa.Table:
    m = pc.and_(pc.greater_equal(state["ts"], lo),
                pc.less_equal(state["ts"], hi))
    return state.filter(m)


def _ts_bounds(oracle):
    mn = pc.min(oracle["ts"]).as_py()
    mx = pc.max(oracle["ts"]).as_py()
    span = mx - mn
    return mn + span / 4, mn + span / 2


def _sorted(t: pa.Table) -> pa.Table:
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def test_zone_intersects_edges():
    assert _zone_intersects(5, 10, "==", 7)
    assert not _zone_intersects(5, 10, "==", 11)
    assert _zone_intersects(5, 10, "between", (10, 20))
    assert not _zone_intersects(5, 10, "between", (11, 20))
    assert _zone_intersects(5, 10, "in", [1, 9])
    assert not _zone_intersects(5, 10, "in", [1, 2])
    assert _zone_intersects(5, 10, "<", 6)
    assert not _zone_intersects(5, 10, "<", 5)
    assert _zone_intersects(5, 10, ">=", 10)
    assert not _zone_intersects(5, 10, ">", 10)
    # missing stats / incomparable types can never skip
    assert _zone_intersects(None, None, "==", 3)
    assert _zone_intersects("a", "c", "==", 3)


def test_optimize_rewrite_preserves_state_and_clusters(
        ray_session, binlog, oracle, tmp_path):
    lake = str(tmp_path / "lake")
    eng = CdcIngestEngine(lake, num_partitions=4)
    eng.replay(binlog, checkpoint_name="v1")
    before = eng.read_lake()
    assert before.equals(oracle)
    res = eng.optimize(cluster_by=["ts"], row_group_rows=128)
    assert len(res) == 4 and all(r["rows"] > 0 for r in res)
    assert eng.read_lake().equals(oracle)  # content untouched
    # row groups are tight, non-overlapping ts ranges after clustering
    f = pq.ParquetFile(os.path.join(lake, "part-0000.parquet"))
    md = f.metadata
    assert md.num_row_groups > 1
    ts_idx = next(i for i in range(md.num_columns)
                  if md.schema.column(i).path == "ts")
    prev_max = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(ts_idx).statistics
        if prev_max is not None:
            assert st.min >= prev_max
        prev_max = st.max
    # manifest carries the audit entry
    types = [e.get("type") for e in eng.manifest.entries]
    assert types.count("optimize") == 4
    eng.shutdown()


def test_scan_where_matches_full_scan_and_skips(
        ray_session, binlog, oracle, tmp_path):
    lake = str(tmp_path / "lake")
    eng = CdcIngestEngine(lake, num_partitions=4)
    eng.replay(binlog, checkpoint_name="v1")
    eng.optimize(cluster_by=["ts"], row_group_rows=128)
    lo, hi = _ts_bounds(oracle)
    got = _sorted(pa.Table.from_pandas(
        eng.scan_where([("ts", "between", (lo, hi))]).to_pandas(),
        preserve_index=False))
    want = _sorted(_full_filter(oracle, lo, hi))
    assert got.num_rows == want.num_rows > 0
    assert got.cast(want.schema).equals(want)
    rep = eng.last_scan_report
    # hash partitioning spreads ts everywhere, so FILE-level skipping
    # can't help — but clustered row groups must prune hard
    assert rep["row_groups_candidate"] < rep["row_groups_total"] / 2
    # other operators
    one = eng.scan_where([("conv_id", "==",
                           oracle["conv_id"][0].as_py())]).to_pandas()
    assert set(one["conv_id"]) == {oracle["conv_id"][0].as_py()}
    top = eng.scan_where([("turn_idx", ">=", 5)]).to_pandas()
    assert (top["turn_idx"] >= 5).all()
    assert len(top) == pc.sum(
        pc.greater_equal(oracle["turn_idx"], 5)).as_py()
    eng.shutdown()


def test_scan_where_refreshes_after_new_commit(
        ray_session, binlog, oracle, tmp_path):
    lake = str(tmp_path / "lake")
    eng = CdcIngestEngine(lake, num_partitions=4)
    segs = split_segments(binlog, 2)
    eng.replay(segs[0], checkpoint_name="v1")
    lo, hi = _ts_bounds(oracle)
    _ = eng.scan_where([("ts", "between", (lo, hi))]).to_pandas()
    eng.replay(segs[1], checkpoint_name="v2")  # files change under the index
    got = _sorted(pa.Table.from_pandas(
        eng.scan_where([("ts", "between", (lo, hi))]).to_pandas(),
        preserve_index=False))
    want = _sorted(_full_filter(oracle, lo, hi))
    assert got.cast(want.schema).equals(want)
    eng.shutdown()


def test_delta_mode_scan_and_optimize(ray_session, binlog, oracle, tmp_path):
    lake = str(tmp_path / "lake")
    eng = CdcIngestEngine(lake, num_partitions=4, commit_mode="delta")
    segs = split_segments(binlog, 3)
    eng.replay(segs[0], checkpoint_name="v1")
    cut = int(pc.max(segs[0]["lsn"]).as_py())
    eng.replay(segs[1], checkpoint_name="v2")
    eng.replay(segs[2], checkpoint_name="v3")
    asof_before = eng.time_travel().read_state_as_of(cut).to_pandas()
    lo, hi = _ts_bounds(oracle)
    want = _sorted(_full_filter(oracle, lo, hi))
    # merge-on-read scan over segments (no optimize yet)
    got = _sorted(pa.Table.from_pandas(
        eng.scan_where([("ts", "between", (lo, hi))]).to_pandas(),
        preserve_index=False))
    assert got.cast(want.schema).equals(want)
    # optimize = compact + cluster
    res = eng.optimize(cluster_by=["ts"], row_group_rows=128)
    assert all(r["segments_merged"] >= 1 for r in res)
    files = sorted(f for f in os.listdir(lake) if f.endswith(".parquet"))
    assert files and all(".base." in f for f in files)  # deltas folded
    assert eng.read_lake().equals(oracle)
    got2 = _sorted(pa.Table.from_pandas(
        eng.scan_where([("ts", "between", (lo, hi))]).to_pandas(),
        preserve_index=False))
    assert got2.cast(want.schema).equals(want)
    # checkpoint hardlinks kept their old inodes: AS-OF reads unchanged
    asof_after = eng.time_travel().read_state_as_of(cut).to_pandas()
    pd.testing.assert_frame_equal(
        asof_before.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        asof_after.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    eng.shutdown()


def test_zonemap_persists_and_reloads(ray_session, binlog, tmp_path):
    lake = str(tmp_path / "lake")
    eng = CdcIngestEngine(lake, num_partitions=4)
    eng.replay(binlog, checkpoint_name="v1")
    zm = eng.zonemaps(["ts"])
    zm.refresh()
    assert os.path.exists(os.path.join(lake, "_index", "zonemaps.json"))
    # a fresh index object loads the sidecar without rebuilding
    from datavec_ray.cdc.index import ZoneMapIndex
    zm2 = ZoneMapIndex(eng, ["ts"])
    assert zm2.load()
    assert zm2._files == zm._files
    eng.shutdown()


def test_zorder_optimize_prunes_multicolumn_predicates(ray_session, tmp_path):
    """OPTIMIZE ZORDER: on a 2-D range predicate the Morton layout must
    (a) return exactly the full-scan rows and (b) touch fewer candidate
    row groups than lexicographic clustering, whose second column's
    stats span everything."""
    b = synth_binlog(80_000, seed=5)
    orc = replay_oracle(b)
    mn, mx = pc.min(orc["ts"]).as_py(), pc.max(orc["ts"]).as_py()
    lo, hi = mn + (mx - mn) / 4, mn + (mx - mn) * 3 / 8
    flt = [("ts", "between", (lo, hi)), ("turn_idx", "between", (3, 4))]
    want = orc.filter(pc.and_(
        pc.and_(pc.greater_equal(orc["ts"], lo),
                pc.less_equal(orc["ts"], hi)),
        pc.and_(pc.greater_equal(orc["turn_idx"], 3),
                pc.less_equal(orc["turn_idx"], 4))))
    cands = {}
    for zo in (False, True):
        lake = str(tmp_path / ("z" if zo else "lex"))
        eng = CdcIngestEngine(lake, num_partitions=4)
        eng.replay(b, checkpoint_name="v")
        eng.optimize(cluster_by=["ts", "turn_idx"], row_group_rows=64,
                     zorder=zo)
        got = eng.scan_where(flt)
        assert got.count() == want.num_rows
        cands[zo] = eng.last_scan_report["row_groups_candidate"]
        eng.shutdown()
    assert cands[True] < cands[False]
