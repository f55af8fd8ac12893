"""Set operations, stratified sampling, and CDC time travel / change feed."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datavec_ray.cdc.binlog import split_segments, synth_binlog
from datavec_ray.cdc.oracle import replay_oracle
from datavec_ray.util import dataset_to_table


def _rand_table(seed: int, n: int = 600) -> pa.Table:
    rng = np.random.default_rng(seed)
    k = rng.integers(0, 40, n)
    v = rng.choice(["x", "y", "z", None], n, p=[0.4, 0.3, 0.2, 0.1])
    return pa.table({"k": pa.array(k, pa.int64()),
                     "v": pa.array(v, pa.string())})


def _sql_rows(con, q):
    return set(map(tuple, con.sql(q).fetchall()))


def _tbl_rows(t: pa.Table):
    return set(zip(*[t[c].to_pylist() for c in t.column_names]))


@pytest.mark.parametrize("op,sql", [
    ("intersect_rows", "select * from ta intersect select * from tb"),
    ("except_rows", "select * from ta except select * from tb"),
    ("union_distinct", "select * from ta union select * from tb"),
])
def test_set_ops_match_duckdb(ray_session, op, sql):
    import ray.data as rd

    from datavec_ray.ops import setops

    ta, tb = _rand_table(1), _rand_table(2)
    con = duckdb.connect()
    con.register("ta", ta)
    con.register("tb", tb)
    expect = _sql_rows(con, sql)
    got = dataset_to_table(getattr(setops, op)(
        rd.from_arrow(ta).repartition(5), rd.from_arrow(tb).repartition(3),
        num_partitions=7))
    assert got.column_names == ["k", "v"]
    assert _tbl_rows(got) == expect
    assert got.num_rows == len(expect)      # result itself is distinct


def test_distinct_rows_nulls_equal(ray_session):
    import ray.data as rd

    from datavec_ray.ops.setops import distinct_rows

    t = pa.table({"a": [1, 1, 1, 2, None, None],
                  "b": ["x", "x", None, "x", None, None]})
    got = dataset_to_table(distinct_rows(rd.from_arrow(t).repartition(3)))
    assert _tbl_rows(got) == {(1, "x"), (1, None), (2, "x"), (None, None)}


def test_stratified_sample_exact_counts_and_determinism(ray_session):
    import ray.data as rd

    from datavec_ray.misc import sample_stratified

    rng = np.random.default_rng(9)
    t = pa.table({"g": pa.array(rng.integers(0, 8, 1000), pa.int64()),
                  "id": pa.array(np.arange(1000), pa.int64())})
    # group 7 made tiny: min(n, group size) behaviour
    t = t.filter(pc.or_(pc.not_equal(t["g"], 7),
                        pc.less(t["id"], 3)))
    a = dataset_to_table(sample_stratified(
        rd.from_arrow(t).repartition(4), ["g"], "id", 10, seed=3))
    b = dataset_to_table(sample_stratified(
        rd.from_arrow(t).repartition(11), ["g"], "id", 10, seed=3))
    assert _tbl_rows(a) == _tbl_rows(b)     # partitioning-invariant
    counts = {g: c for g, c in zip(*np.unique(
        a["g"].to_numpy(zero_copy_only=False), return_counts=True))}
    sizes = {g: c for g, c in zip(*np.unique(
        t["g"].to_numpy(zero_copy_only=False), return_counts=True))}
    for g, size in sizes.items():
        assert counts.get(g, 0) == min(10, size)
    # a different seed picks a different set
    c = dataset_to_table(sample_stratified(
        rd.from_arrow(t).repartition(4), ["g"], "id", 10, seed=4))
    assert _tbl_rows(c) != _tbl_rows(a)


# ---------------------------------------------------------------------------
# time travel / change feed
# ---------------------------------------------------------------------------

_KEYCOLS = ["conv_id", "turn_idx"]


def _keys(t: pa.Table):
    return set(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()))


def _payload_map(t: pa.Table):
    return {k: p for k, p in zip(
        _key_list(t),
        zip(t["role"].to_pylist(), t["text"].to_pylist(),
            t["tool"].to_pylist(), t["ts"].to_pylist()))}


def _key_list(t: pa.Table):
    return list(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()))


@pytest.fixture(scope="module")
def tt_engine(ray_session, tmp_path_factory):
    from datavec_ray.cdc.engine import CdcIngestEngine
    binlog = synth_binlog(6000, seed=11)
    segs = split_segments(binlog, 3)
    lake = str(tmp_path_factory.mktemp("ttlake"))
    eng = CdcIngestEngine(lake, num_partitions=4)
    for i, seg in enumerate(segs, 1):
        eng.replay(seg, checkpoint_name=f"seg{i}")
    yield eng, binlog, segs
    eng.shutdown()


def test_versions_and_watermarks(tt_engine):
    eng, binlog, segs = tt_engine
    tt = eng.time_travel()
    vs = tt.versions()
    assert [v["name"] for v in vs] == ["seg1", "seg2", "seg3"]
    wms = [v["lsn_hi"] for v in vs]
    assert wms == sorted(wms) and wms[-1] == int(pc.max(binlog["lsn"]).as_py())


def test_read_state_at_matches_oracle_prefix(tt_engine):
    eng, binlog, segs = tt_engine
    tt = eng.time_travel()
    for upto, name in ((1, "seg1"), (2, "seg2"), (3, "seg3")):
        expect = replay_oracle(pa.concat_tables(segs[:upto]))
        got = dataset_to_table(tt.read_state_at(name)).sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")])
        assert got.num_rows == expect.num_rows
        for c in ("conv_id", "turn_idx", "role", "text", "tool"):
            assert got[c].cast(expect[c].type).to_pylist() == \
                expect[c].to_pylist(), (name, c)


def test_read_state_as_of_lsn(tt_engine):
    eng, binlog, segs = tt_engine
    tt = eng.time_travel()
    wm1 = tt.versions()[0]["lsn_hi"]
    expect = replay_oracle(segs[0])
    got = dataset_to_table(tt.read_state_as_of(wm1))
    assert _keys(got) == _keys(expect)
    # an lsn between watermarks resolves to the earlier snapshot
    got2 = dataset_to_table(tt.read_state_as_of(wm1 + 1))
    assert _keys(got2) == _keys(expect)
    # before the first snapshot: empty
    assert dataset_to_table(tt.read_state_as_of(0)).num_rows == 0


def test_change_feed_between_segments(tt_engine):
    eng, binlog, segs = tt_engine
    tt = eng.time_travel()
    s1 = replay_oracle(segs[0])
    s2 = replay_oracle(pa.concat_tables(segs[:2]))
    feed = dataset_to_table(tt.change_feed("seg1", "seg2"))
    by_type = {ct: feed.filter(pc.equal(feed["change_type"], ct))
               for ct in ("insert", "update", "delete")}
    k1, k2 = _keys(s1), _keys(s2)
    assert _keys(by_type["insert"]) == k2 - k1
    assert _keys(by_type["delete"]) == k1 - k2
    upd = _keys(by_type["update"])
    assert upd <= (k1 & k2)
    # every key whose payload actually changed is reported...
    p1, p2 = _payload_map(s1), _payload_map(s2)
    changed = {k for k in (k1 & k2) if p1[k] != p2[k]}
    assert changed <= upd
    # ...and reported updates carry the NEW payload
    pf = _payload_map(by_type["update"])
    for k in upd:
        assert pf[k] == p2[k]
    # feed keys are unique
    assert len(_key_list(feed)) == len(_keys(feed))


def test_change_feed_from_empty_is_all_inserts(tt_engine):
    eng, binlog, segs = tt_engine
    tt = eng.time_travel()
    s1 = replay_oracle(segs[0])
    feed = dataset_to_table(tt.change_feed(None, "seg1"))
    live = feed.filter(pc.not_equal(feed["change_type"], "delete"))
    assert set(live["change_type"].to_pylist()) == {"insert"}
    assert _keys(live) == _keys(s1)


def test_prune_versions_retention(ray_session, tmp_path):
    from datavec_ray.cdc.engine import CdcIngestEngine

    binlog = synth_binlog(3000, seed=21)
    segs = split_segments(binlog, 3)
    eng = CdcIngestEngine(str(tmp_path / "lake"), num_partitions=2)
    for i, seg in enumerate(segs, 1):
        eng.replay(seg, checkpoint_name=f"s{i}")
    tt = eng.time_travel()
    assert [v["available"] for v in tt.versions()] == [True] * 3
    assert tt.prune_versions(keep_last=1) == ["s1", "s2"]
    vs = tt.versions()
    assert [v["available"] for v in vs] == [False, False, True]
    # as-of resolution skips pruned segments: everything now resolves
    # to the latest surviving snapshot
    assert tt.resolve_as_of(vs[0]["lsn_hi"]) is None
    assert tt.resolve_as_of(vs[2]["lsn_hi"]) == "s3"
    # latest still readable and equal to the full replay oracle
    expect = replay_oracle(binlog)
    got = dataset_to_table(tt.read_state_at("s3"))
    assert _keys(got) == _keys(expect)
    # pruning is idempotent and never removes the last survivor
    assert tt.prune_versions(keep_last=1) == []
    eng.shutdown()


def test_engine_metrics_rollup(tt_engine):
    eng, binlog, segs = tt_engine
    m = eng.metrics()
    assert m["checkpoints"] == 3
    assert m["partitions_committed"] == 4
    assert m["watermark"] == int(pc.max(binlog["lsn"]).as_py())
    # per-partition watermark = max lsn DELIVERED to that partition, so
    # the spread is bounded by the global watermark
    assert m["partition_watermark_min"] <= m["partition_watermark_max"] \
        == m["watermark"]
    # every binlog event reached a commit exactly once across segments
    assert m["events_applied"] <= binlog.num_rows   # pre-compaction combiner
    assert m["rows_live"] > 0 and m["deletes"] >= 0


# -- retract feed + incremental aggregate views -------------------------------

def _multiset(t: pa.Table):
    from collections import Counter
    cs = ["conv_id", "turn_idx", "role", "text", "tool"]
    return Counter(zip(*[t[c].to_pylist() for c in cs]))


def test_retract_feed_applies_old_to_new(tt_engine):
    """Applying the retract stream to the old live multiset yields the
    new live multiset exactly (the defining property of a retract
    stream), and every update is a -1/+1 pair on the same key."""
    eng, binlog, segs = tt_engine
    tt = eng.time_travel()
    old = dataset_to_table(tt.read_state_at("seg1"))
    new = dataset_to_table(tt.read_state_at("seg2"))
    feed = dataset_to_table(tt.retract_feed("seg1", "seg2"))
    m = _multiset(old)
    for row, sign in zip(zip(feed["conv_id"].to_pylist(),
                             feed["turn_idx"].to_pylist(),
                             feed["role"].to_pylist(),
                             feed["text"].to_pylist(),
                             feed["tool"].to_pylist()),
                         feed["sign"].to_pylist()):
        m[row] += sign
    assert +m == _multiset(new)
    # from-empty feed is all +1 and equals the snapshot
    f0 = dataset_to_table(tt.retract_feed(None, "seg1"))
    assert set(f0["sign"].to_pylist()) == {1}
    assert _multiset(f0) == _multiset(old)


def test_aggview_incremental_matches_direct_and_oracle(tt_engine):
    from datavec_ray.cdc.aggview import AggView

    eng, binlog, segs = tt_engine
    tt = eng.time_travel()
    view = AggView(keys=["role"],
                   specs=[("turn_idx", "Sum", "sum_turn"),
                          ("turn_idx", "Mean", "mean_turn"),
                          ("role", "Count", "n")])
    st = view.build(tt.read_state_at("seg1"))
    st = view.advance(st, tt.retract_feed("seg1", "seg2"))
    st = view.advance(st, tt.retract_feed("seg2", "seg3"))
    inc = view.finalize(st)
    direct = view.finalize(view.build(tt.read_state_at("seg3")))
    orc = replay_oracle(binlog).group_by("role").aggregate(
        [("turn_idx", "sum"), ("turn_idx", "mean"), ([], "count_all")]
    ).sort_by([("role", "ascending")])
    assert inc.num_rows == direct.num_rows == orc.num_rows
    for got in (inc, direct):
        assert got["role"].to_pylist() == orc["role"].to_pylist()
        assert got["sum_turn"].to_pylist() == \
            orc["turn_idx_sum"].to_pylist()
        assert got["n"].to_pylist() == orc["count_all"].to_pylist()
        for x, y in zip(got["mean_turn"].to_pylist(),
                        orc["turn_idx_mean"].to_pylist()):
            assert abs(x - y) < 1e-9


def test_aggview_group_vanishes_on_full_retraction(ray_session, tmp_path):
    """A group whose rows are all deleted disappears from the view —
    exactly what a recompute would produce."""
    from datavec_ray.cdc.aggview import AggView
    from datavec_ray.cdc.engine import CdcIngestEngine

    def seg(rows):
        return pa.table({
            "lsn": pa.array([r[0] for r in rows], pa.int64()),
            "op": pa.array([r[1] for r in rows], pa.string()),
            "conv_id": pa.array([r[2] for r in rows], pa.string()),
            "turn_idx": pa.array([r[3] for r in rows], pa.int64()),
            "role": pa.array([r[4] for r in rows], pa.string()),
            "text": pa.array([r[5] for r in rows], pa.string()),
            "tool": pa.array([None] * len(rows), pa.string()),
            "ts": pa.array([1000 + r[0] for r in rows],
                           pa.timestamp("ms")),
        })

    s1 = seg([(1, "I", "c1", 0, "user", "a"),
              (2, "I", "c1", 1, "assistant", "b"),
              (3, "I", "c2", 0, "tool", "c")])
    s2 = seg([(4, "D", "c2", 0, None, None),      # group 'tool' vanishes
              (5, "U", "c1", 1, "assistant", "b2")])
    eng = CdcIngestEngine(str(tmp_path / "vlake"), num_partitions=2)
    eng.replay(s1, checkpoint_name="v1")
    eng.replay(s2, checkpoint_name="v2")
    tt = eng.time_travel()
    view = AggView(keys=["role"], specs=[("role", "Count", "n"),
                                         ("turn_idx", "Sum", "s")])
    st = view.build(tt.read_state_at("v1"))
    assert set(view.finalize(st)["role"].to_pylist()) == \
        {"user", "assistant", "tool"}
    st = view.advance(st, tt.retract_feed("v1", "v2"))
    out = view.finalize(st)
    assert set(out["role"].to_pylist()) == {"user", "assistant"}
    assert out.to_pydict()["n"] == [1, 1]
    eng.shutdown()


def test_aggview_rejects_non_invertible_ops():
    from datavec_ray.cdc.aggview import AggView
    with pytest.raises(ValueError):
        AggView(keys=["role"], specs=[("turn_idx", "Min", "m")])


def test_recompute_aggview_non_invertible(tt_engine):
    """Affected-group-recompute view for non-invertible ops: advancing
    snapshot by snapshot equals a from-scratch build at the head."""
    from datavec_ray.cdc.aggview import RecomputeAggView

    eng, binlog, segs = tt_engine
    tt = eng.time_travel()
    view = RecomputeAggView(
        keys=["role"],
        specs=[("turn_idx", "Min", "lo"), ("turn_idx", "Max", "hi"),
               ("text", "CountUniqueExact", "uniq_texts"),
               ("turn_idx", "Stdev", "sd")])
    v = view.build(tt.read_state_at("seg1"))
    v = view.advance(v, tt.retract_feed("seg1", "seg2"),
                     tt.read_state_at("seg2"))
    v = view.advance(v, tt.retract_feed("seg2", "seg3"),
                     tt.read_state_at("seg3"))
    direct = view.build(tt.read_state_at("seg3"))
    assert v.num_rows == direct.num_rows
    for c in direct.column_names:
        for x, y in zip(v[c].to_pylist(), direct[c].to_pylist()):
            if isinstance(x, float):
                assert abs(x - y) < 1e-9, (c, x, y)
            else:
                assert x == y, (c, x, y)
    # empty delta: advance is a no-op returning the same view object
    same = view.advance(v, tt.retract_feed("seg3", "seg3"),
                        tt.read_state_at("seg3"))
    assert same.equals(v) or same.num_rows == v.num_rows


def test_lake_point_lookup(ray_session, tmp_path):
    """lookup() reads only the owning partitions and returns exactly
    the requested conversations' live rows — including salted hot
    conversations spread over several partitions."""
    import os

    from datavec_ray.cdc.engine import CdcIngestEngine

    binlog = synth_binlog(5000, seed=31)
    hot = binlog["conv_id"].to_pylist()[0]
    eng = CdcIngestEngine(str(tmp_path / "plake"), num_partitions=8,
                          salt_turns=3, hot_convs=[hot])
    eng.replay(binlog, checkpoint_name="v1")
    full = eng.read_lake()
    want = sorted({c for c in full["conv_id"].to_pylist()})[:3] + [hot]
    got = eng.lookup(want)
    exp = full.filter(pc.is_in(full["conv_id"],
                               value_set=pa.array(sorted(set(want)))))
    exp = exp.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got.num_rows == exp.num_rows > 0
    for c in ("conv_id", "turn_idx", "role", "text"):
        assert got[c].to_pylist() == exp[c].to_pylist(), c
    # empty request
    assert eng.lookup([]).num_rows == 0
    # unknown conversation: no rows, no error
    assert eng.lookup(["conv-none-such"]).num_rows == 0
    eng.shutdown()


def test_aggview_event_time_windows(tt_engine):
    """Windowed incremental aggregates by composition: derive an
    event-time bucket on both the snapshot and the retract feed, key
    the AggView by (bucket, role) — tumbling-window counts maintained
    incrementally, equal to a from-scratch build."""
    from datavec_ray.cdc.aggview import AggView

    eng, binlog, segs = tt_engine
    tt = eng.time_travel()
    W = 60_000  # 1-minute tumbling windows

    def bucket(ds):
        def b(t: pa.Table) -> pa.Table:
            w = pc.divide(t["ts"].cast(pa.int64()), W)
            return t.append_column(pa.field("w", pa.int64()), w)
        return ds.map_batches(b, batch_format="pyarrow")

    view = AggView(keys=["w", "role"],
                   specs=[("role", "Count", "n"),
                          ("turn_idx", "Mean", "mu")])
    st = view.build(bucket(tt.read_state_at("seg1")))
    st = view.advance(st, bucket(tt.retract_feed("seg1", "seg2")))
    st = view.advance(st, bucket(tt.retract_feed("seg2", "seg3")))
    inc = view.finalize(st)
    direct = view.finalize(view.build(bucket(tt.read_state_at("seg3"))))
    assert inc.num_rows == direct.num_rows > 0
    for c in inc.column_names:
        for x, y in zip(inc[c].to_pylist(), direct[c].to_pylist()):
            if isinstance(x, float):
                assert abs(x - y) < 1e-9, (c, x, y)
            else:
                assert x == y, (c, x, y)


# ---------------------------------------------------------------------------
# JoinView: incrementally-maintained materialized join view
# ---------------------------------------------------------------------------

def _jv_side(parity: int, text_name: str):
    def fn(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        turn = t["turn_idx"].cast(pa.int64())
        s = t.filter(pc.equal(pc.bit_wise_and(turn, 1), parity))
        return pa.table({
            "conv_id": s["conv_id"],
            "pair": pc.shift_right(s["turn_idx"].cast(pa.int64()), 1),
            text_name: s["text"]})
    fn.__name__ = f"jv_side_p{parity}"
    return fn


def _jv_feed():
    def fn(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        return pa.table({
            "conv_id": t["conv_id"],
            "pair": pc.shift_right(t["turn_idx"].cast(pa.int64()), 1)})
    fn.__name__ = "jv_feed_keys"
    return fn


@pytest.mark.parametrize("how", ["inner", "left", "full"])
def test_joinview_incremental_matches_direct(tt_engine, how):
    """Build on seg1, advance through seg2 and seg3 — the spliced view
    equals a from-scratch build on seg3, byte for byte, for inner and
    outer joins alike."""
    from datavec_ray.cdc.joinview import JoinView

    eng, binlog, segs = tt_engine
    tt = eng.time_travel()
    jv = JoinView(on=["conv_id", "pair"], how=how, num_partitions=4)
    L, R = _jv_side(0, "q_text"), _jv_side(1, "a_text")

    def sides(name):
        return (tt.read_state_at(name).map_batches(L, batch_format="pyarrow"),
                tt.read_state_at(name).map_batches(R, batch_format="pyarrow"))

    view = jv.build(*sides("seg1"))
    for a, b in (("seg1", "seg2"), ("seg2", "seg3")):
        feed = tt.retract_feed(a, b).map_batches(
            _jv_feed(), batch_format="pyarrow")
        view = jv.advance(view, [feed], *sides(b))
    direct = jv.build(*sides("seg3"))
    assert view.num_rows == direct.num_rows > 0
    assert view.schema.equals(direct.schema)
    for c in view.column_names:
        assert view[c].to_pylist() == direct[c].to_pylist(), c
    if how != "inner":
        # outer rows with a missing side really occur in the fixture
        assert pc.sum(pc.is_null(view["a_text"]).cast(pa.int8())).as_py() > 0


def test_joinview_empty_delta_and_collisions(ray_session, tt_engine):
    import ray.data as rd

    from datavec_ray.cdc.joinview import JoinView

    eng, binlog, segs = tt_engine
    tt = eng.time_travel()
    jv = JoinView(on=["conv_id", "pair"], num_partitions=4)
    L, R = _jv_side(0, "q_text"), _jv_side(1, "a_text")
    lds = tt.read_state_at("seg1").map_batches(L, batch_format="pyarrow")
    rds = tt.read_state_at("seg1").map_batches(R, batch_format="pyarrow")
    view = jv.build(lds, rds)
    empty = rd.from_arrow(pa.table(
        {"conv_id": pa.array([], pa.string()),
         "pair": pa.array([], pa.int64())}))
    assert jv.advance(view, [empty],
                      tt.read_state_at("seg1").map_batches(
                          L, batch_format="pyarrow"),
                      tt.read_state_at("seg1").map_batches(
                          R, batch_format="pyarrow")) is view
    # colliding non-key columns are rejected up front
    both = _jv_side(0, "q_text")
    with pytest.raises(ValueError, match="both sides"):
        JoinView(on=["conv_id", "pair"]).build(
            tt.read_state_at("seg1").map_batches(both,
                                                 batch_format="pyarrow"),
            tt.read_state_at("seg1").map_batches(both,
                                                 batch_format="pyarrow"))
    with pytest.raises(ValueError, match="how"):
        JoinView(on=["conv_id"], how="cross")


# ---------------------------------------------------------------------------
# lake repartitioning (layout evolution)
# ---------------------------------------------------------------------------

def test_repartition_grow_shrink_preserves_state(ray_session, tmp_path):
    from datavec_ray.cdc.engine import (CdcIngestEngine,
                                        detect_num_partitions)

    binlog = synth_binlog(4000, seed=33)
    segs = split_segments(binlog, 2)
    eng = CdcIngestEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.replay(segs[0], checkpoint_name="s1")
    wm_before = eng.manifest.watermark()

    # grow 4 -> 8: full state preserved, watermark never regresses
    eng.repartition(8, checkpoint_name="r8")
    assert eng.num_partitions == 8
    assert detect_num_partitions(str(tmp_path / "lake")) == 8
    assert eng.manifest.watermark() >= wm_before
    expect1 = replay_oracle(segs[0])
    got1 = eng.read_lake()
    assert got1.num_rows == expect1.num_rows
    assert _payload_map(got1) == _payload_map(expect1)

    # ingest the second segment on the NEW layout
    eng.replay(segs[1], checkpoint_name="s2")
    expect = replay_oracle(binlog)
    got = eng.read_lake()
    assert _payload_map(got) == _payload_map(expect)

    # shrink 8 -> 2: stale lake files removed, state still exact
    eng.repartition(2, checkpoint_name="r2")
    import os
    files = [f for f in os.listdir(str(tmp_path / "lake"))
             if f.startswith("part-") and f.endswith(".parquet")]
    assert sorted(files) == ["part-0000.parquet", "part-0001.parquet"]
    assert detect_num_partitions(str(tmp_path / "lake")) == 2
    assert _payload_map(eng.read_lake()) == _payload_map(expect)

    # lookups route on the new layout
    some = expect["conv_id"].to_pylist()[0]
    assert eng.lookup([some]).num_rows > 0

    # feeds cannot cross the layout boundary; within one layout they work
    tt = eng.time_travel()
    with pytest.raises(ValueError, match="repartition boundary"):
        tt.retract_feed("s1", "r2")
    with pytest.raises(ValueError, match="repartition boundary"):
        tt.change_feed("s2", "r2")
    assert dataset_to_table(tt.change_feed(None, "r2")).num_rows > 0
    eng.shutdown()


def test_repartition_then_reopen_and_resume(ray_session, tmp_path):
    from datavec_ray.cdc.engine import (CdcIngestEngine,
                                        detect_num_partitions)

    binlog = synth_binlog(2500, seed=44)
    segs = split_segments(binlog, 2)
    lake = str(tmp_path / "lake")
    eng = CdcIngestEngine(lake, num_partitions=3)
    eng.replay(segs[0], checkpoint_name="a")
    eng.repartition(6, checkpoint_name="r6")
    eng.shutdown()

    eng2 = CdcIngestEngine(lake, num_partitions=detect_num_partitions(lake))
    assert eng2.num_partitions == 6
    wm = eng2.resume_from_checkpoint()
    assert wm >= int(max(segs[0]["lsn"].to_pylist()))
    eng2.replay(segs[1], checkpoint_name="b")
    assert _payload_map(eng2.read_lake()) == _payload_map(
        replay_oracle(binlog))
    eng2.shutdown()


def test_secondary_index_lookup(ray_session, tmp_path):
    """Bloom-sidecar non-key lookups: exact results, pruned reads,
    persistence across engine restarts, staleness-triggered rebuild."""
    import os

    from datavec_ray.cdc.engine import CdcIngestEngine

    binlog = synth_binlog(4000, seed=17)
    eng = CdcIngestEngine(str(tmp_path / "slake"), num_partitions=8)
    eng.replay(binlog, checkpoint_name="v1")
    full = eng.read_lake()

    idx = eng.secondary_index(["role", "tool"])
    manifest = idx.build()
    assert manifest["partitions"] > 0

    # exact vs full-scan oracle on a non-key column
    got = idx.lookup("role", ["assistant"])
    exp = full.filter(pc.equal(full["role"], "assistant")).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got["conv_id"].to_pylist() == exp["conv_id"].to_pylist()
    assert got["turn_idx"].to_pylist() == exp["turn_idx"].to_pylist()

    # a value that exists in few partitions prunes the read set
    tools = [t for t in set(full["tool"].to_pylist()) if t][:1]
    cand = idx.candidate_partitions("tool", tools)
    assert 0 < len(cand) <= 8
    got_t = idx.lookup("tool", tools)
    exp_t = full.filter(pc.is_in(full["tool"], value_set=pa.array(tools)))
    assert got_t.num_rows == exp_t.num_rows > 0

    # absent value: no candidate partitions, empty exact result
    assert idx.candidate_partitions("role", ["no-such-role"]) == [] or \
        idx.lookup("role", ["no-such-role"]).num_rows == 0

    # unindexed column refuses
    with pytest.raises(KeyError):
        idx.lookup("text", ["x"])

    # persistence: a fresh index object loads sidecars from disk
    idx2 = eng.secondary_index(["role", "tool"])
    assert idx2.load()
    assert idx2.lookup("role", ["assistant"],
                       check_fresh=False).num_rows == got.num_rows

    # staleness: advance the lake, refresh() rebuilds and sees new rows
    more = synth_binlog(6000, seed=17).slice(4000)
    eng.replay(more, checkpoint_name="v2")
    idx.refresh()
    full2 = eng.read_lake()
    got2 = idx.lookup("role", ["assistant"])
    exp2 = full2.filter(pc.equal(full2["role"], "assistant"))
    assert got2.num_rows == exp2.num_rows
    eng.shutdown()


def test_secondary_index_incremental_refresh(ray_session, tmp_path):
    """refresh() after new commits re-indexes only the partitions whose
    committed watermark advanced — and still answers exactly."""
    from datavec_ray.cdc.engine import CdcIngestEngine

    binlog = synth_binlog(3000, seed=23)
    eng = CdcIngestEngine(str(tmp_path / "ilake"), num_partitions=6)
    eng.replay(binlog.slice(0, 2000), checkpoint_name="v1")
    idx = eng.secondary_index(["role"])
    idx.build()
    before = dict(idx._pid_watermarks)

    # touch a SUBSET of partitions with a tiny second segment
    eng.replay(binlog.slice(2000, 60), checkpoint_name="v2")
    wms = eng.manifest.committed_watermarks()
    changed = {p for p, w in wms.items() if before.get(p) != w}
    assert changed and len(changed) <= 6
    idx.refresh()
    # unchanged partitions kept their stamp; changed ones advanced
    for p, w in idx._pid_watermarks.items():
        assert w == wms.get(p)
    full = eng.read_lake()
    got = idx.lookup("role", ["user"])
    exp = full.filter(pc.equal(full["role"], "user"))
    assert got.num_rows == exp.num_rows > 0
    eng.shutdown()


def test_secondary_index_lookup_and(ray_session, tmp_path):
    from datavec_ray.cdc.engine import CdcIngestEngine

    binlog = synth_binlog(3000, seed=29)
    eng = CdcIngestEngine(str(tmp_path / "alake"), num_partitions=8)
    eng.replay(binlog, checkpoint_name="v1")
    full = eng.read_lake()
    idx = eng.secondary_index(["role", "tool"])
    idx.build()
    tool = [t for t in set(full["tool"].to_pylist()) if t][0]
    got = idx.lookup_and({"role": ["assistant"], "tool": [tool]})
    exp = full.filter(pc.and_(pc.equal(full["role"], "assistant"),
                              pc.equal(full["tool"], tool)))
    assert got.num_rows == exp.num_rows
    # intersection prunes at least as hard as either column alone
    c_and = set(idx.candidate_partitions("role", ["assistant"])) \
        & set(idx.candidate_partitions("tool", [tool]))
    assert len(c_and) <= len(idx.candidate_partitions("role", ["assistant"]))
    eng.shutdown()


def test_topn_view_advance_equals_direct(tt_engine):
    """Incrementally maintained leaderboard: advancing the per-conv
    top-2-most-recent-turns view snapshot by snapshot equals a
    from-scratch build at the head."""
    from datavec_ray.cdc.aggview import TopNView

    eng, binlog, segs = tt_engine
    tt = eng.time_travel()
    view = TopNView(keys=["conv_id"], order_col="turn_idx", n=2,
                    descending=True)
    v = view.build(tt.read_state_at("seg1"))
    v = view.advance(v, tt.retract_feed("seg1", "seg2"),
                     tt.read_state_at("seg2"))
    v = view.advance(v, tt.retract_feed("seg2", "seg3"),
                     tt.read_state_at("seg3"))
    direct = view.build(tt.read_state_at("seg3"))
    assert v.num_rows == direct.num_rows
    for c in direct.column_names:
        assert v[c].to_pylist() == direct[c].to_pylist(), c
    # empty delta: no-op
    same = view.advance(v, tt.retract_feed("seg3", "seg3"),
                        tt.read_state_at("seg3"))
    assert same.num_rows == v.num_rows
