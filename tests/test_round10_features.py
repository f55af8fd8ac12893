"""Round-3 session-7 additions: nullable-int hash consistency in
hash64 (a latent group-splitting bug exposed by tree_paths), the
edit_pairs version-pair miner, tree_paths pointer-doubling
linearization, and the change-feed / as-of driver queries' building
blocks."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from datavec_ray.util import dataset_to_table


def test_hash64_int_with_nulls_matches_without():
    """The same int64 value must hash identically whether or not its
    batch happens to contain a null — otherwise hash partitioning
    splits a key group across partitions (bug found via tree_paths:
    blocks holding the root's null parent float64-converted the whole
    key column)."""
    from datavec_ray.hll import hash64

    clean = pa.array([158, 5, 0, -3], pa.int64())
    dirty = pa.array([158, None, 5, 0, None, -3], pa.int64())
    h_clean = hash64(clean)
    h_dirty = hash64(dirty)
    assert h_clean[0] == h_dirty[0]          # 158
    assert h_clean[1] == h_dirty[2]          # 5
    assert h_clean[2] == h_dirty[3]          # 0
    assert h_clean[3] == h_dirty[5]          # -3
    assert h_clean.dtype == np.uint64 and h_dirty.dtype == np.uint64


def test_row_hash_null_int_keys_consistent():
    """_row_hash partition assignment for a value must not depend on
    null presence elsewhere in the batch; nulls keep their own
    distinct marker."""
    from datavec_ray.ops.setops import _row_hash

    a = pa.table({"k": pa.array([7, 7, 9], pa.int64())})
    b = pa.table({"k": pa.array([7, None, 9], pa.int64())})
    ha, hb = _row_hash(a, ["k"]), _row_hash(b, ["k"])
    assert ha[0] == hb[0] and ha[2] == hb[2]
    assert hb[1] != hb[0]                    # null is its own group


def _mini_binlog() -> pa.Table:
    # key (c, 0): three versions in (ts, lsn) order, with an
    # out-of-order arrival (lsn 5 has an OLDER ts than lsn 3) and a
    # same-ts LSN tiebreak; key (c, 1): insert then delete (no pair);
    # key (d, 0): single version (no pair).
    return pa.table({
        "lsn": pa.array([1, 3, 5, 7, 2, 4, 6], pa.int64()),
        "op": pa.array(["I", "U", "U", "U", "I", "D", "I"], pa.string()),
        "conv_id": pa.array(["c", "c", "c", "c", "c", "c", "d"]),
        "turn_idx": pa.array([0, 0, 0, 0, 1, 1, 0], pa.int32()),
        "role": pa.array(["user"] * 7, pa.string()),
        "text": pa.array(["v1", "v3", "v2", "v4", "x", None, "solo"]),
        "tool": pa.array([None] * 7, pa.string()),
        "ts": pa.array([100, 300, 200, 300, 100, 200, 100],
                       pa.timestamp("ms")),
    })


def test_edit_pairs_lww_order_and_tombstones(ray_session):
    from datavec_ray.cdc.binlog import edit_pairs

    out = dataset_to_table(
        edit_pairs(rd.from_arrow(_mini_binlog()).repartition(3),
                   num_partitions=4)).to_pandas() \
        .sort_values("lsn").reset_index(drop=True)
    # (c,0) in (ts,lsn) order: v1(100,1) -> v2(200,5) -> v3(300,3)
    #                          -> v4(300,7); pairs keyed by current lsn
    assert list(out["lsn"]) == [3, 5, 7]
    assert list(out["prev_text"]) == ["v2", "v1", "v3"]
    assert list(out["text"]) == ["v3", "v2", "v4"]
    assert list(out["prev_ts_ms"]) == [200, 100, 300]
    assert list(out["ts_ms"]) == [300, 200, 300]
    # deleted key (c,1) and single-version (d,0) emit nothing
    assert set(out["turn_idx"]) == {0}
    assert set(out["conv_id"]) == {"c"}


def test_tree_paths_forest_and_missing_root(ray_session):
    from datavec_ray.ops.graph import tree_paths

    #      1           10          99 (parent 50 absent from input)
    #     / \           |
    #    2   3         11
    #        |
    #        4
    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 10, 11, 99], pa.int64()),
        "parent": pa.array([None, 1, 1, 3, None, 10, 50], pa.int64()),
    })
    out = dataset_to_table(
        tree_paths(rd.from_arrow(t).repartition(3), num_partitions=4)
    ).to_pandas().sort_values("id").reset_index(drop=True)
    got = {int(r.id): (int(r.depth), r.path) for r in out.itertuples()}
    assert got == {2: (2, "1/2"), 4: (3, "1/3/4"),
                   11: (2, "10/11"), 99: (1, "99")}

    # leaves_only=False keeps every node's root path
    full = dataset_to_table(
        tree_paths(rd.from_arrow(t), leaves_only=False, num_partitions=2)
    ).to_pandas()
    by_id = dict(zip(full["id"], full["path"]))
    assert by_id[1] == "1" and by_id[3] == "1/3" and by_id[10] == "10"


def test_tree_paths_deep_chain_log_rounds(ray_session):
    """A 64-deep chain resolves (pointer doubling: 7 rounds, not 64)
    and yields the exact path."""
    from datavec_ray.ops.graph import tree_paths

    n = 64
    ids = np.arange(1, n + 1, dtype=np.int64)
    t = pa.table({
        "id": pa.array(ids),
        "parent": pa.array(np.maximum(ids - 1, 0), pa.int64(),
                           mask=(ids == 1)),
    })
    out = dataset_to_table(
        tree_paths(rd.from_arrow(t).repartition(4), num_partitions=4,
                   max_rounds=8)).to_pandas()
    assert len(out) == 1
    assert int(out["depth"].iloc[0]) == n
    assert out["path"].iloc[0] == "/".join(str(i) for i in range(1, n + 1))


def test_tree_paths_labels(ray_session):
    from datavec_ray.ops.graph import tree_paths

    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "parent": pa.array([None, 1, 2], pa.int64()),
        "text": pa.array(["sys", "user", "asst"]),
    })
    out = dataset_to_table(
        tree_paths(rd.from_arrow(t), label_col="text", sep=" | ",
                   num_partitions=2)).to_pandas()
    assert list(out["path"]) == ["sys | user | asst"]


def test_change_feed_vs_from_scratch_states(ray_session, tmp_path):
    """change_feed(v1, v2) classification matches a from-scratch diff
    of the two LWW states on a binlog with updates, deletes and
    late (stale) arrivals."""
    import duckdb

    from datavec_ray.cdc.binlog import synth_binlog
    from datavec_ray.cdc.engine import CdcIngestEngine

    binlog = synth_binlog(4000, seed=11)
    cut = 2000
    eng = CdcIngestEngine(str(tmp_path / "lake"), num_partitions=4)
    try:
        eng.replay(rd.from_arrow(binlog.filter(
            pa.compute.less_equal(binlog["lsn"], cut))),
            checkpoint_name="v1")
        eng.replay(rd.from_arrow(binlog.filter(
            pa.compute.greater(binlog["lsn"], cut))),
            checkpoint_name="v2")
        feed = dataset_to_table(
            eng.time_travel().change_feed("v1", "v2")).to_pandas()
    finally:
        eng.shutdown()

    con = duckdb.connect()
    con.register("e", binlog.to_pandas())
    oracle = con.execute(f"""
        with w as (select *, epoch_ms(ts) as ts_ms from e),
        s2 as (select * from (select *, row_number() over
                 (partition by conv_id, turn_idx
                  order by ts_ms desc, lsn desc) rn from w) where rn=1),
        s1 as (select * from (select *, row_number() over
                 (partition by conv_id, turn_idx
                  order by ts_ms desc, lsn desc) rn from w
               where lsn <= {cut}) where rn=1)
        select s2.conv_id, s2.turn_idx,
               case when s2.op = 'D' then 'delete'
                    when s1.lsn is not null and s1.op <> 'D'
                         then 'update' else 'insert' end as change_type,
               s2.lsn
        from s2 left join s1
          on s1.conv_id = s2.conv_id and s1.turn_idx = s2.turn_idx
        where (s1.lsn is null or s1.lsn <> s2.lsn)
          and (s2.op <> 'D' or (s1.lsn is not null and s1.op <> 'D'))
        order by s2.conv_id, s2.turn_idx""").fetchdf()
    got = feed[["conv_id", "turn_idx", "change_type", "lsn"]] \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    oracle["turn_idx"] = oracle["turn_idx"].astype(got["turn_idx"].dtype)
    assert got.equals(oracle.reset_index(drop=True))
    assert set(feed["change_type"]) <= {"insert", "update", "delete"}
    assert (feed["change_type"] == "update").any()
    assert (feed["change_type"] == "delete").any()


def test_preference_pairs_first_vs_last(ray_session):
    from datavec_ray.cdc.binlog import preference_pairs

    out = dataset_to_table(
        preference_pairs(rd.from_arrow(_mini_binlog()).repartition(3),
                         num_partitions=4)).to_pandas()
    # only (c,0) has >=2 live versions; (ts,lsn) order: v1 .. v4
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["conv_id"], r["turn_idx"]) == ("c", 0)
    assert r["rejected"] == "v1" and r["chosen"] == "v4"
    assert r["n_versions"] == 4 and r["lsn"] == 7


def test_conversation_dedup_collapses_copies(ray_session):
    from datavec_ray.ops.dedup import conversation_dedup

    turns = pa.table({
        "conv_id": pa.array(["a", "a", "b", "b", "z", "q"]),
        "turn_idx": pa.array([0, 1, 0, 1, 0, 0], pa.int32()),
        "role": pa.array(["user", "asst", "user", "asst", "user", None]),
        "text": pa.array(["hi", "yo", "hi", "yo", "hi", None]),
    })
    out = dataset_to_table(
        conversation_dedup(rd.from_arrow(turns).repartition(3),
                           num_partitions=4)).to_pandas() \
        .sort_values("conv_id").reset_index(drop=True)
    # b duplicates a (same ordered content) -> only min id 'a' survives;
    # z differs from a (1 turn) and q differs from z (null role/text)
    assert list(out["conv_id"]) == ["a", "q", "z"]
    assert list(out["n_turns"]) == [2, 1, 1]
    assert out["content_hash"].nunique() == 3
