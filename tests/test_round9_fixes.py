"""Regression tests for the round-3 ADVICE findings: null-key groups in
grouped_topn, exact int64 segment bias (and per-segment float fallback)
in range_window_agg, batch-order-independent line_dedup survivors, the
video frame-hash bucket cap, and the random_crop probability gate."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from datavec_ray.util import dataset_to_table


def test_grouped_topn_keeps_null_key_groups(ray_session):
    """SQL QUALIFY row_number() OVER (PARTITION BY g ...) keeps the
    NULL partition; grouped_topn must too (ADVICE: dropna default)."""
    from datavec_ray.misc import grouped_topn

    t = pa.table({
        "g": pa.array(["a", "a", "a", None, None, None, "b"], pa.string()),
        "v": pa.array([5, 3, 9, 7, 1, 8, 2], pa.int64()),
        "id": pa.array(range(7), pa.int64()),
    })
    got = dataset_to_table(grouped_topn(
        rd.from_arrow(t).repartition(3), ["g"], "v", 2,
        tiebreak=["id"])).to_pandas()
    null_rows = got[got["g"].isna()].sort_values("v", ascending=False)
    assert list(null_rows["v"]) == [8, 7]       # top-2 of the NULL group
    assert sorted(got[got["g"] == "a"]["v"]) == [5, 9]
    assert list(got[got["g"] == "b"]["v"]) == [2]


def test_range_window_agg_many_keys_epoch_ms(ray_session):
    """>2048 distinct keys with epoch-ms timestamps and 1-ms gaps — the
    regime where the old float64 segment bias lost ms resolution. The
    int64 bias (and the oracle) must agree exactly."""
    from datavec_ray.misc import range_window_agg

    rng = np.random.default_rng(9)
    n_keys, per = 3000, 4
    base = 1_700_000_000_000
    k = np.repeat(np.arange(n_keys, dtype=np.int64), per)
    t = base + rng.integers(0, 30, n_keys * per, dtype=np.int64)
    v = rng.normal(0, 1, n_keys * per).round(3)
    tbl = pa.table({"k": k, "t": t, "v": v})
    got = dataset_to_table(
        range_window_agg(rd.from_arrow(tbl).repartition(5), ["k"], "t",
                         "v", width=10, out_col="s", agg="count",
                         num_partitions=2)).to_pandas() \
        .sort_values(["k", "t", "v"]).reset_index(drop=True)
    ora = duckdb.sql("""
        select k, t, v, count(*) over (partition by k order by t
          range between 10 preceding and current row) as s
        from tbl order by k, t, v""").df().reset_index(drop=True)
    assert (got["s"].to_numpy() == ora["s"].to_numpy()).all()


def test_range_window_agg_float_order_col(ray_session):
    """Float order columns take the per-segment searchsorted path."""
    from datavec_ray.misc import range_window_agg

    rng = np.random.default_rng(11)
    n = 300
    tbl = pa.table({
        "k": pa.array(rng.integers(0, 9, n), pa.int64()),
        "t": pa.array(np.sort(rng.uniform(0, 40, n)), pa.float64()),
        "v": pa.array(rng.normal(5, 2, n).round(3), pa.float64()),
    })
    got = dataset_to_table(
        range_window_agg(rd.from_arrow(tbl), ["k"], "t", "v",
                         width=3.5, out_col="s", agg="sum",
                         num_partitions=3)).to_pandas() \
        .sort_values(["k", "t", "v"]).reset_index(drop=True)
    ora = duckdb.sql("""
        select k, t, v, sum(v) over (partition by k order by t
          range between 3.5 preceding and current row) as s
        from tbl order by k, t, v""").df().reset_index(drop=True)
    assert np.allclose(got["s"].astype(float), ora["s"].astype(float),
                       rtol=1e-9)


def test_line_dedup_survivor_independent_of_batch_row_order(ray_session):
    """A shared line must survive in its globally-min (doc_id, line_idx)
    document even when the batch presents the higher doc_id first."""
    from datavec_ray.ops.dedup import line_dedup

    # one block, REVERSE doc order: doc 7 (dup line) precedes doc 2
    t = pa.table({
        "doc_id": pa.array([7, 2], pa.int64()),
        "text": pa.array(["shared line here\nonly in seven",
                          "only in two\nshared line here"], pa.string()),
    })
    out = dataset_to_table(
        line_dedup(rd.from_arrow(t), num_buckets=4)).to_pandas() \
        .set_index("doc_id")["text"].to_dict()
    assert out[2] == "only in two\nshared line here"   # keeps the line
    assert out[7] == "only in seven"                   # loses the dup


def test_video_phash_pairs_oversized_bucket_star(ray_session):
    """Many videos sharing identical frames (title cards) must not emit
    O(n^2) pairs: over max_bucket the bucket star-links to the min id."""
    from datavec_ray.ops.codecs import encode_y4m
    from datavec_ray.ops.multimodal import video_phash_pairs

    yy, xx = np.mgrid[0:16, 0:16]
    frames = np.stack([(96 + 50 * np.sin(xx / 3 + f) * np.cos(yy / 5)
                        ).astype(np.uint8) for f in range(4)])
    payload = encode_y4m(frames)
    n = 12
    tbl = pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "payload": pa.array([payload] * n, pa.binary()),
    })
    pairs = dataset_to_table(video_phash_pairs(
        rd.from_arrow(tbl), n_frames=4, grid=8, min_shared=2,
        deterministic_fake=False, max_bucket=4))
    got = {tuple(sorted((a, b)))
           for a, b in zip(pairs["id_a"].to_pylist(),
                           pairs["id_b"].to_pylist())}
    # star shape: every pair includes the hub (min id), never n^2
    assert got == {(0, i) for i in range(1, n)}


def test_image_random_crop_probability_gate():
    """{'op': 'random_crop', 'p': 0} must crop deterministically at the
    top-left corner (the gate controls randomness, not shape); p=1 must
    equal the ungated random crop."""
    from datavec_ray.hll import hash64
    from datavec_ray.ops.multimodal import ImageAugmentChain
    from datavec_ray.steps.base import combine

    rng = np.random.default_rng(4)
    img = rng.uniform(0, 1, (5, 8, 8))
    ids = hash64(combine(pa.chunked_array([
        pa.array(np.arange(5), pa.int64())])))

    gated_off = ImageAugmentChain(
        [{"op": "random_crop", "h": 4, "w": 4, "p": 0.0}], 8, 8)
    out0 = gated_off.apply_stack(img.copy(), ids)
    assert np.array_equal(out0, img[:, :4, :4])      # corner crop

    gated_on = ImageAugmentChain(
        [{"op": "random_crop", "h": 4, "w": 4, "p": 1.0}], 8, 8)
    ungated = ImageAugmentChain(
        [{"op": "random_crop", "h": 4, "w": 4}], 8, 8)
    assert np.array_equal(gated_on.apply_stack(img.copy(), ids),
                          ungated.apply_stack(img.copy(), ids))
    assert not np.array_equal(gated_on.apply_stack(img.copy(), ids),
                              out0)                  # randomness real


def test_router_window_does_not_serialize_on_hot_shard(ray_session):
    """A slow (hot) shard must not stall the router: applies are
    fire-and-forget behind a bounded ray.wait window, so __call__
    returns while the hot shard is still working, and the counting
    barrier sees every apply delivered afterwards."""
    import time

    import ray

    from datavec_ray.cdc.binlog import synth_binlog
    from datavec_ray.cdc.engine import _Router

    @ray.remote
    class SlowShard:
        def __init__(self, delay):
            self.delay, self.msgs, self.rows = delay, 0, 0

        def apply(self, tbl):
            time.sleep(self.delay)
            self.msgs += 1
            self.rows += tbl.num_rows
            return tbl.num_rows

        def ack_counter(self):
            return self.msgs

    handles = [SlowShard.remote(0.4), SlowShard.remote(0.0)]
    binlog = synth_binlog(2000, seed=3)
    router = _Router(handles, num_partitions=2, schema=binlog.schema,
                     salt_turns=1, hot_convs=None, min_lsn_exclusive=0,
                     window=16)
    t0 = time.time()
    acks = [router(binlog.slice(i * 200, 200)) for i in range(10)]
    routing_sec = time.time() - t0
    # 10 batches x >= 1 apply to the 0.4 s shard would serialize to
    # >= 4 s; the window keeps routing in the sub-second range
    # serialized routing would be >= 4 s (the hot shard's sleep budget);
    # windowed routing is sub-second on a calm host but the margin must
    # tolerate full-suite/host load (observed >2 s flakes under load)
    assert routing_sec < 3.5, f"routers serialized: {routing_sec:.2f}s"
    assert len(router.pending) <= 16
    expected = {}
    rows = 0
    for a in acks:
        for pid, m, r in zip(a["pid"].to_pylist(), a["msgs"].to_pylist(),
                             a["rows"].to_pylist()):
            expected[pid] = expected.get(pid, 0) + m
            rows += r
    # delivery barrier: poll until each shard processed every apply
    deadline = time.time() + 30
    while time.time() < deadline:
        got = ray.get([handles[p].ack_counter.remote() for p in expected])
        if all(g >= expected[p] for p, g in zip(expected, got)):
            break
        time.sleep(0.05)
    else:
        raise AssertionError("applies never fully delivered")
    assert rows > 0
