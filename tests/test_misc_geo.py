"""Tests: geo ops, sampling/splits, sequence merge, custom reductions."""

import numpy as np
import pyarrow as pa
import pytest

from datavec_ray.util import dataset_to_table


def test_coordinates_distance():
    from datavec_ray.ops.geo import CoordinatesDistance
    t = pa.table({"a": ["0,0", "52.52,13.405"],
                  "b": ["0,1", "48.8566,2.3522"]})
    out = CoordinatesDistance("d", "a", "b").apply(t)
    # 1 degree longitude at the equator ≈ 111.19 km
    assert abs(out["d"][0].as_py() - 111_195) < 200
    # Berlin → Paris ≈ 878 km
    assert abs(out["d"][1].as_py() - 878_000) < 5_000
    out2 = CoordinatesDistance("d", "a", "b", mode="euclidean").apply(t)
    assert abs(out2["d"][0].as_py() - 1.0) < 1e-9


def test_geographic_midpoint():
    from datavec_ray.ops.geo import geographic_midpoint
    mid = geographic_midpoint(["0,0", "0,90"])
    lat, lon = map(float, mid.split(","))
    assert abs(lat) < 1e-6 and abs(lon - 45.0) < 1e-6


def test_geographic_midpoint_as_custom_reduce(ray_session):
    import ray.data as rd
    from datavec_ray.ops.geo import geographic_midpoint
    from datavec_ray.reduce import Reducer, register_reduce_op
    register_reduce_op(
        "GeoMidpoint",
        zero=lambda: [],
        accumulate=lambda st, col: st + [v for v in col.to_pylist() if v],
        merge=lambda a, b: a + b,
        finalize=lambda st: geographic_midpoint(st),
        out_type=pa.string())
    t = pa.table({"k": ["x", "x", "y"], "pos": ["0,0", "0,90", "10,10"]})
    r = Reducer(["k"], [["pos", "GeoMidpoint", "mid"]])
    loc = r.apply_local(t).sort_by("k")
    assert loc["mid"][1].as_py() == "10.000000,10.000000"
    lat, lon = map(float, loc["mid"][0].as_py().split(","))
    assert abs(lon - 45.0) < 1e-6
    dist = dataset_to_table(r.apply_dataset(
        rd.from_arrow(t).repartition(2))).sort_by("k")
    assert dist.equals(loc)


def test_geoip_stub(ray_session):
    import ray.data as rd
    from datavec_ray.ops.geo import GeoIPLookup
    t = pa.table({"ip": ["1.2.3.4", "8.8.8.8", "1.2.3.4"]})
    out = dataset_to_table(rd.from_arrow(t).map_batches(
        GeoIPLookup, batch_format="pyarrow", concurrency=2))
    coords = out["coords"].to_pylist()
    assert len(coords) == 3 and all("," in c for c in coords)
    # deterministic: same IP → same coords
    by_ip = dict(zip(out["ip"].to_pylist(), coords))
    assert by_ip["1.2.3.4"] == coords[0] or by_ip["1.2.3.4"] == coords[2]


def test_random_split_deterministic(ray_session):
    import ray.data as rd
    from datavec_ray.misc import random_split
    t = pa.table({"id": pa.array(range(2000), pa.int64())})
    a, b = random_split(rd.from_arrow(t), [0.8, 0.2], seed=1, salt_column="id")
    ta, tb = dataset_to_table(a), dataset_to_table(b)
    assert ta.num_rows + tb.num_rows == 2000
    assert 0.75 < ta.num_rows / 2000 < 0.85
    # repartitioned rerun gives identical membership
    a2, _ = random_split(rd.from_arrow(t).repartition(7), [0.8, 0.2], seed=1,
                         salt_column="id")
    assert sorted(dataset_to_table(a2)["id"].to_pylist()) == \
        sorted(ta["id"].to_pylist())


def test_unique_and_sample(ray_session):
    import ray.data as rd
    from datavec_ray.misc import sample, unique_values
    t = pa.table({"k": ["a", "b", "a", "c"] * 50})
    u = unique_values(rd.from_arrow(t), "k")
    assert sorted(u) == ["a", "b", "c"]
    s = sample(rd.from_arrow(t), 0.5, seed=3)
    assert 40 < s.count() < 160


def test_sequence_merge(ray_session):
    import ray.data as rd
    from datavec_ray.misc import sequence_merge
    a = pa.table({"k": ["x", "x"], "i": pa.array([0, 2], pa.int64()),
                  "v": [1.0, 3.0]})
    b = pa.table({"k": ["x", "y"], "i": pa.array([1, 0], pa.int64()),
                  "v": [2.0, 9.0]})
    out = dataset_to_table(sequence_merge(
        [rd.from_arrow(a), rd.from_arrow(b)], ["k"], ["i"]))
    out = out.sort_by([("k", "ascending"), ("i", "ascending")])
    assert out["v"].to_pylist() == [1.0, 2.0, 3.0, 9.0]


def test_pack_unpack_roundtrip(ray_session):
    import ray.data as rd
    from datavec_ray.packed import pack_sequences, pack_table, unpack_sequences
    t = pa.table({"conv": ["b", "a", "a", "b", "a"],
                  "turn": pa.array([0, 1, 0, 1, 2], pa.int32()),
                  "text": ["b0", "a1", "a0", "b1", "a2"]})
    packed = pack_table(t, ["conv"], ["turn"])
    assert packed.num_rows == 2
    a_steps = packed["steps"][0].as_py()
    assert [s["text"] for s in a_steps] == ["a0", "a1", "a2"]
    # distributed round trip
    pds = pack_sequences(rd.from_arrow(t).repartition(3), ["conv"], ["turn"],
                         num_partitions=4)
    flat = dataset_to_table(unpack_sequences(pds))
    key = [("conv", "ascending"), ("turn", "ascending")]
    assert flat.select(["conv", "turn", "text"]).sort_by(key).equals(
        t.sort_by(key))


def test_grouped_ewma(ray_session):
    import ray.data as rd

    from datavec_ray.misc import grouped_ewma

    t = pa.table({
        "k": ["a", "a", "a", "b", "b", "a"],
        "t": [3, 1, 2, 1, 2, 4],
        "x": [30.0, 10.0, 20.0, 5.0, 7.0, 40.0],
    })
    out = dataset_to_table(
        grouped_ewma(rd.from_arrow(t).repartition(3), ["k"], "t", "x",
                     alpha=0.5, num_partitions=2)).sort_by(
        [("k", "ascending"), ("t", "ascending")])
    # hand-rolled adjust=True EWMA for a: x sorted by t = 10,20,30,40
    want_a, num, den = [], 0.0, 0.0
    for x in [10.0, 20.0, 30.0, 40.0]:
        num = x + 0.5 * num
        den = 1 + 0.5 * den
        want_a.append(num / den)
    got = out["ewma"].to_pylist()
    assert np.allclose(got[:4], want_a)
    assert np.allclose(got[4:], [5.0, (7 + 0.5 * 5) / 1.5])
    # adjust=False recursive form
    out2 = dataset_to_table(
        grouped_ewma(rd.from_arrow(t), ["k"], "t", "x", alpha=0.5,
                     adjust=False)).sort_by(
        [("k", "ascending"), ("t", "ascending")])
    assert np.allclose(out2["ewma"].to_pylist()[:4], [10.0, 15.0, 22.5, 31.25])
    with pytest.raises(ValueError):
        grouped_ewma(rd.from_arrow(t), ["k"], "t", "x", alpha=0.0)


def test_render_conversations(ray_session):
    import ray.data as rd

    from datavec_ray.misc import render_conversations

    t = pa.table({
        "conv_id": ["b", "a", "a", "b", "a"],
        "turn_idx": pa.array([0, 1, 0, 1, 2], pa.int32()),
        "role": ["user", "assistant", "user", "assistant", "user"],
        "text": ["hi", "second", "first", "bye", None],
    })
    out = dataset_to_table(render_conversations(
        rd.from_arrow(t).repartition(3), num_partitions=2)).sort_by(
        [("conv_id", "ascending")])
    assert out["conv_id"].to_pylist() == ["a", "b"]
    assert out["rendered"].to_pylist() == [
        "user: first\nassistant: second\nuser: ",   # null text -> ''
        "user: hi\nassistant: bye"]
    assert out["n_turns"].to_pylist() == [3, 2]


def test_role_alternation_stats(ray_session):
    import ray.data as rd

    from datavec_ray.misc import role_alternation_stats

    t = pa.table({
        "conv_id": ["a"] * 4 + ["b"] * 2 + ["c"],
        "turn_idx": pa.array([0, 1, 2, 3, 0, 1, 0], pa.int32()),
        "role": ["user", "user", "assistant", "assistant",
                 "user", "assistant", None],
    })
    out = dataset_to_table(role_alternation_stats(
        rd.from_arrow(t).repartition(3), num_partitions=2)).sort_by(
        [("conv_id", "ascending")])
    assert out["conv_id"].to_pylist() == ["a", "b", "c"]
    assert out["n_turns"].to_pylist() == [4, 2, 1]
    assert out["n_repeats"].to_pylist() == [2, 0, 0]  # null != anything


def test_ffill_group_forward_and_backward(ray_session):
    import ray
    from datavec_ray.misc import ffill_group

    t = pa.table({
        "k": ["a", "a", "a", "a", "b", "b", "b"],
        "o": [1, 2, 3, 4, 1, 2, 3],
        "v": ["x", None, "y", None, None, "z", None],
        "n": [1.0, None, None, 4.0, None, None, 7.0],
    })
    ds = ray.data.from_arrow(t)
    out = dataset_to_table(
        ffill_group(ds, ["k"], "o", ["v", "n"])).sort_by(
        [("k", "ascending"), ("o", "ascending")])
    assert out["v"].to_pylist() == ["x", "x", "y", "y", None, "z", "z"]
    assert out["n"].to_pylist() == [1.0, 1.0, 1.0, 4.0, None, None, 7.0]

    back = dataset_to_table(
        ffill_group(ds, ["k"], "o", ["v"], direction="backward")).sort_by(
        [("k", "ascending"), ("o", "ascending")])
    # trailing nulls stay null; fills never cross the a/b boundary
    assert back["v"].to_pylist() == ["x", "y", "y", None, "z", "z", None]


def test_ffill_group_validates_columns(ray_session):
    import ray
    from datavec_ray.misc import ffill_group
    ds = ray.data.from_arrow(pa.table({"k": ["a"], "o": [1], "v": [None]}))
    with pytest.raises(ValueError):
        ffill_group(ds, ["k"], "o", ["o"])
    with pytest.raises(ValueError):
        ffill_group(ds, ["k"], "o", ["v"], direction="sideways")


def test_grouped_mode_ties_and_combine(ray_session):
    import ray
    from datavec_ray.misc import grouped_mode

    t = pa.table({
        "k": ["a"] * 6 + ["b"] * 3 + ["c"] * 2,
        "v": ["x", "y", "y", "x", None, "z",   # a: x=2, y=2 tie -> x
              "q", "q", "p",                   # b: q=2
              None, None],                     # c: all null -> no row
    })
    ds = ray.data.from_arrow(t).repartition(4)  # force cross-batch merge
    out = dataset_to_table(grouped_mode(ds, ["k"], "v")).sort_by(
        [("k", "ascending")])
    assert out["k"].to_pylist() == ["a", "b"]
    assert out["mode"].to_pylist() == ["x", "q"]
    assert out["cnt"].to_pylist() == [2, 2]


def test_group_winsorize_clips_per_group(ray_session):
    import ray
    from datavec_ray.misc import group_winsorize

    t = pa.table({
        "k": ["a"] * 10 + ["b"] * 10,
        "v": [float(x) for x in range(10)] + [float(100 + x) for x in range(10)],
    })
    ds = ray.data.from_arrow(t)
    out = dataset_to_table(
        group_winsorize(ds, ["k"], "v", lo=0.2, hi=0.8, out_col="w")) \
        .sort_by([("k", "ascending"), ("v", "ascending")])
    w = out["w"].to_pylist()
    # group a: clamp into [q20, q80] = [1, 7] (inverted CDF over 0..9)
    assert w[:10] == [1.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 7.0, 7.0]
    # group b clamps within its OWN range, not a's
    assert w[10] == 101.0 and w[19] == 107.0


def test_quantile_bucket_equal_frequency(ray_session):
    import ray
    from datavec_ray.misc import quantile_bucket

    t = pa.table({
        "k": ["a"] * 8 + ["b"] * 4,
        "v": [1.0, 2, 3, 4, 5, 6, 7, 8, 100.0, 200, 300, None],
    })
    out = dataset_to_table(
        quantile_bucket(ray.data.from_arrow(t), ["k"], "v", 4,
                        out_col="b")).sort_by(
        [("k", "ascending"), ("v", "ascending")])
    b = out["b"].to_pylist()
    # inverted-CDF thresholds (2.0, 4.0, 6.0): the boundary element
    # joins the upper bucket, matching the quantile_disc SQL mirror
    assert b[:8] == [0, 1, 1, 2, 2, 3, 3, 3]
    # group b uses its OWN grid (100, 200, 300); the null stays null
    assert b[8:11] == [1, 2, 3] and b[11] is None


def test_turn_offsets_slice_rendered_text(ray_session):
    """Each turn's [start, end) span must slice exactly its 'role: text'
    part out of the render_conversations output."""
    import ray
    from datavec_ray.misc import render_conversations, turn_offsets

    t = pa.table({
        "conv_id": ["c1"] * 3 + ["c2"] * 2,
        "turn_idx": pa.array([0, 1, 2, 0, 1], pa.int32()),
        "role": ["user", "assistant", "user", "user", "assistant"],
        "text": ["hi", "hello there", "bye", "q?", None],
    })
    ds = ray.data.from_arrow(t)
    rendered = {r["conv_id"]: r["rendered"] for r in dataset_to_table(
        render_conversations(ds, order_cols=["turn_idx"])).to_pylist()}
    offs = dataset_to_table(turn_offsets(ds, order_cols=["turn_idx"])) \
        .sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    for r in offs.to_pylist():
        part = rendered[r["conv_id"]][r["start_off"]:r["end_off"]]
        expect = f"{r['role']}: {r['text'] if r['text'] is not None else ''}"
        assert part == expect, (r, part)
        assert r["is_target"] == (r["role"] == "assistant")


def test_negative_samples_deterministic_nonself(ray_session):
    import ray
    from datavec_ray.misc import negative_samples

    t = pa.table({"id": pa.array(range(50), pa.int64())})
    ds = ray.data.from_arrow(t)
    a = dataset_to_table(negative_samples(ds, "id", 50, 3)).sort_by(
        [("anchor", "ascending"), ("slot", "ascending")])
    b = dataset_to_table(negative_samples(
        ray.data.from_arrow(t).repartition(7), "id", 50, 3)).sort_by(
        [("anchor", "ascending"), ("slot", "ascending")])
    assert a.equals(b)                      # partition-invariant
    rows = a.to_pylist()
    assert len(rows) == 150
    assert all(r["neg_id"] != r["anchor"] for r in rows)
    assert all(0 <= r["neg_id"] < 50 for r in rows)
