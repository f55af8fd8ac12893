"""Tests for round-7 additions: JSON payload extraction and the
map-side-combiner grouped reduce."""

import datetime

import numpy as np
import pyarrow as pa
import ray.data as rd

from datavec_ray.pipeline import TransformPipeline
from datavec_ray.schema import Schema
from datavec_ray.steps import JsonExtract
from datavec_ray.util import dataset_to_table


def test_json_extract_types_and_lenience():
    t = pa.table({"j": [
        '{"k": 69, "s": "ab", "f": 1.5, "b": true, "nested": {"x": 7}}',
        '{"k": null, "s": "", "b": false}',
        None,
        'not json at all',
        '{"s": "only s"}',
    ]})
    step = JsonExtract("j", {
        "k": ("$.k", "Long"),
        "s": ("$.s", "String"),
        "f": ("$.f", "Double"),
        "b": ("$.b", "Boolean"),
        "x": ("$.nested.x", "Integer"),
    }, keep_source=False)
    out = step.apply(t)
    assert out.column_names == ["k", "s", "f", "b", "x"]
    assert out["k"].to_pylist() == [69, None, None, None, None]
    assert out["s"].to_pylist() == ["ab", "", None, None, "only s"]
    assert out["f"].to_pylist() == [1.5, None, None, None, None]
    assert out["b"].to_pylist() == [True, False, None, None, None]
    assert out["x"].to_pylist() == [7, None, None, None, None]
    assert out["k"].type == pa.int64() and out["x"].type == pa.int32()


def test_json_extract_schema_and_serde():
    sch = Schema(pa.schema([("j", pa.string()), ("id", pa.int64())]))
    step = JsonExtract("j", {"k": ("$.k", "Long")})
    out = step.output_schema(sch)
    assert out.names == ["j", "id", "k"]
    assert out.type_of("k") == pa.int64()
    # serde round trip through the pipeline registry
    p = TransformPipeline(sch)
    p.add(step)
    p2 = TransformPipeline.from_json(p.to_json())
    t = pa.table({"j": ['{"k": 3}'], "id": pa.array([1], pa.int64())})
    assert p2.execute_table(t)["k"].to_pylist() == [3]


def test_json_extract_rejects_non_string():
    sch = Schema(pa.schema([("j", pa.int64())]))
    step = JsonExtract("j", {"k": ("$.k", "Long")})
    try:
        step.output_schema(sch)
        assert False, "expected TypeError"
    except TypeError:
        pass


def test_reducer_combiner_edge_cases(ray_session):
    """Null keys, all-null value groups, int/temporal/bool min-max:
    distributed combiner path == local oracle."""
    from datavec_ray.reduce import Reducer

    t = pa.table({
        "k": ["a", "a", None, None, "b", "b", "c"],
        "i": pa.array([1, 2, 3, None, None, None, 7], pa.int32()),
        "ts": pa.array([datetime.datetime(2020, 1, d + 1) for d in range(7)]),
        "b": pa.array([True, False, True, None, False, True, None]),
        "f": pa.array([1.5, 2.5, None, None, None, None, 9.0]),
    })
    r = Reducer(keys=["k"], specs=[
        ("i", "Sum", "si"), ("i", "Mean", "mi"), ("i", "Min", "lo"),
        ("ts", "Max", "mts"), ("b", "Min", "bmin"), ("f", "Max", "fmax"),
        ("k", "Count", "n"),
    ])
    out = dataset_to_table(r.apply_dataset(rd.from_arrow(t).repartition(5)))
    out = out.sort_by([("k", "ascending")])
    loc = r.apply_local(t).sort_by([("k", "ascending")])
    assert out.num_rows == loc.num_rows == 4
    for c in loc.column_names:
        a, b = out[c].to_pylist(), loc[c].to_pylist()
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                assert abs(x - y) < 1e-12, (c, a, b)
            else:
                assert x == y, (c, a, b)


def test_reducer_combiner_extended_ops(ray_session):
    """Range / Prod / variance family / CountUniqueExact through the
    combiner == local oracle, with null keys and null values."""
    from datavec_ray.reduce import Reducer

    rng = np.random.default_rng(5)
    n = 4000
    t = pa.table({
        "k": pa.array([f"g{i % 11}" if i % 40 else None for i in range(n)]),
        "u": pa.array([f"s{x}" if x % 7 else None
                       for x in rng.integers(0, 300, n)]),
        "i": pa.array(rng.integers(-10, 10, n), pa.int32()),
        "p": pa.array(rng.uniform(0.9, 1.1, n)),
        "v": pa.array([None if i % 97 == 0 else x for i, x in
                       enumerate(rng.normal(100, 15, n))], pa.float64()),
    })
    r = Reducer(keys=["k"], specs=[
        ("v", "Stdev", "sd"), ("v", "Variance", "var"),
        ("v", "UncorrectedStdDev", "usd"),
        ("v", "PopulationVariance", "pvar"),
        ("i", "Range", "rng"), ("p", "Prod", "prodf"),
        ("i", "Prod", "prodi"),
        ("u", "CountUniqueExact", "uq_s"),
        ("i", "CountUniqueExact", "uq_i"),
        ("k", "Count", "n"),
    ])
    out = dataset_to_table(r.apply_dataset(rd.from_arrow(t).repartition(9)))
    out = out.sort_by([("k", "ascending")])
    loc = r.apply_local(t).sort_by([("k", "ascending")])
    assert out.num_rows == loc.num_rows == 12
    for c in loc.column_names:
        for x, y in zip(out[c].to_pylist(), loc[c].to_pylist()):
            if isinstance(x, str) or x is None or y is None:
                assert x == y or (x is None and y is None), (c, x, y)
            else:
                assert np.isclose(float(x), float(y), rtol=1e-9), (c, x, y)


def test_reducer_combiner_variance_large_offset(ray_session):
    """The cancellation-free Chan merge stays accurate when |mean| >>
    stdev (the case that kills naive sum-of-squares partials)."""
    from datavec_ray.reduce import Reducer

    rng = np.random.default_rng(11)
    vals = 1e9 + rng.normal(0, 1, 3000)
    t = pa.table({"k": ["a"] * 3000, "v": pa.array(vals)})
    r = Reducer(keys=["k"], specs=[("v", "Variance", "var"),
                                   ("v", "Stdev", "sd")])
    out = dataset_to_table(r.apply_dataset(rd.from_arrow(t).repartition(8)))
    got_var = out["var"].to_pylist()[0]
    exact = float(np.var(vals, ddof=1))
    assert abs(got_var - exact) / exact < 1e-6


def test_reducer_combiner_hll_parity(ray_session, monkeypatch):
    """CountUnique through the combiner (fixed 512-byte register
    partials) produces EXACTLY the same estimates as the AggregateFn
    path and the local oracle — same hash mapping, same registers,
    same estimator."""
    from datavec_ray.reduce import Reducer

    rng = np.random.default_rng(3)
    n = 6000
    t = pa.table({
        "k": pa.array([f"g{i % 5}" for i in range(n)]),
        "u": pa.array([f"s{x}" if x % 9 else None
                       for x in rng.integers(0, 900, n)]),
        "i": pa.array(rng.integers(0, 2000, n), pa.int64()),
        "f": pa.array(rng.uniform(0, 1, n)),
    })
    r = Reducer(keys=["k"], specs=[
        ("u", "CountUnique", "au"), ("i", "CountUnique", "ai"),
        ("f", "CountUnique", "af"), ("u", "CountUniqueExact", "eu"),
    ])
    comb = dataset_to_table(r.apply_dataset(rd.from_arrow(t)
                                            .repartition(8)))
    comb = comb.sort_by([("k", "ascending")])
    monkeypatch.setenv("DATAVEC_REDUCE_COMBINER", "0")
    agg = dataset_to_table(r.apply_dataset(rd.from_arrow(t)
                                           .repartition(8)))
    agg = agg.sort_by([("k", "ascending")])
    loc = r.apply_local(t).sort_by([("k", "ascending")])
    for c in loc.column_names:
        assert comb[c].to_pylist() == agg[c].to_pylist() \
            == loc[c].to_pylist(), c
    # estimates are within HLL p=9 tolerance of the exact counts
    for est, exact in zip(comb["au"].to_pylist(), comb["eu"].to_pylist()):
        assert abs(est - exact) / exact < 0.15


def test_reducer_combiner_conditional_gate(ray_session, monkeypatch):
    """A conditional Reducer runs through the combiner (null-masked
    gated values) and matches both the AggregateFn path and the local
    oracle, including fully-gated-out groups."""
    from datavec_ray.conditions import ColumnCondition
    from datavec_ray.reduce import Reducer

    rng = np.random.default_rng(9)
    n = 5000
    t = pa.table({
        "k": pa.array([f"g{i % 6}" for i in range(n)]),
        "u": pa.array([f"s{x}" if x % 5 else None
                       for x in rng.integers(0, 300, n)]),
        "v": pa.array([None if i % 89 == 0 else x for i, x in
                       enumerate(rng.normal(50, 9, n))], pa.float64()),
        "i": pa.array(rng.integers(0, 100, n), pa.int64()),
        # group g5 is fully gated out (its v values forced >= 200)
    })
    v = t["v"].to_pylist()
    v = [200.0 if (j % 6 == 5) else x for j, x in enumerate(v)]
    t = t.set_column(2, "v", pa.array(v, pa.float64()))
    cond = ColumnCondition("v", "LessThan", 50.0)
    r = Reducer(keys=["k"], specs=[
        ("v", "Mean", "mv"), ("v", "Sum", "sv"), ("v", "Stdev", "sd"),
        ("i", "Range", "rg"), ("u", "CountUniqueExact", "uu"),
        ("u", "CountUnique", "au"), ("k", "Count", "cnt"),
    ], condition=cond)
    comb = dataset_to_table(r.apply_dataset(rd.from_arrow(t)
                                            .repartition(7)))
    comb = comb.sort_by([("k", "ascending")])
    monkeypatch.setenv("DATAVEC_REDUCE_COMBINER", "0")
    agg = dataset_to_table(r.apply_dataset(rd.from_arrow(t)
                                           .repartition(7)))
    agg = agg.sort_by([("k", "ascending")])
    loc = r.apply_local(t).sort_by([("k", "ascending")])
    assert comb.num_rows == loc.num_rows == 6   # gated group survives
    g5 = comb.filter(pa.compute.equal(comb["k"], "g5"))
    assert g5["cnt"].to_pylist() == [0] and g5["mv"].to_pylist() == [None]
    for c in loc.column_names:
        for x, y, z in zip(comb[c].to_pylist(), agg[c].to_pylist(),
                           loc[c].to_pylist()):
            if isinstance(x, float):
                assert abs(x - y) < 1e-9 and abs(x - z) < 1e-9, (c, x, y, z)
            else:
                assert x == y == z, (c, x, y, z)


def test_reducer_combiner_order_ops_and_string_minmax(ray_session):
    """TakeFirst/TakeLast/Append/Prepend and string Min/Max through the
    combiner. Order-dependent ops are arrival-nondeterministic across
    partitions (same as the AggregateFn path), so: exact parity on one
    partition, multiset/membership parity on many."""
    from datavec_ray.reduce import Reducer

    rng = np.random.default_rng(2)
    n = 3000
    t = pa.table({
        "k": pa.array([f"g{i % 9}" if i % 41 else None
                       for i in range(n)]),
        "s": pa.array([f"w{x}" if x % 6 else None
                       for x in rng.integers(0, 50, n)]),
        "v": pa.array(rng.normal(0, 1, n)),
    })
    r = Reducer(keys=["k"], specs=[
        ("s", "Min", "smin"), ("s", "Max", "smax"),
        ("s", "Append", "app"), ("s", "Prepend", "pre"),
        ("v", "TakeFirst", "tf"), ("s", "TakeLast", "tl"),
    ])
    out = dataset_to_table(r.apply_dataset(rd.from_arrow(t)
                                           .repartition(6)))
    out = out.sort_by([("k", "ascending")])
    loc = r.apply_local(t).sort_by([("k", "ascending")])
    assert out.num_rows == loc.num_rows == 10
    assert out["smin"].to_pylist() == loc["smin"].to_pylist()
    assert out["smax"].to_pylist() == loc["smax"].to_pylist()
    for c in ("app", "pre"):
        for a, b in zip(out[c].to_pylist(), loc[c].to_pylist()):
            assert sorted(a.split(",")) == sorted(b.split(",")), (c, a, b)
    members = {}
    for k, v, s in zip(t["k"].to_pylist(), t["v"].to_pylist(),
                       t["s"].to_pylist()):
        members.setdefault(k, (set(), set()))[0].add(v)
        members[k][1].add(s)
    for k, tf, tl in zip(out["k"].to_pylist(), out["tf"].to_pylist(),
                         out["tl"].to_pylist()):
        assert tf in members[k][0] and tl in members[k][1]
    # one partition → merge order is deterministic → exact local parity
    one = dataset_to_table(r.apply_dataset(rd.from_arrow(t)
                                           .repartition(1)))
    one = one.sort_by([("k", "ascending")])
    for c in ("tf", "tl", "app", "pre"):
        assert one[c].to_pylist() == loc[c].to_pylist(), c


def test_reducer_general_path_null_keys_and_gated_takefirst(
        ray_session, monkeypatch):
    """The partition-based general fallback (_acc_groupby) handles NULL
    keys (Ray's sort-based aggregate raises on them) and gated
    TakeFirst/TakeLast, matching the local oracle; on non-null keys it
    matches the legacy AggregateFn path."""
    from datavec_ray.conditions import ColumnCondition
    from datavec_ray.reduce import Reducer

    rng = np.random.default_rng(13)
    n = 2000
    t = pa.table({
        "k": pa.array([f"g{i % 4}" if i % 17 else None
                       for i in range(n)]),
        "v": pa.array(rng.normal(10, 2, n)),
        "s": pa.array([f"x{v}" for v in rng.integers(0, 9, n)]),
    })
    # gated TakeFirst/TakeLast → not combinable → general path; null
    # keys → would raise in Ray's sort-based groupby
    cond = ColumnCondition("v", "GreaterThan", 10.0)
    r = Reducer(keys=["k"], specs=[
        ("v", "TakeFirst", "tf"), ("s", "TakeLast", "tl"),
        ("v", "Mean", "mv"),
    ], condition=cond)
    out = dataset_to_table(r.apply_dataset(rd.from_arrow(t)
                                           .repartition(1)))
    out = out.sort_by([("k", "ascending")])
    loc = r.apply_local(t).sort_by([("k", "ascending")])
    assert out.num_rows == loc.num_rows == 5
    for c in ("tf", "tl", "mv"):   # 1 partition → deterministic
        for x, y in zip(out[c].to_pylist(), loc[c].to_pylist()):
            if isinstance(x, float):
                assert abs(x - y) < 1e-9, (c, x, y)
            else:
                assert x == y, (c, x, y)
    # non-null keys: general path == legacy AggregateFn path
    t2 = t.set_column(0, "k", pa.array(
        [f"g{i % 4}" for i in range(n)]))
    r2 = Reducer(keys=["k"], specs=[("v", "Mean", "mv"),
                                    ("v", "Stdev", "sd")],
                 condition=cond)
    monkeypatch.setenv("DATAVEC_REDUCE_COMBINER", "0")
    part = dataset_to_table(r2.apply_dataset(rd.from_arrow(t2)
                                             .repartition(5)))
    part = part.sort_by([("k", "ascending")])
    monkeypatch.setenv("DATAVEC_REDUCE_GENERAL", "aggfn")
    agg = dataset_to_table(r2.apply_dataset(rd.from_arrow(t2)
                                            .repartition(5)))
    agg = agg.sort_by([("k", "ascending")])
    for c in ("mv", "sd"):
        for x, y in zip(part[c].to_pylist(), agg[c].to_pylist()):
            assert abs(x - y) < 1e-9, (c, x, y)


def test_reducer_combiner_matches_builtin_path(ray_session, monkeypatch):
    """Same query through the combiner and the Ray-builtin fallback."""
    from datavec_ray.reduce import Reducer

    rng = np.random.default_rng(7)
    t = pa.table({
        "g": pa.array(rng.integers(0, 13, 2000) % 13),
        "v": pa.array(rng.normal(size=2000)),
    })
    r = Reducer(keys=["g"], specs=[("v", "Sum", "s"), ("v", "Mean", "m"),
                                   ("v", "Min", "lo"), ("v", "Max", "hi"),
                                   ("v", "Count", "n")])
    a = dataset_to_table(r.apply_dataset(rd.from_arrow(t).repartition(7)))
    monkeypatch.setenv("DATAVEC_REDUCE_COMBINER", "0")
    b = dataset_to_table(r.apply_dataset(rd.from_arrow(t).repartition(7)))
    a = a.sort_by([("g", "ascending")])
    b = b.sort_by([("g", "ascending")])
    assert a["g"].to_pylist() == b["g"].to_pylist()
    assert a["n"].to_pylist() == b["n"].to_pylist()
    for c in ("s", "m", "lo", "hi"):
        assert np.allclose(a[c].to_numpy(), np.asarray(b[c].to_pylist(),
                                                       dtype=float))


def test_frequent_items_exact_on_skew(ray_session):
    """Bounded-shuffle heavy hitters == plain exact counting on a
    skewed stream; guarantee warning fires when capacity is too small."""
    import logging

    from datavec_ray.ops.sketches import frequent_items

    rng = np.random.default_rng(4)
    # zipf-ish: value i appears ~ C / (i+1)
    vals = np.repeat(np.arange(200), (4000 / (np.arange(200) + 1))
                     .astype(np.int64) + 1)
    rng.shuffle(vals)
    t = pa.table({"v": pa.array([f"item{x}" for x in vals])})
    ds = rd.from_arrow(t).repartition(7)
    got = frequent_items(ds, "v", k=10, capacity=2000)
    # exact reference
    g = t.group_by("v").aggregate([("v", "count")]).sort_by(
        [("v_count", "descending"), ("v", "ascending")]).slice(0, 10)
    assert got["value"].to_pylist() == g["v"].to_pylist()
    assert got["cnt"].to_pylist() == [int(x) for x in
                                      g["v_count"].to_pylist()]
    # too-small capacity: a value concentrated in one small block
    # becomes a candidate while the k-th true count sits at or under
    # N / capacity — the guarantee check must warn
    b1 = pa.table({"v": pa.array(["rare"] * 100)})
    b2 = pa.table({"v": pa.array([f"u{i % 1000}" for i in range(10000)])})
    logger = logging.getLogger("datavec_ray.ops.sketches")
    records = []
    h = logging.Handler()
    h.emit = records.append
    logger.addHandler(h)
    try:
        out = frequent_items(rd.from_arrow([b1, b2]), "v", k=5,
                             capacity=50)
    finally:
        logger.removeHandler(h)
    assert out["value"].to_pylist() == ["rare"]   # the one candidate
    assert any("incomplete" in r.getMessage() for r in records)


def test_frequent_tokens_matches_naive(ray_session):
    from collections import Counter

    from datavec_ray.ops.sketches import frequent_tokens

    texts = ["the cat sat on the mat", "the dog", None,
             "a cat and a dog and a bird", "", "the the the"]
    t = pa.table({"text": pa.array(texts, pa.string())})
    got = frequent_tokens(rd.from_arrow(t).repartition(3),
                          "text", k=5, capacity=100)
    c = Counter(w for s in texts if s for w in s.split(" ") if w)
    expect = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(zip(got["value"].to_pylist(),
                    got["cnt"].to_pylist())) == expect


def test_grouped_quantile_hist_tolerance(ray_session):
    """Histogram-sketch quantiles land within (hi-lo)/bins of the exact
    grouped quantiles, and all-null groups are dropped."""
    from datavec_ray.misc import grouped_quantile, grouped_quantile_hist

    rng = np.random.default_rng(6)
    n = 20000
    t = pa.table({
        "k": pa.array([f"g{i % 4}" for i in range(n)]),
        "v": pa.array(np.where(np.arange(n) % 4 == 3, np.nan,
                               rng.lognormal(0, 1, n))),
    })
    # group g3 all-NaN → dropped by the hist variant
    v = t["v"].to_pylist()
    v = [None if (i % 4 == 3) else x for i, x in enumerate(v)]
    t = t.set_column(1, "v", pa.array(v, pa.float64()))
    bins = 512
    approx = dataset_to_table(grouped_quantile_hist(
        rd.from_arrow(t).repartition(6), ["k"], "v",
        [0.5, 0.9], bins=bins)).sort_by([("k", "ascending")])
    exact = dataset_to_table(grouped_quantile(
        rd.from_arrow(t).repartition(6), ["k"], "v",
        [0.5, 0.9])).sort_by([("k", "ascending")])
    assert approx["k"].to_pylist() == ["g0", "g1", "g2"]
    lohi = {}
    for k, x in zip(t["k"].to_pylist(), t["v"].to_pylist()):
        if x is not None:
            lo, hi = lohi.get(k, (x, x))
            lohi[k] = (min(lo, x), max(hi, x))
    for col in ("p50", "p90"):
        for k, a in zip(approx["k"].to_pylist(), approx[col].to_pylist()):
            e = exact[col].to_pylist()[exact["k"].to_pylist().index(k)]
            lo, hi = lohi[k]
            assert abs(a - e) <= (hi - lo) / bins + 1e-9, (col, k, a, e)


def test_shuffled_shards_deterministic_and_uniform(ray_session):
    """shard/pos are pure functions of the id: identical across
    repartitionings; different seeds give different permutations;
    shards are roughly balanced; each shard's positions are dense."""
    from datavec_ray.misc import shuffled_shards

    t = pa.table({"doc_id": pa.array(range(4000), pa.int64()),
                  "x": pa.array(range(4000), pa.int64())})

    def run(parts, seed):
        out = dataset_to_table(shuffled_shards(
            rd.from_arrow(t).repartition(parts), "doc_id", 8, seed=seed))
        return out.sort_by([("doc_id", "ascending")])

    a, b = run(3, 0), run(9, 0)
    assert a["shard"].to_pylist() == b["shard"].to_pylist()
    assert a["pos"].to_pylist() == b["pos"].to_pylist()
    c = run(3, 1)
    assert a["shard"].to_pylist() != c["shard"].to_pylist()
    counts = np.bincount(a["shard"].to_numpy(zero_copy_only=False),
                         minlength=8)
    assert counts.min() > 300 and counts.max() < 700   # ~500 each
    srt = a.sort_by([("shard", "ascending"), ("pos", "ascending")])
    sh = srt["shard"].to_numpy(zero_copy_only=False)
    po = srt["pos"].to_numpy(zero_copy_only=False)
    for s in range(8):
        p = po[sh == s]
        assert (p == np.arange(len(p))).all()


def test_image_augment_chain(ray_session):
    """Random-chain augmentation (ImageTransformProcess parity):
    batch-vectorized, per-row deterministic, epoch-varied by seed,
    distributed == local kernel."""
    from datavec_ray.ops.multimodal import (ImageAugmentChain,
                                            ImageDecodeResize,
                                            synth_media_table)

    media = synth_media_table(120, seed=4)
    media = media.filter(pa.compute.equal(media["media_type"], "image"))
    steps = [
        {"op": "random_crop", "h": 6, "w": 6},
        {"op": "flip_h", "p": 0.5},
        {"op": "brightness", "delta": 0.2, "p": 0.8},
        {"op": "normalize", "mean": 0.5, "std": 0.25},
    ]
    chain = ImageAugmentChain(steps, h=8, w=8, seed=0)
    dec = rd.from_arrow(media).map_batches(
        ImageDecodeResize, batch_format="pyarrow",
        fn_constructor_args=(8, 8), concurrency=(1, 2), batch_size=32)
    out = dataset_to_table(dec.map_batches(
        chain, batch_format="pyarrow", batch_size=16))
    out = out.sort_by([("media_id", "ascending")])
    assert chain.out_h == chain.out_w == 6
    assert len(out["image_aug"][0].as_py()) == 36

    # local oracle: same kernel over the whole decoded stack at once
    loc_in = dataset_to_table(dec).sort_by([("media_id", "ascending")])
    import numpy as npytest  # noqa: F401
    flat = np.asarray(loc_in["image_feat"].combine_chunks().flatten()
                      .to_numpy(zero_copy_only=False), np.float64)
    from datavec_ray.hll import hash64
    ids = hash64(loc_in["media_id"].combine_chunks())
    ref = chain.apply_stack(flat.reshape(-1, 8, 8), ids)
    got = np.asarray(out["image_aug"].combine_chunks().flatten()
                     .to_numpy(zero_copy_only=False), np.float32) \
        .reshape(-1, 6, 6)
    assert np.allclose(got, ref.astype(np.float32), atol=1e-6)

    # different epoch seed → different augmentation of the same rows
    chain2 = ImageAugmentChain(steps, h=8, w=8, seed=1)
    out2 = dataset_to_table(dec.map_batches(
        chain2, batch_format="pyarrow", batch_size=16))
    out2 = out2.sort_by([("media_id", "ascending")])
    a = out["image_aug"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False)
    b = out2["image_aug"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False)
    assert not np.allclose(a, b)

    # invalid chains rejected at build time
    import pytest as _pt
    with _pt.raises(ValueError):
        ImageAugmentChain([{"op": "random_crop", "h": 9, "w": 4}], h=8, w=8)
    with _pt.raises(ValueError):
        ImageAugmentChain([{"op": "random_crop", "h": 4, "w": 6},
                           {"op": "rot90", "p": 0.5}], h=8, w=8)


def test_importance_resample_prefers_target_like_docs(ray_session):
    """DSIR selection: raw docs drawn from the target's vocabulary
    survive at a much higher rate than off-distribution docs; the kept
    set is deterministic across runs and partitionings."""
    from datavec_ray.ops.textstats import importance_resample

    rng = np.random.default_rng(8)
    tgt_vocab = [f"t{i}" for i in range(30)]
    off_vocab = [f"z{i}" for i in range(30)]

    def doc(vocab):
        return " ".join(rng.choice(vocab, 20))

    tgt = pa.table({"doc_id": pa.array(range(100), pa.int64()),
                    "text": pa.array([doc(tgt_vocab) for _ in range(100)])})
    raw_rows = []
    for i in range(300):
        raw_rows.append(doc(tgt_vocab) if i % 2 == 0 else doc(off_vocab))
    raw = pa.table({"doc_id": pa.array(range(1000, 1300), pa.int64()),
                    "text": pa.array(raw_rows)})

    def run(parts, tau):
        out = dataset_to_table(importance_resample(
            rd.from_arrow(raw).repartition(parts), rd.from_arrow(tgt),
            "text", "doc_id", tau=tau, seed=0))
        return out.sort_by([("doc_id", "ascending")])

    a = run(3, 0.5)
    b = run(7, 0.5)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    kept = set(a["doc_id"].to_pylist())
    kept_in = sum(1 for i in range(1000, 1300, 2) if i in kept)
    kept_off = sum(1 for i in range(1001, 1300, 2) if i in kept)
    assert kept_in > 100 and kept_off < 30, (kept_in, kept_off)
    # scores separate the populations decisively
    sc = dict(zip(a["doc_id"].to_pylist(),
                  a["log_importance_per_token"].to_pylist()))
    s_in = [v for i, v in sc.items() if i % 2 == 0]
    s_off = [v for i, v in sc.items() if i % 2 == 1]
    assert s_off and min(s_in) > max(s_off) + 1.0
    # larger tau keeps fewer (a stray off-doc may still clear the
    # per-mille draw — selection is probabilistic by design)
    strict = set(run(3, 50.0)["doc_id"].to_pylist())
    assert len(strict) < len(kept)
    assert sum(1 for i in strict if i % 2 == 1) <= 3


def test_audio_spectrogram_finds_tone(ray_session):
    """Real FFT spectrogram over stdlib-encoded WAV payloads: a pure
    sine clip's dominant frequency lands within one bin of the truth."""
    from datavec_ray.ops.codecs import encode_wav
    from datavec_ray.ops.multimodal import AudioSpectrogram

    sr = 16000
    rows = []
    freqs = [440.0, 1000.0, 3000.0]
    for f in freqs:
        t = np.arange(sr) / sr               # 1 second
        pcm = (0.6 * np.sin(2 * np.pi * f * t) * 32767).astype(np.int16)
        rows.append(encode_wav(pcm, sr))
    tbl = pa.table({
        "media_id": pa.array(range(len(rows)), pa.int64()),
        "payload": pa.array(rows, pa.binary()),
        "sample_rate": pa.array([sr] * len(rows), pa.int32()),
    })
    out = dataset_to_table(rd.from_arrow(tbl).map_batches(
        AudioSpectrogram, batch_format="pyarrow",
        fn_constructor_kwargs=dict(n_frames=8, n_bins=32, frame_len=512,
                                   deterministic_fake=False),
        concurrency=(1, 2), batch_size=2))
    out = out.sort_by([("media_id", "ascending")])
    bin_hz = sr / 512
    for f, got in zip(freqs, out["peak_hz"].to_pylist()):
        assert abs(got - f) <= bin_hz, (f, got)
    assert len(out["spec_feat"][0].as_py()) == 8 * 32


def test_export_shuffled_shards_resumable(ray_session, tmp_path):
    """Partitioned shard export: one file per shard in position order;
    a rerun skips finished shards and rewrites only missing ones."""
    import os

    import pyarrow.parquet as pq

    from datavec_ray.misc import export_shuffled_shards

    t = pa.table({"doc_id": pa.array(range(2000), pa.int64()),
                  "x": pa.array(range(2000), pa.int64())})
    out = str(tmp_path / "shards")
    ds = rd.from_arrow(t).repartition(4)
    man = export_shuffled_shards(ds, "doc_id", 4, out, seed=0)
    assert man["shard"].to_pylist() == [0, 1, 2, 3]
    assert not any(man["skipped"].to_pylist())
    assert sum(man["rows"].to_pylist()) == 2000
    for p in man["path"].to_pylist():
        f = pq.read_table(p)
        assert f["pos"].to_pylist() == list(range(f.num_rows))
    # crash-resume: delete one shard, rerun → only that one rewritten
    victim = man["path"].to_pylist()[2]
    os.remove(victim)
    man2 = export_shuffled_shards(ds, "doc_id", 4, out, seed=0)
    assert man2["skipped"].to_pylist() == [True, True, False, True]
    a = pq.read_table(victim)
    assert a.num_rows == man["rows"].to_pylist()[2]


def test_image_phash_neardup(ray_session):
    """DCT pHash: identical images hash equal, mildly noised copies
    land within a few bits, distinct images far apart; the precomputed
    column rides simhash_pairs' banding to exact near-dup pairs."""
    from datavec_ray.ops.codecs import encode_png
    from datavec_ray.ops.dedup import simhash_pairs
    from datavec_ray.ops.multimodal import ImageDecodeResize, ImagePHash

    rng = np.random.default_rng(12)
    base = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    noised = base.copy()
    noised[:2, :2] = np.clip(noised[:2, :2].astype(int) + 12,
                             0, 255).astype(np.uint8)
    other = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    payloads = [encode_png(base), encode_png(base), encode_png(noised),
                encode_png(other)]
    tbl = pa.table({
        "media_id": pa.array(range(4), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array([32] * 4, pa.int32()),
        "height": pa.array([32] * 4, pa.int32()),
    })
    ds = rd.from_arrow(tbl).map_batches(
        ImageDecodeResize, batch_format="pyarrow",
        fn_constructor_args=(32, 32, False), concurrency=(1, 2))
    hashed = ds.map_batches(ImagePHash(32, 32), batch_format="pyarrow")
    out = dataset_to_table(hashed).sort_by([("media_id", "ascending")])
    h = out["phash"].to_numpy(zero_copy_only=False).astype(np.uint64)

    def ham(a, b):
        return bin(int(a) ^ int(b)).count("1")

    assert ham(h[0], h[1]) == 0            # identical
    assert ham(h[0], h[2]) <= 3            # mild noise
    assert ham(h[0], h[3]) > 10            # different image
    pairs = dataset_to_table(simhash_pairs(
        hashed, id_col="media_id", max_hamming=3, hash_col="phash"))
    got = {tuple(sorted(p)) for p in
           zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist())}
    assert (0, 1) in got and (0, 2) in got and (1, 2) in got
    assert not any(3 in p for p in got)


def test_video_phash_pairs(ray_session):
    """Video near-dup via frame pHashes: an identical copy and a
    mildly brightness-shifted re-encode pair with the original; an
    unrelated video does not."""
    from datavec_ray.ops.codecs import encode_y4m
    from datavec_ray.ops.multimodal import video_phash_pairs

    rng = np.random.default_rng(14)
    # smooth-ish frames so small brightness shifts keep DCT signs
    base = np.zeros((6, 32, 32), dtype=np.uint8)
    yy, xx = np.mgrid[0:32, 0:32]
    for f in range(6):
        base[f] = (96 + 64 * np.sin(xx / 5 + f) * np.cos(yy / 7)
                   ).astype(np.uint8)
    shifted = np.clip(base.astype(int) + 6, 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, (6, 32, 32), dtype=np.uint8)
    tbl = pa.table({
        "media_id": pa.array([0, 1, 2, 3], pa.int64()),
        "payload": pa.array([encode_y4m(base), encode_y4m(base),
                             encode_y4m(shifted), encode_y4m(other)],
                            pa.binary()),
    })
    pairs = dataset_to_table(video_phash_pairs(
        rd.from_arrow(tbl), n_frames=4, grid=8, min_shared=2,
        deterministic_fake=False))
    got = {tuple(sorted((a, b)))
           for a, b in zip(pairs["id_a"].to_pylist(),
                           pairs["id_b"].to_pylist())}
    assert (0, 1) in got               # identical copy
    assert (0, 2) in got or (1, 2) in got   # brightness-shifted copy
    assert not any(3 in p for p in got)     # unrelated video
