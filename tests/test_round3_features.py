"""Round-3 additions: semi/anti join (broadcast + shuffle + bloom
paths), Bloom filter, grouped quantiles, cumulative sums, hash
sampling."""

import numpy as np
import pyarrow as pa
import pytest

from tests.conftest import tables_equal


def _sorted(t: pa.Table) -> pa.Table:
    return t.sort_by([(c, "ascending") for c in t.column_names])


@pytest.fixture()
def join_data():
    rng = np.random.default_rng(11)
    left = pa.table({
        "k": rng.integers(0, 400, 3000),
        "k2": rng.integers(0, 3, 3000),
        "v": rng.normal(size=3000),
    })
    right = pa.table({
        "rk": rng.integers(200, 600, 800),
        "rk2": rng.integers(0, 3, 800),
        "x": rng.integers(0, 10, 800),
    })
    return left, right


def _local_semi(left, right, anti):
    how = "left anti" if anti else "left semi"
    rk = right.select(["rk", "rk2"]).group_by(["rk", "rk2"]).aggregate([])
    return left.join(rk, keys=["k", "k2"], right_keys=["rk", "rk2"],
                     join_type=how)


@pytest.mark.parametrize("anti", [False, True])
@pytest.mark.parametrize("mode", ["broadcast", "shuffle", "bloom"])
def test_semi_anti_join_paths(ray_session, join_data, anti, mode):
    import ray.data as rd

    from datavec_ray.join import SemiJoinStep
    from datavec_ray.util import dataset_to_table

    left, right = join_data
    expected = _sorted(_local_semi(left, right, anti))
    kw = {"broadcast": mode == "broadcast", "bloom": mode == "bloom",
          "num_buckets": 8}
    step = SemiJoinStep(rd.from_arrow(right).repartition(4),
                        keys=["k", "k2"], right_keys=["rk", "rk2"],
                        anti=anti, **kw)
    got = _sorted(dataset_to_table(
        step.apply_dataset(rd.from_arrow(left).repartition(5))))
    got = got.select(expected.column_names).cast(expected.schema)
    assert tables_equal(got, expected)


def test_semi_join_null_keys(ray_session):
    """SQL EXISTS semantics: null keys never match; anti keeps them."""
    import ray.data as rd

    from datavec_ray.join import anti_join, semi_join
    from datavec_ray.util import dataset_to_table

    left = pa.table({"k": [1, 2, None, 4], "v": ["a", "b", "c", "d"]})
    right = pa.table({"k": [2, None]})
    semi = dataset_to_table(
        semi_join(rd.from_arrow(left), right, "k", broadcast=False))
    assert semi["k"].to_pylist() == [2]
    anti = dataset_to_table(
        anti_join(rd.from_arrow(left), right, "k", broadcast=True))
    ks = sorted(anti["k"].to_pylist(), key=lambda x: (x is None, x))
    assert ks == [1, 4, None]


def test_bloom_filter_no_false_negatives():
    from datavec_ray.ops.bloom import BloomFilter

    bf = BloomFilter(*BloomFilter.size_for(5000, fp=0.01))
    t = pa.table({"a": [f"k{i}" for i in range(5000)],
                  "b": np.arange(5000) % 17})
    bf.add_table(t, ["a", "b"])
    assert bf.contains_table(t, ["a", "b"]).all()
    other = pa.table({"a": [f"m{i}" for i in range(20000)],
                      "b": np.arange(20000) % 17})
    fp = bf.contains_table(other, ["a", "b"]).mean()
    assert fp < 0.03


def test_bloom_from_dataset_merges(ray_session):
    import ray.data as rd

    from datavec_ray.ops.bloom import BloomFilter, bloom_from_dataset

    t = pa.table({"a": np.arange(20000, dtype=np.int64)})
    bf = bloom_from_dataset(rd.from_arrow(t).repartition(8), "a", fp=0.005)
    assert bf.contains_table(t, ["a"]).all()
    local = BloomFilter(bf.num_bits, bf.num_hashes)
    local.add_table(t, ["a"])
    assert np.array_equal(local.words, bf.words)


def test_grouped_quantile_matches_numpy(ray_session):
    import ray.data as rd

    from datavec_ray.misc import grouped_quantile
    from datavec_ray.util import dataset_to_table

    rng = np.random.default_rng(3)
    t = pa.table({"g": rng.integers(0, 5, 4000),
                  "v": rng.normal(size=4000)})
    out = dataset_to_table(grouped_quantile(
        rd.from_arrow(t).repartition(6), ["g"], "v", [0.5, 0.9])).sort_by("g")
    for i, g in enumerate(out["g"].to_pylist()):
        v = t.filter(pa.compute.equal(t["g"], g))["v"].to_numpy()
        assert out["p50"][i].as_py() == pytest.approx(
            float(np.quantile(v, 0.5, method="inverted_cdf")))
        assert out["p90"][i].as_py() == pytest.approx(
            float(np.quantile(v, 0.9, method="inverted_cdf")))


def test_cumulative_sum_group_vs_partition_and_nulls():
    """Both execution paths agree, including SQL null semantics: null
    leaves the running sum unchanged; leading nulls emit null."""
    import pandas as pd

    from datavec_ray.sequence import SequenceCumulativeSum

    t = pa.table({
        "g": ["a"] * 4 + ["b"] * 3,
        "o": [1, 2, 3, 4, 1, 2, 3],
        "v": [None, 2.0, None, 3.0, None, None, 1.0],
        "i": [1, 2, 3, 4, 5, 6, 7],
    })
    op = SequenceCumulativeSum(["v", "i"])
    # per-group path
    parts = []
    for g in ("a", "b"):
        parts.append(op.apply_group(t.filter(pa.compute.equal(t["g"], g))))
    grp = pa.concat_tables(parts)
    assert grp["v_cumsum"].to_pylist() == [None, 2.0, 2.0, 5.0,
                                           None, None, 1.0]
    assert grp["i_cumsum"].to_pylist() == [1, 3, 6, 10, 5, 11, 18]
    # partition-vectorized path
    df = t.to_pandas()
    out = op.apply_partition(df, ["g"])
    assert list(out["i_cumsum"]) == [1, 3, 6, 10, 5, 11, 18]
    vc = out["v_cumsum"]
    assert pd.isna(vc.iloc[0]) and pd.isna(vc.iloc[4]) and pd.isna(vc.iloc[5])
    assert list(vc.iloc[[1, 2, 3, 6]]) == [2.0, 2.0, 5.0, 1.0]


def test_hash_sample_deterministic_under_repartition(ray_session):
    import ray.data as rd

    from datavec_ray.misc import hash_sample

    t = pa.table({"id": np.arange(30000, dtype=np.int64)})
    a = hash_sample(rd.from_arrow(t).repartition(3), "id", 0.2, seed=5)
    b = hash_sample(rd.from_arrow(t).repartition(17), "id", 0.2, seed=5)
    ids_a = sorted(x for r in a.to_arrow_refs()
                   for x in ray_session.get(r)["id"].to_pylist())
    ids_b = sorted(x for r in b.to_arrow_refs()
                   for x in ray_session.get(r)["id"].to_pylist())
    assert ids_a == ids_b
    assert 0.17 < len(ids_a) / 30000 < 0.23
    # different seed → different sample
    c = hash_sample(rd.from_arrow(t), "id", 0.2, seed=6)
    ids_c = sorted(x for r in c.to_arrow_refs()
                   for x in ray_session.get(r)["id"].to_pylist())
    assert ids_c != ids_a


def test_chunk_words_to_lines():
    from datavec_ray.ops.dedup import chunk_words_to_lines

    out = chunk_words_to_lines(
        ["a b c d e f g", "x", ""], words_per_line=3).to_pylist()
    assert out == ["a b c\nd e f\ng", "x", ""]


def test_line_dedup_end_to_end(ray_session):
    import ray.data as rd

    from datavec_ray.ops.dedup import line_dedup
    from datavec_ray.util import dataset_to_table

    docs = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["intro\nshared line\nunique one",
                 "shared line\nunique two",
                 "shared line",              # vanishes entirely
                 "unique three\nintro"],
    })
    out = dataset_to_table(
        line_dedup(rd.from_arrow(docs).repartition(4), num_buckets=4)
    ).sort_by("doc_id")
    assert out["doc_id"].to_pylist() == [1, 2, 4]
    assert out["text"].to_pylist() == [
        "intro\nshared line\nunique one", "unique two", "unique three"]


def test_line_dedup_min_chars_exempt(ray_session):
    import ray.data as rd

    from datavec_ray.ops.dedup import line_dedup
    from datavec_ray.util import dataset_to_table

    docs = pa.table({
        "doc_id": [1, 2],
        "text": ["ok\nthis is a long duplicated line",
                 "ok\nthis is a long duplicated line"],
    })
    out = dataset_to_table(
        line_dedup(rd.from_arrow(docs), min_chars=5, num_buckets=2)
    ).sort_by("doc_id")
    # short line "ok" exempt in both docs; long line deduped to doc 1
    assert out["doc_id"].to_pylist() == [1, 2]
    assert out["text"].to_pylist() == [
        "ok\nthis is a long duplicated line", "ok"]


# ---------------------------------------------------------------------------
# connected components / dup clusters
# ---------------------------------------------------------------------------

def _cc_reference(edges):
    """Driver-side union-find oracle."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps = {}
    for n in list(parent):
        comps.setdefault(find(n), []).append(n)
    return {n: min(m) for r, m in comps.items() for n in m}


def test_connected_components_random_graph(ray_session):
    import ray.data as rd

    from datavec_ray.ops.graph import connected_components

    rng = np.random.default_rng(5)
    # many small clusters + one chain spanning partitions
    edges = [(int(a), int(b)) for a, b in
             rng.integers(0, 300, size=(400, 2)) if a != b]
    edges += [(1000 + i, 1001 + i) for i in range(50)]     # long path
    tbl = pa.table({"id_a": [a for a, _ in edges],
                    "id_b": [b for _, b in edges]})
    got = connected_components(rd.from_arrow(tbl).repartition(7))
    expect = _cc_reference(edges)
    got_map = dict(zip(got["node"].to_pylist(), got["component"].to_pylist()))
    assert got_map == expect


def test_connected_components_table_and_dedup(ray_session):
    import ray.data as rd

    from datavec_ray.ops.graph import (connected_components,
                                       dedup_by_components)
    from datavec_ray.util import dataset_to_table

    edges = pa.table({"id_a": [1, 2, 10], "id_b": [2, 3, 11]})
    local = connected_components(edges)
    assert dict(zip(local["node"].to_pylist(),
                    local["component"].to_pylist())) == \
        {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    rows = pa.table({"doc_id": [1, 2, 3, 10, 11, 99],
                     "v": list("abcdef")})
    kept = dataset_to_table(dedup_by_components(
        rd.from_arrow(rows).repartition(3), rd.from_arrow(edges),
        id_col="doc_id")).sort_by("doc_id")
    assert kept["doc_id"].to_pylist() == [1, 10, 99]
    assert kept.column_names == ["doc_id", "v"]


# ---------------------------------------------------------------------------
# grouped_topn / redact_pii / Melt
# ---------------------------------------------------------------------------

def test_grouped_topn_matches_pandas(ray_session):
    import ray.data as rd

    from datavec_ray.misc import grouped_topn
    from datavec_ray.util import dataset_to_table

    rng = np.random.default_rng(3)
    t = pa.table({"g": rng.integers(0, 20, 500),
                  "v": rng.integers(0, 50, 500),   # many ties
                  "id": np.arange(500)})
    got = dataset_to_table(grouped_topn(
        rd.from_arrow(t).repartition(6), ["g"], "v", 4,
        tiebreak=["id"])).to_pandas().sort_values(["g", "id"])
    exp = (t.to_pandas()
           .sort_values(["g", "v", "id"], ascending=[True, False, True],
                        kind="mergesort")
           .groupby("g", sort=False).head(4).sort_values(["g", "id"]))
    assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))


def test_redact_pii():
    from datavec_ray.ops.textstats import redact_pii

    texts = pa.array([
        "mail bob.smith+x@corp.example.org now",
        "server at 192.168.0.1 port 80",
        "call +44 207 946 0958 or +1 555 010 22",
        "ssn 123-45-6789 inline",
        "no pii here",
        None,
    ])
    got = redact_pii(texts).to_pylist()
    assert got == [
        "mail <EMAIL> now",
        "server at <IP> port 80",
        "call <PHONE> or <PHONE>",
        "ssn <SSN> inline",
        "no pii here",
        None,
    ]


def test_melt_local_vs_dataset(ray_session):
    import ray.data as rd

    from datavec_ray import TransformPipeline
    from datavec_ray.schema import Schema
    from datavec_ray.steps import Melt
    from datavec_ray.util import dataset_to_table

    t = pa.table({"k": [1, 2, 3], "a": [1.5, 2.5, 3.5],
                  "b": [10, 20, 30]})
    p = TransformPipeline(Schema(t.schema))
    p.add(Melt(["k"], ["a", "b"], var_name="m", value_name="x"))
    local = p.execute_table(t)
    dist = dataset_to_table(p.execute(rd.from_arrow(t).repartition(2)))
    key = [("k", "ascending"), ("m", "ascending")]
    assert local.sort_by(key).equals(dist.sort_by(key).cast(local.schema))
    # mixed int/float promotes to float64
    assert local.schema.field("x").type == pa.float64()


def test_melt_serde_roundtrip():
    from datavec_ray import TransformPipeline
    from datavec_ray.schema import Schema
    from datavec_ray.steps import Melt

    t = pa.table({"k": [1], "a": [1.0], "b": [2.0]})
    p = TransformPipeline(Schema(t.schema))
    p.add(Melt(["k"], ["a", "b"], var_name="m", value_name="x"))
    q = TransformPipeline.from_json(p.to_json())
    assert q.to_dict() == p.to_dict()
    assert q.execute_table(t).equals(p.execute_table(t))


def test_pagerank_vs_dense_power_iteration(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from datavec_ray.ops.graph import pagerank

    rng = np.random.RandomState(7)
    n, m, d, iters = 40, 300, 0.85, 8
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    # force a dangling node: strip node 39's out-edges
    keep = src != 39
    src, dst = src[keep], np.append(dst[keep], 39)  # keep 39 reachable
    src = np.append(src, 3)
    got = pagerank(rd.from_arrow(pa.table({"src": src, "dst": dst}))
                   .repartition(5), damping=d, iterations=iters)
    nodes = got["node"].to_numpy(zero_copy_only=False)
    r = got["rank"].to_numpy(zero_copy_only=False)

    # dense reference: column-stochastic multi-edge matrix + dangling
    alln = np.unique(np.concatenate([src, dst]))
    idx = {v: i for i, v in enumerate(alln)}
    k = len(alln)
    A = np.zeros((k, k))
    for s, t in zip(src, dst):
        A[idx[t], idx[s]] += 1.0
    outdeg = A.sum(axis=0)
    dang = outdeg == 0
    P = np.divide(A, np.where(dang, 1, outdeg),
                  out=np.zeros_like(A), where=~dang)
    want = np.full(k, 1.0 / k)
    for _ in range(iters):
        want = (1 - d) / k + d * (P @ want + want[dang].sum() / k)

    assert np.array_equal(nodes, alln)
    assert np.allclose(r, want, atol=1e-12)
    assert abs(r.sum() - 1.0) < 1e-9


def test_pagerank_star_graph(ray_session):
    import pyarrow as pa

    from datavec_ray.ops.graph import pagerank

    edges = pa.table({"src": pa.array([1, 2, 3, 4], pa.int64()),
                      "dst": pa.array([0, 0, 0, 0], pa.int64())})
    out = pagerank(edges, iterations=20)
    ranks = dict(zip(out["node"].to_pylist(), out["rank"].to_pylist()))
    assert ranks[0] == max(ranks.values())        # hub dominates
    assert abs(sum(ranks.values()) - 1.0) < 1e-9  # mass conserved


def test_personalized_pagerank(ray_session):
    import numpy as np
    import pyarrow as pa

    from datavec_ray.ops.graph import pagerank

    edges = pa.table({"src": pa.array([0, 1, 2, 3], pa.int64()),
                      "dst": pa.array([1, 2, 3, 0], pa.int64())})
    d, iters = 0.85, 12
    out = pagerank(edges, damping=d, iterations=iters,
                   personalization={0: 1.0})
    r = dict(zip(out["node"].to_pylist(), out["rank"].to_pylist()))
    # dense reference on the 4-cycle with teleport pinned to node 0
    p = np.array([1.0, 0, 0, 0])
    want = p.copy()
    P = np.zeros((4, 4))
    for s, t in [(0, 1), (1, 2), (2, 3), (3, 0)]:
        P[t, s] = 1.0
    for _ in range(iters):
        want = (1 - d) * p + d * (P @ want)
    assert np.allclose([r[i] for i in range(4)], want, atol=1e-12)
    assert r[0] == max(r.values())  # teleport seed dominates
    with pytest.raises(ValueError):
        pagerank(edges, personalization={99: 1.0})


def test_triangle_count_vs_bruteforce(ray_session):
    import itertools

    import ray
    from datavec_ray.ops.graph import triangle_count

    rng = np.random.default_rng(11)
    for trial in range(3):
        n, m = 40, 180
        u = rng.integers(0, n, m)
        v = rng.integers(0, n, m)
        t = pa.table({"src": pa.array(u, pa.int64()),
                      "dst": pa.array(v, pa.int64())})
        got = triangle_count(ray.data.from_arrow(t).repartition(4))
        es = {(min(a, b), max(a, b)) for a, b in zip(u.tolist(), v.tolist())
              if a != b}
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        exp = sum(1 for a, b, c in itertools.combinations(sorted(adj), 3)
                  if b in adj[a] and c in adj[a] and c in adj[b])
        assert got == exp, (trial, got, exp)


def test_tdigest_rank_error_bound(ray_session):
    """t-digest grouped quantiles: rank error stays under the
    O(1/delta) bound on a heavy-tailed column with extreme outliers
    (where the range-histogram sketch would be useless), under TWO
    different blockings; exact count; exact quantiles recovered when a
    group fits in a single digest pass."""
    import ray.data as rd

    from datavec_ray.ops.sketches import tdigest_quantiles
    from datavec_ray.util import dataset_to_table

    rng = np.random.default_rng(5)
    n = 60_000
    key = rng.integers(0, 4, n)
    vals = np.exp(rng.normal(0.0, 2.0, n)) * (1 + key)
    vals[rng.integers(0, n, 10)] *= 1e9          # outliers
    t = pa.table({"k": key.astype(np.int64), "v": vals})
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    names = ["p1", "p25", "p50", "p75", "p99"]

    for parts in (4, 24):
        out = dataset_to_table(tdigest_quantiles(
            rd.from_arrow(t).repartition(parts), ["k"], "v", qs,
            names=names, delta=200)).to_pandas().set_index("k")
        assert sorted(out.index) == [0, 1, 2, 3]
        for k in range(4):
            g = np.sort(vals[key == k])
            assert out.loc[k, "n"] == len(g)
            for q, nm in zip(qs, names):
                est = out.loc[k, nm]
                rank = np.searchsorted(g, est) / len(g)
                assert abs(rank - q) < 0.01, (k, nm, rank)

    # endpoint anchoring: q=0/1 return the exact min/max
    out = dataset_to_table(tdigest_quantiles(
        rd.from_arrow(t).repartition(8), ["k"], "v", [0.0, 1.0],
        names=["lo", "hi"])).to_pandas().set_index("k")
    for k in range(4):
        g = vals[key == k]
        assert out.loc[k, "lo"] == g.min()
        assert out.loc[k, "hi"] == g.max()


def test_tdigest_small_group_near_exact(ray_session):
    """A group smaller than delta keeps singleton centroids — the
    digest read matches numpy's linear-interpolation quantile to
    tight tolerance."""
    import ray.data as rd

    from datavec_ray.ops.sketches import tdigest_quantiles
    from datavec_ray.util import dataset_to_table

    rng = np.random.default_rng(9)
    vals = rng.normal(size=150)
    t = pa.table({"k": np.zeros(150, np.int64), "v": vals})
    out = dataset_to_table(tdigest_quantiles(
        rd.from_arrow(t), ["k"], "v", [0.5], names=["p50"],
        delta=400)).to_pandas()
    assert abs(out["p50"][0] - np.quantile(vals, 0.5)) < 2e-2
