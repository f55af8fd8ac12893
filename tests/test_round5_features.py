"""Tests for benchmark decontamination, distributed k-means, and
SemDeDup-style semantic dedup (round-5 additions)."""

import numpy as np
import pyarrow as pa
import pytest

from datavec_ray.util import dataset_to_table


def _docs(texts, start_id=0):
    return pa.table({
        "doc_id": pa.array(range(start_id, start_id + len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})


def test_decontaminate_counts(ray_session):
    """Overlap counts equal a pure-Python distinct-trigram reference."""
    import ray.data as rd

    from datavec_ray.ops.dedup import decontaminate

    bench_texts = ["what is the capital of france",
                   "solve for x in the equation"]
    cand_texts = [
        "paris is the capital of france according to the guide",  # overlap
        "what is the capital of france",                          # verbatim
        "totally unrelated text about ray data pipelines",        # clean
        "solve for x",                                            # short, no 3-gram hit
        "you must solve for x in the equation below",             # overlap
        "",                                                       # empty
    ]

    def grams(t, n=3):
        w = t.lower().split()
        if not w:
            return set()
        if len(w) < n:
            return {" ".join(w)}
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    bench = set().union(*(grams(t) for t in bench_texts))
    expect = {}
    for i, t in enumerate(cand_texts):
        hits = len(grams(t) & bench)
        if hits:
            expect[100 + i] = hits

    out = dataset_to_table(decontaminate(
        rd.from_arrow(_docs(cand_texts, 100)).repartition(3),
        rd.from_arrow(_docs(bench_texts)), "text", "doc_id", n=3))
    got = dict(zip(out["doc_id"].to_pylist(), out["n_hits"].to_pylist()))
    assert got == expect


def test_decontaminate_empty_bench(ray_session):
    import ray.data as rd

    from datavec_ray.ops.dedup import decontaminate

    out = dataset_to_table(decontaminate(
        rd.from_arrow(_docs(["some text here now"])),
        rd.from_arrow(_docs([], 50)), "text", "doc_id"))
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "n_hits"]


def _planted(k=3, per=40, dim=8, seed=5, noise=0.05):
    """Well-separated gaussian blobs: kmeans must recover the planting."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, dim)) * 20
    vecs = np.vstack([centers[j] + noise * rng.standard_normal((per, dim))
                      for j in range(k)])
    labels = np.repeat(np.arange(k), per)
    t = pa.table({"vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
                  "embedding": pa.array(vecs.tolist(),
                                        pa.list_(pa.float32()))})
    return t, vecs.astype(np.float64), labels


def test_kmeans_fit_matches_numpy_reference(ray_session):
    """The distributed per-batch partial-sum Lloyd update computes the
    same iteration as a whole-matrix numpy reference (same init)."""
    import ray.data as rd

    from datavec_ray.ops.similarity import (_assign_centroids, _kmeans,
                                            kmeans_assign, kmeans_fit)

    t, vecs, labels = _planted()
    # float32 storage truncates; the reference must see what the engine sees
    stored = np.asarray(t["embedding"].combine_chunks().flatten()
                        .to_numpy(zero_copy_only=False), np.float64) \
        .reshape(len(vecs), -1)
    ds = rd.from_arrow(t).repartition(4)
    cents = kmeans_fit(ds, "embedding", k=3, iters=4, seed=11,
                       init_sample_frac=1.0)

    # reference: same init path (full sample, same seed), whole-matrix Lloyd
    # mirror the engine's canonical sample ordering (init picks rows by
    # position; see _fit_centroids)
    ref = _kmeans(stored[np.lexsort(stored.T[::-1])].copy(), 3, seed=11)
    for _ in range(4):
        a = _assign_centroids(stored, ref)
        for j in range(3):
            pts = stored[a == j]
            if len(pts):
                ref[j] = pts.mean(axis=0)
    assert np.allclose(cents, ref, rtol=1e-9, atol=1e-9)

    out = dataset_to_table(kmeans_assign(ds, cents, "embedding")
                           .select_columns(["vec_id", "cluster"])
                           .sort("vec_id"))
    got = np.asarray(out["cluster"].to_pylist())
    # every planted blob maps to exactly one distinct centroid
    for j in range(3):
        assert len(set(got[labels == j])) == 1
    assert len({got[labels == j][0] for j in range(3)}) == 3


def test_semantic_dedup_removes_planted_duplicates(ray_session):
    import ray.data as rd

    from datavec_ray.ops.similarity import semantic_dedup, semantic_dedup_pairs

    # noise wide enough that WITHIN-blob cosine stays below the 0.9999
    # dup threshold (tight blobs around far centers are all >0.9999
    # similar — correctly one dup cluster, but not what this test plants)
    t, vecs, labels = _planted(k=4, per=10, dim=16, seed=7, noise=2.0)
    # plant near-identical duplicates of vec 0 (ids 40..42 after the blobs)
    dups = vecs[0] + 1e-4 * np.random.default_rng(1).standard_normal((3, 16))
    full = np.vstack([vecs, dups])
    tbl = pa.table({"vec_id": pa.array(np.arange(len(full)), pa.int64()),
                    "embedding": pa.array(full.tolist(),
                                          pa.list_(pa.float32()))})
    ds = rd.from_arrow(tbl).repartition(3)

    pairs = dataset_to_table(semantic_dedup_pairs(
        ds, "embedding", "vec_id", k=4, threshold=0.9999, iters=2, seed=11))
    got_pairs = set(zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()))
    assert {(0, 40), (0, 41), (0, 42)} <= got_pairs

    kept = dataset_to_table(semantic_dedup(
        ds, "embedding", "vec_id", k=4, threshold=0.9999, iters=2, seed=11))
    ids = set(kept["vec_id"].to_pylist())
    assert 0 in ids and not ({40, 41, 42} & ids)
    # payload column survives the component join (list type regression)
    assert "embedding" in kept.column_names
    assert len(ids) == len(full) - 3


def test_window_rank_percentile_ntile(ray_session):
    """percent_rank / cume_dist / ntile vs a pandas reference, one pass."""
    import pandas as pd
    import ray.data as rd

    from datavec_ray.misc import window_rank

    rng = np.random.default_rng(2)
    n = 300
    df = pd.DataFrame({"k": rng.integers(0, 7, n),
                       "v": rng.integers(0, 20, n).astype(float),
                       "id": np.arange(n)})
    out = dataset_to_table(window_rank(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(4),
        ["k"], "v", tiebreak=["id"],
        specs={"pct": "percent_rank", "cume": "cume_dist",
               "tile": "ntile", "rn": "row_number"},
        ntile_buckets=3)).to_pandas().sort_values("id").reset_index(drop=True)

    g = df.groupby("k")["v"]
    expect_pct = g.rank(method="min").sub(1) / \
        g.transform("count").sub(1).clip(lower=1)
    expect_pct[df.groupby("k")["v"].transform("count") == 1] = 0.0
    expect_cume = g.rank(method="max") / g.transform("count")
    ref = df.assign(pct=expect_pct, cume=expect_cume) \
        .sort_values("id").reset_index(drop=True)
    assert np.allclose(out["pct"], ref["pct"])
    assert np.allclose(out["cume"], ref["cume"])

    # ntile: per group, bucket sizes differ by <= 1 and are ordered
    for k, sub in out.groupby("k"):
        sub = sub.sort_values(["v", "id"])
        tiles = sub["tile"].to_numpy()
        assert (np.diff(tiles) >= 0).all()
        sizes = np.bincount(tiles)[1:]
        sizes = sizes[sizes > 0]
        assert sizes.max() - sizes.min() <= 1
        assert tiles.max() == min(3, len(sub))
    # row_number is a total order per group
    for k, sub in out.groupby("k"):
        assert sorted(sub["rn"]) == list(range(1, len(sub) + 1))


def test_pack_by_budget(ray_session):
    """Shard = exclusive-prefix-sum // budget in the stable order; no
    shard (except a doc's own overflow) exceeds the budget."""
    import ray.data as rd

    from datavec_ray.misc import pack_by_budget

    rng = np.random.default_rng(4)
    w = rng.integers(1, 50, 200)
    t = pa.table({"doc_id": pa.array(np.arange(200), pa.int64()),
                  "w": pa.array(w, pa.int64())})
    out = dataset_to_table(pack_by_budget(
        rd.from_arrow(t).repartition(5), "w", 100, "doc_id")) \
        .sort_by("doc_id")
    excl = np.cumsum(w) - w
    assert out["shard"].to_pylist() == (excl // 100).tolist()
    df = out.to_pandas()
    per = df.groupby("shard")["w"].sum()
    assert (per.iloc[:-1] >= 100 - 49).all()      # shards are filled
    # a shard holds the budget plus at most its last doc's overflow
    assert (per <= 100 + 49).all()

    with pytest.raises(ValueError):
        pack_by_budget(rd.from_arrow(t), "w", 0, "doc_id")


def test_replay_lz4_exchange_matches_oracle(ray_session, tmp_path, monkeypatch):
    """DATAVEC_EXCHANGE_LZ4=1 ships exchange shards as compressed IPC
    buffers; the committed lake must be identical to the raw exchange.
    (Opt-in: measured slower on the high-entropy synthetic text, wins
    only on compressible real-world transcripts — see engine docstring.)"""
    from datavec_ray.cdc.binlog import synth_binlog
    from datavec_ray.cdc.engine import CdcIngestEngine
    from datavec_ray.cdc.oracle import replay_oracle

    bl = synth_binlog(20_000, seed=9)
    monkeypatch.setenv("DATAVEC_EXCHANGE_LZ4", "1")
    eng = CdcIngestEngine(str(tmp_path / "lz4lake"), num_partitions=4)
    eng.replay(bl)
    assert eng.read_lake().equals(replay_oracle(bl))
    eng.shutdown()
