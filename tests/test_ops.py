"""Tests for dedup / similarity / textstats / multimodal ops."""

import numpy as np
import pyarrow as pa
import pytest

from datavec_ray.util import dataset_to_table


def docs_table():
    return pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "text": [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy dog",     # exact dup of 0
            "the quick brown fox jumped over the lazy dog",    # near dup
            "completely different content about ray data engines",
            "Ray Data engines process arrow batches at scale",
            "the quick brown fox jumps over the lazy dog",     # exact dup of 0
            "",                                                 # empty
            "unrelated short text",
        ],
    })


def test_exact_dedup(ray_session):
    import ray.data as rd
    from datavec_ray.ops.dedup import exact_dedup
    out = dataset_to_table(exact_dedup(rd.from_arrow(docs_table()),
                                       num_partitions=4)).sort_by("doc_id")
    assert out["doc_id"].to_pylist() == [0, 2, 3, 4, 6, 7]


def test_minhash_lsh(ray_session):
    import ray.data as rd
    from datavec_ray.ops.dedup import minhash_lsh_pairs
    t = docs_table()
    out = minhash_lsh_pairs(rd.from_arrow(t), jaccard_threshold=0.3)
    pairs = set(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist()))
    # exact dups must be found; the near-dup (0,2) has true jaccard 0.4
    # (one word of nine changed → 4 of 10 distinct 3-gram shingles shared)
    assert (0, 1) in pairs and (0, 5) in pairs and (1, 5) in pairs
    assert (0, 2) in pairs
    assert all(j >= 0.3 for j in out["jaccard"].to_pylist())


def test_ngram_jaccard_exact(ray_session):
    """Exact inverted-index Jaccard join vs hand-computed values."""
    import ray.data as rd
    from datavec_ray.ops.dedup import ngram_jaccard_pairs
    out = dataset_to_table(
        ngram_jaccard_pairs(rd.from_arrow(docs_table()), n=3, threshold=0.2))
    got = {(a, b): j for a, b, j in zip(out["id_a"].to_pylist(),
                                        out["id_b"].to_pylist(),
                                        out["jaccard"].to_pylist())}
    # exact duplicates → jaccard 1.0
    assert got[(0, 1)] == 1.0 and got[(0, 5)] == 1.0 and got[(1, 5)] == 1.0
    # near-dup (one word of nine changed): 4 shared of 10 distinct
    # trigram shingles → 0.4
    assert abs(got[(0, 2)] - 0.4) < 1e-9
    # unrelated docs produce no pair
    assert not any(7 in p for p in got)


def test_ngram_jaccard_max_df_cap(ray_session):
    """Stop-shingle cap drops ubiquitous grams instead of exploding."""
    import ray.data as rd
    from datavec_ray.ops.dedup import ngram_jaccard_pairs
    t = pa.table({"doc_id": pa.array(range(20), pa.int64()),
                  "text": pa.array(["common prefix words here"] * 20)})
    out = dataset_to_table(
        ngram_jaccard_pairs(rd.from_arrow(t), n=3, threshold=0.5, max_df=5))
    assert out.num_rows == 0  # all grams shared by 20 > max_df docs


def test_minhash_shingles_match_reference_semantics():
    """Flat vectorized shingling == per-doc reference implementation."""
    from datavec_ray.ops.dedup import _shingle_hashes, _shingle_hashes_flat
    texts = ["the quick brown fox", "a b", "", "one", "x y z w v"]
    sh, offs = _shingle_hashes_flat(texts, 3)
    # doc 0: 4 tokens → 2 shingles; doc 1: short → 1; doc 2: empty → 0;
    # doc 3: short → 1; doc 4: 5 tokens → 3
    assert np.diff(offs).tolist() == [2, 1, 0, 1, 3]
    sets = _shingle_hashes(texts, 3)
    assert [len(s) for s in sets] == [2, 1, 0, 1, 3]
    # identical texts → identical shingle sets
    a = _shingle_hashes(["same text here ok"], 3)[0]
    b = _shingle_hashes(["same text here ok"], 3)[0]
    assert np.array_equal(a, b)


def test_simhash_identical_and_empty():
    from datavec_ray.ops.dedup import simhash64
    h = simhash64(["the quick brown fox", "the quick brown fox", "", "other"])
    assert h[0] == h[1]
    assert h[2] == 0
    assert h[0] != h[3]


def test_oversized_bucket_still_finds_duplicates(ray_session):
    """A pathological all-identical corpus overflows every LSH bucket —
    the sub-split + star-link path must still connect every duplicate to
    the representative instead of silently dropping the bucket."""
    import ray.data as rd
    from datavec_ray.ops.dedup import minhash_lsh_pairs
    n = 60
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "text": ["identical duplicate document text here"] * n})
    out = minhash_lsh_pairs(rd.from_arrow(t), jaccard_threshold=0.9,
                            max_bucket=10)
    pairs = set(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist()))
    # connected components: every doc reachable from doc 0
    import collections
    adj = collections.defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    seen, stack = {0}, [0]
    while stack:
        for nb in adj[stack.pop()]:
            if nb not in seen:
                seen.add(nb)
                stack.append(nb)
    assert seen == set(range(n))


def test_simhash_pairs(ray_session):
    import ray.data as rd
    from datavec_ray.ops.dedup import simhash_pairs
    out = dataset_to_table(simhash_pairs(rd.from_arrow(docs_table()),
                                         max_hamming=3))
    pairs = set(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist()))
    assert (0, 1) in pairs and (0, 5) in pairs  # identical → hamming 0


def test_embedding_neardup(ray_session):
    import ray.data as rd
    from datavec_ray.ops.dedup import embedding_neardup_pairs
    rng = np.random.default_rng(0)
    base = rng.standard_normal((5, 16)).astype(np.float32)
    vecs = np.vstack([base, base[0] + 0.001 * rng.standard_normal(16).astype(np.float32)])
    t = pa.table({"vec_id": pa.array(range(6), pa.int64()),
                  "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32()))})
    out = dataset_to_table(embedding_neardup_pairs(
        rd.from_arrow(t), num_planes=8, cos_threshold=0.99))
    pairs = set(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist()))
    assert (0, 5) in pairs


def test_cosine_pairs_exact(ray_session):
    """Exact all-pairs cosine join vs a local numpy upper-triangle scan."""
    import ray.data as rd
    from datavec_ray.ops.similarity import cosine_pairs_exact
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((80, 8)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(80), pa.int64()),
                  "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32()))})
    out = dataset_to_table(cosine_pairs_exact(
        rd.from_arrow(t).repartition(4), threshold=0.5)).to_pandas()
    n = vecs.astype(np.float64)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    sims = n @ n.T
    iu = np.triu_indices(80, 1)
    mask = sims[iu] >= 0.5
    expect = {(int(a), int(b), round(float(sims[a, b]), 6))
              for a, b in zip(iu[0][mask], iu[1][mask])}
    got = {(int(r.id_a), int(r.id_b), round(float(r.cosine), 6))
           for r in out.itertuples()}
    assert got == expect and len(expect) > 0


def test_brute_force_topk(ray_session):
    import ray.data as rd
    from datavec_ray.ops.similarity import brute_force_topk
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(50), pa.int64()),
                  "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32()))})
    q = vecs[:3].astype(np.float64)
    out = dataset_to_table(brute_force_topk(
        rd.from_arrow(t).repartition(4), q, k=5))
    df = out.to_pandas()
    # each query's best match is itself (cosine 1.0)
    for qi in range(3):
        sub = df[df.query_id == qi].sort_values("cosine", ascending=False)
        assert len(sub) == 5
        assert sub.iloc[0]["match_id"] == qi
        assert abs(sub.iloc[0]["cosine"] - 1.0) < 1e-9
    # verify against numpy exact
    n = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = n @ qn.T
    for qi in range(3):
        expect = set(np.argsort(-sims[:, qi])[:5].tolist())
        got = set(df[df.query_id == qi]["match_id"].tolist())
        assert got == expect


def test_ivf_topk_recall(ray_session):
    import ray.data as rd
    from datavec_ray.ops.similarity import brute_force_topk, ivf_topk
    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((300, 8)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(300), pa.int64()),
                  "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32()))})
    q = vecs[:2].astype(np.float64)
    exact = dataset_to_table(brute_force_topk(rd.from_arrow(t), q, k=10)).to_pandas()
    approx = dataset_to_table(ivf_topk(rd.from_arrow(t), q, k=10,
                                       num_centroids=8, nprobe=4,
                                       sample_frac=0.5)).to_pandas()
    for qi in range(2):
        e = set(exact[exact.query_id == qi]["match_id"])
        a = set(approx[approx.query_id == qi]["match_id"])
        assert len(e & a) / len(e) >= 0.5  # recall with half the centroids probed


def test_ivf_build_query_physical_index(ray_session, tmp_path):
    """Physical IVF index: only probed centroid partitions are read."""
    import os

    import ray.data as rd
    from datavec_ray.ops.similarity import brute_force_topk, ivf_build, ivf_query
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((400, 8)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(400), pa.int64()),
                  "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32()))})
    idx = str(tmp_path / "ivf")
    cents = ivf_build(rd.from_arrow(t), idx, num_centroids=8, sample_frac=0.5)
    assert cents.shape == (8, 8)
    assert os.path.exists(os.path.join(idx, "centroids.npy"))
    q = vecs[:2].astype(np.float64)
    exact = dataset_to_table(brute_force_topk(rd.from_arrow(t), q, k=10)).to_pandas()
    approx = dataset_to_table(ivf_query(idx, q, k=10, nprobe=4)).to_pandas()
    for qi in range(2):
        e = set(exact[exact.query_id == qi]["match_id"])
        a = set(approx[approx.query_id == qi]["match_id"])
        assert len(e & a) / len(e) >= 0.5


def test_text_stats_and_fingerprint():
    from datavec_ray.ops.textstats import (TextStats, add_text_stats,
                                           fingerprint_md5, rolling_fingerprint,
                                           token_count)
    t = docs_table()
    assert token_count(t["text"]).to_pylist()[0] == 9
    assert token_count(t["text"]).to_pylist()[6] == 0
    out = add_text_stats(t)
    assert out["n_tokens"].to_pylist()[7] == 3
    assert 0 <= out["quality_score"].to_pylist()[0] <= 1
    fp = fingerprint_md5(t)
    assert fp["fp"][0].as_py() == fp["fp"][1].as_py()      # dups same fp
    assert fp["fp"][0].as_py() != fp["fp"][3].as_py()
    rfp = rolling_fingerprint(t)
    assert rfp["rfp"][0].as_py() == rfp["rfp"][1].as_py()
    ts = TextStats()
    scored = ts(t)
    assert scored["lang_id"].to_pylist()[0] == "en"


def test_quality_signals():
    from datavec_ray.ops.textstats import quality_signals
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": ["the cat sat on a mat with the dog",   # 9 words
                           "spam spam spam spam",                  # repetitive
                           ""]})                                   # empty
    out = quality_signals(t)
    assert out["n_words"].to_pylist() == [9, 4, 0]
    # doc 0: 'the' appears twice -> top_word_frac 2/9, distinct 8/9
    assert abs(out["top_word_frac"][0].as_py() - 2 / 9) < 1e-6
    assert abs(out["distinct_frac"][0].as_py() - 8 / 9) < 1e-6
    assert abs(out["stopword_frac"][0].as_py() - 3 / 9) < 1e-6  # the,a,the
    # doc 1: one word repeated 4x
    assert out["top_word_frac"][1].as_py() == 1.0
    assert out["distinct_frac"][1].as_py() == 0.25
    # empty doc: zeros, not nulls
    assert out["mean_word_len"][2].as_py() == 0.0
    # keep rule: all three fail (too short / repetitive / empty)
    assert out["keep"].to_pylist() == [0, 0, 0]
    # mean word length doc 0: (3+3+3+2+1+3+4+3+3)/9
    assert abs(out["mean_word_len"][0].as_py() - 25 / 9) < 1e-6


def test_langid_scripts():
    from datavec_ray.ops.textstats import TextStats
    t = pa.table({"text": [
        "the cat and the dog walked to the house",
        "le chat et le chien est une belle chose de la vie",
        "der Hund und die Katze ist nicht das Problem",
        "こんにちは世界、これは日本語のテキストです、漢字もあります",
    ]})
    langs = TextStats()(t)["lang_id"].to_pylist()
    assert langs == ["en", "fr", "de", "cjk"]


def test_multimodal_plumbing(ray_session):
    import ray.data as rd
    from datavec_ray.ops.multimodal import (AudioFeatures, ImageDecodeResize,
                                            VideoFrameSample, synth_media_table)
    t = synth_media_table(20)
    ds = rd.from_arrow(t)
    img = dataset_to_table(ds.map_batches(ImageDecodeResize, batch_format="pyarrow",
                                          batch_size=8, concurrency=2))
    assert img.num_rows == 20 and len(img["image_feat"][0]) == 64
    aud = dataset_to_table(ds.map_batches(AudioFeatures, batch_format="pyarrow",
                                          batch_size=8, concurrency=2))
    assert len(aud["audio_feat"][0]) == 16
    vid = dataset_to_table(ds.map_batches(VideoFrameSample, batch_format="pyarrow",
                                          batch_size=8, concurrency=2))
    assert vid.num_rows == 80  # 20 × 4 frames
    # determinism: same payload → same features
    img2 = dataset_to_table(ds.map_batches(ImageDecodeResize, batch_format="pyarrow",
                                           batch_size=4, concurrency=1))
    assert img.sort_by("media_id")["image_feat"].equals(
        img2.sort_by("media_id")["image_feat"])


# -- real media codecs (round 2) ----------------------------------------------

def test_png_roundtrip_all_color_types():
    from datavec_ray.ops.codecs import decode_png, encode_png
    rng = np.random.default_rng(7)
    for shape in [(5, 9), (6, 4, 3), (3, 7, 4), (4, 4, 2)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_png(encode_png(img))
        expect = img if img.ndim > 2 else img
        assert out.shape == expect.shape
        assert np.array_equal(out, expect)


def test_png_decode_filtered_rows():
    """Decode must reconstruct Sub/Up/Average/Paeth-filtered rows."""
    import struct
    import zlib

    from datavec_ray.ops.codecs import PNG_MAGIC, decode_png, encode_png
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)

    # re-encode with one row per filter type (0,1,2,3,4)
    raw = bytearray()
    prev = np.zeros(18, dtype=np.int64)
    for y in range(5):
        f = y % 5
        line = img[y].reshape(-1).astype(np.int64)
        enc = np.zeros(18, dtype=np.int64)
        for x in range(18):
            a = line[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if f == 0:
                enc[x] = line[x]
            elif f == 1:
                enc[x] = line[x] - a
            elif f == 2:
                enc[x] = line[x] - b
            elif f == 3:
                enc[x] = line[x] - (a + b) // 2
            else:
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                enc[x] = line[x] - pred
        raw += bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes()
        prev = line

    def chunk(typ, payload):
        return (struct.pack(">I", len(payload)) + typ + payload
                + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF))

    data = (PNG_MAGIC
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(data), img)
    # sanity: our own encoder round-trips the same image
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_bmp_roundtrip():
    from datavec_ray.ops.codecs import decode_bmp, encode_bmp
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)  # odd width → padding
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_wav_roundtrip():
    from datavec_ray.ops.codecs import decode_wav, encode_wav
    t = np.arange(1600) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    out, rate = decode_wav(encode_wav(sig, 16000))
    assert rate == 16000
    assert len(out) == 1600
    assert np.abs(out - sig).max() < 1e-3  # 16-bit quantization


def test_image_decode_resize_real_pixels(ray_session):
    """Known gradient image → decoded grayscale features match pixels."""
    import ray.data as rd
    from datavec_ray.ops.codecs import encode_bmp, encode_png
    from datavec_ray.ops.multimodal import MEDIA_SCHEMA, ImageDecodeResize
    grad = np.tile(np.arange(16, dtype=np.uint8) * 16, (16, 1))
    img = np.stack([grad] * 3, axis=2)  # gray gradient as RGB
    t = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array([encode_png(img), encode_bmp(img)], pa.binary()),
        "media_type": pa.array(["image", "image"]),
        "width": pa.array([16, 16], pa.int32()),
        "height": pa.array([16, 16], pa.int32()),
        "sample_rate": pa.array([0, 0], pa.int32()),
        "duration_ms": pa.array([0, 0], pa.int32()),
    }, schema=MEDIA_SCHEMA)
    out = dataset_to_table(rd.from_arrow(t).map_batches(
        ImageDecodeResize(4, 4, deterministic_fake=False),
        batch_format="pyarrow")).sort_by("media_id")
    for row in range(2):
        feat = np.array(out["image_feat"][row].as_py()).reshape(4, 4)
        # sampled columns 0,5,10,15 of the gradient → 0, 80, 160, 240 (/255)
        expect = np.array([0, 80, 160, 240], dtype=np.float32) / 255.0
        assert np.allclose(feat, np.tile(expect, (4, 1)), atol=1e-6)


def test_audio_features_real_wav(ray_session):
    """Constant-amplitude sine → every frame RMS ≈ 0.5/sqrt(2)."""
    import ray.data as rd
    from datavec_ray.ops.codecs import encode_wav
    from datavec_ray.ops.multimodal import MEDIA_SCHEMA, AudioFeatures
    t_ = np.arange(16000) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t_)
    t = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "payload": pa.array([encode_wav(sig, 16000)], pa.binary()),
        "media_type": pa.array(["audio"]),
        "width": pa.array([0], pa.int32()),
        "height": pa.array([0], pa.int32()),
        "sample_rate": pa.array([16000], pa.int32()),
        "duration_ms": pa.array([1000], pa.int32()),
    }, schema=MEDIA_SCHEMA)
    out = dataset_to_table(rd.from_arrow(t).map_batches(
        AudioFeatures(8, deterministic_fake=False), batch_format="pyarrow"))
    feat = np.array(out["audio_feat"][0].as_py())
    assert np.allclose(feat, 0.5 / np.sqrt(2), atol=0.01)


def test_bpe_token_count():
    from datavec_ray.ops.textstats import bpe_token_count
    t = pa.table({"text": ["it's a well-known fact", "hello   world 123",
                           None, ""]})
    # it|'s| a| well|-|known| fact = 7;  hello|sp|world(sp-prefixed)| 123 = 4
    assert bpe_token_count(t["text"]).to_pylist() == [7, 4, 0, 0]


def test_pq_lossless_on_codebook_corpus(ray_session):
    """When every normalized corpus subvector IS a codeword, encoding is
    exact (assignment distance 0) and ADC scores equal true cosines —
    PQ top-k must match brute force row for row."""
    import ray.data as rd

    from datavec_ray.ops.similarity import (brute_force_topk, pq_encode,
                                            pq_topk)
    rng = np.random.default_rng(5)
    corpus = rng.standard_normal((60, 16))
    corpus = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    # codebooks = the normalized corpus's own subvectors (60 codewords)
    cb = np.stack([corpus[:, j * 4:(j + 1) * 4] for j in range(4)])
    ct = pa.table({"vec_id": pa.array(range(60), pa.int64()),
                   "embedding": pa.array(corpus.tolist(),
                                         pa.list_(pa.float64()))})
    q = corpus[:3]
    codes = pq_encode(rd.from_arrow(ct).repartition(3), cb)
    approx = dataset_to_table(pq_topk(codes, cb, q, k=5)).to_pandas()
    exact = dataset_to_table(brute_force_topk(
        rd.from_arrow(ct), q, k=5)).to_pandas()
    for qi in range(3):
        a = approx[approx.query_id == qi].sort_values(
            ["cosine", "match_id"], ascending=[False, True])
        e = exact[exact.query_id == qi].sort_values(
            ["cosine", "match_id"], ascending=[False, True])
        assert set(a.match_id) == set(e.match_id)
        assert np.allclose(sorted(a.cosine), sorted(e.cosine), atol=1e-9)


def test_pq_recall_and_determinism(ray_session):
    import ray.data as rd

    from datavec_ray.ops.similarity import (brute_force_topk, pq_encode,
                                            pq_topk, pq_train)
    rng = np.random.default_rng(6)
    vecs = rng.standard_normal((300, 16)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(300), pa.int64()),
                  "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32()))})
    q = vecs[:3].astype(np.float64)
    cb = pq_train(rd.from_arrow(t), m=4, nbits=6, sample_frac=1.0)
    codes = pq_encode(rd.from_arrow(t).repartition(4), cb)
    a1 = dataset_to_table(pq_topk(codes, cb, q, k=10)).to_pandas()
    exact = dataset_to_table(brute_force_topk(
        rd.from_arrow(t), q, k=10)).to_pandas()
    for qi in range(3):
        e = set(exact[exact.query_id == qi]["match_id"])
        a = set(a1[a1.query_id == qi]["match_id"])
        assert len(e & a) / len(e) >= 0.5, (qi, len(e & a))
    # deterministic: retrain + re-encode reproduces the result exactly
    cb2 = pq_train(rd.from_arrow(t), m=4, nbits=6, sample_frac=1.0)
    assert np.array_equal(cb, cb2)
    codes2 = pq_encode(rd.from_arrow(t).repartition(7), cb2)
    a2 = dataset_to_table(pq_topk(codes2, cb2, q, k=10)).to_pandas()
    key = ["query_id", "match_id"]
    assert a1.sort_values(key).reset_index(drop=True)[key].equals(
        a2.sort_values(key).reset_index(drop=True)[key])
    # dim not divisible by m
    import pytest as _pytest
    with _pytest.raises(ValueError, match="divisible"):
        pq_train(rd.from_arrow(t), m=5, sample_frac=1.0)


def test_ivfpq_physical_index_recall_and_pruning(ray_session, tmp_path):
    import os

    import ray.data as rd

    from datavec_ray.ops.similarity import (brute_force_topk, ivfpq_build,
                                            ivfpq_query)
    rng = np.random.default_rng(8)
    # clustered data so coarse probing is meaningful
    centers = rng.standard_normal((6, 16)) * 4
    vecs = (centers[rng.integers(0, 6, 400)]
            + rng.standard_normal((400, 16))).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(400), pa.int64()),
                  "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32()))})
    idx = str(tmp_path / "ivfpq")
    ivfpq_build(rd.from_arrow(t).repartition(4), idx, num_centroids=6,
                m=8, nbits=8, sample_frac=1.0)
    assert os.path.exists(os.path.join(idx, "codebooks.npy"))
    q = vecs[:3].astype(np.float64)
    exact = dataset_to_table(brute_force_topk(
        rd.from_arrow(t), q, k=10)).to_pandas()
    approx = dataset_to_table(ivfpq_query(idx, q, k=10, nprobe=3)).to_pandas()
    for qi in range(3):
        e = set(exact[exact.query_id == qi]["match_id"])
        a = set(approx[approx.query_id == qi]["match_id"])
        assert len(e & a) / len(e) >= 0.5, (qi, len(e & a))
    # probing 1 of 6 centroids reads at most ... the matched partition
    # rows only: every returned match must live in a probed partition
    one = dataset_to_table(ivfpq_query(idx, q[:1], k=10, nprobe=1))
    assert one.num_rows == 10
    # what a full probe returns equals what the codes can express at all:
    # nprobe=C is PQ-over-everything, recall vs exact stays high
    full = dataset_to_table(ivfpq_query(idx, q, k=10, nprobe=6)).to_pandas()
    for qi in range(3):
        e = set(exact[exact.query_id == qi]["match_id"])
        f = set(full[full.query_id == qi]["match_id"])
        assert len(e & f) / len(e) >= 0.6
