"""Web-curation family: HTML extraction, URL ops, blocklist, WARC."""

import gzip
import os

import pyarrow as pa
import pytest

from datavec_ray.ops.web import (
    HtmlTextExtract, blocklist_pattern, blocklist_tag, extract_urls,
    synth_html, url_domain_stats, url_host,
)


def docs_table():
    return pa.table({
        "doc_id": pa.array([0, 1, 97], pa.int64()),
        "text": ["hello spark world", "slow data dup", "plain words"],
        "lang": ["en", "fr", "en"],
        "source": ["src1", "src2", "src1"],
    })


def test_synth_html_deterministic():
    t = synth_html(docs_table())
    h = t["html"][0].as_py()
    assert h.startswith("<html><head><title>doc 0</title>")
    assert 'href="https://src1.example.com/d/0"' in h
    assert 'href="http://mirror-en.example.org/d/0?x=1#f"' in h
    # pure function: same input, same bytes
    assert synth_html(docs_table())["html"].equals(t["html"])
    # doc 97 -> m97 = 0, m13 = 6
    h97 = t["html"][2].as_py()
    assert "src1.example.com/d/0" in h97 and "example.org/d/6?x=1" in h97


def test_html_text_extract():
    t = synth_html(docs_table())
    out = HtmlTextExtract("html")(t)
    assert "html" not in out.column_names
    assert out["title"].to_pylist() == ["doc 0", "doc 1", "doc 97"]
    assert out["body_text"][0].as_py() == "doc 0\nhello spark world\nl0\nl1"
    assert out["links"][0].as_py() == [
        "https://src1.example.com/d/0",
        "http://mirror-en.example.org/d/0?x=1#f"]
    # script/style stripped; malformed html survives
    t2 = pa.table({"html": [
        "<body><script>x<y</script><style>p{}</style>ok<b>bold",
        None]})
    o2 = HtmlTextExtract("html")(t2)
    assert o2["body_text"].to_pylist() == ["ok\nbold", None]
    assert o2["links"].to_pylist() == [[], None]


def test_extract_urls_and_host():
    col = pa.array([
        'see https://A.Example.com/x and http://b.org/y?z=1 end',
        "no urls here", None])
    lists = extract_urls(col)
    assert lists.to_pylist() == [
        ["https://A.Example.com/x", "http://b.org/y?z=1"], [], None]
    hosts = url_host(lists.flatten())
    assert hosts.to_pylist() == ["a.example.com", "b.org"]
    assert url_host(pa.array(["not a url"])).to_pylist() == [None]


def test_blocklist_tag():
    col = pa.array(["Spark is SLOW", "sparkly dupes", "dup spark slow", None])
    n, flag = blocklist_tag(col, ["spark", "slow", "dup"])
    assert n.to_pylist() == [2, 0, 3, 0]       # word boundaries hold
    assert flag.to_pylist() == [True, False, True, False]
    n2, _ = blocklist_tag(col, ["spark"], whole_word=False)
    assert n2.to_pylist() == [1, 1, 1, 0]
    n3, _ = blocklist_tag(col, ["spark"], case_insensitive=False)
    assert n3.to_pylist() == [0, 0, 1, 0]
    with pytest.raises(ValueError):
        blocklist_pattern([])


def test_url_domain_stats(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(synth_html(docs_table())).repartition(2)
    out = url_domain_stats(ds, "html")
    rows = {r["host"]: (r["n_urls"], r["n_pages"])
            for r in out.take_all()}
    assert rows["src1.example.com"] == (2, 2)
    assert rows["src2.example.com"] == (1, 1)
    assert rows["mirror-en.example.org"] == (2, 2)
    assert rows["mirror-fr.example.org"] == (1, 1)


@pytest.mark.parametrize("gz", [True, False])
def test_warc_roundtrip(ray_session, tmp_path, gz):
    import ray.data as rd

    from datavec_ray.sources import read_warc, write_warc

    t = synth_html(docs_table())
    src = pa.table({
        "url": pa.array([f"https://{s}.example.com/page/{d}" for s, d in
                         zip(t["source"].to_pylist(),
                             t["doc_id"].to_pylist())]),
        "payload": t["html"],
    })
    out_dir = str(tmp_path / ("gz" if gz else "plain"))
    manifest = write_warc(rd.from_arrow(src), out_dir,
                          gzip_members=gz)
    assert sum(b["rows"].to_pylist()[0] for b in manifest) == 3
    files = sorted(os.listdir(out_dir))
    assert all(f.endswith(".warc.gz" if gz else ".warc") for f in files)
    if gz:  # member-per-record: decompress walks concatenated members
        raw = gzip.decompress(open(os.path.join(out_dir, files[0]),
                                   "rb").read())
        assert raw.count(b"WARC/1.0\r\n") >= 1

    back = read_warc(out_dir + "/*" if False else
                     [os.path.join(out_dir, f) for f in files],
                     payload_as="text")
    rows = sorted(back.take_all(), key=lambda r: r["url"])
    want = sorted(zip(src["url"].to_pylist(), src["payload"].to_pylist()))
    assert [(r["url"], r["payload"]) for r in rows] == want
    assert all(r["warc_type"] == "resource" and
               r["content_type"] == "text/html" for r in rows)
    # re-export is byte-identical (deterministic record ids + date)
    out2 = str(tmp_path / "again")
    write_warc(rd.from_arrow(src).repartition(1), out2, gzip_members=gz)
    write_warc(rd.from_arrow(src).repartition(1),
               str(tmp_path / "again2"), gzip_members=gz)
    b1 = open(os.path.join(out2, os.listdir(out2)[0]), "rb").read()
    b2 = open(os.path.join(str(tmp_path / "again2"),
                           os.listdir(str(tmp_path / "again2"))[0]),
              "rb").read()
    assert b1 == b2


def test_warc_payload_contains_delimiters(ray_session, tmp_path):
    """Content-Length-driven parse: payloads embedding WARC headers or
    \\r\\n\\r\\n must round-trip unharmed (no mid-payload resync)."""
    import ray.data as rd

    from datavec_ray.sources import read_warc, write_warc

    nasty = [b"WARC/1.0\r\nWARC-Type: resource\r\n\r\nfake inner record",
             b"\r\n\r\nleading blank block", b"", b"\x00\xffbinary\r\n"]
    src = pa.table({"url": [f"https://x.org/{i}" for i in range(len(nasty))],
                    "payload": pa.array(nasty, pa.binary())})
    out = str(tmp_path / "w")
    write_warc(rd.from_arrow(src).repartition(1), out)
    back = sorted(read_warc([os.path.join(out, f)
                             for f in os.listdir(out)]).take_all(),
                  key=lambda r: r["url"])
    assert [r["payload"] for r in back] == nasty


def test_blocklist_regex_metachars():
    col = pa.array(["cost is $5.00 (sale)", "price 5x00"])
    n, flag = blocklist_tag(col, ["$5.00", "(sale)"], whole_word=False)
    assert n.to_pylist() == [2, 0]
    assert flag.to_pylist() == [True, False]


def test_warc_http_response_parse(ray_session, tmp_path):
    """Common-Crawl-style `response` records: http_parse strips the
    HTTP envelope and surfaces the status; resource records and
    unparseable envelopes pass through with a null status."""
    from datavec_ray.sources import read_warc

    body = b"<html>hi</html>"
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body)

    def rec(wtype, url, payload):
        return (b"WARC/1.0\r\nWARC-Type: " + wtype + b"\r\n"
                b"WARC-Target-URI: " + url + b"\r\n"
                b"Content-Length: " + str(len(payload)).encode() +
                b"\r\n\r\n" + payload + b"\r\n\r\n")

    p = tmp_path / "cc.warc"
    p.write_bytes(rec(b"response", b"https://a.org/", http)
                  + rec(b"resource", b"https://b.org/", b"plain")
                  + rec(b"response", b"https://c.org/", b"not-http"))
    rows = sorted(read_warc([str(p)], http_parse=True).take_all(),
                  key=lambda r: r["url"])
    assert rows[0]["http_status"] == 200
    assert rows[0]["payload"] == body           # envelope stripped
    assert rows[1]["http_status"] is None and rows[1]["payload"] == b"plain"
    assert rows[2]["http_status"] is None and rows[2]["payload"] == b"not-http"
    # without http_parse the envelope stays and no column appears
    raw = read_warc([str(p)]).take_all()
    assert all("http_status" not in r for r in raw)
    assert sorted(r["payload"] for r in raw)[0] == http


def test_write_warc_wet_layout(ray_session, tmp_path):
    """warc_type='conversion' + text/plain = Common-Crawl WET shards."""
    import ray.data as rd

    from datavec_ray.sources import read_warc, write_warc

    src = pa.table({"url": ["https://a.org/"], "payload": ["clean text"]})
    out = str(tmp_path / "wet")
    write_warc(rd.from_arrow(src), out, warc_type="conversion",
               content_type="text/plain")
    rows = read_warc([os.path.join(out, f) for f in os.listdir(out)],
                     payload_as="text").take_all()
    assert rows[0]["warc_type"] == "conversion"
    assert rows[0]["content_type"] == "text/plain"
    assert rows[0]["payload"] == "clean text"


def test_hashing_vectorize_parity_and_shape():
    """Whole-batch kernel equals a per-doc naive reference using the
    same hash; signed collisions cancel; layout is sparse-exploded."""
    import numpy as np

    from datavec_ray.hll import hash64
    from datavec_ray.ops.textstats import hashing_vectorize

    t = pa.table({"doc_id": pa.array([7, 8, 9], pa.int64()),
                  "text": ["a b a  c", "", None]})
    out = hashing_vectorize(t, dim=16, seed=3)
    # naive reference
    want = {}
    for did, txt in zip([7, 8, 9], ["a b a  c", "", None]):
        for tok in (txt or "").split(" "):
            if not tok:
                continue
            h = int(hash64(pa.array([tok]), seed=3)[0])
            b = h % 16
            s = -1.0 if (h >> 63) & 1 else 1.0
            want[(did, b)] = want.get((did, b), 0.0) + s
    want = {k: v for k, v in want.items() if v != 0.0}
    got = {(i, b): w for i, b, w in zip(out["doc_id"].to_pylist(),
                                        out["bucket"].to_pylist(),
                                        out["weight"].to_pylist())}
    assert got == want
    assert out["bucket"].to_numpy().max() < 16
    # unsigned mode counts tokens: total weight == total token count
    out2 = hashing_vectorize(t, dim=4, signed=False)
    assert np.isclose(sum(out2["weight"].to_pylist()), 4.0)  # a b a c


def test_logreg_hashed_classifier(ray_session):
    """Distributed full-batch GD: separates a planted token signal,
    matches a local numpy reference run on identical features, and is
    partitioning-invariant (gradients are sums)."""
    import numpy as np
    import ray.data as rd

    from datavec_ray.ops.classifier import (score_logreg_hashed,
                                            train_logreg_hashed)

    rng = np.random.RandomState(5)
    good = [f"clean text sample {i} useful content" for i in range(60)]
    bad = [f"spam spam buy now {i} click here spam" for i in range(60)]
    texts = good + bad
    labels = [1] * 60 + [0] * 60
    order = rng.permutation(len(texts))
    t = pa.table({"text": [texts[i] for i in order],
                  "label": pa.array([labels[i] for i in order],
                                    pa.int64())})

    m1 = train_logreg_hashed(rd.from_arrow(t).repartition(5),
                             dim=1 << 12, epochs=30, lr=1.0, seed=2)
    m2 = train_logreg_hashed(rd.from_arrow(t).repartition(2),
                             dim=1 << 12, epochs=30, lr=1.0, seed=2)
    assert np.allclose(m1["w"], m2["w"], atol=1e-9)  # partition-invariant
    assert m1["losses"][-1] < m1["losses"][0]        # it learns

    scored = score_logreg_hashed(rd.from_arrow(t), m1).take_all()
    acc = np.mean([(r["quality_score"] > 0.5) == (r["label"] == 1)
                   for r in scored])
    assert acc == 1.0                                # separable signal


def test_bm25_parity_with_naive(ray_session):
    """bm25_score == the naive per-doc Okapi formula (plus-one idf),
    invariant to partitioning; empty docs count toward N and avgdl."""
    import math

    import ray.data as rd

    from datavec_ray.ops.textstats import bm25_score
    from datavec_ray.util import dataset_to_table

    docs = ["the cat sat", "cat cat dog", "bird", "", "dog the dog cat"]
    terms = ["cat", "dog"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs)})).repartition(3)
    out = dataset_to_table(bm25_score(ds, terms)).to_pandas()

    toks = [d.lower().split() for d in docs]
    n, avgdl = len(toks), sum(map(len, toks)) / len(toks)
    ref = {}
    for i, x in enumerate(toks):
        s = 0.0
        for t in terms:
            tf = x.count(t)
            if tf:
                df = sum(t in y for y in toks)
                idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
                s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(x) / avgdl))
        if s > 0:
            ref[i] = round(s, 4)
    assert dict(zip(out["doc_id"], out["bm25"])) == ref
    # duplicate query terms collapse; unknown terms contribute nothing
    out2 = dataset_to_table(
        bm25_score(ds, ["cat", "cat", "zzz", "dog"])).to_pandas()
    assert dict(zip(out2["doc_id"], out2["bm25"])) == ref
