"""Tokenizer-preprocessor family (reference EndingPreProcessor.java /
StopWords.java / movingwindow/Windows.java): Porter stemmer golden
cases, ending-stripper parity, stopword removal, context windows."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from datavec_ray.util import dataset_to_table

# classic examples from Porter (1980), every algorithm step exercised
PORTER_CASES = {
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat", "feed": "feed", "agreed": "agre",
    "plastered": "plaster", "bled": "bled", "motoring": "motor",
    "sing": "sing", "conflated": "conflat", "troubled": "troubl",
    "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz",
    "failing": "fail", "filing": "file", "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "triplicate": "triplic",
    "formative": "form", "formalize": "formal", "electriciti": "electr",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
    "cease": "ceas", "controll": "control", "roll": "roll",
}


def test_porter_stem_golden():
    from datavec_ray.steps.nlp import porter_stem
    bad = {w: (porter_stem(w), e) for w, e in PORTER_CASES.items()
           if porter_stem(w) != e}
    assert not bad, bad


def test_ending_stem_java_parity():
    """Exact EndingPreProcessor.java order: s (not ss), '.', ed, ing,
    ly — applied sequentially to the mutated token."""
    from datavec_ray.steps.nlp import ending_stem_array

    def java_ref(tok):
        if tok.endswith("s") and not tok.endswith("ss"):
            tok = tok[:-1]
        if tok.endswith("."):
            tok = tok[:-1]
        if tok.endswith("ed"):
            tok = tok[:-2]
        if tok.endswith("ing"):
            tok = tok[:-3]
        if tok.endswith("ly"):
            tok = tok[:-2]
        return tok

    toks = ["cats", "pass", "running.", "quickly", "tested", "ssing",
            "s", "miss.", "likes", "dated", "houses.", "ties", "sly",
            "bed.", "glass", "was", "is", "ss", "fed", "freed."]
    got = ending_stem_array(pa.array(toks, pa.string())).to_pylist()
    assert got == [java_ref(t) for t in toks]


def test_stem_tokens_step_both_modes():
    from datavec_ray.steps.nlp import StemTokens

    t = pa.table({"tok": pa.array(["running", "hopping", "cats", None],
                                  pa.string())})
    porter = StemTokens("tok", mode="porter").apply(t)["tok"].to_pylist()
    assert porter == ["run", "hop", "cat", None]
    ending = StemTokens("tok", mode="ending").apply(t)["tok"].to_pylist()
    assert ending == ["runn", "hopp", "cat", None]
    # serde round trip
    d = StemTokens("tok", mode="ending").to_dict()
    assert StemTokens.from_dict(d).mode == "ending"


def test_remove_stopwords():
    from datavec_ray.steps.nlp import STOP_WORDS, RemoveStopWords

    t = pa.table({"tok": pa.array(["The", "quick", "and", "brown",
                                   "aren't", "foxes"], pa.string()),
                  "i": pa.array(range(6), pa.int64())})
    out = RemoveStopWords("tok").apply(t)
    assert out["tok"].to_pylist() == ["quick", "brown", "foxes"]
    assert "the" in STOP_WORDS and "aren't" in STOP_WORDS
    custom = RemoveStopWords("tok", stopwords=["quick"]).apply(t)
    assert "quick" not in custom["tok"].to_pylist()
    assert "and" in custom["tok"].to_pylist()


def test_context_windows_padding_and_focus(ray_session):
    from datavec_ray.steps.nlp import context_windows

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["a b c d", "x"], pa.string())})
    out = dataset_to_table(
        context_windows(rd.from_arrow(t), "text", "doc_id",
                        window_size=5)).to_pandas() \
        .sort_values(["doc_id", "seq_pos"]).reset_index(drop=True)
    assert list(out["focus"]) == ["a", "b", "c", "d", "x"]
    wins = [list(w) for w in out["window"]]
    assert wins[0] == ["<s>", "<s>", "a", "b", "c"]
    assert wins[1] == ["<s>", "a", "b", "c", "d"]
    assert wins[2] == ["a", "b", "c", "d", "</s>"]
    assert wins[3] == ["b", "c", "d", "</s>", "</s>"]
    assert wins[4] == ["<s>", "<s>", "x", "</s>", "</s>"]
    assert list(out["seq_pos"]) == [0, 1, 2, 3, 0]


def test_image_endpoints_round_trip():
    """ImageSparkTransformServer parity: POST a base64 PNG with a known
    pixel pattern, get back the decoded/resized (and augmented) float32
    array (SingleImageRecord / BatchImageRecord -> Base64NDArrayBody)."""
    from datavec_ray.ops.codecs import encode_bmp, encode_png
    from datavec_ray.serve_http import TransformClient, TransformServer

    img = np.zeros((8, 8), dtype=np.uint8)
    img[0, 0] = 255                        # known hot pixel, top-left
    img[7, 7] = 128
    srv = TransformServer().start()
    try:
        cli = TransformClient(f"http://{srv.host}:{srv.port}")
        cli.set_image_pipeline({"h": 8, "w": 8})
        assert cli.get_image_pipeline()["h"] == 8
        one = cli.transform_image_incremental(encode_png(img))
        assert one.shape == (8, 8) and one.dtype == np.float32
        assert abs(one[0, 0] - 1.0) < 1e-6
        assert abs(one[7, 7] - 128 / 255) < 1e-6
        assert one[3, 4] == 0.0
        # batch: PNG and BMP payloads of the same image decode alike
        rgb = np.repeat(img[:, :, None], 3, axis=2)
        batch = cli.transform_image([encode_png(img), encode_bmp(rgb)])
        assert batch.shape == (2, 8, 8)
        assert np.allclose(batch[0], batch[1], atol=1e-6)
        # hot-swap: add a flip_v augment (p=1 -> deterministic)
        cli.set_image_pipeline({"h": 8, "w": 8,
                                "steps": [{"op": "flip_v", "p": 1.0}]})
        flipped = cli.transform_image_incremental(encode_png(img))
        assert abs(flipped[7, 0] - 1.0) < 1e-6   # hot pixel moved rows
        # undecodable payload -> clean 400, not a crash
        import urllib.error
        try:
            cli.transform_image_incremental(b"not an image")
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.stop()


# ---------------------------------------------------------------------------
# baseline JPEG codec
# ---------------------------------------------------------------------------

def _seg(marker, body):
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def test_decode_jpeg_handcrafted_dc_only_gray():
    """Decoder verified INDEPENDENTLY of the encoder: a hand-built
    single-block grayscale JPEG with quant table all-1s and a DC-only
    coefficient of 320 must decode to a flat 128 + 320/8 = 168 block."""
    from datavec_ray.ops.codecs import _JPEG_ZZ, decode_jpeg

    zz = bytes(64)  # placeholder; all-1 table below
    qt = bytes([1] * 64)
    dqt = _seg(0xDB, bytes([0]) + qt)
    sof = _seg(0xC0, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    # DC table: single symbol 'category 9' with code '0' (length 1)
    dht_dc = _seg(0xC4, bytes([0x00, 1] + [0] * 15 + [9]))
    # AC table: single symbol EOB (0x00) with code '0'
    dht_ac = _seg(0xC4, bytes([0x10, 1] + [0] * 15 + [0]))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # bits: DC code '0', 9 value bits of +320, AC EOB '0', pad 1s
    entropy = bytes([0b01010000, 0b00011111])
    jpg = b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + entropy \
        + b"\xff\xd9"
    out = decode_jpeg(jpg)
    assert out.shape == (8, 8)
    assert (out == 168).all(), np.unique(out)
    assert len(_JPEG_ZZ) == 64 and len(zz) == 64


def test_decode_jpeg_handcrafted_420_color():
    """4:2:0 sampling path, hand-built: a 16x16 MCU (4 Y blocks + Cb +
    Cr), Y DC = +320 on the first block then zero diffs, chroma flat
    128 — decodes to uniform gray RGB (168, 168, 168)."""
    from datavec_ray.ops.codecs import decode_jpeg

    qt = bytes([1] * 64)
    dqt = _seg(0xDB, bytes([0]) + qt)
    sof = _seg(0xC0, bytes([8, 0, 16, 0, 16, 3,
                            1, 0x22, 0,     # Y 2x2
                            2, 0x11, 0,     # Cb 1x1
                            3, 0x11, 0]))   # Cr 1x1
    # DC table: category 9 -> '0', category 0 -> '10'
    dht_dc = _seg(0xC4, bytes([0x00, 1, 1] + [0] * 14 + [9, 0]))
    dht_ac = _seg(0xC4, bytes([0x10, 1] + [0] * 15 + [0]))
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    # per block: DC sym + value bits, then AC EOB '0' each.
    # Y1: 0 +101000000 0 | Y2..Y4: 10 0 | Cb: 10 0 | Cr: 10 0 | pad 1s
    bits = "0" + "101000000" + "0" + "100" * 5 + "1" * 6
    assert len(bits) % 8 == 0
    entropy = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
    jpg = b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + entropy \
        + b"\xff\xd9"
    out = decode_jpeg(jpg)
    assert out.shape == (16, 16, 3)
    assert (out == 168).all(), np.unique(out)


def test_jpeg_round_trip_quality():
    """Encoder+decoder round trip on smooth content stays within a
    small RMS at high quality, exact shape at odd sizes, RGB + gray."""
    from datavec_ray.ops.codecs import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:64, 0:48]
    img = (128 + 100 * np.sin(xx / 9) * np.cos(yy / 11)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert dec.shape == img.shape
    assert np.sqrt(np.mean((dec.astype(float) - img) ** 2)) < 2.0
    rgb = np.stack([img, img[::-1], (xx * 4).astype(np.uint8)], axis=2)
    dec3 = decode_jpeg(encode_jpeg(rgb, quality=90))
    assert dec3.shape == rgb.shape
    assert np.sqrt(np.mean((dec3.astype(float) - rgb) ** 2)) < 3.0
    odd = (xx[:37, :29] * 3 + yy[:37, :29]).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(odd, quality=95))
    assert d.shape == odd.shape
    assert np.sqrt(np.mean((d.astype(float) - odd) ** 2)) < 1.0
    # quality knob is monotone-ish: q10 worse than q90
    lo = decode_jpeg(encode_jpeg(img, quality=10))
    hi = decode_jpeg(encode_jpeg(img, quality=90))
    rms = lambda a: np.sqrt(np.mean((a.astype(float) - img) ** 2))  # noqa
    assert rms(lo) > rms(hi)


def test_jpeg_dispatch_and_unsupported_sof_rejected():
    from datavec_ray.ops.codecs import (decode_image, encode_jpeg,
                                        encode_jpeg_progressive)

    img = np.full((8, 8), 77, np.uint8)
    assert (decode_image(encode_jpeg(img, quality=100)) == img).all() or \
        np.abs(decode_image(encode_jpeg(img, quality=100)).astype(int)
               - 77).max() <= 1
    # progressive SOF2 now decodes for real through the dispatcher
    assert np.abs(decode_image(encode_jpeg_progressive(img, quality=100))
                  .astype(int) - 77).max() <= 1
    # lossless SOF3 raises a clear NotImplementedError
    lossless = encode_jpeg(img).replace(b"\xff\xc0", b"\xff\xc3", 1)
    import pytest
    with pytest.raises(NotImplementedError):
        decode_image(lossless)


def test_context_label_retriever(ray_session):
    """ContextLabelRetriever.java parity: strip <LABEL>...</LABEL>
    markers, return spans over the stripped sentence; plain stretches
    labeled NONE/none; mismatches raise."""
    import pytest

    from datavec_ray.steps.nlp import (extract_context_labels,
                                       string_with_labels)

    s, spans = string_with_labels(
        "ship to <LOC> new york </LOC> by <NUM> 5 </NUM> pm")
    assert s == "ship to new york by 5 pm"
    got = [(lab, s[b:e]) for b, e, lab in spans]
    assert got == [("NONE", "ship to"), ("LOC", "new york"),
                   ("NONE", "by"), ("NUM", "5"), ("none", "pm")]
    with pytest.raises(ValueError):
        string_with_labels("oops </LOC> no begin")
    with pytest.raises(ValueError):
        string_with_labels("<LOC> x </NUM>")

    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["a <X> b c </X> d"], pa.string())})
    out = dataset_to_table(extract_context_labels(
        rd.from_arrow(t))).to_pandas().sort_values("begin")
    assert list(out["label"]) == ["NONE", "X", "none"]
    assert list(out["span_text"]) == ["a", "b c", "d"]
    assert out["stripped"].iloc[0] == "a b c d"


def test_split_sentences_rules(ray_session):
    """Sentence splitting: punctuation-run breaks, abbreviation guard
    (Dr./Mr./e.g. dots never end a sentence), terminal punctuation
    stripped, empties dropped, 0-based per-doc ordinals."""
    from datavec_ray.ops.textstats import split_sentences
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["Hello world. Dr. Smith met Mr. Jones! Was it fun? Yes.",
                 "One sentence only",
                 "Ends abruptly... e.g. this stays.   Next!  ",
                 ""]})
    out = dataset_to_table(split_sentences(rd.from_arrow(t))) \
        .to_pandas().sort_values(["doc_id", "sent_idx"])
    got = list(zip(out.doc_id, out.sent_idx, out.sentence))
    assert got == [
        (1, 0, "Hello world"), (1, 1, "Dr. Smith met Mr. Jones"),
        (1, 2, "Was it fun"), (1, 3, "Yes"),
        (2, 0, "One sentence only"),
        (3, 0, "Ends abruptly"), (3, 1, "e.g. this stays"),
        (3, 2, "Next")]
