"""AVI/MJPEG container and GIF codec tests.

Parity targets: ``CodecRecordReader.java:56`` (datavec-data-codec —
avi via JCodec) and ``ImageRecordReader.java:33`` (gif via imageio).
"""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datavec_ray.ops import codecs as C


def _checker_frames(n=5, h=48, w=64):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([((x * 2 + y + i * 10) % 256).astype(np.uint8)
                     for i in range(n)])


# -- GIF ---------------------------------------------------------------------

def test_gif_lossless_roundtrip_random_palette():
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, (13, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 13, (37, 53))]
    back = C.decode_gif(C.encode_gif(img))
    assert np.array_equal(back, img)


def test_gif_width_growth_and_clear_reset():
    # 200 colors forces LZW code-width growth; noise defeats matches so
    # the dictionary hits 4096 and the encoder emits a mid-stream clear
    rng = np.random.default_rng(3)
    pal = np.stack([np.arange(200), np.arange(200)[::-1],
                    np.full(200, 7)], 1).astype(np.uint8)
    img = pal[rng.integers(0, 200, (200, 300))]
    assert np.array_equal(C.decode_gif(C.encode_gif(img)), img)


def test_gif_decode_image_dispatch():
    img = np.zeros((4, 4, 3), np.uint8)
    img[2, 3] = [1, 2, 3]
    data = C.encode_gif(img)
    assert data[:4] == b"GIF8"
    assert np.array_equal(C.decode_image(data), img)


def test_gif_too_many_colors_raises():
    g = np.arange(64, dtype=np.uint8)
    img = np.stack(np.meshgrid(g, g), -1)
    img = np.concatenate([img, img[:, :, :1] ^ img[:, :, 1:]], -1)
    with pytest.raises(ValueError, match="256 colors"):
        C.encode_gif(img.astype(np.uint8))


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 30), st.integers(1, 30), st.integers(2, 16),
       st.integers(0, 2**32 - 1))
def test_gif_property_lossless(h, w, ncol, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    img = pal[rng.integers(0, ncol, (h, w))]
    assert np.array_equal(C.decode_gif(C.encode_gif(img)), img)


# -- AVI/MJPEG ---------------------------------------------------------------

def test_avi_mjpeg_roundtrip_rms():
    frames = _checker_frames()
    avi = C.encode_avi_mjpeg(frames, fps=12, quality=92)
    back, fps = C.decode_avi(avi)
    assert fps == 12
    assert back.shape == frames.shape
    rms = float(np.sqrt(np.mean((back.astype(float) - frames) ** 2)))
    assert rms < 8.0, rms


def test_avi_rgb_frames_reduce_to_luma():
    rgb = np.zeros((2, 16, 16, 3), np.uint8)
    rgb[0, :, :] = [255, 0, 0]      # pure red → luma ≈ 76
    rgb[1, :, :] = [0, 0, 255]      # pure blue → luma ≈ 29
    back, _ = C.decode_avi(C.encode_avi_mjpeg(rgb, quality=95))
    assert back.shape == (2, 16, 16)
    assert abs(float(back[0].mean()) - 76) < 6
    assert abs(float(back[1].mean()) - 29) < 6


def test_decode_video_dispatch():
    frames = _checker_frames(3, 16, 16)
    y4m, _ = C.decode_video(C.encode_y4m(frames, fps=10))
    assert np.array_equal(y4m, frames)
    avi, fps = C.decode_video(C.encode_avi_mjpeg(frames, fps=24))
    assert avi.shape == frames.shape and fps == 24
    # Matroska/webm now demuxes for real: malformed EBML is a
    # ValueError, and a compressed-bitstream codec raises (see
    # test_mkv_vp9_codec_raises); an unknown container still raises.
    with pytest.raises(ValueError):
        C.decode_video(b"\x1a\x45\xdf\xa3" + b"\x00" * 64)
    with pytest.raises(NotImplementedError, match="container"):
        C.decode_video(b"\x00\x01\x02\x03" + b"\x00" * 64)


def test_video_frame_sample_real_avi(ray_session):
    import ray.data as rd

    from datavec_ray.ops.multimodal import MEDIA_SCHEMA, VideoFrameSample
    from datavec_ray.util import dataset_to_table

    # constant-luma frames survive JPEG exactly (flat DC blocks)
    const = np.stack([np.full((8, 8), v, np.uint8)
                      for v in (0, 85, 170, 255)])
    t = pa.table({
        "media_id": pa.array([11], pa.int64()),
        "payload": pa.array([C.encode_avi_mjpeg(const, fps=4)], pa.binary()),
        "media_type": pa.array(["video"]),
        "width": pa.array([8], pa.int32()),
        "height": pa.array([8], pa.int32()),
        "sample_rate": pa.array([0], pa.int32()),
        "duration_ms": pa.array([1000], pa.int32()),
    }, schema=MEDIA_SCHEMA)
    out = dataset_to_table(rd.from_arrow(t).map_batches(
        VideoFrameSample(n_frames=4, feat=16, deterministic_fake=False),
        batch_format="pyarrow")).sort_by("frame_idx")
    feats = np.asarray(out["frame_feat"].to_pylist(), np.float32)
    want = np.array([0, 85, 170, 255], np.float32) / 255.0
    assert np.allclose(feats.mean(axis=1), want, atol=0.02)


# -- progressive JPEG ----------------------------------------------------------

def test_progressive_jpeg_bit_exact_with_baseline():
    rng = np.random.default_rng(5)
    for shape, q in [((16, 16), 85), ((33, 41, 3), 90), ((8, 8), 50),
                     ((64, 48, 3), 75), ((7, 5), 85)]:
        img = rng.integers(0, 256, shape, np.uint8)
        base = C.decode_jpeg(C.encode_jpeg(img, q))
        prog_bytes = C.encode_jpeg_progressive(img, q)
        assert prog_bytes[:2] == b"\xff\xd8"
        assert b"\xff\xc2" in prog_bytes[:256]   # SOF2 marker present
        assert np.array_equal(C.decode_jpeg(prog_bytes), base)


def test_progressive_jpeg_eob_heavy_content():
    # smooth gradient → long EOB runs; constant → everything is EOB
    smooth = np.tile(np.arange(64, dtype=np.uint8) * 4, (64, 1))
    assert np.array_equal(
        C.decode_jpeg(C.encode_jpeg_progressive(smooth, 95)),
        C.decode_jpeg(C.encode_jpeg(smooth, 95)))
    const = np.full((40, 40, 3), 128, np.uint8)
    assert np.array_equal(
        C.decode_jpeg(C.encode_jpeg_progressive(const, 85)),
        C.decode_jpeg(C.encode_jpeg(const, 85)))


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.booleans(),
       st.integers(40, 98), st.integers(0, 2**32 - 1))
def test_progressive_jpeg_property(h, w, color, quality, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    img = rng.integers(0, 256, shape, np.uint8)
    assert np.array_equal(
        C.decode_jpeg(C.encode_jpeg_progressive(img, quality)),
        C.decode_jpeg(C.encode_jpeg(img, quality)))


# -- MP4/MJPEG (ISO-BMFF demux) ------------------------------------------------

def test_mp4_mjpeg_roundtrip():
    frames = _checker_frames(4, 32, 24)
    mp4 = C.encode_mp4_mjpeg(frames, fps=15, quality=92)
    assert mp4[4:8] == b"ftyp"
    back, fps = C.decode_mp4_mjpeg(mp4)
    assert fps == 15 and back.shape == frames.shape
    rms = float(np.sqrt(np.mean((back.astype(float) - frames) ** 2)))
    assert rms < 8.0, rms
    # dispatcher route
    b2, f2 = C.decode_video(mp4)
    assert np.array_equal(b2, back) and f2 == 15


def test_mp4_non_mjpeg_codec_raises():
    frames = _checker_frames(2, 16, 16)
    mp4 = bytearray(C.encode_mp4_mjpeg(frames, fps=10))
    i = mp4.find(b"jpeg", mp4.find(b"stsd"))    # sample entry fourcc
    mp4[i:i + 4] = b"avc1"
    with pytest.raises(NotImplementedError, match="motion-JPEG"):
        C.decode_mp4_mjpeg(bytes(mp4))


def test_gif_interlaced_decode():
    # build an interlaced GIF by encoding the 4-pass row permutation
    # and setting the interlace flag in the image descriptor
    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 16, (23, 11))]
    fh = img.shape[0]
    rows = np.concatenate([np.arange(0, fh, 8), np.arange(4, fh, 8),
                           np.arange(2, fh, 4), np.arange(1, fh, 2)])
    data = bytearray(C.encode_gif(img[rows]))
    # image descriptor follows 13-byte header + 3*ncol GCT
    ncol = 2 << (data[10] & 7)
    desc = 13 + 3 * ncol
    assert data[desc] == 0x2C
    data[desc + 9] |= 0x40                      # interlace flag
    assert np.array_equal(C.decode_gif(bytes(data)), img)


# -- Matroska/webm (EBML demux) ------------------------------------------------

def _block(track, rel, flags, tail):
    return (bytes([0x80 | track]) + rel.to_bytes(2, "big", signed=True)
            + bytes([flags]) + tail)


def test_mkv_mjpeg_roundtrip():
    frames = _checker_frames(6, 48, 64)
    mkv = C.encode_mkv_mjpeg(frames, fps=25, quality=92)
    assert mkv[:4] == C.MKV_MAGIC
    back, fps = C.decode_mkv(mkv)
    assert fps == 25 and back.shape == frames.shape
    rms = float(np.sqrt(np.mean((back.astype(float) - frames) ** 2)))
    assert rms < 8.0, rms
    b2, f2 = C.decode_video(mkv)                # dispatcher route
    assert np.array_equal(b2, back) and f2 == 25


def test_mkv_block_lacing_modes():
    # no lacing
    body = _block(1, -5, 0x80, b"ABC")
    assert C._mkv_block_frames(body, 0, len(body)) == (1, -5, [b"ABC"])
    # Xiph: sizes 300 (255+45), 2, remainder 4
    x = bytes([2, 255, 45, 2]) + b"A" * 300 + b"BB" + b"CCCC"
    body = _block(1, 0, 0x80 | 2, x)
    _, _, fs = C._mkv_block_frames(body, 0, len(body))
    assert [len(f) for f in fs] == [300, 2, 4] and fs[1] == b"BB"
    # fixed-size: 3 equal frames
    body = _block(1, 0, 0x80 | 4, bytes([2]) + b"AAAA" + b"BBBB" + b"CCCC")
    _, _, fs = C._mkv_block_frames(body, 0, len(body))
    assert fs == [b"AAAA", b"BBBB", b"CCCC"]
    # EBML: first abs 500 (2-byte vint), delta -3 (2-byte signed vint)
    uv = (0x4000 | 500).to_bytes(2, "big")
    sv = (0x4000 | (-3 + (1 << 13) - 1)).to_bytes(2, "big")
    x = bytes([2]) + uv + sv + b"A" * 500 + b"B" * 497 + b"C" * 9
    body = _block(1, 7, 0x80 | 6, x)
    _, rel, fs = C._mkv_block_frames(body, 0, len(body))
    assert rel == 7 and [len(f) for f in fs] == [500, 497, 9]


def test_mkv_uncompressed_track_exact():
    frames = _checker_frames(3, 20, 16)
    h, w = frames.shape[1], frames.shape[2]
    info = C._ebml_el(C._MKV_INFO,
                      C._ebml_uint_el(C._MKV_TIMESCALE, 1_000_000))
    tracks = C._ebml_el(C._MKV_TRACKS, C._ebml_el(
        C._MKV_TRACKENTRY, b"".join([
            C._ebml_uint_el(C._MKV_TRACKNUM, 1),
            C._ebml_uint_el(C._MKV_TRACKTYPE, 1),
            C._ebml_el(C._MKV_CODECID, b"V_UNCOMPRESSED"),
            C._ebml_el(C._MKV_VIDEO,
                       C._ebml_uint_el(C._MKV_PIXELW, w)
                       + C._ebml_uint_el(C._MKV_PIXELH, h))])))
    blocks = [C._ebml_uint_el(C._MKV_CLUSTERTS, 0)]
    for i in range(3):
        blocks.append(C._ebml_el(
            C._MKV_SIMPLEBLOCK, _block(1, i * 40, 0x80,
                                       frames[i].tobytes())))
    seg = C._ebml_el(C._MKV_SEGMENT,
                     info + tracks
                     + C._ebml_el(C._MKV_CLUSTER, b"".join(blocks)))
    ref = C.encode_mkv_mjpeg(frames, fps=25)    # borrow a valid header
    header = ref[:ref.index(C._ebml_id_bytes(C._MKV_SEGMENT))]
    out, fps = C.decode_mkv(header + seg)
    assert np.array_equal(out, frames) and fps == 25


def test_mkv_vp9_codec_raises():
    frames = _checker_frames(2, 16, 16)
    mkv = C.encode_mkv_mjpeg(frames, fps=10).replace(b"V_MJPEG", b"V_VP9\x00\x00")
    with pytest.raises(NotImplementedError, match="V_MJPEG"):
        C.decode_mkv(mkv)


def test_mp4_external_decoder_hook():
    """The MP4 demux feeds non-MJPEG samples to a user-supplied
    decode(codec_id, sample) callable instead of raising — the
    pure-stdlib demux / pluggable-bitstream boundary
    (CodecRecordReader.java:56 delegates the same split to JCodec)."""
    frames = _checker_frames(3, 16, 16)
    mp4 = bytearray(C.encode_mp4_mjpeg(frames, fps=10, quality=95))
    i = mp4.find(b"jpeg", mp4.find(b"stsd"))    # sample entry fourcc
    mp4[i:i + 4] = b"avc1"
    seen = []

    def fake_decoder(codec_id, sample):
        seen.append(codec_id)
        return C.decode_jpeg(sample)            # payloads are still JPEG

    back, fps = C.decode_video(bytes(mp4), external=fake_decoder)
    assert fps == 10 and back.shape == frames.shape
    assert seen == ["avc1"] * 3
    rms = float(np.sqrt(np.mean((back.astype(float) - frames) ** 2)))
    assert rms < 8.0, rms
    # without the hook the boundary still raises
    with pytest.raises(NotImplementedError, match="motion-JPEG"):
        C.decode_mp4_mjpeg(bytes(mp4))


def test_mkv_external_decoder_hook():
    frames = _checker_frames(2, 16, 16)
    mkv = bytearray(C.encode_mkv_mjpeg(frames, fps=25, quality=95))
    i = mkv.find(b"V_MJPEG")
    mkv[i:i + 7] = b"V_MPEG1"                   # same length, unknown codec
    seen = []

    def fake_decoder(codec_id, sample):
        seen.append(codec_id)
        return C.decode_jpeg(sample)

    back, _fps = C.decode_mkv(bytes(mkv), external=fake_decoder)
    assert back.shape == frames.shape and seen == ["V_MPEG1"] * 2
    with pytest.raises(NotImplementedError, match="V_MJPEG"):
        C.decode_mkv(bytes(mkv))


def test_video_frame_sample_external_decoder(ray_session):
    """external_decoder ships into the actor pool and decodes a
    'compressed' payload for real instead of the deterministic fake."""
    import ray.data as rd

    from datavec_ray.ops.multimodal import VideoFrameSample
    from datavec_ray.util import dataset_to_table
    frames = _checker_frames(4, 16, 16)
    mp4 = bytearray(C.encode_mp4_mjpeg(frames, fps=10, quality=95))
    i = mp4.find(b"jpeg", mp4.find(b"stsd"))
    mp4[i:i + 4] = b"avc1"
    t = pa.table({"media_id": pa.array([7], pa.int64()),
                  "payload": pa.array([bytes(mp4)], pa.binary())})

    def fake_decoder(codec_id, sample):
        assert codec_id == "avc1"
        return C.decode_jpeg(sample)

    got = dataset_to_table(rd.from_arrow(t).map_batches(
        VideoFrameSample(n_frames=2, feat=16, deterministic_fake=False,
                         external_decoder=fake_decoder),
        batch_format="pyarrow", concurrency=1)).to_pandas()
    assert len(got) == 2 and set(got.media_id) == {7}
    # real decode: first sampled frame matches the source frame's grid
    side = 4
    ys = np.linspace(0, 15, side).astype(int)
    want = frames[0][ys][:, ys].astype(np.float32).ravel() / 255.0
    gotv = np.array(list(got.frame_feat[got.frame_idx == 0])[0],
                    np.float32)
    assert np.allclose(gotv, want, atol=0.15)
