"""Multimodal (image/audio/video) column plumbing.

Parity targets: the reference's media readers/transform chains —
``datavec-data-image/.../ImageRecordReader.java:33`` +
``ImageTransformProcess.java:43`` (OpenCV chain),
``datavec-data-codec/.../CodecRecordReader.java:56`` (video→frames),
``datavec-data-audio/.../WavFileRecordReader.java:32``.

Representation: media is an opaque ``binary`` column plus typed
metadata columns; every decode/feature stage is an ACTOR-POOL
``map_batches`` class (native decoder init once per actor — the
reference's per-executor OpenCV/ffmpeg loading). The actual codecs are
NOT in this container, so the decode kernel is stubbed: with
``deterministic_fake=True`` it produces a seeded, shape-correct fake
decode (so the Ray plumbing — schema, batch sizing, actor signature,
output layout — is real and tested); otherwise it raises
NotImplementedError at the decode call site.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from datavec_ray.steps.base import combine

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),   # "image" | "audio" | "video"
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synth_media_table(n: int, seed: int = 3) -> pa.Table:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 512)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    types = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    return pa.table({
        "media_id": pa.array(np.arange(n), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
        "media_type": pa.array(types.tolist(), pa.string()),
        "width": pa.array(rng.integers(16, 256, n).astype(np.int32)),
        "height": pa.array(rng.integers(16, 256, n).astype(np.int32)),
        "sample_rate": pa.array(np.full(n, 16000, np.int32)),
        "duration_ms": pa.array(rng.integers(100, 5000, n).astype(np.int32)),
    }, schema=MEDIA_SCHEMA)


class ImageDecodeResize:
    """Actor-pool stage: decode image bytes → resize → float feature
    vector column (list<float32> of size target_h*target_w, grayscale).

    Small batch sizes are mandatory for large binary payloads — pass
    batch_size explicitly when wiring (e.g. 64); the output vector layout
    is row-major (h, w) flattened.
    """

    def __init__(self, target_h: int = 8, target_w: int = 8,
                 deterministic_fake: bool = True):
        self.h, self.w = target_h, target_w
        self.fake = deterministic_fake
        # real path would initialize the native decoder ONCE here:
        # self.decoder = cv2/PIL handle (not available in this container)

    def _decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image codec not available in this environment; "
                "install pillow/opencv and replace _decode")
        # deterministic fake: seeded by content digest, shape (height, width)
        seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(),
                              "little")
        rng = np.random.default_rng(seed)
        return rng.random((height, width), dtype=np.float32)

    def _resize(self, img: np.ndarray) -> np.ndarray:
        ys = np.linspace(0, img.shape[0] - 1, self.h).astype(int)
        xs = np.linspace(0, img.shape[1] - 1, self.w).astype(int)
        return img[np.ix_(ys, xs)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = combine(batch["payload"]).to_pylist()
        ws = combine(batch["width"]).to_pylist()
        hs = combine(batch["height"]).to_pylist()
        feats = np.empty((len(payloads), self.h * self.w), dtype=np.float32)
        for i, (p, w, h) in enumerate(zip(payloads, ws, hs)):
            feats[i] = self._resize(self._decode(p, w, h)).ravel()
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel()), self.h * self.w).cast(pa.list_(pa.float32()))
        return batch.append_column(pa.field("image_feat", pa.list_(pa.float32())),
                                   arr)


class AudioFeatures:
    """Actor-pool stage: audio bytes → frame-energy feature vector
    (n_frames float32). Decode stubbed like ImageDecodeResize."""

    def __init__(self, n_frames: int = 16, deterministic_fake: bool = True):
        self.n_frames = n_frames
        self.fake = deterministic_fake

    def _decode(self, payload: bytes, sample_rate: int) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError("audio codec not available; stub")
        seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(),
                              "little")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(sample_rate // 10).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = combine(batch["payload"]).to_pylist()
        srs = combine(batch["sample_rate"]).to_pylist()
        feats = np.empty((len(payloads), self.n_frames), dtype=np.float32)
        for i, (p, sr) in enumerate(zip(payloads, srs)):
            wave = self._decode(p, sr)
            frames = np.array_split(wave, self.n_frames)
            feats[i] = [float(np.sqrt((f ** 2).mean())) if len(f) else 0.0
                        for f in frames]
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel()), self.n_frames).cast(pa.list_(pa.float32()))
        return batch.append_column(pa.field("audio_feat", pa.list_(pa.float32())),
                                   arr)


class VideoFrameSample:
    """Actor-pool stage: sample n frames from a video payload → one row per
    frame (explode), each with a frame feature vector. Frame decode
    stubbed; the explode layout (media_id, frame_idx, frame_feat) is real."""

    def __init__(self, n_frames: int = 4, feat: int = 16,
                 deterministic_fake: bool = True):
        self.n_frames, self.feat, self.fake = n_frames, feat, deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = combine(batch["payload"]).to_pylist()
        ids = combine(batch["media_id"]).to_pylist()
        out_ids, out_fidx, feats = [], [], []
        for mid, p in zip(ids, payloads):
            if not self.fake:
                raise NotImplementedError("video codec not available; stub")
            seed = int.from_bytes(hashlib.blake2b(p, digest_size=8).digest(),
                                  "little")
            rng = np.random.default_rng(seed)
            for f in range(self.n_frames):
                out_ids.append(mid)
                out_fidx.append(f)
                feats.append(rng.random(self.feat, dtype=np.float32))
        flat = np.concatenate(feats) if feats else np.empty(0, np.float32)
        arr = pa.FixedSizeListArray.from_arrays(pa.array(flat), self.feat) \
            .cast(pa.list_(pa.float32()))
        return pa.table({"media_id": pa.array(out_ids, pa.int64()),
                         "frame_idx": pa.array(out_fidx, pa.int32()),
                         "frame_feat": arr})
