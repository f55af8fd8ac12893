"""Multimodal (image/audio/video) column plumbing.

Parity targets: the reference's media readers/transform chains —
``datavec-data-image/.../ImageRecordReader.java:33`` +
``ImageTransformProcess.java:43`` (OpenCV chain),
``datavec-data-codec/.../CodecRecordReader.java:56`` (video→frames),
``datavec-data-audio/.../WavFileRecordReader.java:32``.

Representation: media is an opaque ``binary`` column plus typed
metadata columns; every decode/feature stage is an ACTOR-POOL
``map_batches`` class (decoder state init once per actor — the
reference's per-executor OpenCV/ffmpeg loading).

Codecs: PNG, BMP, baseline JPEG, GIF, WAV, Y4M and AVI/MJPEG video
payloads are decoded FOR REAL via the pure-stdlib codecs in
``datavec_ray.ops.codecs`` (zlib PNG inflate + filter reconstruction,
24-bit BMP, T.81 baseline-JPEG Huffman+IDCT incl. 4:2:0, GIF LZW, PCM
WAV, YUV4MPEG2 luma planes, RIFF AVI walking + per-frame JPEG) —
pipelines and tests exercise true pixel/sample/frame values. Formats
needing a native library
(AVC/VP8/VP9/AV1 bitstreams inside mp4/webm) raise NotImplementedError
unless ``deterministic_fake=True``, which substitutes a content-seeded
fake so the Ray plumbing (schema, batch sizing, actor signature,
output layout) stays real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datavec_ray.hll import hash64
from datavec_ray.ops import codecs
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
    """Deterministic media rows with REAL payloads: PNG/BMP/JPEG/GIF
    images, PCM WAV audio and Y4M / AVI-MJPEG / MP4-MJPEG video (all
    encoded by the stdlib codecs)."""
    rng = np.random.default_rng(seed)
    types = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads, widths, heights, rates, durs = [], [], [], [], []
    for i in range(n):
        t = types[i]
        if t == "image":
            h = int(rng.integers(8, 32))
            w = int(rng.integers(8, 32))
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            if i % 4 == 3:
                # GIF is indexed color: draw from a 64-color palette
                pal = rng.integers(0, 256, (64, 3), dtype=np.uint8)
                img = pal[rng.integers(0, 64, (h, w))]
                enc = codecs.encode_gif
            else:
                enc = (codecs.encode_png, codecs.encode_bmp,
                       codecs.encode_jpeg)[i % 4]
            payloads.append(enc(img))
            widths.append(w)
            heights.append(h)
            rates.append(0)
            durs.append(0)
        elif t == "audio":
            rate = 16000
            dur_ms = int(rng.integers(50, 400))
            tgrid = np.arange(rate * dur_ms // 1000) / rate
            freq = float(rng.uniform(100, 2000))
            samples = 0.5 * np.sin(2 * np.pi * freq * tgrid)
            payloads.append(codecs.encode_wav(samples, rate))
            widths.append(0)
            heights.append(0)
            rates.append(rate)
            durs.append(dur_ms)
        else:
            h = int(rng.integers(8, 24))
            w = int(rng.integers(8, 24))
            nfr = int(rng.integers(3, 10))
            frames = rng.integers(0, 256, (nfr, h, w), dtype=np.uint8)
            enc = (codecs.encode_y4m,
                   lambda f, fps: codecs.encode_avi_mjpeg(f, fps=fps),
                   lambda f, fps: codecs.encode_mp4_mjpeg(f, fps=fps))[i % 3]
            payloads.append(enc(frames, fps=10))
            widths.append(w)
            heights.append(h)
            rates.append(0)
            durs.append(nfr * 100)
    return pa.table({
        "media_id": pa.array(np.arange(n), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
        "media_type": pa.array(types.tolist(), pa.string()),
        "width": pa.array(np.array(widths, np.int32)),
        "height": pa.array(np.array(heights, np.int32)),
        "sample_rate": pa.array(np.array(rates, np.int32)),
        "duration_ms": pa.array(np.array(durs, np.int32)),
    }, schema=MEDIA_SCHEMA)


def _content_seeded(payload: bytes, shape) -> np.ndarray:
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(),
                          "little")
    return np.random.default_rng(seed).random(shape, dtype=np.float32)


class ImageDecodeResize:
    """Actor-pool stage: decode image bytes → grayscale [0,1] → resize →
    float feature vector column (list<float32> of size target_h*target_w).

    PNG/BMP/JPEG/GIF payloads decode for real; undecodable formats fall
    back to a content-seeded fake when ``deterministic_fake`` else
    raise. Small
    batch sizes are mandatory for large binary payloads — pass
    batch_size explicitly when wiring (e.g. 64); the output vector
    layout is row-major (h, w) flattened.
    """

    def __init__(self, target_h: int = 8, target_w: int = 8,
                 deterministic_fake: bool = True):
        self.h, self.w = target_h, target_w
        self.fake = deterministic_fake

    def _decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        try:
            img = codecs.decode_image(payload)
        except Exception as e:  # noqa: BLE001
            if not self.fake:
                raise NotImplementedError(
                    f"cannot decode payload ({e}); install a native codec "
                    "or pass deterministic_fake=True") from e
            return _content_seeded(payload, (max(height, 1), max(width, 1)))
        if img.ndim == 3:
            img = img.mean(axis=2)
        return img.astype(np.float32) / 255.0

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


def _unit_draws(ids: np.ndarray, seed: int, step: int,
                j: int) -> np.ndarray:
    """Deterministic uniform[0,1) per image: splitmix64 finalizer over
    (id hash, epoch seed, step index, draw index). Pure function of the
    row — augmentation reproduces across reruns and partitionings."""
    x = (ids.astype(np.uint64)
         + np.uint64((seed + 1) * 0x9E3779B97F4A7C15 % (1 << 64))
         + np.uint64((step + 1) * 0xBF58476D1CE4E5B9 % (1 << 64))
         + np.uint64((j + 1) * 0x94D049BB133111EB % (1 << 64)))
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)


class ImageAugmentChain:
    """ImageTransformProcess parity (ImageTransformProcess.java:43):
    a declarative chain of image ops applied to the decoded image
    column — the whole batch stacked into ONE (N, H, W) ndarray, every
    op a vectorized kernel across all images (no per-image Python
    loop). PipelineImageTransform parity (PipelineImageTransform.java):
    any step may carry a probability ``p`` — inclusion is decided per
    image by a splitmix64 draw seeded from (id, epoch seed, step
    index), so the random chain is DETERMINISTIC per row and varies by
    ``seed`` across epochs.

    Steps (dicts):
      {"op": "random_crop", "h": H', "w": W'}          (per-image offset;
          with "p": gated-out rows crop DETERMINISTICALLY at the
          top-left corner — the output shape must stay uniform, so the
          gate controls the randomness, not whether a crop happens)
      {"op": "flip_h", "p": q} | {"op": "flip_v", "p": q}
      {"op": "rot90", "p": q}                          (square images)
      {"op": "brightness", "delta": d, "p": q}         (additive, clipped)
      {"op": "normalize", "mean": m, "std": s}         (affine)

    Operates on the ``ImageDecodeResize`` output layout (row-major
    flattened grayscale floats). Use as an actor-pool ``map_batches``
    class: steps validate in ``__init__`` once per actor.
    """

    _OPS = {"random_crop", "flip_h", "flip_v", "rot90", "brightness",
            "normalize"}

    def __init__(self, steps, h: int, w: int, in_col: str = "image_feat",
                 id_col: str = "media_id", out_col: str = "image_aug",
                 seed: int = 0):
        self.steps = [dict(s) for s in steps]
        self.h, self.w = h, w
        self.in_col, self.id_col, self.out_col = in_col, id_col, out_col
        self.seed = seed
        ch, cw = h, w
        for s in self.steps:
            op = s.get("op")
            if op not in self._OPS:
                raise ValueError(f"unknown image op {op!r}")
            if op == "random_crop":
                if not (0 < s["h"] <= ch and 0 < s["w"] <= cw):
                    raise ValueError(
                        f"crop {s['h']}x{s['w']} exceeds image {ch}x{cw}")
                ch, cw = s["h"], s["w"]
            if op == "rot90" and ch != cw:
                raise ValueError(
                    "rot90 with probability needs square images "
                    f"(got {ch}x{cw}) — output shape must be uniform")
        self.out_h, self.out_w = ch, cw
        self.__name__ = "image_augment"

    def apply_stack(self, img: np.ndarray, ids: np.ndarray) -> np.ndarray:
        """(N, H, W) float stack → (N, out_h, out_w). Pure numpy; shared
        by the actor path and the local oracle in tests."""
        n = len(img)
        for k, s in enumerate(self.steps):
            op = s["op"]
            gate = _unit_draws(ids, self.seed, k, 0) < s["p"] \
                if "p" in s else np.ones(n, bool)
            if op == "random_crop":
                hh, ww = s["h"], s["w"]
                oy = np.floor(_unit_draws(ids, self.seed, k, 1)
                              * (img.shape[1] - hh + 1)).astype(np.int64)
                ox = np.floor(_unit_draws(ids, self.seed, k, 2)
                              * (img.shape[2] - ww + 1)).astype(np.int64)
                # a crop must happen regardless (uniform output shape);
                # the probability gate selects random vs corner offset
                oy = np.where(gate, oy, 0)
                ox = np.where(gate, ox, 0)
                rows = oy[:, None] + np.arange(hh)
                cols = ox[:, None] + np.arange(ww)
                img = img[np.arange(n)[:, None, None],
                          rows[:, :, None], cols[:, None, :]]
            elif op == "flip_h":
                img = np.where(gate[:, None, None], img[:, :, ::-1], img)
            elif op == "flip_v":
                img = np.where(gate[:, None, None], img[:, ::-1, :], img)
            elif op == "rot90":
                img = np.where(gate[:, None, None],
                               np.rot90(img, axes=(1, 2)), img)
            elif op == "brightness":
                d = (_unit_draws(ids, self.seed, k, 1) * 2 - 1) * s["delta"]
                img = np.clip(img + np.where(gate, d, 0.0)[:, None, None],
                              0.0, 1.0)
            else:  # normalize
                img = (img - s["mean"]) / s["std"]
        return img

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = combine(batch[self.in_col])
        flat = np.asarray(col.flatten().to_numpy(zero_copy_only=False),
                          np.float32)
        img = flat.reshape(-1, self.h, self.w).astype(np.float64)
        ids = hash64(combine(batch[self.id_col]))
        out = self.apply_stack(img, ids).astype(np.float32)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(out.ravel()), self.out_h * self.out_w) \
            .cast(pa.list_(pa.float32()))
        return batch.append_column(
            pa.field(self.out_col, pa.list_(pa.float32())), arr)


class AudioFeatures:
    """Actor-pool stage: audio bytes → frame-RMS-energy feature vector
    (n_frames float32). WAV payloads decode for real (stdlib PCM);
    other formats fall back to a content-seeded fake when
    ``deterministic_fake`` else raise."""

    def __init__(self, n_frames: int = 16, deterministic_fake: bool = True):
        self.n_frames = n_frames
        self.fake = deterministic_fake

    def _decode(self, payload: bytes, sample_rate: int) -> np.ndarray:
        try:
            x, _rate = codecs.decode_wav(payload)
        except Exception as e:  # noqa: BLE001
            if not self.fake:
                raise NotImplementedError(
                    f"cannot decode audio payload ({e})") from e
            return _content_seeded(payload, max(sample_rate // 10, 16))
        if x.ndim > 1:
            x = x.mean(axis=1)
        return x.astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = combine(batch["payload"]).to_pylist()
        srs = combine(batch["sample_rate"]).to_pylist()
        feats = np.empty((len(payloads), self.n_frames), dtype=np.float32)
        for i, (p, sr) in enumerate(zip(payloads, srs)):
            wave_ = self._decode(p, sr)
            frames = np.array_split(wave_, self.n_frames)
            feats[i] = [float(np.sqrt((f ** 2).mean())) if len(f) else 0.0
                        for f in frames]
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel()), self.n_frames).cast(pa.list_(pa.float32()))
        return batch.append_column(pa.field("audio_feat", pa.list_(pa.float32())),
                                   arr)


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (type-II, norm='ortho')."""
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    d = np.sqrt(2.0 / n) * np.cos(np.pi / n * (m + 0.5) * k)
    d[0] /= np.sqrt(2.0)
    return d


class ImagePHash:
    """Perceptual image hash (classic DCT pHash): 2D DCT-II of the
    decoded image via two batched matmuls over the whole (N, H, W)
    stack, keep the top-left 8x8 low-frequency block, threshold each
    coefficient against the per-image median of the non-DC block →
    64-bit ``phash`` (uint64). Near-duplicate images (re-encodes, mild
    noise, small edits) differ in few bits; pipe the column into
    ``dedup.simhash_pairs(hash_col="phash")`` for banded Hamming
    near-dup pairs at corpus scale. Operates on the
    ``ImageDecodeResize`` output layout (use target >= 8x8; 32x32 is
    the classic choice)."""

    def __init__(self, h: int = 32, w: int = 32,
                 in_col: str = "image_feat", out_col: str = "phash"):
        if h < 8 or w < 8:
            raise ValueError("pHash needs at least an 8x8 image")
        self.h, self.w = h, w
        self.in_col, self.out_col = in_col, out_col
        self._dh = _dct_matrix(h)
        self._dw = _dct_matrix(w)
        self.__name__ = "image_phash"

    def hash_stack(self, img: np.ndarray) -> np.ndarray:
        """(N, H, W) float stack → (N,) uint64 pHashes."""
        dct = np.einsum("ij,njk,lk->nil", self._dh, img, self._dw,
                        optimize=True)
        block = dct[:, :8, :8].reshape(len(img), 64)
        med = np.median(block[:, 1:], axis=1)       # exclude DC
        bits = (block > med[:, None]).astype(np.uint64)
        return (bits << np.arange(64, dtype=np.uint64)).sum(
            axis=1, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = combine(batch[self.in_col])
        flat = np.asarray(col.flatten().to_numpy(zero_copy_only=False),
                          np.float64)
        img = flat.reshape(-1, self.h, self.w)
        return batch.append_column(pa.field(self.out_col, pa.uint64()),
                                   pa.array(self.hash_stack(img)))


class AudioSpectrogram:
    """Actor-pool stage: audio bytes → log-power spectrogram, flattened
    to a ``(n_frames * n_bins)`` float32 vector (``spec_feat``) plus the
    dominant frequency in Hz (``peak_hz``). Real DSP on the decoded PCM:
    fixed ``n_frames`` Hann-windowed frames → ``np.fft.rfft`` →
    ``log1p(|X|^2)``, each spectrum subsampled to ``n_bins`` bins. All
    frames of a payload are transformed in ONE batched rfft call; WAV
    decodes for real (stdlib PCM), other formats fall back to the
    content-seeded fake when ``deterministic_fake`` else raise."""

    def __init__(self, n_frames: int = 8, n_bins: int = 32,
                 frame_len: int = 512, deterministic_fake: bool = True):
        self.n_frames, self.n_bins = n_frames, n_bins
        self.frame_len = frame_len
        self.fake = deterministic_fake
        self.window = np.hanning(frame_len).astype(np.float64)
        self.__name__ = "audio_spectrogram"

    def _decode(self, payload: bytes, sample_rate: int) -> np.ndarray:
        try:
            x, _rate = codecs.decode_wav(payload)
        except Exception as e:  # noqa: BLE001
            if not self.fake:
                raise NotImplementedError(
                    f"cannot decode audio payload ({e})") from e
            return _content_seeded(payload, max(sample_rate // 10, 16))
        if x.ndim > 1:
            x = x.mean(axis=1)
        return x.astype(np.float64)

    def _frames_of(self, x: np.ndarray) -> np.ndarray:
        L = self.frame_len
        need = self.n_frames * L
        if len(x) < need:
            x = np.pad(x, (0, need - len(x)))
        # evenly spaced frame starts across the clip (frames overlap on
        # long clips, tile short ones)
        starts = np.linspace(0, len(x) - L, self.n_frames).astype(np.int64)
        return x[starts[:, None] + np.arange(L)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = combine(batch["payload"]).to_pylist()
        srs = combine(batch["sample_rate"]).to_pylist()
        n = len(payloads)
        frames = np.empty((n, self.n_frames, self.frame_len), np.float64)
        for i, (p, sr) in enumerate(zip(payloads, srs)):
            frames[i] = self._frames_of(self._decode(p, sr or 16000))
        spec = np.abs(np.fft.rfft(frames * self.window, axis=2)) ** 2
        # dominant frequency from the mean spectrum (skip the DC bin)
        mean_spec = spec.mean(axis=1)
        peak_bin = 1 + np.argmax(mean_spec[:, 1:], axis=1)
        rates = np.array([sr or 16000 for sr in srs], np.float64)
        peak_hz = peak_bin * rates / self.frame_len
        # subsample each log-spectrum to n_bins
        sel = np.linspace(0, spec.shape[2] - 1, self.n_bins).astype(int)
        feats = np.log1p(spec[:, :, sel]).astype(np.float32) \
            .reshape(n, self.n_frames * self.n_bins)
        out = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel()), self.n_frames * self.n_bins) \
            .cast(pa.list_(pa.float32()))
        batch = batch.append_column(
            pa.field("spec_feat", pa.list_(pa.float32())), out)
        return batch.append_column(pa.field("peak_hz", pa.float64()),
                                   pa.array(peak_hz))


class AudioMFCC(AudioSpectrogram):
    """Actor-pool stage: audio bytes → MFCCs (Davis & Mermelstein 1980,
    HTK mel scale) — the classic compact speech/audio feature the
    spectrogram stage feeds in a real ASR-data pipeline. Per clip:
    fixed Hann frames → batched ``rfft`` power spectra → ``n_mels``
    triangular mel filters → ``log`` → orthonormal DCT-II →
    first ``n_mfcc`` coefficients, pooled to per-clip mean and stdev
    vectors (``mfcc_mean``/``mfcc_std``, each ``n_mfcc`` floats — the
    standard clip-level embedding for similarity/dedup over audio).
    All numpy matmuls over the whole batch; the mel filterbank and DCT
    basis build ONCE per actor (__init__)."""

    def __init__(self, n_frames: int = 8, frame_len: int = 512,
                 n_mels: int = 26, n_mfcc: int = 13,
                 deterministic_fake: bool = True):
        super().__init__(n_frames=n_frames, n_bins=n_mels,
                         frame_len=frame_len,
                         deterministic_fake=deterministic_fake)
        self.n_mels, self.n_mfcc = n_mels, n_mfcc
        # DCT-II with orthonormal scaling (rows = coefficients)
        k = np.arange(n_mels, dtype=np.float64)
        c = np.arange(n_mfcc, dtype=np.float64)[:, None]
        self.dct = np.cos(np.pi * c * (2 * k + 1) / (2 * n_mels)) \
            * np.sqrt(2.0 / n_mels)
        self.dct[0] /= np.sqrt(2.0)
        self._fb_cache: dict[int, np.ndarray] = {}
        self.__name__ = "audio_mfcc"

    def _mel_fb(self, rate: int) -> np.ndarray:
        """(n_mels, frame_len//2+1) triangular filterbank, HTK mel."""
        fb = self._fb_cache.get(rate)
        if fb is not None:
            return fb
        n_fft = self.frame_len
        mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)  # noqa: E731
        imel = lambda m: 700.0 * (10.0 ** (m / 2595.0) - 1.0)  # noqa: E731
        pts = imel(np.linspace(mel(0.0), mel(rate / 2.0),
                               self.n_mels + 2))
        bins = np.floor((n_fft + 1) * pts / rate).astype(np.int64)
        fb = np.zeros((self.n_mels, n_fft // 2 + 1))
        for m in range(1, self.n_mels + 1):
            lo, mid, hi = bins[m - 1], bins[m], bins[m + 1]
            if mid > lo:
                fb[m - 1, lo:mid] = (np.arange(lo, mid) - lo) / (mid - lo)
            if hi > mid:
                fb[m - 1, mid:hi] = (hi - np.arange(mid, hi)) / (hi - mid)
        self._fb_cache[rate] = fb
        return fb

    def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: D102
        payloads = combine(batch["payload"]).to_pylist()
        srs = [s or 16000 for s in
               combine(batch["sample_rate"]).to_pylist()]
        n = len(payloads)
        frames = np.empty((n, self.n_frames, self.frame_len), np.float64)
        for i, (p, sr) in enumerate(zip(payloads, srs)):
            frames[i] = self._frames_of(self._decode(p, sr))
        spec = np.abs(np.fft.rfft(frames * self.window, axis=2)) ** 2
        mean = np.empty((n, self.n_mfcc), np.float64)
        std = np.empty((n, self.n_mfcc), np.float64)
        for rate in set(srs):                      # batched per rate
            idx = np.fromiter((i for i, s in enumerate(srs) if s == rate),
                              np.int64)
            mels = np.log(spec[idx] @ self._mel_fb(rate).T + 1e-10)
            mf = mels @ self.dct.T                 # (k, frames, n_mfcc)
            mean[idx] = mf.mean(axis=1)
            std[idx] = mf.std(axis=1)
        for name, mat in (("mfcc_mean", mean), ("mfcc_std", std)):
            arr = pa.FixedSizeListArray.from_arrays(
                pa.array(mat.astype(np.float32).ravel()), self.n_mfcc) \
                .cast(pa.list_(pa.float32()))
            batch = batch.append_column(
                pa.field(name, pa.list_(pa.float32())), arr)
        return batch


def video_phash_pairs(ds, id_col: str = "media_id", n_frames: int = 4,
                      grid: int = 8, min_shared: int = 2,
                      num_partitions: int = 32,
                      deterministic_fake: bool = True,
                      max_bucket: int = 256):
    """Video near-duplicate pairs: sample ``n_frames`` evenly per video
    (REAL Y4M decode), perceptual-hash each frame's ``grid``x``grid``
    luma plane (the DCT pHash kernel, batched over every frame in the
    batch at once), then bucket videos on EXACT frame-hash matches —
    pairs sharing >= ``min_shared`` distinct frame hashes are emitted
    with their shared-frame count. Re-encoded / brightness-shifted /
    trimmed copies keep most frame pHashes, so they collide; the
    exchange carries (frame_hash, video_id) rows only — never frames.

    A frame hash shared by more than ``max_bucket`` videos (black /
    title-card frames) would cost O(n^2) pairs in one task; such
    buckets are STAR-LINKED to their min-id member instead (the same
    oversized-bucket fallback every LSH stage uses) and logged — near
    dups stay reachable through the hub via their other shared frames.

    Returns (id_a, id_b, shared_frames), id_a < id_b.
    """
    import logging
    log = logging.getLogger(__name__)
    from datavec_ray.misc import _GPART, _group_partition, _key_run_starts
    from datavec_ray.steps.base import combine as _combine

    sampler = VideoFrameSample(n_frames, grid * grid,
                               deterministic_fake=deterministic_fake)
    hasher = ImagePHash(grid, grid, in_col="frame_feat",
                        out_col="fh")

    def _hash_frames(batch: pa.Table) -> pa.Table:
        f = sampler(batch)
        f = hasher(f)
        # distinct (video, frame hash) — repeated identical frames in
        # one video must count once
        g = pa.table({id_col: f[id_col], "fh": f["fh"]}) \
            .group_by([id_col, "fh"], use_threads=False) \
            .aggregate([([], "count_all")])
        return pa.table({id_col: g[id_col],
                         "fh": g["fh"].cast(pa.uint64())})

    def _pairs(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART]).sort_by(
            [("fh", "ascending"), (id_col, "ascending")])
        if g.num_rows == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        g = g.combine_chunks()
        starts = np.flatnonzero(_key_run_starts(g, ["fh"]))
        seg_len = np.diff(np.append(starts, g.num_rows))
        ids = _combine(g[id_col]).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        a_all, b_all = [], []
        for s, ln in zip(starts, seg_len):
            if ln < 2:
                continue
            mem = ids[s:s + ln]
            if ln > max_bucket:
                # degenerate common frame: star to the min id, not n^2
                log.warning(
                    "video frame-hash bucket of %d videos exceeds "
                    "max_bucket=%d: star-linking to min id", ln,
                    max_bucket)
                hub = mem.min()
                others = mem[mem != hub]
                a_all.append(np.minimum(others, hub))
                b_all.append(np.maximum(others, hub))
                continue
            ai, bi = np.triu_indices(ln, k=1)
            a_all.append(mem[ai])
            b_all.append(mem[bi])
        if not a_all:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"id_a": pa.array(np.concatenate(a_all)),
                         "id_b": pa.array(np.concatenate(b_all)),
                         "n": pa.array(np.ones(
                             sum(map(len, a_all)), np.int64))})

    _pairs.__name__ = "video_frame_pairs"
    hashed = ds.map_batches(_hash_frames, batch_format="pyarrow",
                            batch_size=32)
    pairs = _group_partition(hashed, ["fh"], num_partitions) \
        .groupby(_GPART).map_groups(_pairs, batch_format="pyarrow")
    agg = pairs.groupby(["id_a", "id_b"]).sum("n")

    def _final(b: pa.Table) -> pa.Table:
        t = pa.table({"id_a": b["id_a"], "id_b": b["id_b"],
                      "shared_frames": b["sum(n)"].cast(pa.int64())})
        return t.filter(pc.greater_equal(t["shared_frames"], min_shared))

    return agg.map_batches(_final, batch_format="pyarrow")


BOX_TYPE = pa.list_(pa.struct([
    ("xmin", pa.float32()), ("ymin", pa.float32()),
    ("xmax", pa.float32()), ("ymax", pa.float32()),
    ("label", pa.string()),
]))


class AttachBoxes:
    """Actor-pool stage: attach per-image bounding-box labels
    (ObjectDetectionRecordReader parity,
    ``datavec-data-image/.../objdetect/ObjectDetectionRecordReader.java:57``
    — image + label-provider boxes).

    The (small) label table is broadcast once with ``ray.put`` and
    grouped into a per-actor dict in ``__init__`` — the standard
    broadcast small-side join, never a shuffle. Output adds a
    ``boxes`` list<struct{xmin,ymin,xmax,ymax,label}> column.
    """

    def __init__(self, boxes_ref, id_col: str = "media_id"):
        import ray
        tbl: pa.Table = ray.get(boxes_ref)
        self.id_col = id_col
        self.by_id: dict[int, list[dict]] = {}
        for row in tbl.to_pylist():
            self.by_id.setdefault(int(row[id_col]), []).append(
                {k: row[k] for k in ("xmin", "ymin", "xmax", "ymax", "label")})

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = combine(batch[self.id_col]).to_pylist()
        boxes = [self.by_id.get(int(i), []) for i in ids]
        return batch.append_column(pa.field("boxes", BOX_TYPE),
                                   pa.array(boxes, BOX_TYPE))


def object_detection_records(media_ds, boxes: pa.Table,
                             id_col: str = "media_id",
                             target_h: int = 8, target_w: int = 8,
                             deterministic_fake: bool = True):
    """Image payloads + bounding-box labels → (media_id, image_feat,
    boxes) records: broadcast-label join + actor-pool decode/resize.
    ``boxes`` columns: media_id, xmin, ymin, xmax, ymax, label."""
    import ray
    ref = ray.put(boxes)
    with_boxes = media_ds.map_batches(
        AttachBoxes, batch_format="pyarrow",
        fn_constructor_args=(ref, id_col), concurrency=(1, 4), max_restarts=0)
    decoded = with_boxes.map_batches(
        ImageDecodeResize(target_h, target_w, deterministic_fake),
        batch_format="pyarrow", batch_size=64)
    return decoded.select_columns([id_col, "image_feat", "boxes"])


class VideoFrameSample:
    """Actor-pool stage: sample n frames from a video payload → one row per
    frame (explode), each with a frame luma-feature vector.

    Y4M (YUV4MPEG2), AVI/MJPEG, MP4/MJPEG and Matroska/webm
    (MJPEG/uncompressed samples) payloads decode FOR REAL —
    evenly-sampled frames, grayscale luma plane resized to a
    ``feat``-long vector (sqrt(feat) grid). Codecs needing a native
    decoder (AVC/VP8/VP9/AV1 bitstreams) fall back to a content-seeded
    fake when ``deterministic_fake`` else raise — OR decode for real
    through a user-supplied ``external_decoder(codec_id, sample) ->
    ndarray`` (an ffmpeg/PyAV wrapper in a real deployment): the
    pure-stdlib MP4/Matroska demuxers feed it one compressed sample at
    a time, and the callable ships to every actor of the pool (pickled
    once at pool construction, not per batch)."""

    def __init__(self, n_frames: int = 4, feat: int = 16,
                 deterministic_fake: bool = True,
                 external_decoder=None):
        self.n_frames, self.feat, self.fake = n_frames, feat, deterministic_fake
        self.external = external_decoder
        self.side = int(np.sqrt(feat))
        if self.side * self.side != feat:
            raise ValueError("feat must be a perfect square (grid resize)")

    def _frames(self, payload: bytes) -> np.ndarray:
        """(n_frames, feat) float32 in [0, 1]."""
        try:
            frames, _fps = codecs.decode_video(payload,
                                               external=self.external)
        except Exception as e:  # noqa: BLE001
            if not self.fake:
                raise NotImplementedError(
                    f"cannot decode video payload ({e}); only Y4M and "
                    "AVI/MJPEG decode without a native codec") from e
            return _content_seeded(payload, (self.n_frames, self.feat))
        if len(frames) == 0:
            return np.zeros((self.n_frames, self.feat), np.float32)
        pick = np.linspace(0, len(frames) - 1, self.n_frames).astype(int)
        h, w = frames.shape[1:]
        ys = np.linspace(0, h - 1, self.side).astype(int)
        xs = np.linspace(0, w - 1, self.side).astype(int)
        out = frames[pick][:, ys][:, :, xs].astype(np.float32) / 255.0
        return out.reshape(self.n_frames, self.feat)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = combine(batch["payload"]).to_pylist()
        ids = combine(batch["media_id"]).to_pylist()
        out_ids, out_fidx, feats = [], [], []
        for mid, p in zip(ids, payloads):
            frames = self._frames(p)
            for f in range(self.n_frames):
                out_ids.append(mid)
                out_fidx.append(f)
                feats.append(frames[f])
        flat = np.concatenate(feats) if feats else np.empty(0, np.float32)
        arr = pa.FixedSizeListArray.from_arrays(pa.array(flat), self.feat) \
            .cast(pa.list_(pa.float32()))
        return pa.table({"media_id": pa.array(out_ids, pa.int64()),
                         "frame_idx": pa.array(out_fidx, pa.int32()),
                         "frame_feat": arr})
