"""Pure-stdlib media codecs (no PIL/opencv/ffmpeg in this container).

Real decoders for the formats that are tractable without native libs:

- PNG: zlib inflate + full filter reconstruction (None/Sub/Up/Average/
  Paeth), 8-bit depth, color types gray / gray+alpha / RGB / RGBA,
  non-interlaced. Encoder writes filter-0 rows (valid, universally
  readable) for fixtures.
- BMP: 24-bit uncompressed BI_RGB (bottom-up, 4-byte row padding).
- WAV: stdlib ``wave`` module, 8/16/32-bit PCM → float32 in [-1, 1].

Parity targets: ``datavec-data-image/.../ImageRecordReader.java:33``
(image file → pixel NDArray) and
``datavec-data-audio/.../WavFileRecordReader.java:32`` (wav → amplitude
records). Production deployments swap these for a native codec inside
the same actor-pool stage; the container-visible formats above are
decoded for real so pipelines and tests exercise true pixel/sample
values end to end.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w) for grayscale or (h, w, c)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad magic)")
    pos = 8
    idat = bytearray()
    w = h = channels = None
    while pos + 8 <= len(data):
        ln, typ = struct.unpack(">I4s", data[pos:pos + 8])
        pos += 8
        chunk = data[pos:pos + ln]
        pos += ln + 4  # skip CRC
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", chunk)
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
            if interlace:
                raise NotImplementedError("interlaced PNG")
            if ctype not in _PNG_CHANNELS:
                raise NotImplementedError(f"PNG color type {ctype}")
            channels = _PNG_CHANNELS[ctype]
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    bpp = channels
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    i = 0
    for y in range(h):
        ftype = raw[i]
        i += 1
        line = np.frombuffer(raw, np.uint8, stride, i).astype(np.int32)
        i += stride
        if ftype == 0:
            rec = line
        elif ftype == 2:   # Up (vectorized)
            rec = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # left-dependent: sequential per pixel
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:        # Sub
                    rec[x] = (line[x] + a) & 0xFF
                elif ftype == 3:      # Average
                    rec[x] = (line[x] + (a + b) // 2) & 0xFF
                else:                 # Paeth
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                    rec[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    if channels == 1:
        return out.reshape(h, w)
    return out.reshape(h, w, channels)


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (h, w) or (h, w, c∈{1,2,3,4}) → PNG bytes (filter 0)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + typ + payload
                + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# ---------------------------------------------------------------------------

def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes → uint8 (h, w, 3) in RGB order."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP (bad magic)")
    pixel_off = struct.unpack("<I", data[10:14])[0]
    hdr_size = struct.unpack("<I", data[14:18])[0]
    if hdr_size < 40:
        raise NotImplementedError("BMP core header")
    w, h_signed = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    compression = struct.unpack("<I", data[30:34])[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, np.uint8, stride * h, pixel_off) \
        .reshape(h, stride)[:, :w * 3].reshape(h, w, 3)
    if h_signed > 0:       # bottom-up storage
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()   # BGR → RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB → 24-bit BMP bytes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_bmp wants (h, w, 3) RGB")
    stride = (w * 3 + 3) & ~3
    pad = stride - w * 3
    bgr = img[::-1, :, ::-1]         # bottom-up, RGB → BGR
    body = b"".join(bgr[y].tobytes() + b"\x00" * pad for y in range(h))
    pixel_off = 14 + 40
    file_size = pixel_off + len(body)
    hdr = (b"BM" + struct.pack("<IHHI", file_size, 0, 0, pixel_off)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                         2835, 2835, 0, 0))
    return hdr + body


def decode_image(data: bytes) -> np.ndarray:
    """Dispatch on magic bytes → uint8 pixel array."""
    if data[:8] == PNG_MAGIC:
        return decode_png(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    raise NotImplementedError(
        f"unrecognized image format (magic {data[:4]!r}); this container "
        "decodes PNG/BMP natively — other formats need a native codec")


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2) video — pure-text header + raw planes, no container codec
# ---------------------------------------------------------------------------

Y4M_MAGIC = b"YUV4MPEG2"


def decode_y4m(data: bytes) -> tuple[np.ndarray, int]:
    """YUV4MPEG2 bytes → (uint8 luma frames (n, h, w), fps numerator).

    Supports C420 (default) and C444 chroma; only the Y (luma) plane is
    returned — the common input to grayscale feature extraction.
    """
    if not data.startswith(Y4M_MAGIC):
        raise ValueError("not a Y4M stream (bad magic)")
    nl = data.index(b"\n")
    header = data[:nl].decode("ascii", "replace").split(" ")
    w = h = 0
    fps = 30
    chroma = "420"
    for tok in header[1:]:
        if tok.startswith("W"):
            w = int(tok[1:])
        elif tok.startswith("H"):
            h = int(tok[1:])
        elif tok.startswith("F"):
            fps = int(tok[1:].split(":")[0])
        elif tok.startswith("C"):
            chroma = tok[1:]
    if not w or not h:
        raise ValueError("Y4M missing W/H")
    if chroma.startswith("420"):
        frame_bytes = w * h + 2 * ((w // 2) * (h // 2))
    elif chroma.startswith("444"):
        frame_bytes = 3 * w * h
    else:
        raise NotImplementedError(f"Y4M chroma C{chroma}")
    pos = nl + 1
    frames = []
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError("Y4M frame marker missing")
        pos = fnl + 1
        y = np.frombuffer(data, np.uint8, w * h, pos).reshape(h, w)
        frames.append(y)
        pos += frame_bytes
    return (np.stack(frames) if frames
            else np.empty((0, h, w), np.uint8)), fps


def encode_y4m(frames: np.ndarray, fps: int = 30) -> bytes:
    """uint8 luma frames (n, h, w) → Y4M bytes (C420, gray chroma)."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    hdr = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420\n".encode()
    gray = np.full(((w // 2) * (h // 2)), 128, np.uint8).tobytes()
    body = b"".join(b"FRAME\n" + frames[i].tobytes() + gray + gray
                    for i in range(n))
    return hdr + body


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float32 samples in [-1, 1] of shape (n,) mono or
    (n, channels), sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        nch, sw, rate, nframes = (f.getnchannels(), f.getsampwidth(),
                                  f.getframerate(), f.getnframes())
        raw = f.readframes(nframes)
    if sw == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif sw == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"WAV sample width {sw}")
    if nch > 1:
        x = x.reshape(-1, nch)
    return x, rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float32 [-1, 1] mono samples → 16-bit PCM WAV bytes."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()
