"""Pure-stdlib media codecs (no PIL/opencv/ffmpeg in this container).

Real decoders for the formats that are tractable without native libs:

- PNG: zlib inflate + full filter reconstruction (None/Sub/Up/Average/
  Paeth), 8-bit depth, color types gray / gray+alpha / RGB / RGBA,
  non-interlaced. Encoder writes filter-0 rows (valid, universally
  readable) for fixtures.
- BMP: 24-bit uncompressed BI_RGB (bottom-up, 4-byte row padding).
- JPEG: T.81 baseline sequential (SOF0/1) AND progressive (SOF2,
  spectral selection + successive approximation), Huffman + IDCT, any
  chroma sampling, restart markers, multi-scan. Encoders write
  baseline 4:4:4 and a full progressive scan script (DC/AC first +
  refine) whose decode is bit-exact with the baseline encoding.
- GIF: 87a/89a LZW, global/local color tables, interlace; encoder is
  lossless for ≤256-color images (real LZW, exact palette).
- WAV: stdlib ``wave`` module, 8/16/32-bit PCM → float32 in [-1, 1].
- Y4M: raw YUV4MPEG2 frame runs (luma plane).
- AVI/MJPEG: RIFF container walk + per-frame baseline JPEG (parity:
  ``datavec-data-codec/.../CodecRecordReader.java:56`` reads avi via
  JCodec).
- MP4/ISO-BMFF: sample-table demux (stsd/stsz/stsc/stco/stts);
  motion-JPEG samples decode; AVC/HEVC/VP9 raise.
- Matroska/webm: full EBML demux (Segment/Info/Tracks/Clusters,
  SimpleBlock + Block with Xiph/fixed/EBML lacing); V_MJPEG and
  V_UNCOMPRESSED samples decode; VP8/VP9/AV1 raise.

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
    if data[:2] == b"\xff\xd8":
        return decode_jpeg(data)
    if data[:4] == b"GIF8":
        return decode_gif(data)
    raise NotImplementedError(
        f"unrecognized image format (magic {data[:4]!r}); this container "
        "decodes PNG/BMP/baseline-JPEG/GIF natively — other formats need "
        "a native codec")


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


# ---------------------------------------------------------------------------
# baseline JPEG (ITU-T T.81 / ISO 10918-1, public specification) —
# sequential DCT, Huffman entropy coding. Reference parity:
# ImageRecordReader decodes JPEG via native imageio
# (datavec-data/datavec-data-image); this is the pure-stdlib/numpy
# counterpart: SOF0 baseline, 8-bit, grayscale + YCbCr with arbitrary
# (h, v) sampling factors incl. 4:2:0, restart markers. Encoder writes
# baseline 4:4:4 (or single-component grayscale) with the Annex-K
# example tables.
# ---------------------------------------------------------------------------

JPEG_MAGIC = b"\xff\xd8"

# zigzag index i -> natural (row-major) position
_JPEG_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

_JPEG_QL = np.array([          # Annex K luminance quantization
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103,
    99], dtype=np.int64).reshape(8, 8)
_JPEG_QC = np.array([          # Annex K chrominance quantization
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int64).reshape(8, 8)

# Annex K typical Huffman tables: (BITS[1..16], HUFFVAL)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])


def _dct_basis() -> np.ndarray:
    """A[u, x] = 0.5 * C(u) * cos((2x+1) u pi / 16); pixels = A.T @ F @ A."""
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    a = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    a[0] /= np.sqrt(2)
    return a


_JPEG_A = _dct_basis()


class _HuffDecoder:
    """Canonical Huffman decode table (F.2.2.3 MINCODE/MAXCODE walk)."""

    def __init__(self, bits, vals):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1
        self.vals = list(vals)


class _BitReader:
    """MSB-first bit reader over entropy-coded bytes (FF00 already
    unstuffed, RST markers handled by the caller via segment splits)."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("JPEG bitstream exhausted")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.bits):
            raise ValueError("JPEG bitstream exhausted")
        chunk = self.bits[self.pos:self.pos + n]
        self.pos += n
        out = 0
        for b in chunk:
            out = (out << 1) | int(b)
        return out

    def decode(self, table: _HuffDecoder) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            if table.maxcode[ln] >= 0 and code <= table.maxcode[ln]:
                return table.vals[table.valptr[ln] + code
                                  - table.mincode[ln]]
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.12: map s received bits to the signed coefficient."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _jpeg_entropy_segments(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Unstuff FF00 and split on RSTn from ``pos`` until the next real
    marker; returns (segments, index of that marker's 0xFF)."""
    segments: list[bytes] = []
    cur = bytearray()
    j = pos
    n = len(data)
    while j < n:
        b = data[j]
        if b == 0xFF and j + 1 < n:
            nxt = data[j + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                j += 2
                continue
            if nxt == 0xFF:                      # fill byte
                j += 1
                continue
            if 0xD0 <= nxt <= 0xD7:              # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                j += 2
                continue
            break                                # real marker
        cur.append(b)
        j += 1
    segments.append(bytes(cur))
    return segments, j


def _ceil(a: int, b: int) -> int:
    return -(-a // b)


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG → uint8 (h, w) grayscale or (h, w, 3) RGB.

    Supports baseline sequential (SOF0/SOF1) AND progressive (SOF2,
    spectral selection + successive approximation per ITU-T T.81
    annexes F/G), 8-bit samples, 1 or 3 components with any (h, v)
    sampling (4:4:4 / 4:2:2 / 4:2:0), DRI/RSTn restart markers,
    multi-scan streams. Arithmetic coding and hierarchical (SOF9+)
    raise NotImplementedError."""
    if data[:2] != JPEG_MAGIC:
        raise ValueError("not a JPEG (bad SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    comps: list[dict] = []
    scans: list[dict] = []
    H = W = 0
    restart = 0
    i = 2
    while i < len(data) - 1:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker == 0xD9:                       # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
            i += 2
            continue
        seglen = int.from_bytes(data[i + 2:i + 4], "big")
        seg = data[i + 4:i + 2 + seglen]
        if marker == 0xDB:                       # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0xF
                j += 1
                if pq:
                    tbl = np.frombuffer(seg[j:j + 128], ">u2").astype(np.int64)
                    j += 128
                else:
                    tbl = np.frombuffer(seg[j:j + 64], np.uint8).astype(np.int64)
                    j += 64
                nat = np.zeros(64, np.int64)
                nat[_JPEG_ZZ] = tbl
                qt[tq] = nat
        elif marker in (0xC0, 0xC1, 0xC2):       # SOF0/1 (seq) / SOF2 (prog)
            H = int.from_bytes(seg[1:3], "big")
            W = int.from_bytes(seg[3:5], "big")
            n = seg[5]
            for c in range(n):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential "
                "(SOF0/SOF1) and progressive (SOF2) are supported")
        elif marker == 0xC4:                     # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0xF
                bits = list(seg[j + 1:j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17:j + 17 + nv])
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                j += 17 + nv
        elif marker == 0xDD:                     # DRI
            restart = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:                     # SOS
            ns = seg[0]
            sc = []
            for s in range(ns):
                cs, tt = seg[1 + 2 * s], seg[2 + 2 * s]
                ci = next(k for k, c in enumerate(comps) if c["id"] == cs)
                sc.append((ci, tt >> 4, tt & 0xF))
            Ss, Se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            segments, i = _jpeg_entropy_segments(data, i + 2 + seglen)
            scans.append({"comps": sc, "Ss": Ss, "Se": Se,
                          "Ah": ahal >> 4, "Al": ahal & 0xF,
                          "huff": dict(huff), "restart": restart,
                          "segments": segments})
            continue
        i += 2 + seglen
    if not scans or not comps:
        raise ValueError("JPEG: missing SOS/SOF")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = _ceil(W, 8 * hmax)
    mcuy = _ceil(H, 8 * vmax)
    for c in comps:
        c["bw"] = mcux * c["h"]                  # blocks across (padded)
        c["bh"] = mcuy * c["v"]
        c["bw_eff"] = _ceil(_ceil(W * c["h"], hmax), 8)
        c["bh_eff"] = _ceil(_ceil(H * c["v"], vmax), 8)
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int64)
    for scan in scans:
        _jpeg_decode_scan(scan, comps, mcux, mcuy)

    # dequantize, IDCT all blocks of each component at once, assemble
    planes = []
    for c in comps:
        deq = (c["coef"] * qt[c["tq"]][None, :]).astype(np.float64)
        pix = np.einsum("ux,nuv,vy->nxy", _JPEG_A, deq.reshape(-1, 8, 8),
                        _JPEG_A)
        pix = np.clip(np.round(pix + 128), 0, 255).astype(np.uint8)
        grid = pix.reshape(c["bh"], c["bw"], 8, 8) \
            .transpose(0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8)
        grid = np.repeat(np.repeat(grid, vmax // c["v"], axis=0),
                         hmax // c["h"], axis=1)
        planes.append(grid[:H, :W])
    if len(planes) == 1:
        return planes[0]
    y, cb, cr = (p.astype(np.float64) for p in planes[:3])
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0,
                   255).astype(np.uint8)


def _jpeg_decode_scan(scan: dict, comps: list[dict],
                      mcux: int, mcuy: int) -> None:
    """Decode one scan's entropy data into the components' coefficient
    arrays (natural-order positions, un-dequantized)."""
    sc = scan["comps"]
    Ss, Se, Ah, Al = scan["Ss"], scan["Se"], scan["Ah"], scan["Al"]
    huff = scan["huff"]
    interleaved = len(sc) > 1
    if interleaved:
        n_units = mcux * mcuy
    else:
        c0 = comps[sc[0][0]]
        n_units = c0["bw_eff"] * c0["bh_eff"]
    per_seg = scan["restart"] if scan["restart"] else n_units
    u = 0
    for seg_bytes in scan["segments"]:
        if u >= n_units:
            break
        rd = _BitReader(seg_bytes)
        pred = {ci: 0 for ci, _, _ in sc}
        eobrun = 0

        def dc_unit(coef, bi, tdc, ci):
            if Ah == 0:
                s = rd.decode(huff[(0, tdc)])
                diff = _extend(rd.read_bits(s), s) if s else 0
                pred[ci] += diff
                coef[bi, 0] = pred[ci] << Al
            elif rd.read_bit():
                coef[bi, 0] |= 1 << Al          # two's complement: exact
                                                # for negative DC too

        def seq_block(coef, bi, tdc, tac, ci):
            s = rd.decode(huff[(0, tdc)])
            diff = _extend(rd.read_bits(s), s) if s else 0
            pred[ci] += diff
            coef[bi, 0] = pred[ci]
            k = 1
            while k < 64:
                rs = rd.decode(huff[(1, tac)])
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    break                        # EOB
                k += r
                if k > 63:
                    raise ValueError("JPEG AC run overflow")
                coef[bi, _JPEG_ZZ[k]] = _extend(rd.read_bits(s), s)
                k += 1

        def ac_first(coef, bi, tac):
            nonlocal eobrun
            if eobrun > 0:
                eobrun -= 1
                return
            k = Ss
            while k <= Se:
                rs = rd.decode(huff[(1, tac)])
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r < 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += rd.read_bits(r)
                        return
                    k += 16
                    continue
                k += r
                if k > Se:
                    raise ValueError("JPEG AC run overflow")
                coef[bi, _JPEG_ZZ[k]] = _extend(rd.read_bits(s), s) << Al
                k += 1

        def ac_refine(coef, bi, tac):
            # T.81 G.2 / libjpeg decode_mcu_AC_refine structure: each
            # code's "advance" refines every already-nonzero coefficient
            # it passes with one correction bit
            nonlocal eobrun
            p1, m1 = 1 << Al, -(1 << Al)
            k = Ss
            if eobrun == 0:
                while k <= Se:
                    rs = rd.decode(huff[(1, tac)])
                    r, s = rs >> 4, rs & 0xF
                    newval = 0
                    if s == 0:
                        if r < 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += rd.read_bits(r)
                            break               # tail handled below
                        # ZRL: skip 16 zero-history coefficients
                    else:
                        if s != 1:
                            raise ValueError("JPEG AC refine: s != 1")
                        newval = p1 if rd.read_bit() else m1
                    while k <= Se:
                        z = _JPEG_ZZ[k]
                        if coef[bi, z] != 0:
                            if rd.read_bit():
                                coef[bi, z] += p1 if coef[bi, z] > 0 else m1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval and k <= Se:
                        coef[bi, _JPEG_ZZ[k]] = newval
                    k += 1
            if eobrun > 0:
                while k <= Se:
                    z = _JPEG_ZZ[k]
                    if coef[bi, z] != 0 and rd.read_bit():
                        coef[bi, z] += p1 if coef[bi, z] > 0 else m1
                    k += 1
                eobrun -= 1

        for _ in range(min(per_seg, n_units - u)):
            if interleaved:
                my, mx = divmod(u, mcux)
                for ci, tdc, tac in sc:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            bi = ((my * c["v"] + by) * c["bw"]
                                  + mx * c["h"] + bx)
                            if Se == 0:
                                dc_unit(c["coef"], bi, tdc, ci)
                            else:
                                seq_block(c["coef"], bi, tdc, tac, ci)
            else:
                ci, tdc, tac = sc[0]
                c = comps[ci]
                row, col = divmod(u, c["bw_eff"])
                bi = row * c["bw"] + col
                if Se == 0:
                    dc_unit(c["coef"], bi, tdc, ci)
                elif Ss == 0:
                    seq_block(c["coef"], bi, tdc, tac, ci)
                elif Ah == 0:
                    ac_first(c["coef"], bi, tac)
                else:
                    ac_refine(c["coef"], bi, tac)
            u += 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)            # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write(0x7F, 7 - ((self.n - 1) % 8) + 1)  # pad with 1s


def _huff_encode_table(bits, vals) -> dict[int, tuple[int, int]]:
    codes, code = {}, 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((_JPEG_QL * scale + 50) // 100, 1, 255)
    qc = np.clip((_JPEG_QC * scale + 50) // 100, 1, 255)
    return ql, qc


def _jpeg_plane_coefs(img: np.ndarray, quality: int):
    """Shared encoder front half: uint8 image → per-component quantized
    DCT coefficients in ZIGZAG order ((nblocks, 64) int64, 4:4:4, one
    block per MCU). Returns (coefs_zz, gray, ql, qc, h, w, bw, bh)."""
    img = np.asarray(img, np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql, qc = _quality_tables(quality)
    if gray:
        planes = [img.astype(np.float64)]
        qts = [ql]
    else:
        r, g, b = (img[:, :, k].astype(np.float64) for k in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        planes = [y, cb, cr]
        qts = [ql, qc, qc]
    bw, bh = -(-w // 8), -(-h // 8)
    coefs = []
    for p, q in zip(planes, qts):
        pad = np.pad(p, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
        blocks = pad.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) \
            .reshape(-1, 8, 8) - 128.0
        f = np.einsum("ux,nxy,vy->nuv", _JPEG_A, blocks, _JPEG_A)
        qz = np.round(f / q).astype(np.int64)
        coefs.append(qz.reshape(-1, 64)[:, _JPEG_ZZ])
    return coefs, gray, ql, qc, h, w, bw, bh


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → baseline JPEG bytes
    (4:4:4, Annex-K tables scaled by ``quality``, no subsampling)."""
    coefs, gray, ql, qc, h, w, bw, bh = _jpeg_plane_coefs(img, quality)
    dcl = _huff_encode_table(*_DC_L)
    acl = _huff_encode_table(*_AC_L)
    dcc = _huff_encode_table(*_DC_C)
    acc_t = _huff_encode_table(*_AC_C)
    wtr = _BitWriter()
    pred = [0] * len(coefs)
    for n in range(bh * bw):
        for ci in range(len(coefs)):
            dct, act = (dcl, acl) if ci == 0 else (dcc, acc_t)
            zz = coefs[ci][n]                    # already zigzag order
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            s = int(diff).bit_length() if diff else 0
            code, ln = dct[s]
            wtr.write(code, ln)
            if s:
                wtr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
            run = 0
            last_nz = np.flatnonzero(zz[1:])
            last = last_nz[-1] + 1 if len(last_nz) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = act[0xF0]
                    wtr.write(code, ln)
                    run -= 16
                s = abs(v).bit_length()
                code, ln = act[(run << 4) | s]
                wtr.write(code, ln)
                wtr.write(v if v > 0 else v + (1 << s) - 1, s)
                run = 0
            if last < 63:
                code, ln = act[0x00]
                wtr.write(code, ln)
    wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") \
            + body

    out = bytearray(JPEG_MAGIC)
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(ql.ravel()[_JPEG_ZZ].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([1])
                   + bytes(qc.ravel()[_JPEG_ZZ].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)

    def dht(tc, th, bits, vals):
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, *_DC_L) + dht(1, 0, *_AC_L)
    if not gray:
        out += dht(0, 1, *_DC_C) + dht(1, 1, *_AC_C)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# AVI container (Microsoft RIFF, public specification) carrying MJPEG —
# each video frame is a complete baseline JPEG, so the pure-Python JPEG
# codec above decodes the stream end to end. Reference parity:
# CodecRecordReader.java:56 (datavec-data-codec) reads avi/mjpeg via
# JCodec; this is the stdlib/numpy counterpart.
# ---------------------------------------------------------------------------

AVI_MAGIC = b"RIFF"


def _riff_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) walking a RIFF chunk run."""
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        ln = int.from_bytes(data[pos + 4:pos + 8], "little")
        yield fourcc, pos + 8, ln
        pos += 8 + ln + (ln & 1)          # chunks are word-aligned


def decode_avi(data: bytes) -> tuple[np.ndarray, int]:
    """AVI/MJPEG bytes → (uint8 luma frames (n, h, w), fps).

    Parses the RIFF tree (hdrl → strh for the frame rate, movi for the
    frame run) and decodes every ``..dc``/``..db`` video chunk with
    :func:`decode_jpeg`. RGB frames are reduced to BT.601 luma so the
    return shape matches :func:`decode_y4m`.
    """
    if data[:4] != AVI_MAGIC or data[8:12] != b"AVI ":
        raise ValueError("not an AVI file (bad RIFF/AVI magic)")
    fps = 30
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int):
        nonlocal fps
        for fourcc, body, ln in _riff_chunks(data, pos, end):
            if fourcc == b"LIST":
                ltype = data[body:body + 4]
                if ltype in (b"hdrl", b"movi", b"strl"):
                    walk(body + 4, body + ln)
            elif fourcc == b"strh" and data[body:body + 4] == b"vids":
                scale = int.from_bytes(data[body + 20:body + 24], "little")
                rate = int.from_bytes(data[body + 24:body + 28], "little")
                if scale and rate:
                    fps = max(1, round(rate / scale))
            elif fourcc[2:] in (b"dc", b"db"):
                payload = data[body:body + ln]
                if payload[:2] == JPEG_MAGIC:
                    img = decode_jpeg(payload)
                else:
                    raise NotImplementedError(
                        f"AVI stream chunk is not MJPEG "
                        f"(magic {payload[:4]!r}); only MJPG-compressed "
                        "AVI decodes without a native codec")
                if img.ndim == 3:
                    img = (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1]
                           + 0.114 * img[:, :, 2]).astype(np.uint8)
                frames.append(img)

    walk(12, len(data))
    if not frames:
        raise ValueError("AVI contains no video frames")
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise NotImplementedError("AVI with varying frame sizes")
    return np.stack(frames), fps


def encode_avi_mjpeg(frames: np.ndarray, fps: int = 30,
                     quality: int = 90) -> bytes:
    """uint8 frames (n, h, w) luma or (n, h, w, 3) RGB → AVI/MJPEG
    bytes (one baseline JPEG per ``00dc`` chunk, idx1 index)."""
    frames = np.asarray(frames, np.uint8)
    n = frames.shape[0]
    h, w = frames.shape[1], frames.shape[2]
    jpegs = [encode_jpeg(frames[i], quality=quality) for i in range(n)]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + len(body).to_bytes(4, "little") + body \
            + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    usec = max(1, round(1_000_000 / fps))
    maxbuf = max(len(j) for j in jpegs)
    avih = struct.pack("<14I", usec, maxbuf * fps, 0, 0x10, n, 0, 1,
                       maxbuf, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0,
                                            1, fps, 0, n, maxbuf, 10000, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_chunks, idx, off = [], [], 4
    for j in jpegs:
        movi_chunks.append(chunk(b"00dc", j))
        idx.append(b"00dc" + struct.pack("<III", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) & 1)
    movi = lst(b"movi", b"".join(movi_chunks))
    idx1 = chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _luma_frame(img: np.ndarray) -> np.ndarray:
    """Normalize a decoded frame to a 2-D uint8 luma plane (BT.601
    weights for RGB input) — shared by the native decoders and any
    external-decoder output."""
    img = np.asarray(img)
    if img.ndim == 3:
        img = (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1]
               + 0.114 * img[:, :, 2])
    return img.astype(np.uint8)


def decode_video(data: bytes, external=None) -> tuple[np.ndarray, int]:
    """Dispatch on magic bytes → (uint8 luma frames (n, h, w), fps).

    Y4M, AVI/MJPEG, MP4/MJPEG and Matroska/webm (MJPEG or uncompressed
    samples) decode for real; compressed bitstream codecs (AVC/VP8/
    VP9/AV1) inside mp4/webm need a native decoder and raise — UNLESS
    ``external`` is given: a user-supplied
    ``decode(codec_id: str, sample: bytes) -> ndarray`` callable
    (e.g. an ffmpeg/PyAV wrapper in a real deployment) that the
    MP4/Matroska demuxers feed one compressed sample at a time;
    its return may be (h, w) luma or (h, w, 3) RGB, normalized here.
    Reference parity: CodecRecordReader.java:56 delegates the same
    boundary to JCodec."""
    if data[:9] == Y4M_MAGIC:
        return decode_y4m(data)
    if data[:4] == AVI_MAGIC and data[8:12] == b"AVI ":
        return decode_avi(data)
    if data[4:8] == b"ftyp":
        return decode_mp4_mjpeg(data, external=external)
    if data[:4] == MKV_MAGIC:
        return decode_mkv(data, external=external)
    raise NotImplementedError(
        f"unrecognized video container (magic {data[:4]!r}); this "
        "container decodes Y4M, AVI/MJPEG, MP4/MJPEG and Matroska/webm "
        "natively — AVC/VP8/VP9/AV1 bitstreams need a native decoder")


# ---------------------------------------------------------------------------
# GIF (GIF87a/89a, public specification) — LZW-compressed indexed
# color. Reference parity: ImageRecordReader.java:33 accepts .gif via
# native imageio; this is the pure-Python counterpart (first frame).
# ---------------------------------------------------------------------------

GIF_MAGIC = b"GIF8"


def _gif_lzw_decode(min_code: int, data: bytes, npix: int) -> np.ndarray:
    """GIF-variant LZW → uint8 index array of length ``npix``."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = bits = pos = 0
    while len(out) < npix:
        while bits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        bits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
            if prev is not None:
                table.append(prev + entry[:1])
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW bad code")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return np.frombuffer(bytes(out[:npix]), np.uint8)


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → uint8 (h, w, 3) RGB of the FIRST frame, composed
    onto the logical screen (background color where the frame doesn't
    cover). Handles global/local color tables and interlacing."""
    if data[:4] != GIF_MAGIC or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF (bad magic)")
    sw = int.from_bytes(data[6:8], "little")
    sh = int.from_bytes(data[8:10], "little")
    packed, bg = data[10], data[11]
    pos = 13
    gct = None
    if packed & 0x80:
        ncol = 2 << (packed & 7)
        gct = np.frombuffer(data, np.uint8, ncol * 3, pos).reshape(-1, 3)
        pos += ncol * 3
    while pos < len(data):
        b = data[pos]
        if b == 0x21:                       # extension: skip sub-blocks
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:                     # image descriptor
            left = int.from_bytes(data[pos + 1:pos + 3], "little")
            top = int.from_bytes(data[pos + 3:pos + 5], "little")
            fw = int.from_bytes(data[pos + 5:pos + 7], "little")
            fh = int.from_bytes(data[pos + 7:pos + 9], "little")
            ipacked = data[pos + 9]
            pos += 10
            ct = gct
            if ipacked & 0x80:
                ncol = 2 << (ipacked & 7)
                ct = np.frombuffer(data, np.uint8, ncol * 3,
                                   pos).reshape(-1, 3)
                pos += ncol * 3
            if ct is None:
                raise ValueError("GIF image has no color table")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos]:
                ln = data[pos]
                lzw += data[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _gif_lzw_decode(min_code, bytes(lzw), fw * fh)
            if ipacked & 0x40:              # interlaced: 4-pass rows
                rows = np.concatenate([np.arange(0, fh, 8),
                                       np.arange(4, fh, 8),
                                       np.arange(2, fh, 4),
                                       np.arange(1, fh, 2)])
                deint = np.empty((fh, fw), np.uint8)
                deint[rows] = idx.reshape(fh, fw)
                idx = deint.ravel()
            frame = ct[np.minimum(idx, len(ct) - 1)].reshape(fh, fw, 3)
            canvas = np.tile(ct[min(bg, len(ct) - 1)], (sh, sw, 1))
            canvas[top:top + fh, left:left + fw] = frame[
                :max(0, min(fh, sh - top)), :max(0, min(fw, sw - left))]
            return canvas.astype(np.uint8)
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"GIF bad block id {b:#x}")
    raise ValueError("GIF contains no image frame")


def encode_gif(img: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB with ≤256 distinct colors → GIF87a bytes
    (exact palette, real LZW — lossless round trip)."""
    img = np.asarray(img, np.uint8)
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    pal, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(f"GIF encoder needs ≤256 colors, got {len(pal)}")
    depth = max(1, (len(pal) - 1).bit_length())
    ncol = 1 << depth
    min_code = max(2, depth)
    clear, end = 1 << min_code, (1 << min_code) + 1

    # real LZW: longest-match against a growing dict, reset at 4096
    out_codes = [clear]
    table = {bytes([i]): i for i in range(clear)}
    nxt, width_seq = end + 1, []
    cur = b""
    for px in idx.astype(np.uint8).tobytes():
        cand = cur + bytes([px])
        if cand in table:
            cur = cand
            continue
        out_codes.append(table[cur])
        table[cand] = nxt
        nxt += 1
        cur = bytes([px])
        if nxt > 4095:
            out_codes.append(clear)
            table = {bytes([i]): i for i in range(clear)}
            nxt = end + 1
    if cur:
        out_codes.append(table[cur])
    out_codes.append(end)

    # pack codes LSB-first, tracking the DECODER's table length: the
    # first data code after a clear adds no decoder entry (prev=None),
    # every later one adds exactly one — width bumps must mirror that
    buf = bytearray()
    acc = bits = 0
    width = min_code + 1
    size = end + 1                   # decoder table size after each code
    first = True
    for code in out_codes:
        acc |= code << bits
        bits += width
        while bits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
        if code == clear:
            width, size, first = min_code + 1, end + 1, True
        elif code != end:
            if first:
                first = False
            else:
                size += 1
                if size == (1 << width) and width < 12:
                    width += 1
    if bits:
        buf.append(acc & 0xFF)

    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0])
    out += pal.tobytes() + b"\x00" * ((ncol - len(pal)) * 3)
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes([min_code])
    for i in range(0, len(buf), 255):
        blk = buf[i:i + 255]
        out += bytes([len(blk)]) + blk
    out += b"\x00\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive JPEG encoder (T.81 annex G) — used to produce real SOF2
# fixtures for the progressive decode path: spectral selection +
# successive approximation (DC first/refine, AC first + two refine
# levels). Decoding encode_jpeg_progressive(img) is bit-exact with
# decoding encode_jpeg(img) at the same quality (identical quantized
# coefficients, just a different scan order).
# ---------------------------------------------------------------------------

# single shared code space (valid canonical Huffman, Kraft sum 0.5):
# every RS symbol available so EOBn run codes exist
_DC_FLAT = ([0, 0, 0, 0, 16] + [0] * 11, list(range(16)))
_AC_FLAT = ([0] * 8 + [255, 1] + [0] * 6, list(range(256)))


class _ProgAcState:
    """EOB-run accumulator shared across blocks of one AC scan."""

    def __init__(self, wtr, act):
        self.wtr, self.act = wtr, act
        self.eobrun = 0
        self.pend: list[int] = []        # correction bits of EOB blocks

    def flush(self):
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            code, ln = self.act[r << 4]
            self.wtr.write(code, ln)
            if r:
                self.wtr.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pend:
            self.wtr.write(b, 1)
        self.pend = []

    def add_eob(self, bits):
        self.eobrun += 1
        self.pend.extend(bits)
        if self.eobrun == 0x7FFF:        # EOBn caps at r=14
            self.flush()


def _enc_ac_first(wtr, act, blocks_zz, Ss, Se, Al):
    st = _ProgAcState(wtr, act)
    for blk in blocks_zz:
        vz = blk[Ss:Se + 1]
        v = np.sign(vz) * (np.abs(vz) >> Al)
        nz = np.flatnonzero(v)
        if len(nz) == 0:
            st.add_eob([])
            continue
        st.flush()
        run = 0
        for idx in range(int(nz[-1]) + 1):
            val = int(v[idx])
            if val == 0:
                run += 1
                continue
            while run > 15:
                code, ln = act[0xF0]
                wtr.write(code, ln)
                run -= 16
            s = abs(val).bit_length()
            code, ln = act[(run << 4) | s]
            wtr.write(code, ln)
            wtr.write(val if val > 0 else val + (1 << s) - 1, s)
            run = 0
        if nz[-1] < len(v) - 1:
            st.add_eob([])
    st.flush()


def _enc_ac_refine(wtr, act, blocks_zz, Ss, Se, Al):
    """Mirror of the decoder's refine state machine: each emitted code
    is followed by the correction bits of the already-nonzero
    coefficients its advance passes; EOB blocks queue their bits until
    the EOBn code is emitted."""
    st = _ProgAcState(wtr, act)
    for blk in blocks_zz:
        vz = blk[Ss:Se + 1]
        av = np.abs(vz) >> Al            # 0 = zero so far, 1 = newly
        n = len(av)                      # nonzero, >1 = history
        newpos = np.flatnonzero(av == 1)
        if len(newpos) == 0:
            st.add_eob([int(x) & 1 for x in av[av != 0]])
            continue
        st.flush()
        k = 0
        ni = 0
        while ni < len(newpos):
            p = int(newpos[ni])
            z = int(np.count_nonzero(av[k:p] == 0))
            if z > 15:
                # ZRL: the decoder consumes exactly 16 zero-history
                # positions, refining history coefficients in between
                cnt = 0
                q = k
                bits = []
                while True:
                    if av[q] == 0:
                        cnt += 1
                        if cnt == 16:
                            break
                    elif av[q] > 1:
                        bits.append(int(av[q]) & 1)
                    q += 1
                code, ln = act[0xF0]
                wtr.write(code, ln)
                for b in bits:
                    wtr.write(b, 1)
                k = q + 1
                continue
            bits = [int(av[q]) & 1 for q in range(k, p) if av[q] > 1]
            code, ln = act[(z << 4) | 1]
            wtr.write(code, ln)
            wtr.write(1 if vz[p] > 0 else 0, 1)
            for b in bits:
                wtr.write(b, 1)
            k = p + 1
            ni += 1
        if k < n:
            # positions remain after the last new coefficient: the
            # decoder will read one more code here, so this block must
            # join an EOB run (its tail correction bits ride along)
            st.add_eob([int(av[q]) & 1 for q in range(k, n) if av[q] > 1])
    st.flush()


def encode_jpeg_progressive(img: np.ndarray, quality: int = 85) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → PROGRESSIVE (SOF2)
    JPEG bytes: DC first (Al=1) + DC refine, per-component AC spectral
    bands at Al=2 refined to 1 then 0 — exercises every progressive
    decode path (EOBn runs, ZRL-in-refine, successive approximation)."""
    coefs, gray, ql, qc, h, w, bw, bh = _jpeg_plane_coefs(img, quality)
    ncomp = len(coefs)
    dct = _huff_encode_table(*_DC_FLAT)
    act = _huff_encode_table(*_AC_FLAT)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") \
            + body

    out = bytearray(JPEG_MAGIC)
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(ql.ravel()[_JPEG_ZZ].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([1])
                   + bytes(qc.ravel()[_JPEG_ZZ].astype(np.uint8)))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC2, sof)                        # SOF2: progressive
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_FLAT[0])
               + bytes(_DC_FLAT[1]))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_FLAT[0])
               + bytes(_AC_FLAT[1]))

    def sos(comp_ids, Ss, Se, Ah, Al, body: bytes) -> bytes:
        hdr = bytes([len(comp_ids)])
        for cid in comp_ids:
            hdr += bytes([cid, 0x00])            # DC table 0 / AC table 0
        hdr += bytes([Ss, Se, (Ah << 4) | Al])
        return seg(0xDA, hdr) + body

    # scan 1: DC of all components, interleaved, Al=1
    wtr = _BitWriter()
    pred = [0] * ncomp
    for nblk in range(bh * bw):
        for ci in range(ncomp):
            dc = int(coefs[ci][nblk, 0]) >> 1    # arithmetic shift (A.4)
            diff = dc - pred[ci]
            pred[ci] = dc
            s = abs(diff).bit_length()
            code, ln = dct[s]
            wtr.write(code, ln)
            if s:
                wtr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    wtr.flush()
    out += sos(list(range(1, ncomp + 1)), 0, 0, 0, 1, bytes(wtr.out))

    # AC scans per component: two spectral bands at Al=2, then refine
    # each band 2→1→0
    bands = [(1, 5), (6, 63)]
    for ci in range(ncomp):
        for (bs, be) in bands:
            wtr = _BitWriter()
            _enc_ac_first(wtr, act, coefs[ci], bs, be, 2)
            wtr.flush()
            out += sos([ci + 1], bs, be, 0, 2, bytes(wtr.out))
    # DC refine (interleaved, bit 0)
    wtr = _BitWriter()
    for nblk in range(bh * bw):
        for ci in range(ncomp):
            wtr.write(int(coefs[ci][nblk, 0]) & 1, 1)
    wtr.flush()
    out += sos(list(range(1, ncomp + 1)), 0, 0, 1, 0, bytes(wtr.out))
    # AC refines
    for ci in range(ncomp):
        for (bs, be) in bands:
            for ah, al in ((2, 1), (1, 0)):
                wtr = _BitWriter()
                _enc_ac_refine(wtr, act, coefs[ci], bs, be, al)
                wtr.flush()
                out += sos([ci + 1], bs, be, ah, al, bytes(wtr.out))
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# MP4 / ISO base media file format (ISO/IEC 14496-12, public spec) —
# container DEMUX. Sample tables (stsd/stsz/stsc/stco/stts) are plain
# box parsing; samples decode when the codec is motion-JPEG ('jpeg' /
# 'mjpa' / 'MJPG' sample entries — each sample is a complete baseline
# JPEG). AVC/HEVC/VP9 samples still need a native codec and raise.
# Reference parity: CodecRecordReader.java:56 reads .mp4 via JCodec.
# ---------------------------------------------------------------------------

def _mp4_boxes(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) walking a box run."""
    while pos + 8 <= end:
        size = int.from_bytes(data[pos:pos + 4], "big")
        fourcc = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:                            # 64-bit largesize
            size = int.from_bytes(data[pos + 8:pos + 16], "big")
            body = pos + 16
        elif size == 0:                          # to end of file
            size = end - pos
        yield fourcc, body, pos + size
        pos += size


def _mp4_find(data: bytes, pos: int, end: int, path: list[bytes]):
    """Return (body_start, body_end) of the first box at a nested path."""
    for fourcc, body, bend in _mp4_boxes(data, pos, end):
        if fourcc == path[0]:
            if len(path) == 1:
                return body, bend
            return _mp4_find(data, body, bend, path[1:])
    return None


def decode_mp4_mjpeg(data: bytes, external=None) -> tuple[np.ndarray, int]:
    """MP4 bytes → (uint8 luma frames (n, h, w), fps) when the video
    track's samples are motion-JPEG. Walks moov→trak→mdia→minf→stbl,
    reads stsz/stsc/stco(+co64) sample tables, decodes each sample with
    :func:`decode_jpeg`. Non-MJPEG codecs raise NotImplementedError
    unless ``external(codec_id, sample) -> ndarray`` is supplied — the
    demux stays pure-stdlib, the bitstream decode plugs in."""
    if data[4:8] != b"ftyp":
        raise ValueError("not an MP4 (no ftyp)")
    n = len(data)
    for fourcc, body, bend in _mp4_boxes(data, 0, n):
        if fourcc != b"moov":
            continue
        for tk, tbody, tbend in _mp4_boxes(data, body, bend):
            if tk != b"trak":
                continue
            hdlr = _mp4_find(data, tbody, tbend, [b"mdia", b"hdlr"])
            if hdlr is None or data[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
                continue
            stbl = _mp4_find(data, tbody, tbend,
                             [b"mdia", b"minf", b"stbl"])
            mdhd = _mp4_find(data, tbody, tbend, [b"mdia", b"mdhd"])
            if stbl is None:
                continue
            sb, se = stbl
            boxes = {fc: (b, e) for fc, b, e in _mp4_boxes(data, sb, se)}
            # codec check: first stsd sample entry fourcc
            db, _ = boxes[b"stsd"]
            codec = data[db + 12:db + 16]
            if codec in (b"jpeg", b"mjpa", b"mjpb", b"MJPG"):
                dec = decode_jpeg
            elif external is not None:
                cid = codec.decode("ascii", "replace")
                dec = (lambda p, _c=cid: external(_c, p))
            else:
                raise NotImplementedError(
                    f"MP4 video codec {codec!r}: only motion-JPEG "
                    "samples decode without a native codec (pass "
                    "external=decode(codec_id, sample) to plug one in)")
            # sample sizes
            zb, _ = boxes[b"stsz"]
            fixed = int.from_bytes(data[zb + 4:zb + 8], "big")
            count = int.from_bytes(data[zb + 8:zb + 12], "big")
            sizes = ([fixed] * count if fixed else
                     [int.from_bytes(data[zb + 12 + 4 * i:zb + 16 + 4 * i],
                                     "big") for i in range(count)])
            # chunk offsets
            if b"stco" in boxes:
                cb, _ = boxes[b"stco"]
                nch = int.from_bytes(data[cb + 4:cb + 8], "big")
                offs = [int.from_bytes(data[cb + 8 + 4 * i:cb + 12 + 4 * i],
                                       "big") for i in range(nch)]
            else:
                cb, _ = boxes[b"co64"]
                nch = int.from_bytes(data[cb + 4:cb + 8], "big")
                offs = [int.from_bytes(data[cb + 8 + 8 * i:cb + 16 + 8 * i],
                                       "big") for i in range(nch)]
            # sample-to-chunk: (first_chunk, samples_per_chunk) runs
            scb, _ = boxes[b"stsc"]
            nrun = int.from_bytes(data[scb + 4:scb + 8], "big")
            runs = [(int.from_bytes(data[scb + 8 + 12 * i:
                                         scb + 12 + 12 * i], "big"),
                     int.from_bytes(data[scb + 12 + 12 * i:
                                         scb + 16 + 12 * i], "big"))
                    for i in range(nrun)]
            # fps from mdhd timescale + stts deltas
            fps = 30
            if mdhd is not None and b"stts" in boxes:
                mb, _ = mdhd
                ver = data[mb]
                timescale = int.from_bytes(
                    data[mb + (20 if ver else 12):
                         mb + (24 if ver else 16)], "big")
                tb, _ = boxes[b"stts"]
                delta = int.from_bytes(data[tb + 12:tb + 16], "big")
                if delta:
                    fps = max(1, round(timescale / delta))
            # walk chunks → sample byte ranges
            frames = []
            si = 0
            for ci in range(len(offs)):
                spc = next((s for fc, s in reversed(runs)
                            if fc <= ci + 1), runs[0][1])
                pos = offs[ci]
                for _ in range(spc):
                    if si >= len(sizes):
                        break
                    payload = data[pos:pos + sizes[si]]
                    frames.append(_luma_frame(dec(payload)))
                    pos += sizes[si]
                    si += 1
            if not frames:
                raise ValueError("MP4 video track has no samples")
            return np.stack(frames), fps
    raise ValueError("MP4 contains no video track")


def encode_mp4_mjpeg(frames: np.ndarray, fps: int = 30,
                     quality: int = 90) -> bytes:
    """uint8 frames (n, h, w) or (n, h, w, 3) → minimal valid MP4 with
    one motion-JPEG ('jpeg') video track (mdat first, moov after so
    chunk offsets are known; one chunk per sample)."""
    frames = np.asarray(frames, np.uint8)
    nfr = frames.shape[0]
    h, w = frames.shape[1], frames.shape[2]
    jpegs = [encode_jpeg(frames[i], quality=quality) for i in range(nfr)]

    def box(fourcc: bytes, body: bytes) -> bytes:
        return (8 + len(body)).to_bytes(4, "big") + fourcc + body

    def full(fourcc: bytes, body: bytes, ver: int = 0) -> bytes:
        return box(fourcc, bytes([ver, 0, 0, 0]) + body)

    ftyp = box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isomiso2")
    mdat_off = len(ftyp) + 8                     # first sample offset
    offs = []
    pos = mdat_off
    for j in jpegs:
        offs.append(pos)
        pos += len(j)
    mdat = box(b"mdat", b"".join(jpegs))

    timescale = 1000
    dur = nfr * (timescale // fps)
    u32, u16 = ((lambda v: int(v).to_bytes(4, "big")),
                (lambda v: int(v).to_bytes(2, "big")))
    mvhd = full(b"mvhd", u32(0) * 2 + u32(timescale) + u32(dur)
                + u32(0x00010000) + u16(0x0100) + u16(0) + u32(0) * 2
                + u32(0x00010000) + u32(0) * 2 + u32(0) + u32(0x00010000)
                + u32(0) * 2 + u32(0) + u32(0x40000000) + u32(0) * 6
                + u32(2))
    tkhd = full(b"tkhd", u32(0) * 2 + u32(1) + u32(0) + u32(dur)
                + u32(0) * 2 + u16(0) * 4
                + u32(0x00010000) + u32(0) * 2 + u32(0) + u32(0x00010000)
                + u32(0) * 2 + u32(0) + u32(0x40000000)
                + u32(w << 16) + u32(h << 16), ver=0)
    # tkhd flags must be 0x7 (enabled): redo with flags
    tkhd = box(b"tkhd", bytes([0, 0, 0, 7]) + tkhd[12:])
    mdhd = full(b"mdhd", u32(0) * 2 + u32(timescale) + u32(dur)
                + u16(0x55C4) + u16(0))
    hdlr = full(b"hdlr", u32(0) + b"vide" + u32(0) * 3 + b"VideoHandler\x00")
    vmhd = box(b"vmhd", bytes([0, 0, 0, 1]) + u16(0) * 4)
    dref = full(b"dref", u32(1) + full(b"url ", b"", ver=0)[:0]
                + box(b"url ", bytes([0, 0, 0, 1])))
    dinf = box(b"dinf", dref)
    sample_entry = (u32(0) + u16(0) + u16(1)      # reserved + dref idx
                    + u16(0) * 2 + u32(0) * 3 + u16(w) + u16(h)
                    + u32(0x00480000) + u32(0x00480000) + u32(0)
                    + u16(1) + b"\x00" * 32 + u16(24) + u16(0xFFFF))
    stsd = full(b"stsd", u32(1) + box(b"jpeg", sample_entry))
    stts = full(b"stts", u32(1) + u32(nfr) + u32(timescale // fps))
    stsc = full(b"stsc", u32(1) + u32(1) + u32(1) + u32(1))
    stsz = full(b"stsz", u32(0) + u32(nfr)
                + b"".join(u32(len(j)) for j in jpegs))
    stco = full(b"stco", u32(len(offs)) + b"".join(u32(o) for o in offs))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", vmhd + dinf + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# ---------------------------------------------------------------------------
# Matroska / WebM (EBML, public specifications: RFC 8794 + matroska.org)
# Reference parity: CodecRecordReader.java:56 reads .mkv/.webm via
# JCodec's native decoders; here the CONTAINER (EBML element tree,
# Cluster/SimpleBlock framing incl. all three lacing modes) is parsed
# for real, and tracks whose samples are motion-JPEG or uncompressed
# raster decode to pixels. VP8/VP9/AV1 sample payloads need a native
# codec and raise.
# ---------------------------------------------------------------------------

MKV_MAGIC = b"\x1aE\xdf\xa3"

# EBML element IDs (marker bit kept, as they appear on the wire)
_MKV_SEGMENT = 0x18538067
_MKV_INFO = 0x1549A966
_MKV_TIMESCALE = 0x2AD7B1
_MKV_TRACKS = 0x1654AE6B
_MKV_TRACKENTRY = 0xAE
_MKV_TRACKNUM = 0xD7
_MKV_TRACKTYPE = 0x83
_MKV_CODECID = 0x86
_MKV_VIDEO = 0xE0
_MKV_PIXELW = 0xB0
_MKV_PIXELH = 0xBA
_MKV_CLUSTER = 0x1F43B675
_MKV_CLUSTERTS = 0xE7
_MKV_SIMPLEBLOCK = 0xA3
_MKV_BLOCKGROUP = 0xA0
_MKV_BLOCK = 0xA1


def _ebml_vint(data: bytes, pos: int, keep_marker: bool = False):
    """One EBML variable-length integer at ``pos`` → (value, next_pos).

    ``keep_marker=True`` keeps the length-marker bit (element IDs are
    compared with it on); otherwise it is stripped (sizes, track
    numbers). A stripped value with all bits set means 'unknown size'
    and returns ``None`` for the value."""
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML vint (>8 bytes)")
    length = 9 - first.bit_length()          # leading zeros + 1
    val = first if keep_marker else first & (0xFF >> length)
    for i in range(1, length):
        val = (val << 8) | data[pos + i]
    if not keep_marker and val == (1 << (7 * length)) - 1:
        return None, pos + length            # unknown size
    return val, pos + length


def _ebml_children(data: bytes, pos: int, end: int):
    """Yield ``(element_id, body_start, body_end)`` over an EBML run.
    Unknown-size elements (live-muxed webm Segments/Clusters) extend to
    the parent's end."""
    while pos < end:
        eid, p = _ebml_vint(data, pos, keep_marker=True)
        size, body = _ebml_vint(data, p)
        bend = end if size is None else body + size
        yield eid, body, min(bend, end)
        pos = bend


def _ebml_uint_at(data: bytes, body: int, end: int) -> int:
    return int.from_bytes(data[body:end], "big")


def _mkv_block_frames(data: bytes, body: int, end: int):
    """Matroska (Simple)Block body → (track_number, rel_ts, [payloads]).
    Implements all three lacing modes (Xiph / fixed-size / EBML)."""
    track, p = _ebml_vint(data, body)
    rel_ts = int.from_bytes(data[p:p + 2], "big", signed=True)
    flags = data[p + 2]
    p += 3
    lacing = (flags >> 1) & 0x3
    if lacing == 0:                            # no lacing: one frame
        return track, rel_ts, [data[p:end]]
    nframes = data[p] + 1
    p += 1
    sizes: list[int] = []
    if lacing == 1:                            # Xiph: 255-run sizes
        for _ in range(nframes - 1):
            s = 0
            while data[p] == 255:
                s += 255
                p += 1
            s += data[p]
            p += 1
            sizes.append(s)
    elif lacing == 2:                          # fixed-size
        per = (end - p) // nframes
        sizes = [per] * (nframes - 1)
    else:                                      # EBML: first abs, then deltas
        s, p = _ebml_vint(data, p)
        sizes.append(s)
        for _ in range(nframes - 2):
            raw_first = data[p]
            length = 9 - raw_first.bit_length()
            d, p = _ebml_vint(data, p)
            d -= (1 << (7 * length - 1)) - 1   # signed vint bias
            s += d
            sizes.append(s)
    frames = []
    for s in sizes:
        frames.append(data[p:p + s])
        p += s
    frames.append(data[p:end])                 # last frame: remainder
    return track, rel_ts, frames


def decode_mkv(data: bytes, external=None) -> tuple[np.ndarray, int]:
    """Matroska/webm bytes → (uint8 luma frames (n, h, w), fps).

    Real EBML demux: Segment → Info (TimestampScale) / Tracks (codec,
    dimensions) / Clusters (SimpleBlock + BlockGroup/Block, all lacing
    modes). Sample payloads decode when the track codec is
    ``V_MJPEG`` (per-frame baseline/progressive JPEG) or
    ``V_UNCOMPRESSED`` (raw luma or RGB24 raster); VP8/VP9/AV1 raise
    NotImplementedError — same boundary as AVC in MP4 — unless
    ``external(codec_id, sample) -> ndarray`` is supplied (the EBML
    demux feeds it one block payload at a time)."""
    if data[:4] != MKV_MAGIC:
        raise ValueError("not an EBML/Matroska stream")
    seg = None
    for eid, body, bend in _ebml_children(data, 0, len(data)):
        if eid == _MKV_SEGMENT:
            seg = (body, bend)
            break
    if seg is None:
        raise ValueError("Matroska stream has no Segment")
    timescale = 1_000_000                       # ns per tick (default: 1 ms)
    vtrack = None                               # (tracknum, codec, w, h)
    stamped: list[tuple[int, bytes]] = []       # (abs ticks, payload)

    def _track_entry(tb: int, te: int):
        num = ttype = w = h = None
        codec = ""
        for i2, b2, e2 in _ebml_children(data, tb, te):
            if i2 == _MKV_TRACKNUM:
                num = _ebml_uint_at(data, b2, e2)
            elif i2 == _MKV_TRACKTYPE:
                ttype = _ebml_uint_at(data, b2, e2)
            elif i2 == _MKV_CODECID:
                codec = data[b2:e2].rstrip(b"\x00").decode("ascii", "replace")
            elif i2 == _MKV_VIDEO:
                for i3, b3, e3 in _ebml_children(data, b2, e2):
                    if i3 == _MKV_PIXELW:
                        w = _ebml_uint_at(data, b3, e3)
                    elif i3 == _MKV_PIXELH:
                        h = _ebml_uint_at(data, b3, e3)
        return num, ttype, codec, w, h

    for eid, body, bend in _ebml_children(data, *seg):
        if eid == _MKV_INFO:
            for i2, b2, e2 in _ebml_children(data, body, bend):
                if i2 == _MKV_TIMESCALE:
                    timescale = _ebml_uint_at(data, b2, e2)
        elif eid == _MKV_TRACKS:
            for i2, b2, e2 in _ebml_children(data, body, bend):
                if i2 == _MKV_TRACKENTRY:
                    num, ttype, codec, w, h = _track_entry(b2, e2)
                    if ttype == 1 and vtrack is None:
                        vtrack = (num, codec, w, h)
        elif eid == _MKV_CLUSTER:
            if vtrack is None:
                raise ValueError("Matroska Cluster before video Tracks")
            cl_ts = 0
            for i2, b2, e2 in _ebml_children(data, body, bend):
                if i2 == _MKV_CLUSTERTS:
                    cl_ts = _ebml_uint_at(data, b2, e2)
                elif i2 == _MKV_SIMPLEBLOCK:
                    tn, rel, payloads = _mkv_block_frames(data, b2, e2)
                    if tn == vtrack[0]:
                        for k, pl in enumerate(payloads):
                            stamped.append((cl_ts + rel + k, pl))
                elif i2 == _MKV_BLOCKGROUP:
                    for i3, b3, e3 in _ebml_children(data, b2, e2):
                        if i3 == _MKV_BLOCK:
                            tn, rel, payloads = _mkv_block_frames(
                                data, b3, e3)
                            if tn == vtrack[0]:
                                for k, pl in enumerate(payloads):
                                    stamped.append((cl_ts + rel + k, pl))
    if vtrack is None:
        raise ValueError("Matroska stream has no video track")
    if not stamped:
        raise ValueError("Matroska video track has no frames")
    _, codec, w, h = vtrack
    stamped.sort(key=lambda t: t[0])
    frames = []
    for _, payload in stamped:
        if codec == "V_MJPEG":
            img = decode_jpeg(payload)
            if img.ndim == 3:
                img = (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1]
                       + 0.114 * img[:, :, 2]).astype(np.uint8)
        elif codec == "V_UNCOMPRESSED":
            raw = np.frombuffer(payload, np.uint8)
            if w and h and len(raw) == w * h:
                img = raw.reshape(h, w)
            elif w and h and len(raw) == w * h * 3:
                rgb = raw.reshape(h, w, 3).astype(np.float64)
                img = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
                       + 0.114 * rgb[:, :, 2]).astype(np.uint8)
            else:
                raise ValueError(
                    f"V_UNCOMPRESSED payload of {len(raw)} bytes does not "
                    f"match {w}x{h} luma or RGB24 raster")
        elif external is not None:
            img = _luma_frame(external(codec, payload))
        else:
            raise NotImplementedError(
                f"Matroska video codec {codec!r}: only V_MJPEG and "
                "V_UNCOMPRESSED samples decode without a native codec "
                "(pass external=decode(codec_id, sample) to plug one in)")
        frames.append(img)
    # fps from tick deltas (ticks are timescale ns each)
    ts = np.array([t for t, _ in stamped], np.int64)
    fps = 30
    if len(ts) > 1:
        dt = np.median(np.diff(ts)) * timescale   # ns per frame
        if dt > 0:
            fps = max(1, round(1e9 / float(dt)))
    return np.stack(frames), fps


def _ebml_id_bytes(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _ebml_size_bytes(n: int) -> bytes:
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            return ((1 << (7 * length)) | n).to_bytes(length, "big")
    raise ValueError("EBML size too large")


def _ebml_el(eid: int, body: bytes) -> bytes:
    return _ebml_id_bytes(eid) + _ebml_size_bytes(len(body)) + body


def _ebml_uint_el(eid: int, v: int) -> bytes:
    return _ebml_el(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def encode_mkv_mjpeg(frames: np.ndarray, fps: int = 30,
                     quality: int = 90) -> bytes:
    """uint8 frames (n, h, w) or (n, h, w, 3) → minimal valid Matroska
    file with one V_MJPEG video track (1 ms timestamp ticks, one
    keyframe SimpleBlock per frame, a new Cluster every 1000 frames so
    the int16 relative timestamp never overflows)."""
    frames = np.asarray(frames, np.uint8)
    nfr, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    header = _ebml_el(0x1A45DFA3, b"".join([
        _ebml_uint_el(0x4286, 1),               # EBMLVersion
        _ebml_uint_el(0x42F7, 1),               # EBMLReadVersion
        _ebml_uint_el(0x42F2, 4),               # EBMLMaxIDLength
        _ebml_uint_el(0x42F3, 8),               # EBMLMaxSizeLength
        _ebml_el(0x4282, b"matroska"),          # DocType
        _ebml_uint_el(0x4287, 2),               # DocTypeVersion
        _ebml_uint_el(0x4285, 2)]))             # DocTypeReadVersion
    info = _ebml_el(_MKV_INFO, b"".join([
        _ebml_uint_el(_MKV_TIMESCALE, 1_000_000),
        _ebml_el(0x4D80, b"datavec_ray"),       # MuxingApp
        _ebml_el(0x5741, b"datavec_ray")]))     # WritingApp
    tracks = _ebml_el(_MKV_TRACKS, _ebml_el(_MKV_TRACKENTRY, b"".join([
        _ebml_uint_el(_MKV_TRACKNUM, 1),
        _ebml_uint_el(0x73C5, 1),               # TrackUID
        _ebml_uint_el(_MKV_TRACKTYPE, 1),       # video
        _ebml_el(_MKV_CODECID, b"V_MJPEG"),
        _ebml_el(_MKV_VIDEO, _ebml_uint_el(_MKV_PIXELW, w)
                 + _ebml_uint_el(_MKV_PIXELH, h))])))
    clusters = []
    per_cluster = 1000
    for c0 in range(0, nfr, per_cluster):
        base_ms = c0 * 1000 // fps
        blocks = [_ebml_uint_el(_MKV_CLUSTERTS, base_ms)]
        for i in range(c0, min(c0 + per_cluster, nfr)):
            rel = i * 1000 // fps - base_ms
            payload = encode_jpeg(frames[i], quality=quality)
            body = (b"\x81"                     # track 1 (1-byte vint)
                    + rel.to_bytes(2, "big", signed=True)
                    + b"\x80"                   # keyframe, no lacing
                    + payload)
            blocks.append(_ebml_el(_MKV_SIMPLEBLOCK, body))
        clusters.append(_ebml_el(_MKV_CLUSTER, b"".join(blocks)))
    segment = _ebml_el(_MKV_SEGMENT, info + tracks + b"".join(clusters))
    return header + segment
