"""Pure-stdlib media codecs (numpy + zlib + wave) — real decoders for
the multimodal stages in this container, where PIL/soundfile/av are not
installed.

Formats implemented from their public specifications:
  - PNG (RFC 2083 / W3C spec): 8-bit gray / gray+alpha / RGB / RGBA,
    non-interlaced, all five scanline filters.  Encoder writes filter-0
    scanlines (spec-conformant; decodable by any PNG reader).
  - BMP (BITMAPINFOHEADER, 24-bit uncompressed bottom-up).
  - WAV PCM via the stdlib ``wave`` module (16-bit).

These are deliberately small, deterministic implementations for the
decode/feature stages and their tests — not general-purpose codec
libraries (no interlacing, palettes, 16-bit depth, or compressed BMP;
unsupported inputs raise ValueError so callers can fall back).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
#: PNG color type -> channels (8-bit only; palette(3) unsupported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff(data: bytes) -> str | None:
    """Best-effort container detection by magic bytes."""
    if data[:8] == _PNG_MAGIC:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None


# --------------------------------------------------------------- PNG


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (height, width, channels) uint8 array."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    bit_depth = color_type = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8 or color_type not in _PNG_CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={bit_depth}, color={color_type})"
                )
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG")
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        f = filters[y]
        if f == 0:  # None
            line = cur
        elif f == 2:  # Up
            line = (cur + prev) & 0xFF
        elif f == 1:  # Sub — sequential in pixels, vectorized per channel
            line = cur.copy()
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif f == 3:  # Average
            line = cur.copy()
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            line = cur.copy()
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = line.astype(np.uint8)
    return out.reshape(height, width, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w[, c]) uint8 array -> PNG bytes (filter 0, one IDAT)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), arr.reshape(h, w * ch)], axis=1
    ).tobytes()
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# --------------------------------------------------------------- BMP


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (h, w, 3) uint8 (RGB)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack("<I", data[10:14])
    (hdr,) = struct.unpack("<I", data[14:18])
    if hdr < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (comp,) = struct.unpack("<I", data[30:34])
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={comp})")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    px = np.frombuffer(data, dtype=np.uint8, count=h * stride, offset=off)
    px = px.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        px = px[::-1]
    return px[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BMP bytes."""
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    body_b = body.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(body_b), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body_b), 2835, 2835, 0, 0)
    return header + info + body_b


# --------------------------------------------------------------- WAV


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, (n_samples, channels) int16 array)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        sr = f.getframerate()
        ch = f.getnchannels()
        if f.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        frames = f.readframes(f.getnframes())
    x = np.frombuffer(frames, dtype=np.int16).reshape(-1, ch)
    return sr, x


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n[, channels]) int16 -> WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(np.ascontiguousarray(samples, dtype=np.int16).tobytes())
    return buf.getvalue()
