"""Pure-stdlib media codecs (numpy + zlib + wave) — real decoders for
the multimodal stages in this container, where PIL/soundfile/av are not
installed.

Formats implemented from their public specifications:
  - PNG (RFC 2083 / W3C spec): 8-bit gray / gray+alpha / RGB / RGBA /
    palette (PLTE), non-interlaced, all five scanline filters.  Encoder
    writes filter-0 scanlines (spec-conformant; decodable by any PNG
    reader).
  - BMP (BITMAPINFOHEADER, 24-bit uncompressed bottom-up).
  - WAV PCM via the stdlib ``wave`` module (16-bit).
  - JPEG (ITU-T T.81): 8-bit grayscale and YCbCr with 1x1/2x1/1x2/2x2
    sampling factors, restart markers, DC prediction + AC run-length
    Huffman decoding, vectorized dequant + IDCT — baseline sequential
    (SOF0/1) AND progressive (SOF2, Annex G: spectral selection +
    successive approximation, EOB runs, AC refinement correction
    bits).  Encoder writes baseline 4:4:4 or 4:2:0 with the Annex K
    quantization/Huffman tables (quality-scaled, libjpeg formula), or
    a progressive scan script (``progressive=True``) whose decode is
    bit-identical to the sequential file (pinned by tests).
    Arithmetic coding, 12-bit, and lossless modes raise ValueError.

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
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return "mp4"
    return None


# --------------------------------------------------------------- PNG


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (height, width, channels) uint8 array."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    bit_depth = color_type = None
    palette = None
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
            if bit_depth != 8 or (
                color_type != 3 and color_type not in _PNG_CHANNELS
            ):
                raise ValueError(
                    f"unsupported PNG (depth={bit_depth}, color={color_type})"
                )
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG")
    if color_type == 3 and palette is None:
        raise ValueError("palette PNG without PLTE")
    ch = 1 if color_type == 3 else _PNG_CHANNELS[color_type]
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
    px = out.reshape(height, width, ch)
    if color_type == 3:
        px = palette[px[:, :, 0]]  # index -> RGB
    return px


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


# --------------------------------------------------------------- JPEG

#: zigzag scan position -> natural (row-major) coefficient index
_ZIGZAG = np.array(
    [
         0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix D: FDCT F = D f D^T, IDCT
    f = D^T F D — equivalent to T.81's scaled-cosine definition."""
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    d = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2 / 8)
    d[0] *= np.sqrt(0.5)
    return d.astype(np.float64)


class _BitReader:
    """MSB-first bit reader over an already-unstuffed byte segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG bitstream underrun")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map s received bits to a signed coefficient."""
    if s == 0 or v >= (1 << (s - 1)):
        return v
    return v - (1 << s) + 1


def _build_huff(counts: bytes, symbols: bytes) -> dict:
    """DHT (BITS, HUFFVAL) -> {(code_length, code): symbol} canonical map."""
    table = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[i]
            i += 1
            code += 1
        code <<= 1
    return table


def _parse_dqt(body: bytes, qt: dict) -> None:
    """DQT segment -> zigzag-ordered int32 tables keyed by id."""
    i = 0
    while i < len(body):
        pq, tq = body[i] >> 4, body[i] & 15
        i += 1
        if pq == 0:
            qt[tq] = np.frombuffer(body[i : i + 64], dtype=np.uint8).astype(
                np.int32
            )
            i += 64
        else:
            qt[tq] = np.frombuffer(body[i : i + 128], dtype=">u2").astype(
                np.int32
            )
            i += 128


def _parse_dht(body: bytes, huff_dc: dict, huff_ac: dict) -> None:
    i = 0
    while i < len(body):
        tc, th = body[i] >> 4, body[i] & 15
        i += 1
        counts = body[i : i + 16]
        i += 16
        nsym = sum(counts)
        table = _build_huff(counts, body[i : i + nsym])
        i += nsym
        (huff_dc if tc == 0 else huff_ac)[th] = table


def _unstuff_entropy(data: bytes, p: int) -> tuple[list[bytes], int]:
    """Entropy-coded bytes starting at ``p``: unstuff 0xFF00, split at
    RSTn; returns (segments, position of the terminating marker)."""
    segments: list[bytes] = []
    cur = bytearray()
    while p < len(data):
        b = data[p]
        if b == 0xFF:
            m = data[p + 1] if p + 1 < len(data) else 0xD9
            if m == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= m <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            break  # EOI or next marker
        cur.append(b)
        p += 1
    segments.append(bytes(cur))
    return segments, p


def _jpeg_reconstruct(
    comps: list,
    blocks: dict,
    qt: dict,
    width: int,
    height: int,
    hmax: int,
    vmax: int,
) -> np.ndarray:
    """Zigzag coefficient grids -> pixels: dequantize, de-zigzag,
    batched IDCT, chroma upsample, YCbCr->RGB (shared by the baseline
    and progressive decoders)."""
    dct_m = _dct_matrix()
    planes = []
    for c in comps:
        bz = blocks[c["id"]].astype(np.float64) * qt[c["tq"]][None, None, :]
        bh, bw = bz.shape[:2]
        nat = np.zeros_like(bz)
        nat[:, :, _ZIGZAG] = bz
        spatial = (
            np.einsum("ij,bjk,kl->bil", dct_m.T, nat.reshape(-1, 8, 8), dct_m)
            + 128.0
        )
        plane = (
            spatial.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        plane = np.repeat(plane, vmax // c["v"], axis=0)
        plane = np.repeat(plane, hmax // c["h"], axis=1)
        planes.append(plane[:height, :width])

    if len(planes) == 1:
        return (
            np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
        )
    if len(planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(planes)}")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (height, width, channels) uint8 array
    (channels = 1 grayscale, 3 RGB via BT.601 YCbCr conversion)."""
    if data[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan_comps = None
    scan_start = None
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = data[pos + 1]
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + length]
        seg_end = pos + 2 + length
        if marker == 0xDB:  # DQT — tables stored in zigzag order
            _parse_dqt(body, qt)
        elif marker in (0xC0, 0xC1):  # SOF0/1 — baseline/extended sequential
            prec, height, width, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for ci in range(nc):
                cid, hv, tq_id = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq_id}
                )
            frame = (width, height, comps)
        elif marker == 0xC2:  # SOF2 — progressive DCT (T.81 Annex G)
            return _decode_jpeg_progressive(data)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("non-DCT JPEG (lossless/arithmetic) unsupported")
        elif marker == 0xC4:  # DHT
            _parse_dht(body, huff_dc, huff_ac)
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — single interleaved baseline scan
            ns = body[0]
            scan_comps = [
                (body[1 + 2 * si], body[2 + 2 * si] >> 4, body[2 + 2 * si] & 15)
                for si in range(ns)
            ]
            scan_start = seg_end
            break
        pos = seg_end  # APPn / COM / others skipped
    if frame is None or scan_comps is None:
        raise ValueError("truncated JPEG (no SOF/SOS)")
    width, height, comps = frame
    if len(scan_comps) != len(comps):
        raise ValueError("multi-scan (non-interleaved) JPEG unsupported")
    scan_tables = {cs: (td, ta) for cs, td, ta in scan_comps}

    # Entropy-coded data: unstuff 0xFF00, split at restart markers.
    segments, _ = _unstuff_entropy(data, scan_start)

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if c["h"] not in (1, 2, 4) or c["v"] not in (1, 2, 4):
            raise ValueError("unsupported JPEG sampling factors")
        if hmax % c["h"] or vmax % c["v"]:
            raise ValueError("non-integer JPEG chroma upsampling ratio")
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))

    blocks = {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in comps
    }
    seg_iter = iter(segments)
    reader = _BitReader(next(seg_iter))
    pred = {c["id"]: 0 for c in comps}
    ri = restart_interval or (mcux * mcuy)
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if mcu_index and mcu_index % ri == 0:
                reader = _BitReader(next(seg_iter))
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                td, ta = scan_tables[c["id"]]
                dct, act = huff_dc[td], huff_ac[ta]
                grid = blocks[c["id"]]
                for v in range(c["v"]):
                    for h in range(c["h"]):
                        coefs = grid[my * c["v"] + v, mx * c["h"] + h]
                        s = _huff_decode(reader, dct)
                        pred[c["id"]] += _extend(reader.receive(s), s)
                        coefs[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, act)
                            run, size = rs >> 4, rs & 15
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC coefficient overflow")
                            coefs[k] = _extend(reader.receive(size), size)
                            k += 1
            mcu_index += 1

    # Dequantize (tables are zigzag-ordered), de-zigzag, batched IDCT.
    return _jpeg_reconstruct(comps, blocks, qt, width, height, hmax, vmax)


# --------------------------------------------- progressive JPEG (Annex G)
#
# Progressive mode transmits the SAME quantized coefficients as
# sequential mode, reordered: spectral selection (each scan carries one
# zigzag band Ss..Se of one component, or the DC band of several) and
# successive approximation (first scan sends coefficients at reduced
# precision >> Al, later scans refine one bit at a time, Ah -> Al).
# Block storage stays zigzag-ordered, so scans index coefficients
# directly; reconstruction is the shared _jpeg_reconstruct.


def _ac_first_block(
    reader: _BitReader, act: dict, coefs: np.ndarray,
    ss: int, se: int, al: int, eobrun: int,
) -> int:
    """Decode one block of an AC FIRST scan (Ah == 0, T.81 G.2 /
    libjpeg decode_mcu_AC_first); returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(reader, act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: 16 zero coefficients
                k += 16
                continue
            eobrun = (1 << r) - 1  # EOBn: run of (1<<r)+bits blocks,
            if r:                  # current block counts as one
                eobrun += reader.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("progressive JPEG AC coefficient overflow")
        coefs[k] = _extend(reader.receive(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(
    reader: _BitReader, act: dict, coefs: np.ndarray,
    ss: int, se: int, al: int, eobrun: int,
) -> int:
    """Decode one block of an AC REFINEMENT scan (Ah == Al+1, T.81
    G.2.2 / libjpeg decode_mcu_AC_refine): newly nonzero coefficients
    arrive as (run, 1) symbols + a sign bit; every already-nonzero
    coefficient passed on the way appends one correction bit."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(reader, act)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s:
                if s != 1:
                    raise ValueError("invalid progressive AC refinement size")
                newval = p1 if reader.read_bit() else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.receive(r)
                break
            # advance over r zero-HISTORY coefficients, emitting a
            # correction bit for every nonzero-history one passed
            while k <= se:
                c = int(coefs[k])
                if c != 0:
                    if reader.read_bit() and (c & p1) == 0:
                        coefs[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                coefs[k] = newval
            k += 1
    if eobrun > 0:
        # inside an EOB run: the band's remaining nonzero-history
        # coefficients still receive correction bits
        while k <= se:
            c = int(coefs[k])
            if c != 0:
                if reader.read_bit() and (c & p1) == 0:
                    coefs[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_jpeg_progressive(data: bytes) -> np.ndarray:
    """Progressive (SOF2) JPEG bytes -> pixel array; same output
    contract as decode_jpeg (a correct progressive stream reconstructs
    the identical quantized coefficients, so pixels are bit-identical
    to the sequential encoding of the same image — pinned by tests)."""
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    blocks: dict[int, np.ndarray] = {}
    hmax = vmax = mcux = mcuy = 0
    pos = 2
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # parameterless
            pos += 2
            continue
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + length]
        seg_end = pos + 2 + length
        if marker == 0xDB:
            _parse_dqt(body, qt)
        elif marker == 0xC4:
            _parse_dht(body, huff_dc, huff_ac)
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xC2:
            prec, height, width, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for ci in range(nc):
                cid, hv, tq_id = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq_id}
                )
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            for c in comps:
                if c["h"] not in (1, 2, 4) or c["v"] not in (1, 2, 4):
                    raise ValueError("unsupported JPEG sampling factors")
                if hmax % c["h"] or vmax % c["v"]:
                    raise ValueError("non-integer JPEG chroma upsampling ratio")
            mcux = -(-width // (8 * hmax))
            mcuy = -(-height // (8 * vmax))
            blocks = {
                c["id"]: np.zeros(
                    (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32
                )
                for c in comps
            }
            frame = (width, height, comps)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("mixed/unsupported JPEG frame type")
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("progressive JPEG scan before SOF2")
            ns = body[0]
            scan_comps = [
                (body[1 + 2 * si], body[2 + 2 * si] >> 4, body[2 + 2 * si] & 15)
                for si in range(ns)
            ]
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 15
            segments, pos = _unstuff_entropy(data, seg_end)
            _progressive_scan(
                scan_comps, ss, se, ah, al, frame, blocks,
                huff_dc, huff_ac, segments, restart_interval,
                hmax, vmax, mcux, mcuy,
            )
            continue
        pos = seg_end  # APPn / COM / others skipped
    if frame is None:
        raise ValueError("truncated progressive JPEG (no SOF2)")
    width, height, comps = frame
    return _jpeg_reconstruct(comps, blocks, qt, width, height, hmax, vmax)


def _progressive_scan(
    scan_comps, ss, se, ah, al, frame, blocks,
    huff_dc, huff_ac, segments, restart_interval, hmax, vmax, mcux, mcuy,
) -> None:
    """Apply one progressive scan's coefficient updates in place."""
    width, height, comps = frame
    comp_by_id = {c["id"]: c for c in comps}
    seg_iter = iter(segments)
    reader = _BitReader(next(seg_iter))
    pred = {cid: 0 for cid, _, _ in scan_comps}
    eobrun = 0

    def restart():
        nonlocal reader, eobrun
        reader = _BitReader(next(seg_iter))
        eobrun = 0
        for cid in pred:
            pred[cid] = 0

    if ss == 0:  # DC scan — interleaved (Ns > 1) or single-component
        if se != 0:
            raise ValueError("progressive DC scan must have Se == 0")
        if len(scan_comps) > 1:
            ri = restart_interval or (mcux * mcuy)
            n = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if n and n % ri == 0:
                        restart()
                    for cid, td, _ta in scan_comps:
                        c = comp_by_id[cid]
                        grid = blocks[cid]
                        for v in range(c["v"]):
                            for h in range(c["h"]):
                                coefs = grid[my * c["v"] + v, mx * c["h"] + h]
                                if ah == 0:
                                    s = _huff_decode(reader, huff_dc[td])
                                    pred[cid] += _extend(reader.receive(s), s)
                                    coefs[0] = pred[cid] << al
                                elif reader.read_bit():
                                    coefs[0] = int(coefs[0]) | (1 << al)
                    n += 1
            return
    elif len(scan_comps) != 1:
        raise ValueError("progressive AC scan must be single-component")

    # single-component scan: raster over the COMPONENT's own block
    # grid (ceil of its sample dims / 8), not the MCU-padded grid
    cid, td, ta = scan_comps[0]
    c = comp_by_id[cid]
    comp_cols = -(-(width * c["h"]) // hmax)
    comp_rows = -(-(height * c["v"]) // vmax)
    wb = -(-comp_cols // 8)
    hb = -(-comp_rows // 8)
    grid = blocks[cid]
    ri = restart_interval or (wb * hb)
    n = 0
    for by in range(hb):
        for bx in range(wb):
            if n and n % ri == 0:
                restart()
            coefs = grid[by, bx]
            if ss == 0:
                if ah == 0:
                    s = _huff_decode(reader, huff_dc[td])
                    pred[cid] += _extend(reader.receive(s), s)
                    coefs[0] = pred[cid] << al
                elif reader.read_bit():
                    coefs[0] = int(coefs[0]) | (1 << al)
            elif ah == 0:
                eobrun = _ac_first_block(
                    reader, huff_ac[ta], coefs, ss, se, al, eobrun
                )
            else:
                eobrun = _ac_refine_block(
                    reader, huff_ac[ta], coefs, ss, se, al, eobrun
                )
            n += 1


# Annex K (T.81) tables, natural (row-major) order for the quant tables.
_Q_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
_Q_CHR = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)
_DC_LUM_BITS = bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0])
_DC_LUM_VALS = bytes(range(12))
_DC_CHR_BITS = bytes([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0])
_DC_CHR_VALS = bytes(range(12))
_AC_LUM_BITS = bytes([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D])
_AC_LUM_VALS = bytes(
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]
)
_AC_CHR_BITS = bytes([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77])
_AC_CHR_VALS = bytes(
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]
)


def _encode_huff(counts: bytes, symbols: bytes) -> dict:
    """(BITS, HUFFVAL) -> {symbol: (code, length)} canonical map."""
    out = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[i]] = (code, length)
            i += 1
            code += 1
        code <<= 1
    return out


class _BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing (T.81 B.1.1.5)."""

    __slots__ = ("buf", "acc", "n")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        """Pad the final partial byte with 1 bits (spec convention)."""
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _fdct_quant(plane: np.ndarray, q_nat: np.ndarray) -> np.ndarray:
    """(bh*8, bw*8) float plane -> (bh, bw, 64) int32 zigzag quantized
    coefficients (level-shifted, batched orthonormal FDCT)."""
    dct_m = _dct_matrix()
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (
        plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        - 128.0
    )
    coefs = np.einsum("ij,bjk,kl->bil", dct_m, blocks, dct_m.T)
    quant = np.round(coefs.reshape(-1, 64) / q_nat[None, :].astype(np.float64))
    return quant.astype(np.int32)[:, _ZIGZAG].reshape(bh, bw, 64)


def _pad_to_block(plane: np.ndarray, bx: int, by: int) -> np.ndarray:
    """Edge-replicate ``plane`` up to multiples of (by, bx)."""
    h, w = plane.shape
    ph = (-h) % by
    pw = (-w) % bx
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _emit_block(
    bw: _BitWriter, coefs: np.ndarray, pred: int, dc_map: dict, ac_map: dict
) -> int:
    """Huffman-encode one zigzag coefficient vector; returns new DC pred."""
    dc = int(coefs[0])
    diff = dc - pred
    s = _category(diff)
    code, length = dc_map[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(coefs)[0])) if np.any(coefs[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(coefs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_map[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_map[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_map[0x00]  # EOB
        bw.write(code, length)
    return dc


def _pt_ac(v: int, al: int) -> int:
    """AC point transform (T.81 G.1.2.2): MAGNITUDE shift — unlike the
    DC arithmetic shift, |v| >> al with the sign re-applied."""
    m = (v if v >= 0 else -v) >> al
    return m if v >= 0 else -m


def _flush_eobrun(bw: _BitWriter, ac_map: dict, eob_state: list) -> None:
    """Emit a pending EOBn symbol (+ its buffered refinement
    correction bits) — progressive AC scans only."""
    n, bits = eob_state
    if n > 0:
        nb = n.bit_length() - 1
        code, ln = ac_map[nb << 4]
        bw.write(code, ln)
        if nb:
            bw.write(n - (1 << nb), nb)
        for bit in bits:
            bw.write(bit, 1)
        eob_state[0] = 0
        eob_state[1] = []


def _emit_ac_first(
    bw: _BitWriter, ac_map: dict, coefs: np.ndarray,
    ss: int, se: int, al: int, eob_state: list,
) -> None:
    """One block of a progressive AC FIRST scan (Ah == 0)."""
    r = 0
    for k in range(ss, se + 1):
        v = _pt_ac(int(coefs[k]), al)
        if v == 0:
            r += 1
            continue
        _flush_eobrun(bw, ac_map, eob_state)
        while r > 15:
            code, ln = ac_map[0xF0]  # ZRL
            bw.write(code, ln)
            r -= 16
        s = _category(v)
        code, ln = ac_map[(r << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        r = 0
    if r > 0:
        eob_state[0] += 1
        if eob_state[0] == 0x7FFF:
            _flush_eobrun(bw, ac_map, eob_state)


def _emit_ac_refine(
    bw: _BitWriter, ac_map: dict, coefs: np.ndarray,
    ss: int, se: int, al: int, eob_state: list,
) -> None:
    """One block of a progressive AC REFINEMENT scan (Ah == Al+1) —
    the libjpeg encode_mcu_AC_refine shape: newly nonzero coefficients
    (|v| >> al == 1) get (run, 1) symbols + a sign bit; already-nonzero
    ones buffer one correction bit each, emitted after the next symbol
    (or with the EOB run they fall into)."""
    band = [int(coefs[k]) for k in range(ss, se + 1)]
    mags = [(v if v >= 0 else -v) >> al for v in band]
    eobpos = -1
    for i, m in enumerate(mags):
        if m == 1:
            eobpos = i
    r = 0
    br: list[int] = []
    for i, v in enumerate(band):
        m = mags[i]
        if m == 0:
            r += 1
            continue
        while r > 15 and i <= eobpos:
            _flush_eobrun(bw, ac_map, eob_state)
            code, ln = ac_map[0xF0]
            bw.write(code, ln)
            r -= 16
            for bit in br:
                bw.write(bit, 1)
            br = []
        if m > 1:  # already nonzero at the previous precision
            br.append(m & 1)
            continue
        _flush_eobrun(bw, ac_map, eob_state)
        code, ln = ac_map[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if v > 0 else 0, 1)
        for bit in br:
            bw.write(bit, 1)
        br = []
        r = 0
    if r > 0 or br:
        eob_state[0] += 1
        eob_state[1].extend(br)
        if eob_state[0] == 0x7FFF or len(eob_state[1]) > 900:
            _flush_eobrun(bw, ac_map, eob_state)


#: custom AC Huffman table for progressive scans: Annex K's AC tables
#: lack the EOBn (n >= 1) run symbols Annex G needs, so emit a uniform
#: 9-bit canonical table over every symbol a progressive AC scan can
#: produce (EOB0..EOB14 + ZRL + (run, size) for size 1..10) — 176
#: codes, none all-ones, valid canonical DHT.
_AC_PROG_VALS = bytes(
    [(r << 4) for r in range(16)]
    + [(r << 4) | s for s in range(1, 11) for r in range(16)]
)
_AC_PROG_BITS = bytes([0] * 8 + [len(_AC_PROG_VALS)] + [0] * 7)


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    *,
    subsample: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """(h, w[, c]) uint8 (gray or RGB) -> JPEG bytes.

    ``subsample=True`` writes 4:2:0 (2x2 luma blocks per MCU, chroma
    mean-pooled); default is 4:4:4.  ``restart_interval`` > 0 writes a
    DRI segment and RSTn markers every that many MCUs (blocks, in
    progressive non-interleaved scans).  ``progressive=True`` writes
    SOF2 with spectral selection (DC scan, AC bands 1-5 and 6-63 per
    component) and one successive-approximation level (Al=1 first
    scans + Ah=1 refinement scans) — the same quantized coefficients
    reordered, so decode is bit-identical to the sequential file."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg wants 1 (gray) or 3 (RGB) channels")
    # libjpeg quality scaling of the Annex K tables
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q_lum = np.clip((_Q_LUM * scale + 50) // 100, 1, 255).astype(np.int32)
    q_chr = np.clip((_Q_CHR * scale + 50) // 100, 1, 255).astype(np.int32)

    f = arr.astype(np.float64)
    if nc == 1:
        planes = [f[:, :, 0]]
        samp = [(1, 1)]
        qids = [0]
    else:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            # 2x2 mean-pool chroma (pad to even dims first)
            cb = _pad_to_block(cb, 2, 2)
            cr = _pad_to_block(cr, 2, 2)
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qids = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coef_grids = []
    for plane, (sh, sv), qid in zip(planes, samp, qids):
        padded = _pad_to_block(plane, mcux * sh * 8, mcuy * sv * 8)
        coef_grids.append(_fdct_quant(padded, q_lum if qid == 0 else q_chr))

    if progressive:
        return _encode_jpeg_progressive(
            h, w, nc, samp, q_lum, q_chr, coef_grids,
            restart_interval, hmax, vmax, mcux, mcuy,
        )

    dc_maps = [_encode_huff(_DC_LUM_BITS, _DC_LUM_VALS)]
    ac_maps = [_encode_huff(_AC_LUM_BITS, _AC_LUM_VALS)]
    if nc == 3:
        dc_maps.append(_encode_huff(_DC_CHR_BITS, _DC_CHR_VALS))
        ac_maps.append(_encode_huff(_AC_CHR_BITS, _AC_CHR_VALS))
    tsel = [0] + [1] * (nc - 1)

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    seg(0xDB, bytes([0x00]) + bytes(q_lum[_ZIGZAG].astype(np.uint8)))
    if nc == 3:
        seg(0xDB, bytes([0x01]) + bytes(q_chr[_ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], tsel[ci]])
    seg(0xC0, sof)
    seg(0xC4, bytes([0x00]) + _DC_LUM_BITS + _DC_LUM_VALS)
    seg(0xC4, bytes([0x10]) + _AC_LUM_BITS + _AC_LUM_VALS)
    if nc == 3:
        seg(0xC4, bytes([0x01]) + _DC_CHR_BITS + _DC_CHR_VALS)
        seg(0xC4, bytes([0x11]) + _AC_CHR_BITS + _AC_CHR_VALS)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, (tsel[ci] << 4) | tsel[ci]])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    bw = _BitWriter()
    preds = [0] * nc
    rst = 0
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                bw.flush()
                out.extend(bw.buf)
                bw = _BitWriter()
                out.extend(bytes([0xFF, 0xD0 + (rst % 8)]))
                rst += 1
                preds = [0] * nc
            for ci in range(nc):
                sh, sv = samp[ci]
                for v in range(sv):
                    for hh in range(sh):
                        coefs = coef_grids[ci][my * sv + v, mx * sh + hh]
                        preds[ci] = _emit_block(
                            bw, coefs, preds[ci], dc_maps[tsel[ci]],
                            ac_maps[tsel[ci]],
                        )
            mcu_index += 1
    bw.flush()
    out.extend(bw.buf)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


def _encode_jpeg_progressive(
    h: int, w: int, nc: int, samp: list, q_lum: np.ndarray,
    q_chr: np.ndarray, coef_grids: list, restart_interval: int,
    hmax: int, vmax: int, mcux: int, mcuy: int,
) -> bytes:
    """SOF2 scan-script tail of encode_jpeg (same quantized
    coefficients as the sequential path): interleaved DC first (Al=1)
    -> per-component AC first bands 1-5 / 6-63 (Al=1) -> DC refinement
    (Ah=1) -> per-component AC refinement bands."""
    tsel = [0] + [1] * (nc - 1)
    dc_maps = [_encode_huff(_DC_LUM_BITS, _DC_LUM_VALS)]
    if nc == 3:
        dc_maps.append(_encode_huff(_DC_CHR_BITS, _DC_CHR_VALS))
    ac_map = _encode_huff(_AC_PROG_BITS, _AC_PROG_VALS)

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    seg(0xDB, bytes([0x00]) + bytes(q_lum[_ZIGZAG].astype(np.uint8)))
    if nc == 3:
        seg(0xDB, bytes([0x01]) + bytes(q_chr[_ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], tsel[ci]])
    seg(0xC2, sof)
    seg(0xC4, bytes([0x00]) + _DC_LUM_BITS + _DC_LUM_VALS)
    if nc == 3:
        seg(0xC4, bytes([0x01]) + _DC_CHR_BITS + _DC_CHR_VALS)
    seg(0xC4, bytes([0x10]) + _AC_PROG_BITS + _AC_PROG_VALS)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))

    rst = [0]  # RSTn modulo counter; resets to RST0 at each SOS (T.81 E.1.4)

    def emit_restart(bw: _BitWriter) -> _BitWriter:
        bw.flush()
        out.extend(bw.buf)
        out.extend(bytes([0xFF, 0xD0 + (rst[0] % 8)]))
        rst[0] += 1
        return _BitWriter()

    def dc_scan(first: bool) -> None:
        al, ahal = (1, 0x01) if first else (0, 0x10)
        sos = bytes([nc])
        for ci in range(nc):
            sos += bytes([ci + 1, tsel[ci] << 4])
        seg(0xDA, sos + bytes([0, 0, ahal]))
        rst[0] = 0
        bw = _BitWriter()
        preds = [0] * nc
        n = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and n and n % restart_interval == 0:
                    bw = emit_restart(bw)
                    preds = [0] * nc
                for ci in range(nc):
                    sh, sv = samp[ci]
                    for v in range(sv):
                        for hh in range(sh):
                            dc = int(coef_grids[ci][my * sv + v, mx * sh + hh][0])
                            if first:
                                val = dc >> al  # DC: arithmetic shift
                                diff = val - preds[ci]
                                preds[ci] = val
                                s = _category(diff)
                                code, ln = dc_maps[tsel[ci]][s]
                                bw.write(code, ln)
                                if s:
                                    bw.write(
                                        diff if diff > 0 else diff + (1 << s) - 1,
                                        s,
                                    )
                            else:
                                bw.write(dc & 1, 1)  # Al=0 refinement bit
                n += 1
        bw.flush()
        out.extend(bw.buf)

    def ac_scan(ci: int, bs: int, be: int, first: bool) -> None:
        al, ahal = (1, 0x01) if first else (0, 0x10)
        seg(0xDA, bytes([1, ci + 1, 0x00, bs, be, ahal]))
        rst[0] = 0
        sh, sv = samp[ci]
        comp_cols = -(-(w * sh) // hmax)
        comp_rows = -(-(h * sv) // vmax)
        wb = -(-comp_cols // 8)
        hb = -(-comp_rows // 8)
        bw = _BitWriter()
        eob_state: list = [0, []]
        emit = _emit_ac_first if first else _emit_ac_refine
        n = 0
        for by in range(hb):
            for bx in range(wb):
                if restart_interval and n and n % restart_interval == 0:
                    _flush_eobrun(bw, ac_map, eob_state)
                    bw = emit_restart(bw)
                emit(bw, ac_map, coef_grids[ci][by, bx], bs, be, al, eob_state)
                n += 1
        _flush_eobrun(bw, ac_map, eob_state)
        bw.flush()
        out.extend(bw.buf)

    dc_scan(first=True)
    for ci in range(nc):
        ac_scan(ci, 1, 5, first=True)
        ac_scan(ci, 6, 63, first=True)
    dc_scan(first=False)
    for ci in range(nc):
        ac_scan(ci, 1, 5, first=False)
        ac_scan(ci, 6, 63, first=False)
    out.extend(b"\xff\xd9")
    return bytes(out)


# ------------------------------------------------------- MP4 (ISOBMFF)
#
# Container-level parsing per ISO/IEC 14496-12: the sample tables in
# moov/trak/mdia/minf/stbl give every video frame's REAL byte range,
# timestamp and sync (keyframe) flag without any codec work.  Frame
# SAMPLING is therefore real here; only pixel DECODE of the extracted
# frame bytes needs an external codec (PyAV) and stays stubbed.

_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _mp4_boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, box_end) for boxes in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("malformed MP4 box")
        yield btype, pos + hdr, pos + size
        pos += size


def _mp4_children(data: bytes, ranges: list, name: bytes) -> list:
    out = []
    for s, e in ranges:
        for btype, bs, be in _mp4_boxes(data, s, e):
            if btype == name:
                out.append((bs, be))
    return out


def parse_mp4_video(data: bytes) -> dict:
    """MP4 bytes -> the first video track's sample table.

    Returns ``{codec, width, height, timescale, n_samples, offsets,
    sizes, dts, sync}`` (numpy arrays; ``dts`` in timescale units,
    ``sync`` bool — all-true when there is no stss box).  Composition
    offsets (ctts) are ignored: pts is approximated by dts, which is
    exact for streams without B-frame reordering.  Raises ValueError
    for fragmented (moof) or non-video files.
    """
    if sniff(data) != "mp4":
        raise ValueError("not an MP4")
    top = list(_mp4_boxes(data, 0, len(data)))
    if any(t == b"moof" for t, _, _ in top):
        raise ValueError("fragmented MP4 (moof) unsupported")
    moov = [(s, e) for t, s, e in top if t == b"moov"]
    if not moov:
        raise ValueError("MP4 without moov")
    for trak in _mp4_children(data, moov, b"trak"):
        mdia = _mp4_children(data, [trak], b"mdia")
        hdlr = _mp4_children(data, mdia, b"hdlr")
        if not hdlr or data[hdlr[0][0] + 8 : hdlr[0][0] + 12] != b"vide":
            continue
        mdhd_s = _mp4_children(data, mdia, b"mdhd")[0][0]
        version = data[mdhd_s]
        timescale = struct.unpack(
            ">I", data[mdhd_s + (20 if version else 12) : mdhd_s + (24 if version else 16)]
        )[0]
        stbl = _mp4_children(data, _mp4_children(data, mdia, b"minf"), b"stbl")
        boxes = {
            t: (s, e)
            for ss, ee in stbl
            for t, s, e in _mp4_boxes(data, ss, ee)
        }
        # stsd: first VisualSampleEntry -> fourcc + dims
        sd_s, sd_e = boxes[b"stsd"]
        ent = sd_s + 8  # fullbox(4) + entry_count(4)
        codec = data[ent + 4 : ent + 8].decode("latin1")
        width, height = struct.unpack(">HH", data[ent + 32 : ent + 36])
        # stsz: sizes
        sz_s, _ = boxes[b"stsz"]
        uniform, count = struct.unpack(">II", data[sz_s + 4 : sz_s + 12])
        if uniform:
            sizes = np.full(count, uniform, dtype=np.int64)
        else:
            sizes = np.frombuffer(
                data, dtype=">u4", count=count, offset=sz_s + 12
            ).astype(np.int64)
        # stts: decode timestamps
        tt_s, _ = boxes[b"stts"]
        (n_tt,) = struct.unpack(">I", data[tt_s + 4 : tt_s + 8])
        tt = np.frombuffer(
            data, dtype=">u4", count=2 * n_tt, offset=tt_s + 8
        ).astype(np.int64).reshape(-1, 2)
        deltas = np.repeat(tt[:, 1], tt[:, 0])[:count]
        dts = np.concatenate([[0], np.cumsum(deltas)[:-1]])
        # stsc + stco/co64: per-sample file offsets
        sc_s, _ = boxes[b"stsc"]
        (n_sc,) = struct.unpack(">I", data[sc_s + 4 : sc_s + 8])
        sc = np.frombuffer(
            data, dtype=">u4", count=3 * n_sc, offset=sc_s + 8
        ).astype(np.int64).reshape(-1, 3)  # first_chunk, spc, desc_id
        if b"stco" in boxes:
            co_s, _ = boxes[b"stco"]
            (n_co,) = struct.unpack(">I", data[co_s + 4 : co_s + 8])
            chunk_off = np.frombuffer(
                data, dtype=">u4", count=n_co, offset=co_s + 8
            ).astype(np.int64)
        else:
            co_s, _ = boxes[b"co64"]
            (n_co,) = struct.unpack(">I", data[co_s + 4 : co_s + 8])
            chunk_off = np.frombuffer(
                data, dtype=">u8", count=n_co, offset=co_s + 8
            ).astype(np.int64)
        # expand stsc to samples-per-chunk for every chunk
        bounds = np.append(sc[:, 0], n_co + 1)  # 1-based chunk ranges
        spc = np.repeat(sc[:, 1], np.diff(bounds))[:n_co]
        spc_total = int(spc.sum())
        if spc_total < count:
            raise ValueError("MP4 sample tables inconsistent (stsc/stsz)")
        sample_chunk = np.repeat(np.arange(n_co), spc)[:count]
        excl = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        chunk_first = np.concatenate([[0], np.cumsum(spc)[:-1]])
        offsets = (
            chunk_off[sample_chunk]
            + excl
            - excl[chunk_first[sample_chunk]]
        )
        sync = np.zeros(count, dtype=bool)
        if b"stss" in boxes:
            ss_s, _ = boxes[b"stss"]
            (n_ss,) = struct.unpack(">I", data[ss_s + 4 : ss_s + 8])
            idx = np.frombuffer(
                data, dtype=">u4", count=n_ss, offset=ss_s + 8
            ).astype(np.int64)
            sync[idx - 1] = True
        else:
            sync[:] = True
        return {
            "codec": codec,
            "width": int(width),
            "height": int(height),
            "timescale": int(timescale),
            "n_samples": int(count),
            "offsets": offsets,
            "sizes": sizes,
            "dts": dts,
            "sync": sync,
        }
    raise ValueError("MP4 has no video track")


def encode_mp4(
    frames: list[bytes],
    *,
    fps: int = 12,
    width: int = 64,
    height: int = 48,
    sync_every: int = 4,
    codec: bytes = b"mp4v",
    frames_per_chunk: int | None = None,
) -> bytes:
    """Opaque frame payloads -> minimal single-track MP4 (ftyp + mdat +
    moov with full stbl sample tables; every ``sync_every``-th frame is
    marked sync in stss).  The frame BYTES are arbitrary — this writes
    a structurally valid container for the sampling path and tests.
    ``frames_per_chunk`` splits samples over multiple chunks (multiple
    stco entries + a run-length stsc), exercising the reader's
    chunk-offset math; default is one chunk."""
    timescale = fps * 1000
    delta = 1000
    n = len(frames)
    fpc = frames_per_chunk or n

    def box(t: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + t + body

    def full(t: bytes, body: bytes, version: int = 0, flags: int = 0) -> bytes:
        return box(t, bytes([version]) + flags.to_bytes(3, "big") + body)

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_payload = b"".join(frames)
    mdat = box(b"mdat", mdat_payload)
    chunk_offset = len(ftyp) + 8  # start of mdat payload

    duration = n * delta
    matrix = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    mvhd = full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">iHHII", 0x10000, 0x0100, 0, 0, 0)
        + matrix
        + struct.pack(">6I", 0, 0, 0, 0, 0, 0)
        + struct.pack(">I", 2),
    )
    tkhd = full(
        b"tkhd",
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + struct.pack(">IIHHHH", 0, 0, 0, 0, 0, 0)
        + matrix
        + struct.pack(">II", width << 16, height << 16),
        flags=3,
    )
    mdhd = full(
        b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0)
    )
    hdlr = full(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"v\x00")
    vmhd = full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
    dref = full(
        b"dref", struct.pack(">I", 1) + full(b"url ", b"", flags=1)
    )
    dinf = box(b"dinf", dref)
    sample_entry = box(
        codec,
        b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">IH", 0, 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1),
    )
    stsd = full(b"stsd", struct.pack(">I", 1) + sample_entry)
    stts = full(b"stts", struct.pack(">III", 1, n, delta))
    chunks = [frames[i : i + fpc] for i in range(0, n, fpc)]
    sc_entries = [(1, min(fpc, n), 1)]
    if len(chunks) > 1 and len(chunks[-1]) != fpc:
        sc_entries.append((len(chunks), len(chunks[-1]), 1))
    stsc = full(
        b"stsc",
        struct.pack(">I", len(sc_entries))
        + b"".join(struct.pack(">III", *e) for e in sc_entries),
    )
    stsz = full(
        b"stsz",
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    chunk_offsets = []
    off = chunk_offset
    for c in chunks:
        chunk_offsets.append(off)
        off += sum(len(f) for f in c)
    stco = full(
        b"stco",
        struct.pack(">I", len(chunk_offsets))
        + b"".join(struct.pack(">I", o) for o in chunk_offsets),
    )
    sync_idx = list(range(1, n + 1, max(1, sync_every)))
    stss = full(
        b"stss",
        struct.pack(">I", len(sync_idx))
        + b"".join(struct.pack(">I", i) for i in sync_idx),
    )
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco + stss)
    minf = box(b"minf", vmhd + dinf + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


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
