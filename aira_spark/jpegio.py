"""Baseline-sequential JPEG codec in pure numpy + stdlib — no PIL/libjpeg.

Retires the last multimodal codec stub (VERDICT r4 item 4): a web-crawl
corpus is mostly JPEG, so the engine's decode path must speak it. Same
design rules as aira_spark/pngio.py: a self-contained WRITER so fixtures
are synthesized deterministically (no external binaries in the sandbox),
and a strict DECODER that raises JpegError on anything outside the
supported envelope instead of guessing.

Supported envelope (baseline JFIF):
- SOF0 baseline DCT, 8-bit samples, 1 component (grayscale) or 3
  components YCbCr with NO chroma subsampling (4:4:4) — the writer only
  emits this shape; the decoder rejects progressive (SOF2), arithmetic
  coding, 12-bit, and subsampled streams loudly (mirroring the reference
  TIFF reader's unsupported-codec error rows,
  /root/reference/crates/aira-tiff/src/compression.rs:100-104).
- DQT 8-bit tables, DHT Huffman tables read FROM THE STREAM (the decoder
  never assumes the writer's tables), DRI/RSTn restart markers, 0xFF00
  byte unstuffing, EOB/ZRL AC run-length semantics per ITU T.81 F.1/F.2.

Exactness contract (what tests pin):
- entropy-coding invertibility: the integer quantized-coefficient array
  recovered from the BYTES equals the encoder's array exactly (DC
  prediction, zigzag, magnitude categories, stuffing — all bit-exact);
- reconstruction determinism: decode() == dequant+iDCT+clip of those
  integer coefficients, so decode(encode(x)) is a pure function of x;
- fidelity: PSNR(decode(encode(x)), x) >= 40 dB at quality 90 on the
  synthetic fixtures (the north rule's lossy-format criterion).
"""

from __future__ import annotations

import math
import struct

import numpy as np


class JpegError(ValueError):
    """Malformed or unsupported JPEG input."""


# ------------------------------------------------------------ tables

# zigzag scan: GENERATED, not transcribed (anti-diagonal walk, T.81 fig 5)
def _zigzag() -> list[int]:
    order = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        for r in (rng if s % 2 else reversed(rng)):
            order.append(r * 8 + (s - r))
    return order


ZIGZAG = _zigzag()

# base quantization tables (ITU T.81 Annex K.1/K.2)
QTBL_LUMA = np.array(
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
    dtype=np.int64,
).reshape(8, 8)
QTBL_CHROMA = np.array(
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
    dtype=np.int64,
).reshape(8, 8)

# standard Huffman table specs (T.81 Annex K.3): (bits[1..16], huffval).
# Self-consistency is validated at import (_build_codes checks canonical
# code space), and the DECODER always reads tables from DHT — a writer
# table that deviated from the spec would still round-trip, it would just
# compress differently.
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length), canonical per T.81 C.2; validates the spec."""
    if sum(bits) != len(vals):
        raise JpegError("Huffman spec: counts do not match value list")
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise JpegError("Huffman spec: code space overflow")
            codes[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return codes


# encoder-side code maps (validated at import time)
_ENC_DC = (_build_codes(*_DC_LUMA), _build_codes(*_DC_CHROMA))
_ENC_AC = (_build_codes(*_AC_LUMA), _build_codes(*_AC_CHROMA))

# orthonormal DCT-II matrix: C[u,x] = a(u) cos((2x+1) u pi / 16)
_C = np.array(
    [
        [
            math.sqrt((1 if u == 0 else 2) / 8)
            * math.cos((2 * x + 1) * u * math.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex-K base tables, clamped to [1, 255]."""
    if not 1 <= quality <= 100:
        raise JpegError(f"quality must be in [1, 100], got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((QTBL_LUMA * scale + 50) // 100, 1, 255)
    qc = np.clip((QTBL_CHROMA * scale + 50) // 100, 1, 255)
    return ql, qc


# ------------------------------------------------------------ block math


def _to_blocks(comp: np.ndarray) -> np.ndarray:
    """(h, w) -> (nby, nbx, 8, 8) float64, edge-replicated to 8-multiples,
    level-shifted by -128."""
    h, w = comp.shape
    ph, pw = -h % 8, -w % 8
    a = np.pad(comp.astype(np.float64), ((0, ph), (0, pw)), mode="edge") - 128.0
    nby, nbx = a.shape[0] // 8, a.shape[1] // 8
    return a.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)


def dct_quant(comp: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """(h, w) u8 component -> (nby, nbx, 8, 8) int32 quantized coefficients.
    Forward DCT via the orthonormal matrix, IJG-style round-half-away
    quantization (sign * floor(|c|/q + 0.5))."""
    blocks = _to_blocks(comp)
    coef = np.einsum("ux,byxv,wv->byuw", _C, blocks, _C, optimize=True)
    scaled = coef / qtbl.astype(np.float64)
    return (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int32)


def dequant_idct(coeffs: np.ndarray, qtbl: np.ndarray, h: int, w: int) -> np.ndarray:
    """(nby, nbx, 8, 8) int coefficients -> (h, w) u8 component."""
    co = coeffs.astype(np.float64) * qtbl.astype(np.float64)
    blocks = np.einsum("xu,byuw,wv->byxv", _C.T, co, _C.T.T, optimize=True)
    nby, nbx = coeffs.shape[:2]
    full = blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8) + 128.0
    return np.clip(np.round(full), 0, 255).astype(np.uint8)[:h, :w]


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF full-range BT.601, float -> round -> clip, (h, w, 3) u8."""
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(np.round(np.stack([y, cb, cr], axis=-1)), 0, 255).astype(np.uint8)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ------------------------------------------------------------ bit I/O


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.out)


class _BitReader:
    """Reads the (already unstuffed) entropy-coded byte string MSB-first.
    Bulk reads (take) and 16-bit peeks (for the Huffman LUT) instead of
    per-bit loops — the decoder's hot path. The 3-byte zero pad only
    backs peeks near the end; consuming past the real bits still raises
    (prefix codes make a zero-padded peek harmless: it can only alter
    bits beyond any code short enough to be valid)."""

    def __init__(self, data: bytes) -> None:
        self.data = data + b"\x00\x00\x00"
        self.nbits = len(data) * 8
        self.pos = 0  # bit position

    def peek16(self) -> int:
        byte_i, off = divmod(self.pos, 8)
        chunk = int.from_bytes(self.data[byte_i : byte_i + 4], "big")
        return (chunk >> (16 - off)) & 0xFFFF

    def take(self, n: int) -> int:
        """next n bits (n <= 24), MSB-first."""
        if self.pos + n > self.nbits:
            raise JpegError("entropy stream truncated")
        byte_i, off = divmod(self.pos, 8)
        chunk = int.from_bytes(self.data[byte_i : byte_i + 4], "big")
        self.pos += n
        return (chunk >> (32 - off - n)) & ((1 << n) - 1)


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category s, s-bit code): T.81 F.1.2.1 (ones' complement
    for negatives)."""
    if v == 0:
        return 0, 0
    s = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return s, v if v >= 0 else v + (1 << s) - 1


def _extend(code: int, s: int) -> int:
    """inverse of _magnitude: T.81 F.2.2.1 EXTEND."""
    if s == 0:
        return 0
    return code if code >= (1 << (s - 1)) else code - (1 << s) + 1


# ------------------------------------------------------------ writer


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dqt_payload(tid: int, qtbl: np.ndarray) -> bytes:
    return bytes([tid]) + bytes(int(qtbl.flat[z]) for z in ZIGZAG)


def _dht_payload(tclass: int, tid: int, spec: tuple[list[int], list[int]]) -> bytes:
    bits, vals = spec
    return bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)


def _encode_block(
    coeffs: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    bw: _BitWriter,
) -> int:
    zz = coeffs.flat
    seq = [int(zz[z]) for z in ZIGZAG]
    dc = seq[0]
    s, mag = _magnitude(dc - pred)
    code, ln = dc_codes[s]
    bw.put(code, ln)
    if s:
        bw.put(mag, s)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if seq[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        if seq[i] == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        s, mag = _magnitude(seq[i])
        code, ln = ac_codes[(run << 4) | s]
        bw.put(code, ln)
        bw.put(mag, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.put(code, ln)
    return dc


def write_jpeg(
    arr: np.ndarray, quality: int = 90, restart_interval: int = 0
) -> bytes:
    """Encode (h, w, 1) grayscale or (h, w, 3) RGB u8 as baseline JFIF
    (4:4:4, standard Annex-K Huffman tables). restart_interval > 0 emits
    a DRI segment and RSTn markers every that many MCUs (exercises the
    decoder's restart resync + DC-predictor reset path)."""
    if arr.ndim != 3 or arr.shape[2] not in (1, 3) or arr.dtype != np.uint8:
        raise JpegError("write_jpeg expects (h, w, 1|3) uint8")
    h, w, nc = arr.shape
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise JpegError(f"dimensions out of range: {h}x{w}")
    ql, qc = quant_tables(quality)
    comps = (
        [arr[:, :, 0]]
        if nc == 1
        else [rgb_to_ycbcr(arr)[:, :, i] for i in range(3)]
    )
    qtbls = [ql] + ([qc, qc] if nc == 3 else [])
    coeffs = [dct_quant(c, q) for c, q in zip(comps, qtbls)]

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += _seg(0xDB, _dqt_payload(0, ql))
    if nc == 3:
        out += _seg(0xDB, _dqt_payload(1, qc))
    # SOF0: 8-bit precision, 1x1 sampling everywhere (4:4:4)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_payload(0, 0, _DC_LUMA))
    out += _seg(0xC4, _dht_payload(1, 0, _AC_LUMA))
    if nc == 3:
        out += _seg(0xC4, _dht_payload(0, 1, _DC_CHROMA))
        out += _seg(0xC4, _dht_payload(1, 1, _AC_CHROMA))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])  # Ss, Se, Ah/Al (baseline fixed)
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    nby, nbx = coeffs[0].shape[:2]
    preds = [0] * nc
    done = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart_interval and done and done % restart_interval == 0:
                out += bw.flush()
                out += bytes([0xFF, 0xD0 + (done // restart_interval - 1) % 8])
                bw = _BitWriter()
                preds = [0] * nc
            for ci in range(nc):
                tid = 0 if ci == 0 else 1
                preds[ci] = _encode_block(
                    coeffs[ci][by, bx], preds[ci], _ENC_DC[tid], _ENC_AC[tid], bw
                )
            done += 1
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------ reader


def _read_u16(buf: bytes, at: int) -> int:
    if at + 2 > len(buf):
        raise JpegError("truncated segment length")
    return (buf[at] << 8) | buf[at + 1]


class _HuffTable:
    """Canonical Huffman decoder as a flat 16-bit LOOKUP TABLE: every
    16-bit window whose prefix is a code maps to (value << 8) | length,
    so a decode is one peek + one array read + one advance (vs the
    per-bit mincode/maxcode walk of T.81 F.2.2.3 — same result, the
    prefix property guarantees the first matching code is unique).
    Building the 65536-entry table costs ~100us, so instances are cached
    by table spec (_huff_table) — one build per executor per distinct
    DHT, not per image."""

    _SENTINEL = 0xFFFFFFFF

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        if sum(bits) != len(vals):
            raise JpegError("DHT: counts do not match value list")
        lut = np.full(1 << 16, self._SENTINEL, dtype=np.uint32)
        code = 0
        i = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                if code >= (1 << length):
                    raise JpegError("DHT: code space overflow")
                start = code << (16 - length)
                lut[start : start + (1 << (16 - length))] = (vals[i] << 8) | length
                code += 1
                i += 1
            code <<= 1
        self.lut = lut

    def decode(self, br: _BitReader) -> int:
        packed = int(self.lut[br.peek16()])
        if packed == self._SENTINEL:
            raise JpegError("invalid Huffman code")
        length = packed & 0xFF
        if br.pos + length > br.nbits:
            raise JpegError("entropy stream truncated")
        br.pos += length
        return packed >> 8


_HUFF_CACHE: dict[tuple[bytes, bytes], _HuffTable] = {}


def _huff_table(bits: list[int], vals: list[int]) -> _HuffTable:
    key = (bytes(bits), bytes(vals))
    t = _HUFF_CACHE.get(key)
    if t is None:
        t = _HuffTable(bits, vals)
        if len(_HUFF_CACHE) < 64:  # bounded: real corpora reuse few tables
            _HUFF_CACHE[key] = t
    return t


def _decode_block(
    br: _BitReader, dc: _HuffTable, ac: _HuffTable, pred: int
) -> tuple[np.ndarray, int]:
    out = np.zeros(64, dtype=np.int32)
    s = dc.decode(br)
    if s > 11:
        raise JpegError(f"DC category {s} out of range")
    diff = _extend(br.take(s), s) if s else 0
    val = pred + diff
    out[0] = val
    i = 1
    while i < 64:
        rs = ac.decode(br)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                i += 16
                continue
            break  # EOB
        i += run
        if i > 63:
            raise JpegError("AC run past end of block")
        out[i] = _extend(br.take(size), size)
        i += 1
    blk = np.zeros(64, dtype=np.int32)
    blk[ZIGZAG] = out
    return blk.reshape(8, 8), val


def _parse_scan_data(buf: bytes, at: int) -> tuple[list[bytes], int]:
    """Entropy-coded segments split at RSTn markers, unstuffed; returns
    (segments, index of the terminating marker's 0xFF)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = at
    n = len(buf)
    while i < n:
        b = buf[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            raise JpegError("stream ends inside scan data")
        m = buf[i + 1]
        if m == 0x00:  # stuffed 0xFF
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            segs.append(bytes(cur))
            return segs, i
    raise JpegError("no terminating marker after scan data")


def parse_jpeg(buf: bytes) -> dict:
    """Full structural parse + entropy decode; returns a dict with
    h, w, n_components, quant tables, and per-component integer
    coefficient arrays (nby, nbx, 8, 8) — decode_jpeg() is
    dequant+iDCT(+color) on top of this. Exposed so tests can pin
    entropy-coding invertibility without reaching into privates.

    Contract: anything outside the supported envelope — including
    byte-level corruption that would otherwise surface as IndexError /
    ValueError / struct.error from segment slicing — raises JpegError,
    so Arrow-UDF callers can dead-letter one bad row instead of failing
    the task."""
    try:
        return _parse_jpeg(buf)
    except JpegError:
        raise
    except (IndexError, ValueError, struct.error) as exc:
        raise JpegError(f"malformed JPEG stream: {exc}") from exc


def _parse_jpeg(buf: bytes) -> dict:
    if len(buf) < 4 or buf[0] != 0xFF or buf[1] != 0xD8:
        raise JpegError("not a JPEG: missing SOI")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    sof = None
    restart_interval = 0
    i = 2
    while True:
        if i + 2 > len(buf):
            raise JpegError("unexpected end of stream (no SOS)")
        if buf[i] != 0xFF:
            raise JpegError(f"expected marker at {i}, got 0x{buf[i]:02x}")
        m = buf[i + 1]
        i += 2
        if m == 0xD9:
            raise JpegError("EOI before SOS")
        if m in (0x01,) or 0xD0 <= m <= 0xD7:  # TEM / stray RST: no payload
            continue
        ln = _read_u16(buf, i)
        seg = buf[i + 2 : i + ln]
        if len(seg) != ln - 2:
            raise JpegError("truncated segment")
        if m == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:
                    raise JpegError("only 8-bit quant tables supported")
                if j + 65 > len(seg):
                    raise JpegError("truncated DQT")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(seg[j + 1 : j + 65], dtype=np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                j += 65
        elif m == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17 : j + 17 + nv])
                huff[(tc, th)] = _huff_table(bits, vals)
                j += 17 + nv
        elif m == 0xC0 or m == 0xC1:  # SOF0/1 (baseline/extended seq.)
            prec, h, w, nc = seg[0], _read_u16(seg, 1), _read_u16(seg, 3), seg[5]
            if prec != 8:
                raise JpegError(f"only 8-bit precision supported, got {prec}")
            if nc not in (1, 3):
                raise JpegError(f"only 1 or 3 components supported, got {nc}")
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise JpegError(
                        "chroma subsampling not supported (4:4:4 only)"
                    )
                comps.append((cid, tq))
            sof = (h, w, comps)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(f"unsupported SOF marker 0xff{m:02x} (not baseline)")
        elif m == 0xDD:  # DRI
            restart_interval = _read_u16(seg, 0)
        elif m == 0xDA:  # SOS
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cs, t = seg[1 + 2 * c : 3 + 2 * c]
                scomps.append((cs, t >> 4, t & 0x0F))
            i += ln
            break
        # APPn / COM / others: skipped
        i += ln

    if sof is None:
        raise JpegError("SOS before SOF")
    h, w, comps = sof
    if h == 0 or w == 0:
        raise JpegError("zero image dimension")
    nc = len(comps)
    if len(scomps) != nc:
        raise JpegError("scan component count != frame component count")
    nby, nbx = (h + 7) // 8, (w + 7) // 8
    segs, _end = _parse_scan_data(buf, i)
    coeffs = [np.zeros((nby, nbx, 8, 8), dtype=np.int32) for _ in range(nc)]
    qtbls = []
    dc_t, ac_t = [], []
    for ci, (_cid, tq) in enumerate(comps):
        if tq not in qt:
            raise JpegError(f"missing quant table {tq}")
        qtbls.append(qt[tq])
        _cs, td, ta = scomps[ci]
        if (0, td) not in huff or (1, ta) not in huff:
            raise JpegError("missing Huffman table referenced by SOS")
        dc_t.append(huff[(0, td)])
        ac_t.append(huff[(1, ta)])

    mcus = [(by, bx) for by in range(nby) for bx in range(nbx)]
    seg_idx = 0
    br = _BitReader(segs[0])
    preds = [0] * nc
    done = 0
    for by, bx in mcus:
        if restart_interval and done and done % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise JpegError("missing restart segment")
            br = _BitReader(segs[seg_idx])
            preds = [0] * nc
        for ci in range(nc):
            blk, preds[ci] = _decode_block(br, dc_t[ci], ac_t[ci], preds[ci])
            coeffs[ci][by, bx] = blk
        done += 1
    return {
        "h": h,
        "w": w,
        "n_components": nc,
        "qtbls": qtbls,
        "coeffs": coeffs,
    }


def decode_from_parse(p: dict) -> np.ndarray:
    """parse_jpeg() dict -> (h, w, 1|3) uint8 pixels — the dequant + iDCT
    (+ YCbCr) tail of decode_jpeg, split out so callers that need BOTH the
    coefficients and the pixels (the roundtrip-verify queries) pay the
    Huffman entropy decode once, not twice."""
    h, w, nc = p["h"], p["w"], p["n_components"]
    planes = [
        dequant_idct(p["coeffs"][ci], p["qtbls"][ci], h, w) for ci in range(nc)
    ]
    if nc == 1:
        return planes[0][:, :, None]
    return ycbcr_to_rgb(np.stack(planes, axis=-1))


def decode_jpeg(buf: bytes) -> np.ndarray:
    """bytes -> (h, w, 1|3) uint8 (RGB for 3-component streams)."""
    return decode_from_parse(parse_jpeg(buf))
