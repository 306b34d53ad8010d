"""PNG codec tests: roundtrip matrix, hand-computed filter golden vectors,
and the invalid-input error model (mirroring the TIFF test strategy,
SURVEY.md §5: byte-level goldens + roundtrips + error matrix)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from aira_spark.pngio import PngError, decode_png, write_png


def _px(h, w, ch, k=0, dtype=np.uint8):
    r = np.arange(h)[:, None, None]
    c = np.arange(w)[None, :, None]
    s = np.arange(ch)[None, None, :]
    v = (r * 7 + c * 13 + k + s * 29) % 256
    if dtype == np.uint16:
        v = v * 257
    return v.astype(dtype)


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_roundtrip_filters_channels(filt, ch):
    px = _px(13, 17, ch, k=filt * 31 + ch)
    out = decode_png(write_png(px, filters=filt))
    assert out.shape == (13, 17, ch)
    assert np.array_equal(out, px)


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_roundtrip_16bit(filt):
    px = _px(9, 11, 3, k=filt, dtype=np.uint16)
    out = decode_png(write_png(px, filters=filt))
    assert out.dtype == np.uint16
    assert np.array_equal(out, px)


def test_roundtrip_mixed_per_row_filters():
    px = _px(10, 12, 3, k=5)
    filters = [(i * 3 + 1) % 5 for i in range(10)]
    assert np.array_equal(decode_png(write_png(px, filters=filters)), px)


def test_roundtrip_palette():
    idx = (_px(8, 9, 1, k=3)).astype(np.uint8)
    pal = np.stack(
        [(np.arange(256) * m) % 256 for m in (3, 5, 7)], axis=1
    ).astype(np.uint8)
    out = decode_png(write_png(idx, filters=2, palette=pal))
    assert out.shape == (8, 9, 3)
    assert np.array_equal(out, pal[idx[:, :, 0]])


def test_filters_agree():
    """All five filter encodings of the same image decode identically —
    filters change bytes, never pixels."""
    px = _px(16, 16, 3, k=42)
    decoded = [decode_png(write_png(px, filters=f)) for f in range(5)]
    for d in decoded[1:]:
        assert np.array_equal(d, decoded[0])


def _raw_png(w, h, depth, ct, scanlines: bytes, extra=b""):
    """Hand-assembled PNG from raw (already filtered) scanline bytes."""
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ct, 0, 0, 0)
    return (
        sig + chunk(b"IHDR", ihdr) + extra
        + chunk(b"IDAT", zlib.compress(scanlines)) + chunk(b"IEND", b"")
    )


def test_golden_sub_up_average_paeth():
    """Hand-computed reconstruction (independent arithmetic, not the
    encoder): 2 rows x 4 px gray8.

    row0 Sub(1),   raw [10, 5, 5, 5]   -> recon [10, 15, 20, 25]
    row1 Up(2),    raw [1, 2, 3, 4]    -> recon [11, 17, 23, 29]
    """
    lines = bytes([1, 10, 5, 5, 5]) + bytes([2, 1, 2, 3, 4])
    px = decode_png(_raw_png(4, 2, 8, 0, lines))
    assert px[:, :, 0].tolist() == [[10, 15, 20, 25], [11, 17, 23, 29]]

    # Average(3): recon[j] = x[j] + floor((left + up) / 2)
    # row0 avg raw [10, 10, 10] with up=0 -> [10, 15, 17]
    #   (10+floor(0/2), 10+floor(10/2)=15, 10+floor(15/2)=17)
    lines = bytes([3, 10, 10, 10])
    px = decode_png(_raw_png(3, 1, 8, 0, lines))
    assert px[:, :, 0].tolist() == [[10, 15, 17]]

    # Paeth(4) first row: b=c=0 so predictor = left
    # raw [7, 1, 1] -> [7, 8, 9]
    lines = bytes([4, 7, 1, 1])
    px = decode_png(_raw_png(3, 1, 8, 0, lines))
    assert px[:, :, 0].tolist() == [[7, 8, 9]]

    # Paeth second row exercises the 3-way choice:
    # row0 None: [100, 200, 50]; row1 Paeth raw [5, 5, 5]:
    #  j0: a=0 b=100 c=0  -> p=100, pb=0 -> pred=100, recon=105
    #  j1: a=105 b=200 c=100 -> p=205, pa=100 pb=5 pc=105 -> pred=200, recon=205
    #  j2: a=205 b=50 c=200 -> p=55, pa=150 pb=5 pc=145 -> pred=50, recon=55
    lines = bytes([0, 100, 200, 50]) + bytes([4, 5, 5, 5])
    px = decode_png(_raw_png(3, 2, 8, 0, lines))
    assert px[1, :, 0].tolist() == [105, 205, 55]


def test_subbyte_depths():
    """1/2/4-bit gray: packed MSB-first samples, row-end padding ignored."""
    # depth=4, w=3: samples 0xA, 0xB, 0xC pack to bytes A B C0
    lines = bytes([0, 0xAB, 0xC0])
    px = decode_png(_raw_png(3, 1, 4, 0, lines))
    assert px[:, :, 0].tolist() == [[0xA, 0xB, 0xC]]
    # depth=1, w=10: bits 1010101010 -> 0xAA, 0x80
    lines = bytes([0, 0xAA, 0x80])
    px = decode_png(_raw_png(10, 1, 1, 0, lines))
    assert px[0, :, 0].tolist() == [1, 0, 1, 0, 1, 0, 1, 0, 1, 0]


def test_16bit_is_big_endian():
    # one gray16 pixel 0x0102 stored big-endian
    lines = bytes([0, 0x01, 0x02])
    px = decode_png(_raw_png(1, 1, 16, 0, lines))
    assert int(px[0, 0, 0]) == 0x0102


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b"X" + b[1:], "signature"),
        (lambda b: b[:-5] + bytes([b[-5] ^ 1]) + b[-4:], "CRC"),
        (lambda b: b[: len(b) // 2], "IEND|truncated"),
    ],
)
def test_structural_errors(mutate, msg):
    good = write_png(_px(4, 4, 1))
    with pytest.raises(PngError, match=msg):
        decode_png(mutate(good))


def test_error_matrix():
    with pytest.raises(PngError, match="interlace"):
        # IHDR with interlace=1
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
        sig = b"\x89PNG\r\n\x1a\n"
        c = struct.pack(">I", 13) + b"IHDR" + ihdr + struct.pack(
            ">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
        )
        end = struct.pack(">I", 0) + b"IEND" + struct.pack(
            ">I", zlib.crc32(b"IEND") & 0xFFFFFFFF
        )
        decode_png(sig + c + end)
    with pytest.raises(PngError, match="bit depth"):
        decode_png(_raw_png(2, 2, 4, 2, bytes(8)))  # 4-bit RGB is illegal
    with pytest.raises(PngError, match="filter type"):
        decode_png(_raw_png(2, 1, 8, 0, bytes([9, 0, 0])))
    with pytest.raises(PngError, match="decompressed length"):
        decode_png(_raw_png(4, 2, 8, 0, bytes([0, 1, 2, 3])))
    with pytest.raises(PngError, match="PLTE"):
        decode_png(_raw_png(2, 1, 8, 3, bytes([0, 0, 1])))
    with pytest.raises(PngError, match="palette index"):
        pal = np.zeros((2, 3), np.uint8)
        buf = write_png(np.full((1, 1, 1), 7, np.uint8), palette=pal)
        decode_png(buf)


def test_zlib_stream_spans_multiple_idats():
    """IDAT data may be split at arbitrary byte boundaries."""
    px = _px(6, 6, 3, k=9)
    buf = write_png(px, filters=1)
    # split the single IDAT into two
    pos = 8
    parts = []
    while pos < len(buf):
        (ln,) = struct.unpack(">I", buf[pos : pos + 4])
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + ln]
        parts.append((ctype, data))
        pos += 12 + ln
    out = []
    for ctype, data in parts:
        if ctype == b"IDAT" and len(data) > 3:
            halves = [data[: len(data) // 2], data[len(data) // 2 :]]
            for hd in halves:
                out.append((b"IDAT", hd))
        else:
            out.append((ctype, data))
    rebuilt = b"\x89PNG\r\n\x1a\n" + b"".join(
        struct.pack(">I", len(d)) + t + d
        + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        for t, d in out
    )
    assert np.array_equal(decode_png(rebuilt), px)
