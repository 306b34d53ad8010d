"""Baseline JPEG codec (aira_spark/jpegio.py) — the exactness contract:

1. entropy-coding invertibility: integer quantized coefficients recovered
   from the BYTES equal the encoder's arrays exactly (DC prediction,
   zigzag, magnitude categories, ZRL/EOB, byte stuffing, restart resync);
2. reconstruction determinism: decode() == dequant_idct() of those
   coefficients, so decode(encode(x)) is a pure function of x;
3. fidelity: PSNR >= 40 dB at the operator's cycled qualities on the
   triangle-wave fixtures (the north rule's lossy-format criterion);
4. strict error envelope: progressive / subsampled / truncated / non-JPEG
   inputs raise JpegError (mirroring the reference reader's
   unsupported-codec error rows, compression.rs:100-104).
"""

import numpy as np
import pytest

from aira_spark.jpegio import (
    ZIGZAG,
    JpegError,
    _extend,
    _magnitude,
    dct_quant,
    decode_jpeg,
    dequant_idct,
    parse_jpeg,
    quant_tables,
    rgb_to_ycbcr,
    write_jpeg,
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _tri(h, w, nc, k=0):
    r = np.arange(h)[:, None, None]
    c = np.arange(w)[None, :, None]
    s = np.arange(nc)[None, None, :]
    return (255 - np.abs(255 - (r * 5 + c * 3 + k + s * 37) % 510)).astype(
        np.uint8
    )


def test_zigzag_is_a_permutation_with_known_anchors():
    assert sorted(ZIGZAG) == list(range(64))
    # spec anchors: start (0,0),(0,1),(1,0); end (7,7); position 5 = (0,2)
    assert ZIGZAG[:4] == [0, 1, 8, 16] and ZIGZAG[5] == 2
    assert ZIGZAG[-1] == 63


def test_magnitude_extend_roundtrip_all_categories():
    for v in list(range(-2047, 2048)):
        s, code = _magnitude(v)
        assert _extend(code, s) == v
        assert s == (0 if v == 0 else int(abs(v)).bit_length())


@pytest.mark.parametrize("quality", [50, 75, 90, 95])
@pytest.mark.parametrize(
    "shape", [(8, 8, 1), (16, 24, 1), (13, 11, 1), (9, 17, 3), (40, 56, 3)]
)
def test_roundtrip_matrix(quality, shape):
    """Coefficient exactness + reconstruction determinism + PSNR on a
    size/quality matrix including non-multiple-of-8 dims."""
    src = _tri(*shape, k=quality)
    buf = write_jpeg(src, quality=quality)
    dec = decode_jpeg(buf)
    assert dec.shape == src.shape and dec.dtype == np.uint8
    parsed = parse_jpeg(buf)
    ql, qc = quant_tables(quality)
    if shape[2] == 1:
        comps, qts = [src[:, :, 0]], [ql]
    else:
        ycc = rgb_to_ycbcr(src)
        comps, qts = [ycc[:, :, i] for i in range(3)], [ql, qc, qc]
    for ci, (cm, qt) in enumerate(zip(comps, qts)):
        assert np.array_equal(dct_quant(cm, qt), parsed["coeffs"][ci])
    # reconstruction is exactly dequant+iDCT of those integers
    h, w = shape[:2]
    planes = [
        dequant_idct(parsed["coeffs"][ci], qts[ci], h, w)
        for ci in range(shape[2])
    ]
    if shape[2] == 1:
        assert np.array_equal(dec, planes[0][:, :, None])
    # the 40 dB lossy gate holds at the operator's cycled qualities
    # (75/85/95); q50 is tested for coefficient exactness above and sits
    # just under it on the widest RGB case (39.8 dB) — assert the weaker
    # bound there rather than pretending the gate applies
    assert _psnr(src, dec) >= (40.0 if quality >= 75 else 35.0)


def test_constant_images_decode_exactly():
    for v in (0, 63, 128, 200, 255):
        src = np.full((24, 16, 1), v, np.uint8)
        assert np.array_equal(decode_jpeg(write_jpeg(src, 75)), src)


@pytest.mark.parametrize("interval", [1, 2, 3, 7])
def test_restart_markers_change_bytes_not_pixels(interval):
    src = _tri(40, 56, 3, k=interval)
    plain = write_jpeg(src, 90)
    rst = write_jpeg(src, 90, restart_interval=interval)
    assert rst != plain and b"\xff\xd0" in rst or interval > 6
    assert np.array_equal(decode_jpeg(plain), decode_jpeg(rst))


def test_noise_still_roundtrips_coefficients_exactly():
    """Noise is the entropy-coding stress case (every AC category, dense
    ZRL/EOB mix, stuffed 0xFF bytes) — PSNR is low by nature but the
    integer coefficients must still survive the bitstream exactly."""
    src = (
        np.random.default_rng(7)
        .integers(0, 256, (24, 24, 3))
        .astype(np.uint8)
    )
    buf = write_jpeg(src, quality=95)
    parsed = parse_jpeg(buf)
    ycc = rgb_to_ycbcr(src)
    ql, qc = quant_tables(95)
    for ci, qt in enumerate([ql, qc, qc]):
        assert np.array_equal(dct_quant(ycc[:, :, ci], qt), parsed["coeffs"][ci])


def test_error_envelope():
    src = _tri(16, 16, 1)
    buf = bytearray(write_jpeg(src, 90))
    with pytest.raises(JpegError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(JpegError):
        decode_jpeg(bytes(buf[: len(buf) // 2]))  # truncated mid-scan
    # progressive: flip SOF0 (0xC0) to SOF2 (0xC2)
    i = bytes(buf).find(b"\xff\xc0")
    prog = bytes(buf[:i]) + b"\xff\xc2" + bytes(buf[i + 2 :])
    with pytest.raises(JpegError, match="not baseline"):
        decode_jpeg(prog)
    # subsampling: patch the Y component's sampling factors to 2x2
    samp = bytes(buf).find(b"\xff\xc0") + 2 + 2 + 6  # marker+len+prec+dims+nc
    sub = bytearray(buf)
    sub[samp + 1] = 0x22
    with pytest.raises(JpegError, match="subsampling"):
        decode_jpeg(bytes(sub))
    with pytest.raises(JpegError, match="quality"):
        write_jpeg(src, quality=0)
    with pytest.raises(JpegError, match="uint8"):
        write_jpeg(src.astype(np.uint16), quality=90)


def test_decode_image_dispatch_and_features(spark):
    """The fmt='jpeg' branch reaches the real codec through the Spark-side
    image_features operator (no more NotImplementedError rows)."""
    from aira_spark.operators.multimodal import image_features

    src = _tri(16, 24, 3)
    df = spark.createDataFrame(
        [("j1", "jpeg", bytearray(write_jpeg(src, 90)))],
        "image_id string, fmt string, bytes binary",
    )
    row = image_features(df).collect()[0]
    assert row["error"] is None and row["n_channels"] == 3
    assert all(abs(m - src[:, :, i].mean()) < 2.0 for i, m in enumerate(row["mean"]))
