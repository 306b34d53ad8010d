"""MJPEG-in-AVI container codec (aira_spark/avio.py) — the contract:

1. container roundtrip: write_mjpeg_avi -> parse_avi recovers dims, fps,
   frame count; every sampled frame decodes to PSNR >= 40 dB vs its
   source (the frames are baseline JPEGs through the already-verified
   jpegio path);
2. frame addressing: decode_frame(i) returns frame i's CONTENT (distinct
   frames pinned), iter_frames(every_n) yields exactly 0, n, 2n, ...;
3. structural validation: idx1 entries are cross-checked against the
   movi chunks, avih frame count against the chunks actually found,
   strf dims against avih;
4. strict error envelope: bad magic / truncation / missing headers /
   non-video stream / XviD-et-al refused BY NAME (the reference's
   unsupported-codec error contract, compression.rs:100-104);
5. Spark dispatch: frame_sample really extracts JPEG payloads for
   fmt='mjpeg-avi' and emits dead-letter error rows for unsupported
   codecs; video_roundtrip_stats matches the closed-form oracle census.
"""

import struct

import numpy as np
import pytest

from aira_spark.avio import (
    AviError,
    decode_frame,
    iter_frames,
    parse_avi,
    write_mjpeg_avi,
)


def _tri(h, w, nc, k=0, f=0):
    r = np.arange(h)[:, None, None]
    c = np.arange(w)[None, :, None]
    s = np.arange(nc)[None, None, :]
    return (255 - np.abs(255 - (r * 5 + c * 3 + k + f * 17 + s * 37) % 510)).astype(
        np.uint8
    )


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


@pytest.mark.parametrize("nc", [1, 3])
@pytest.mark.parametrize("n_frames", [1, 4, 7])
def test_roundtrip_dims_fps_and_fidelity(nc, n_frames):
    frames = [_tri(24, 32, nc, f=i) for i in range(n_frames)]
    buf = write_mjpeg_avi(frames, fps=12, quality=90)
    m = parse_avi(buf)
    assert (m["width"], m["height"], m["n_frames"]) == (32, 24, n_frames)
    assert m["fps"] == 12.0 and m["codec"] == "mjpeg"
    for i in range(n_frames):
        dec = decode_frame(buf, m, i)
        assert dec.shape == (24, 32, nc)
        assert _psnr(dec, frames[i]) >= 40


def test_frame_addressing_returns_distinct_content():
    # constant-value frames: JPEG reproduces constants EXACTLY, so frame i
    # must decode to exactly i*10 everywhere — any off-by-one walk fails
    frames = [np.full((16, 16, 1), i * 10, dtype=np.uint8) for i in range(6)]
    buf = write_mjpeg_avi(frames, fps=10)
    m = parse_avi(buf)
    for i in range(6):
        assert np.array_equal(decode_frame(buf, m, i), frames[i])
    assert [i for i, _ in iter_frames(buf, 2)] == [0, 2, 4]
    assert [i for i, _ in iter_frames(buf, 10)] == [0]
    with pytest.raises(AviError, match="out of range"):
        decode_frame(buf, m, 6)


def test_writer_rejects_mixed_dims_and_empty():
    with pytest.raises(AviError, match="at least one frame"):
        write_mjpeg_avi([], fps=10)
    with pytest.raises(AviError, match="fixed-dimension"):
        write_mjpeg_avi(
            [_tri(16, 16, 1), _tri(16, 24, 1)], fps=10
        )


def _patch(buf: bytes, at: int, fmt: str, value) -> bytes:
    b = bytearray(buf)
    struct.pack_into(fmt, b, at, value)
    return bytes(b)


def test_error_envelope():
    buf = write_mjpeg_avi([_tri(16, 16, 3, f=i) for i in range(3)], fps=10)
    with pytest.raises(AviError, match="magic"):
        parse_avi(b"RIFX" + buf[4:])
    with pytest.raises(AviError, match="size mismatch"):
        parse_avi(buf[:-6])
    with pytest.raises(AviError, match="form type"):
        parse_avi(buf.replace(b"AVI ", b"WAVE", 1))
    # XviD handler refused by name
    hi = buf.index(b"strh") + 8
    bad = bytearray(buf)
    bad[hi + 4 : hi + 8] = b"XVID"
    with pytest.raises(AviError, match="XviD"):
        parse_avi(bytes(bad))
    # audio stream type refused
    bad = bytearray(buf)
    bad[hi : hi + 4] = b"auds"
    with pytest.raises(AviError, match="not a video stream"):
        parse_avi(bytes(bad))
    # avih frame count vs movi contents
    ai = buf.index(b"avih") + 8
    with pytest.raises(AviError, match="movi holds"):
        parse_avi(_patch(buf, ai + 16, "<I", 99))
    # idx1 offset cross-check
    ii = buf.index(b"idx1") + 8
    with pytest.raises(AviError, match="idx1 entry"):
        parse_avi(_patch(buf, ii + 8, "<I", 4242))
    # strf dims vs avih dims
    si = buf.index(b"strf") + 8
    with pytest.raises(AviError, match="dims"):
        parse_avi(_patch(buf, si + 4, "<i", 999))


def test_spark_frame_sample_real_avi(spark):
    buf = write_mjpeg_avi([_tri(16, 16, 3, f=i) for i in range(5)], fps=10)
    media = spark.createDataFrame(
        [("v1", "mjpeg-avi", bytearray(buf)), ("v2", "h264-mp4", bytearray(b"\x00" * 9))],
        "media_id string, fmt string, bytes binary",
    )
    from aira_spark.jpegio import decode_jpeg
    from aira_spark.operators.multimodal import frame_sample

    rows = frame_sample(media, every_n=2).collect()
    good = sorted(
        (r for r in rows if r["media_id"] == "v1"), key=lambda r: r["frame_idx"]
    )
    assert [r["frame_idx"] for r in good] == [0, 2, 4]
    # emitted frames are standalone decodable JPEGs of the right frame
    for r in good:
        dec = decode_jpeg(bytes(r["frame"]))
        assert _psnr(dec, _tri(16, 16, 3, f=r["frame_idx"])) >= 40
    (bad,) = [r for r in rows if r["media_id"] == "v2"]
    assert bad["frame"] is None and "not available" in bad["error"]


def test_spark_video_roundtrip_stats_matches_synth(spark):
    from aira_spark.operators.multimodal import _avi_synth, video_roundtrip_stats

    keys = spark.range(0, 8).selectExpr("id AS k")
    rows = video_roundtrip_stats(keys).collect()
    by_vid: dict[str, list] = {}
    for r in rows:
        by_vid.setdefault(r["video_id"], []).append(r)
    assert len(by_vid) == 8
    for k in range(8):
        frames, _, _ = _avi_synth(k)
        got = sorted(by_vid[f"avi{k:08d}"], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in got] == list(range(0, len(frames), 2))
        h, w, nc = frames[0].shape
        for r in got:
            assert (r["out_w"], r["out_h"], r["out_ch"]) == (w, h, nc)
            assert r["psnr_ok"] == 1 and r["coef_ok"] == 1
