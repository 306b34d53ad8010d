"""RIFF/WAVE codec (aira_spark/wavio.py) — the exactness contract:

1. lossless roundtrip: decode(encode(x)) == x elementwise for every PCM
   depth (8 unsigned / 16 / 24 / 32 signed) x channel count, including the
   odd-data-size pad-byte path (24-bit mono, odd n) and n = 0;
2. independent cross-check: our WRITER is readable by the stdlib `wave`
   module and our READER decodes stdlib-`wave`-written bytes — two
   implementations that share no code agree on the container;
3. strict error envelope: bad magic / size mismatch / truncated chunk /
   missing fmt or data / duplicate chunks / compressed format codes
   (ADPCM, a-law, ...) raise WavError by name (mirroring the reference
   reader's unsupported-codec error rows, compression.rs:100-104);
4. Spark dispatch: audio_roundtrip_stats emits the closed-form stats the
   DuckDB oracle states independently (oracle_wav_stats_sql).
"""

import io
import struct
import wave

import numpy as np
import pytest

from aira_spark.wavio import WavError, decode_wav, parse_wav, write_wav

RNG = np.random.default_rng(20260820)


def _rand(n, ch, bits):
    lo, hi = (0, 255) if bits == 8 else (-(1 << (bits - 1)), (1 << (bits - 1)) - 1)
    return RNG.integers(lo, hi + 1, size=(n, ch)).astype(np.int64)


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
@pytest.mark.parametrize("ch", [1, 2, 3])
@pytest.mark.parametrize("n", [0, 1, 257])
def test_pcm_roundtrip_exact(bits, ch, n):
    s = _rand(n, ch, bits)
    d, rate, b, f = decode_wav(write_wav(s, 44100, bits=bits))
    assert (rate, b, f) == (44100, bits, "pcm")
    assert d.shape == (n, ch)
    assert np.array_equal(d, s)


def test_24bit_sign_extension_boundaries():
    s = np.array([[-(1 << 23)], [(1 << 23) - 1], [-1], [0], [1]], dtype=np.int64)
    assert np.array_equal(decode_wav(write_wav(s, 8000, bits=24))[0], s)


def test_odd_data_size_pad_byte():
    # 24-bit mono, 1 sample = 3 data bytes -> RIFF pad byte required
    buf = write_wav(np.array([[5]], dtype=np.int64), 8000, bits=24)
    assert len(buf) % 2 == 0
    assert np.array_equal(decode_wav(buf)[0], [[5]])


def test_float32_roundtrip_and_fact_chunk():
    s = RNG.standard_normal((64, 2)).astype(np.float32)
    buf = write_wav(s, 16000, bits=32, fmt="float")
    m = parse_wav(buf)
    assert m["fmt"] == "float" and "fact" in m["chunks"]
    d, rate, bits, f = decode_wav(buf)
    assert (rate, bits, f) == (16000, 32, "float")
    assert np.array_equal(d, s)


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_writer_readable_by_stdlib_wave(bits):
    s = _rand(100, 2, bits)
    buf = write_wav(s, 22050, bits=bits)
    w = wave.open(io.BytesIO(buf))
    assert (w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()) == (
        2, bits // 8, 22050, 100,
    )
    assert w.readframes(100) == parse_wav(buf)["data"]


def test_reader_decodes_stdlib_wave_output():
    s = RNG.integers(-32768, 32768, size=(150, 2)).astype("<i2")
    bio = io.BytesIO()
    w = wave.open(bio, "wb")
    w.setnchannels(2)
    w.setsampwidth(2)
    w.setframerate(8000)
    w.writeframes(s.tobytes())
    w.close()
    d, rate, bits, f = decode_wav(bio.getvalue())
    assert (rate, bits, f) == (8000, 16, "pcm")
    assert np.array_equal(d, s.astype(np.int32))


def test_unknown_chunks_skipped_by_size():
    base = write_wav(np.array([[1, 2], [3, 4]], dtype=np.int64), 8000, bits=16)
    # splice a LIST chunk (odd payload -> exercises pad-skip) before data
    di = base.index(b"data")
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    patched = bytearray(base[:di] + extra + base[di:])
    struct.pack_into("<I", patched, 4, len(patched) - 8)
    m = parse_wav(bytes(patched))
    assert m["chunks"] == ["fmt ", "LIST", "data"]
    assert np.array_equal(decode_wav(bytes(patched))[0], [[1, 2], [3, 4]])


def _patch_fmt_u16(buf: bytes, field_off: int, value: int) -> bytes:
    b = bytearray(buf)
    struct.pack_into("<H", b, b.index(b"fmt ") + 8 + field_off, value)
    return bytes(b)


def test_error_envelope():
    good = write_wav(np.zeros((4, 1), dtype=np.int64), 8000, bits=16)
    cases = {
        "bad RIFF magic": b"RIFX" + good[4:],
        "RIFF size mismatch": good[:-2],
        "bad WAVE form": good.replace(b"WAVE", b"AVI ", 1),
        "too short": good[:8],
        "ADPCM refused by name": _patch_fmt_u16(good, 0, 2),
        "a-law refused by name": _patch_fmt_u16(good, 0, 6),
        "PCM depth 12 unsupported": _patch_fmt_u16(good, 14, 12),
        "zero channels": _patch_fmt_u16(good, 2, 0),
        "block_align mismatch": _patch_fmt_u16(good, 12, 7),
    }
    for label, bad in cases.items():
        with pytest.raises(WavError):
            parse_wav(bad), label
    # truncated chunk: declared data size beyond the buffer
    b = bytearray(good)
    struct.pack_into("<I", b, b.index(b"data") + 4, 9999)
    with pytest.raises(WavError, match="truncated|mismatch"):
        parse_wav(bytes(b))
    # missing data chunk
    nd = good[: good.index(b"data")]
    nd = b"RIFF" + struct.pack("<I", len(nd) - 8) + nd[8:]
    with pytest.raises(WavError, match="missing data"):
        parse_wav(nd)


def test_writer_range_checks():
    with pytest.raises(WavError, match="out of range"):
        write_wav(np.array([[300]], dtype=np.int64), 8000, bits=8)
    with pytest.raises(WavError, match="out of range"):
        write_wav(np.array([[1 << 23]], dtype=np.int64), 8000, bits=24)
    with pytest.raises(WavError, match="integers"):
        write_wav(np.zeros((2, 1), dtype=np.float64), 8000, bits=16)
    with pytest.raises(WavError, match="float WAVE requires"):
        write_wav(np.zeros((2, 1), dtype=np.float32), 8000, bits=16, fmt="float")


def test_spark_audio_roundtrip_stats(spark):
    from aira_spark.operators.multimodal import _wav_synth, audio_roundtrip_stats

    keys = spark.range(0, 12).selectExpr("id AS k")
    rows = {r["audio_id"]: r for r in audio_roundtrip_stats(keys).collect()}
    assert len(rows) == 12
    for k in range(12):
        r = rows[f"wav{k:08d}"]
        src, rate, bits = _wav_synth(k)
        assert r["exact_ok"] == 1
        assert (r["n_samples"], r["n_channels"]) == src.shape
        assert (r["sample_rate"], r["bits"]) == (rate, bits)
        assert r["sum_val"] == int(src.sum())
        s0 = src[:, 0] >= 0
        assert r["zcross"] == int(np.count_nonzero(s0[1:] != s0[:-1]))
        assert r["max_abs"] == int(np.abs(src).max())
