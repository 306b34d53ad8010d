"""TIFF core decode tests.

Layer 1-3 of the reference's test strategy (SURVEY.md §5): golden vectors from
the reference's inline tests, plus the 4 checked-in fixture images at
/root/reference/crates/aira-tiff/tests/images/ with the exact assertions of
tests/decode_metadata.rs and tests/decompress.rs.
"""

from __future__ import annotations

import numpy as np
import pytest

from aira_spark.tiff import (
    TiffError,
    chunk_grid,
    decode_chunk,
    decode_metadata,
    decompress,
    packbits,
    read_header,
    undo_float_predictor,
    undo_int_predictor,
    unpackbits,
    walk_directories,
)
from aira_spark.tiff import tags as T

FIXTURES = "/root/reference/crates/aira-tiff/tests/images"


def load(name: str) -> bytes:
    with open(f"{FIXTURES}/{name}", "rb") as f:
        return f.read()


# ---- header handshake (decoder.rs:516-547) ----


def test_header_classic_le():
    bo, ver, off = read_header(b"II\x2a\x00\x08\x00\x00\x00")
    assert (bo, ver, off) == ("<", 42, 8)


def test_header_classic_be():
    bo, ver, off = read_header(b"MM\x00\x2a\x00\x00\x00\x08")
    assert (bo, ver, off) == (">", 42, 8)


def test_header_bigtiff_le():
    buf = b"II\x2b\x00\x08\x00\x00\x00\x10\x00\x00\x00\x00\x00\x00\x00"
    bo, ver, off = read_header(buf)
    assert (bo, ver, off) == ("<", 43, 16)


def test_header_bigtiff_be():
    buf = b"MM\x00\x2b\x00\x08\x00\x00\x00\x00\x00\x00\x00\x00\x00\x10"
    bo, ver, off = read_header(buf)
    assert (bo, ver, off) == (">", 43, 16)


def test_header_bad_signature():
    with pytest.raises(TiffError):
        read_header(b"XX\x2a\x00\x08\x00\x00\x00")


def test_header_bad_bigtiff_offsetsize():
    with pytest.raises(TiffError):
        read_header(b"II\x2b\x00\x04\x00\x00\x00\x10\x00\x00\x00\x00\x00\x00\x00")


# ---- PackBits golden vector from the Apple spec (packbits.rs:116-117) ----

PACKED = b"\xFE\xAA\x02\x80\x00\x2A\xFD\xAA\x03\x80\x00\x2A\x22\xF7\xAA"
UNPACKED = (
    b"\xAA\xAA\xAA\x80\x00\x2A\xAA\xAA\xAA\xAA\x80\x00\x2A\x22"
    b"\xAA\xAA\xAA\xAA\xAA\xAA\xAA\xAA\xAA\xAA"
)


def test_packbits_golden():
    assert unpackbits(PACKED) == UNPACKED


def test_packbits_roundtrip():
    rng = np.random.default_rng(42)
    for _ in range(20):
        n = int(rng.integers(0, 2000))
        # runs + noise to exercise both branches
        data = rng.choice([0, 1, 7, 255], size=n, p=[0.4, 0.3, 0.2, 0.1]).astype(np.uint8)
        raw = data.tobytes()
        assert unpackbits(packbits(raw)) == raw


def test_packbits_noop_and_eof_tolerance():
    assert unpackbits(b"\x80\x80\x00\x41") == b"A"
    # truncated repeat header: EOF-tolerant, returns what was produced
    assert unpackbits(b"\x00\x41\xfe") == b"A"


# ---- integer predictor staircases (predictor/int.rs:264-416) ----


@pytest.mark.parametrize("samples", [1, 2, 3, 4, 8])
@pytest.mark.parametrize("kind,bo", [("u1", "<"), ("u2", "<"), ("u2", ">"),
                                     ("u4", "<"), ("u4", ">"), ("u8", "<"), ("u8", ">")])
def test_int_predictor_staircase(samples, kind, bo):
    dtype = np.dtype(kind)
    ncols = 16
    ones = np.ones((1, ncols, samples), dtype=dtype)
    raw = ones.astype(dtype.newbyteorder(bo)).tobytes()
    out = undo_int_predictor(raw, bo, ncols, samples, dtype)
    expected = np.repeat(np.arange(1, ncols + 1, dtype=dtype), samples).reshape(1, -1)
    assert out.dtype == dtype
    np.testing.assert_array_equal(out, expected)


def test_int_predictor_wrapping():
    # u8 values wrap modulo 256
    row = np.array([[200, 100, 100]], dtype=np.uint8)
    out = undo_int_predictor(row.tobytes(), "<", 3, 1, np.dtype("u1"))
    np.testing.assert_array_equal(out, [[200, 44, 144]])


def test_int_predictor_signed():
    row = np.array([[-5, 1, 1, -2]], dtype=np.int8)
    out = undo_int_predictor(row.tobytes(), "<", 4, 1, np.dtype("i1"))
    np.testing.assert_array_equal(out, [[-5, -4, -3, -5]])


# ---- float predictor bit-exact golden rows (predictor/float.rs:114-141) ----


def test_float_predictor_f32_golden():
    row = bytes([0x3F, 0x01, 0x00, 0x00, 0x40, 0x80, 0x40, 0x40,
                 0x80, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00])
    out = undo_float_predictor(row, 4, 1, 4)
    np.testing.assert_array_equal(out, np.array([[1.0, 2.0, 3.0, 4.0]], dtype=np.float32))


def test_float_predictor_f64_golden():
    row = bytes([0x3F, 0x01, 0x00, 0x00, 0xB0, 0x10, 0x08, 0x08,
                 0xF0, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
                 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
                 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00])
    out = undo_float_predictor(row, 4, 1, 8)
    np.testing.assert_array_equal(out, np.array([[1.0, 2.0, 3.0, 4.0]], dtype=np.float64))


# ---- fixture: tiled-rect-rgb-u8.tif metadata golden (decode_metadata.rs:12-59) ----


def test_fixture_tiled_rect_metadata():
    buf = load("tiled-rect-rgb-u8.tif")
    bo, ver, dirs = walk_directories(buf)
    assert len(dirs) == 1  # tests/utils.rs:4-14: exactly one directory
    m = decode_metadata(buf)
    assert (m["width"], m["height"]) == (490, 367)
    assert m["interpretation"] == T.INTERP_RGB
    assert m["layout_kind"] == "tiles"
    assert (m["chunk_w"], m["chunk_h"]) == (32, 128)
    assert m["compression"] == T.COMPRESSION_NONE
    assert m["subfile_type"] == 0
    assert m["planar"] == T.PLANAR_CHUNKY
    assert m["resolution"] == {"x_num": 314, "x_den": 1, "y_num": 314, "y_den": 1,
                               "unit": T.RESUNIT_INCH}
    assert m["spp"] == 3
    assert m["bits"] == [8, 8, 8]
    assert m["formats"] == [T.SAMPLE_UNSIGNED] * 3
    for key in ("artist", "copyright", "host_computer", "description", "software", "datetime"):
        assert m[key] is None
    assert len(m["offsets"]) == 48
    chunks = chunk_grid(m)
    assert len(chunks) == 48
    # every chunk readable within the file
    for c in chunks:
        assert c["offset"] + c["nbytes"] <= len(buf)
    # edge-chunk clipping: last column/row tiles are clipped
    nx = -(-490 // 32)  # 16
    last = chunks[-1]
    assert last["size_x"] == 490 - (nx - 1) * 32
    assert last["size_y"] == 367 - 2 * 128
    # all chunks decode to the expected shapes
    for c in chunks:
        px = decode_chunk(buf[c["offset"]:c["offset"] + c["nbytes"]], m,
                          c["chunk_idx"], c["size_x"], c["size_y"])
        assert px.shape == (c["size_y"], c["size_x"], 3)
        assert px.dtype == np.uint8


# ---- fixture: minisblack-2c-8b-alpha.tiff (PackBits, planar quirk) ----


def test_fixture_planar_packbits():
    buf = load("minisblack-2c-8b-alpha.tiff")
    m = decode_metadata(buf)
    assert m["compression"] == T.COMPRESSION_PACKBITS
    assert (m["width"], m["height"]) == (64, 64)
    assert m["planar"] == T.PLANAR_PLANAR
    assert m["spp"] == 2
    assert m["expected_chunks"] == 1
    assert len(m["offsets"]) == 2  # one chunk set per plane (metadata.rs:661-667)
    chunks = chunk_grid(m)
    # planar overflow chunk clips to zero height (SURVEY.md §1.1.4)
    assert chunks[0]["size_y"] == 64
    assert chunks[1]["origin_y"] == 64
    assert chunks[1]["size_y"] == 0
    # both chunks decompress (decompress.rs:33-43)
    for c in chunks:
        raw = decompress(buf[c["offset"]:c["offset"] + c["nbytes"]], m["compression"])
        assert len(raw) == 64 * 64  # one full 64x64 plane each
    # decode plane pixels: chunk 0 is plane 0 with sy=64
    px = decode_chunk(buf[chunks[0]["offset"]:chunks[0]["offset"] + chunks[0]["nbytes"]],
                      m, 0, 64, 64)
    assert px.shape == (64, 64, 1)


# ---- fixture: random-fp16.tiff (Deflate, half float) ----


def test_fixture_deflate_fp16():
    buf = load("random-fp16.tiff")
    m = decode_metadata(buf)
    assert m["compression"] == T.COMPRESSION_DEFLATE
    assert (m["width"], m["height"]) == (16, 16)
    assert m["formats"] == [T.SAMPLE_FLOAT]
    assert m["bits"] == [16]
    chunks = chunk_grid(m)
    assert len(chunks) == 1
    c = chunks[0]
    px = decode_chunk(buf[c["offset"]:c["offset"] + c["nbytes"]], m, 0,
                      c["size_x"], c["size_y"])
    assert px.shape == (16, 16, 1)
    assert px.dtype == np.float16


# ---- fixture: logluv-3c-16b.tiff (structure walk only; SGILOG unsupported) ----


def test_fixture_logluv_structure_only():
    buf = load("logluv-3c-16b.tiff")
    m = decode_metadata(buf)
    assert m["compression"] == 34676
    assert (m["width"], m["height"]) == (1, 1)
    assert m["formats"] == [T.SAMPLE_SIGNED] * 3
    c = chunk_grid(m)[0]
    with pytest.raises(TiffError, match="Unsupported compression"):
        decode_chunk(buf[c["offset"]:c["offset"] + c["nbytes"]], m, 0, 1, 1)


# ---- error paths ----


def test_missing_required_tags():
    from aira_spark.tiff import write_tiff
    buf = bytearray(write_tiff(np.zeros((4, 4), dtype=np.uint8), layout=("strips", 4)))
    # cycle detection: point next-IFD at the first IFD
    # (classic header: first IFD offset at byte 4)
    import numpy as _np
    first = int(_np.frombuffer(bytes(buf), dtype="<u4", count=1, offset=4)[0])
    # find the next-IFD pointer: count(2) + n*12 after first
    n = int(_np.frombuffer(bytes(buf), dtype="<u2", count=1, offset=first)[0])
    nxt = first + 2 + 12 * n
    buf[nxt:nxt + 4] = _np.asarray([first], dtype="<u4").tobytes()
    with pytest.raises(TiffError, match="cycle"):
        walk_directories(bytes(buf))


def test_ratio_exact_ordering():
    """Exact rational ordering (ratio.rs:26-76 semantics): overflow-free,
    correct where float division collapses, negative-denominator aware."""
    from functools import cmp_to_key

    from aira_spark.tiff.meta import ratio_cmp

    # python divmod matches the reference's div_mod_floor table (ratio.rs:146-158)
    assert divmod(8, 3) == (2, 2)
    assert divmod(8, -3) == (-3, -1)
    assert divmod(-8, 3) == (-3, 1)
    assert divmod(-8, -3) == (2, -2)

    assert ratio_cmp((1, 2), (2, 4)) == 0
    assert ratio_cmp((1, 3), (1, 2)) == -1
    assert ratio_cmp((-1, 3), (-1, 2)) == 1  # -1/3 > -1/2
    # reference QUIRK preserved (ratio.rs:36-47): the equal-numerator
    # shortcut compares denominators reversed for positive numerators even
    # when the signs differ, so (1,-2) sorts ABOVE (1,2) — mathematically
    # -0.5 < 0.5, but fidelity to the reference's Ord wins (TIFF RATIONAL is
    # unsigned; mixed-sign dens only arise for SRATIONAL edge inputs)
    assert ratio_cmp((1, -2), (1, 2)) == 1
    assert ratio_cmp((-3, -4), (1, 2)) == 1  # 0.75 > 0.5
    assert ratio_cmp((0, 5), (0, -7)) == 0
    # floats cannot tell these apart; the exact comparison can:
    big = 10**18
    assert (big + 1) / big == (big + 2) / (big + 1)  # float collapses
    assert ratio_cmp((big + 1, big), (big + 2, big + 1)) == 1
    # sorting with the comparator is consistent
    vals = [(3, 4), (-1, 2), (2, 3), (5, -7), (0, 1), (7, 7)]
    ordered = sorted(vals, key=cmp_to_key(ratio_cmp))
    as_floats = [n / d for n, d in ordered]
    assert as_floats == sorted(as_floats)
    # equal denominators INCLUDING zero: numerator comparison, no error
    # (ratio.rs:28-35 — the reference only divides when denominators differ)
    assert ratio_cmp((1, 0), (2, 0)) == -1
    assert ratio_cmp((5, 0), (5, 0)) == 0
    # unequal num AND den with a zero denominator still raises — the
    # reference reaches div_mod_floor there, which panics on zero
    with pytest.raises(ZeroDivisionError):
        ratio_cmp((1, 0), (2, 3))


def test_ratio_sort_key_matches_fractions(spark_maybe=None):
    """The SQL/Column exact-rational key (functions/ratiofns.py) orders every
    pair the way fractions.Fraction does — including the 10^18 float-collapse
    cases, negatives, sign-flipped denominators, and value-equal pairs — when
    evaluated by DuckDB over the same formulas Spark runs."""
    import random
    from fractions import Fraction

    import duckdb

    from aira_spark.functions.ratiofns import KEY_FIELDS, ratio_key_exprs

    rng = random.Random(20260817)
    cases = [
        (10**18 + 1, 10**18), (10**18 + 2, 10**18 + 1),  # doubles collapse
        (1, 2), (2, 4), (-1, 3), (-1, 2), (1, -2), (-3, -4),
        (7, 3), (-7, 3), (7, -3), (-7, -3), (0, 5), (0, -5),
        (2**63 - 1, 2**63 - 2), (-(2**63 - 1), 2**63 - 2),
    ]
    for _ in range(200):
        cases.append(
            (rng.randint(-(2**62), 2**62), rng.randint(1, 2**62) * rng.choice([-1, 1]))
        )
    e = ratio_key_exprs("n", "d", "duckdb")
    sel = ", ".join(f"{e[k]} AS {k}" for k in KEY_FIELDS)
    rows = ", ".join(f"({n}, {d})" for n, d in cases)
    keys = duckdb.sql(
        f"SELECT {sel} FROM (VALUES {rows}) AS t(n, d)"
    ).fetchall()
    for i, (a, ka) in enumerate(zip(cases, keys)):
        for b, kb in zip(cases[i + 1 :], keys[i + 1 :]):
            fa, fb = Fraction(*a), Fraction(*b)
            want = (fa > fb) - (fa < fb)
            got = (ka > kb) - (ka < kb)
            assert got == want, f"{a} vs {b}: key {got}, Fraction {want}"


def test_ratio_sort_key_spark_equals_duckdb(spark):
    """Spark DECIMAL(38,0) evaluation of the key equals DuckDB HUGEINT
    evaluation, component by component (exact-arithmetic parity)."""
    import duckdb

    from aira_spark.functions.ratiofns import KEY_FIELDS, ratio_key_exprs

    cases = [
        (10**18 + 1, 10**18), (10**18 + 2, 10**18 + 1),
        (-7, 3), (7, -3), (2**62 + 1, 2**62 - 1), (5, 0), (-5, 0), (0, 7),
    ]
    rows = ", ".join(f"({n}, {d})" for n, d in cases)
    es = ratio_key_exprs("n", "d", "spark")
    sels = ", ".join(f"CAST({es[k]} AS STRING) AS {k}" for k in KEY_FIELDS)
    got = spark.sql(f"SELECT {sels} FROM (VALUES {rows}) AS t(n, d)").collect()
    ed = ratio_key_exprs("n", "d", "duckdb")
    seld = ", ".join(f"CAST({ed[k]} AS VARCHAR) AS {k}" for k in KEY_FIELDS)
    want = duckdb.sql(f"SELECT {seld} FROM (VALUES {rows}) AS t(n, d)").fetchall()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
