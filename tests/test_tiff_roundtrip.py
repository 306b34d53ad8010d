"""Encoder/decoder round-trip over the full generation matrix (FIXTURES.md §1)."""

from __future__ import annotations

import numpy as np
import pytest

from aira_spark.tiff import (
    decode_chunk,
    decode_metadata,
    write_tiff,
)
from aira_spark.tiff.meta import pixel_chunks
from aira_spark.tiff import tags as T


def make_pixels(rng: np.random.Generator, h: int, w: int, spp: int, dtype) -> np.ndarray:
    dt = np.dtype(dtype)
    if dt.kind == "f":
        return rng.standard_normal((h, w, spp)).astype(dt)
    info = np.iinfo(dt)
    return rng.integers(info.min, int(info.max) + 1, size=(h, w, spp)).astype(dt)


def reassemble(buf: bytes, m: dict) -> np.ndarray:
    """Stitch decoded chunks back into the full (h, w, spp) image."""
    h, w, spp = m["height"], m["width"], m["spp"]
    planar = m["planar"] == T.PLANAR_PLANAR
    kind = {T.SAMPLE_UNSIGNED: "u", T.SAMPLE_SIGNED: "i", T.SAMPLE_FLOAT: "f"}[m["formats"][0]]
    dt = np.dtype(f"{kind}{m['bits'][0] // 8}")
    out = np.zeros((h, w, spp), dtype=dt)
    for c in pixel_chunks(m):
        px = decode_chunk(buf[c["offset"]:c["offset"] + c["nbytes"]], m,
                          c["chunk_idx"], c["size_x"], c["size_y"])
        oy, ox = c["origin_y"], c["origin_x"]
        if planar:
            plane = c["plane"]
            out[oy:oy + c["size_y"], ox:ox + c["size_x"], plane:plane + 1] = px
        else:
            out[oy:oy + c["size_y"], ox:ox + c["size_x"], :] = px
    return out


MATRIX = [
    # (byteorder, layout, compression, predictor, planar, dtype, spp, h, w, big)
    ("<", ("strips", 5), T.COMPRESSION_NONE, T.PREDICTOR_NONE, 1, "u1", 1, 13, 17, False),
    (">", ("strips", 8), T.COMPRESSION_NONE, T.PREDICTOR_NONE, 1, "u1", 3, 16, 16, False),
    ("<", ("tiles", 8, 8), T.COMPRESSION_NONE, T.PREDICTOR_NONE, 1, "u1", 3, 13, 21, False),
    ("<", ("tiles", 16, 16), T.COMPRESSION_PACKBITS, T.PREDICTOR_NONE, 1, "u1", 1, 33, 47, False),
    (">", ("strips", 4), T.COMPRESSION_PACKBITS, T.PREDICTOR_HORIZONTAL, 1, "u1", 3, 12, 10, False),
    ("<", ("strips", 7), T.COMPRESSION_DEFLATE, T.PREDICTOR_HORIZONTAL, 1, "u2", 1, 21, 9, False),
    (">", ("tiles", 8, 4), T.COMPRESSION_DEFLATE, T.PREDICTOR_HORIZONTAL, 1, "u2", 2, 10, 18, False),
    ("<", ("strips", 6), T.COMPRESSION_LEGACY_DEFLATE, T.PREDICTOR_NONE, 1, "i2", 1, 11, 7, False),
    ("<", ("strips", 16), T.COMPRESSION_DEFLATE, T.PREDICTOR_FLOAT, 1, "f4", 1, 16, 12, False),
    (">", ("tiles", 8, 8), T.COMPRESSION_DEFLATE, T.PREDICTOR_FLOAT, 1, "f4", 3, 9, 11, False),
    ("<", ("strips", 4), T.COMPRESSION_NONE, T.PREDICTOR_FLOAT, 1, "f8", 1, 8, 6, False),
    ("<", ("strips", 64), T.COMPRESSION_PACKBITS, T.PREDICTOR_NONE, 2, "u1", 2, 64, 64, False),
    (">", ("tiles", 8, 8), T.COMPRESSION_DEFLATE, T.PREDICTOR_HORIZONTAL, 2, "u1", 3, 17, 9, False),
    ("<", ("strips", 32), T.COMPRESSION_NONE, T.PREDICTOR_NONE, 1, "u1", 1, 64, 64, True),
    (">", ("tiles", 16, 16), T.COMPRESSION_DEFLATE, T.PREDICTOR_HORIZONTAL, 1, "u2", 1, 30, 30, True),
    ("<", ("strips", 3), T.COMPRESSION_NONE, T.PREDICTOR_NONE, 1, "f2", 1, 7, 5, False),
    ("<", ("strips", 9), T.COMPRESSION_DEFLATE, T.PREDICTOR_HORIZONTAL, 1, "u4", 1, 18, 4, False),
]


@pytest.mark.parametrize("bo,layout,comp,pred,planar,dtype,spp,h,w,big", MATRIX)
def test_roundtrip(bo, layout, comp, pred, planar, dtype, spp, h, w, big):
    rng = np.random.default_rng(hash((bo, comp, pred, planar, dtype, spp, h, w)) % 2**32)
    px = make_pixels(rng, h, w, spp, dtype)
    buf = write_tiff(px, byteorder=bo, layout=layout, compression=comp,
                     predictor=pred, planar=planar, big=big,
                     geo=((0.25, 0.125, 0.0), (0.0, 0.0, 0.0, 10.5, 20.25, 0.0)),
                     description="cap", resolution=(300, 1, 300, 1, T.RESUNIT_INCH))
    m = decode_metadata(buf)
    assert (m["width"], m["height"]) == (w, h)
    assert m["compression"] == comp
    assert m["predictor"] == pred
    assert m["planar"] == planar
    assert m["spp"] == spp
    assert m["description"] == "cap"
    # GeoTIFF tags land in custom entries
    assert T.MODEL_PIXEL_SCALE in m["custom"]
    assert T.MODEL_TIEPOINT in m["custom"]
    got = reassemble(buf, m)
    np.testing.assert_array_equal(got, px)


def test_geotransform_entry_values():
    from aira_spark.tiff import entry_value
    px = np.zeros((4, 4), dtype=np.uint8)
    buf = write_tiff(px, layout=("strips", 4),
                     geo=((0.5, 0.25, 0.0), (0.0, 0.0, 0.0, -10.0, 42.0, 0.0)))
    m = decode_metadata(buf)
    d, c, raw = m["custom"][T.MODEL_PIXEL_SCALE]
    assert entry_value(d, c, raw, m["byteorder"]) == [0.5, 0.25, 0.0]
    d, c, raw = m["custom"][T.MODEL_TIEPOINT]
    assert entry_value(d, c, raw, m["byteorder"]) == [0.0, 0.0, 0.0, -10.0, 42.0, 0.0]


def test_multipage_concat_roundtrip():
    """concat_tiff_pages: chained IFDs decode page-by-page to the originals,
    including shifted external values and chunk offsets."""
    import numpy as np

    from aira_spark.tiff import tags as T
    from aira_spark.tiff.encode import concat_tiff_pages, write_tiff
    from aira_spark.tiff.meta import decode_all_pages, pixel_chunks
    from aira_spark.tiff.pixels import decode_chunk

    pages_px = [
        np.arange(20 * 30, dtype=np.uint8).reshape(20, 30) % 251,
        (np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3) * 7) % 253,
    ]
    bufs = [
        write_tiff(pages_px[0], layout=("strips", 8),
                   compression=T.COMPRESSION_PACKBITS, description="page zero"),
        write_tiff(pages_px[1], layout=("tiles", 16, 16),
                   compression=T.COMPRESSION_DEFLATE,
                   predictor=T.PREDICTOR_HORIZONTAL, description="page one"),
    ]
    multi = concat_tiff_pages(bufs)
    metas = decode_all_pages(multi)
    assert len(metas) == 2
    assert (metas[0]["width"], metas[0]["height"]) == (30, 20)
    assert (metas[1]["width"], metas[1]["height"]) == (16, 16)
    assert metas[0]["description"] == "page zero"
    assert metas[1]["description"] == "page one"
    for pg, m in enumerate(metas):
        px = pages_px[pg]
        if px.ndim == 2:
            px = px[:, :, None]
        got = np.zeros_like(px)
        for c in pixel_chunks(m):
            if c["size_x"] == 0 or c["size_y"] == 0:
                continue
            part = decode_chunk(
                multi[c["offset"] : c["offset"] + c["nbytes"]], m, c["chunk_idx"],
                c["size_x"], c["size_y"],
            )
            got[c["origin_y"] : c["origin_y"] + c["size_y"],
                c["origin_x"] : c["origin_x"] + c["size_x"], :] = part
        assert np.array_equal(got, px), f"page {pg} pixels differ"


def test_multipage_spark_posexplode(spark):
    """with_meta_pages: one row per page; ifd_entries sees both directories."""
    import numpy as np

    from aira_spark.operators.chunks import with_meta_pages
    from aira_spark.operators.tiffdump import ifd_entries
    from aira_spark.tiff.encode import concat_tiff_pages, write_tiff

    multi = concat_tiff_pages(
        [
            write_tiff(np.zeros((8, 8), dtype=np.uint8), layout=("strips", 8)),
            write_tiff(np.ones((12, 4), dtype=np.uint8), layout=("strips", 4)),
        ]
    )
    df = spark.createDataFrame([("m1", bytearray(multi))], "image_id string, bytes binary")
    rows = with_meta_pages(df).select("page", "meta.width", "meta.height").collect()
    assert [(r.page, r.width, r.height) for r in rows] == [(0, 8, 8), (1, 4, 12)]
    pages = {r.page for r in ifd_entries(df).collect()}
    assert pages == {0, 1}


def test_geokey_directory_roundtrip():
    """GeoKeyDirectory + GeoAsciiParams encode -> parse (both endians)."""
    import numpy as np

    from aira_spark.tiff.encode import write_tiff
    from aira_spark.tiff.meta import decode_metadata, parse_geokeys

    px = np.arange(16 * 16, dtype=np.uint8).reshape(16, 16)
    geo = ((0.1, 0.1, 0.0), (0.0, 0.0, 0.0, 10.0, 20.0, 0.0))
    for bo in ("<", ">"):
        buf = write_tiff(px, byteorder=bo, geo=geo, crs=32633)
        gk = parse_geokeys(decode_metadata(buf))
        assert gk == {
            "model_type": 2, "raster_type": 1, "epsg": 32633,
            "citation": "EPSG:32633",
        }
    # crs=None omits the keys; no geo means no keys either
    assert parse_geokeys(decode_metadata(write_tiff(px, geo=geo, crs=None))) is None
    assert parse_geokeys(decode_metadata(write_tiff(px))) is None
