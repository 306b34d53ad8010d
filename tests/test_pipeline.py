"""End-to-end Spark pipeline vs the serial library (SURVEY.md §7 step 3).

The Spark path (synthesize -> decode UDF -> chunk explode -> cell cover) must
produce row-identical output to the serial numpy path over the same images.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from aira_spark.functions.cells import (
    DEFAULT_RES,
    cell_from_xy,
    np_cell_from_xy,
    np_cover_rect,
)
from aira_spark.functions.udfs import VERIFY_SCHEMA, verify_batches
from aira_spark.operators.chunks import cell_cover, chunks_df, with_meta
from aira_spark.sources.images import derive_params, images_table, synthesize_row
from aira_spark.tiff.meta import chunk_grid, decode_metadata

N_IMAGES = 60  # keep the suite fast; spans all 12 variants 5x


@pytest.fixture(scope="module")
def images(spark, sf_dir):
    df = images_table(spark, sf_dir, limit=N_IMAGES).cache()
    df.count()
    return df


def serial_chunks(k: int) -> list[tuple]:
    _, buf, w, h, fmt, caption, phash = synthesize_row(k)
    m = decode_metadata(buf)
    return [
        (f"img{k:08d}", c["chunk_idx"], c["origin_x"], c["origin_y"],
         c["size_x"], c["size_y"], c["offset"], c["nbytes"])
        for c in chunk_grid(m)
    ]


def test_tile_assignments_match_serial(spark, images):
    got = (
        chunks_df(with_meta(images))
        .select("image_id", "chunk_idx", "origin_x", "origin_y",
                "size_x", "size_y", "offset", "nbytes")
        .collect()
    )
    got_set = {tuple(r) for r in got}
    expected = set()
    keys = [r.image_id for r in images.select("image_id").collect()]
    for iid in keys:
        expected.update(serial_chunks(int(iid.removeprefix("img"))))
    assert got_set == expected


def test_cell_cover_matches_serial(spark, images):
    got = (
        cell_cover(with_meta(images), DEFAULT_RES)
        .select("image_id", "cell")
        .collect()
    )
    got_set = {(r.image_id, r.cell) for r in got}
    expected = set()
    for r in images.select("image_id").collect():
        k = int(r.image_id.removeprefix("img"))
        p = derive_params(k)
        xmin, ymin = p["corner_x"], p["corner_y"]
        xmax = xmin + p["w"] * p["scale_x"]
        ymax = ymin + p["h"] * p["scale_y"]
        for c in np_cover_rect(xmin, ymin, xmax, ymax, DEFAULT_RES):
            expected.add((r.image_id, c))
    assert got_set == expected


def test_decode_invariants(spark, images):
    """North-rule per-row invariants: pixels match formula (allclose/PSNR>=40),
    captions byte-equal, phash witness matches."""
    res = images.mapInPandas(verify_batches, schema=VERIFY_SCHEMA).collect()
    assert len(res) == N_IMAGES
    bad = [r for r in res if not (r.caption_match and r.phash_match and r.pixels_psnr_ok)]
    assert bad == []


def test_spark_numpy_cell_parity(spark):
    """cell_from_xy Column expr == numpy form on a coordinate sweep."""
    rng = np.random.default_rng(7)
    xs = rng.uniform(-179.9, 179.9, 500)
    ys = rng.uniform(-89.9, 89.9, 500)
    pdf = spark.createDataFrame(
        [(float(x), float(y)) for x, y in zip(xs, ys)], "x double, y double"
    )
    got = [r.cell for r in pdf.select(cell_from_xy(F.col("x"), F.col("y")).alias("cell")).collect()]
    expected = np_cell_from_xy(xs, ys).tolist()
    assert got == expected


def test_dead_letter_rows(spark):
    """Corrupt bytes produce error rows, not exceptions (SURVEY.md S8/K3)."""
    from aira_spark.functions.udfs import decode_meta

    df = spark.createDataFrame(
        [("bad1", bytearray(b"XX~~~~")), ("bad2", bytearray(b"II\x2a\x00\xff\xff\xff\xff"))],
        "image_id string, bytes binary",
    ).withColumn("meta", decode_meta(F.col("bytes")))
    rows = df.select("image_id", "meta.error").collect()
    assert all(r.error for r in rows)
