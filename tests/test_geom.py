"""Polygon metrics tests: hand-computed shoelace/centroid/perimeter on
known shapes, orientation, translation invariance, concave rings."""

from __future__ import annotations

from aira_spark.operators.geom import polygon_metrics


def _polys(spark, rows):
    # rows: [(poly_id, [(x, y), ...closed ring...])]
    data = [
        (pid, [{"x": float(x), "y": float(y)} for x, y in ring])
        for pid, ring in rows
    ]
    return spark.createDataFrame(
        data, "poly_id string, ring array<struct<x double, y double>>"
    )


def _get(spark, ring):
    df = polygon_metrics(_polys(spark, [("p", ring)]))
    r = df.collect()[0]
    return {k: r[k] for k in df.columns}


def test_unit_square_ccw(spark):
    sq = [(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]
    m = _get(spark, sq)
    # area = 1 deg^2 -> 2A in 1e-8 units = 2 * 1e8
    assert m["area2_e8"] == 2 * 10**8
    assert m["ccw"] == 1
    assert m["n_edges"] == 4
    # centroid (0.5, 0.5) -> 5000 in 1e-4 units
    assert (m["cx_e4"], m["cy_e4"]) == (5000, 5000)
    # perimeter 4.0 -> per-edge floor(sqrt((1e4)^2)) = 1e4, x4
    assert m["perim_e4"] == 4 * 10**4


def test_clockwise_square_flags_negative_area_same_centroid(spark):
    sq = [(0, 0), (0, 1), (1, 1), (1, 0), (0, 0)]
    m = _get(spark, sq)
    assert m["area2_e8"] == -2 * 10**8
    assert m["ccw"] == 0
    assert (m["cx_e4"], m["cy_e4"]) == (5000, 5000)


def test_translation_far_from_origin(spark):
    # same square at (120.5, -45.25): area/perimeter identical, centroid
    # shifts exactly — the translate-by-first-vertex keeps ints small
    sq = [(120.5, -45.25), (121.5, -45.25), (121.5, -44.25),
          (120.5, -44.25), (120.5, -45.25)]
    m = _get(spark, sq)
    assert m["area2_e8"] == 2 * 10**8
    assert (m["cx_e4"], m["cy_e4"]) == (1210000, -447500)
    assert m["perim_e4"] == 4 * 10**4


def test_right_triangle(spark):
    tri = [(0, 0), (2, 0), (0, 2), (0, 0)]
    m = _get(spark, tri)
    assert m["area2_e8"] == 4 * 10**8  # 2A, A = 2
    # centroid (2/3, 2/3) -> floor(6666.66) = 6666
    assert (m["cx_e4"], m["cy_e4"]) == (6666, 6666)
    # perimeter 2 + 2 + 2*sqrt(2): hyp edge floor(sqrt(2*(2e4)^2)) = 28284
    assert m["perim_e4"] == 20000 + 28284 + 20000


def test_concave_l_shape(spark):
    # L-shape: 2x2 square minus 1x1 corner -> area 3
    ring = [(0, 0), (2, 0), (2, 1), (1, 1), (1, 2), (0, 2), (0, 0)]
    m = _get(spark, ring)
    assert m["area2_e8"] == 6 * 10**8
    assert m["n_edges"] == 6
    # centroid of L = ((sum of piece moments)/area): pieces 2x1 at
    # (1, 0.5) and 1x1 at (0.5, 1.5) -> ((2*1 + 1*0.5)/3, (2*0.5 + 1*1.5)/3)
    # = (2.5/3, 2.5/3) = 0.8333...
    assert (m["cx_e4"], m["cy_e4"]) == (8333, 8333)
