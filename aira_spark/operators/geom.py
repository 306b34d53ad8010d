"""Polygon geometry metrics (ST_Area / ST_Centroid / ST_Perimeter parity)
in exact integer arithmetic.

The shoelace formula over vertices quantized to 1e-4 degrees makes the
signed doubled area an exact BIGINT; the polygon centroid is the exact
rational (sum (v_i + v_{i+1}) * cross_i) / (3 * 2A), emitted via the
shared nonneg-remainder floor division; the perimeter sums PER-EDGE
floor(sqrt) integers, so the aggregation order cannot change the result
(a double SUM of edge lengths would be order-sensitive).

Overflow budget (why the 1e-4 quantum): vertices are first translated by
the ring's FIRST vertex — integer subtraction, exact — so coordinates are
bounded by the ring diameter (~8 deg = 8e4 units); |cross| <= 2*(8e4)^2 =
1.3e10, the centroid numerator term <= 1.6e5 * 1.3e10 = 2e15, and 8 edges
stay 3 orders of magnitude inside int64. Unquantized micro-degree inputs
would overflow the centroid numerator.

Scale shape: one Generate (edge explode) + one hash aggregation per
polygon — partial-combined, no joins, no Python; rings never shuffle,
only the integer partials do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q = 10_000  # quantum: 1e-4 degree


def _fdiv(s: str, c: str) -> str:
    """Floor division for any-sign numerator, POSITIVE denominator —
    exact-divisibility adjustment (same device as kmeans/morph)."""
    num = f"(({s}) - ((({s}) % ({c})) + ({c})) % ({c}))"
    return f"({num} div ({c}))"


def polygon_metrics(polys: DataFrame) -> DataFrame:
    """(poly_id, n_edges, area2_e8, ccw, cx_e4, cy_e4, perim_e4) from a
    (poly_id, ring array<struct<x,y>>) frame with CLOSED rings (first
    vertex repeated last).

    - area2_e8: signed doubled shoelace area in 1e-8 deg^2 (CCW > 0)
    - cx_e4/cy_e4: centroid floor-quantized to 1e-4 deg
    - perim_e4: sum of per-edge floor(sqrt(len^2)) in 1e-4 deg units
    """
    edges = polys.selectExpr(
        "poly_id",
        # quantize ABSOLUTE coords first (one ROUND per vertex, identical
        # in both engines), then translate by the first vertex as integers
        "CAST(round(ring[0].x * 10000.0, 0) AS BIGINT) AS qx0",
        "CAST(round(ring[0].y * 10000.0, 0) AS BIGINT) AS qy0",
        "explode(transform(sequence(0, size(ring) - 2), i -> named_struct("
        " 'ax', CAST(round(ring[i].x * 10000.0, 0) AS BIGINT),"
        " 'ay', CAST(round(ring[i].y * 10000.0, 0) AS BIGINT),"
        " 'bx', CAST(round(ring[i + 1].x * 10000.0, 0) AS BIGINT),"
        " 'by', CAST(round(ring[i + 1].y * 10000.0, 0) AS BIGINT)))) AS e",
    ).selectExpr(
        "poly_id", "qx0", "qy0",
        "e.ax - qx0 AS ax", "e.ay - qy0 AS ay",
        "e.bx - qx0 AS bx", "e.by - qy0 AS by",
    )
    per_edge = edges.selectExpr(
        "poly_id", "qx0", "qy0",
        "ax * by - bx * ay AS cross",
        "(ax + bx) * (ax * by - bx * ay) AS cxn",
        "(ay + by) * (ax * by - bx * ay) AS cyn",
        "CAST(floor(sqrt(CAST((bx - ax) * (bx - ax) + (by - ay) * (by - ay)"
        " AS DOUBLE))) AS BIGINT) AS elen",
    )
    agg = per_edge.groupBy("poly_id", "qx0", "qy0").agg(
        F.count("*").cast("long").alias("n_edges"),
        F.sum("cross").cast("long").alias("area2"),
        F.sum("cxn").cast("long").alias("cxn"),
        F.sum("cyn").cast("long").alias("cyn"),
        F.sum("elen").cast("long").alias("perim_e4"),
    )
    sgn = "CASE WHEN area2 < 0 THEN -1 ELSE 1 END"
    return agg.selectExpr(
        "poly_id",
        "n_edges",
        "area2 AS area2_e8",
        "CAST(CASE WHEN area2 > 0 THEN 1 ELSE 0 END AS BIGINT) AS ccw",
        f"{_fdiv(f'cxn * ({sgn})', f'3 * area2 * ({sgn})')} + qx0 AS cx_e4",
        f"{_fdiv(f'cyn * ({sgn})', f'3 * area2 * ({sgn})')} + qy0 AS cy_e4",
        "perim_e4",
    )


def oracle_polygon_metrics_sql(key: str = "n_nationkey", table: str = "nation") -> str:
    """DuckDB mirror over the polygon EDGE formulas (the independent edge
    construction of sources/vectors.polygon_edges_oracle_sql), same
    quantize-translate-shoelace arithmetic."""
    from ..sources.vectors import DIRS, poly_cx_sql, poly_cy_sql, poly_rv_sql

    def vx(t: int) -> str:
        return f"{poly_cx_sql(key)} + {poly_rv_sql(key, t)} * {DIRS[t][0]!r}"

    def vy(t: int) -> str:
        return f"{poly_cy_sql(key)} + {poly_rv_sql(key, t)} * {DIRS[t][1]!r}"

    edge_rows = " UNION ALL ".join(
        f"SELECT 'poly' || CAST({key} AS VARCHAR) AS poly_id, "
        f"CAST(round(({vx(t)}) * 10000.0) AS BIGINT) AS qax, "
        f"CAST(round(({vy(t)}) * 10000.0) AS BIGINT) AS qay, "
        f"CAST(round(({vx((t + 1) % 8)}) * 10000.0) AS BIGINT) AS qbx, "
        f"CAST(round(({vy((t + 1) % 8)}) * 10000.0) AS BIGINT) AS qby, "
        f"CAST(round(({vx(0)}) * 10000.0) AS BIGINT) AS qx0, "
        f"CAST(round(({vy(0)}) * 10000.0) AS BIGINT) AS qy0 FROM {table}"
        for t in range(8)
    )
    fdiv_x = "((cxn * s) - (((cxn * s) % den) + den) % den) // den"
    fdiv_y = "((cyn * s) - (((cyn * s) % den) + den) % den) // den"
    return f"""
WITH e AS ({edge_rows}),
t AS (
  SELECT poly_id, qx0, qy0,
         qax - qx0 AS ax, qay - qy0 AS ay,
         qbx - qx0 AS bx, qby - qy0 AS by
  FROM e
),
pe AS (
  SELECT poly_id, qx0, qy0,
    ax * by - bx * ay AS cr,
    (ax + bx) * (ax * by - bx * ay) AS cxn,
    (ay + by) * (ax * by - bx * ay) AS cyn,
    CAST(floor(sqrt(CAST((bx - ax) * (bx - ax) + (by - ay) * (by - ay)
      AS DOUBLE))) AS BIGINT) AS elen
  FROM t
),
agg AS (
  SELECT poly_id, qx0, qy0,
    CAST(COUNT(*) AS BIGINT) AS n_edges,
    CAST(SUM(cr) AS BIGINT) AS area2,
    CAST(SUM(cxn) AS BIGINT) AS cxn,
    CAST(SUM(cyn) AS BIGINT) AS cyn,
    CAST(SUM(elen) AS BIGINT) AS perim_e4
  FROM pe GROUP BY 1, 2, 3
)
SELECT poly_id, n_edges, area2 AS area2_e8,
  CAST(CASE WHEN area2 > 0 THEN 1 ELSE 0 END AS BIGINT) AS ccw,
  CAST({fdiv_x} + qx0 AS BIGINT) AS cx_e4,
  CAST({fdiv_y} + qy0 AS BIGINT) AS cy_e4,
  perim_e4
FROM (
  SELECT *, CASE WHEN area2 < 0 THEN -1 ELSE 1 END AS s,
         3 * area2 * (CASE WHEN area2 < 0 THEN -1 ELSE 1 END) AS den
  FROM agg
)
"""
