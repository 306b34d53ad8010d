"""Nearest polygon-edge distance (ST_Distance point-to-boundary parity)
— for every point, the closest boundary SEGMENT of any zone polygon and
its exact squared distance: the "how far from the district line /
coastline / road edge" primitive that pip (inside?) and proximity
(raster chamfer) do not answer in vector space.

Exactness: coordinates quantize to 1e-4-degree integers with the shared
round() text (the hull/geom Q convention), then the clamped
point-segment distance is exact case-by-case integer arithmetic:

    dot = (p-a).e  <= 0      ->  d2 = |p-a|^2            (clamp to a)
    dot >= e2 = |e|^2        ->  d2 = |p-b|^2            (clamp to b)
    else                     ->  d2 = cross^2 DIV e2     (perpendicular)

with cross = e x (p-a); cross^2 needs 128 bits (DECIMAL(38,0)/HUGEINT —
the lisa widening) and the single floor division quantizes the
perpendicular case to 1 q^2 (~1e-8 deg^2), deterministically in both
engines. Degenerate zero-length edges fall to the clamp-to-a case. The
per-point argmin is the two-stage exact device (MIN d2q, then MIN edge
key among ties — the obb rule, no giant encoded keys).

Scale shape (100 TB): the edge side is a BOUNDED dim (zones x 8
segments) — it broadcasts; the points x E candidate rows fold map-side
straight into the per-point argmin, then one id-only tie join; points
never shuffle at full width. For unbroadcastable edge sets the
escalation is the cell-cover prefilter (operators/spatial.py),
deliberately not duplicated here."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q = 10_000

_D2Q = (
    "CASE WHEN dot <= 0 OR e2 = 0 THEN (px - ax) * (px - ax)"
    " + (py - ay) * (py - ay) "
    "WHEN dot >= e2 THEN (px - bx) * (px - bx) + (py - by) * (py - by) "
    "ELSE CAST((CAST(crs AS DECIMAL(38,0)) * crs) DIV e2 AS BIGINT)"
    " END"
)
_D2Q_DUCK = _D2Q.replace(
    "CAST((CAST(crs AS DECIMAL(38,0)) * crs) DIV e2 AS BIGINT)",
    "CAST(CAST(crs AS HUGEINT) * crs // e2 AS BIGINT)",
)


def nearest_edge(points: DataFrame, edges: DataFrame) -> DataFrame:
    """(point_id, poly_key, edge_t, d2q) — the nearest boundary segment
    per point. `points` carries (point_id, x, y) in degrees; `edges`
    carries (pkey bigint, et bigint, ax, ay, bx, by) in degrees."""
    sc = points.sparkSession.sparkContext
    qp = points.selectExpr(
        "point_id",
        f"CAST(round(x * {Q}.0, 0) AS BIGINT) AS px",
        f"CAST(round(y * {Q}.0, 0) AS BIGINT) AS py",
    ).repartition(sc.defaultParallelism)  # the dim parquet arrives as 1
    # split and a cross join inherits it — spread BEFORE the x E blowup
    qe = edges.selectExpr(
        "pkey", "et",
        f"CAST(round(ax * {Q}.0, 0) AS BIGINT) AS ax",
        f"CAST(round(ay * {Q}.0, 0) AS BIGINT) AS ay",
        f"CAST(round(bx * {Q}.0, 0) AS BIGINT) AS bx",
        f"CAST(round(by * {Q}.0, 0) AS BIGINT) AS by",
    )
    cand = (
        qp.crossJoin(F.broadcast(qe))
        .selectExpr(
            "point_id", "pkey * 8 + et AS ekey",
            "px", "py", "ax", "ay", "bx", "by",
            "(bx - ax) * (px - ax) + (by - ay) * (py - ay) AS dot",
            "(bx - ax) * (bx - ax) + (by - ay) * (by - ay) AS e2",
            "(bx - ax) * (py - ay) - (by - ay) * (px - ax) AS crs",
        )
        .selectExpr("point_id", "ekey", f"{_D2Q} AS d2q")
        .localCheckpoint(eager=True)  # reused by both argmin stages
    )
    best = cand.groupBy("point_id").agg(F.min("d2q").alias("d2q"))
    winner = (
        cand.join(best, ["point_id", "d2q"])
        .groupBy("point_id", "d2q")
        .agg(F.min("ekey").alias("ekey"))
    )
    return winner.selectExpr(
        "CAST(point_id AS BIGINT) AS point_id",
        "CAST(ekey DIV 8 AS BIGINT) AS poly_key",
        "CAST(ekey % 8 AS BIGINT) AS edge_t",
        "CAST(d2q AS BIGINT) AS d2q",
    )


def oracle_nearest_edge_sql(points_sql: str, edges_sql: str) -> str:
    """DuckDB mirror over subqueries yielding (point_id, x, y) and
    (pkey, et, ax, ay, bx, by): identical quantization, case arithmetic,
    HUGEINT widening and two-stage argmin."""
    return f"""
WITH qp AS (
  SELECT point_id,
    CAST(round(x * {Q}.0, 0) AS BIGINT) AS px,
    CAST(round(y * {Q}.0, 0) AS BIGINT) AS py
  FROM ({points_sql})
),
qe AS (
  SELECT pkey, et,
    CAST(round(ax * {Q}.0, 0) AS BIGINT) AS ax,
    CAST(round(ay * {Q}.0, 0) AS BIGINT) AS ay,
    CAST(round(bx * {Q}.0, 0) AS BIGINT) AS bx,
    CAST(round(by * {Q}.0, 0) AS BIGINT) AS by
  FROM ({edges_sql})
),
cand AS (
  SELECT point_id, pkey * 8 + et AS ekey, {_D2Q_DUCK} AS d2q
  FROM (
    SELECT point_id, pkey, et, px, py, ax, ay, bx, by,
      (bx - ax) * (px - ax) + (by - ay) * (py - ay) AS dot,
      (bx - ax) * (bx - ax) + (by - ay) * (by - ay) AS e2,
      (bx - ax) * (py - ay) - (by - ay) * (px - ax) AS crs
    FROM qp CROSS JOIN qe
  )
),
best AS (SELECT point_id, MIN(d2q) AS d2q FROM cand GROUP BY 1)
SELECT CAST(c.point_id AS BIGINT) AS point_id,
  CAST(MIN(c.ekey) // 8 AS BIGINT) AS poly_key,
  CAST(MIN(c.ekey) % 8 AS BIGINT) AS edge_t,
  CAST(c.d2q AS BIGINT) AS d2q
FROM cand c JOIN best b ON b.point_id = c.point_id AND b.d2q = c.d2q
GROUP BY c.point_id, c.d2q"""
