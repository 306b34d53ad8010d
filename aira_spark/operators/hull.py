"""Per-cluster convex hull — ST_ConvexHull over grouped point sets,
distributed the only way hulls distribute: group by a coarse spatial cell
(bounded membership), run Andrew's monotone chain inside ONE
applyInPandas per group, emit hull VERTICES only.

All geometry is exact: coordinates quantize to 1e-4-degree integers (the
geom.py convention) so the orientation predicate is an int64 cross
product — no float epsilon, so Spark, numpy, and the DuckDB oracle agree
on every collinear edge case. Identical coordinates dedupe to the min
point_id before the chain (two coincident points cannot both be hull
vertices).

STRICT hull semantics: collinear boundary points are NOT vertices; a
fully-collinear cluster's hull is its two extremes; 1- and 2-point
clusters are their own hulls.

The oracle is an INDEPENDENT O(n^3) formulation (no chain): (a,b) is a
maximal hull edge iff every other point is strictly on one side of line
ab or strictly between a and b; hull vertices are the endpoints of
maximal edges (plus the n<=2 special cases) — a chain bug and an edge
bug cannot cancel.

Scale shape: one shuffle on the coarse cell; each group is bounded by
construction (a res-4 cell), so the in-group chain is O(n log n) local
work; output is vertices only. At 10^12 points the same plan holds —
pick the grouping resolution so cells stay bounded."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import cell_from_xy

Q = 10_000  # 1e-4 degree quantum (operators/geom.py convention)
GROUP_RES = 4

_OUT_SCHEMA = "grp long, point_id long, qx long, qy long"


def _chain(pts):
    """Andrew's monotone chain, strict turns (collinear points dropped).
    `pts` is a list of (qx, qy, point_id) sorted ascending."""
    if len(pts) <= 2:
        return pts

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    out = lower[:-1] + upper[:-1]
    # fully-collinear cluster: both chains degenerate to the two extremes
    return out if out else [pts[0], pts[-1]]


def convex_hulls(points: DataFrame, res: int = GROUP_RES) -> DataFrame:
    """(grp, point_id, qx, qy): the hull vertices of every coarse-cell
    cluster of `points` (point_id, x, y)."""
    quant = points.select(
        cell_from_xy(F.col("x"), F.col("y"), res).alias("grp"),
        F.col("point_id").cast("long").alias("point_id"),
        F.expr(f"CAST(round(x * {Q}.0, 0) AS BIGINT)").alias("qx"),
        F.expr(f"CAST(round(y * {Q}.0, 0) AS BIGINT)").alias("qy"),
    )
    dedup = quant.groupBy("grp", "qx", "qy").agg(
        F.min("point_id").alias("point_id")
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pts = sorted(
            zip(
                pdf["qx"].astype("int64"),
                pdf["qy"].astype("int64"),
                pdf["point_id"].astype("int64"),
            )
        )
        hull = _chain(pts)
        return pd.DataFrame(
            {
                "grp": pdf["grp"].iloc[0],
                "point_id": [int(p[2]) for p in hull],
                "qx": [int(p[0]) for p in hull],
                "qy": [int(p[1]) for p in hull],
            }
        )

    return dedup.groupBy("grp").applyInPandas(per_group, _OUT_SCHEMA)


def oracle_hull_sql(points_sql: str, res: int = GROUP_RES) -> str:
    """DuckDB mirror via maximal hull edges — independent of the chain."""
    from ..functions.cells import sql_cell_from_xy

    cell = sql_cell_from_xy("x", "y", res)
    return f"""
WITH p AS ({points_sql}),
q AS (
  SELECT {cell} AS grp, point_id,
    CAST(round(x * {Q}.0, 0) AS BIGINT) AS qx,
    CAST(round(y * {Q}.0, 0) AS BIGINT) AS qy
  FROM p
),
g AS (
  SELECT grp, qx, qy, MIN(point_id) AS point_id
  FROM q GROUP BY grp, qx, qy
),
n AS (SELECT grp, COUNT(*) AS cnt FROM g GROUP BY grp),
pr AS (
  SELECT a.grp, a.point_id AS ia, b.point_id AS ib,
    a.qx AS ax, a.qy AS ay, b.qx AS bx, b.qy AS by
  FROM g a JOIN g b ON b.grp = a.grp
    AND (a.qx < b.qx OR (a.qx = b.qx AND a.qy < b.qy))
),
ck AS (
  SELECT pr.grp, pr.ia, pr.ib,
    MIN((bx - ax) * (c.qy - ay) - (by - ay) * (c.qx - ax)) AS mn,
    MAX((bx - ax) * (c.qy - ay) - (by - ay) * (c.qx - ax)) AS mx,
    SUM(CASE WHEN (bx - ax) * (c.qy - ay) - (by - ay) * (c.qx - ax) = 0
             AND NOT ((c.qx - ax) * (c.qx - bx) + (c.qy - ay) * (c.qy - by) < 0)
        THEN 1 ELSE 0 END) AS bad_collinear
  FROM pr JOIN g c ON c.grp = pr.grp
    AND c.point_id != pr.ia AND c.point_id != pr.ib
  GROUP BY 1, 2, 3
),
edges AS (
  -- pairs in 1- and 2-point groups have no third point and are absent
  -- from ck; 2-point groups ARE their hull (handled by the n<=2 arm)
  SELECT grp, ia, ib FROM ck
  WHERE (mn >= 0 OR mx <= 0) AND bad_collinear = 0
),
verts AS (
  SELECT grp, ia AS point_id FROM edges
  UNION SELECT grp, ib FROM edges
  UNION SELECT g.grp, g.point_id FROM g JOIN n ON n.grp = g.grp AND n.cnt <= 2
)
SELECT CAST(v.grp AS BIGINT) AS grp,
  CAST(v.point_id AS BIGINT) AS point_id, g.qx, g.qy
FROM verts v JOIN g ON g.grp = v.grp AND g.point_id = v.point_id
"""


def hull_diameter(points: DataFrame, res: int = GROUP_RES) -> DataFrame:
    """(grp, n_hull, diam2, diam_e4): the exact squared diameter of every
    coarse-cell point cluster — "how spread is this territory", the
    scalar downstream of convex_hulls (set diameter == hull-vertex
    diameter, a convexity fact the pytest pins against the all-pairs
    answer).

    Scale shape: the all-pairs step runs on HULL VERTICES only — O(h^2)
    per group with h << n (h is O(n^(1/3)) for uniform clusters), after
    convex_hulls' dedup + per-group chain; the join is per-group
    (equi-join on grp), d2 is exact BIGINT, diam_e4 the shared
    floor-sqrt text. Single-vertex groups emit 0."""
    h = convex_hulls(points, res)
    a = h.selectExpr("grp", "point_id AS ia", "qx AS ax", "qy AS ay")
    b = h.selectExpr("grp", "point_id AS ib", "qx AS bx", "qy AS by")
    pairs = a.join(b, "grp").where("ia < ib").selectExpr(
        "grp",
        "(bx - ax) * (bx - ax) + (by - ay) * (by - ay) AS d2",
    )
    census = h.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_hull")
    )
    mx = pairs.groupBy("grp").agg(F.max("d2").cast("long").alias("diam2"))
    return (
        census.join(mx, "grp", "left")
        .selectExpr(
            "CAST(grp AS BIGINT) AS grp", "n_hull",
            "CAST(coalesce(diam2, 0) AS BIGINT) AS diam2",
        )
        .selectExpr(
            "grp", "n_hull", "diam2",
            "CAST(floor(sqrt(CAST(diam2 AS DOUBLE))) AS BIGINT) AS diam_e4",
        )
    )


def oracle_hull_diameter_sql(points_sql: str, res: int = GROUP_RES) -> str:
    """DuckDB mirror: n_hull from oracle_hull_sql's maximal-edge hull
    (wrapped verbatim so the vertex census cannot drift from the proven
    convex_hulls oracle), diam2 by an INDEPENDENT method — max pairwise
    d2 over ALL the group's dedup'd quantized points, no hull at all
    (the convexity fact makes the two answers provably equal)."""
    from ..functions.cells import sql_cell_from_xy

    cell = sql_cell_from_xy("x", "y", res)
    hull = oracle_hull_sql(points_sql, res)
    return f"""
WITH hull AS ({hull}),
p2 AS ({points_sql}),
q AS (
  SELECT {cell} AS grp, point_id,
    CAST(round(x * {Q}.0, 0) AS BIGINT) AS qx,
    CAST(round(y * {Q}.0, 0) AS BIGINT) AS qy
  FROM p2
),
g AS (
  SELECT grp, qx, qy, MIN(point_id) AS point_id
  FROM q GROUP BY grp, qx, qy
),
nh AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_hull FROM hull GROUP BY 1),
dm AS (
  SELECT a.grp,
    CAST(MAX((b.qx - a.qx) * (b.qx - a.qx)
           + (b.qy - a.qy) * (b.qy - a.qy)) AS BIGINT) AS diam2
  FROM g a JOIN g b ON b.grp = a.grp AND a.point_id < b.point_id
  GROUP BY a.grp
)
SELECT CAST(nh.grp AS BIGINT) AS grp, nh.n_hull,
  CAST(COALESCE(dm.diam2, 0) AS BIGINT) AS diam2,
  CAST(floor(sqrt(CAST(COALESCE(dm.diam2, 0) AS DOUBLE))) AS BIGINT)
    AS diam_e4
FROM nh LEFT JOIN dm ON dm.grp = nh.grp
"""
