"""Spatial joins: point-in-polygon and kNN, as DataFrame joins (north rule).

Both use the cell index as a *spatial index expressed as an equi-join*
(SURVEY.md §4): a cheap cell-cover prefilter join with the small (polygon /
query) side broadcast, then an exact refine step — ray-casting for PIP,
distance re-rank for kNN — entirely in JVM column expressions (higher-order
array functions), so the hot path never leaves whole-stage codegen.

Scale notes (100 TB / 10^12 rows):
- the polygon side is broadcast (mandated by BASELINE.json north_star); the
  big point/image side is never shuffled for PIP — prefilter is a broadcast
  hash join, refine is a projection.
- kNN shuffles only unfinished queries per round (iterative ring doubling);
  candidate sets stay bounded by ring size x local density.
- hot cells: see operators/skew.py (salted repartition); AQE skew-join is the
  configured backstop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.cells import (
    DEFAULT_RES,
    SPAN_X,
    SPAN_Y,
    cell_from_xy,
    cover_rect,
    k_ring,
)


def ring_bbox(ring: Column) -> tuple[Column, Column, Column, Column]:
    xs = F.transform(ring, lambda v: v["x"])
    ys = F.transform(ring, lambda v: v["y"])
    return F.array_min(xs), F.array_min(ys), F.array_max(xs), F.array_max(ys)


def point_in_ring(px: Column, py: Column, ring: Column) -> Column:
    """Exact ray-casting (odd crossings) as a pure column expression.

    ring: array<struct<x,y>> closed (first == last vertex). An edge (a, b)
    crosses the rightward ray from (px, py) iff (a.y > py) != (b.y > py) and
    px < (b.x - a.x) * (py - a.y) / (b.y - a.y) + a.x.
    """
    n = F.size(ring)
    edges = F.zip_with(
        F.slice(ring, 1, n - 1),
        F.slice(ring, 2, n - 1),
        lambda a, b: F.struct(
            a["x"].alias("ax"), a["y"].alias("ay"), b["x"].alias("bx"), b["y"].alias("by")
        ),
    )
    crossings = F.aggregate(
        edges,
        F.lit(0),
        lambda acc, e: acc
        + F.when(
            ((e["ay"] > py) != (e["by"] > py))
            & (px < (e["bx"] - e["ax"]) * (py - e["ay"]) / (e["by"] - e["ay"]) + e["ax"]),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return crossings % 2 == 1


def polygon_cells(polygons: DataFrame, res: int = DEFAULT_RES) -> DataFrame:
    """(poly_id, ring, ...) -> exploded (cell, poly_id, ring): the prefilter
    side. Bbox cover is a superset of the exact polygon cover, so the
    prefilter never loses a true match."""
    xmin, ymin, xmax, ymax = ring_bbox(F.col("ring"))
    return polygons.withColumn("cell", F.explode(cover_rect(xmin, ymin, xmax, ymax, res)))


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    res: int = DEFAULT_RES,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """All (point, polygon) containment pairs.

    Plan shape: big side gets `cell` (pure expr) -> broadcast hash join with
    the exploded polygon-cell table -> ray-cast refine as a filter. One scan,
    zero shuffles of the point side.
    """
    pts = points.withColumn("cell", cell_from_xy(F.col(x), F.col(y), res))
    poly = F.broadcast(polygon_cells(polygons, res))
    cand = pts.join(poly, "cell")
    return cand.filter(point_in_ring(F.col(x), F.col(y), F.col("ring"))).drop("cell", "ring")


def knn_join(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    res: int = DEFAULT_RES,
    ring_rounds: int = 1,
) -> DataFrame:
    """k nearest points for each query row: (query_id, neighbor_id, rank, dist).

    H3-style k-ring prefilter with a distance-bounded re-rank: join queries
    against points whose cell lies in ring(query_cell, r) at a density-chosen
    radius, rank by exact Euclidean distance, and finalize a query when its
    k-th neighbor is provably inside the guaranteed radius r * min(cell_w,
    cell_h) (any point outside the ring is farther). The few unfinished
    queries (sparse neighborhoods) fall back to an exact broadcast re-rank
    against all points — the unfinished side is broadcast, the point side is
    scanned once more with no shuffle, so at 10^12 scale the expensive path
    is bounded by ring size x local density and the fallback by the (tiny)
    unfinished-query count. Deterministic tie-break: (dist, neighbor_id).

    ring_rounds > 1 inserts extra radius-doubling ring rounds before the
    brute-force fallback (useful when the fallback scan is the bottleneck).
    """
    import math

    from pyspark.sql import Window

    n = 1 << res
    cell_w, cell_h = SPAN_X / n, SPAN_Y / n
    safe_per_ring = min(cell_w, cell_h)

    # repartition on persist: a small dim-table scan can arrive as one input
    # split, which would serialize the fallback nested-loop join; at scale the
    # point side is many splits already and this is a no-op cost-wise
    par = points.sparkSession.sparkContext.defaultParallelism
    pts = points.select(
        F.col("point_id").alias("neighbor_id"),
        F.col("x").alias("px"),
        F.col("y").alias("py"),
        cell_from_xy(F.col("x"), F.col("y"), res).alias("cell"),
    ).repartition(par).persist()
    n_points = pts.count()
    pending = queries.select(
        "query_id", F.col("x").alias("qx"), F.col("y").alias("qy"),
        cell_from_xy(F.col("x"), F.col("y"), res).alias("qcell"),
    ).persist()

    # density-based radius: finalization needs the k-th neighbor inside the
    # ring's *inscribed* safe circle (radius * min cell span), so size the
    # ring for ~3k expected points within that circle (not just the square)
    density = max(n_points / float(n * n), 1e-9)  # points per cell
    aspect = min(cell_w, cell_h) / max(cell_w, cell_h)
    radius = max(1, min(n, math.ceil(math.sqrt(3.0 * k / (math.pi * aspect * density)))))

    w = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
    dist = F.sqrt(
        (F.col("px") - F.col("qx")) * (F.col("px") - F.col("qx"))
        + (F.col("py") - F.col("qy")) * (F.col("py") - F.col("qy"))
    )

    def rank_candidates(cand: DataFrame) -> DataFrame:
        return (
            cand.withColumn("dist", dist)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    results = None
    for round_i in range(ring_rounds):
        ringed = pending.withColumn("cell", F.explode(k_ring(F.col("qcell"), radius, res)))
        ranked = rank_candidates(ringed.join(pts, "cell")).persist()
        safe = float(radius) * safe_per_ring
        done_ids = (
            ranked.groupBy("query_id")
            .agg(F.count("*").alias("n_found"), F.max("dist").alias("kth_dist"))
            .filter((F.col("n_found") >= k) & (F.col("kth_dist") <= safe))
            .select("query_id")
            .persist()
        )
        finished = ranked.join(F.broadcast(done_ids), "query_id", "left_semi").select(
            "query_id", "neighbor_id", "rank", "dist"
        )
        results = finished if results is None else results.unionByName(finished)
        pending = pending.join(F.broadcast(done_ids), "query_id", "left_anti")
        radius = min(n, radius * 2)

    # exact fallback: broadcast the unfinished queries against every point —
    # one extra scan of pts, zero shuffles of the point side
    fallback = rank_candidates(
        pts.join(F.broadcast(pending.drop("qcell")), how="cross")
    ).select("query_id", "neighbor_id", "rank", "dist")
    return results.unionByName(fallback) if results is not None else fallback
