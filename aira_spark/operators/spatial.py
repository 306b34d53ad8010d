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
    max_rounds: int = 8,
) -> DataFrame:
    """k nearest points for each query row: (query_id, neighbor_id, rank, dist).

    H3-style k-ring expansion with a distance-bounded re-rank: round i joins
    queries against points whose cell lies in ring(query_cell, r_i), ranks by
    exact Euclidean distance, and finalizes a query once its k-th neighbor is
    provably inside the guaranteed radius r_i * min(cell_w, cell_h) (any point
    outside the ring is farther). Unfinished queries double the ring.
    Deterministic tie-break: (dist, neighbor_id).
    """
    import math

    from pyspark.sql import Window

    n = 1 << res
    cell_w, cell_h = SPAN_X / n, SPAN_Y / n
    safe_per_ring = min(cell_w, cell_h)

    pts = points.select(
        F.col("point_id").alias("neighbor_id"),
        F.col("x").alias("px"),
        F.col("y").alias("py"),
        cell_from_xy(F.col("x"), F.col("y"), res).alias("cell"),
    ).persist()
    n_points = pts.count()
    pending = queries.select(
        "query_id", F.col("x").alias("qx"), F.col("y").alias("qy"),
        cell_from_xy(F.col("x"), F.col("y"), res).alias("qcell"),
    ).persist()
    n_pending = pending.count()

    # density-based initial radius: expect >= ~4k candidates per query so the
    # first round finalizes the bulk (uniform-ish data), instead of crawling
    # up from radius 1 with mostly-empty rings
    density = max(n_points / float(n * n), 1e-9)
    radius = max(1, min(n, math.ceil((math.sqrt(4.0 * k / density) - 1.0) / 2.0)))

    results = None
    w = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
    dist = F.sqrt(
        (F.col("px") - F.col("qx")) * (F.col("px") - F.col("qx"))
        + (F.col("py") - F.col("qy")) * (F.col("py") - F.col("qy"))
    )
    for round_i in range(max_rounds):
        last = round_i == max_rounds - 1 or radius >= n
        ringed = pending.withColumn("cell", F.explode(k_ring(F.col("qcell"), radius, res)))
        ranked = (
            ringed.join(pts, "cell")
            .withColumn("dist", dist)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .persist()
        )
        safe = float(radius) * safe_per_ring
        stats = ranked.groupBy("query_id").agg(
            F.count("*").alias("n_found"), F.max("dist").alias("kth_dist")
        )
        if last:
            done_ids = stats.select("query_id")
        else:
            done_ids = stats.filter(
                (F.col("n_found") >= k) & (F.col("kth_dist") <= safe)
            ).select("query_id")
        done_ids = done_ids.persist()
        n_done = done_ids.count()
        finished = ranked.join(F.broadcast(done_ids), "query_id", "left_semi").select(
            "query_id", "neighbor_id", "rank", "dist"
        )
        results = finished if results is None else results.unionByName(finished)
        n_pending -= n_done
        if n_pending <= 0 or last:
            break
        pending = pending.join(F.broadcast(done_ids), "query_id", "left_anti").persist()
        radius = min(n, radius * 2)
    return results
