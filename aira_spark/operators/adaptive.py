"""Density-adaptive quadtree partitioning — the classic spatial
partitioner that kills hot-cell skew at the LAYOUT level: recursively
split every grid cell whose point count exceeds a threshold, so dense
city blocks land in fine leaves and empty ocean stays in coarse ones,
and every output partition is bounded by ~threshold rows.

The recursion collapses to a closed form because subtree counts are
monotone along the ancestor path (count(child) <= count(parent)): a
point's leaf is the SHALLOWEST resolution r in [r_min, r_max] whose
ancestor cell holds <= threshold points, capped at r_max. So the whole
partitioner is: one explode over the (r_max - r_min + 1) levels → one
hash agg for the per-level cell counts → one equi-join back on the
ancestor cell → a min-level agg per point. No recursion executes at
runtime; no driver-side split table is built.

Scale shape: counts are map-side combinable; the join key is the
ancestor cell (the count table is data-bounded at <= #occupied cells and
usually broadcastable); the level fan-out is a small constant. At 10^12
points this is exactly the partition-assignment pass a spatial writer
runs before repartitioning by leaf."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import cell_from_xy


def adaptive_partitions(
    points: DataFrame,
    r_min: int = 2,
    r_max: int = 6,
    threshold: int = 64,
) -> DataFrame:
    """(point_id, leaf_res, leaf_cell, leaf_count): the quadtree leaf of
    every point under the split rule count > threshold, plus the leaf's
    population (the partition-balance evidence)."""
    levels = list(range(r_min, r_max + 1))
    anc = points.select(
        F.col("point_id").cast("long").alias("point_id"),
        *[
            cell_from_xy(F.col("x"), F.col("y"), r).alias(f"c{r}")
            for r in levels
        ],
    )
    tall = anc.select(
        "point_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("long").alias("res"),
                        F.col(f"c{r}").alias("cell"),
                    )
                    for r in levels
                ]
            )
        ).alias("lc"),
    ).select("point_id", F.col("lc.res").alias("res"), F.col("lc.cell").alias("cell"))
    counts = tall.groupBy("res", "cell").agg(F.count("*").alias("cnt"))
    leaf = (
        tall.join(counts, ["res", "cell"])
        .where((F.col("cnt") <= threshold) | (F.col("res") == r_max))
        .groupBy("point_id")
        .agg(F.min(F.struct("res", "cell", "cnt")).alias("l"))
        .select(
            "point_id",
            F.col("l.res").cast("long").alias("leaf_res"),
            F.col("l.cell").cast("long").alias("leaf_cell"),
            F.col("l.cnt").cast("long").alias("leaf_count"),
        )
    )
    return leaf


def oracle_adaptive_sql(
    points_sql: str,
    r_min: int = 2,
    r_max: int = 6,
    threshold: int = 64,
) -> str:
    """DuckDB mirror: per-level counts + the shallowest-qualifying-level
    rule, written as a level UNION instead of an explode."""
    from ..functions.cells import sql_cell_from_xy

    arms = " UNION ALL ".join(
        f"SELECT point_id, CAST({r} AS BIGINT) AS res, "
        f"{sql_cell_from_xy('x', 'y', r)} AS cell FROM p"
        for r in range(r_min, r_max + 1)
    )
    return f"""
WITH p AS ({points_sql}),
tall AS ({arms}),
counts AS (
  SELECT res, cell, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tall GROUP BY 1, 2
),
q AS (
  SELECT t.point_id, t.res, t.cell, c.cnt
  FROM tall t JOIN counts c ON c.res = t.res AND c.cell = t.cell
  WHERE c.cnt <= {int(threshold)} OR t.res = {int(r_max)}
),
leaf AS (
  SELECT point_id, MIN(res) AS leaf_res FROM q GROUP BY 1
)
SELECT CAST(l.point_id AS BIGINT) AS point_id, l.leaf_res,
  CAST(q.cell AS BIGINT) AS leaf_cell, q.cnt AS leaf_count
FROM leaf l JOIN q ON q.point_id = l.point_id AND q.res = l.leaf_res
"""
