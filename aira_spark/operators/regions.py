"""Raster polygonize: threshold + connected components over the cell grid.

The inverse of rasterize: turn a raster predicate back into vector regions.
Pixels are first aggregated per grid cell (the zonal_stats map-side combine
— the shuffle carries cell partials, never pixels), cells passing the
threshold are linked by 4-adjacency, and connected components label each
contiguous region (duplicate_clusters' min-label propagation — cells are
just nodes). This is how a 100-TB raster archive answers "give me polygons
where NDVI/mean-value exceeds X": the only per-pixel work is the map-side
decode that every zonal query already pays, and the CC runs on the cell
graph, which is orders of magnitude smaller than the raster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import IX_SHIFT
from .dedup import duplicate_clusters
from .zonal import zonal_stats


def threshold_cells(
    cellstats: DataFrame, mean_num: int, mean_den: int
) -> DataFrame:
    """Cells whose mean pixel value >= mean_num/mean_den, by EXACT integer
    cross-multiplication (sum_px * den >= num * n_px) — no float division,
    so Spark and the oracle agree to the bit."""
    return cellstats.filter(
        F.col("sum_px") * F.lit(int(mean_den)) >= F.lit(int(mean_num)) * F.col("n_px")
    )


def cell_adjacency(cells: DataFrame) -> DataFrame:
    """(doc_a, doc_b) edges between 4-adjacent cells of one resolution.

    The east neighbor is cell + 2^29 (ix+1) and the north neighbor cell + 1
    (iy+1) in the packed layout (cell = res<<58 | ix<<29 | iy). Cells on the
    grid's last row/column are filtered BEFORE the bump: cell + 1 at
    iy = 2^29 - 1 would carry into the ix field and alias a valid
    same-resolution id (ix+1, 0), silently linking the top of one column to
    the bottom of the next (east has the same carry into res at
    ix = 2^29 - 1). One self-equi-join on the candidate neighbor id; the
    cell set (not the raster) is the join input."""
    mask = F.lit((1 << IX_SHIFT) - 1).cast("long")
    ids = cells.select(F.col("cell").cast("long").alias("cell")).distinct()
    east = ids.filter(
        F.expr(f"(cell div {1 << IX_SHIFT}) % {1 << IX_SHIFT}") != mask
    ).select(
        F.col("cell").alias("doc_a"),
        (F.col("cell") + F.lit(1 << IX_SHIFT).cast("long")).alias("doc_b"),
    )
    north = ids.filter(F.col("cell") % F.lit(1 << IX_SHIFT) != mask).select(
        F.col("cell").alias("doc_a"), (F.col("cell") + F.lit(1)).alias("doc_b")
    )
    cand = east.unionByName(north)
    return cand.join(
        ids.select(F.col("cell").alias("doc_b")), "doc_b"
    ).select("doc_a", "doc_b")


def threshold_regions(
    images: DataFrame, res: int, mean_num: int = 0, mean_den: int = 1
) -> DataFrame:
    """(region_id, n_cells, n_px, sum_px): contiguous regions of cells whose
    mean pixel value passes the threshold (mean_num/mean_den; the 0/1
    default polygonizes the coverage footprint itself). region_id is the
    minimum cell id of the region — deterministic, join-stable.

    Plan: zonal map-side combine -> cell hash-agg -> integer threshold ->
    4-adjacency self-join on the cell set -> min-label CC with pointer
    jumping (one (node,label) shuffle per round, O(log grid-diameter)
    rounds — a snake region spanning the whole grid converges in ~9 rounds)
    -> one final region agg. Isolated cells (no passing neighbor) are
    singleton regions."""
    stats = zonal_stats(images, res).localCheckpoint(eager=True)
    hot = threshold_cells(stats, mean_num, mean_den)
    edges = cell_adjacency(hot)
    # grid-snake regime: jump early (see dbscan.py — same rationale)
    clusters = duplicate_clusters(edges, jump_after=3).select(
        F.col("doc_id").alias("cell"), F.col("cluster_id").alias("region_id")
    )
    labeled = (
        hot.join(clusters, "cell", "left")
        .withColumn("region_id", F.coalesce(F.col("region_id"), F.col("cell")))
    )
    return labeled.groupBy("region_id").agg(
        F.count("*").alias("n_cells"),
        F.sum("n_px").alias("n_px"),
        F.sum("sum_px").alias("sum_px"),
    )
