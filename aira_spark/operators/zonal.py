"""Raster -> vector zonal statistics.

Map side: the Arrow UDF decodes pixels and partially aggregates per
(image, cell) in numpy (functions/udfs.zonal_pixel_batches) — this is the
map-side combine; the reduce side is a stock Catalyst hash aggregation on
`cell`, so the shuffle carries (image x cells) rows, never pixels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import DEFAULT_RES
from ..functions.udfs import ZONAL_PIX_SCHEMA, zonal_pixel_batches
from .spatial import polygon_cells


def per_image_cell_stats(images: DataFrame, res: int = DEFAULT_RES) -> DataFrame:
    """(image_id, cell, px_cnt, px_sum, px_min, px_max) — pixel-level zonal map."""
    return images.select("image_id", "bytes").mapInPandas(
        zonal_pixel_batches(res), schema=ZONAL_PIX_SCHEMA
    )


def zonal_stats(images: DataFrame, res: int = DEFAULT_RES) -> DataFrame:
    """Aggregate decoded pixels over grid-cell zones (SURVEY.md §2.2)."""
    return (
        per_image_cell_stats(images, res)
        .groupBy("cell")
        .agg(
            F.sum("px_cnt").alias("n_px"),
            F.sum("px_sum").alias("sum_px"),
            F.min("px_min").alias("min_px"),
            F.max("px_max").alias("max_px"),
        )
    )


def zonal_rollup(
    images: DataFrame, res: int = DEFAULT_RES, steps: int = 2
) -> DataFrame:
    """Hierarchical (pyramid) rollup: pixel stats aggregated at resolution
    `res - steps`, computed from the per-image fine-cell partials via
    `cell_parent` bit arithmetic — the hypertable-rollup pattern. No second
    decode and no second pixel pass: parent ids are a pure column expression
    on the map-side partials, so the single shuffle carries (image x
    fine-cell) rows and Catalyst's partial+final hash agg does the rest. At
    scale, coarser rollups reuse the same partials with a different shift."""
    from ..functions.cells import cell_parent

    return (
        per_image_cell_stats(images, res)
        .groupBy(cell_parent(F.col("cell"), steps).alias("cell"))
        .agg(
            F.sum("px_cnt").alias("n_px"),
            F.sum("px_sum").alias("sum_px"),
            F.min("px_min").alias("min_px"),
            F.max("px_max").alias("max_px"),
        )
    )


def zonal_by_polygon(
    images: DataFrame, polygons: DataFrame, res: int = DEFAULT_RES
) -> DataFrame:
    """Zonal stats per polygon category: cell-level partials joined (broadcast)
    to the polygon cell cover, re-aggregated per category."""
    cells = per_image_cell_stats(images, res)
    poly = F.broadcast(polygon_cells(polygons, res).select("cell", "poly_id", "category"))
    return (
        cells.join(poly, "cell")
        .groupBy("category")
        .agg(
            F.sum("px_cnt").alias("n_px"),
            F.sum("px_sum").alias("sum_px"),
            F.min("px_min").alias("min_px"),
            F.max("px_max").alias("max_px"),
        )
    )
