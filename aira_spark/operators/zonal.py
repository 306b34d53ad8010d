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


def zonal_exact_by_polygon(
    images_with_meta: DataFrame, polygons: DataFrame, res: int = DEFAULT_RES
) -> DataFrame:
    """EXACT polygon-masked zonal statistics: per polygon, aggregate only the
    decoded pixels whose center lies inside the ring (pixel-level ray-cast
    mask — not the bbox-cell approximation of zonal_by_polygon).

    Plan shape: footprint cover cells equi-join the broadcast polygon-cell
    table (ring rides along), so candidate (image, polygon) rows stay in the
    image's input partition — the bytes column is NEVER shuffled. One
    mapInPandas dedups candidates per image, decodes once, and evaluates the
    vectorized numpy ray-cast over all pixel centers x ring edges; only the
    tiny per-(image, polygon) partials shuffle into the final hash agg.
    """
    from ..functions.cells import cover_rect
    from .chunks import footprint
    from .spatial import polygon_cells

    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    fp = footprint(images_with_meta)
    fp_cells = fp.withColumn(
        "cell",
        F.explode(
            cover_rect(
                F.col("fp_xmin"), F.col("fp_ymin"), F.col("fp_xmax"), F.col("fp_ymax"), res
            )
        ),
    ).select("image_id", "bytes", "cell")
    poly = F.broadcast(polygon_cells(polygons, res).select("cell", "poly_id", "ring"))
    # duplicates (same pair via several cells) are dropped inside the UDF —
    # a dropDuplicates here would shuffle the bytes column
    cand = fp_cells.join(poly, "cell").select("image_id", "bytes", "poly_id", "ring")

    schema = (
        "poly_id string, n_px long, sum_px long, min_px long, max_px long"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..tiff import tags as T
        from ..tiff.meta import TiffError, entry_value
        from ..functions.udfs import _decode_full

        for pdf in batches:
            out: list[tuple] = []
            for image_id, grp in pdf.groupby("image_id", sort=False):
                try:
                    m, px = _decode_full(bytes(grp["bytes"].iloc[0]))
                except TiffError:
                    continue
                scale = m["custom"].get(T.MODEL_PIXEL_SCALE)
                tie = m["custom"].get(T.MODEL_TIEPOINT)
                if scale is None or tie is None:
                    continue
                sv = entry_value(*scale, m["byteorder"])
                tv = entry_value(*tie, m["byteorder"])
                h, w = px.shape[:2]
                xs = tv[3] + (np.arange(w) + 0.5 - tv[0]) * sv[0]
                ys = tv[4] - (np.arange(h) + 0.5 - tv[1]) * sv[1]
                pxx = np.broadcast_to(xs[None, :], (h, w)).ravel()
                pyy = np.broadcast_to(ys[:, None], (h, w)).ravel()
                vals = px[:, :, 0].astype(np.int64).ravel()
                seen: set[str] = set()
                for rec in grp.itertuples(index=False):
                    if rec.poly_id in seen:
                        continue
                    seen.add(rec.poly_id)
                    ring = rec.ring
                    ax = np.array([v["x"] for v in ring[:-1]])
                    ay = np.array([v["y"] for v in ring[:-1]])
                    bx = np.array([v["x"] for v in ring[1:]])
                    by = np.array([v["y"] for v in ring[1:]])
                    # vectorized ray-cast: pixels x edges (same formula text
                    # as point_in_ring and the DuckDB oracle)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        cond = (ay[None, :] > pyy[:, None]) != (by[None, :] > pyy[:, None])
                        t = (bx - ax)[None, :] * (pyy[:, None] - ay[None, :]) / (
                            by - ay
                        )[None, :] + ax[None, :]
                        crossings = (cond & (pxx[:, None] < t)).sum(axis=1)
                    mask = (crossings % 2) == 1
                    if not mask.any():
                        continue
                    mv = vals[mask]
                    out.append(
                        (rec.poly_id, int(mv.size), int(mv.sum()), int(mv.min()), int(mv.max()))
                    )
            yield pd.DataFrame(
                out, columns=["poly_id", "n_px", "sum_px", "min_px", "max_px"]
            )

    partials = cand.mapInPandas(fn, schema=schema)
    return partials.groupBy("poly_id").agg(
        F.sum("n_px").alias("n_px"),
        F.sum("sum_px").alias("sum_px"),
        F.min("min_px").alias("min_px"),
        F.max("max_px").alias("max_px"),
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
