"""Coverage-gap analysis — the acquisition-planning query: which parts of
each AOI polygon have NO imagery? (The spatial anti-join complement of
footprint_polygon_join: that finds matches, this audits the misses.)

Shape: the polygon rasterizes to the cells whose centers it contains
(rasterize_to_cells — the same exact half-open ray-cast rule as dissolve),
the image footprints contribute their DISTINCT cell cover, and one LEFT
join on cell ids + a per-polygon fold counts covered vs gap cells. Both
join inputs are (id, cell) integer rows — pixels, rings, and bytes never
enter the exchange — and neither side is assumed small: at 10^12 images
the cover is corpus-sized, so this is a plain cell-keyed shuffle join that
AQE can re-plan, not a forced broadcast. The distinct on the cover halves
the shuffle before the join (one cell survives however many footprints
stack on it)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import DEFAULT_RES
from .rasterize import rasterize_to_cells


def coverage_gaps(
    polygons: DataFrame, image_cover: DataFrame, res: int = DEFAULT_RES
) -> DataFrame:
    """(poly_id, n_cells, n_covered, n_gap) per polygon; `image_cover`
    carries (image_id, cell) footprint cover rows."""
    ras = rasterize_to_cells(polygons, res)
    cov = image_cover.select("cell").distinct().withColumn(
        "hit", F.lit(1).cast("long")
    )
    return (
        ras.join(cov, "cell", "left")
        .groupBy("poly_id")
        .agg(
            F.count("*").cast("long").alias("n_cells"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long")
            .alias("n_covered"),
        )
        .withColumn(
            "n_gap", (F.col("n_cells") - F.col("n_covered")).cast("long")
        )
    )
