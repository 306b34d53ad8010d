"""Dissolve (union polygons by attribute) as cell covers.

The classic GIS dissolve — merge all geometries sharing an attribute into
one — re-expressed grid-first: each polygon rasterizes to the cells whose
centers it contains (the same exact half-open rule as rasterize_to_cells,
so the result is deterministic and oracle-checkable), the cell sets union
per attribute (a distinct — overlapping polygons melt together for free,
which is exactly dissolve's hard part in vector form), and the merged cover
compacts to mixed resolution so large contiguous areas collapse into a few
coarse cells.

Scale shape: rasterize is the broadcast-prefiltered cover + ray-cast (no
cross join); the union is one (grp, cell) distinct; compaction is a handful
of id-only aggregations. No vector topology (edge noding, snap rounding) is
ever computed — at 10^12-cell scale the grid form IS the practical dissolve
(this is how H3/S2 pipelines do it), and expand_cover recovers the fine
grid exactly when needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import DEFAULT_RES
from .compact import compact_cover_grouped
from .rasterize import rasterize_to_cells


def dissolve_covers(
    polygons: DataFrame,
    attr: str = "category",
    res: int = DEFAULT_RES,
    min_res: int | None = None,
) -> DataFrame:
    """(grp, cell, res): per attribute value, the compacted mixed-resolution
    cover of the union of its polygons' rasterizations."""
    if min_res is None:
        min_res = max(res - 3, 0)
    ras = rasterize_to_cells(polygons, res)
    merged = (
        ras.join(polygons.select("poly_id", attr), "poly_id")
        .select(F.col(attr).alias("grp"), "cell")
        .distinct()
    )
    return compact_cover_grouped(merged, res, min_res)
