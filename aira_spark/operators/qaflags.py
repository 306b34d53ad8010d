"""QA bit-flags masking census — the packed-bitfield decode every
earth-observation pipeline runs before touching pixels (USGS Landsat 8-9
QA_PIXEL layout: bit 0 fill, 1 dilated cloud, 2 cirrus, 3 cloud, 4 cloud
shadow, 5 snow, 7 water, bits 8-9 two-bit cloud confidence), applied per
CHUNK so it composes with the tile grid: the per-image output is the
"how much of this scene is actually usable" budget that drives
scene selection and mosaic ordering upstream of any decode.

    usable chunk := no fill, no dilated/cirrus/cloud/shadow bit,
                    cloud confidence < 2 (low)

Exactness: pure shift-and-mask integer ops on the 16-bit word (Spark
`shiftright(qa, b) & m`, DuckDB `(qa >> b) & m` — same semantics, helper
emits both texts) and exact BIGINT pixel sums; the usable share ships as
`(1000000 * usable_px) DIV total_px` floor fixed point. Zero-size planar
overflow chunks count as chunks but contribute 0 px — the census never
divides by their emptiness.

Scale shape (100 TB): flag decode is a pure projection fused into the
chunk enumeration scan (no exchange added — whole-stage codegen keeps it
JVM-side), and the only shuffle is the per-image hash aggregation, which
map-side-combines to one row per image. Pixels are never read: the
entire mask budget comes from metadata-derived chunk geometry."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bit(qa: str, b: int, engine: str, mask: int = 1) -> str:
    """Shift-and-mask extraction text for both engines."""
    if engine == "spark":
        return f"(shiftright({qa}, {b}) & {mask})"
    return f"(({qa} >> {b}) & {mask})"


def _flags(engine: str) -> dict[str, str]:
    return {
        "fill": bit("qa", 0, engine),
        "cloud": bit("qa", 3, engine),
        "shadow": bit("qa", 4, engine),
        "snow": bit("qa", 5, engine),
        "water": bit("qa", 7, engine),
        "usable": (
            f"CAST({bit('qa', 0, engine)} = 0 AND {bit('qa', 1, engine)} = 0"
            f" AND {bit('qa', 2, engine)} = 0 AND {bit('qa', 3, engine)} = 0"
            f" AND {bit('qa', 4, engine)} = 0"
            f" AND {bit('qa', 8, engine, 3)} < 2 AS BIGINT)"
        ),
    }


def qa_mask_census(chunks: DataFrame) -> DataFrame:
    """(image_id, n_chunks, n_fill, n_cloud, n_shadow, n_snow, n_water,
    n_usable, usable_px, total_px, usable_ppm) from chunk rows carrying
    (image_id, chunk_idx, size_x, size_y, qa int16-valued bigint)."""
    fl = _flags("spark")
    decoded = chunks.selectExpr(
        "image_id",
        "CAST(size_x * size_y AS BIGINT) AS px",
        *[f"CAST({t} AS BIGINT) AS {n}" for n, t in fl.items()],
    )
    return (
        decoded.groupBy("image_id")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            *[F.sum(n).cast("long").alias(f"n_{n}") for n in
              ("fill", "cloud", "shadow", "snow", "water", "usable")],
            F.sum(F.expr("usable * px")).cast("long").alias("usable_px"),
            F.sum("px").cast("long").alias("total_px"),
        )
        .selectExpr(
            "image_id", "n_chunks", "n_fill", "n_cloud", "n_shadow",
            "n_snow", "n_water", "n_usable", "usable_px", "total_px",
            "CASE WHEN total_px > 0 THEN (1000000 * usable_px) DIV total_px"
            " ELSE 0 END AS usable_ppm",
        )
    )


def oracle_qa_sql(chunks_sql: str) -> str:
    """DuckDB mirror over a subquery yielding
    (image_id, chunk_idx, size_x, size_y, qa)."""
    fl = _flags("duck")
    cols = ",\n    ".join(f"CAST({t} AS BIGINT) AS {n}" for n, t in fl.items())
    return f"""
WITH ch AS ({chunks_sql}),
decoded AS (
  SELECT image_id, CAST(size_x * size_y AS BIGINT) AS px,
    {cols}
  FROM ch
),
agg AS (
  SELECT image_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
    CAST(SUM(fill) AS BIGINT) AS n_fill,
    CAST(SUM(cloud) AS BIGINT) AS n_cloud,
    CAST(SUM(shadow) AS BIGINT) AS n_shadow,
    CAST(SUM(snow) AS BIGINT) AS n_snow,
    CAST(SUM(water) AS BIGINT) AS n_water,
    CAST(SUM(usable) AS BIGINT) AS n_usable,
    CAST(SUM(usable * px) AS BIGINT) AS usable_px,
    CAST(SUM(px) AS BIGINT) AS total_px
  FROM decoded GROUP BY 1
)
SELECT image_id, n_chunks, n_fill, n_cloud, n_shadow, n_snow, n_water,
  n_usable, usable_px, total_px,
  CAST(CASE WHEN total_px > 0 THEN (1000000 * usable_px) // total_px
       ELSE 0 END AS BIGINT) AS usable_ppm
FROM agg
"""
