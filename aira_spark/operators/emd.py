"""Histogram EMD drift — per-image 1-D earth mover's distance (Wasserstein
W1) between each image's luminance histogram and the corpus reference
histogram: the standard "does this scene look like the collection?"
detector (sensor drift, haze, over/under-exposure, corrupted decodes) that
ranks outliers for curation before any model sees them. For 1-D
distributions W1 reduces to the CDF gap (Vallender 1974):

    W1(P, Q) = sum_b |CDF_P(b) - CDF_Q(b)|        (bin units)

Exactness: both CDFs stay integer counts and the gap is the
cross-multiplied BIGINT `|N_ref * C_img(b) - n_img * C_ref(b)|` summed
over bins 0..B-2 (the last bin's CDFs are both 1 — identically zero gap),
so d1 is exact; the normalized share ships as
`(1000000 * d1) DIV (n_img * N_ref * (B-1))` — exact integer floor ppm of
the maximum possible drift. A loud guard raises before `1e6 * d1` could
exceed int64 (corpus pixels x image pixels x bins budget) — at that corpus
scale, shard the reference per partition instead of silently overflowing.

Scale shape (100 TB): the input is the SPARSE per-image histogram (the
decode UDF emits <= 256 rows per image, never pixels —
`zonal.band_histogram`); densification is a bounded images x B fan-out;
the reference is a B-row table that BROADCASTS onto every image's CDF; the
per-image CDF rides a window partition of exactly B rows. One hash agg
back to one row per image. Nothing in any exchange scales with pixels."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def emd_drift(hist: DataFrame, n_bins: int = 16) -> DataFrame:
    """(image_id, n_px, d1, emd_ppm) from `hist` carrying the coarse
    per-image histogram (image_id, bin, c) with bin in [0, n_bins)."""
    # the sparse histogram is bounded (<= B rows per image) — persist it so
    # the guard's one stats pass and the main plan share a single upstream
    # (typically decode-UDF) materialization
    hist = hist.persist()
    imgs = hist.groupBy("image_id").agg(F.sum("c").cast("long").alias("n_px"))
    ref = hist.groupBy("bin").agg(F.sum("c").cast("long").alias("rc"))
    stats = imgs.agg(
        F.max("n_px").alias("m"), F.sum("n_px").cast("long").alias("t")
    ).collect()[0]
    n_ref = stats["t"] or 0
    n_max = stats["m"] or 0
    if 1_000_000 * (n_bins - 1) * n_ref * n_max > (1 << 62):
        raise RuntimeError(
            f"emd_drift: 1e6 * d1 budget ({n_ref} ref px x {n_max} image px"
            f" x {n_bins - 1} bins) would overflow int64 — shard the"
            " reference histogram per partition at this corpus scale"
        )
    spine = hist.sparkSession.range(n_bins).selectExpr(
        "CAST(id AS BIGINT) AS bin"
    )
    dense = (
        imgs.crossJoin(F.broadcast(spine))
        .join(hist.selectExpr("image_id", "bin", "CAST(c AS BIGINT) AS c"),
              ["image_id", "bin"], "left")
        .selectExpr("image_id", "n_px", "bin", "coalesce(c, 0) AS c")
    )
    w = (
        Window.partitionBy("image_id")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cdf = dense.select(
        "image_id", "n_px", "bin", F.sum("c").over(w).alias("cimg")
    )
    wr = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    refcdf = F.broadcast(
        spine.join(ref, "bin", "left")
        .selectExpr("bin", "coalesce(rc, 0) AS rc")
        .select("bin", F.sum("rc").over(wr).alias("cref"))
    )
    return (
        cdf.where(f"bin < {n_bins - 1}")
        .join(refcdf, "bin")
        .groupBy("image_id", "n_px")
        .agg(
            F.sum(F.abs(F.lit(n_ref) * F.col("cimg")
                        - F.col("n_px") * F.col("cref")))
            .cast("long").alias("d1")
        )
        .selectExpr(
            "image_id", "n_px", "d1",
            "CASE WHEN n_px > 0 THEN (1000000 * d1)"
            f" DIV (n_px * {n_ref} * {n_bins - 1}) ELSE 0 END AS emd_ppm",
        )
    )


def oracle_emd_sql(hist_sql: str, n_bins: int = 16) -> str:
    """DuckDB mirror over a subquery yielding (image_id, bin, c)."""
    return f"""
WITH hist AS (SELECT image_id, bin, CAST(c AS BIGINT) AS c FROM ({hist_sql})),
imgs AS (SELECT image_id, CAST(SUM(c) AS BIGINT) AS n_px FROM hist GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_ref FROM hist),
spine AS (SELECT CAST(range AS BIGINT) AS bin FROM range({n_bins})),
dense AS (
  SELECT i.image_id, i.n_px, s.bin, COALESCE(h.c, 0) AS c
  FROM imgs i CROSS JOIN spine s
  LEFT JOIN hist h ON h.image_id = i.image_id AND h.bin = s.bin
),
cdf AS (
  SELECT image_id, n_px, bin,
    SUM(c) OVER (PARTITION BY image_id ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cimg
  FROM dense
),
refh AS (
  SELECT s.bin, COALESCE(SUM(h.c), 0) AS rc
  FROM spine s LEFT JOIN hist h ON h.bin = s.bin GROUP BY 1
),
refcdf AS (
  SELECT bin, SUM(rc) OVER (ORDER BY bin
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cref
  FROM refh
),
agg AS (
  SELECT c.image_id, c.n_px,
    CAST(SUM(ABS(t.n_ref * c.cimg - c.n_px * r.cref)) AS BIGINT) AS d1,
    MAX(t.n_ref) AS n_ref
  FROM cdf c JOIN refcdf r ON c.bin = r.bin CROSS JOIN tot t
  WHERE c.bin < {n_bins - 1}
  GROUP BY 1, 2
)
SELECT image_id, n_px, d1,
  CAST(CASE WHEN n_px > 0 THEN (1000000 * d1) // (n_px * n_ref * {n_bins - 1})
       ELSE 0 END AS BIGINT) AS emd_ppm
FROM agg
"""
