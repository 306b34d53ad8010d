"""Histogram equalization — the contrast-normalization remap table, per
(image, band), computed without ever shuffling a pixel.

The classic transfer function over the value histogram:

    eq(v) = floor( (cdf(v) - cdf_min) * 255 / (n_px - cdf_min) )

with cdf(v) = #pixels <= v, cdf_min = cdf at the smallest PRESENT value.
Every quantity is an exact integer, so Spark and the DuckDB oracle agree to
the bit; the degenerate flat image (n_px == cdf_min, a single distinct
value) maps to 0 by definition in both engines.

Scale shape (the zonal_quantiles histogram-decomposition trick,
zonal.py:362): the map side emits the SPARSE per-(image, band) value
histogram (<= 256 rows per band regardless of pixel count) from one Arrow
decode pass; the only exchange carries those bounded histogram rows to a
single window partitioned by (image_id, band). Applying the LUT to pixels
is a map-side broadcast-join-free rejoin the caller does next to the
decode — the remap TABLE is the operator output, pixels never enter an
exchange. Parity target: a raster engine's `equalize` / contrast-stretch
stage over aira's decoded chunks (crates/aira-tiff/src/decoder.rs decode
surface; the reference ships no stretch op — this extends the domain)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .zonal import band_histogram


def equalize_lut(images: DataFrame) -> DataFrame:
    """(image_id, band, value, cnt, cdf, eq_val): the exact equalization
    look-up table for every present pixel value of every band."""
    hist = band_histogram(images)
    byband = Window.partitionBy("image_id", "band")
    cum = Window.partitionBy("image_id", "band").orderBy("value")
    return (
        hist.withColumn("cdf", F.sum("cnt").over(cum))
        .withColumn("n", F.sum("cnt").over(byband))
        .withColumn("cdf_min", F.min("cdf").over(byband))
        .select(
            "image_id",
            F.col("band").cast("long").alias("band"),
            F.col("value").cast("long").alias("value"),
            F.col("cnt").cast("long").alias("cnt"),
            F.col("cdf").cast("long").alias("cdf"),
            F.expr(
                "CAST(CASE WHEN n = cdf_min THEN 0 ELSE "
                "CAST((cdf - cdf_min) * 255 AS BIGINT) DIV (n - cdf_min) "
                "END AS BIGINT)"
            ).alias("eq_val"),
        )
    )


def oracle_equalize_sql(bands_cte: str) -> str:
    """DuckDB mirror over a CTE chain ending in `bands(image_id, ..., value
    per pixel)` — the band_histogram oracle's pixel reconstruction."""
    return f"""
WITH {bands_cte},
hist AS (
  SELECT image_id, CAST(s AS BIGINT) AS band,
         CAST((r * 7 + c * 13 + s * 29 + k) % 256 AS BIGINT) AS value,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM bands GROUP BY 1, 2, 3
),
cdf AS (
  SELECT *,
    SUM(cnt) OVER (PARTITION BY image_id, band ORDER BY value) AS cdf,
    SUM(cnt) OVER (PARTITION BY image_id, band) AS n
  FROM hist
),
lut AS (
  SELECT *, MIN(cdf) OVER (PARTITION BY image_id, band) AS cdf_min FROM cdf
)
SELECT image_id, band, value, cnt, CAST(cdf AS BIGINT) AS cdf,
  CAST(CASE WHEN n = cdf_min THEN 0
       ELSE ((cdf - cdf_min) * 255) // (n - cdf_min) END AS BIGINT) AS eq_val
FROM lut
"""


def texture_stats(images: DataFrame) -> DataFrame:
    """(image_id, band, n_px, n_distinct, max_cnt, gini_e6): per-band value
    diversity — Gini impurity 1 - Σ(c/n)² as the log-free texture /
    complexity measure (flat fills score 0, uniform noise approaches 1;
    the curation signal for blank/synthetic-image filtering).

    Exactness: gini_e6 = ((n² - Σc²) * 1e6) DIV n² — pure integer
    arithmetic over exact counts (entropy would drag libm logs into the
    checked output; Gini ranks the same way). Shape: rides band_histogram's
    one-decode sparse histogram; the fold is a ≤256-row-per-band hash agg,
    pixels never shuffle."""
    hist = band_histogram(images)
    return (
        hist.groupBy("image_id", F.col("band").cast("long").alias("band"))
        .agg(
            F.sum("cnt").cast("long").alias("n_px"),
            F.count("*").cast("long").alias("n_distinct"),
            F.max("cnt").cast("long").alias("max_cnt"),
            F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("sum_c2"),
        )
        .selectExpr(
            "image_id", "band", "n_px", "n_distinct", "max_cnt",
            "CAST(((n_px * n_px - sum_c2) * 1000000) DIV (n_px * n_px)"
            " AS BIGINT) AS gini_e6",
        )
    )


def oracle_texture_sql(bands_cte: str) -> str:
    """DuckDB mirror over the bands CTE (one row per pixel per band)."""
    return f"""
WITH {bands_cte},
hist AS (
  SELECT image_id, CAST(s AS BIGINT) AS band,
         (r * 7 + c * 13 + s * 29 + k) % 256 AS value,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM bands GROUP BY 1, 2, 3
),
st AS (
  SELECT image_id, band, CAST(SUM(cnt) AS BIGINT) AS n_px,
    CAST(COUNT(*) AS BIGINT) AS n_distinct,
    CAST(MAX(cnt) AS BIGINT) AS max_cnt,
    CAST(SUM(cnt * cnt) AS BIGINT) AS sum_c2
  FROM hist GROUP BY 1, 2
)
SELECT image_id, band, n_px, n_distinct, max_cnt,
  CAST(((n_px * n_px - sum_c2) * 1000000) // (n_px * n_px) AS BIGINT) AS gini_e6
FROM st
"""


def match_lut(images: DataFrame) -> DataFrame:
    """(image_id, band, value, cnt, match_val): the histogram-MATCHING
    remap table per (image, band) against the POOLED corpus reference —
    corpus-level tonal normalization (the multi-scene mosaic/balancing
    stage next to per-image equalization).

    Classic quantile matching, kept exact: match_val = the smallest
    reference value r with cdf_ref(r)/n_ref >= cdf_img(v)/n_img, decided
    by the cross-multiplied integer predicate cdf_ref(r) * n_img >=
    cdf_img(v) * n_ref (no division, no float). A match always exists:
    cdf_ref(max present r) = n_ref bounds the inequality.

    Scale shape: both sides ride band_histogram's one-decode sparse
    histogram. The per-image CDF is the equalize window over <= 256 rows
    per band; the REFERENCE is the <= 256-rows-per-band pooled histogram
    (a bounded two-stage agg), which BROADCASTS to a <= 256-candidate
    map-side min per LUT row — pixels never enter an exchange, and no
    stage's width depends on corpus size. The histogram feeds BOTH sides,
    so it is pinned with an eager localCheckpoint (SURVEY §8 rule #4 —
    the hits_fixed lesson): without the pin each side re-executes the
    whole Arrow decode pass (measured 27.3s -> 9.5s scoped at sf0.1);
    the pinned state is the bounded <= 256-rows-per-band table, never
    pixels."""
    hist = band_histogram(images).localCheckpoint(eager=True)
    cum = Window.partitionBy("image_id", "band").orderBy("value")
    byband = Window.partitionBy("image_id", "band")
    img = (
        hist.withColumn("cdf", F.sum("cnt").over(cum))
        .withColumn("n", F.sum("cnt").over(byband))
    )
    rcum = Window.partitionBy("band").orderBy("value")
    rband = Window.partitionBy("band")
    ref = (
        hist.groupBy("band", "value")
        .agg(F.sum("cnt").alias("rcnt"))
        .withColumn("cdf_ref", F.sum("rcnt").over(rcum))
        .withColumn("n_ref", F.sum("rcnt").over(rband))
        .selectExpr("band", "value AS r", "cdf_ref", "n_ref")
    )
    # the reference collapses to ONE sorted (r, cdf_ref) array per band
    # (<= 256 entries): the per-LUT-row search is then a map-side array
    # scan (filter + head) instead of a 256x row fan-out through a
    # broadcast join + re-aggregate (measured 25.4s -> 2.9s scoped at
    # sf0.1). cdf_ref is monotone in r, so the first passing element IS
    # the minimum.
    ref_arr = ref.groupBy("band").agg(
        F.sort_array(F.collect_list(F.struct("r", "cdf_ref"))).alias("refs"),
        F.max("n_ref").alias("n_ref"),
    )
    return (
        img.join(F.broadcast(ref_arr), "band")
        .withColumn(
            "match_val",
            F.element_at(
                F.filter(
                    "refs",
                    lambda x: x["cdf_ref"] * F.col("n")
                    >= F.col("cdf") * F.col("n_ref"),
                ),
                1,
            )["r"],
        )
        .select(
            "image_id",
            F.col("band").cast("long").alias("band"),
            F.col("value").cast("long").alias("value"),
            F.col("cnt").cast("long").alias("cnt"),
            F.col("match_val").cast("long").alias("match_val"),
        )
    )


def otsu_threshold(images: DataFrame) -> DataFrame:
    """(image_id, band, thr, n_bg, n_fg, d): Otsu's binarization threshold
    per (image, band) — the classic automatic foreground/background split
    (Otsu 1979), the segmentation stage downstream of equalization.

    Otsu maximizes the between-class variance sigma_B^2(t) =
    n0*n1*(mu0-mu1)^2 / n^2 over thresholds t (background = values <= t).
    With exact integer histogram moments (n0 = cdf(t), s0 = sum of v*cnt
    for v <= t) the n-invariant objective is d(t)^2 / b(t) with

        d(t) = s0*(n-n0) - (S-s0)*n0     (= s0*n1 - s1*n0)
        b(t) = n0*(n-n0)

    and the argmax is decided WITHOUT division or floats: candidate c2
    beats c1 iff d2^2*b1 > d1^2*b2, evaluated in 128-bit exact integers
    (Spark DECIMAL(38,0) / DuckDB HUGEINT, the gi_hotspots widening).
    Magnitude budget: |d| <= 255*n^2/4 fits BIGINT to n ~ 380k px/band;
    d^2*b <= 1015*n^6/64 stays under 1e38 to n ~ 460k — both clear the
    IMG_SCALE=8 bench maximum (196k) with headroom. Ties break to the
    SMALLEST threshold (a stated convention, identical in both engines).
    Flat bands (one distinct value, cdf == n everywhere) have no valid
    split and emit no row.

    Scale shape: rides band_histogram's one-decode sparse histogram; the
    only exchange is <= 256 rows per band into the cdf window, and the
    argmax is an equi-keyed ANTI self-join whose per-group quadratic is
    hard-bounded by the 256-value domain. Pixels never enter an exchange,
    and no stage's width depends on corpus size."""
    hist = band_histogram(images)
    byband = Window.partitionBy("image_id", "band")
    cum = Window.partitionBy("image_id", "band").orderBy("value")
    cand = (
        hist.withColumn("cdf", F.sum("cnt").over(cum))
        .withColumn("s0", F.sum(F.col("value") * F.col("cnt")).over(cum))
        .withColumn("n", F.sum("cnt").over(byband))
        .withColumn("s", F.sum(F.col("value") * F.col("cnt")).over(byband))
        .where(F.col("cdf") < F.col("n"))
        .selectExpr(
            "image_id",
            "CAST(band AS BIGINT) AS band",
            "CAST(value AS BIGINT) AS thr",
            "CAST(cdf AS BIGINT) AS n_bg",
            "CAST(n - cdf AS BIGINT) AS n_fg",
            "CAST(s0 * (n - cdf) - (s - s0) * cdf AS BIGINT) AS d",
            "CAST(cdf * (n - cdf) AS BIGINT) AS b",
        )
    )
    # conservative float PREFILTER before the exact compare: the true
    # argmax of d^2/b always survives "fk >= max(fk) * (1 - 1e-9)" (double
    # relative error ~1e-16 << the margin), so the exact 128-bit anti-join
    # runs over the 1-3 survivors per group instead of all ~256 candidates
    # (65k compares/band -> ~4). Floats only PRUNE; every emitted value is
    # still decided by exact integers, so engine parity is untouched.
    grp = Window.partitionBy("image_id", "band")
    cand = (
        cand.withColumn(
            "fk", F.expr("CAST(d AS DOUBLE) * CAST(d AS DOUBLE) / b")
        )
        .withColumn("fmax", F.max("fk").over(grp))
        .where(F.expr("fk >= fmax * (1.0 - 1e-9)"))
        .drop("fk", "fmax")
        # pinned: the anti-join below references the survivors TWICE (c1
        # and c2) — without the pin each side re-runs the decode + window
        # chain (SURVEY §8 rule #4); the pinned state is 1-3 rows/band
        .localCheckpoint(eager=True)
    )
    c1, c2 = cand.alias("c1"), cand.alias("c2")
    w = "CAST({} AS DECIMAL(38,0))"
    a2 = f"{w.format('c2.d')} * c2.d * c1.b"
    a1 = f"{w.format('c1.d')} * c1.d * c2.b"
    beats = F.expr(f"({a2} > {a1}) OR ({a2} = {a1} AND c2.thr < c1.thr)")
    return c1.join(
        c2,
        (F.col("c1.image_id") == F.col("c2.image_id"))
        & (F.col("c1.band") == F.col("c2.band"))
        & beats,
        "left_anti",
    ).select("image_id", "band", "thr", "n_bg", "n_fg", "d")


def oracle_otsu_sql(bands_cte: str) -> str:
    """DuckDB mirror: same histogram windows, same candidate algebra, same
    cross-multiplied 128-bit argmax as a NOT EXISTS anti-join."""
    return f"""
WITH {bands_cte},
hist AS (
  SELECT image_id, CAST(s AS BIGINT) AS band,
         CAST((r * 7 + c * 13 + s * 29 + k) % 256 AS BIGINT) AS value,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM bands GROUP BY 1, 2, 3
),
cdf AS (
  SELECT image_id, band, value, cnt,
    SUM(cnt) OVER w AS cdf,
    SUM(value * cnt) OVER w AS s0,
    SUM(cnt) OVER (PARTITION BY image_id, band) AS n,
    SUM(value * cnt) OVER (PARTITION BY image_id, band) AS s
  FROM hist
  WINDOW w AS (PARTITION BY image_id, band ORDER BY value)
),
cand AS (
  SELECT image_id, band, value AS thr,
    CAST(cdf AS BIGINT) AS n_bg,
    CAST(n - cdf AS BIGINT) AS n_fg,
    CAST(s0 * (n - cdf) - (s - s0) * cdf AS BIGINT) AS d,
    CAST(cdf * (n - cdf) AS BIGINT) AS b
  FROM cdf WHERE cdf < n
)
SELECT c1.image_id, c1.band, c1.thr, c1.n_bg, c1.n_fg, c1.d
FROM cand c1
WHERE NOT EXISTS (
  SELECT 1 FROM cand c2
  WHERE c2.image_id = c1.image_id AND c2.band = c1.band
    AND (CAST(c2.d AS HUGEINT) * c2.d * c1.b
           > CAST(c1.d AS HUGEINT) * c1.d * c2.b
         OR (CAST(c2.d AS HUGEINT) * c2.d * c1.b
               = CAST(c1.d AS HUGEINT) * c1.d * c2.b
             AND c2.thr < c1.thr))
)
"""


def oracle_match_sql(bands_cte: str) -> str:
    """DuckDB mirror over the bands CTE: same sparse histograms, same
    window CDFs, same cross-multiplied quantile-matching predicate."""
    return f"""
WITH {bands_cte},
hist AS (
  SELECT image_id, CAST(s AS BIGINT) AS band,
         CAST((r * 7 + c * 13 + s * 29 + k) % 256 AS BIGINT) AS value,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM bands GROUP BY 1, 2, 3
),
icdf AS (
  SELECT *,
    SUM(cnt) OVER (PARTITION BY image_id, band ORDER BY value) AS cdf,
    SUM(cnt) OVER (PARTITION BY image_id, band) AS n
  FROM hist
),
refh AS (
  SELECT band, value AS r, CAST(SUM(cnt) AS BIGINT) AS rcnt
  FROM hist GROUP BY 1, 2
),
ref AS (
  SELECT band, r,
    SUM(rcnt) OVER (PARTITION BY band ORDER BY r) AS cdf_ref,
    SUM(rcnt) OVER (PARTITION BY band) AS n_ref
  FROM refh
)
SELECT i.image_id, i.band, i.value, i.cnt,
  CAST(MIN(CASE WHEN ref.cdf_ref * i.n >= i.cdf * ref.n_ref
       THEN ref.r END) AS BIGINT) AS match_val
FROM icdf i JOIN ref ON ref.band = i.band
GROUP BY 1, 2, 3, 4
"""


def stretch_lut(
    images: DataFrame, lo_pct: int = 2, hi_pct: int = 98
) -> DataFrame:
    """(image_id, band, value, cnt, out_val): the percentile contrast
    stretch remap table per (image, band) — GDAL `-scale` with
    `-exponent 1` parity at [lo_pct, hi_pct] clip points (the default
    2-98% linear stretch next to full equalization).

    Exact integers end to end: the clip points are order statistics read
    off the cumulative histogram with the zonal_quantiles cross-multiplied
    rank predicate (p = smallest value with cdf*100 >= n*pct); the remap is

        out = clamp( (v - lo) * 255 DIV (hi - lo), 0, 255 )

    with DIV truncation identical in both engines; degenerate bands
    (hi == lo) map every value to 0 by convention. Scale shape: identical
    to equalize_lut — one decode pass emits the <=256-row sparse
    histogram, ONE window exchange, pure-projection remap; pixels never
    shuffle."""
    hist = band_histogram(images)
    byband = Window.partitionBy("image_id", "band")
    cum = Window.partitionBy("image_id", "band").orderBy("value")
    cdf = (
        hist.withColumn("cdf", F.sum("cnt").over(cum))
        .withColumn("n", F.sum("cnt").over(byband))
        # pinned: consumed TWICE below (clip-point agg + LUT join) —
        # without the pin each consumer re-runs the decode + window chain
        # (SURVEY §8 rule #4); the pinned state is <= 256 rows per band
        .localCheckpoint(eager=True)
    )
    lo = f"MIN(CASE WHEN cdf * 100 >= n * {lo_pct} THEN value END)"
    hi = f"MIN(CASE WHEN cdf * 100 >= n * {hi_pct} THEN value END)"
    clips = (
        cdf.groupBy("image_id", "band")
        .agg(F.expr(f"{lo} AS lo"), F.expr(f"{hi} AS hi"))
    )
    return (
        cdf.join(clips, ["image_id", "band"])
        .selectExpr(
            "image_id",
            "CAST(band AS BIGINT) AS band",
            "CAST(value AS BIGINT) AS value",
            "CAST(cnt AS BIGINT) AS cnt",
            "CAST(CASE WHEN hi = lo THEN 0 ELSE "
            "LEAST(GREATEST((value - lo) * 255 DIV (hi - lo), 0), 255) "
            "END AS BIGINT) AS out_val",
        )
    )


def oracle_stretch_sql(
    bands_cte: str, lo_pct: int = 2, hi_pct: int = 98
) -> str:
    """DuckDB mirror: same histogram windows, same rank predicate, same
    clamped integer remap."""
    return f"""
WITH {bands_cte},
hist AS (
  SELECT image_id, CAST(s AS BIGINT) AS band,
         CAST((r * 7 + c * 13 + s * 29 + k) % 256 AS BIGINT) AS value,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM bands GROUP BY 1, 2, 3
),
cdf AS (
  SELECT *,
    SUM(cnt) OVER (PARTITION BY image_id, band ORDER BY value) AS cdf,
    SUM(cnt) OVER (PARTITION BY image_id, band) AS n
  FROM hist
),
clips AS (
  SELECT image_id, band,
    MIN(CASE WHEN cdf * 100 >= n * {lo_pct} THEN value END) AS lo,
    MIN(CASE WHEN cdf * 100 >= n * {hi_pct} THEN value END) AS hi
  FROM cdf GROUP BY 1, 2
)
SELECT c.image_id, c.band, c.value, c.cnt,
  CAST(CASE WHEN cl.hi = cl.lo THEN 0 ELSE
    LEAST(GREATEST((c.value - cl.lo) * 255 // (cl.hi - cl.lo), 0), 255)
  END AS BIGINT) AS out_val
FROM cdf c JOIN clips cl ON cl.image_id = c.image_id AND cl.band = c.band
"""
