"""Segment-intersection join — "which trajectory hops cross?" — the
line×line spatial join completing the PIP (point×polygon), distance-band
(point×point), and footprint-overlap (rect×rect) family.

Exact integer geometry end to end: endpoints live on a 1e-4-deg grid, the
crossing test is the classic 4-orientation predicate (cross products in
int64, collinear touch handled by on-segment box tests), and the SAME
predicate text runs in Spark and DuckDB (one formula, two engines) — no
float epsilon anywhere.

Scale shape: candidates come from a coarse-bin cover of each segment's
bbox (two intersecting segments share the bin containing the crossing
point, so the cover equi-join is a proven superset); coordinates ride the
explode so no geometry re-join; pairs dedupe as ID+coord rows; the exact
refine is a JVM filter. A loud per-bin guard (the ngram-block device)
raises before scheduling quadratic work on a pathological hot bin."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BIN = 10_000  # 1-degree bins over the 1e-4-deg grid


def intersect_expr() -> str:
    """Shared predicate text over columns (axq, ayq, bxq, byq) = segment 1
    and (cxq, cyq, dxq, dyq) = segment 2: true iff closed segments AB and
    CD share at least one point."""
    d1 = "((dxq - cxq) * (ayq - cyq) - (dyq - cyq) * (axq - cxq))"
    d2 = "((dxq - cxq) * (byq - cyq) - (dyq - cyq) * (bxq - cxq))"
    d3 = "((bxq - axq) * (cyq - ayq) - (byq - ayq) * (cxq - axq))"
    d4 = "((bxq - axq) * (dyq - ayq) - (byq - ayq) * (dxq - axq))"

    def on(px, py, qx, qy, rx, ry):
        return (
            f"({rx} BETWEEN LEAST({px}, {qx}) AND GREATEST({px}, {qx}) "
            f"AND {ry} BETWEEN LEAST({py}, {qy}) AND GREATEST({py}, {qy}))"
        )

    proper = (
        f"((({d1} > 0 AND {d2} < 0) OR ({d1} < 0 AND {d2} > 0)) "
        f"AND (({d3} > 0 AND {d4} < 0) OR ({d3} < 0 AND {d4} > 0)))"
    )
    touches = " OR ".join(
        [
            f"({d1} = 0 AND {on('cxq', 'cyq', 'dxq', 'dyq', 'axq', 'ayq')})",
            f"({d2} = 0 AND {on('cxq', 'cyq', 'dxq', 'dyq', 'bxq', 'byq')})",
            f"({d3} = 0 AND {on('axq', 'ayq', 'bxq', 'byq', 'cxq', 'cyq')})",
            f"({d4} = 0 AND {on('axq', 'ayq', 'bxq', 'byq', 'dxq', 'dyq')})",
        ]
    )
    return f"({proper} OR {touches})"


def proper_expr() -> str:
    d1 = "((dxq - cxq) * (ayq - cyq) - (dyq - cyq) * (axq - cxq))"
    d2 = "((dxq - cxq) * (byq - cyq) - (dyq - cyq) * (bxq - cxq))"
    d3 = "((bxq - axq) * (cyq - ayq) - (byq - ayq) * (cxq - axq))"
    d4 = "((bxq - axq) * (dyq - ayq) - (byq - ayq) * (dxq - axq))"
    return (
        f"((({d1} > 0 AND {d2} < 0) OR ({d1} < 0 AND {d2} > 0)) "
        f"AND (({d3} > 0 AND {d4} < 0) OR ({d3} < 0 AND {d4} > 0)))"
    )


def segment_intersections(
    segs: DataFrame, max_bin: int = 200_000
) -> DataFrame:
    """(seg_a, seg_b, kind): all intersecting cross-user segment pairs.

    `segs` carries (seg_id, user_id, axq, ayq, bxq, byq) with integer
    grid endpoints. kind = 'proper' (interiors cross) or 'touch'
    (endpoint/collinear contact)."""
    binned = (
        segs.withColumn(
            "gx",
            F.explode(
                F.sequence(
                    F.expr(f"LEAST(axq, bxq) div {BIN}"),
                    F.expr(f"GREATEST(axq, bxq) div {BIN}"),
                )
            ),
        )
        .withColumn(
            "gy",
            F.explode(
                F.sequence(
                    F.expr(f"LEAST(ayq, byq) div {BIN}"),
                    F.expr(f"GREATEST(ayq, byq) div {BIN}"),
                )
            ),
        )
        .withColumn("bin", F.expr("gx * 1024 + gy"))
        .drop("gx", "gy")
    )
    hot = (
        binned.groupBy("bin")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > max_bin)
        .take(1)
    )
    if hot:
        raise ValueError(
            f"segment_intersections: bin {hot[0]['bin']} holds "
            f"{hot[0]['n']} segments (> max_bin={max_bin}); refine the "
            "binning resolution before scheduling quadratic work"
        )
    a = binned.selectExpr(
        "bin", "seg_id AS seg_a", "user_id AS ua",
        "axq", "ayq", "bxq", "byq",
    )
    b = binned.selectExpr(
        "bin", "seg_id AS seg_b", "user_id AS ub",
        "axq AS cxq", "ayq AS cyq", "bxq AS dxq", "byq AS dyq",
    )
    cand = (
        a.join(b, "bin")
        .where("seg_a < seg_b AND ua != ub")
        .drop("bin", "ua", "ub")
        .distinct()
    )
    hit = cand.where(F.expr(intersect_expr()))
    return hit.select(
        F.col("seg_a").cast("long").alias("seg_a"),
        F.col("seg_b").cast("long").alias("seg_b"),
        F.when(F.expr(proper_expr()), F.lit("proper"))
        .otherwise(F.lit("touch"))
        .alias("kind"),
    )


def oracle_segments_sql(segs_cte: str) -> str:
    """DuckDB mirror: brute-force ALL cross-user pairs (no bins — a cover
    bug on the Spark side cannot cancel) with the identical predicate."""
    return f"""
WITH {segs_cte},
pairs AS (
  SELECT s1.seg_id AS seg_a, s2.seg_id AS seg_b,
    s1.axq, s1.ayq, s1.bxq, s1.byq,
    s2.axq AS cxq, s2.ayq AS cyq, s2.bxq AS dxq, s2.byq AS dyq
  FROM segs s1 JOIN segs s2
    ON s1.seg_id < s2.seg_id AND s1.user_id != s2.user_id
)
SELECT CAST(seg_a AS BIGINT) AS seg_a, CAST(seg_b AS BIGINT) AS seg_b,
  CASE WHEN {proper_expr()} THEN 'proper' ELSE 'touch' END AS kind
FROM pairs WHERE {intersect_expr()}
"""
