"""Radius of gyration per user — THE human-mobility statistic
(Gonzalez, Hidalgo & Barabasi 2008): the RMS distance of a user's pings
from their own centroid, the "how far does this entity roam" scalar that
separates commuters from travelers and powers mobility-based sampling /
anomaly gates.

    rg^2 = (1/n) Σ |p_i - centroid|^2
         = [ n·(Σx² + Σy²) − (Σx)² − (Σy)² ] / n²

Exactness: coordinates floor-quantize to 1e-4-deg integers (the
trajectory_lengths device); the numerator is exact BIGINT; the checked
projection carries the ONCE-divided `rg2_d = num DIV n²` (floor — num is
provably >= 0 by Cauchy-Schwarz so trunc == floor in both engines), the
integer `rg_e4 = floor(sqrt(rg2_d))` through the shared floor-sqrt text,
and the centroid in the shared NONNEG-REMAINDER floor division
(`trend._floor_div` — Σx goes negative west of Greenwich, where Spark
`div` truncates and DuckDB `//` floors; the adjustment makes both
floor). Overflow is GUARDED per user (the acf device): raises when any
user's n·max|q| > 3e9.

Scale shape (100 TB): ONE map-side-combined hash agg per user (five
integers), then pure projection — no window, no join, no Python; the
guard is a second bounded agg."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .trend import _floor_div


def gyration(pings: DataFrame) -> DataFrame:
    """(user_id, n_pings, cx_e4, cy_e4, rg2_d, rg_e4) from pings carrying
    (user_id, x double, y double)."""
    q = pings.selectExpr(
        "user_id",
        "CAST(floor(x * 10000.0) AS BIGINT) AS xq",
        "CAST(floor(y * 10000.0) AS BIGINT) AS yq",
    )
    g = (
        q.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.max(F.greatest(F.abs("xq"), F.abs("yq"))).alias("qm"),
        )
        .agg(F.max(F.expr("n * qm")).alias("bound"))
        .first()
    )
    if g["bound"] is not None and g["bound"] > 3_000_000_000:
        raise RuntimeError(
            f"gyration: max user n * max|q| = {g['bound']} > 3e9 — "
            "(Σx)² would overflow int64; rescale the coordinate units"
        )
    agg = q.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("xq").cast("long").alias("sx"),
        F.sum("yq").cast("long").alias("sy"),
        F.expr("CAST(SUM(xq * xq + yq * yq) AS BIGINT)").alias("s2"),
    )
    cx = _floor_div("sx", "n", "spark")
    cy = _floor_div("sy", "n", "spark")
    return (
        agg.selectExpr(
            "CAST(user_id AS BIGINT) AS user_id",
            "n AS n_pings",
            f"CAST({cx} AS BIGINT) AS cx_e4",
            f"CAST({cy} AS BIGINT) AS cy_e4",
            "CAST((n * s2 - sx * sx - sy * sy) DIV (n * n) AS BIGINT)"
            " AS rg2_d",
        )
        .selectExpr(
            "user_id", "n_pings", "cx_e4", "cy_e4", "rg2_d",
            "CAST(floor(sqrt(CAST(rg2_d AS DOUBLE))) AS BIGINT) AS rg_e4",
        )
    )


def oracle_gyration_sql(pings_sql: str) -> str:
    """DuckDB mirror over a subquery yielding (user_id, x, y)."""
    cx = _floor_div("sx", "n", "duckdb")
    cy = _floor_div("sy", "n", "duckdb")
    return f"""
WITH p AS ({pings_sql}),
q AS (
  SELECT user_id, CAST(floor(x * 10000.0) AS BIGINT) AS xq,
    CAST(floor(y * 10000.0) AS BIGINT) AS yq
  FROM p
),
agg AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(xq) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
    CAST(SUM(xq * xq + yq * yq) AS BIGINT) AS s2
  FROM q GROUP BY 1
),
base AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, n AS n_pings,
    CAST({cx} AS BIGINT) AS cx_e4,
    CAST({cy} AS BIGINT) AS cy_e4,
    CAST((n * s2 - sx * sx - sy * sy) // (n * n) AS BIGINT) AS rg2_d
  FROM agg
)
SELECT user_id, n_pings, cx_e4, cy_e4, rg2_d,
  CAST(floor(sqrt(CAST(rg2_d AS DOUBLE))) AS BIGINT) AS rg_e4
FROM base
"""
