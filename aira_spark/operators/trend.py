"""Per-cell temporal trend — exact-integer OLS slope of daily activity per
grid cell (the change-over-time raster for event data: growth/decay per
neighborhood, the longitudinal complement of point_density's snapshot).

Closed-form simple regression over (x = day index, y = daily cents):

    slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²)

Every sufficient statistic is an exact BIGINT (cents and day indexes), so
numerator and denominator are bit-identical in any engine at any
parallelism; the quotient ships as slope_e6 through the shared
nonneg-remainder floor-division text (kmeans.py's device — Spark `div`
truncates toward zero, `//` floors, the adjustment makes both floor).
Constant cells (one active day, den = 0) report slope 0 with n_days = 1
visible.

Scale shape: one (cell, day) hash agg folds the stream map-side (bounded
at cells × days rows), one (cell) agg computes the five sufficient sums —
no window, no join, two exchanges total."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _floor_div(s: str, c: str, engine: str) -> str:
    num = f"(({s}) - ((({s}) % ({c})) + ({c})) % ({c}))"
    op = "div" if engine == "spark" else "//"
    return f"({num} {op} ({c}))"


_SLOPE_NUM = "(n_days * sxy - sx * sy)"
_SLOPE_DEN = "(n_days * sxx - sx * sx)"


def cell_trends(events: DataFrame) -> DataFrame:
    """(cell, n_days, sx, sy, sxy, sxx, slope_e6) from events carrying
    (cell, day, cents)."""
    daily = events.groupBy("cell", "day").agg(
        F.sum("cents").cast("long").alias("y")
    )
    stats = daily.groupBy("cell").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("day").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("day") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("day") * F.col("day")).cast("long").alias("sxx"),
    )
    slope = _floor_div(f"{_SLOPE_NUM} * 1000000", _SLOPE_DEN, "spark")
    return stats.select(
        F.col("cell").cast("long").alias("cell"),
        "n_days", "sx", "sy", "sxy", "sxx",
        F.expr(
            f"CAST(CASE WHEN {_SLOPE_DEN} = 0 THEN 0 ELSE {slope} END AS BIGINT)"
        ).alias("slope_e6"),
    )


def oracle_trend_sql(events_sql: str) -> str:
    """DuckDB mirror over a subquery yielding (cell, day, cents)."""
    slope = _floor_div(f"{_SLOPE_NUM} * 1000000", _SLOPE_DEN, "duck")
    return f"""
WITH ev AS ({events_sql}),
daily AS (
  SELECT cell, day, CAST(SUM(cents) AS BIGINT) AS y FROM ev GROUP BY 1, 2
),
stats AS (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_days,
    CAST(SUM(day) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
    CAST(SUM(day * y) AS BIGINT) AS sxy,
    CAST(SUM(day * day) AS BIGINT) AS sxx
  FROM daily GROUP BY 1
)
SELECT CAST(cell AS BIGINT) AS cell, n_days, sx, sy, sxy, sxx,
  CAST(CASE WHEN {_SLOPE_DEN} = 0 THEN 0 ELSE {slope} END AS BIGINT) AS slope_e6
FROM stats
"""


_DEV2 = "(n_days * y - sy) * (n_days * y - sy)"
_VAR_N2 = "(n_days * syy - sy * sy)"  # n^2 * variance


def cell_anomalies(events: DataFrame, k: int = 3) -> DataFrame:
    """(cell, day, y, n_days, dev2, thr, is_anomaly): days whose activity
    deviates more than k sigma from the cell's own daily mean — the
    monitoring alarm next to cell_trends, with the z-test done ENTIRELY in
    integers: z^2 >= k^2 is equivalent to (n*y - sy)^2 >= k^2*(n*syy - sy^2)
    (both sides scaled by n^2), so no sqrt, no division, no float ever
    enters the verdict and every engine agrees bit-for-bit.

    Scale shape: the daily fold (one map-side-combined agg), the per-cell
    moment agg over the BOUNDED daily table, and one broadcast-sized join
    back — cells x days rows end to end. Cells with a single active day
    have zero variance and flag nothing (dev2 = 0 = thr)."""
    daily = events.groupBy("cell", "day").agg(
        F.sum("cents").cast("long").alias("y")
    )
    stats = daily.groupBy("cell").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    return (
        daily.join(stats, "cell")
        .selectExpr(
            "CAST(cell AS BIGINT) AS cell",
            "CAST(day AS BIGINT) AS day",
            "y",
            "n_days",
            f"CAST({_DEV2} AS BIGINT) AS dev2",
            f"CAST({k * k} * {_VAR_N2} AS BIGINT) AS thr",
            f"CAST(CASE WHEN {_DEV2} > {k * k} * {_VAR_N2} THEN 1 ELSE 0 END"
            " AS BIGINT) AS is_anomaly",
        )
    )


def oracle_anomalies_sql(events_sql: str, k: int = 3) -> str:
    return f"""
WITH ev AS ({events_sql}),
daily AS (
  SELECT cell, day, CAST(SUM(cents) AS BIGINT) AS y FROM ev GROUP BY 1, 2
),
stats AS (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_days,
    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(y * y) AS BIGINT) AS syy
  FROM daily GROUP BY 1
)
SELECT CAST(cell AS BIGINT) AS cell, CAST(day AS BIGINT) AS day, y, n_days,
  CAST({_DEV2} AS BIGINT) AS dev2,
  CAST({k * k} * {_VAR_N2} AS BIGINT) AS thr,
  CAST(CASE WHEN {_DEV2} > {k * k} * {_VAR_N2} THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM (
  SELECT d.cell, d.day, d.y, s.n_days, s.sy, s.syy
  FROM daily d JOIN stats s ON s.cell = d.cell
)
"""
