"""Theil-Sen robust trend — the median-of-pairwise-slopes estimator
(Theil 1950; Sen 1968, "Estimates of the regression coefficient based on
Kendall's tau") per grid cell, the breakdown-resistant complement of
`trend.cell_trends`' OLS slope: a single wild day (sensor glitch, load
spike) moves the OLS line arbitrarily but shifts the Sen slope by at most
one order statistic — the standard trend detector for noisy per-cell
environmental series (Mann-Kendall's companion estimator).

    sen = median{ (y_j - y_i) / (d_j - d_i) : d_i < d_j }

Exactness: every pairwise slope ships as floor fixed point through the
shared nonneg-remainder floor-division text (`trend._floor_div` — Spark
`div` truncates toward zero, DuckDB `//` floors; the adjustment makes
both floor, and numerators go negative on decaying cells so this
matters). The median is the LOWER median — the order statistic at rank
`(n_pairs + 1) DIV 2` under the total order (slope_e6, d1, d2) — never
an average of two middles, so both engines pick the identical element.

Scale shape (100 TB): the daily roll-up folds the raw stream map-side to
at most cells x days rows BEFORE any pair is formed, and the pair join is
per-cell with fan-out bounded by days^2 — a CALENDAR bound (366 days ->
<= 66k pairs per cell), not a data bound, so the operator cannot go
quadratic no matter how many raw events land in one cell. One shuffle to
(cell, day), one to cell for the self-join, and the rank + count ride a
single window partition; cells with a lone active day (no pairs) stay
visible through the LEFT join from the always-present per-cell census.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aira_spark.operators.trend import _floor_div


def sen_trends(events: DataFrame) -> DataFrame:
    """(cell, n_days, n_pairs, sen_slope_e6) from events carrying
    (cell, day, cents): lower-median Theil-Sen slope of the daily sums."""
    daily = (
        events.groupBy("cell", "day")
        .agg(F.sum("cents").cast("long").alias("y"))
    )
    a = daily.select("cell", F.col("day").alias("d1"), F.col("y").alias("y1"))
    b = daily.select("cell", F.col("day").alias("d2"), F.col("y").alias("y2"))
    slope = _floor_div("(y2 - y1) * 1000000", "(d2 - d1)", "spark")
    pairs = (
        a.join(b, "cell")
        .where("d1 < d2")
        .selectExpr("cell", "d1", "d2", f"CAST({slope} AS BIGINT) AS slope_e6")
    )
    w = Window.partitionBy("cell")
    ranked = pairs.select(
        "cell", "slope_e6",
        F.row_number().over(w.orderBy("slope_e6", "d1", "d2")).alias("rn"),
        F.count("*").over(w).alias("n_pairs"),
    )
    med = ranked.where("rn = (n_pairs + 1) DIV 2").select(
        "cell", F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("slope_e6").alias("sen_slope_e6"),
    )
    census = daily.groupBy("cell").agg(
        F.count("*").cast("long").alias("n_days")
    )
    return census.join(med, "cell", "left").selectExpr(
        "CAST(cell AS BIGINT) AS cell",
        "n_days",
        "CAST(coalesce(n_pairs, 0) AS BIGINT) AS n_pairs",
        "CAST(coalesce(sen_slope_e6, 0) AS BIGINT) AS sen_slope_e6",
    )


def oracle_sen_sql(events_sql: str) -> str:
    """DuckDB mirror over a subquery yielding (cell, day, cents): identical
    daily roll-up, pairwise floor-div slopes, lower-median rank pick."""
    slope = _floor_div("(b.y - a.y) * 1000000", "(b.day - a.day)", "duck")
    return f"""
WITH ev AS ({events_sql}),
daily AS (
  SELECT cell, day, CAST(SUM(cents) AS BIGINT) AS y
  FROM ev GROUP BY 1, 2
),
pairs AS (
  SELECT a.cell, a.day AS d1, b.day AS d2,
    CAST({slope} AS BIGINT) AS slope_e6
  FROM daily a JOIN daily b ON a.cell = b.cell AND a.day < b.day
),
ranked AS (
  SELECT cell, slope_e6,
    ROW_NUMBER() OVER (PARTITION BY cell ORDER BY slope_e6, d1, d2) AS rn,
    COUNT(*) OVER (PARTITION BY cell) AS n_pairs
  FROM pairs
),
med AS (
  SELECT cell, CAST(n_pairs AS BIGINT) AS n_pairs, slope_e6 AS sen_slope_e6
  FROM ranked WHERE rn = (n_pairs + 1) // 2
),
census AS (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily GROUP BY 1
)
SELECT CAST(c.cell AS BIGINT) AS cell, c.n_days,
  CAST(COALESCE(m.n_pairs, 0) AS BIGINT) AS n_pairs,
  CAST(COALESCE(m.sen_slope_e6, 0) AS BIGINT) AS sen_slope_e6
FROM census c LEFT JOIN med m ON c.cell = m.cell
"""
