"""Median/MAD robust anomaly census per cell — the robust-statistics
outlier gate (Hampel / "robust z-score") over the daily roll-up: flag the
days whose deviation from the cell's MEDIAN exceeds 3 x 1.4826 x MAD.
Unlike mean/stddev gates (moments.py), one wild day cannot inflate its
own threshold — the standard telemetry/quality-monitoring detector, and
the robust sibling of cusum's sequential one.

Exactness (the focal_median med_x2 device, twice): medians are the sum
of the lower+upper order statistics — med_x2 = 2*median(y) and
mad_x4 = 2*median(dev2) with dev2 = |2y - med_x2| = 2|y - med| (so
mad_x4 = 4*MAD) — all EXACT integers with no .5 floats. The Hampel rule
|y - med| > 3 * 1.4826 * MAD cross-multiplies to the pure-integer
predicate

    20000 * dev2 > 44478 * mad_x4        (44478 = 3 * 14826)

so both engines agree bit-for-bit; a constant series (mad_x4 = 0)
naturally flags any nonzero deviation, matching the textbook convention.

Scale shape (100 TB): three chained cell-keyed stages — daily roll-up
(map-side combined), per-cell sorted-list order stats (state bounded by
the CALENDAR, <= days-per-cell small integers — the focal_median
argument), deviations re-joined id-only, one final hash agg. No window
over raw events, no Python, nothing quadratic."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 3 * 1.4826 cross-multiplied: dev2/2 > 3*(14826/10000)*(mad_x4/4)
K_LHS, K_RHS = 20_000, 44_478


def _order_stats(df: DataFrame, key: str, val: str, out: str) -> DataFrame:
    """(key, n, {out}) with {out} = lower + upper order statistic of val
    per key (the med_x2 device)."""
    return (
        df.groupBy(key)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.expr(f"array_sort(collect_list({val}))").alias("vs"),
        )
        .selectExpr(
            key, "n",
            "CAST(element_at(vs, CAST((n + 1) DIV 2 AS INT)) +"
            f" element_at(vs, CAST(n DIV 2 + 1 AS INT)) AS BIGINT) AS {out}",
        )
    )


def mad_outliers(events: DataFrame) -> DataFrame:
    """(cell, n_days, med_x2, mad_x4, n_outliers): Hampel-rule outlier
    census over the per-cell daily series. `events` carries
    (cell, day, cents)."""
    daily = events.groupBy("cell", "day").agg(
        F.sum("cents").cast("long").alias("y")
    )
    med = _order_stats(daily, "cell", "y", "med_x2").selectExpr(
        "cell", "n AS n_days", "med_x2"
    )
    dev = daily.join(med, "cell").selectExpr(
        "cell", "abs(2 * y - med_x2) AS dev2"
    )
    mad = _order_stats(dev, "cell", "dev2", "mad_x4").select("cell", "mad_x4")
    flags = (
        dev.join(mad, "cell")
        .groupBy("cell")
        .agg(
            F.sum(
                F.expr(
                    f"CAST({K_LHS} * dev2 > {K_RHS} * mad_x4 AS INT)"
                )
            ).cast("long").alias("n_outliers")
        )
    )
    return (
        med.join(mad, "cell").join(flags, "cell")
        .selectExpr(
            "CAST(cell AS BIGINT) AS cell",
            "n_days", "med_x2", "mad_x4", "n_outliers",
        )
    )


def oracle_mad_sql(events_sql: str) -> str:
    """DuckDB mirror over a subquery yielding (cell, day, cents):
    ROW_NUMBER order statistics at the identical ranks, identical
    cross-multiplied Hampel predicate."""
    return f"""
WITH ev AS ({events_sql}),
daily AS (
  SELECT cell, day, CAST(SUM(cents) AS BIGINT) AS y FROM ev GROUP BY 1, 2
),
ry AS (
  SELECT cell, y,
    ROW_NUMBER() OVER (PARTITION BY cell ORDER BY y) AS rn,
    COUNT(*) OVER (PARTITION BY cell) AS n
  FROM daily
),
med AS (
  SELECT cell, CAST(MAX(n) AS BIGINT) AS n_days,
    CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN y ELSE 0 END)
       + SUM(CASE WHEN rn = n // 2 + 1 THEN y ELSE 0 END) AS BIGINT)
      AS med_x2
  FROM ry GROUP BY 1
),
dev AS (
  SELECT d.cell, ABS(2 * d.y - m.med_x2) AS dev2
  FROM daily d JOIN med m ON m.cell = d.cell
),
rd AS (
  SELECT cell, dev2,
    ROW_NUMBER() OVER (PARTITION BY cell ORDER BY dev2) AS rn,
    COUNT(*) OVER (PARTITION BY cell) AS n
  FROM dev
),
mad AS (
  SELECT cell,
    CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN dev2 ELSE 0 END)
       + SUM(CASE WHEN rn = n // 2 + 1 THEN dev2 ELSE 0 END) AS BIGINT)
      AS mad_x4
  FROM rd GROUP BY 1
),
fl AS (
  SELECT d.cell,
    CAST(SUM(CASE WHEN {K_LHS} * d.dev2 > {K_RHS} * a.mad_x4
             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
  FROM dev d JOIN mad a ON a.cell = d.cell
  GROUP BY 1
)
SELECT CAST(m.cell AS BIGINT) AS cell, m.n_days, m.med_x2, a.mad_x4,
  fl.n_outliers
FROM med m JOIN mad a ON a.cell = m.cell JOIN fl ON fl.cell = m.cell"""
