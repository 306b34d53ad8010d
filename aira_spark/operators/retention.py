"""Cohort retention — the product-analytics triangle (cohort week ×
activity week × user counts) every event warehouse ships next to
sessionize/funnel (operators/funnel.py is the per-step variant; this is the
longitudinal one).

Semantics: a user's cohort is the Monday-truncated week of their FIRST
event; for every (cohort_week, activity week) pair, count the distinct
cohort members active that week. `week_no` is the exact integer week
offset; `cohort_size` repeats the cohort's denominator so the retention
ratio is a downstream integer division — no floats anywhere.

Scale shape: everything flows from ONE distinct (user_id, week) projection
— the per-user min() and the cohort join both reuse its user_id hash
partitioning (co-partitioned, AQE folds the exchanges), and the final
triangle is a bounded weeks² frame, so cohort sizes join back BROADCAST.
Events shuffle once, as (user_id, week) pairs, never full rows."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retention_cohorts(events: DataFrame) -> DataFrame:
    """(cohort_week, week, week_no, n_active, cohort_size) from events
    carrying (user_id, ts)."""
    user_weeks = (
        events.select(
            "user_id",
            F.expr("CAST(date_trunc('week', ts) AS DATE)").alias("week"),
        )
        .distinct()
    )
    first = user_weeks.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    triangle = (
        user_weeks.join(first, "user_id")
        .groupBy("cohort_week", "week")
        .agg(F.count("*").cast("long").alias("n_active"))
    )
    sizes = first.groupBy("cohort_week").agg(
        F.count("*").cast("long").alias("cohort_size")
    )
    return (
        triangle.join(F.broadcast(sizes), "cohort_week")
        .select(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            F.col("week").cast("string").alias("week"),
            F.expr("CAST(datediff(week, cohort_week) DIV 7 AS BIGINT)").alias(
                "week_no"
            ),
            "n_active",
            "cohort_size",
        )
    )


def oracle_retention_sql(table: str = "events") -> str:
    return f"""
WITH uw AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM {table}
),
first AS (SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id),
tri AS (
  SELECT f.cohort_week, uw.week, CAST(COUNT(*) AS BIGINT) AS n_active
  FROM uw JOIN first f ON f.user_id = uw.user_id
  GROUP BY 1, 2
),
sizes AS (
  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
  FROM first GROUP BY 1
)
SELECT CAST(t.cohort_week AS VARCHAR) AS cohort_week,
       CAST(t.week AS VARCHAR) AS week,
       CAST((t.week - t.cohort_week) // 7 AS BIGINT) AS week_no,
       t.n_active, s.cohort_size
FROM tri t JOIN sizes s ON s.cohort_week = t.cohort_week
"""
