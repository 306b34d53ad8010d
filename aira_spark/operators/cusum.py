"""CUSUM change detection — the classic sequential drift monitor (Page
1954) run as a BATCH audit over per-entity event streams: the upper
CUSUM statistic

    D_i = S_i - min(S_0..S_i),   S_i = sum_{j<=i} (v_j - K)

rises when the value stream drifts above the reference K and resets
through the running minimum when it falls back — the textbook recursive
form max(0, D_{i-1} + x_i) equals this prefix formulation exactly, which
is what makes CUSUM window-expressible: a cumsum and a running min, both
single sorted passes per entity, no recursion.

Exact integers end-to-end (cents vs an integer reference, integer
threshold), total event order (ts, event_id), so alarms are a pure
function of the event set at any parallelism.

Scale shape: ONE entity-keyed exchange; both windows and the final
per-entity census fold into the same sort. At 100 TB this is the shape
of every fleet-health monitor: billions of entities, each a short local
scan, nothing global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_alarms(
    events: DataFrame, ref_cents: int = 1500, threshold_cents: int = 50_000
) -> DataFrame:
    """(user_id, n_events, max_dev, n_alarms, first_alarm_event): upper
    CUSUM census per user — max_dev = max_i D_i, alarms where
    D_i >= threshold, first alarm localized by event_id."""
    ev = events.selectExpr(
        "user_id",
        "ts",
        "event_id",
        f"CAST(FLOOR(value * 100.0) AS BIGINT) - {ref_cents} AS x",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dev = ev.select(
        "user_id",
        "event_id",
        (F.sum("x").over(w) - F.min(F.sum("x").over(w)).over(w)).alias("d"),
    )
    return dev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.max("d").cast("long").alias("max_dev"),
        F.sum((F.col("d") >= threshold_cents).cast("long"))
        .cast("long")
        .alias("n_alarms"),
        F.min(
            F.when(F.col("d") >= threshold_cents, F.col("event_id"))
        ).cast("long").alias("first_alarm_event"),
    )


def oracle_cusum_sql(
    events_sql: str, ref_cents: int = 1500, threshold_cents: int = 50_000
) -> str:
    """DuckDB mirror: same two-window prefix formulation."""
    return f"""
WITH ev AS (
  SELECT user_id, ts, event_id,
         CAST(FLOOR(value * 100.0) AS BIGINT) - {ref_cents} AS x
  FROM ({events_sql})
),
s AS (
  SELECT user_id, ts, event_id,
    SUM(x) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
  FROM ev
),
d AS (
  SELECT user_id, event_id,
    cs - MIN(cs) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dev
  FROM s
)
SELECT CAST(user_id AS BIGINT) AS user_id,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(MAX(dev) AS BIGINT) AS max_dev,
  CAST(SUM(CASE WHEN dev >= {threshold_cents} THEN 1 ELSE 0 END) AS BIGINT)
    AS n_alarms,
  CAST(MIN(CASE WHEN dev >= {threshold_cents} THEN event_id END) AS BIGINT)
    AS first_alarm_event
FROM d GROUP BY 1
"""
