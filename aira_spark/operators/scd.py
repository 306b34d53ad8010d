"""SCD Type-2 dimension build — the warehouse temporal-modeling staple:
collapse an event stream into validity intervals per entity (attribute,
valid_from, valid_to, version, is_current), so point-in-time joins become
range lookups instead of per-event scans.

Shape: one entity-local window (the od_flows/transitions key) does all the
work — LAG detects change points, the change rows alone survive, LEAD over
the survivors closes each interval, ROW_NUMBER versions them. Two window
passes over the same partitioning = ONE shuffle; consecutive duplicates of
the same attribute collapse for free, and the open interval (valid_to
NULL) marks the current row. Ordering ties break on event_id, making every
interval deterministic at any parallelism in both engines."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(events: DataFrame) -> DataFrame:
    """(user_id, attr, valid_from, valid_to, version, is_current) from
    events carrying (user_id, event_id, ts, attr)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.withColumn("prev", F.lag("attr").over(w))
        .where(F.col("prev").isNull() | (F.col("prev") != F.col("attr")))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        changes.select(
            "user_id", "attr",
            F.col("ts").cast("string").alias("valid_from"),
            F.lead(F.col("ts").cast("string")).over(w2).alias("valid_to"),
            F.row_number().over(w2).cast("long").alias("version"),
        )
        .withColumn(
            "is_current",
            F.col("valid_to").isNull().cast("long"),
        )
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            "attr", "valid_from", "valid_to", "version", "is_current",
        )
    )


def oracle_scd2_sql(table: str = "events", attr: str = "event_type") -> str:
    return f"""
WITH src AS (
  SELECT user_id, event_id, ts, {attr} AS attr FROM {table}
),
changes AS (
  SELECT * FROM (
    SELECT user_id, event_id, ts, attr,
      LAG(attr) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM src
  ) WHERE prev IS NULL OR prev != attr
)
SELECT CAST(user_id AS BIGINT) AS user_id, attr,
  CAST(ts AS VARCHAR) AS valid_from,
  CAST(LEAD(CAST(ts AS VARCHAR)) OVER (
    PARTITION BY user_id ORDER BY ts, event_id) AS VARCHAR) AS valid_to,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version,
  CAST(CASE WHEN LEAD(ts) OVER (
    PARTITION BY user_id ORDER BY ts, event_id) IS NULL
    THEN 1 ELSE 0 END AS BIGINT) AS is_current
FROM changes
"""
