"""Session occupancy — concurrent-session counts per hour (capacity
planning / concurrency analytics): how many sessions, and how many
distinct users, OVERLAP each hour of the timeline.

Sessions come from the standard gap rule (the sessionize definition: a
new session starts when the gap to the previous event exceeds
`gap_minutes`), computed batch-side with the lag + cumulative-sum device
over one entity-local window. The interval→hour expansion is a bounded
explode (sequence over the session's covered hours — sessions are
gap-bounded, so the fan-out per session is small), and occupancy is one
hash agg per hour. No join, no global sort; exchanges carry (user,
session, hour) id rows."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def session_occupancy(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(hour, n_sessions, n_users) from events carrying
    (user_id, event_id, ts)."""
    gap_s = gap_minutes * 60
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = events.select(
        "user_id", "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
                > gap_s
            ),
            1,
        ).otherwise(0).alias("new_sess"),
        F.col("event_id"),
    )
    sess = (
        marked.withColumn(
            "sess_id", F.sum("new_sess").over(w)
        )
        .groupBy("user_id", "sess_id")
        .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    )
    hours = sess.select(
        "user_id",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("t0")),
                F.date_trunc("hour", F.col("t1")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("h"),
    )
    return hours.groupBy(F.col("h").cast("string").alias("hour")).agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


def oracle_occupancy_sql(table: str = "events", gap_minutes: int = 30) -> str:
    gap_s = gap_minutes * 60
    return f"""
WITH marked AS (
  SELECT user_id, ts, event_id,
    CASE WHEN LAG(ts) OVER w IS NULL
          OR epoch(ts) - epoch(LAG(ts) OVER w) > {gap_s}
    THEN 1 ELSE 0 END AS new_sess
  FROM {table} WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, sess_id, MIN(ts) AS t0, MAX(ts) AS t1 FROM (
    SELECT *, SUM(new_sess) OVER (
      PARTITION BY user_id ORDER BY ts, event_id) AS sess_id
    FROM marked
  ) GROUP BY 1, 2
),
hours AS (
  SELECT user_id,
    unnest(generate_series(date_trunc('hour', t0), date_trunc('hour', t1),
                           INTERVAL 1 HOUR)) AS h
  FROM sess
)
SELECT CAST(h AS VARCHAR) AS hour, CAST(COUNT(*) AS BIGINT) AS n_sessions,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM hours GROUP BY 1
"""
