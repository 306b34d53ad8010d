"""Event transition matrix — first-order Markov counts over each user's
time-ordered event stream (the navigation/behavior model input next to
sessionize and funnel_counts in the events family).

Shape: ONE window (partition by user, order by ts with event_id as the
deterministic tiebreak) pairs every event with its successor via lead();
the transition matrix is a stock hash agg over the resulting (src, dst)
pairs — event_type² rows, bounded by the vocabulary however large the
stream. One shuffle for the window; the agg reuses nothing heavier than
small string pairs. Exact counts only."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_transitions(events: DataFrame) -> DataFrame:
    """(src_type, dst_type, n_transitions, n_users) from events carrying
    (user_id, event_id, ts, event_type); the last event of each user has
    no successor and emits nothing."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            F.col("event_type").alias("src_type"),
            F.lead("event_type").over(w).alias("dst_type"),
        )
        .where(F.col("dst_type").isNotNull())
    )
    return pairs.groupBy("src_type", "dst_type").agg(
        F.count("*").cast("long").alias("n_transitions"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


def oracle_transitions_sql(table: str = "events") -> str:
    return f"""
WITH pairs AS (
  SELECT user_id, event_type AS src_type,
    LEAD(event_type) OVER (
      PARTITION BY user_id ORDER BY ts, event_id) AS dst_type
  FROM {table}
)
SELECT src_type, dst_type, CAST(COUNT(*) AS BIGINT) AS n_transitions,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM pairs WHERE dst_type IS NOT NULL
GROUP BY 1, 2
"""
