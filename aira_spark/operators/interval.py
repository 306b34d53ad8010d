"""Interval-overlap join — the time-dimension mirror of the cell-cover
prefilter (operators/spatial.py): candidate pairs come from an EQUI-join
on discretized time bins, the exact overlap refine is pure integer column
arithmetic, and the small side broadcasts.

Concrete query: per-user daily activity spans [first event, last event]
joined against the globally busiest K hours — "which users were active
during peak load, and for how long". The reference has no temporal
surface; this fills the relational-engine gap next to asof_join
(operators/asof.py) with the interval (range-predicate) join shape.

Scale shape: the span table is one hash agg on (user_id, day); the busy
table is one hash agg on hour + a global top-K (rows = K, broadcast); the
join itself is bin-equi (a day span covers <= 24 hour bins, so the explode
fan-out is bounded by a constant) — no range-join nested loop ever runs,
exactly as PIP never runs a cartesian. All arithmetic is exact epoch-
second integers, so both engines agree bit-for-bit."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOUR = 3600
DAY = 86400


def user_day_spans(events: DataFrame) -> DataFrame:
    """(user_id, day, t0, t1): closed epoch-second span of each user's
    activity per UTC day — one hash agg, map-side combinable."""
    t = F.unix_timestamp("ts").cast("long")
    return (
        events.select(F.col("user_id"), t.alias("t"))
        .groupBy("user_id", F.expr(f"t div {DAY}").alias("day"))
        .agg(F.min("t").alias("t0"), F.max("t").alias("t1"))
    )


def busy_hours(events: DataFrame, top_k: int = 40) -> DataFrame:
    """(hr, n_events): the K globally busiest hours (count DESC, hr ASC —
    a total order, so deterministic). K rows -> always broadcastable."""
    t = F.unix_timestamp("ts").cast("long")
    return (
        events.select(F.expr(f"unix_timestamp(ts) div {HOUR}").alias("hr"))
        .groupBy("hr")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.col("n_events").desc(), F.col("hr").asc())
        .limit(top_k)
    )


def interval_overlap(events: DataFrame, top_k: int = 40) -> DataFrame:
    """(user_id, day, hr, n_events, overlap_s): every (user-day span x
    busy hour) pair that intersects, with the exact closed-interval
    overlap in seconds.

    The span explodes into its covered hour bins (sequence of <= 24
    integers); busy hours are exactly one bin wide, so bin equality IS the
    candidate test and every true pair is produced exactly once — no
    dedup, no range join. The busy side broadcasts."""
    spans = user_day_spans(events)
    busy = busy_hours(events, top_k=top_k)
    cand = spans.withColumn(
        "hr",
        F.explode(
            F.sequence(
                F.expr(f"t0 div {HOUR}"), F.expr(f"t1 div {HOUR}")
            )
        ),
    )
    j = cand.join(F.broadcast(busy), "hr")
    return j.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("day").cast("long").alias("day"),
        F.col("hr").cast("long").alias("hr"),
        F.col("n_events").cast("long").alias("n_events"),
        (
            F.least(F.col("t1"), F.col("hr") * HOUR + (HOUR - 1))
            - F.greatest(F.col("t0"), F.col("hr") * HOUR)
            + 1
        )
        .cast("long")
        .alias("overlap_s"),
    )


def oracle_interval_sql(table: str = "events", top_k: int = 40) -> str:
    """DuckDB mirror — an INDEPENDENT formulation: a range-predicate join
    (b.hr BETWEEN bin(t0) AND bin(t1)) instead of the explode+equi-join,
    so a fan-out bug on either side cannot cancel out."""
    return f"""
WITH ue AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM {table}
),
spans AS (
  SELECT user_id, t // {DAY} AS day, MIN(t) AS t0, MAX(t) AS t1
  FROM ue GROUP BY 1, 2
),
busy AS (
  SELECT t // {HOUR} AS hr, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM ue GROUP BY 1
  ORDER BY n_events DESC, hr ASC LIMIT {top_k}
)
SELECT
  CAST(s.user_id AS BIGINT) AS user_id,
  CAST(s.day AS BIGINT) AS day,
  CAST(b.hr AS BIGINT) AS hr,
  b.n_events,
  CAST(LEAST(s.t1, b.hr * {HOUR} + {HOUR - 1})
       - GREATEST(s.t0, b.hr * {HOUR}) + 1 AS BIGINT) AS overlap_s
FROM spans s
JOIN busy b ON b.hr BETWEEN s.t0 // {HOUR} AND s.t1 // {HOUR}
"""
