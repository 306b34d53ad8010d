"""Conversion lag — time from each user's FIRST 'view' to their FIRST
'purchase' after it (the funnel's temporal companion: not whether users
convert, but how long it takes), plus the exact lag distribution.

Shape: two tiny per-user aggregations out of one filtered scan (min view
ts; min purchase ts AFTER it via a conditional agg over the join of the
two), then the lag histogram via the exact-quantile rank rule over whole
seconds. Everything integer: epoch seconds, exact counts."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def conversion_lags(
    events: DataFrame, frm: str = "view", to: str = "purchase"
) -> DataFrame:
    """(user_id, lag_s) for every user with a `to` event at/after their
    first `frm` event; users who never convert are absent (materializing
    non-converters is the downstream LEFT join's job)."""
    first_from = (
        events.where(F.col("event_type") == frm)
        .groupBy("user_id")
        .agg(F.min(F.unix_timestamp("ts")).alias("t_from"))
    )
    conv = (
        events.where(F.col("event_type") == to)
        .select("user_id", F.unix_timestamp("ts").alias("t_to"))
        .join(first_from, "user_id")
        .where(F.col("t_to") >= F.col("t_from"))
        .groupBy("user_id")
        .agg(
            (F.min("t_to") - F.min("t_from")).cast("long").alias("lag_s")
        )
    )
    return conv.selectExpr("CAST(user_id AS BIGINT) AS user_id", "lag_s")


def oracle_conversion_sql(
    table: str = "events", frm: str = "view", to: str = "purchase"
) -> str:
    return f"""
WITH ff AS (
  SELECT user_id, MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS t_from FROM {table}
  WHERE event_type = '{frm}' GROUP BY 1
),
conv AS (
  SELECT e.user_id,
    CAST(MIN(CAST(floor(epoch(e.ts)) AS BIGINT)) - MIN(ff.t_from) AS BIGINT) AS lag_s
  FROM {table} e JOIN ff ON ff.user_id = e.user_id
  WHERE e.event_type = '{to}' AND CAST(floor(epoch(e.ts)) AS BIGINT) >= ff.t_from
  GROUP BY 1
)
SELECT CAST(user_id AS BIGINT) AS user_id, lag_s FROM conv
"""
