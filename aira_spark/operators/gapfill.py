"""Time-series gap filling with last-observation-carried-forward (LOCF)
— the hypertable resample primitive (TimescaleDB time_bucket_gapfill /
locf, QuestDB SAMPLE BY FILL(PREV)): regularize each user's event stream
onto a dense hourly grid spanning [first event hour, last event hour],
carrying the most recent observed value across empty buckets.

Determinism: the observed value of a bucket is the value of the LAST
event in it, ties broken by event_id (total order), and values are
integer cents — so both engines agree bit-for-bit, and the LOCF scan is
a deterministic function of the bucket sequence regardless of upstream
partitioning.

Scale shape: one exchange keyed by the entity (user) feeds BOTH the
per-bucket argmax window and the LOCF fill window — entity-local,
single-sorted-pass each; the dense grid is a per-user `sequence()`
explode (a generator, not a shuffle), bounded by the user's own span
(720 buckets/month; at multi-year spans chunk the sequence or gap-fill
per month partition — the grid never becomes a cross join). The filled
flag ships so downstream consumers can weight real vs carried samples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_hourly(events: DataFrame) -> DataFrame:
    """(user_id, hour, v_cents, filled): dense per-user hourly grid with
    LOCF-filled integer values; filled = 1 on carried buckets."""
    ev = events.selectExpr(
        "user_id",
        "date_trunc('hour', ts) AS hr",
        "CAST(FLOOR(value * 100.0) AS BIGINT) AS v_cents",
        "ts",
        "event_id",
    )
    last_in_bucket = (
        ev.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id", "hr").orderBy(
                    F.col("ts").desc(), F.col("event_id").desc()
                )
            ),
        )
        .where("rn = 1")
        .select("user_id", "hr", "v_cents")
    )
    grid = (
        ev.groupBy("user_id")
        .agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
        .selectExpr(
            "user_id",
            "explode(sequence(h0, h1, interval 1 hour)) AS hr",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(last_in_bucket, ["user_id", "hr"], "left")
        .withColumn("v_fill", F.last("v_cents", ignorenulls=True).over(w))
        .selectExpr(
            "CAST(user_id AS BIGINT) AS user_id",
            "date_format(hr, 'yyyy-MM-dd HH:mm:ss') AS hour",
            "CAST(v_fill AS BIGINT) AS v_cents",
            "CAST(CASE WHEN v_cents IS NULL THEN 1 ELSE 0 END AS BIGINT)"
            " AS filled",
        )
    )


def oracle_gap_fill_sql(events_sql: str) -> str:
    """DuckDB mirror: generate_series grid + IGNORE NULLS window LOCF."""
    return f"""
WITH ev AS (
  SELECT user_id, date_trunc('hour', ts) AS hr,
         CAST(FLOOR(value * 100.0) AS BIGINT) AS v_cents, ts, event_id
  FROM ({events_sql})
),
lastb AS (
  SELECT user_id, hr, v_cents FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY user_id, hr ORDER BY ts DESC, event_id DESC) AS rn
    FROM ev) WHERE rn = 1
),
bounds AS (SELECT user_id, MIN(hr) AS h0, MAX(hr) AS h1 FROM ev GROUP BY 1),
grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
  FROM bounds
)
SELECT CAST(g.user_id AS BIGINT) AS user_id,
  strftime(g.hr, '%Y-%m-%d %H:%M:%S') AS hour,
  CAST(last_value(l.v_cents IGNORE NULLS) OVER (
    PARTITION BY g.user_id ORDER BY g.hr
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS v_cents,
  CAST(CASE WHEN l.v_cents IS NULL THEN 1 ELSE 0 END AS BIGINT) AS filled
FROM grid g LEFT JOIN lastb l ON l.user_id = g.user_id AND l.hr = g.hr
"""
