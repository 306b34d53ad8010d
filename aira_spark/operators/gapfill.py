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


def twa_locf(events: DataFrame) -> DataFrame:
    """(user_id, n_segs, span_us, num_cents_us, twa_cents): exact
    time-weighted average under LOCF step semantics — TimescaleDB
    `time_weight('locf')` parity. The value stream is the step function
    that holds each observation until the next one; the TWA over the
    user's span [first_ts, last_ts] is

        sum(v_i * (t_{i+1} - t_i)) / (t_last - t_first)

    in integer cents x microseconds, floor-divided at the end — exact
    integers end-to-end (numerator <= max_cents * span_us, mid-int64 for
    multi-year spans at cent precision).

    Duplicate timestamps collapse to the (ts, event_id)-last observation
    first, so the step function — and therefore the TWA — is a total
    function of the event SET, independent of partitioning.

    Scale shape: one entity-keyed exchange; dedup window, LEAD, and the
    final agg are all user-local single sorted passes (Catalyst stacks
    them into one sort)."""
    ev = events.selectExpr(
        "user_id",
        # parquet arrives NTZ; unix_micros needs TIMESTAMP — any fixed
        # session-tz offset cancels in the duration differences
        "CAST(ts AS TIMESTAMP) AS ts",
        "event_id",
        "CAST(FLOOR(value * 100.0) AS BIGINT) AS v_cents",
    )
    from pyspark.sql import Window

    last_at_ts = (
        ev.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts").orderBy(
                    F.col("event_id").desc()
                )
            ),
        )
        .where("rn = 1")
        .select("user_id", "ts", "v_cents")
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    seg = last_at_ts.select(
        "user_id",
        "v_cents",
        (
            F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
        ).alias("dur_us"),
    ).where("dur_us IS NOT NULL")
    return (
        seg.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_segs"),
            F.sum("dur_us").cast("long").alias("span_us"),
            F.sum(F.col("v_cents") * F.col("dur_us"))
            .cast("long")
            .alias("num_cents_us"),
        )
        .selectExpr(
            "CAST(user_id AS BIGINT) AS user_id",
            "n_segs",
            "span_us",
            "num_cents_us",
            "num_cents_us DIV span_us AS twa_cents",
        )
    )


def oracle_twa_sql(events_sql: str) -> str:
    """DuckDB mirror: same dedup + LEAD + integer fold."""
    return f"""
WITH ev AS (
  SELECT user_id, ts, event_id,
         CAST(FLOOR(value * 100.0) AS BIGINT) AS v_cents
  FROM ({events_sql})
),
dd AS (
  SELECT user_id, ts, v_cents FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn FROM ev)
  WHERE rn = 1
),
seg AS (
  SELECT user_id, v_cents,
    epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts))
      - epoch_us(ts) AS dur_us
  FROM dd
)
SELECT CAST(user_id AS BIGINT) AS user_id,
  CAST(COUNT(*) AS BIGINT) AS n_segs,
  CAST(SUM(dur_us) AS BIGINT) AS span_us,
  CAST(SUM(v_cents * dur_us) AS BIGINT) AS num_cents_us,
  CAST(CAST(SUM(v_cents * dur_us) AS BIGINT)
       // CAST(SUM(dur_us) AS BIGINT) AS BIGINT) AS twa_cents
FROM seg WHERE dur_us IS NOT NULL GROUP BY 1
"""
