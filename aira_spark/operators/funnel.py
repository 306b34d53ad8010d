"""Funnel conversion analysis: how many users progress through an ordered
chain of event types (view -> click -> purchase), the product-analytics
staple next to sessionize/stateful_totals in streaming/events.py.

Semantics (the greedy/"first qualifying" funnel): a user reaches step k+1
if they have a step-k+1 event STRICTLY AFTER their step-k conversion time,
where the conversion time is the EARLIEST such qualifying event — the
standard windowless funnel. Strict inequality makes simultaneous events
non-qualifying in both engines identically; (ts, event_id) never needs a
tie-break because only MIN(ts) participates.

Scale shape: step k is one filtered aggregation of the events table keyed
on user_id joined to the step-(k-1) conversion table. The conversion
tables shrink monotonically and are USER-sized (not event-sized), so each
join is a broadcast of the small converted-users side against the
once-shuffled events; with events hash-partitioned by user_id the whole
chain reuses one exchange. Nothing quadratic; no window over all events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_STEPS = ("view", "click", "purchase")


def funnel_counts(
    events: DataFrame, steps: tuple[str, ...] = DEFAULT_STEPS
) -> DataFrame:
    """(step_idx, step, n_users): users reaching each funnel step.
    `events` needs (user_id, ts, event_type)."""
    spark = events.sparkSession
    prev = None  # DataFrame (user_id, t): conversion time at previous step
    out = []
    for i, step in enumerate(steps):
        ev = events.where(F.col("event_type") == step)
        if prev is None:
            cur = ev.groupBy("user_id").agg(F.min("ts").alias("t"))
        else:
            cur = (
                ev.join(F.broadcast(prev.withColumnRenamed("t", "pt")),
                        "user_id")
                .where(F.col("ts") > F.col("pt"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("t"))
            )
        out.append(
            cur.agg(F.count("*").cast("long").alias("n_users")).selectExpr(
                f"CAST({i} AS BIGINT) AS step_idx", f"'{step}' AS step",
                "n_users",
            )
        )
        prev = cur
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


def oracle_funnel_sql(
    table: str = "events", steps: tuple[str, ...] = DEFAULT_STEPS
) -> str:
    ctes = []
    for i, step in enumerate(steps):
        if i == 0:
            ctes.append(
                f"u0 AS (SELECT user_id, MIN(ts) AS t FROM {table} "
                f"WHERE event_type = '{step}' GROUP BY user_id)"
            )
        else:
            ctes.append(
                f"u{i} AS (SELECT e.user_id, MIN(e.ts) AS t FROM {table} e "
                f"JOIN u{i - 1} p ON p.user_id = e.user_id "
                f"WHERE e.event_type = '{step}' AND e.ts > p.t "
                f"GROUP BY e.user_id)"
            )
    selects = "\nUNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS step_idx, '{s}' AS step, "
        f"(SELECT CAST(COUNT(*) AS BIGINT) FROM u{i}) AS n_users"
        for i, s in enumerate(steps)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + selects
