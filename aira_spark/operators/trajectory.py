"""Trajectory analytics: origin-destination (OD) flow matrix over an
event stream snapped to the cell grid.

The mobility-analysis staple: order each entity's events in time, pair
every event with its predecessor, and count transitions between grid
cells — the OD matrix feeding flow maps, demand models, and anomaly
detection. (The reference's domain stops at raster decode; this extends
the same cell index, functions/cells.py, to movement data.)

Scale shape: trajectories are ENTITY-local, so the sequence step is one
shuffle keyed on user_id (the window's partition key — each user's events
sort within a partition, no global sort), and the OD rollup is one
aggregation keyed on (from_cell, to_cell) with map-side combine. Nothing
quadratic, no self-join: LAG over the time-ordered window is the pair
generator. Hot cells only concentrate AGG rows (already-combined
partials), not raw events; a skewed hot USER would need salting the
window key by session — at that point sessionize (streaming/events.py)
is the right tool.

Exactness: cell ids are the exact integer grid pack; ordering ties are
broken by event_id (ts alone is not unique), making LAG deterministic at
any parallelism in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import DEFAULT_RES


def od_flows(events: DataFrame) -> DataFrame:
    """(from_cell, to_cell, n_trips, n_users, n_moves): consecutive-event
    cell transitions per user. `events` needs (user_id, ts, event_id,
    cell). Self-loops (dwell in the same cell) are kept as rows —
    n_moves counts the strict transitions among them (0 for self-loops,
    n_trips otherwise), so both densities read from one result."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    moves = (
        events.select(
            "user_id", "cell", F.lag("cell").over(w).alias("from_cell")
        )
        .where(F.col("from_cell").isNotNull())
    )
    return (
        moves.groupBy("from_cell", F.col("cell").alias("to_cell"))
        .agg(
            F.count("*").cast("long").alias("n_trips"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .selectExpr(
            "from_cell", "to_cell", "n_trips", "n_users",
            "CAST(CASE WHEN from_cell = to_cell THEN 0 ELSE n_trips END"
            " AS BIGINT) AS n_moves",
        )
    )


def oracle_od_flows_sql(events_cte: str) -> str:
    """DuckDB mirror over a WITH clause ending in ev(user_id, ts,
    event_id, cell)."""
    return f"""{events_cte},
moves AS (
  SELECT user_id, cell AS to_cell,
    LAG(cell) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_cell
  FROM ev
)
SELECT from_cell, to_cell,
  CAST(COUNT(*) AS BIGINT) AS n_trips,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(CASE WHEN from_cell = to_cell THEN 0 ELSE COUNT(*) END AS BIGINT)
    AS n_moves
FROM moves WHERE from_cell IS NOT NULL
GROUP BY from_cell, to_cell"""
