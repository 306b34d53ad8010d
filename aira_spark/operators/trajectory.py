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


def trajectory_lengths(events: DataFrame) -> DataFrame:
    """(user_id, n_hops, path_e4, max_hop_e4, net_e4): per-user travelled
    path statistics over the time-ordered event stream — total path length,
    longest single hop, and net (start->end) displacement, all in 1e-4-deg
    integer units.

    Exactness (the poly_metrics perimeter device, geom.py): coordinates
    floor-quantize to 1e-4 deg, each hop contributes floor(sqrt(dx^2+dy^2))
    as an INTEGER, and the per-user fold sums integers — aggregation order
    cannot shift a bit, unlike a double SUM of distances. Net displacement
    reuses first/last(ordered) over the same single window.

    Scale shape: identical to od_flows — ONE window keyed on user_id
    (entity-local sort, no global order), one hash agg; hops are
    (user, int, int) rows."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hop = "CAST(floor(sqrt(CAST(dx * dx + dy * dy AS DOUBLE))) AS BIGINT)"
    hops = (
        events.select(
            "user_id", "ts", "event_id",
            F.expr("CAST(floor(x * 10000.0) AS BIGINT)").alias("xq"),
            F.expr("CAST(floor(y * 10000.0) AS BIGINT)").alias("yq"),
        )
        .select(
            "user_id", "xq", "yq",
            (F.col("xq") - F.lag("xq").over(w)).alias("dx"),
            (F.col("yq") - F.lag("yq").over(w)).alias("dy"),
            F.first("xq").over(w).alias("x0"),
            F.first("yq").over(w).alias("y0"),
            F.row_number().over(w).alias("rn"),
            F.count("*").over(Window.partitionBy("user_id")).alias("n_ev"),
        )
    )
    return (
        hops.groupBy("user_id")
        .agg(
            F.count(F.col("dx")).cast("long").alias("n_hops"),
            F.coalesce(F.sum(F.expr(hop)), F.lit(0)).cast("long")
            .alias("path_e4"),
            F.coalesce(F.max(F.expr(hop)), F.lit(0)).cast("long")
            .alias("max_hop_e4"),
            F.max(F.when(F.col("rn") == F.col("n_ev"),
                         F.struct("xq", "yq"))).alias("last_pt"),
            F.max(F.when(F.col("rn") == 1,
                         F.struct(F.col("x0").alias("xq"),
                                  F.col("y0").alias("yq")))).alias("first_pt"),
        )
        .selectExpr(
            "CAST(user_id AS BIGINT) AS user_id", "n_hops", "path_e4",
            "max_hop_e4",
            "CAST(floor(sqrt(CAST("
            "(last_pt.xq - first_pt.xq) * (last_pt.xq - first_pt.xq) + "
            "(last_pt.yq - first_pt.yq) * (last_pt.yq - first_pt.yq)"
            " AS DOUBLE))) AS BIGINT) AS net_e4",
        )
    )


def oracle_trajectory_sql(events_sql: str) -> str:
    """DuckDB mirror over a subquery yielding (user_id, ts, event_id, x, y)."""
    hop = "CAST(floor(sqrt(CAST(dx * dx + dy * dy AS DOUBLE))) AS BIGINT)"
    return f"""
WITH ev AS (
  SELECT user_id, ts, event_id,
    CAST(floor(x * 10000.0) AS BIGINT) AS xq,
    CAST(floor(y * 10000.0) AS BIGINT) AS yq
  FROM ({events_sql})
),
hops AS (
  SELECT user_id, xq, yq,
    xq - LAG(xq) OVER w AS dx, yq - LAG(yq) OVER w AS dy,
    FIRST_VALUE(xq) OVER w AS x0, FIRST_VALUE(yq) OVER w AS y0,
    ROW_NUMBER() OVER w AS rn,
    COUNT(*) OVER (PARTITION BY user_id) AS n_ev
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT CAST(user_id AS BIGINT) AS user_id,
  CAST(COUNT(dx) AS BIGINT) AS n_hops,
  CAST(COALESCE(SUM({hop}), 0) AS BIGINT) AS path_e4,
  CAST(COALESCE(MAX({hop}), 0) AS BIGINT) AS max_hop_e4,
  CAST(floor(sqrt(CAST(
    (MAX(CASE WHEN rn = n_ev THEN xq END) - MAX(CASE WHEN rn = 1 THEN x0 END))
      * (MAX(CASE WHEN rn = n_ev THEN xq END) - MAX(CASE WHEN rn = 1 THEN x0 END))
    + (MAX(CASE WHEN rn = n_ev THEN yq END) - MAX(CASE WHEN rn = 1 THEN y0 END))
      * (MAX(CASE WHEN rn = n_ev THEN yq END) - MAX(CASE WHEN rn = 1 THEN y0 END))
   AS DOUBLE))) AS BIGINT) AS net_e4
FROM hops GROUP BY user_id
"""


def co_location_pairs(
    events: DataFrame, min_meetings: int = 2, max_group: int = 10_000
) -> DataFrame:
    """(user_a, user_b, n_meetings, n_places): user pairs repeatedly
    present in the same (cell, hour) bucket — proximity/contact analysis,
    the entity-pair product of the trajectory family. `events` carries
    (user_id, cell, hour).

    Scale shape: presence dedups to DISTINCT (user, cell, hour) first (a
    user's burst of events in one bucket counts once), the candidate join
    is an equi-join on the (cell, hour) bucket — work is Σ_g |g|², so hot
    buckets (a stadium hour) are THE skew risk: any bucket over `max_group`
    raises loudly before the join is scheduled (the ngram/caption guard
    device; at planet scale those buckets need a finer grid or sampling,
    decided upstream, not silently here). Only (user, cell, hour) id rows
    shuffle."""
    from pyspark.sql import functions as F

    pres = events.select("user_id", "cell", "hour").distinct()
    over = (
        pres.groupBy("cell", "hour").count()
        .filter(F.col("count") > max_group)
        .limit(1).collect()
    )
    if over:
        r = over[0]
        raise RuntimeError(
            f"co_location_pairs: bucket (cell={r['cell']}, hour="
            f"{r['hour']}) holds {r['count']} users > max_group="
            f"{max_group}; the pair join would be quadratic in it — use a "
            "finer grid for hot areas"
        )
    a = pres.selectExpr("user_id AS user_a", "cell", "hour")
    b = pres.selectExpr("user_id AS user_b", "cell", "hour")
    return (
        a.join(b, ["cell", "hour"])
        .filter(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(
            F.count("*").cast("long").alias("n_meetings"),
            F.countDistinct("cell").cast("long").alias("n_places"),
        )
        .filter(F.col("n_meetings") >= min_meetings)
        .selectExpr(
            "CAST(user_a AS BIGINT) AS user_a",
            "CAST(user_b AS BIGINT) AS user_b",
            "n_meetings", "n_places",
        )
    )


def oracle_colocation_sql(events_sql: str, min_meetings: int = 2) -> str:
    """DuckDB mirror over a subquery yielding (user_id, cell, hour)."""
    return f"""
WITH pres AS (SELECT DISTINCT user_id, cell, hour FROM ({events_sql})),
pairs AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b,
    CAST(COUNT(*) AS BIGINT) AS n_meetings,
    CAST(COUNT(DISTINCT a.cell) AS BIGINT) AS n_places
  FROM pres a JOIN pres b
    ON a.cell = b.cell AND a.hour = b.hour AND a.user_id < b.user_id
  GROUP BY 1, 2
)
SELECT CAST(user_a AS BIGINT) AS user_a, CAST(user_b AS BIGINT) AS user_b,
       n_meetings, n_places
FROM pairs WHERE n_meetings >= {min_meetings}
"""
