"""Skyline (Pareto frontier) — the non-dominated set under minimize-both
semantics: point p survives iff no q has q.x <= p.x AND q.y <= p.y with a
strict inequality somewhere. The multi-criteria shortlist operator (cheapest
x best) that SQL can only express as a quadratic NOT EXISTS.

Scale shape — a distributed PREFIX SCAN, not a self-join and not one global
window: after the (x, y) distinct, sort order (x asc, y asc) makes a point
dominated iff the running MIN(y) over all preceding rows is <= its y; the
running min splits into (a) a per-bucket window over integer x-range
buckets (parallel, each bucket a partition) and (b) a prefix min ACROSS
buckets computed on the bounded bucket-min table and broadcast back. Every
exchange carries (x, y) integer pairs or B bucket rows; nothing quadratic
anywhere. Ties: duplicate coordinates collapse in the distinct (a count is
kept), equal-y prefixes dominate per the <= rule — deterministic in both
engines with pure integer comparisons."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline(pts: DataFrame, n_buckets: int = 64) -> DataFrame:
    """(x, y, n_pts): the minimize-both Pareto frontier of integer points
    (x, y); n_pts counts the input rows collapsed onto each frontier
    coordinate."""
    d = pts.groupBy("x", "y").agg(F.count("*").cast("long").alias("n_pts"))
    # integer range buckets over the x span (computed once, broadcast as
    # literals via a cross join of the 1-row stats frame)
    stats = d.agg(
        F.min("x").alias("x_lo"),
        (F.max("x") - F.min("x") + 1).alias("span"),
    )
    b = d.crossJoin(F.broadcast(stats)).withColumn(
        "bkt",
        F.expr(f"((x - x_lo) * CAST({n_buckets} AS BIGINT)) DIV span"),
    )
    in_bucket = Window.partitionBy("bkt").orderBy("x", "y").rowsBetween(
        Window.unboundedPreceding, -1
    )
    b = b.withColumn("prev_in_bkt", F.min("y").over(in_bucket))
    bmins = b.groupBy("bkt").agg(F.min("y").alias("bmin"))
    across = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    prefix = bmins.withColumn("prev_bkts", F.min("bmin").over(across)).select(
        "bkt", "prev_bkts"
    )
    return (
        b.join(F.broadcast(prefix), "bkt")
        .withColumn("prev_min", F.least("prev_in_bkt", "prev_bkts"))
        .where(F.col("prev_min").isNull() | (F.col("prev_min") > F.col("y")))
        .select(
            F.col("x").cast("long").alias("x"),
            F.col("y").cast("long").alias("y"),
            "n_pts",
        )
    )


def oracle_skyline_sql(pts_sql: str) -> str:
    """DuckDB mirror via the textbook quadratic NOT EXISTS — an
    INDEPENDENT formulation of the same frontier."""
    return f"""
WITH pts AS ({pts_sql}),
d AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n_pts FROM pts GROUP BY 1, 2)
SELECT CAST(p.x AS BIGINT) AS x, CAST(p.y AS BIGINT) AS y, p.n_pts
FROM d p
WHERE NOT EXISTS (
  SELECT 1 FROM d q
  WHERE q.x <= p.x AND q.y <= p.y AND (q.x < p.x OR q.y < p.y)
)
"""
