"""Fuzzy join (record linkage) — blocking + exact edit-distance refine.

The entity-resolution primitive every ingest pipeline needs: match dirty
strings against a clean registry without the quadratic cross join. Classic
two-phase shape:

  1. BLOCK: equi-join on a cheap blocking key (first character + a length
     band here) — this is the only join, and the registry side is tiny
     after dedup, so it BROADCASTs; no shuffle touches the dirty side.
  2. REFINE: exact Levenshtein distance <= max_dist on the candidates, then
     keep each dirty row's best match (min distance, lexicographic
     tie-break) — a bounded window over per-row candidate groups.

Levenshtein is an exact integer metric with identical built-ins in Spark
and DuckDB, so the whole operator is bit-reproducible — no similarity
floats anywhere. A deleted character keeps the first character and shifts
length by 1, so the (first char, |len diff| <= 1) block has recall 1.0 for
single-edit corruption; wider edit budgets widen the band the same way
(the standard length-filter guarantee: |len(a) - len(b)| <= dist)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fuzzy_join(
    dirty: DataFrame, registry: DataFrame, max_dist: int = 1
) -> DataFrame:
    """(rec_id, dirty_name, match_name, dist) — best registry match within
    `max_dist` edits. `dirty` carries (rec_id, dirty_name); `registry`
    carries distinct (match_name)."""
    reg = registry.select("match_name").distinct().select(
        "match_name",
        F.expr("substr(match_name, 1, 1)").alias("blk"),
        F.length("match_name").alias("mlen"),
    )
    cand = (
        dirty.select(
            "rec_id", "dirty_name",
            F.expr("substr(dirty_name, 1, 1)").alias("blk"),
            F.length("dirty_name").alias("dlen"),
        )
        .join(F.broadcast(reg), "blk")
        .where(F.abs(F.col("dlen") - F.col("mlen")) <= max_dist)
        .where(F.expr("levenshtein(dirty_name, match_name)") <= max_dist)
        .select(
            "rec_id", "dirty_name", "match_name",
            F.expr("CAST(levenshtein(dirty_name, match_name) AS BIGINT)")
            .alias("dist"),
        )
    )
    w = Window.partitionBy("rec_id").orderBy("dist", "match_name")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .drop("rn")
    )


def oracle_fuzzy_sql(
    dirty_sql: str, registry_sql: str, max_dist: int = 1
) -> str:
    """DuckDB mirror: `dirty_sql` yields (rec_id, dirty_name);
    `registry_sql` yields match_name rows."""
    return f"""
WITH dirty AS ({dirty_sql}),
reg AS (SELECT DISTINCT match_name FROM ({registry_sql})),
cand AS (
  SELECT d.rec_id, d.dirty_name, r.match_name,
         CAST(levenshtein(d.dirty_name, r.match_name) AS BIGINT) AS dist
  FROM dirty d JOIN reg r
    ON substr(d.dirty_name, 1, 1) = substr(r.match_name, 1, 1)
   AND abs(length(d.dirty_name) - length(r.match_name)) <= {max_dist}
  WHERE levenshtein(d.dirty_name, r.match_name) <= {max_dist}
),
best AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY rec_id ORDER BY dist, match_name) AS rn
  FROM cand
)
SELECT rec_id, dirty_name, match_name, dist FROM best WHERE rn = 1
"""
