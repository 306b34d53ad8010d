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


def sorted_neighborhood_pairs(
    recs: DataFrame, window: int = 3, max_dist: int = 1
) -> DataFrame:
    """(rec_a, rec_b, dist): near-duplicate record pairs found by SORTED
    NEIGHBORHOOD — the other classic record-linkage blocking next to
    fuzzy_join's key blocking: sort records by the name, compare each to
    its next `window - 1` neighbors in sort order, refine by exact
    Levenshtein. Catches what key blocking misses when the first character
    itself is corrupted, at the cost of sort locality assumptions.

    Scale shape: the sort is PER FIRST-CHAR BLOCK (partitionBy + orderBy —
    a real cluster range-partitions instead; blocking bounds window-edge
    loss the same way), neighbors come from `window - 1` LEAD arms in the
    same window (one shuffle total), and only candidate pairs reach the
    Levenshtein refine. `recs` carries (rec_id, name)."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.expr("substr(name, 1, 1)")).orderBy(
        "name", "rec_id"
    )
    # two projections: the window LEADs must materialize BEFORE the explode
    # (a generator over raw window expressions is rejected by the analyzer,
    # and a WHERE after it gets rewritten back into the window project)
    lead_cols = [
        c
        for i in range(1, window)
        for c in (
            F.lead("rec_id", i).over(w).alias(f"rid{i}"),
            F.lead("name", i).over(w).alias(f"nm{i}"),
        )
    ]
    leads = recs.select(
        F.col("rec_id").alias("rec_a"), F.col("name").alias("name_a"),
        *lead_cols,
    )
    structs = ", ".join(
        f"named_struct('rid', rid{i}, 'nm', nm{i})" for i in range(1, window)
    )
    cand = leads.selectExpr(
        "rec_a", "name_a",
        f"explode(filter(array({structs}), s -> s.rid IS NOT NULL)) AS nb",
    ).select(
        "rec_a", "name_a",
        F.col("nb.rid").alias("rec_b"), F.col("nb.nm").alias("name_b"),
    )
    return (
        cand.where(F.expr(f"levenshtein(name_a, name_b) <= {max_dist}"))
        .selectExpr(
            "CAST(LEAST(rec_a, rec_b) AS BIGINT) AS rec_a",
            "CAST(GREATEST(rec_a, rec_b) AS BIGINT) AS rec_b",
            "CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist",
        )
        .distinct()
    )


def oracle_sorted_neighborhood_sql(
    recs_sql: str, window: int = 3, max_dist: int = 1
) -> str:
    """DuckDB mirror over a subquery yielding (rec_id, name)."""
    arms = "\nUNION ALL\n".join(
        f"SELECT rec_id AS rec_a, name AS name_a, "
        f"LEAD(rec_id, {i}) OVER w{i} AS rec_b, LEAD(name, {i}) OVER w{i} AS name_b "
        f"FROM recs WINDOW w{i} AS ("
        "PARTITION BY substr(name, 1, 1) ORDER BY name, rec_id)"
        for i in range(1, window)
    )
    return f"""
WITH recs AS ({recs_sql}),
cand AS ({arms})
SELECT DISTINCT CAST(LEAST(rec_a, rec_b) AS BIGINT) AS rec_a,
  CAST(GREATEST(rec_a, rec_b) AS BIGINT) AS rec_b,
  CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
FROM cand
WHERE rec_b IS NOT NULL AND levenshtein(name_a, name_b) <= {max_dist}
"""
