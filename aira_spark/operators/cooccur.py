"""Windowed co-occurrence counts + PMI (pointwise mutual information).

The statistical-NLP preprocessing step behind word embeddings, collocation
mining, and topic drift detection: count ordered token pairs (w1, w2)
where w2 follows w1 within a WINDOW-token span, then score association as
PMI = ln( P(w1,w2) / (P(w1) P(w2)) ) with pair probabilities from the
skip-gram count table and unigram probabilities from the token counts.

Scale shape: skip-gram generation is a pure per-document projection — a
posexplode over token positions and a WINDOW-arm explode of the following
tokens (no self-join; the pair generator never leaves the row). Exchanges
carry only (w1, w2) -> count and token -> count integer rows with map-side
combine; text never shuffles. The unigram table joins back BROADCAST
(vocabularies are metadata-sized even at corpus scale: ~1e7 terms; were it
larger, the same plan degrades gracefully to a shuffle-hash join on the
term key). min_count prunes the pair tail BEFORE the joins, which is where
Zipf's law would otherwise blow up the output.

Exactness: counts are exact BIGINTs at any parallelism; pmi_micros is the
shared-text double formula over those integers (the bm25 rule: identical
IEEE sequence in Spark and DuckDB, rounded once to integer micros).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PMI_TEXT = (
    "CAST(round(ln((CAST(c_xy AS DOUBLE) * CAST(n_uni AS DOUBLE) * "
    "CAST(n_uni AS DOUBLE)) / (CAST(n_pairs AS DOUBLE) * "
    "CAST(c_x AS DOUBLE) * CAST(c_y AS DOUBLE))) * 1000000, 0) AS BIGINT)"
)


def pmi_pairs(
    docs: DataFrame, window: int = 3, min_count: int = 3
) -> DataFrame:
    """(w1, w2, c_xy, c_x, c_y, pmi_micros): ordered skip-gram pairs with
    count >= min_count, PMI in integer micros. `docs` needs (doc_id, text);
    tokens are split on single spaces (the corpus-wide convention)."""
    spark = docs.sparkSession
    toks = docs.selectExpr("split(text, ' ') AS ws")
    uni = (
        toks.selectExpr("explode(ws) AS w")
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    arms = ", ".join(
        f"try_element_at(ws, pos + 1 + {k})" for k in range(1, window + 1)
    )
    pairs = (
        toks.selectExpr("ws", "posexplode(ws) AS (pos, w1)")
        .selectExpr("w1", f"explode(array({arms})) AS w2")
        .where(F.col("w2").isNotNull())
    )
    pair_counts = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c_xy"))
        .where(F.col("c_xy") >= min_count)
    )
    totals = pairs.agg(F.count("*").cast("long").alias("n_pairs")).crossJoin(
        uni.agg(F.sum("c").cast("long").alias("n_uni"))
    )
    return (
        pair_counts.join(
            F.broadcast(uni.selectExpr("w AS w1", "c AS c_x")), "w1"
        )
        .join(F.broadcast(uni.selectExpr("w AS w2", "c AS c_y")), "w2")
        .crossJoin(F.broadcast(totals))
        .selectExpr(
            "w1", "w2", "c_xy", "c_x", "c_y", f"{PMI_TEXT} AS pmi_micros"
        )
    )


def oracle_pmi_sql(
    table: str = "documents", window: int = 3, min_count: int = 3
) -> str:
    """DuckDB mirror: 1-based list indexing, OOB list_extract -> NULL."""
    ks = ", ".join(f"({k})" for k in range(1, window + 1))
    return f"""
WITH toks AS (SELECT string_split(text, ' ') AS ws FROM {table}),
uni AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY w
),
pos AS (
  SELECT ws, unnest(generate_series(1, len(ws))) AS p FROM toks
),
pairs AS (
  SELECT ws[p] AS w1, ws[p + o.k] AS w2
  FROM pos, (VALUES {ks}) AS o(k)
  WHERE p + o.k <= len(ws)
),
pc AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_xy
  FROM pairs GROUP BY w1, w2 HAVING COUNT(*) >= {min_count}
),
tot AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_pairs,
         (SELECT CAST(SUM(c) AS BIGINT) FROM uni) AS n_uni
)
SELECT pc.w1, pc.w2, pc.c_xy,
  ux.c AS c_x, uy.c AS c_y, {PMI_TEXT} AS pmi_micros
FROM pc
JOIN uni ux ON ux.w = pc.w1
JOIN uni uy ON uy.w = pc.w2
CROSS JOIN tot"""
