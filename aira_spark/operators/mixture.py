"""Data-mixture weights — the sampling plan a training pipeline computes
before drawing a uniform mixture from imbalanced sources (the planning
stage upstream of curation.stratified_sample, which then APPLIES per-source
ppm quotas).

Semantics: per source, count docs and whitespace tokens; the uniform
target is the SMALLEST source's token count, so every source gets
sample_ppm = floor(min_tokens * 1e6 / n_tokens) — the largest source is
downsampled hardest, the smallest keeps ppm = 1e6 exactly. tokens_after =
n_tokens * sample_ppm / 1e6 (floored) shows the planned post-sampling
budget; all integers, the division via the shared floor rule (nonnegative
here, so DIV/// agree trivially).

Scale shape: ONE corpus aggregation (map-side combined token counts per
source — a handful of rows), then pure projections over the bounded
source table; the min broadcasts as a 1-row cross join. Nothing but
(source, counts) ever shuffles."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKENS = "CAST(size(split(text, ' ')) AS BIGINT)"


def mixture_weights(docs: DataFrame) -> DataFrame:
    """(source, n_docs, n_tokens, sample_ppm, tokens_after) from docs
    carrying (source, text)."""
    per = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.expr(TOKENS)).cast("long").alias("n_tokens"),
    )
    mn = per.agg(F.min("n_tokens").alias("min_tokens"))
    return (
        per.crossJoin(F.broadcast(mn))
        .selectExpr(
            "source", "n_docs", "n_tokens",
            "CAST((min_tokens * 1000000) DIV n_tokens AS BIGINT) AS sample_ppm",
            "CAST((n_tokens * ((min_tokens * 1000000) DIV n_tokens)) DIV 1000000"
            " AS BIGINT) AS tokens_after",
        )
    )


def oracle_mixture_sql(table: str = "documents") -> str:
    return f"""
WITH per AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM {table} GROUP BY 1
),
mn AS (SELECT MIN(n_tokens) AS min_tokens FROM per)
SELECT source, n_docs, n_tokens,
  CAST((mn.min_tokens * 1000000) // n_tokens AS BIGINT) AS sample_ppm,
  CAST((n_tokens * ((mn.min_tokens * 1000000) // n_tokens)) // 1000000
       AS BIGINT) AS tokens_after
FROM per, mn
"""
