"""TF-IDF term weighting — the lexical vectorizer next to rank.py's BM25
(same retrieval family, different weighting: BM25 saturates tf and
length-normalizes; TF-IDF is the raw product feeding cosine retrieval,
keyword extraction, and classical text classification).

Smoothed idf (the sklearn convention): idf = ln((N + 1) / (df + 1)) + 1,
so terms present in every document still carry weight 1 and nothing
divides by zero.

Scale shape (the bm25_scores template): one explode + (doc, term) count is
the only corpus-sized aggregation; document frequency is a second tiny agg
over the distinct hits; the vocabulary filter (min_df <= df <= max_df
fraction) prunes Zipf head AND tail BEFORE the weight join, which then
BROADCASTs the surviving vocabulary. Text never shuffles — only (doc_id,
term, tf) integer/string rows.

Exactness: tf/df/n_docs are exact BIGINTs; tfidf_micros is the shared-text
ln formula over those integers rounded once (the bm25 rule)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TFIDF_TEXT = (
    "CAST(round(CAST(tf AS DOUBLE) * "
    "(ln((CAST(n_docs AS DOUBLE) + 1) / (CAST(df AS DOUBLE) + 1)) + 1) "
    "* 1000000, 0) AS BIGINT)"
)


def tfidf_weights(
    docs: DataFrame, min_df: int = 5, max_df_frac: str = "0.5"
) -> DataFrame:
    """(doc_id, term, tf, df, n_docs, tfidf_micros) for vocabulary terms
    with min_df <= df <= max_df_frac * N. `docs` needs (doc_id, text)."""
    hits = (
        docs.selectExpr("doc_id", "explode(split(text, ' ')) AS term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    n = docs.agg(F.count("*").cast("long").alias("n_docs"))
    dfreq = (
        hits.groupBy("term")
        .agg(F.countDistinct("doc_id").cast("long").alias("df"))
        .crossJoin(F.broadcast(n))
        .where(
            (F.col("df") >= min_df)
            & (F.col("df").cast("double")
               <= F.expr(f"{max_df_frac} * CAST(n_docs AS DOUBLE)"))
        )
    )
    return (
        hits.join(F.broadcast(dfreq), "term")
        .selectExpr(
            "doc_id", "term", "tf", "df", "n_docs",
            f"{TFIDF_TEXT} AS tfidf_micros",
        )
    )


def oracle_tfidf_sql(
    table: str = "documents", min_df: int = 5, max_df_frac: str = "0.5"
) -> str:
    return f"""
WITH hits AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM {table})
  GROUP BY doc_id, term
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM {table}),
dfreq AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df, n.n_docs
  FROM hits, n GROUP BY term, n.n_docs
  HAVING COUNT(DISTINCT doc_id) >= {min_df}
     AND CAST(COUNT(DISTINCT doc_id) AS DOUBLE)
         <= {max_df_frac} * CAST(n.n_docs AS DOUBLE)
)
SELECT h.doc_id, h.term, h.tf, d.df, d.n_docs, {TFIDF_TEXT} AS tfidf_micros
FROM hits h JOIN dfreq d ON d.term = h.term"""
