"""Exact-substring duplication spans (the Lee et al. 2022 "Deduplicating
Training Data Makes Language Models Better" ExactSubstr census): for every
document, the LONGEST RUN of consecutive word k-gram positions whose gram
also appears in ANOTHER document — the span a substring-level deduper
would cut, one level finer than ngram_novelty's per-doc fraction and
decontaminate's cross-set flag.

Positions matter here, so this uses a POSITIONAL variant of
text.gram_hashes_arrow (same md5-prefix mod MH_P integer formula, NOT
deduplicated — order is the position); a gram is "duplicated" when it
occurs in >= min_df DISTINCT documents. Runs are the textbook
gaps-and-islands: island = pos - row_number over the sorted duplicated
positions, per doc; the reported longest run breaks ties to the SMALLEST
start via the encoded argmax max(len * 2^32 + (2^32 - 1 - start)) (the
focal_majority device — no engine ordering in play). A run of R gram
positions covers R + k - 1 tokens (span_tokens).

Scale shape (100 TB): text crosses Arrow once (the positional hash UDF);
every exchange carries (doc_id, pos, hash) / (hash, count) integer rows
with map-side combine; the dup-gram filter is a gram-keyed semi-join
(the inverted_index exchange class); the island window partitions by
doc_id with state bounded by DOCUMENT LENGTH, never corpus size."""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as Ty
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

from ..functions import textfns as tf

ENC = 1 << 32


def pos_gram_hashes_arrow(k: int):
    """Positional word k-gram hashes: the NON-distinct sibling of
    text.gram_hashes_arrow — element j is the hash of words[j:j+k]
    (identical md5-prefix mod MH_P formula; < k words -> empty array)."""
    P = tf.MH_P

    @pandas_udf(Ty.ArrayType(Ty.LongType()))
    def gh(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            ws = t.split(" ")
            out.append([
                int(
                    hashlib.md5(
                        " ".join(ws[j: j + k]).encode("utf-8")
                    ).hexdigest()[:15],
                    16,
                ) % P
                for j in range(len(ws) - k + 1)
            ])
        return pd.Series(out)

    return gh.asNondeterministic()


def exact_substr_spans(
    docs: DataFrame, k: int = 13, min_df: int = 2
) -> DataFrame:
    """(doc_id, n_grams, n_dup_pos, max_run, run_start, span_tokens) for
    every document holding at least one duplicated k-gram position."""
    gh = pos_gram_hashes_arrow(k)
    pg = (
        docs.select("doc_id", gh(F.col("text")).alias("ghs"))
        .select(
            "doc_id", F.size("ghs").alias("n_grams"),
            F.posexplode("ghs").alias("pos", "g"),
        )
        # pinned: consumed twice below (df side + positional join back) —
        # without the pin each consumer re-runs the Arrow gram-hash UDF
        # over every document (SURVEY §8 rule #4); text is already gone
        .localCheckpoint(eager=True)
    )
    dup = (
        pg.select("doc_id", "g").distinct()
        .groupBy("g").agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_df)
        .select("g")
    )
    dp = pg.join(dup, "g").select("doc_id", "n_grams", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        dp.withColumn("grp", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "n_grams", "grp")
        .agg(
            F.count("*").cast("long").alias("run_len"),
            F.min("pos").cast("long").alias("start"),
        )
    )
    return (
        runs.groupBy("doc_id", "n_grams")
        .agg(
            F.sum("run_len").cast("long").alias("n_dup_pos"),
            F.max(
                F.col("run_len") * F.lit(ENC)
                + (F.lit(ENC - 1) - F.col("start"))
            ).alias("key"),
        )
        .selectExpr(
            "doc_id",
            "CAST(n_grams AS BIGINT) AS n_grams",
            "n_dup_pos",
            "CAST(key DIV {e} AS BIGINT) AS max_run".format(e=ENC),
            f"CAST({ENC - 1} - key % {ENC} AS BIGINT) AS run_start",
            f"CAST(key DIV {ENC} + {k - 1} AS BIGINT) AS span_tokens",
        )
    )


def oracle_exact_substr_sql(
    docs_sql: str, k: int = 13, min_df: int = 2
) -> str:
    """DuckDB mirror over a subquery yielding (doc_id, text): positional
    shingle hashes by the identical md5-prefix formula, same semi-join,
    islands and encoded argmax."""
    wsd = "string_split(text, ' ')"
    sh = tf.shingles_from_words("ws", k, "duck")
    base = tf.h64("ss[j]", "duck")
    return f"""
WITH docs AS ({docs_sql}),
tw AS (SELECT doc_id, {wsd} AS ws FROM docs),
sg AS (SELECT doc_id, {sh} AS ss FROM tw),
pg AS (
  SELECT doc_id, CAST(len(ss) AS BIGINT) AS n_grams,
    CAST(j AS BIGINT) - 1 AS pos,
    ({base}) % {tf.MH_P} AS g
  FROM (SELECT doc_id, ss, unnest(generate_series(1, len(ss))) AS j
        FROM sg)
),
dup AS (
  SELECT g FROM (SELECT DISTINCT doc_id, g FROM pg)
  GROUP BY g HAVING COUNT(*) >= {min_df}
),
dp AS (
  SELECT p.doc_id, p.n_grams, p.pos FROM pg p JOIN dup d ON d.g = p.g
),
runs AS (
  SELECT doc_id, n_grams,
    pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp,
    pos
  FROM dp
),
isl AS (
  SELECT doc_id, n_grams, grp, CAST(COUNT(*) AS BIGINT) AS run_len,
    CAST(MIN(pos) AS BIGINT) AS start
  FROM runs GROUP BY 1, 2, 3
)
SELECT doc_id, n_grams,
  CAST(SUM(run_len) AS BIGINT) AS n_dup_pos,
  CAST(MAX(run_len * {ENC} + ({ENC - 1} - start)) // {ENC} AS BIGINT)
    AS max_run,
  CAST({ENC - 1} - MAX(run_len * {ENC} + ({ENC - 1} - start)) % {ENC}
    AS BIGINT) AS run_start,
  CAST(MAX(run_len * {ENC} + ({ENC - 1} - start)) // {ENC} + {k - 1}
    AS BIGINT) AS span_tokens
FROM isl GROUP BY 1, 2"""
