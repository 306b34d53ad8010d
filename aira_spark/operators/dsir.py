"""DSIR-style hashed n-gram importance scoring (Xie et al. 2023, "Data
Selection for Language Models via Importance Resampling") in exact
integer arithmetic.

DSIR selects pretraining documents that RESEMBLE a small target corpus:
hash every bigram into B buckets, fit unigram-over-buckets distributions
p_target and p_source, and score each document by how much more likely
its buckets are under the target than the source. The published score is
a log-likelihood ratio — libm territory, banned from checked projections
(SURVEY §8 palette) — so this operator uses the log-free monotone analog
consistent with `lm.py`: per-bucket weight = ppm_target(b) - ppm_source(b)
(integer PPM probabilities, floor(1e6 * cnt / total)), summed per
document. Positive = target-like, negative = source-like; the RANKING the
resampler consumes is preserved, and every intermediate is a BIGINT both
engines reproduce bit-for-bit.

The hash is the shared md5-prefix h64 (identical numeric value in Spark
and DuckDB) mod `buckets` — DSIR's hashing trick is exactly what makes
this scale: the weight model is <= B rows NO MATTER THE CORPUS SIZE, so
it always broadcasts, and feature extraction is pure JVM array
expressions (arrays_zip over shifted slices, the lm.py device — no
Python anywhere).

Scale shape: ONE explode + two bucket aggs (map-side combine; exchanges
carry <= B integer rows) to fit the model, then scoring is a broadcast
left join + per-doc agg. Docs with no qualifying bigram score (0, 0) —
emitted, not dropped (a curation gate must see every document).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textfns import h64

PPM = 1_000_000
DEFAULT_BUCKETS = 4096


def _doc_buckets(docs: DataFrame, buckets: int) -> DataFrame:
    """(doc_id, lang, b): one row per adjacent-word-pair occurrence, with
    the pair hashed into its bucket. Empty tokens (double spaces) drop."""
    ws = docs.selectExpr("doc_id", "lang", "split(text, ' ') AS ws").where(
        "size(ws) > 1"
    )
    z = ws.selectExpr(
        "doc_id", "lang",
        "explode(arrays_zip(slice(ws, 1, size(ws) - 1), "
        "slice(ws, 2, size(ws) - 1))) AS z",
    ).selectExpr("doc_id", "lang", "z['0'] AS w1", "z['1'] AS w2")
    hb = h64("concat(w1, ' ', w2)", "spark")
    return z.where("w1 != '' AND w2 != ''").selectExpr(
        "doc_id", "lang", f"{hb} % {buckets} AS b"
    )


def importance_weights(
    docs: DataFrame,
    target_pred: str = "lang = 'en'",
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(b, cnt_t, cnt_s, w): the hashed bucket weight model. w =
    ppm_target(b) - ppm_source(b); buckets unseen in a corpus contribute
    0 ppm there. <= `buckets` rows — always broadcastable."""
    bk = _doc_buckets(docs, buckets)
    tgt = bk.where(target_pred).groupBy("b").agg(
        F.count("*").cast("long").alias("cnt_t")
    )
    src = bk.where(f"NOT ({target_pred})").groupBy("b").agg(
        F.count("*").cast("long").alias("cnt_s")
    )
    tot_t = tgt.agg(F.sum("cnt_t").cast("long").alias("tot_t"))
    tot_s = src.agg(F.sum("cnt_s").cast("long").alias("tot_s"))
    return (
        tgt.join(src, "b", "full_outer")
        .fillna(0, subset=["cnt_t", "cnt_s"])
        .crossJoin(F.broadcast(tot_t))
        .crossJoin(F.broadcast(tot_s))
        .selectExpr(
            "CAST(b AS BIGINT) AS b",
            "CAST(cnt_t AS BIGINT) AS cnt_t",
            "CAST(cnt_s AS BIGINT) AS cnt_s",
            f"CAST({PPM} AS BIGINT) * cnt_t div tot_t "
            f"- CAST({PPM} AS BIGINT) * cnt_s div tot_s AS w",
        )
    )


def dsir_scores(
    docs: DataFrame,
    target_pred: str = "lang = 'en'",
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(doc_id, n_feats, score): per-document target-resemblance score =
    sum over the doc's bucket OCCURRENCES (with multiplicity, as DSIR
    weights repeated features) of the bucket weight."""
    wt = importance_weights(docs, target_pred, buckets)
    per_doc = (
        _doc_buckets(docs, buckets)
        .join(F.broadcast(wt.select("b", "w")), "b", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.sum(F.coalesce(F.col("w"), F.lit(0))).cast("long").alias("score"),
        )
    )
    return (
        docs.select("doc_id").distinct()
        .join(per_doc, "doc_id", "left")
        .fillna(0, subset=["n_feats", "score"])
        .selectExpr(
            "CAST(doc_id AS BIGINT) AS doc_id",
            "CAST(n_feats AS BIGINT) AS n_feats",
            "CAST(score AS BIGINT) AS score",
        )
    )


def oracle_dsir_sql(
    table: str = "documents",
    target_pred: str = "lang = 'en'",
    buckets: int = DEFAULT_BUCKETS,
) -> str:
    """DuckDB mirror: same bigram extraction, same h64-mod bucket, same
    integer PPM difference weights, same left-join OOV floor."""
    hb = h64("w1 || ' ' || w2", "duck")
    return f"""
WITH ws AS (
  SELECT doc_id, lang, string_split(text, ' ') AS w FROM {table}
),
bk AS (
  SELECT doc_id, lang, {hb} % {buckets} AS b
  FROM (
    SELECT doc_id, lang, z[1] AS w1, z[2] AS w2
    FROM (
      SELECT doc_id, lang, unnest(list_zip(w[1:len(w) - 1], w[2:len(w)])) AS z
      FROM ws WHERE len(w) > 1
    )
    WHERE z[1] != '' AND z[2] != ''
  )
),
tgt AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS cnt_t FROM bk
  WHERE {target_pred} GROUP BY 1
),
src AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS cnt_s FROM bk
  WHERE NOT ({target_pred}) GROUP BY 1
),
wt AS (
  SELECT COALESCE(t.b, s.b) AS b,
    CAST({PPM} AS BIGINT) * COALESCE(t.cnt_t, 0)
      // (SELECT SUM(cnt_t) FROM tgt)
    - CAST({PPM} AS BIGINT) * COALESCE(s.cnt_s, 0)
      // (SELECT SUM(cnt_s) FROM src) AS w
  FROM tgt t FULL OUTER JOIN src s ON t.b = s.b
),
scored AS (
  SELECT bk.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
         CAST(SUM(COALESCE(wt.w, 0)) AS BIGINT) AS score
  FROM bk LEFT JOIN wt ON bk.b = wt.b
  GROUP BY bk.doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       COALESCE(s.n_feats, 0) AS n_feats,
       COALESCE(s.score, 0) AS score
FROM (SELECT DISTINCT doc_id FROM {table}) d
LEFT JOIN scored s ON d.doc_id = s.doc_id
"""
