"""Model-based quality classification of a document corpus.

The production shape of LLM corpus curation's final gate (CCNet, LLaMA,
DCLM): a cheap linear classifier over hashed bigram features scores every
document, and a threshold on the score decides keep/drop. Expressed
Spark-first this is a PURE PROJECTION — no explode survives the plan, no
weights table is joined (the hashed weights are a closed-form function of
the feature id, see functions/classifyfns.py), so the 10^12-doc corpus is
scored in a single map pass with ZERO exchanges (plan pinned by
tests/test_plans.py).

Two interchangeable evaluation paths, bit-identical by construction:

  - `logit_udf` (default): one Arrow-batched pandas UDF computes the
    integer logit per batch in Python md5 (the gram_hashes_arrow device —
    ~10x the interpreted expression chain at 2 md5 calls per bigram);
  - the SQL expression form (classifyfns.logit_expr), which the DuckDB
    oracle runs verbatim; parity is pinned by test_classifier_udf_matches_sql.

Everything downstream of the integer logit (sigmoid score, label) is shared
expression text in both engines.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as Ty
from pyspark.sql.functions import pandas_udf

from ..functions import classifyfns as cf


def logit_udf():
    """Arrow-vectorized integer logit: BIAS + sum of hashed-bigram weights.
    Matches classifyfns.logit_expr('spark') bit-for-bit (same md5-prefix
    integers, same int64 sum); NULL text scores bias-only like the SQL
    CASE/aggregate-over-empty forms."""
    bias, d, wr = cf.BIAS_MICROS, cf.D_FEATS, cf.W_RANGE
    # the D=4096 weight table is tiny and pure — precompute once per
    # executor so each bigram costs ONE md5, not two
    table = [
        int(hashlib.md5(f"{f}:w".encode()).hexdigest()[:15], 16) % wr - 1_000_000
        for f in range(d)
    ]

    @pandas_udf(Ty.LongType())
    def lg(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(bias)
                continue
            ws = t.split(" ")
            acc = bias
            for j in range(len(ws) - 1):
                g = ws[j] + " " + ws[j + 1]
                f = int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16) % d
                acc += table[f]
            out.append(acc)
        return pd.Series(out)

    return lg.asNondeterministic()


def classifier_scores(docs: DataFrame, use_arrow: bool = True) -> DataFrame:
    """(doc_id, n_feats, logit_micros, score, label): hashed-linear quality
    score for EVERY document (absent rows would silently drop docs from the
    corpus gate). `use_arrow=False` runs the pure-SQL expression form."""
    if use_arrow:
        logit = logit_udf()(F.col("text"))
    else:
        logit = F.expr(cf.logit_expr(cf.grams_expr("text", "spark"), "spark"))
    return docs.select(
        "doc_id",
        F.expr(cf.n_feats_expr("text", "spark")).alias("n_feats"),
        logit.cast("long").alias("logit_micros"),
    ).selectExpr(
        "doc_id",
        "n_feats",
        "logit_micros",
        f"{cf.score_expr('logit_micros')} AS score",
        f"{cf.label_expr('logit_micros')} AS label",
    )


def oracle_classifier_sql(table: str = "documents") -> str:
    """DuckDB mirror: the SQL expression form over the same table."""
    grams = cf.grams_expr("text", "duckdb")
    return f"""
WITH scored AS (
  SELECT doc_id, {cf.n_feats_expr("text", "duckdb")} AS n_feats,
         {cf.logit_expr(grams, "duckdb")} AS logit_micros
  FROM {table}
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_feats, logit_micros,
       {cf.score_expr("logit_micros")} AS score,
       {cf.label_expr("logit_micros")} AS label
FROM scored
"""
