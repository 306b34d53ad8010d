"""Flesch reading-ease census per document — the classic readability
quality gate (Flesch 1948; the C4/CCNet-era pipelines' "is this prose
or boilerplate" heuristic class):

    score = 206.835 - 1.015 * words/sentences - 84.6 * syllables/words

re-expressed in EXACT integer fixed point: the three constants are e3
literals (206835 / 1015 / 84600 — the benford compile-time-constant
device), the two ratios ship as separate integer floor divisions of
exact counts, and the score is their integer combination — no floats in
either engine, ever:

    flesch_e3 = 206835 - (1015*W) DIV S - (84600*Y) DIV W

(a DEFINED fixed-point convention: each term floors independently; both
engines share the text verbatim so they cannot disagree). Counts come
from `functions/textfns.py`'s one-formula-two-engines builders: words =
letter runs, sentences = [.!?]+ runs clamped to >= 1, syllables =
vowel-group runs + one per vowelless word. Documents with zero letter
words are dropped (no readability without words). The 4-class band
(very_easy / standard / difficult / very_confusing at 90e3/60e3/30e3)
is a pure projection on the integer score.

Scale shape (100 TB): entirely per-row projection (regex counting is
JVM-side, whole-stage-codegen'd) + NO aggregation at all — the ideal
operator shape; the census output is one row per document with text
pruned immediately after counting."""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions import textfns as tf

_SCORE = "206835 - (1015 * n_words) {div} n_sents - (84600 * n_syll) {div} n_words"
_BAND = (
    "CASE WHEN flesch_e3 >= 90000 THEN 'very_easy' "
    "WHEN flesch_e3 >= 60000 THEN 'standard' "
    "WHEN flesch_e3 >= 30000 THEN 'difficult' "
    "ELSE 'very_confusing' END"
)


def flesch_census(docs: DataFrame) -> DataFrame:
    """(doc_id, n_words, n_sents, n_syll, flesch_e3, band) from docs
    carrying (doc_id, text); zero-word docs drop."""
    return (
        docs.selectExpr(
            "CAST(doc_id AS BIGINT) AS doc_id",
            f"CAST({tf.n_letter_words('text', 'spark')} AS BIGINT) AS n_words",
            f"CAST({tf.n_sentences('text', 'spark')} AS BIGINT) AS n_sents",
            f"CAST({tf.n_syllables('text', 'spark')} AS BIGINT) AS n_syll",
        )
        .where("n_words > 0")
        .selectExpr(
            "doc_id", "n_words", "n_sents", "n_syll",
            f"CAST({_SCORE.format(div='DIV')} AS BIGINT) AS flesch_e3",
        )
        .selectExpr(
            "doc_id", "n_words", "n_sents", "n_syll", "flesch_e3",
            f"{_BAND} AS band",
        )
    )


def oracle_flesch_sql(docs_sql: str) -> str:
    """DuckDB mirror over a subquery yielding (doc_id, text)."""
    return f"""
WITH d AS ({docs_sql}),
counts AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
    CAST({tf.n_letter_words('text', 'duckdb')} AS BIGINT) AS n_words,
    CAST({tf.n_sentences('text', 'duckdb')} AS BIGINT) AS n_sents,
    CAST({tf.n_syllables('text', 'duckdb')} AS BIGINT) AS n_syll
  FROM d
),
scored AS (
  SELECT doc_id, n_words, n_sents, n_syll,
    CAST({_SCORE.format(div='//')} AS BIGINT) AS flesch_e3
  FROM counts WHERE n_words > 0
)
SELECT doc_id, n_words, n_sents, n_syll, flesch_e3, {_BAND} AS band
FROM scored
"""
