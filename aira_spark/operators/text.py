"""Text analysis operators: language heuristic, quality score, token count,
document fingerprint (snippet-driven; oracle evaluates identical formulas)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions import textfns as tf

ENG = "spark"


def text_features(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, quality, lang_guess, fingerprint)."""
    return docs.selectExpr(
        "doc_id",
        f"{tf.n_tokens('text', ENG)} AS n_tokens",
        f"{tf.quality_score('text', ENG)} AS quality",
        f"{tf.lang_guess('text', ENG)} AS lang_guess",
        f"{tf.h64('text', ENG)} AS fingerprint",
    )


def quality_filter(docs: DataFrame, min_quality: float = 0.5) -> DataFrame:
    """The training-data keep/drop gate: docs passing the quality threshold."""
    feats = text_features(docs)
    return feats.filter(feats.quality >= min_quality).select("doc_id", "quality")
