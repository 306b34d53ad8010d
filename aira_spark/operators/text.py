"""Text analysis operators: language heuristic, quality score, token count,
document fingerprint (snippet-driven; oracle evaluates identical formulas)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as Ty
from pyspark.sql.pandas.functions import pandas_udf

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


def doc_fingerprints(docs: DataFrame, k: int = 8, w: int = 4) -> DataFrame:
    """(doc_id, doc_hash, fp): full-document Karp-Rabin rolling hash plus the
    exploded winnowing fingerprint set (window minima of char k-gram rolling
    hashes) — the containment/near-dup primitive for training-data pipelines.

    The k-gram + winnow step runs as a vectorized Arrow UDF evaluating the
    exact integer recurrence of textfns.kgram_hashes/winnow_from_grams (the
    DuckDB oracle runs the SQL form; values are bit-identical) — the nested
    SQL-lambda form is ~60x slower in Spark's expression interpreter."""
    B, M = tf.ROLL_B, tf.ROLL_M

    fp_schema = Ty.StructType(
        [
            Ty.StructField("doc_hash", Ty.LongType()),
            Ty.StructField("fps", Ty.ArrayType(Ty.LongType())),
        ]
    )

    @pandas_udf(fp_schema)
    def winnow(texts: pd.Series) -> pd.DataFrame:
        out = []
        for t in texts:
            n = len(t)
            c = np.fromiter((ord(ch) for ch in t), dtype=np.int64, count=n)
            if n == 0:
                out.append((0, [0]))
                continue
            dh = c[0]
            for i in range(1, n):
                dh = (dh * B + c[i]) % M
            eff_k = min(k, n)
            m = n - eff_k + 1  # number of k-grams (SQL: greatest(n-k+1, 1))
            h = c[:m].copy()
            for i in range(1, eff_k):
                h = (h * B + c[i : i + m]) % M
            if len(h) > w:
                mins = h[: len(h) - w + 1].copy()
                for i in range(1, w):
                    np.minimum(mins, h[i : i + len(mins)], out=mins)
            else:
                mins = np.array([h.min()])
            out.append((int(dh), np.unique(mins).tolist()))
        return pd.DataFrame(out, columns=["doc_hash", "fps"])

    # single evaluation: materialize the struct in its own projection first
    # (asNondeterministic blocks project-collapse), then reference its fields
    # — inlining the UDF call twice in one select runs it twice
    winnow = winnow.asNondeterministic()
    t = docs.select("doc_id", winnow(F.col("text")).alias("wres"))
    return t.select(
        "doc_id",
        F.col("wres.doc_hash").alias("doc_hash"),
        F.explode("wres.fps").alias("fp"),
    )


def quality_filter(docs: DataFrame, min_quality: float = 0.5) -> DataFrame:
    """The training-data keep/drop gate: docs passing the quality threshold."""
    feats = text_features(docs)
    return feats.filter(feats.quality >= min_quality).select("doc_id", "quality")
