"""Portable hashed-linear-classifier snippets: one formula, two engines.

A fastText-style bag-of-hashed-bigrams linear scorer (Joulin et al. 2016;
the architecture behind the CCNet/LLaMA quality and language filters):
word-bigram features hash into D buckets, each bucket carries a weight, and
a document's logit is the sum of its features' weights plus a bias.

No trained model can exist in this sandbox, so the weight table is a
DETERMINISTIC stand-in: weight(f) is drawn from the same md5-prefix stream
(h64) the repo's LSH planes use — a pure function of the feature id, so
both engines reconstruct the identical "model" from the formula alone (the
same device as lshfns.plane_weights, which pins this as a valid stand-in:
swapping in real trained micros changes only the constants). Everything up
to the logit is exact int64:

  feature  f        = h64(bigram) % D
  weight   w(f)     = h64(CAST(f AS STRING) || ':w') % 2000001 - 10^6
                      (micros, symmetric in [-10^6, 10^6])
  logit_micros      = BIAS + sum over the doc's bigrams of w(f)
                      (integer sum — agg/fold order cannot change it)
  score             = ROUND(sigmoid(logit_micros / 10^6), 6)

The sigmoid is the only float op and divides exact integers; ROUND(..,6)
absorbs any cross-libm exp() ULP.
"""

from __future__ import annotations

from .textfns import h64, shingles_from_words, words

D_FEATS = 4096
W_RANGE = 2_000_001  # weights span [-10^6, 10^6] micros
BIAS_MICROS = 50_000


def feat_expr(g: str, engine: str) -> str:
    """Feature bucket of one bigram string (h64 is non-negative, so % is
    engine-identical)."""
    return f"({h64(g, engine)} % {D_FEATS})"


def weight_expr(g: str, engine: str) -> str:
    """Stand-in weight (micros) of the bigram's feature bucket."""
    f = feat_expr(g, engine)
    cast = "STRING" if engine == "spark" else "VARCHAR"
    tagged = f"(CAST({f} AS {cast}) || ':w')"
    return f"({h64(tagged, engine)} % {W_RANGE} - 1000000)"


def grams_expr(text: str, engine: str) -> str:
    """Word-bigram array (empty when the doc has < 2 words)."""
    return shingles_from_words(words(text, engine), 2, engine)


def logit_expr(grams: str, engine: str) -> str:
    """BIAS + integer weight sum over a bigram-array expression."""
    w = weight_expr("g", engine)
    if engine == "spark":
        return (
            f"aggregate({grams}, CAST({BIAS_MICROS} AS BIGINT), "
            f"(acc, g) -> acc + {w})"
        )
    return (
        f"({BIAS_MICROS} + COALESCE(CAST(list_sum("
        f"list_transform({grams}, g -> {w})) AS BIGINT), 0))"
    )


def n_feats_expr(text: str, engine: str) -> str:
    """Bigram count: max(n_words - 1, 0); NULL text scores bias-only."""
    if engine == "spark":
        n = f"size(split({text}, ' '))"
    else:
        n = f"len(string_split({text}, ' '))"
    return (
        f"CAST(CASE WHEN {text} IS NULL THEN 0 "
        f"ELSE GREATEST({n} - 1, 0) END AS BIGINT)"
    )


def score_expr(logit: str) -> str:
    """Sigmoid of the micros logit — identical text both engines."""
    return (
        f"ROUND(1.0 / (1.0 + exp(-CAST({logit} AS DOUBLE) / 1000000.0)), 6)"
    )


def label_expr(logit: str) -> str:
    return f"CASE WHEN {logit} > 0 THEN 'keep' ELSE 'drop' END"


def weight_micros(feat: int) -> int:
    """Python mirror of weight_expr for the Arrow path / tests."""
    import hashlib

    h = int(hashlib.md5(f"{feat}:w".encode()).hexdigest()[:15], 16)
    return h % W_RANGE - 1_000_000


def feat_of(gram: str) -> int:
    """Python mirror of feat_expr."""
    import hashlib

    return int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:15], 16) % D_FEATS
