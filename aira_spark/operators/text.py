"""Text analysis operators: language heuristic, quality score, token count,
document fingerprint (snippet-driven; oracle evaluates identical formulas)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as Ty
from pyspark.sql.pandas.functions import pandas_udf

from ..functions import textfns as tf

ENG = "spark"


def text_features(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_bpe_tokens, quality, lang_guess, fingerprint):
    whitespace + BPE-ish-regex token counts, quality score, language
    heuristic, content fingerprint — one projection, pure JVM SQL."""
    return docs.selectExpr(
        "doc_id",
        f"{tf.n_tokens('text', ENG)} AS n_tokens",
        f"CAST({tf.n_bpe_tokens('text', ENG)} AS BIGINT) AS n_bpe_tokens",
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

    L = 512  # Horner block width: Python big-int ops drop from O(chars) to O(chars / L)
    BL = pow(B, L, M)

    @pandas_udf(fp_schema)
    def winnow(texts: pd.Series) -> pd.DataFrame:
        # char decode vectorized (utf-32-le view = code points, C speed),
        # zero-padded at the FRONT to a block multiple — leading zeros add
        # 0 * B^j terms, so the polynomial value mod M is unchanged
        chars = []
        blocks = []
        for t in texts:
            if t is None:
                # NULL text -> NULL row (the SQL form degrades to NULL);
                # None.encode would otherwise kill the whole Arrow task
                chars.append(None)
                continue
            c = np.frombuffer(t.encode("utf-32-le"), dtype="<u4").astype(np.int64)
            chars.append(c)
            n = len(c)
            if n:
                pad = (-n) % L
                cp = np.concatenate([np.zeros(pad, np.int64), c]) if pad else c
                blocks.append(cp.reshape(-1, L))
        # ONE vectorized Horner sweep over every block of every doc in the
        # batch: L numpy steps total (values < M*B + 255 < 2^60 — no overflow)
        if blocks:
            bm = np.concatenate(blocks)
            acc = np.zeros(len(bm), dtype=np.int64)
            for j in range(L):
                acc = (acc * B + bm[:, j]) % M
        out = []
        pos = 0
        for c in chars:
            if c is None:
                out.append((None, None))
                continue
            n = len(c)
            if n == 0:
                out.append((0, [0]))
                continue
            nb = (n + L - 1) // L
            # combine block hashes with B^L steps — ceil(n/L) big-int ops
            # (acc * BL overflows int64, so this stays in Python ints); the
            # value is bit-identical to the sequential per-char fold, pinned
            # by the SQL-form DuckDB oracle on `fingerprints`
            dh = 0
            for hblk in acc[pos : pos + nb].tolist():
                dh = (dh * BL + hblk) % M
            pos += nb
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


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals per document, as EXACT integers:
    (doc_id, n_words, n_distinct, top_word_cnt, n_bigrams, top_bigram_cnt).

    Downstream filters derive the published ratios (top_word_cnt/n_words is
    Gopher's most-common-word fraction, top_bigram_cnt/n_bigrams the
    top-2-gram fraction, n_distinct/n_words the type-token ratio) — emitting
    the integer numerators/denominators keeps the oracle compare exact.

    Plan shape: explode -> two-level hash aggregation (per-(doc, gram) count,
    then per-doc max/sum) — the canonical distributed word-count; partial
    (map-side) aggregation applies at both levels, and nothing is quadratic
    in document length (the in-array `filter` formulation would be)."""
    # project the word array ONCE: higher-order-function lambdas get no
    # common-subexpression elimination, so inlining words() into the bigram
    # transform would re-split the text per array element (O(n^2) per doc)
    ws = docs.selectExpr("doc_id", f"{tf.words('text', ENG)} AS ws")
    words = ws.selectExpr("doc_id", "explode(ws) AS g")
    wstats = (
        words.groupBy("doc_id", "g").count()
        .groupBy("doc_id")
        .agg(
            F.sum("count").alias("n_words"),
            F.count("*").alias("n_distinct"),
            F.max("count").alias("top_word_cnt"),
        )
    )
    bg = tf.shingles_from_words("ws", 2, ENG)
    bigrams = ws.selectExpr("doc_id", f"explode({bg}) AS g")
    bstats = (
        bigrams.groupBy("doc_id", "g").count()
        .groupBy("doc_id")
        .agg(
            F.sum("count").alias("n_bigrams"),
            F.max("count").alias("top_bigram_cnt"),
        )
    )
    # line-level + symbol signals are pure per-doc projections (no explode):
    # bullet/ellipsis line fractions, symbol chars, total word chars — the
    # remaining Gopher quality signals, all exact integers
    lns = tf.lines("text", ENG)
    scalars = docs.selectExpr(
        "doc_id",
        f"CAST({tf.n_lines('text', ENG)} AS BIGINT) AS n_lines",
        f"CAST({tf.n_bullet_lines(lns, ENG)} AS BIGINT) AS n_bullet_lines",
        f"CAST({tf.n_ellipsis_lines(lns, ENG)} AS BIGINT) AS n_ellipsis_lines",
        f"{tf.n_symbol_chars('text', ENG)} AS n_symbols",
        f"{tf.total_word_chars('text', ENG)} AS word_chars",
    )
    # left join: a 1-word doc has no bigrams; surface 0s, not dropped rows
    return (
        wstats.join(bstats, "doc_id", "left")
        .na.fill({"n_bigrams": 0, "top_bigram_cnt": 0})
        .join(scalars, "doc_id")
        .select(
            "doc_id", "n_words", "n_distinct", "top_word_cnt",
            "n_bigrams", "top_bigram_cnt",
            "n_lines", "n_bullet_lines", "n_ellipsis_lines",
            "n_symbols", "word_chars",
        )
    )


def repetition_filter(
    docs: DataFrame,
    max_top_word_frac: float = 0.2,
    max_top_bigram_frac: float = 0.18,
    min_distinct_ratio: float = 0.2,
) -> DataFrame:
    """Keep/drop gate on the full Gopher signal set (repetition + line-level
    + symbol + word-length; thresholds are corpus-tuned — defaults are the
    published ballpark: <=90% bullet lines, <=30% ellipsis lines, symbol
    ratio <=0.1, mean word length in [3, 10]). Exact integer
    cross-multiplication — no float division in any predicate. Output keeps
    the integer signal columns so one entry covers stats AND gate."""
    s = repetition_stats(docs)
    # round(), not int(): 0.29 * 1e6 is 289999.99999999994 in binary — a
    # floor would make the gate marginally stricter than the stated
    # fraction at exact boundaries (identical for every default; the
    # oracle's _rep_predicates rounds the same way)
    kw = F.col("top_word_cnt") * F.lit(1_000_000) <= F.lit(round(max_top_word_frac * 1_000_000)) * F.col("n_words")
    kb = (F.col("n_bigrams") == 0) | (
        F.col("top_bigram_cnt") * F.lit(1_000_000)
        <= F.lit(round(max_top_bigram_frac * 1_000_000)) * F.col("n_bigrams")
    )
    kd = F.col("n_distinct") * F.lit(1_000_000) >= F.lit(round(min_distinct_ratio * 1_000_000)) * F.col("n_words")
    kbul = F.col("n_bullet_lines") * 10 <= F.col("n_lines") * 9
    kell = F.col("n_ellipsis_lines") * 10 <= F.col("n_lines") * 3
    ksym = F.col("n_symbols") * 10 <= F.col("n_words")
    kwl = (F.col("word_chars") >= F.col("n_words") * 3) & (
        F.col("word_chars") <= F.col("n_words") * 10
    )
    keep = kw & kb & kd & kbul & kell & ksym & kwl
    return s.select(
        "doc_id", "n_words", "n_distinct", "top_word_cnt",
        "n_bigrams", "top_bigram_cnt",
        "n_lines", "n_bullet_lines", "n_ellipsis_lines", "n_symbols", "word_chars",
        keep.alias("keep"),
        kw.alias("pass_word"), kb.alias("pass_bigram"), kd.alias("pass_distinct"),
        kbul.alias("pass_bullet"), kell.alias("pass_ellipsis"),
        ksym.alias("pass_symbol"), kwl.alias("pass_wordlen"),
    )


def corpus_clean(docs: DataFrame, min_quality: float = 0.5) -> DataFrame:
    """The composed training-data gate, end to end in one DataFrame plan:
    exact-dedup keeper selection (md5 groupBy — only the lowest doc_id of
    each identical-text group survives) AND quality threshold AND the
    repetition gate. Output: one row per document with each verdict and the
    conjunction — per document WITH non-NULL text, that is: a NULL-text doc
    produces no word rows, so the repetition arm has no row for it and the
    inner join dead-letters it from the output entirely (the same
    drop-don't-raise convention as an undecodable image; reconcile counts
    against a NOT NULL-filtered input, not the raw table).

    Plan shape: the dedup arm is a hash agg on md5 joined back on doc_id;
    the repetition arm is the explode/two-level agg of repetition_stats;
    both join the base scan on doc_id (sort-merge/hash — doc_id is unique,
    no skew). Nothing collects; every arm is a stock distributed shape."""
    from .dedup import exact_dedup

    base = docs.selectExpr(
        "doc_id", f"{tf.quality_score('text', ENG)} AS quality"
    )
    keepers = exact_dedup(docs).select(
        F.col("keeper_id").alias("doc_id"), F.lit(True).alias("is_keeper")
    )
    rep = repetition_filter(docs).select("doc_id", F.col("keep").alias("rep_pass"))
    return (
        base.join(keepers, "doc_id", "left")
        .join(rep, "doc_id")
        .select(
            "doc_id",
            F.coalesce(F.col("is_keeper"), F.lit(False)).alias("is_keeper"),
            (F.col("quality") >= F.lit(min_quality)).alias("quality_pass"),
            F.col("rep_pass"),
            (
                F.coalesce(F.col("is_keeper"), F.lit(False))
                & (F.col("quality") >= F.lit(min_quality))
                & F.col("rep_pass")
            ).alias("keep"),
        )
    )


def gram_hashes_arrow(k: int):
    """Vectorized distinct word k-gram hashes — the exact integer values of
    `array_distinct(shingle_hashes(shingles_from_words(words(text))))` (h64 =
    first-15-md5-hex-digits mod MH_P, distinct in first-occurrence order),
    evaluated per Arrow batch instead of Spark's expression interpreter: at
    k=13 the interpreted transform(concat x13 -> md5 -> conv) chain was the
    whole cost of decontaminate (~10x at bench scale). NULL text -> NULL
    array (explode drops it), < k words -> empty array — both matching the
    SQL form, which survives as the DuckDB oracle; parity pinned by
    test_gram_hashes_udf_matches_sql."""
    P = tf.MH_P

    @pandas_udf(Ty.ArrayType(Ty.LongType()))
    def gh(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            ws = t.split(" ")  # matches SQL split(text, ' ') incl. empties
            if len(ws) < k:
                out.append([])
                continue
            out.append(
                list(
                    dict.fromkeys(
                        int(
                            hashlib.md5(
                                " ".join(ws[j : j + k]).encode("utf-8")
                            ).hexdigest()[:15],
                            16,
                        )
                        % P
                        for j in range(len(ws) - k + 1)
                    )
                )
            )
        return pd.Series(out)

    # nondeterministic marker blocks project-collapse re-evaluation
    return gh.asNondeterministic()


def decontaminate(docs: DataFrame, bench: DataFrame, k: int = 13) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word k-gram with an evaluation set (the GPT-3/PaLM 13-gram overlap
    check). Output per CONTAMINATED doc: (doc_id, n_hit_grams — distinct
    overlapping grams, n_grams — the doc's distinct gram count,
    min_bench_doc — lowest overlapping benchmark doc). Docs shorter than k
    words have no grams and can never be flagged.

    Plan shape: both sides project word k-gram HASHES (integer h64 mod p —
    the minhash base hash, evaluated by the Arrow-vectorized
    gram_hashes_arrow; the identical SQL formula is the DuckDB oracle),
    explode, and equi-join on the gram hash. The benchmark side is
    eval-suite-sized (thousands of docs, not billions), so it BROADCASTS:
    the 10^12-doc training side is never shuffled — contamination is a
    map-side hash probe followed by a per-doc hash agg."""
    gh = gram_hashes_arrow(k)

    def gram_side(df: DataFrame, idc: str) -> DataFrame:
        return df.select(
            F.col("doc_id").alias(idc), gh(F.col("text")).alias("ghs")
        )

    corpus = (
        gram_side(docs, "doc_id")
        .select("doc_id", F.size("ghs").alias("n_grams"), F.explode("ghs").alias("g"))
    )
    # ONE broadcast row per gram: min(bench_doc) pre-aggregated — a
    # boilerplate gram in 1,000 bench docs would otherwise multiply every
    # corpus hit row 1,000x before the per-doc agg collapses them, and the
    # per-doc min/countDistinct over the pre-agg is identical by
    # associativity of min and per-doc distinctness of ghs
    bench_grams = (
        gram_side(bench, "bench_doc")
        .select("bench_doc", F.explode("ghs").alias("g"))
        .groupBy("g")
        .agg(F.min("bench_doc").alias("bench_doc"))
    )
    return (
        corpus.join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id", "n_grams")
        .agg(
            F.countDistinct("g").alias("n_hit_grams"),
            F.min("bench_doc").alias("min_bench_doc"),
        )
        .select("doc_id", "n_hit_grams", "n_grams", "min_bench_doc")
    )


def ngram_novelty(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, n_grams, n_novel, novelty_e6): per-document n-gram novelty
    — the fraction of a doc's DISTINCT word k-grams that appear in no
    other document. The boilerplate/template detector: mirrored pages,
    licence blocks, and near-duplicates score near 0, original prose near
    1e6 (novelty ships as floor fixed point n_novel*1e6 DIV n_grams — all
    BIGINT, truncation identical in both engines). Docs shorter than k
    words have no grams and emit no row.

    Plan shape: the same word-k-gram integer hashes as decontaminate
    (gram_hashes_arrow / the identical SQL formula), exploded once; the
    document-frequency side is ONE gram-keyed hash agg with map-side
    combine (each doc contributes its grams distinct, so COUNT(*) IS the
    doc frequency), and the join back is gram-keyed — the inverted_index
    /tfidf exchange class. Text never shuffles; only (doc_id, hash) rows
    do."""
    gh = gram_hashes_arrow(k)
    ce = (
        docs.select("doc_id", gh(F.col("text")).alias("ghs"))
        .select(
            "doc_id",
            F.size("ghs").alias("n_grams"),
            F.explode("ghs").alias("g"),
        )
        # pinned: consumed twice below (df agg + gram-keyed join back) —
        # without the pin each consumer re-runs the Arrow gram-hash UDF
        # over every document (SURVEY §8 rule #4); text is already gone
        .localCheckpoint(eager=True)
    )
    df_g = ce.groupBy("g").agg(F.count("*").alias("df"))
    return (
        ce.join(df_g, "g")
        .groupBy("doc_id", "n_grams")
        .agg(
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("long").alias("n_novel")
        )
        .selectExpr(
            "CAST(doc_id AS BIGINT) AS doc_id",
            "CAST(n_grams AS BIGINT) AS n_grams",
            "n_novel",
            "CAST(n_novel * 1000000 AS BIGINT) DIV n_grams AS novelty_e6",
        )
    )
