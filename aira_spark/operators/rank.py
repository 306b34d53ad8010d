"""BM25 relevance scoring of a document corpus against a query set.

The standard lexical retrieval scorer (Robertson/Sparck Jones; the Lucene
idf form ln(1 + (N - df + 0.5)/(df + 0.5)), k1=1.2, b=0.75), expressed so
the result is EXACTLY reproducible across engines:

- every per-term contribution is computed by ONE shared expression string
  (identical text in Spark and DuckDB — the repo's one-formula-two-engines
  rule), then rounded to integer MICROS (round half-up of contribution*1e6);
- the per-(query, doc) score is the BIGINT SUM of those micros — integer
  addition is order-independent, so Spark's partial/final agg order vs
  DuckDB's scan order cannot produce differing last bits (a double SUM
  would);
- the reported double score divides the same two exact integers once.

Scale shape: the corpus side is touched twice, both times cheaply — a
words-explode filtered by the BROADCAST query-term set (hits only survive:
the shuffle carries (doc_id, term, tf, dl) hit rows, never text), and the
idf/N/avgdl statistics are metadata-sized aggregates broadcast back. No
join ever shuffles the corpus; total cost is one hit-row shuffle + one
(query, doc) agg shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1_TEXT = "1.2"
B_TEXT = "0.75"
MICROS = 1_000_000


def bm25_contrib_text(
    tf_c: str = "tf", df_c: str = "df", dl_c: str = "dl",
    n_c: str = "n_docs", tot_c: str = "total_dl",
) -> str:
    """Per-term BM25 contribution in integer micros — ONE string, valid and
    value-identical in Spark SQL and DuckDB (ln/round/CAST agree; division
    order is pinned by the parenthesization; all inputs are BIGINTs)."""
    # every integer input is cast to DOUBLE BEFORE arithmetic: Spark would
    # otherwise rewrite `bigint + 0.5` into DECIMAL(20,0) arithmetic and
    # divide as decimals (DuckDB stays in DOUBLE) — same-looking text,
    # different numerics. With explicit casts both engines run the identical
    # IEEE op sequence.
    nf, dff, tff, dlf, totf = (
        f"CAST({n_c} AS DOUBLE)", f"CAST({df_c} AS DOUBLE)",
        f"CAST({tf_c} AS DOUBLE)", f"CAST({dl_c} AS DOUBLE)",
        f"CAST({tot_c} AS DOUBLE)",
    )
    idf = f"ln(1 + ({nf} - {dff} + 0.5) / ({dff} + 0.5))"
    tfn = (
        f"({tff} * ({K1_TEXT} + 1)) / "
        f"({tff} + {K1_TEXT} * (1 - {B_TEXT} + {B_TEXT} * "
        f"(({dlf} * {nf}) / {totf})))"
    )
    return f"CAST(round(({idf}) * ({tfn}) * {MICROS}, 0) AS BIGINT)"


def bm25_scores(docs: DataFrame, queries: DataFrame) -> DataFrame:
    """(query_id, doc_id, n_terms_hit, score_micros, score): BM25 of every
    document against every query it shares at least one term with.

    `docs` needs (doc_id, text); `queries` needs (query_id, term) rows and
    is eval-sized (it broadcasts). Documents sharing no term score 0 and are
    simply absent — at 10^12 docs materializing zero rows would be the bug.
    """
    spark = docs.sparkSession
    base = docs.selectExpr("doc_id", "split(text, ' ') AS ws").selectExpr(
        "doc_id", "ws", "CAST(size(ws) AS BIGINT) AS dl"
    )
    # corpus stats: two scalar aggregates, broadcast everywhere below
    stats = base.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
    )
    terms = queries.select("term").distinct()
    hits = (
        base.select("doc_id", "dl", F.explode("ws").alias("term"))
        .join(F.broadcast(terms), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"), F.min("dl").alias("dl"))
        # materialize: hits feed BOTH the df aggregate and the scoring join —
        # without truncation Catalyst recomputes the whole explode+join
        # subtree (a second full corpus scan) for df. Hit rows are tiny
        # (docs x matched query terms), so this is metadata-sized.
        .localCheckpoint(eager=True)
    )
    dfreq = hits.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(queries), "term")
        .crossJoin(F.broadcast(stats))
        .selectExpr(
            "query_id", "doc_id", f"{bm25_contrib_text()} AS contrib_micros"
        )
    )
    return (
        scored.groupBy("query_id", "doc_id")
        .agg(
            F.count("*").cast("long").alias("n_terms_hit"),
            F.sum("contrib_micros").alias("score_micros"),
        )
        .selectExpr(
            "query_id", "doc_id", "n_terms_hit", "score_micros",
            f"CAST(score_micros AS DOUBLE) / {MICROS} AS score",
        )
    )


def oracle_bm25_sql(queries_values: str, table: str = "documents") -> str:
    """DuckDB mirror: `queries_values` is a VALUES list like
    "(0, 'join'), (0, 'scan')" defining (query_id, term)."""
    return f"""
WITH q(query_id, term) AS (VALUES {queries_values}),
base AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
         string_split(text, ' ') AS ws
  FROM {table}
),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(dl) AS BIGINT) AS total_dl FROM base),
hits AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf, MIN(dl) AS dl
  FROM (SELECT doc_id, dl, unnest(ws) AS term FROM base)
  WHERE term IN (SELECT DISTINCT term FROM q)
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
          FROM hits GROUP BY term),
scored AS (
  SELECT q.query_id, h.doc_id,
         {bm25_contrib_text(tf_c='h.tf', df_c='d.df', dl_c='h.dl')} AS contrib_micros
  FROM hits h JOIN dfreq d USING (term) JOIN q USING (term), stats
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
       CAST(SUM(contrib_micros) AS BIGINT) AS score_micros,
       CAST(SUM(contrib_micros) AS DOUBLE) / {MICROS} AS score
FROM scored GROUP BY query_id, doc_id
"""


def inverted_index(
    docs: DataFrame, min_df: int = 1, max_postings: int | None = None
) -> DataFrame:
    """(term, df, total_tf, postings): the classic search-engine inverted
    index as DataFrames — per term, its document frequency, total term
    count, and the sorted posting list of (doc_id) it appears in.

    Scale shape: explode -> two-level hash agg, both levels partial/final
    combined map-side; the only shuffles carry (term, doc_id, tf) hit rows
    and then per-term partials — text never shuffles. Posting arrays are
    sorted (collect_list order is partitioning-dependent; sort_array makes
    the output deterministic and mergeable). `max_postings` truncates hot
    terms to the doc_ids with highest tf (tie: lowest doc_id) — the
    impact-ordered-index device that bounds skewed posting rows at web
    scale; truncation is LOUD in the schema (df still counts every doc, so
    df > size(postings) marks a truncated row).
    """
    tf = (
        docs.selectExpr("doc_id", "explode(split(text, ' ')) AS term")
        .where(F.expr("length(term) > 0"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    if max_postings is not None:
        from pyspark.sql.window import Window

        # pinned: the truncation window AND the untruncated stats both
        # consume tf — without the pin each re-runs the explode + count
        # pass over the full text (SURVEY §8 rule #4); the pinned state
        # is (term, doc_id, tf) rows, text already dropped
        tf = tf.localCheckpoint(eager=True)
        w = Window.partitionBy("term").orderBy(
            F.col("tf").desc(), F.col("doc_id")
        )
        kept = tf.withColumn("_r", F.row_number().over(w)).where(
            F.col("_r") <= max_postings
        )
        stats = tf.groupBy("term").agg(
            F.count("*").cast("long").alias("df"),
            F.sum("tf").cast("long").alias("total_tf"),
        )
        idx = (
            kept.groupBy("term")
            .agg(F.sort_array(F.collect_list("doc_id")).alias("postings"))
            .join(stats, "term")
        )
    else:
        idx = tf.groupBy("term").agg(
            F.count("*").cast("long").alias("df"),
            F.sum("tf").cast("long").alias("total_tf"),
            F.sort_array(F.collect_list("doc_id")).alias("postings"),
        )
    return idx.where(F.col("df") >= min_df).select(
        "term", "df", "total_tf", "postings"
    )


def oracle_inverted_index_sql(table: str = "documents", min_df: int = 1) -> str:
    """DuckDB mirror of the untruncated index. Postings are emitted as the
    comma-joined STRING of the doc_id-ordered list (matching the driver
    projection of q_inverted_index): a list column is the one schema the
    driver's pandas canonicalizer cannot hash."""
    return f"""
WITH hits AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM {table}
  ) WHERE length(term) > 0 GROUP BY term, doc_id
)
SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
       CAST(SUM(tf) AS BIGINT) AS total_tf,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM hits GROUP BY term HAVING COUNT(*) >= {min_df}
"""


def rrf_fusion(
    arm_a: DataFrame, arm_b: DataFrame, k: int = 60, topn: int = 10
) -> DataFrame:
    """(query_id, doc_id, rrf_micros, n_arms, fused_rank): reciprocal-rank
    fusion of two retrieval arms — the standard score-free ranking combiner
    (hybrid lexical+semantic search ships this): each arm contributes
    floor(1e6 / (k + rank)) micros, documents missing from an arm simply
    contribute nothing, and the fused order is (rrf desc, doc_id).

    Exactness: ranks are integers, each contribution is ONE floor division,
    the fold is an integer sum — engine-exact, unlike score-space fusion
    which would mix differently-scaled floats. Shape: both arms arrive as
    (query_id, doc_id, rank) — bounded top-N per query — so the union +
    fold + per-query window all run over eval-sized frames; the corpus
    never re-enters."""
    u = arm_a.unionByName(arm_b)
    fused = (
        u.selectExpr(
            "query_id", "doc_id",
            f"CAST(1000000 DIV ({k} + rank) AS BIGINT) AS contrib",
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("contrib").cast("long").alias("rrf_micros"),
            F.count("*").cast("long").alias("n_arms"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_micros").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .where(F.col("fused_rank") <= topn)
        .selectExpr(
            "CAST(query_id AS BIGINT) AS query_id",
            "CAST(doc_id AS BIGINT) AS doc_id",
            "rrf_micros", "n_arms", "fused_rank",
        )
    )
