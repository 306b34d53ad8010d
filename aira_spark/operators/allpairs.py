"""All-pairs set-cosine similarity join with LOSSLESS prefix filtering —
the Bayardo/PPJoin device (WWW'07) that makes threshold similarity joins
feasible without an O(n²) pair scan: each document only indexes the
short, rare-term PREFIX of its term set, and any pair at or above the
threshold provably shares a prefix term.

Semantics (binary/set cosine, exact integers): for distinct-term sets
A, B with sizes na, nb and overlap t = |A ∩ B|,

    cos(A, B) = t / sqrt(na * nb) >= τ
      <=>  t² * τ_den² >= τ_num² * na * nb          (integer both sides)
      <=>  floor(t² * 1e6 / (na * nb)) >= τ²_e6     (shipped as cos2_e6)

Prefix lemma (the PPJoin position argument): order terms by the GLOBAL
total order (df ASC, term ASC). If |A ∩ B| >= α, the prefixes of length
|A| - α + 1 and |B| - α + 1 must intersect — otherwise the smallest
common term sits after one of the prefixes, leaving at most α - 1 slots
for the α common terms. For cosine, any qualifying pair has
t >= τ·sqrt(na·nb) >= τ²·max(na, nb), so α = ⌈τ²·|X|⌉ is a valid
per-document bound and prefix p_X = |X| - ⌈τ²·|X|⌉ + 1 is lossless.
τ = 19/20 keeps the ceiling integer: ⌈361n/400⌉ = (361n + 399) DIV 400.

Scale shape: the candidate join runs on PREFIX rows only, keyed by term
— and the df-ascending order means prefixes hold each document's RAREST
terms, so per-term fan-out is bounded exactly where a naive term join
explodes on stopwords. Verification joins ride the candidate ids; text
never shuffles, only (doc, term) / id-pair rows. The df-rank is a
per-document window (doc-keyed), not a global sort — the total order is
compared, never materialized as a contiguous global rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TAU_NUM, TAU_DEN = 19, 20  # τ = 0.95; τ²·e6 = 902500
TAU2_E6 = (TAU_NUM * TAU_NUM * 1_000_000) // (TAU_DEN * TAU_DEN)


def _ceil_tau2(n: str) -> str:
    # ⌈τ²·n⌉ with τ² = TAU_NUM²/TAU_DEN², pure integers
    return f"(({TAU_NUM * TAU_NUM} * {n} + {TAU_DEN * TAU_DEN - 1})" \
           f" DIV {TAU_DEN * TAU_DEN})"


def allpairs_cosine(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b, overlap, na, nb, cos2_e6) for every pair with set
    cosine >= τ; doc_a < doc_b. `docs` needs (doc_id, text)."""
    toks = (
        docs.selectExpr("doc_id", "explode(split(text, ' ')) AS term")
        .distinct()
        .localCheckpoint(eager=True)  # reused: df, sizes, prefix, 2 verify arms
    )
    size = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("n"))
    dfreq = toks.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    pos = (
        toks.join(dfreq, "term")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "term")
            ),
        )
        .join(size, "doc_id")
    )
    prefix = (
        pos.where(F.expr(f"pos <= n - {_ceil_tau2('n')} + 1"))
        .select("doc_id", "term", "n")
        # pinned: both sides of the candidate self-join below — without
        # the pin each side re-runs the dfreq join + global-order window
        # (SURVEY §8 rule #4); the pinned state is the bounded prefix
        .localCheckpoint(eager=True)
    )
    n2, d2 = TAU_NUM * TAU_NUM, TAU_DEN * TAU_DEN
    cand = (
        prefix.selectExpr("doc_id AS doc_a", "term", "n AS la")
        .join(
            prefix.selectExpr("doc_id AS doc_b", "term", "n AS lb"), "term"
        )
        # PPJoin length filter: cos >= τ forces τ²·max(na,nb) <= min(na,nb)
        # — prunes size-mismatched pairs before they cost a verification
        .where(f"doc_a < doc_b AND {d2} * la >= {n2} * lb"
               f" AND {d2} * lb >= {n2} * la")
        .select("doc_a", "doc_b")
        .distinct()
    )
    overlap = (
        cand.join(toks.selectExpr("doc_id AS doc_a", "term"), "doc_a")
        .join(toks.selectExpr("doc_id AS doc_b", "term"), ["doc_b", "term"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("overlap"))
    )
    return (
        overlap.join(size.selectExpr("doc_id AS doc_a", "n AS na"), "doc_a")
        .join(size.selectExpr("doc_id AS doc_b", "n AS nb"), "doc_b")
        .selectExpr(
            "CAST(doc_a AS BIGINT) AS doc_a",
            "CAST(doc_b AS BIGINT) AS doc_b",
            "overlap",
            "CAST(na AS BIGINT) AS na",
            "CAST(nb AS BIGINT) AS nb",
            "(overlap * overlap * 1000000) DIV (na * nb) AS cos2_e6",
        )
        .where(F.col("cos2_e6") >= TAU2_E6)
    )


def oracle_allpairs_sql(docs_cte: str) -> str:
    """DuckDB mirror: the direct all-pairs formulation — full term join
    over every pair, no prefix trick (independent of the lemma)."""
    return f"""
WITH {docs_cte},
toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term FROM docs
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1),
ov AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS overlap
  FROM toks a JOIN toks b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT CAST(o.doc_a AS BIGINT) AS doc_a, CAST(o.doc_b AS BIGINT) AS doc_b,
  CAST(o.overlap AS BIGINT) AS overlap,
  CAST(sa.n AS BIGINT) AS na, CAST(sb.n AS BIGINT) AS nb,
  CAST((o.overlap * o.overlap * 1000000) // (sa.n * sb.n) AS BIGINT)
    AS cos2_e6
FROM ov o JOIN sz sa ON sa.doc_id = o.doc_a JOIN sz sb ON sb.doc_id = o.doc_b
WHERE (o.overlap * o.overlap * 1000000) // (sa.n * sb.n) >= {TAU2_E6}
"""
