"""Corpus curation: deterministic stratified sampling + split assignment.

Training-data mixing needs per-source sampling rates ("keep 3% of crawl,
100% of books") and a train/val/test split that is REPRODUCIBLE — the same
doc lands in the same split on every run, every engine, every cluster size.
Spark's sampleBy/randomSplit are seeded per-partition, so their output
changes with partitioning; this operator instead derives two INDEPENDENT
uniform integers per document from content-free hashes of the doc id
(h64 with distinct domain tags, mod 1e6) and makes both the keep decision
and the split assignment pure integer comparisons against per-million
quotas.

Scale shape: a projection + filter — ZERO shuffles, no RNG state, no
driver involvement; the sample rate predicate sits directly above the scan
(and the h64 inputs are just doc_id, so column pruning keeps the scan
narrow until the filter passes). The DuckDB oracle evaluates the identical
formula text, so sampling is verifiable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textfns as tf

ENG = "spark"
PPM = 1_000_000


def _u_ppm(tag: str, engine: str) -> str:
    """Uniform integer in [0, 1e6) from a domain-tagged hash of doc_id —
    distinct tags give independent uniforms (the sample and split decisions
    must not correlate: u < r AND split by the SAME u would put every
    sampled doc in train)."""
    h = tf.h64(f"'{tag}|' || CAST(doc_id AS {'STRING' if engine == 'spark' else 'VARCHAR'})", engine)
    if engine == "spark":
        return f"pmod({h}, {PPM})"
    return f"({h} % {PPM})"


def sample_ppm_case(rates_ppm: dict[str, int], default_ppm: int, engine: str) -> str:
    """CASE expression mapping source -> keep quota in parts-per-million
    (exact integers — no float rates anywhere)."""
    arms = " ".join(
        f"WHEN '{s}' THEN {int(r)}" for s, r in sorted(rates_ppm.items())
    )
    return f"(CASE source {arms} ELSE {int(default_ppm)} END)"


def stratified_sample(
    docs: DataFrame,
    rates_ppm: dict[str, int],
    default_ppm: int = 0,
    train_ppm: int = 980_000,
    val_ppm: int = 10_000,
    salt: str = "v1",
) -> DataFrame:
    """(doc_id, source, u_sample, split): documents kept by per-source
    quotas, each assigned train/val/test deterministically.

    - keep iff u_sample < quota(source); quotas are integer ppm, so a
      source's expected keep fraction is exact and engine-independent.
    - split: an independent uniform u_split partitioned by [0, train_ppm),
      [train_ppm, train_ppm + val_ppm), rest -> 'train' | 'val' | 'test'.
    - `salt` versions the whole assignment: bumping it resamples every
      stratum reproducibly (the knob a curation pipeline actually wants).
    """
    usamp = _u_ppm(f"samp:{salt}", ENG)
    usplit = _u_ppm(f"split:{salt}", ENG)
    quota = sample_ppm_case(rates_ppm, default_ppm, ENG)
    return (
        docs.selectExpr(
            "doc_id",
            "source",
            f"CAST({usamp} AS BIGINT) AS u_sample",
            f"CAST({usplit} AS BIGINT) AS u_split",
            f"CAST({quota} AS BIGINT) AS quota_ppm",
        )
        .filter(F.col("u_sample") < F.col("quota_ppm"))
        .selectExpr(
            "doc_id",
            "source",
            "u_sample",
            f"CASE WHEN u_split < {int(train_ppm)} THEN 'train' "
            f"WHEN u_split < {int(train_ppm) + int(val_ppm)} THEN 'val' "
            "ELSE 'test' END AS split",
        )
    )


def oracle_stratified_sample_sql(
    rates_ppm: dict[str, int],
    default_ppm: int = 0,
    train_ppm: int = 980_000,
    val_ppm: int = 10_000,
    salt: str = "v1",
    table: str = "documents",
) -> str:
    """DuckDB mirror of stratified_sample — identical formula text."""
    usamp = _u_ppm(f"samp:{salt}", "duckdb")
    usplit = _u_ppm(f"split:{salt}", "duckdb")
    quota = sample_ppm_case(rates_ppm, default_ppm, "duckdb")
    return f"""
WITH t AS (
  SELECT doc_id, source,
         CAST({usamp} AS BIGINT) AS u_sample,
         CAST({usplit} AS BIGINT) AS u_split,
         CAST({quota} AS BIGINT) AS quota_ppm
  FROM {table}
)
SELECT doc_id, source, u_sample,
       CASE WHEN u_split < {int(train_ppm)} THEN 'train'
            WHEN u_split < {int(train_ppm) + int(val_ppm)} THEN 'val'
            ELSE 'test' END AS split
FROM t WHERE u_sample < quota_ppm
"""


def source_quota(
    docs: DataFrame, cap: int = 25, n_salt: int = 8
) -> DataFrame:
    """(doc_id, source, rk, n_chars): at most `cap` docs kept per source,
    preferring longer docs (n_chars DESC, doc_id ASC — a total order).

    Per-domain caps are the standard web-corpus curation step (a handful
    of boilerplate-heavy domains otherwise dominate the token budget).

    Scale shape — skew-proof two-phase top-k: a naive row_number over
    `source` puts every row of a hot domain into ONE task's sort. Phase 1
    ranks within (source, salt) where salt = pmod(hash(doc_id), n_salt)
    and keeps rk <= cap, shrinking each source to <= n_salt*cap candidate
    rows regardless of domain size (any global top-cap member is top-cap
    within its salt slice, so no survivor is lost). Phase 2 re-ranks the
    bounded candidates per source and keeps the true top `cap`. Results
    are identical to the single-phase window, which is what the oracle
    runs."""
    from pyspark.sql import Window

    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    order = [F.col("n_chars").desc(), F.col("doc_id").asc()]
    w1 = Window.partitionBy(
        "source", F.pmod(F.xxhash64("doc_id"), F.lit(n_salt))
    ).orderBy(*order)
    cand = (
        base.withColumn("srk", F.row_number().over(w1))
        .where(F.col("srk") <= cap)
        .drop("srk")
    )
    w2 = Window.partitionBy("source").orderBy(*order)
    return (
        cand.withColumn("rk", F.row_number().over(w2).cast("long"))
        .where(F.col("rk") <= cap)
        .select("doc_id", "source", "rk", "n_chars")
    )


def oracle_source_quota_sql(table: str = "documents", cap: int = 25) -> str:
    """DuckDB mirror: the plain single-phase ROW_NUMBER — independent of
    the salted two-phase rewrite, so a lost-survivor bug cannot cancel."""
    return f"""
WITH r AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
         CAST(n_chars AS BIGINT) AS n_chars,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
         ) AS BIGINT) AS rk
  FROM {table}
)
SELECT doc_id, source, rk, n_chars FROM r WHERE rk <= {int(cap)}
"""
