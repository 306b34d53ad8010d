"""Corpus vocabulary census: Zipf head, frequency-of-frequency spectrum,
and type/token totals — the profiling pass run before tokenizer training
(vocab sizing), dedup threshold tuning, and Heaps-law capacity planning.

Three reads from ONE term-count table:
  kind='top'  : the Zipf head — top-N terms with their rank (row_number
                over (freq DESC, term), fully deterministic);
  kind='fof'  : frequency-of-frequency histogram in power-of-two classes
                (how many terms occur 1x, 2-3x, 4-7x, ... — the input to
                Good-Turing smoothing and hapax analysis); the class is an
                exact integer CASE chain, not floor(log2()) (libm is
                engine-build-sensitive — the r3 driver lesson);
  kind='stat' : n_tokens / n_types totals (the two Heaps-law coordinates).

Scale shape: one explode + one (term -> count) aggregation with map-side
combine is the only corpus-sized work; text never shuffles (only terms and
counts do). The top-N window sorts the TERM table, not the corpus, and the
fof/stat rollups are metadata-sized. Emitted as a kind-tagged union frame
(the kmeans_summary convention) so one driver row checks all three."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_CLASS = 40  # 2^40 occurrences of one term — beyond any real corpus


def _class_case(col: str) -> str:
    whens = "\n    ".join(
        f"WHEN {col} < {1 << (c + 1)} THEN CAST({c} AS BIGINT)"
        for c in range(MAX_CLASS)
    )
    return f"CASE {whens} ELSE CAST({MAX_CLASS} AS BIGINT) END"


def vocab_census(docs: DataFrame, top_n: int = 30) -> DataFrame:
    """(kind, k, a, b) union frame — see module docstring. `docs` needs
    (text); tokens split on single spaces (the corpus convention)."""
    from pyspark.sql import Window

    counts = (
        docs.selectExpr("explode(split(text, ' ')) AS term")
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("term"))
    top = (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= top_n)
        .selectExpr("'top' AS kind", "term AS k", "rnk AS a", "freq AS b")
    )
    fof = (
        counts.selectExpr(f"{_class_case('freq')} AS cls", "freq")
        .groupBy("cls")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.sum("freq").cast("long").alias("sum_freq"),
        )
        .selectExpr(
            "'fof' AS kind", "CAST(cls AS STRING) AS k", "n_terms AS a",
            "sum_freq AS b",
        )
    )
    stat = counts.agg(
        F.sum("freq").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
    ).selectExpr(
        "stack(2, 'n_tokens', n_tokens, 'n_types', n_types) AS (k, a)"
    ).selectExpr("'stat' AS kind", "k", "a", "CAST(0 AS BIGINT) AS b")
    return top.unionByName(fof).unionByName(stat)


def oracle_vocab_sql(table: str = "documents", top_n: int = 30) -> str:
    cls = _class_case("freq")
    return f"""
WITH counts AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM {table})
  GROUP BY term
),
top AS (
  SELECT 'top' AS kind, term AS k, CAST(rnk AS BIGINT) AS a, freq AS b
  FROM (SELECT term, freq,
          row_number() OVER (ORDER BY freq DESC, term) AS rnk
        FROM counts)
  WHERE rnk <= {top_n}
),
fof AS (
  SELECT 'fof' AS kind, CAST(cls AS VARCHAR) AS k,
    CAST(COUNT(*) AS BIGINT) AS a, CAST(SUM(freq) AS BIGINT) AS b
  FROM (SELECT {cls} AS cls, freq FROM counts) GROUP BY cls
),
stat AS (
  SELECT 'stat' AS kind, 'n_tokens' AS k,
    CAST(SUM(freq) AS BIGINT) AS a, CAST(0 AS BIGINT) AS b FROM counts
  UNION ALL
  SELECT 'stat', 'n_types', CAST(COUNT(*) AS BIGINT), CAST(0 AS BIGINT)
  FROM counts
)
SELECT * FROM top UNION ALL SELECT * FROM fof UNION ALL SELECT * FROM stat"""
