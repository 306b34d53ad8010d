"""PII scrubbing census — the redaction pass every LLM training corpus
runs before anything else ships: find emails / phone numbers / IPv4
addresses, count them per document, and measure the masked text. The
patterns are deliberately restricted to the regex subset where Java
regex (Spark, JVM-side `regexp_extract_all`/`regexp_replace`) and RE2
(DuckDB) agree exactly: ASCII character classes, bounded repetition,
leftmost-greedy matching, no backreferences or lookaround.

The synthetic corpus carries no PII, so the query layer injects
deterministic markers from doc_id with ONE shared SQL expression (the
one-formula-two-engines device): every fifth doc gains an email, every
seventh a phone, every eleventh an IPv4 — and the operator is then
measured on text that also contains the ORGANIC document bytes, so an
accidental match in real text changes both engines identically.

Scale shape: pure JVM string expressions inside the scan stage (zero
Python, zero extra exchanges); masking composes three regexp_replace
calls in fixed order. Outputs are counts and the masked length —
all-integer, canon-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
IPV4_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

# shared augmentation formula (Spark SQL == DuckDB SQL): inject markers
PII_AUG_SQL = (
    "concat(text, CASE"
    " WHEN doc_id % 5 = 0 THEN concat(' reach me at user',"
    " CAST(doc_id AS STRING), '@example.com')"
    " WHEN doc_id % 7 = 0 THEN concat(' call 555-010-',"
    " lpad(CAST(doc_id % 10000 AS STRING), 4, '0'))"
    " WHEN doc_id % 11 = 0 THEN concat(' host 10.',"
    " CAST(doc_id % 256 AS STRING), '.0.', CAST(doc_id % 100 AS STRING))"
    " ELSE '' END)"
)


def pii_scrub(docs: DataFrame) -> DataFrame:
    """(doc_id, n_email, n_phone, n_ip, raw_len, masked_len) over a
    documents frame with (doc_id, text) — counts + post-redaction length."""
    aug = docs.selectExpr("doc_id", f"{PII_AUG_SQL} AS t")
    masked = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), EMAIL_RE, "<EMAIL>"),
            PHONE_RE,
            "<PHONE>",
        ),
        IPV4_RE,
        "<IP>",
    )
    return aug.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(F.regexp_extract_all("t", F.lit(EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_email"),
        F.size(F.regexp_extract_all("t", F.lit(PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phone"),
        F.size(F.regexp_extract_all("t", F.lit(IPV4_RE), F.lit(0)))
        .cast("long")
        .alias("n_ip"),
        F.length("t").cast("long").alias("raw_len"),
        F.length(masked).cast("long").alias("masked_len"),
    )


def oracle_pii_sql(docs_sql: str) -> str:
    """DuckDB mirror: same patterns, same replace order ('g' flag — DuckDB
    defaults to first-match-only where Spark replaces all)."""

    def q(p: str) -> str:
        return p.replace("'", "''")

    return f"""
WITH d AS ({docs_sql}),
aug AS (SELECT doc_id, {PII_AUG_SQL} AS t FROM d)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(len(regexp_extract_all(t, '{q(EMAIL_RE)}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(t, '{q(PHONE_RE)}')) AS BIGINT) AS n_phone,
  CAST(len(regexp_extract_all(t, '{q(IPV4_RE)}')) AS BIGINT) AS n_ip,
  CAST(length(t) AS BIGINT) AS raw_len,
  CAST(length(
    regexp_replace(
      regexp_replace(
        regexp_replace(t, '{q(EMAIL_RE)}', '<EMAIL>', 'g'),
        '{q(PHONE_RE)}', '<PHONE>', 'g'),
      '{q(IPV4_RE)}', '<IP>', 'g')) AS BIGINT) AS masked_len
FROM aug
"""
