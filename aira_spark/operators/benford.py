"""Benford first-significant-digit census per group — the classic
fabricated-/degenerate-data QA screen (Benford 1938; Nigrini 1996 for
the audit use): natural multi-scale magnitudes follow
P(d) = log10(1 + 1/d); synthetic, truncated, or capped values don't,
so per-group deviation from the law is a cheap data-quality flag for
any value column in the lake.

Exactness: the law's probabilities are the ONLY irrational inputs and
they are COMPILE-TIME constants — floor-e6 literals baked into both
engines' SQL (no libm at query time, the r3 driver-gate lesson). The
first digit comes from the value's decimal string (substr of the BIGINT
cast — identical text both engines, no log10). Per (grp, digit):
observed count, observed ppm = (1e6*n_d) DIV n, the literal expectation,
and the exact deviation dev = |1e6*n_d − n*benford_e6| (the emd_drift
cross-multiplication — never a float subtraction). All nine digits emit
per group (zero-filled via the digit-spine LEFT join) so absent digits
— the strongest fraud signal — stay visible.

Scale shape (100 TB): ONE map-side-combined hash agg to (grp, digit)
(81 rows per 9-group table ceiling), the 9-row digit spine cross-joins
the group census broadcast-small, and everything after is projection.
No window, no Python, nothing scales with rows except the first agg's
partials."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# floor(1e6 * log10(1 + 1/d)), d = 1..9 — compile-time literals
BENFORD_E6 = [301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152,
              45757]

_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN {d + 1} THEN {v}" for d, v in enumerate(BENFORD_E6)
) + " END"


def benford_census(values: DataFrame) -> DataFrame:
    """(grp, digit, n_d, ppm, benford_e6, dev) from values carrying
    (grp string, v bigint); rows with v <= 0 are ignored (no first
    significant digit)."""
    counts = (
        values.where("v > 0")
        .selectExpr("grp", "CAST(substr(CAST(v AS STRING), 1, 1) AS BIGINT)"
                    " AS digit")
        .groupBy("grp", "digit")
        .agg(F.count("*").cast("long").alias("n_d"))
    )
    totals = counts.groupBy("grp").agg(
        F.sum("n_d").cast("long").alias("n")
    )
    spine = totals.selectExpr(
        "grp", "n", "explode(sequence(1, 9)) AS digit"
    )
    return (
        spine.join(counts, ["grp", "digit"], "left")
        .selectExpr(
            "grp", "CAST(digit AS BIGINT) AS digit",
            "CAST(coalesce(n_d, 0) AS BIGINT) AS n_d", "n",
        )
        .selectExpr(
            "grp", "digit", "n_d",
            "CAST((1000000 * n_d) DIV n AS BIGINT) AS ppm",
            f"CAST({_BENFORD_CASE} AS BIGINT) AS benford_e6",
            f"CAST(abs(1000000 * n_d - n * ({_BENFORD_CASE})) AS BIGINT)"
            " AS dev",
        )
    )


def oracle_benford_sql(values_sql: str) -> str:
    """DuckDB mirror over a subquery yielding (grp, v)."""
    return f"""
WITH vals AS ({values_sql}),
counts AS (
  SELECT grp, CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit,
    CAST(COUNT(*) AS BIGINT) AS n_d
  FROM vals WHERE v > 0 GROUP BY 1, 2
),
totals AS (SELECT grp, CAST(SUM(n_d) AS BIGINT) AS n FROM counts GROUP BY 1),
spine AS (
  SELECT t.grp, t.n, CAST(g.d AS BIGINT) AS digit
  FROM totals t, (SELECT UNNEST(generate_series(1, 9)) AS d) g
),
base AS (
  SELECT s.grp, s.digit, CAST(COALESCE(c.n_d, 0) AS BIGINT) AS n_d, s.n
  FROM spine s LEFT JOIN counts c ON c.grp = s.grp AND c.digit = s.digit
)
SELECT grp, digit, n_d,
  CAST((1000000 * n_d) // n AS BIGINT) AS ppm,
  CAST({_BENFORD_CASE} AS BIGINT) AS benford_e6,
  CAST(abs(1000000 * n_d - n * ({_BENFORD_CASE})) AS BIGINT) AS dev
FROM base
"""
