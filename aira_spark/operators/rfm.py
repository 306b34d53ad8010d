"""RFM segmentation — recency / frequency / monetary customer scoring, the
CRM analytics staple: each customer gets a tertile score per metric and a
composite segment code (111..333, 3 = best).

Exactness: recency = integer days from the last order to a FIXED anchor
date (never now()); frequency = order count; monetary = total cents.
Tertile boundaries come from the exact-quantile rank rule (smallest value
whose cumulative count reaches ceil(q·n)), broadcast back, and scores use
the 1 + #bounds-strictly-below assignment (quality_deciles' tie-stable
rule) — recency inverted so LOWER days-since ⇒ HIGHER score.

Shape: one per-customer agg over orders, two bounded boundary scans (the
quantiles device), one broadcast of 3x2 boundary literals folded as a
projection. Exchanges carry (customer, 3 integers)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ANCHOR = "DATE '2001-09-01'"  # fixed, just past the synthetic order range
_QS = ((1, 3), (2, 3))


def _bounds(vals: DataFrame) -> list[int]:
    """Exact tertile boundaries of column v (BIGINT), ascending."""
    from .quantiles import exact_quantiles

    rows = exact_quantiles(vals, qs=_QS).collect()
    return [
        int(r["value"]) for r in sorted(rows, key=lambda r: r["q_num"])
    ]


def rfm_segments(orders: DataFrame) -> DataFrame:
    """(cust_id, rec_days, freq, cents, r_score, f_score, m_score, segment)
    from orders carrying (o_custkey, o_orderdate, o_totalprice)."""
    per = orders.groupBy(F.col("o_custkey").alias("cust_id")).agg(
        F.expr(f"CAST(datediff({ANCHOR}, MAX(o_orderdate)) AS BIGINT)").alias(
            "rec_days"
        ),
        F.count("*").cast("long").alias("freq"),
        F.sum(F.expr("CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)"))
        .cast("long").alias("cents"),
    ).persist()
    rb = _bounds(per.selectExpr("rec_days AS v"))
    fb = _bounds(per.selectExpr("freq AS v"))
    mb = _bounds(per.selectExpr("cents AS v"))

    def score(col: str, bounds: list[int], invert: bool) -> str:
        ups = " + ".join(f"(CASE WHEN {col} > {b} THEN 1 ELSE 0 END)" for b in bounds)
        raw = f"(1 + {ups})"
        return f"CAST({f'(4 - {raw})' if invert else raw} AS BIGINT)"

    return per.selectExpr(
        "CAST(cust_id AS BIGINT) AS cust_id", "rec_days", "freq", "cents",
        f"{score('rec_days', rb, True)} AS r_score",
        f"{score('freq', fb, False)} AS f_score",
        f"{score('cents', mb, False)} AS m_score",
    ).selectExpr(
        "*",
        "CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS segment",
    )


def oracle_rfm_sql(table: str = "orders") -> str:
    """DuckDB mirror: per-metric boundaries via the cumulative rank rule
    (independent of the two-phase Spark selection), same scoring text."""
    def bcte(metric: str, name: str) -> str:
        return f"""
{name}_vc AS (SELECT {metric} AS v, COUNT(*) AS cnt FROM per GROUP BY 1),
{name}_cum AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum FROM {name}_vc),
{name}_b AS (
  SELECT q.i, MIN(c.v) AS bound
  FROM (VALUES (1), (2)) AS q(i), nn, {name}_cum c
  WHERE c.cum * 3 >= nn.n * q.i GROUP BY q.i
)"""

    def score(col: str, name: str, invert: bool) -> str:
        raw = (
            f"(1 + (SELECT COUNT(*) FROM {name}_b b WHERE p.{col} > b.bound))"
        )
        return f"CAST({f'(4 - {raw})' if invert else raw} AS BIGINT)"

    return f"""
WITH per AS (
  SELECT o_custkey AS cust_id,
    CAST({ANCHOR} - CAST(MAX(o_orderdate) AS DATE) AS BIGINT) AS rec_days,
    CAST(COUNT(*) AS BIGINT) AS freq,
    CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS cents
  FROM {table} GROUP BY 1
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM per),
{bcte('rec_days', 'r')},
{bcte('freq', 'f')},
{bcte('cents', 'm')}
SELECT CAST(p.cust_id AS BIGINT) AS cust_id, p.rec_days, p.freq, p.cents,
  {score('rec_days', 'r', True)} AS r_score,
  {score('freq', 'f', False)} AS f_score,
  {score('cents', 'm', False)} AS m_score,
  CAST({score('rec_days', 'r', True)} * 100
     + {score('freq', 'f', False)} * 10
     + {score('cents', 'm', False)} AS BIGINT) AS segment
FROM per p
"""
