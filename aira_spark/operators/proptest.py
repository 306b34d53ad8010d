"""Two-proportion z-test census between segment pairs — the A/B
significance layer over conversion funnels (funnel/retention tell you
the rates; this says WHICH segment differences are real): for every
unordered segment pair with conversions c and sizes n,

    z^2 = (c1/n1 - c2/n2)^2 / [ p(1-p) (1/n1 + 1/n2) ],  p = (c1+c2)/N

cross-multiplies COMPLETELY (no p, no sqrt, no division anywhere):

    z^2 = (c1*n2 - c2*n1)^2 * N / (n1 * n2 * C * (N - C))

so the 95% two-tailed test is the exact 128-bit integer comparison

    T95_DEN * (c1*n2 - c2*n1)^2 * N  >  T95_NUM * n1*n2*C*(N-C)

with the Gi* literals 2401/625 (= 1.96^2) and DECIMAL(38,0)/HUGEINT
widening (budget: diff^2*N <= n^4*N — nine orders inside 1e38 at
n ~ 1e7 per segment). Degenerate pairs (C = 0 or C = N: pooled variance
zero) ship 'ns' honestly.

Scale shape (100 TB): conversions fold map-side to ONE row per segment
(however many users); the pair frame is the bounded broadcast
cross-join of that tiny census with itself (segments are a handful);
classification is a pure projection. Users never pair with users."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .autocorr import GI_T95_DEN, GI_T95_NUM


def _sig_case(cast: str) -> str:
    w = cast.format
    diff = "(c1 * n2 - c2 * n1)"
    lhs = (
        f"{GI_T95_DEN} * {w(x=diff)} * {w(x=diff)} * "
        f"{w(x='(n1 + n2)')}"
    )
    rhs = (
        f"{GI_T95_NUM} * {w(x='(n1 * n2)')} * "
        f"{w(x='((c1 + c2) * (n1 + n2 - c1 - c2))')}"
    )
    return (
        "CASE WHEN c1 + c2 = 0 OR c1 + c2 = n1 + n2 THEN 'ns' "
        f"WHEN c1 * n2 > c2 * n1 AND {lhs} > {rhs} THEN 'higher' "
        f"WHEN c1 * n2 < c2 * n1 AND {lhs} > {rhs} THEN 'lower' "
        "ELSE 'ns' END"
    )


def prop_test(users: DataFrame) -> DataFrame:
    """(seg_a, seg_b, n1, c1, n2, c2, diff_num, verdict) for every
    unordered segment pair from `users` carrying (segment string,
    converted int 0/1); verdict is seg_a's rate vs seg_b's
    ('higher'/'lower'/'ns'); diff_num = c1*n2 - c2*n1 (the exact
    rate-difference numerator scaled by n1*n2)."""
    seg = users.groupBy("segment").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("converted").cast("long").alias("c"),
    )
    pairs = (
        seg.selectExpr("segment AS seg_a", "n AS n1", "c AS c1")
        .crossJoin(
            F.broadcast(
                seg.selectExpr("segment AS seg_b", "n AS n2", "c AS c2")
            )
        )
        .where("seg_a < seg_b")
    )
    case = _sig_case("CAST({x} AS DECIMAL(38,0))")
    return pairs.selectExpr(
        "seg_a", "seg_b", "n1", "c1", "n2", "c2",
        "CAST(c1 * n2 - c2 * n1 AS BIGINT) AS diff_num",
        f"{case} AS verdict",
    )


def oracle_prop_test_sql(users_sql: str) -> str:
    """DuckDB mirror over a subquery yielding (segment, converted):
    identical pooled algebra with HUGEINT widening."""
    case = _sig_case("CAST({x} AS HUGEINT)")
    return f"""
WITH u AS ({users_sql}),
seg AS (
  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(converted) AS BIGINT) AS c
  FROM u GROUP BY 1
),
pairs AS (
  SELECT a.segment AS seg_a, b.segment AS seg_b,
    a.n AS n1, a.c AS c1, b.n AS n2, b.c AS c2
  FROM seg a JOIN seg b ON a.segment < b.segment
)
SELECT seg_a, seg_b, n1, c1, n2, c2,
  CAST(c1 * n2 - c2 * n1 AS BIGINT) AS diff_num,
  {case} AS verdict
FROM pairs"""
