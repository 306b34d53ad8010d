"""Lag-k cross-correlation function (CCF) between entity pairs — "does
series A lead series B by k days" (Box & Jenkins 1970's ccf), the
lead-lag screen behind alerting ('errors spike 2 days after deploys')
and causal-ordering triage, over daily roll-ups per entity (here event
types; `acf.py` is the self-pair special case of this operator).

For every ORDERED pair (a, b), a != b, and lag k = 0..max_lag, the
sample Pearson r of (x_t from a, y_{t+k} from b) over days where both
exist: positive-lag r answers "a leads b".

Exactness: identical layering to acf — exact BIGINT sufficient stats,
checked `cov_n = n*Sxy - Sx*Sy`, floor-e6 r via the ONE shared IEEE
chain with variances cast DOUBLE before the product; degenerate
(n < 2 or a zero variance) ships 0. The overflow guard is acf's:
n_days * max|y| <= 3e9 or raise.

Scale shape (100 TB): per-entity daily roll-up folds map-side first
(entities x days rows); the pairing is ONE equi-join on day+lag after a
constant explode over (lag) and the pair fan-out is entities^2 —
bounded by the ENTITY vocabulary (event types, services, regions),
never by event volume; one hash agg on (a, b, lag) ends it."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .acf import _R


def ccf_pairs(events: DataFrame, max_lag: int = 3) -> DataFrame:
    """(grp_a, grp_b, lag, n_pairs, cov_n, r_e6) for ordered pairs
    (a != b), lags 0..max_lag, from events carrying (grp string, day,
    cents); only (a, b, lag) with >= 1 overlapping day emit."""
    daily = (
        events.groupBy("grp", "day")
        .agg(F.sum("cents").cast("long").alias("y"))
        .localCheckpoint(eager=True)
    )
    g = daily.groupBy("grp").agg(
        F.count("*").alias("nd"), F.max(F.abs("y")).alias("ym")
    ).agg(F.max(F.expr("nd * ym")).alias("bound")).first()
    if g["bound"] is not None and g["bound"] > 3_000_000_000:
        raise RuntimeError(
            f"ccf_pairs: n_days * max|y| = {g['bound']} > 3e9 — "
            "n*Sxy / Sx*Sy would overflow int64; rescale the value column"
        )
    a = daily.selectExpr(
        "grp AS grp_a", "y AS xv",
        f"explode(sequence(0, CAST({max_lag} AS BIGINT))) AS lag", "day",
    ).selectExpr("grp_a", "lag", "xv", "day + lag AS tday")
    b = daily.selectExpr("grp AS grp_b", "day AS tday", "y AS yv")
    return (
        a.join(b, "tday")
        .where("grp_a != grp_b")
        .groupBy("grp_a", "grp_b", "lag")
        .agg(
            F.count("*").alias("n"),
            F.sum("xv").alias("sx"),
            F.sum("yv").alias("sy"),
            F.expr("SUM(xv * xv)").alias("sxx"),
            F.expr("SUM(yv * yv)").alias("syy"),
            F.expr("SUM(xv * yv)").alias("sxy"),
        )
        .selectExpr(
            "grp_a", "grp_b", "CAST(lag AS BIGINT) AS lag",
            "CAST(n AS BIGINT) AS n_pairs",
            "CAST(n * sxy - sx * sy AS BIGINT) AS cov_n",
            "CAST(n * sxx - sx * sx AS BIGINT) AS var_xn",
            "CAST(n * syy - sy * sy AS BIGINT) AS var_yn",
        )
        .selectExpr(
            "grp_a", "grp_b", "lag", "n_pairs", "cov_n",
            f"CAST({_R} AS BIGINT) AS r_e6",
        )
    )


def oracle_ccf_sql(events_sql: str, max_lag: int = 3) -> str:
    """DuckDB mirror over a subquery yielding (grp, day, cents)."""
    return f"""
WITH ev AS ({events_sql}),
daily AS (
  SELECT grp, day, CAST(SUM(cents) AS BIGINT) AS y
  FROM ev GROUP BY 1, 2
),
lagged AS (
  SELECT d.grp AS grp_a, l.lag, d.y AS xv, d.day + l.lag AS tday
  FROM daily d, (SELECT CAST(r AS BIGINT) AS lag
                 FROM range(0, {max_lag} + 1) t(r)) l
),
st AS (
  SELECT a.grp_a, b.grp AS grp_b, a.lag,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(a.xv) AS BIGINT) AS sx, CAST(SUM(b.y) AS BIGINT) AS sy,
    CAST(SUM(a.xv * a.xv) AS BIGINT) AS sxx,
    CAST(SUM(b.y * b.y) AS BIGINT) AS syy,
    CAST(SUM(a.xv * b.y) AS BIGINT) AS sxy
  FROM lagged a JOIN daily b ON b.day = a.tday AND b.grp != a.grp_a
  GROUP BY 1, 2, 3
),
base AS (
  SELECT grp_a, grp_b, lag, n AS n_pairs,
    CAST(n * sxy - sx * sy AS BIGINT) AS cov_n,
    CAST(n * sxx - sx * sx AS BIGINT) AS var_xn,
    CAST(n * syy - sy * sy AS BIGINT) AS var_yn
  FROM st
)
SELECT grp_a, grp_b, lag, n_pairs, cov_n, CAST({_R} AS BIGINT) AS r_e6
FROM base
"""
