"""Lag-k autocorrelation function (ACF) per grid cell — the classic
"does today predict k days out" seasonality/persistence probe (Box &
Jenkins 1970) over the same daily roll-up as `trend`/`theilsen`/
`mannkendall`, computed as the exact Pearson r of the (y_d, y_{d+k})
pairing at each lag k = 1..max_lag (the sample-pair form; days missing
on either side of a pair simply drop, so sparse cells stay honest).

Exactness: the sufficient statistics (n, Sx, Sy, Sxx, Syy, Sxy) are
exact BIGINTs; the checked projection carries the exact integer
`cov_n = n*Sxy - Sx*Sy` and the floor-e6 r computed through ONE shared
IEEE chain (`FLOOR(1e6*cov_n / SQRT(vx*vy))` with vx/vy exact integer
variance numerators cast to DOUBLE before the product — the
kendall/mann_kendall rule). Degenerate lags (either variance zero, or
fewer than 2 pairs) ship r = 0 with their exact integers still visible.

Overflow is GUARDED, not assumed: n*Sxy and Sx*Sy are bounded by
(n_days * max|y|)^2, so the operator collects the per-cell bound (one
tiny two-scalar agg — the emd_drift guard device) and raises loudly
when n_days * max|y| > 3e9 (sqrt of int64 range, with margin) telling
the caller to rescale cents -> whole units.

Scale shape (100 TB): daily roll-up folds the raw stream map-side to
cells x days rows; the lag pairing is ONE equi-join on (cell, day+lag)
after an explode over lags (fan-out = max_lag, a constant), so per-cell
cost is days * max_lag — calendar-bounded like theilsen, never
event-bounded; one hash agg on (cell, lag) ends it. No window, no
Python."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_R = (
    "CASE WHEN n_pairs >= 2 AND var_xn > 0 AND var_yn > 0 THEN "
    "FLOOR(1000000.0 * cov_n / "
    "SQRT(CAST(var_xn AS DOUBLE) * CAST(var_yn AS DOUBLE))) "
    "ELSE 0 END"
)


def acf_cells(events: DataFrame, max_lag: int = 3) -> DataFrame:
    """(cell, lag, n_pairs, cov_n, r_e6) for lags 1..max_lag from events
    carrying (cell, day, cents); only (cell, lag) with >= 1 pair emit."""
    daily = (
        events.groupBy("cell", "day")
        .agg(F.sum("cents").cast("long").alias("y"))
        .localCheckpoint(eager=True)  # reused by guard + both join sides
    )
    g = daily.groupBy("cell").agg(
        F.count("*").alias("nd"), F.max(F.abs("y")).alias("ym")
    ).agg(F.max(F.expr("nd * ym")).alias("bound")).first()
    if g["bound"] is not None and g["bound"] > 3_000_000_000:
        raise RuntimeError(
            f"acf_cells: n_days * max|y| = {g['bound']} > 3e9 — "
            "n*Sxy / Sx*Sy would overflow int64; rescale the value column "
            "(e.g. cents -> whole units) before calling"
        )
    a = daily.selectExpr(
        "cell", "y AS xv", "explode(sequence(1, CAST({L} AS BIGINT))) AS lag"
        .format(L=max_lag), "day"
    ).selectExpr("cell", "lag", "xv", "day + lag AS tday")
    b = daily.selectExpr("cell", "day AS tday", "y AS yv")
    return (
        a.join(b, ["cell", "tday"])
        .groupBy("cell", "lag")
        .agg(
            F.count("*").alias("n"),
            F.sum("xv").alias("sx"),
            F.sum("yv").alias("sy"),
            F.expr("SUM(xv * xv)").alias("sxx"),
            F.expr("SUM(yv * yv)").alias("syy"),
            F.expr("SUM(xv * yv)").alias("sxy"),
        )
        .selectExpr(
            "CAST(cell AS BIGINT) AS cell",
            "CAST(lag AS BIGINT) AS lag",
            "CAST(n AS BIGINT) AS n_pairs",
            "CAST(n * sxy - sx * sy AS BIGINT) AS cov_n",
            "CAST(n * sxx - sx * sx AS BIGINT) AS var_xn",
            "CAST(n * syy - sy * sy AS BIGINT) AS var_yn",
        )
        .selectExpr(
            "cell", "lag", "n_pairs", "cov_n",
            f"CAST({_R} AS BIGINT) AS r_e6",
        )
    )


def oracle_acf_sql(events_sql: str, max_lag: int = 3) -> str:
    """DuckDB mirror over a subquery yielding (cell, day, cents): identical
    roll-up, lag explode via range(), sufficient stats and shared r chain."""
    return f"""
WITH ev AS ({events_sql}),
daily AS (
  SELECT cell, day, CAST(SUM(cents) AS BIGINT) AS y
  FROM ev GROUP BY 1, 2
),
lagged AS (
  SELECT d.cell, l.lag, d.y AS xv, d.day + l.lag AS tday
  FROM daily d, (SELECT CAST(r AS BIGINT) AS lag
                 FROM range(1, {max_lag} + 1) t(r)) l
),
st AS (
  SELECT a.cell, a.lag,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(a.xv) AS BIGINT) AS sx, CAST(SUM(b.y) AS BIGINT) AS sy,
    CAST(SUM(a.xv * a.xv) AS BIGINT) AS sxx,
    CAST(SUM(b.y * b.y) AS BIGINT) AS syy,
    CAST(SUM(a.xv * b.y) AS BIGINT) AS sxy
  FROM lagged a JOIN daily b ON b.cell = a.cell AND b.day = a.tday
  GROUP BY 1, 2
),
base AS (
  SELECT CAST(cell AS BIGINT) AS cell, lag,
    n AS n_pairs,
    CAST(n * sxy - sx * sy AS BIGINT) AS cov_n,
    CAST(n * sxx - sx * sx AS BIGINT) AS var_xn,
    CAST(n * syy - sy * sy AS BIGINT) AS var_yn
  FROM st
)
SELECT cell, lag, n_pairs, cov_n, CAST({_R} AS BIGINT) AS r_e6 FROM base
"""
