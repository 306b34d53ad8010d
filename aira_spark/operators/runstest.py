"""Wald-Wolfowitz runs test per cell (Wald & Wolfowitz 1940) — the
classic "is this sequence random" probe over the daily roll-up: dichotomize
each day against the cell's MEDIAN, count runs of consecutive same-side
days, and flag cells whose run count is significantly FEW (trending /
sticky — the cusum/mann_kendall family's nonparametric cousin) or MANY
(oscillating faster than chance). Days equal to the median drop, the
textbook convention.

Exactness: the median enters as the exact doubled order statistic med_x2
(the mad_outliers/focal_median device — no .5 floats; the side predicate
is 2y <> med_x2 on integers). With n1 above / n2 below / N = n1+n2 and R
runs, E[R] = 1 + 2*n1*n2/N cross-multiplies to the exact BIGINT
deviation numerator num = N*R - N - 2*n1*n2 (R - E[R] = num/N), and
Var[R] = 2*n1*n2*(2*n1*n2-N) / (N^2*(N-1)) makes the 95% two-tailed
significance test

    T95_DEN * num^2 * (N-1)  >  T95_NUM * 2*n1*n2*(2*n1*n2 - N)

— the Gi* cross-multiplied square compare, evaluated in 128-bit exact
integers (Spark DECIMAL(38,0) / DuckDB HUGEINT; num^2*(N-1) <= N^5, nine
orders inside 1e38 at N = calendar scale). No sqrt, no libm, no doubles
anywhere near the checked output.

Scale shape (100 TB): daily roll-up folds map-side; ONE cell-keyed
order-statistics agg for the median (state bounded by the CALENDAR, the
focal_median argument); side flags re-join id-only; the run count is ONE
lag window per cell ordered by day (state again calendar-bounded) + one
final hash agg. No window over raw events, no Python."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .autocorr import GI_T95_DEN, GI_T95_NUM
from .robust import _order_stats

# classification from exact integer pieces; {x} supplies the 128-bit
# widening cast per engine (the gi_hotspots device)
def _runs_class_case(cast: str) -> str:
    w = cast.format
    lhs = f"{GI_T95_DEN} * {w(x='num')} * {w(x='num')} * {w(x='(nn - 1)')}"
    v = "(2 * n_above * n_below) * (2 * n_above * n_below - nn)"
    rhs = f"{GI_T95_NUM} * {w(x=v)}"
    return (
        f"CASE WHEN n_above = 0 OR n_below = 0 OR nn < 2 THEN 'ns' "
        f"WHEN num < 0 AND {lhs} > {rhs} THEN 'few' "
        f"WHEN num > 0 AND {lhs} > {rhs} THEN 'many' "
        f"ELSE 'ns' END"
    )


def runs_test(events: DataFrame) -> DataFrame:
    """(cell, n_above, n_below, n_runs, num, runs_class) per cell from
    `events` carrying (cell, day, cents); num = N*R - N - 2*n1*n2, the
    exact R - E[R] numerator scaled by N."""
    daily = events.groupBy("cell", "day").agg(
        F.sum("cents").cast("long").alias("y")
    )
    med = _order_stats(daily, "cell", "y", "med_x2").select("cell", "med_x2")
    signed = (
        daily.join(med, "cell")
        .where("2 * y != med_x2")
        .selectExpr(
            "cell", "day", "CAST(2 * y > med_x2 AS INT) AS side"
        )
    )
    runs = signed.selectExpr(
        "cell", "side",
        "CASE WHEN lag(side) OVER (PARTITION BY cell ORDER BY day)"
        " IS DISTINCT FROM side THEN 1 ELSE 0 END AS chg",
    ).groupBy("cell").agg(
        F.sum("side").cast("long").alias("n_above"),
        F.sum(F.expr("1 - side")).cast("long").alias("n_below"),
        F.sum("chg").cast("long").alias("n_runs"),
    )
    case = _runs_class_case("CAST({x} AS DECIMAL(38,0))")
    return (
        runs.selectExpr(
            "cell", "n_above", "n_below", "n_runs",
            "n_above + n_below AS nn",
            "CAST((n_above + n_below) * n_runs - (n_above + n_below)"
            " - 2 * n_above * n_below AS BIGINT) AS num",
        )
        .selectExpr(
            "CAST(cell AS BIGINT) AS cell",
            "n_above", "n_below", "n_runs", "num",
            f"{case} AS runs_class",
        )
    )


def oracle_runs_sql(events_sql: str) -> str:
    """DuckDB mirror over a subquery yielding (cell, day, cents):
    ROW_NUMBER order-statistic median, identical lag run count and
    HUGEINT cross-multiplied classification."""
    case = _runs_class_case("CAST({x} AS HUGEINT)")
    return f"""
WITH ev AS ({events_sql}),
daily AS (
  SELECT cell, day, CAST(SUM(cents) AS BIGINT) AS y FROM ev GROUP BY 1, 2
),
ry AS (
  SELECT cell, y,
    ROW_NUMBER() OVER (PARTITION BY cell ORDER BY y) AS rn,
    COUNT(*) OVER (PARTITION BY cell) AS n
  FROM daily
),
med AS (
  SELECT cell,
    CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN y ELSE 0 END)
       + SUM(CASE WHEN rn = n // 2 + 1 THEN y ELSE 0 END) AS BIGINT)
      AS med_x2
  FROM ry GROUP BY 1
),
signed AS (
  SELECT d.cell, d.day,
    CAST(2 * d.y > m.med_x2 AS INT) AS side
  FROM daily d JOIN med m ON m.cell = d.cell
  WHERE 2 * d.y != m.med_x2
),
chg AS (
  SELECT cell, side,
    CASE WHEN LAG(side) OVER (PARTITION BY cell ORDER BY day)
         IS DISTINCT FROM side THEN 1 ELSE 0 END AS chg
  FROM signed
),
runs AS (
  SELECT cell,
    CAST(SUM(side) AS BIGINT) AS n_above,
    CAST(SUM(1 - side) AS BIGINT) AS n_below,
    CAST(SUM(chg) AS BIGINT) AS n_runs
  FROM chg GROUP BY 1
),
base AS (
  SELECT cell, n_above, n_below, n_runs,
    n_above + n_below AS nn,
    CAST((n_above + n_below) * n_runs - (n_above + n_below)
         - 2 * n_above * n_below AS BIGINT) AS num
  FROM runs
)
SELECT CAST(cell AS BIGINT) AS cell, n_above, n_below, n_runs, num,
  {case} AS runs_class
FROM base"""
