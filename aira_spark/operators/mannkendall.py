"""Mann-Kendall trend test — the nonparametric monotone-trend detector
(Mann 1945; Kendall 1975) per grid cell over the daily roll-up, the
significance-test companion of `theilsen.sen_trends`' magnitude estimate
(the pairing every hydrology/climate handbook prescribes: Sen gives the
slope, MK says whether the trend is real):

    S     = sum_{i<j} sign(y_j - y_i)            (day-ordered)
    VarS  = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)] / 18   (tie-corrected)
    Z     = (S - 1)/sqrt(VarS)  if S > 0, 0 if S = 0, (S + 1)/sqrt(VarS)

Exactness: S and the tie term are exact BIGINTs — sign() never appears
(engines disagree on its return type); the comparison is a shared CASE
text. Variance ships UNdivided as `var18 = 18*VarS` (exact integer; the
/18 happens once inside the z chain). z is floor e6 through ONE shared
IEEE expression (`FLOOR(1e6*(S -+ 1)/SQRT(var18/18.0))`) evaluated with
identical op order in both engines — the kendall/bm25 rule.

Scale shape (100 TB): identical to theilsen — the daily roll-up folds the
raw event stream map-side to at most cells x days rows BEFORE any pair
forms, and the per-cell pair join is CALENDAR-bounded (366 days -> <=66k
pairs/cell), so no event-volume skew can make it quadratic; ties fold as
(cell, y) counts (another calendar-bounded agg). One shuffle to
(cell, day), one to cell; single-day cells stay visible through the LEFT
join from the always-present census with S = var18 = z = 0."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SIGN = "CASE WHEN y2 > y1 THEN 1 WHEN y2 < y1 THEN -1 ELSE 0 END"
# one shared z text; {s}/{v} substitute the exact-integer column names
_Z = (
    "CASE WHEN {v} > 0 AND {s} > 0 THEN "
    "FLOOR(1000000.0 * ({s} - 1) / SQRT(CAST({v} AS DOUBLE) / 18.0)) "
    "WHEN {v} > 0 AND {s} < 0 THEN "
    "FLOOR(1000000.0 * ({s} + 1) / SQRT(CAST({v} AS DOUBLE) / 18.0)) "
    "ELSE 0 END"
)


def mk_trends(events: DataFrame) -> DataFrame:
    """(cell, n_days, s_stat, var18, z_e6) from events carrying
    (cell, day, cents): Mann-Kendall S, 18x tie-corrected variance and
    floor-e6 Z over the per-cell daily sums."""
    daily = (
        events.groupBy("cell", "day")
        .agg(F.sum("cents").cast("long").alias("y"))
    )
    a = daily.select("cell", F.col("day").alias("d1"), F.col("y").alias("y1"))
    b = daily.select("cell", F.col("day").alias("d2"), F.col("y").alias("y2"))
    s = (
        a.join(b, "cell")
        .where("d1 < d2")
        .groupBy("cell")
        .agg(F.expr(f"CAST(SUM({_SIGN}) AS BIGINT)").alias("s_stat"))
    )
    ties = (
        daily.groupBy("cell", "y").agg(F.count("*").alias("t"))
        .groupBy("cell")
        .agg(
            F.expr(
                "CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT)"
            ).alias("tie18")
        )
    )
    census = daily.groupBy("cell").agg(
        F.count("*").cast("long").alias("n_days")
    )
    z = _Z.format(s="s_stat", v="var18")
    return (
        census.join(s, "cell", "left")
        .join(ties, "cell")
        .selectExpr(
            "CAST(cell AS BIGINT) AS cell",
            "n_days",
            "CAST(coalesce(s_stat, 0) AS BIGINT) AS s_stat",
            "CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie18"
            " AS BIGINT) AS var18",
        )
        .selectExpr(
            "cell", "n_days", "s_stat", "var18",
            f"CAST({z} AS BIGINT) AS z_e6",
        )
    )


def oracle_mk_sql(events_sql: str) -> str:
    """DuckDB mirror over a subquery yielding (cell, day, cents): identical
    daily roll-up, pair-join S, tie fold and the shared z chain."""
    sign = _SIGN.replace("y2", "b.y").replace("y1", "a.y")
    z = _Z.format(s="s_stat", v="var18")
    return f"""
WITH ev AS ({events_sql}),
daily AS (
  SELECT cell, day, CAST(SUM(cents) AS BIGINT) AS y
  FROM ev GROUP BY 1, 2
),
s AS (
  SELECT a.cell, CAST(SUM({sign}) AS BIGINT) AS s_stat
  FROM daily a JOIN daily b ON a.cell = b.cell AND a.day < b.day
  GROUP BY 1
),
ties AS (
  SELECT cell, CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
  FROM (SELECT cell, y, COUNT(*) AS t FROM daily GROUP BY 1, 2)
  GROUP BY 1
),
census AS (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily GROUP BY 1
),
base AS (
  SELECT CAST(c.cell AS BIGINT) AS cell, c.n_days,
    CAST(COALESCE(s.s_stat, 0) AS BIGINT) AS s_stat,
    CAST(c.n_days * (c.n_days - 1) * (2 * c.n_days + 5) - t.tie18
         AS BIGINT) AS var18
  FROM census c LEFT JOIN s ON c.cell = s.cell
  JOIN ties t ON c.cell = t.cell
)
SELECT cell, n_days, s_stat, var18, CAST({z} AS BIGINT) AS z_e6 FROM base
"""
