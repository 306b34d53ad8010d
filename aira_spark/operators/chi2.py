"""Chi-square independence census over a two-way contingency table —
"are these two categorical columns related" (Pearson 1900), the
first-reach dependence screen for any pair of dimension columns in the
lake (segment x priority, source x language, ...).

Exactness: every count is BIGINT; the per-cell deviation is the exact
cross-multiplication dev = O*N - R*C (never O - E in floats). The
per-cell chi-square contribution

    contrib_e6 = FLOOR(1e6 * dev^2 / (N * R * C))

is ONE shared IEEE chain per row (dev^2 needs doubles — it clears int64
at N ~ 3e4 — but each factor is cast separately from an exact BIGINT
and the op order is pinned, the bm25/mwu rule), and the table statistic
is the SUM of those integer micros — order-independent, so any
parallelism and DuckDB agree bit-for-bit. The grand total rides as the
fold row (row_cat = col_cat = '__all__') carrying chi2_e6, the degrees
of freedom and the reject flag against a compile-time critical literal
(the benford device — no chi-square CDF at query time).

Zero cells are NOT dropped: the dense row x col spine (cross join of
the two bounded margin censuses) keeps O = 0 cells, whose dev = -R*C
contribution is exactly what makes sparse-table chi2 honest.

Scale shape (100 TB): ONE map-side-combined hash agg to (row, col)
cells; margins and the spine are bounded by the category cardinalities
(broadcast-sized); everything after is projection + one fold agg."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CONTRIB = (
    "FLOOR(1000000.0 * CAST(dev AS DOUBLE) * CAST(dev AS DOUBLE) / "
    "(CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE)))"
)

# chi2 critical values at alpha = 0.05, floor e6, df = 1..30 (scipy
# chi2.ppf(0.95, df) — compile-time literals, no CDF at query time)
CRIT_E6 = {
    1: 3841458, 2: 5991464, 3: 7814727, 4: 9487729, 6: 12591587,
    8: 15507313, 9: 16918977, 12: 21026069, 16: 26296227, 20: 31410432,
    25: 37652484, 30: 43772971,
}


def chi2_census(pairs: DataFrame, df_crit: int) -> DataFrame:
    """(row_cat, col_cat, o, r, c, dev, contrib_e6) per dense cell plus
    the '__all__' fold row (o = N, dev = 0, contrib_e6 = chi2_e6 total,
    r = df, c = reject05) from pairs carrying (row_cat, col_cat)."""
    if df_crit not in CRIT_E6:
        raise ValueError(f"no critical literal for df={df_crit}; "
                         f"available: {sorted(CRIT_E6)}")
    cells = pairs.groupBy("row_cat", "col_cat").agg(
        F.count("*").cast("long").alias("o")
    )
    rows = cells.groupBy("row_cat").agg(F.sum("o").cast("long").alias("r"))
    colsm = cells.groupBy("col_cat").agg(F.sum("o").cast("long").alias("c"))
    n = cells.agg(F.sum("o").cast("long").alias("n"))
    spine = (
        rows.crossJoin(F.broadcast(colsm))
        .crossJoin(F.broadcast(n))
        .join(cells, ["row_cat", "col_cat"], "left")
        .selectExpr(
            "row_cat", "col_cat",
            "CAST(coalesce(o, 0) AS BIGINT) AS o", "r", "c", "n",
        )
        .selectExpr(
            "row_cat", "col_cat", "o", "r", "c", "n",
            "CAST(o * n - r * c AS BIGINT) AS dev",
        )
        .selectExpr(
            "row_cat", "col_cat", "o", "r", "c", "dev",
            f"CAST({_CONTRIB} AS BIGINT) AS contrib_e6",
        )
    )
    fold = spine.agg(
        F.expr("CAST(SUM(contrib_e6) AS BIGINT)").alias("chi2_e6"),
        F.expr("CAST(SUM(o) AS BIGINT)").alias("n"),
    ).selectExpr(
        "'__all__' AS row_cat", "'__all__' AS col_cat", "n AS o",
        f"CAST({df_crit} AS BIGINT) AS r",
        f"CAST(chi2_e6 > {CRIT_E6[df_crit]} AS BIGINT) AS c",
        "CAST(0 AS BIGINT) AS dev",
        "chi2_e6 AS contrib_e6",
    )
    return spine.unionByName(fold)


def oracle_chi2_sql(pairs_sql: str, df_crit: int) -> str:
    """DuckDB mirror over a subquery yielding (row_cat, col_cat)."""
    return f"""
WITH p AS ({pairs_sql}),
cells AS (
  SELECT row_cat, col_cat, CAST(COUNT(*) AS BIGINT) AS o
  FROM p GROUP BY 1, 2
),
rws AS (SELECT row_cat, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
cls AS (SELECT col_cat, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
spine AS (
  SELECT rws.row_cat, cls.col_cat,
    CAST(COALESCE(cells.o, 0) AS BIGINT) AS o, rws.r, cls.c, tot.n
  FROM rws CROSS JOIN cls CROSS JOIN tot
  LEFT JOIN cells ON cells.row_cat = rws.row_cat
                 AND cells.col_cat = cls.col_cat
),
base AS (
  SELECT row_cat, col_cat, o, r, c,
    CAST(o * n - r * c AS BIGINT) AS dev, n
  FROM spine
),
out AS (
  SELECT row_cat, col_cat, o, r, c, dev,
    CAST({_CONTRIB} AS BIGINT) AS contrib_e6
  FROM base
)
SELECT * FROM out
UNION ALL
SELECT '__all__', '__all__', CAST(SUM(o) AS BIGINT),
  CAST({df_crit} AS BIGINT),
  CAST(SUM(contrib_e6) > {CRIT_E6[df_crit]} AS BIGINT),
  CAST(0 AS BIGINT), CAST(SUM(contrib_e6) AS BIGINT)
FROM out
"""
