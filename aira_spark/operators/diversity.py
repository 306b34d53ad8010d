"""Category-diversity censuses over the grid — two classic concentration
statistics that stay EXACT rational (no logs, unlike Shannon entropy):

* Simpson's diversity (Simpson 1949, "Measurement of diversity"): per
  cell, the probability two events drawn without replacement differ in
  type,

      D = 1 - sum_i n_i(n_i - 1) / (n(n - 1)),

  the ecology/land-use mixing index (0 = monoculture, ->1 = even mix).

* Gini concentration (Gini 1912; the Lorenz-curve form): per group, how
  unequally activity concentrates across its cells,

      G = sum_i (2i - n - 1) x_(i) / (n * sum x)   (x ascending, rank i),

  the standard "is the load skewed onto few cells" inequality measure —
  the statistic behind hot-spot capacity planning.

Exactness: both are ratios of exact BIGINTs and ship as floor fixed
point e6. Tie order cannot perturb Gini: within a tie block x is
constant, so the block contributes x * sum(2i) — fixed whatever the
intra-block permutation (ranks are made total by (x, cell) anyway).

Scale shape (100 TB): Simpson is two chained hash aggs — (cell, type)
counts fold the raw stream map-side, then one per-cell combine; nothing
wider than the category table ever shuffles. Gini ranks cells within a
group on ONE window partition whose size is the group's cell count
(grid-bounded, not event-bounded) after a map-combined roll-up."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def simpson_cells(events: DataFrame) -> DataFrame:
    """(cell, n_events, n_types, simpson_e6) from events carrying
    (cell, etype)."""
    tc = events.groupBy("cell", "etype").agg(
        F.count("*").cast("long").alias("c")
    )
    return (
        tc.groupBy("cell")
        .agg(
            F.sum("c").cast("long").alias("n_events"),
            F.count("*").cast("long").alias("n_types"),
            F.sum(F.expr("c * (c - 1)")).cast("long").alias("same"),
        )
        .selectExpr(
            "CAST(cell AS BIGINT) AS cell", "n_events", "n_types",
            "CAST(CASE WHEN n_events > 1 THEN 1000000 -"
            " (1000000 * same) DIV (n_events * (n_events - 1))"
            " ELSE 0 END AS BIGINT) AS simpson_e6",
        )
    )


def oracle_simpson_sql(events_sql: str) -> str:
    """DuckDB mirror over a subquery yielding (cell, etype)."""
    return f"""
WITH ev AS ({events_sql}),
tc AS (SELECT cell, etype, CAST(COUNT(*) AS BIGINT) AS c FROM ev GROUP BY 1, 2)
SELECT CAST(cell AS BIGINT) AS cell,
  CAST(SUM(c) AS BIGINT) AS n_events,
  CAST(COUNT(*) AS BIGINT) AS n_types,
  CAST(CASE WHEN SUM(c) > 1 THEN 1000000 -
       (1000000 * SUM(c * (c - 1))) // (SUM(c) * (SUM(c) - 1))
       ELSE 0 END AS BIGINT) AS simpson_e6
FROM tc GROUP BY 1
"""


def gini_cells(events: DataFrame) -> DataFrame:
    """(grp, n_cells, total, gini_e6) from events carrying
    (grp, cell, cents): inequality of per-cell totals within each group."""
    per = events.groupBy("grp", "cell").agg(
        F.sum("cents").cast("long").alias("x")
    )
    w = Window.partitionBy("grp")
    ranked = per.select(
        "grp", "x",
        F.row_number().over(w.orderBy("x", "cell")).alias("i"),
        F.count("*").over(w).alias("n"),
    )
    return (
        ranked.groupBy("grp", "n")
        .agg(
            F.sum("x").cast("long").alias("total"),
            F.sum(F.expr("(2 * i - n - 1) * x")).cast("long").alias("gnum"),
        )
        .selectExpr(
            "grp", "CAST(n AS BIGINT) AS n_cells", "total",
            "CAST(CASE WHEN total > 0 THEN (1000000 * gnum) DIV (n * total)"
            " ELSE 0 END AS BIGINT) AS gini_e6",
        )
    )


def oracle_gini_sql(events_sql: str) -> str:
    """DuckDB mirror over a subquery yielding (grp, cell, cents)."""
    return f"""
WITH ev AS ({events_sql}),
per AS (SELECT grp, cell, CAST(SUM(cents) AS BIGINT) AS x
        FROM ev GROUP BY 1, 2),
ranked AS (
  SELECT grp, x,
    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY x, cell) AS i,
    COUNT(*) OVER (PARTITION BY grp) AS n
  FROM per
)
SELECT grp, CAST(n AS BIGINT) AS n_cells,
  CAST(SUM(x) AS BIGINT) AS total,
  CAST(CASE WHEN SUM(x) > 0
       THEN (1000000 * SUM((2 * i - n - 1) * x)) // (n * SUM(x))
       ELSE 0 END AS BIGINT) AS gini_e6
FROM ranked GROUP BY grp, n
"""
