"""Two-sample Kolmogorov-Smirnov drift census — the exact D statistic

    D = max_x |F_a(x) - F_b(x)|

for EVERY unordered pair of groups (the all-cohorts drift matrix: the
standard nonparametric detector for "did this segment's value
distribution shift?" — scipy.stats.ks_2samp's statistic, evaluated over
merged ECDF step points, which is where the max provably lives).

Exactness: the max runs over the INTEGER cross-multiplied numerator
|n_b * C_a(x) - n_a * C_b(x)| (C = cumulative count at merged distinct
value x, ties merged per value BEFORE the cumsum so both ECDFs step
together), so D's numerator is a BIGINT and d_e6 ships as
`(d_num * 1000000) DIV (n_a * n_b)` floor fixed point. The alpha=0.05
rejection compares D against c(0.05) * sqrt((n_a+n_b)/(n_a*n_b)) with
c = 1.358 (Smirnov's asymptotic table) in doubles — a fixed chain of
IEEE ops on exact integers, bit-identical in any engine, no
accumulation-order hazard (the integer route overflows int64 at
d_num^2 * 1e6 for n ~ 3e4, so the double compare is the sound choice).

Scale shape (100 TB): the per-(group, value) histogram folds the raw
stream map-side FIRST — bounded by groups x |value domain| (cents are a
bounded domain, so this caps regardless of row count); the tiny
group-size table cross-joins to K(K-1)/2 pair rows and BROADCASTS onto
the histogram (twice, once per side — no OR-join); each pair's merged
ECDF rides ONE window partition, so pairs are the parallelism unit and
per-pair work is sort of |values_a ∪ values_b|, never of raw rows."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_REJ = (
    "CAST(CAST(d_num AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"
    " > 1.358 * sqrt((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))"
    " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) AS {t}) AS reject05"
)


def ks_pairs(samples: DataFrame) -> DataFrame:
    """(grp_a, grp_b, n_a, n_b, d_num, d_e6, reject05) for every unordered
    group pair of `samples` carrying (grp string, v bigint)."""
    hist = samples.groupBy("grp", "v").agg(F.count("*").cast("long").alias("cnt"))
    sizes = hist.groupBy("grp").agg(F.sum("cnt").cast("long").alias("n"))
    pairs = (
        sizes.selectExpr("grp AS grp_a", "n AS n_a")
        .crossJoin(sizes.selectExpr("grp AS grp_b", "n AS n_b"))
        .where("grp_a < grp_b")
    )
    side_a = hist.join(F.broadcast(pairs), F.col("grp_a") == F.col("grp")).select(
        "grp_a", "grp_b", "n_a", "n_b", "v",
        F.col("cnt").alias("c_a"), F.lit(0).cast("long").alias("c_b"),
    )
    side_b = hist.join(F.broadcast(pairs), F.col("grp_b") == F.col("grp")).select(
        "grp_a", "grp_b", "n_a", "n_b", "v",
        F.lit(0).cast("long").alias("c_a"), F.col("cnt").alias("c_b"),
    )
    merged = (
        side_a.unionByName(side_b)
        .groupBy("grp_a", "grp_b", "n_a", "n_b", "v")
        .agg(F.sum("c_a").alias("c_a"), F.sum("c_b").alias("c_b"))
    )
    w = (
        Window.partitionBy("grp_a", "grp_b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    steps = merged.select(
        "grp_a", "grp_b", "n_a", "n_b",
        F.abs(
            F.col("n_b") * F.sum("c_a").over(w)
            - F.col("n_a") * F.sum("c_b").over(w)
        ).alias("diff"),
    )
    return (
        steps.groupBy("grp_a", "grp_b", "n_a", "n_b")
        .agg(F.max("diff").cast("long").alias("d_num"))
        .selectExpr(
            "grp_a", "grp_b", "n_a", "n_b", "d_num",
            "(d_num * 1000000) DIV (n_a * n_b) AS d_e6",
            _REJ.format(t="BIGINT"),
        )
    )


def oracle_ks_sql(samples_sql: str) -> str:
    """DuckDB mirror over a subquery yielding (grp, v) — identical
    histogram-first merge, cross-multiplied cumulative diff, double
    rejection compare."""
    return f"""
WITH s AS ({samples_sql}),
hist AS (SELECT grp, v, CAST(COUNT(*) AS BIGINT) AS cnt FROM s GROUP BY 1, 2),
sizes AS (SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n FROM hist GROUP BY 1),
pairs AS (
  SELECT a.grp AS grp_a, b.grp AS grp_b, a.n AS n_a, b.n AS n_b
  FROM sizes a JOIN sizes b ON a.grp < b.grp
),
merged AS (
  SELECT grp_a, grp_b, n_a, n_b, v,
    SUM(c_a) AS c_a, SUM(c_b) AS c_b
  FROM (
    SELECT p.grp_a, p.grp_b, p.n_a, p.n_b, h.v, h.cnt AS c_a,
      CAST(0 AS BIGINT) AS c_b
    FROM pairs p JOIN hist h ON h.grp = p.grp_a
    UNION ALL
    SELECT p.grp_a, p.grp_b, p.n_a, p.n_b, h.v, CAST(0 AS BIGINT), h.cnt
    FROM pairs p JOIN hist h ON h.grp = p.grp_b
  ) GROUP BY 1, 2, 3, 4, 5
),
steps AS (
  SELECT grp_a, grp_b, n_a, n_b,
    ABS(n_b * SUM(c_a) OVER w - n_a * SUM(c_b) OVER w) AS diff
  FROM merged
  WINDOW w AS (PARTITION BY grp_a, grp_b ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT grp_a, grp_b, n_a, n_b, CAST(MAX(diff) AS BIGINT) AS d_num,
  CAST((MAX(diff) * 1000000) // (n_a * n_b) AS BIGINT) AS d_e6,
  {_REJ.format(t="BIGINT").replace("d_num", "MAX(diff)")}
FROM steps GROUP BY 1, 2, 3, 4
"""
