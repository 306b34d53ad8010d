"""Exact distributed quantiles over a HIGH-CARDINALITY integer column —
two-phase bucketed rank selection (the classic exact order-statistics
algorithm; approxQuantile trades exactness away, and zonal_quantiles'
value-histogram device needs a bounded alphabet like 0..255).

Phase 1: one hash agg over coarse range buckets ((v - vmin) DIV W, W sized
for <= 4096 buckets) — a BOUNDED table collected to the driver, where
prefix sums locate, for each target rank ceil(q·n), its bucket and the
residual rank inside it. Phase 2: ONE more pass over only the candidate
buckets (a pushdown-friendly range predicate), folding to per-value counts
whose cumulative sum yields the exact order statistic. Nothing ever sorts
globally; the shuffles carry bucket/value count rows. Rank rule shared
with zonal_quantiles: quantile q = the smallest value whose cumulative
count reaches ceil(q·n), by integer cross-multiplication (cum·den >=
n·num) — no float thresholds."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_QS = ((1, 10), (1, 4), (1, 2), (3, 4), (9, 10))


def exact_quantiles(
    vals: DataFrame,
    qs: tuple = DEFAULT_QS,
    max_buckets: int = 4096,
) -> DataFrame:
    """(q_num, q_den, rank, value): exact order statistics of column `v`
    (BIGINT). rank = ceil(q_num/q_den * n), value = the rank-th smallest."""
    n, vmin, vmax = vals.agg(
        F.count("*"), F.min("v"), F.max("v")
    ).collect()[0]
    if not n:
        raise ValueError("exact_quantiles: empty input")
    width = max(1, (vmax - vmin + 1 + max_buckets - 1) // max_buckets)
    b1 = (
        vals.groupBy(F.expr(f"(v - {vmin}) DIV {width}").alias("bkt"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    counts = {int(r["bkt"]): int(r["cnt"]) for r in b1}
    # driver-side prefix scan over <= max_buckets rows: for each target
    # rank, the bucket holding it and the rank's global threshold
    targets = []  # (q_num, q_den, rank, bkt)
    for num, den in qs:
        rank = -((-num * n) // den)  # ceil(num*n/den), exact integers
        cum = 0
        for bkt in sorted(counts):
            cum += counts[bkt]
            if cum >= rank:
                targets.append((num, den, rank, bkt))
                break
    need = sorted({t[3] for t in targets})
    lo = {b: sum(counts[k] for k in counts if k < b) for b in need}

    # phase 2: per-value counts inside candidate buckets only (range
    # predicates the scan can push down), cumulative rank inside each
    cand = vals.where(
        F.expr(
            " OR ".join(
                f"(v >= {vmin + b * width} AND v < {vmin + (b + 1) * width})"
                for b in need
            )
        )
    )
    vc = (
        cand.groupBy(
            F.expr(f"(v - {vmin}) DIV {width}").alias("bkt"), "v"
        )
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "cum",
            F.sum("cnt").over(
                Window.partitionBy("bkt").orderBy("v")
            ),
        )
    )
    tdf = vals.sparkSession.createDataFrame(
        [(num, den, rank, b, rank - lo[b]) for num, den, rank, b in targets],
        "q_num long, q_den long, rank long, bkt long, in_rank long",
    )
    return (
        vc.join(F.broadcast(tdf), "bkt")
        .where(F.col("cum") >= F.col("in_rank"))
        .groupBy("q_num", "q_den", "rank")
        .agg(F.min("v").cast("long").alias("value"))
    )


def oracle_quantiles_sql(vals_sql: str, qs: tuple = DEFAULT_QS) -> str:
    """DuckDB mirror via the direct cumulative-count rule over ALL distinct
    values — an independent one-pass formulation of the same rank rule."""
    qrows = ", ".join(f"({num}, {den})" for num, den in qs)
    return f"""
WITH vals AS ({vals_sql}),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vals),
vc AS (SELECT v, COUNT(*) AS cnt FROM vals GROUP BY v),
cum AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum FROM vc),
qs(q_num, q_den) AS (VALUES {qrows})
SELECT CAST(q.q_num AS BIGINT) AS q_num, CAST(q.q_den AS BIGINT) AS q_den,
  CAST(-((-q.q_num * n.n) // q.q_den) AS BIGINT) AS rank,
  CAST(MIN(c.v) AS BIGINT) AS value
FROM qs q, n, cum c
WHERE c.cum * q.q_den >= n.n * q.q_num
GROUP BY 1, 2, 3
"""
