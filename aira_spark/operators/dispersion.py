"""Quadrat variance-mean dispersion census (Fisher's index of dispersion)
per mark class — the classic first-look CSR test next to ripley_k's
distance-based one: bin points to grid quadrats, compare the count
variance to the mean. VMR = 1 under complete spatial randomness
(Poisson), > 1 clustered, < 1 dispersed/regular.

Exactness: with quadrat counts c_q over Q = nf^2 TOTAL quadrats (empty
quadrats contribute 0 to both sums so no dense spine is needed) and
N = sum(c):

    VMR = s^2 / mean = (Q * sum(c^2) - N^2) / (N * (Q - 1))

an exact rational whose numerator is >= 0 by Cauchy-Schwarz, so
vmr_e6 is ONE nonneg floor division (DIV == //); the classification
cross-multiplies rational thresholds (3/2 clustered, 2/3 dispersed)
instead of comparing floats. Overflow: sum(c^2) <= N^2, so
Q * sum(c^2) * 1e6 <= 16384 * N^2 * 1e6 — safe through N ~ 2e4 at the
default grid; beyond that drop the e6 scale a decade.

Scale shape (100 TB): two chained hash aggs (points fold to (mark, cell)
counts map-side FIRST, then one bounded row per mark) + a projection —
the exchange never carries points; nothing joins."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import DEFAULT_RES, cell_from_xy

# VMR class thresholds as exact rationals
T_CLUS_NUM, T_CLUS_DEN = 3, 2     # VMR > 3/2  -> clustered
T_DISP_NUM, T_DISP_DEN = 2, 3     # VMR < 2/3  -> dispersed


def quadrat_dispersion(
    points: DataFrame, res: int = DEFAULT_RES
) -> DataFrame:
    """(mark, n_pts, occupied, sum_c2, vmr_e6, disp_class): Fisher index
    of dispersion over the res-grid quadrats, per mark class. `points`
    carries (point_id, mark, x, y)."""
    q = (1 << res) * (1 << res)
    counts = (
        points.select(
            "mark", cell_from_xy(F.col("x"), F.col("y"), res).alias("cell")
        )
        .groupBy("mark", "cell")
        .agg(F.count("*").cast("long").alias("c"))
    )
    per_mark = counts.groupBy("mark").agg(
        F.sum("c").cast("long").alias("n_pts"),
        F.count("*").cast("long").alias("occupied"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_c2"),
    )
    num = f"({q} * sum_c2 - n_pts * n_pts)"
    den = f"(n_pts * {q - 1})"
    return per_mark.selectExpr(
        "CAST(mark AS BIGINT) AS mark",
        "n_pts", "occupied", "sum_c2",
        f"CAST(({num} * 1000000) DIV {den} AS BIGINT) AS vmr_e6",
        f"CASE WHEN {T_CLUS_DEN} * {num} > {T_CLUS_NUM} * {den}"
        f" THEN 'clustered'"
        f" WHEN {T_DISP_DEN} * {num} < {T_DISP_NUM} * {den}"
        f" THEN 'dispersed'"
        f" ELSE 'random' END AS disp_class",
    )


def oracle_dispersion_sql(points_sql: str, res: int = DEFAULT_RES) -> str:
    """DuckDB mirror over a subquery yielding (mark, cell): identical
    two-level fold, floor division and cross-multiplied classes."""
    q = (1 << res) * (1 << res)
    num = f"({q} * sum_c2 - n_pts * n_pts)"
    den = f"(n_pts * {q - 1})"
    return f"""
WITH p AS ({points_sql}),
counts AS (
  SELECT mark, cell, CAST(COUNT(*) AS BIGINT) AS c FROM p GROUP BY 1, 2
),
per_mark AS (
  SELECT mark, CAST(SUM(c) AS BIGINT) AS n_pts,
    CAST(COUNT(*) AS BIGINT) AS occupied,
    CAST(SUM(c * c) AS BIGINT) AS sum_c2
  FROM counts GROUP BY 1
)
SELECT CAST(mark AS BIGINT) AS mark, n_pts, occupied, sum_c2,
  CAST(({num} * 1000000) // {den} AS BIGINT) AS vmr_e6,
  CASE WHEN {T_CLUS_DEN} * {num} > {T_CLUS_NUM} * {den} THEN 'clustered'
       WHEN {T_DISP_DEN} * {num} < {T_DISP_NUM} * {den} THEN 'dispersed'
       ELSE 'random' END AS disp_class
FROM per_mark"""
