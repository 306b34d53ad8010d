"""Simplified (centroid-based) silhouette census over the k-means
partition (Hruschka et al. 2004's simplified silhouette, the
medoid-free field variant of Rousseeuw 1987) — the "is this clustering
actually separated" gauge: per vector, a2 = squared distance to the OWN
final centroid and b2 = squared distance to the nearest OTHER centroid;
the per-cluster census buckets members by cross-multiplied separation
margins and carries the exact distance sums. The partition-quality
companion to `modularity` (graphs) for the embedding space.

Margins (documented rationals, no floats): a member is 'strong' when
b2 > 4*a2 (nearest rival at least 2x as far), 'medium' when
4*b2 > 9*a2 (at least 1.5x), else 'weak' — ties and boundary vectors
fall to the weaker class deterministically. b2 never undercuts a2 by
construction (assignment is the argmin), pytest-pinned.

Exactness: centroids come from kmeans_fixed's exact integer Lloyd
rounds and are BAKED AS LITERALS into one projection (the IVF/kmeans
device): the k distances are exact BIGINT sums, a2/b2 are the first two
entries of array_sort over them (VALUE order — under an assignment tie
b2 = a2 exactly, landing in 'weak', same in both engines), margins are
integer cross-multiplications, and the census ships only counts and
exact sums — nothing divides, nothing rounds.

Scale shape (100 TB): assignment + a2/b2 is a ZERO-SHUFFLE JVM
projection (no join — the centroid table is k x d literals); the census
is ONE map-side-combined hash agg to k rows. The only other exchanges
are inside kmeans_fixed's bounded per-round update."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kmeans import (
    DEFAULT_EMB_CTE,
    DUCK_DIST,
    _dist_expr,
    kmeans_cte_prefix,
    kmeans_fixed,
)

_CLS = (
    "CASE WHEN b2 > 4 * a2 THEN 'strong' "
    "WHEN 4 * b2 > 9 * a2 THEN 'medium' ELSE 'weak' END"
)


def silhouette_census(
    emb: DataFrame, k: int = 8, rounds: int = 4
) -> DataFrame:
    """(cluster, n, n_strong, n_medium, n_weak, sum_a2, sum_b2) per
    final k-means cluster."""
    assigned, cents = kmeans_fixed(emb, k, rounds)
    ds = ", ".join(_dist_expr("v", c) for c in cents)
    two = assigned.selectExpr(
        "cluster",
        f"array_sort(array({ds})) AS sd",
    ).selectExpr(
        "cluster",
        "element_at(sd, 1) AS a2",
        "element_at(sd, 2) AS b2",
    )
    return (
        two.selectExpr("cluster", "a2", "b2", f"{_CLS} AS cls")
        .groupBy("cluster")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.expr("CAST(cls = 'strong' AS INT)"))
            .cast("long").alias("n_strong"),
            F.sum(F.expr("CAST(cls = 'medium' AS INT)"))
            .cast("long").alias("n_medium"),
            F.sum(F.expr("CAST(cls = 'weak' AS INT)"))
            .cast("long").alias("n_weak"),
            F.sum("a2").cast("long").alias("sum_a2"),
            F.sum("b2").cast("long").alias("sum_b2"),
        )
        .selectExpr(
            "CAST(cluster AS BIGINT) AS cluster",
            "n", "n_strong", "n_medium", "n_weak", "sum_a2", "sum_b2",
        )
    )


def oracle_silhouette_sql(
    k: int = 8, rounds: int = 4, emb_cte: str = DEFAULT_EMB_CTE
) -> str:
    """DuckDB mirror: the SHARED kmeans centroid-chain prefix (so the
    two oracles cannot drift), then rank-two distances per vector and
    the identical margin CASE."""
    return f"""
WITH {kmeans_cte_prefix(k, rounds, emb_cte)},
dall AS (
  SELECT e.vec_id, c.cid, {DUCK_DIST} AS dist
  FROM e CROSS JOIN c{rounds} c
),
rk AS (
  SELECT vec_id, cid, dist,
    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM dall
),
two AS (
  SELECT vec_id,
    CAST(MAX(CASE WHEN rn = 1 THEN cid END) AS BIGINT) AS cluster,
    CAST(MAX(CASE WHEN rn = 1 THEN dist END) AS BIGINT) AS a2,
    CAST(MIN(CASE WHEN rn = 2 THEN dist END) AS BIGINT) AS b2
  FROM rk WHERE rn <= 2 GROUP BY 1
),
cl AS (SELECT cluster, a2, b2, {_CLS} AS cls FROM two)
SELECT CAST(cluster AS BIGINT) AS cluster,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CASE WHEN cls = 'strong' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_strong,
  CAST(SUM(CASE WHEN cls = 'medium' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_medium,
  CAST(SUM(CASE WHEN cls = 'weak' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_weak,
  CAST(SUM(a2) AS BIGINT) AS sum_a2,
  CAST(SUM(b2) AS BIGINT) AS sum_b2
FROM cl GROUP BY 1"""
