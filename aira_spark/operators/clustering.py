"""Local clustering-coefficient census (Watts & Strogatz 1998) — the
per-node cohesion statistic c_v = 2*T_v / (d_v*(d_v-1)) (what fraction of
a node's neighbor pairs are themselves connected), bucketed into deciles,
plus the GLOBAL transitivity ratio 3*triangles / wedges as a fold row —
the small-world probe that separates grid-like graphs (high c) from
tree/star wiring (c ~ 0) at equal degree.

Exactness: c_v is never computed as a float — the decile is the single
floor division (20 * T_v) DIV (d*(d-1)) on nonnegative exact BIGINTs
(Spark DIV = DuckDB // on nonneg, the textrank pinned-division rule);
c_v = 1 lands in its own bucket 10. The fold row (decile = -1) carries
sum_tri = 3*triangles and n_wedges = sum d(d-1)/2 exactly, so
transitivity = sum_tri / n_wedges at whatever precision the consumer
wants — no division ships (the modularity rule). Only nodes with d >= 2
enter (coefficient undefined below); their count is visible via the fold
row's n_nodes.

Scale shape (100 TB): triangles come from graph.triangle_counts'
degree-ordered compact-forward orientation (wedge join bounded O(sqrt m)
per node regardless of hub skew); degrees fold map-side from the
undirected edge list; the census is one bounded hash agg over <= 12
decile keys. Every exchange carries integer ids/counts."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import triangle_counts


def clustering_census(edges: DataFrame) -> DataFrame:
    """(decile, n_nodes, sum_tri, n_wedges) over nodes with degree >= 2
    of the undirected graph from `edges` (src, dst — any orientation);
    decile = (20*T_v) DIV (d*(d-1)) in 0..10, fold row decile = -1
    totals all considered nodes (global transitivity = sum_tri /
    n_wedges there)."""
    tri = (
        triangle_counts(
            edges.selectExpr("src AS doc_a", "dst AS doc_b")
        )
        .where("node >= 0")  # drop the global fold row; rebuilt below
    )
    deg = (
        edges.where("src != dst")
        .selectExpr("LEAST(src, dst) AS a", "GREATEST(src, dst) AS b")
        .distinct()
        .selectExpr("explode(array(a, b)) AS node")
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
        .where("deg >= 2")
    )
    per_node = deg.join(tri, "node", "left").selectExpr(
        "node",
        "CAST(coalesce(n_tri, 0) AS BIGINT) AS t",
        "deg * (deg - 1) DIV 2 AS wedges",
        "(20 * coalesce(n_tri, 0)) DIV (deg * (deg - 1)) AS decile",
    )
    census = per_node.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.sum("t").cast("long").alias("sum_tri"),
        F.sum("wedges").cast("long").alias("n_wedges"),
    )
    fold = per_node.agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.sum("t").cast("long").alias("sum_tri"),
        F.sum("wedges").cast("long").alias("n_wedges"),
    ).selectExpr(
        "CAST(-1 AS BIGINT) AS decile", "n_nodes", "sum_tri", "n_wedges"
    )
    return census.selectExpr(
        "CAST(decile AS BIGINT) AS decile", "n_nodes", "sum_tri", "n_wedges"
    ).unionByName(fold)


def oracle_clustering_sql(edges_cte: str) -> str:
    """DuckDB mirror: `edges_cte` defines edges(src, dst) — INDEPENDENT
    triangle formulation (plain a<b<c three-way join, no orientation
    trick), identical decile division and fold row."""
    return f"""
WITH {edges_cte},
undc AS (
  SELECT src AS a, dst AS b FROM edges WHERE src != dst
  UNION SELECT dst, src FROM edges WHERE src != dst
),
tri AS (
  SELECT e1.a AS n1, e1.b AS n2, e2.b AS n3
  FROM undc e1
  JOIN undc e2 ON e2.a = e1.b AND e2.b > e1.b
  JOIN undc e3 ON e3.a = e1.a AND e3.b = e2.b
  WHERE e1.a < e1.b
),
pn AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
  FROM (SELECT unnest([n1, n2, n3]) AS node FROM tri)
  GROUP BY 1
),
dg AS (
  SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM undc GROUP BY 1 HAVING COUNT(*) >= 2
),
per_node AS (
  SELECT dg.node, CAST(COALESCE(pn.n_tri, 0) AS BIGINT) AS t,
    CAST(deg * (deg - 1) // 2 AS BIGINT) AS wedges,
    CAST((20 * COALESCE(pn.n_tri, 0)) // (deg * (deg - 1)) AS BIGINT)
      AS decile
  FROM dg LEFT JOIN pn ON pn.node = dg.node
)
SELECT CAST(decile AS BIGINT) AS decile,
  CAST(COUNT(*) AS BIGINT) AS n_nodes,
  CAST(SUM(t) AS BIGINT) AS sum_tri,
  CAST(SUM(wedges) AS BIGINT) AS n_wedges
FROM per_node GROUP BY 1
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(COUNT(*) AS BIGINT),
  CAST(COALESCE(SUM(t), 0) AS BIGINT),
  CAST(COALESCE(SUM(wedges), 0) AS BIGINT)
FROM per_node"""
