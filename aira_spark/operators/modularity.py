"""Newman modularity census of a community partition (Newman & Girvan
2004) — THE standard "is this partition actually communities" score, the
quality gauge for label_prop's output (and any other partition):

    Q = sum_c [ in_c / m  -  (tot_c / 2m)^2 ]

with m undirected edges, in_c intra-community edges, tot_c the degree
sum of community c. Scores near 0 mean the partition is no better than
random wiring; real community structure lands 0.3-0.7.

Exactness: multiply through by 4m^2 — per community the contribution is
the exact BIGINT q_num_c = 4*m*in_c - tot_c^2 and Q = sum(q_num)/(4m^2),
so the checked projection is pure integers (the lisa cross-multiplied
centering device; no division ships at all — m_edges rides along so the
consumer can divide at whatever precision it wants). Overflow is
GUARDED, not assumed: tot_c <= 2m so tot^2 <= 4m^2; the operator raises
loudly when m > 1.4e9 (4m^2 ~ 8e18, inside int64 with margin) — the
escalation is DECIMAL(38,0) widening, deliberately not built until a
workload needs it.

Scale shape (100 TB): the undirected edge list is canonicalized ONCE
(min/max + distinct, id-only exchange); intra counts come from TWO
equi-joins of edges against the (node, label) frame (the pagerank
exchange class) + one hash agg per label; degrees fold map-side from an
endpoint explode; the single-row m total BROADCASTS back over the
bounded per-label frame (the gi_hotspots device). Labels never pair
with labels, nodes never pair with nodes."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def modularity(
    edges: DataFrame, labels: DataFrame, max_edges: int = 1_400_000_000
) -> DataFrame:
    """(label, comm_size, deg_sum, in_edges, m_edges, q_num) per
    community from `edges` (src, dst — any orientation, self-loops and
    duplicates ignored) and `labels` (node, label); q_num = 4*m*in_c -
    deg_sum^2, Q = sum(q_num) / (4*m^2). Isolated labeled nodes emit
    with deg_sum = in_edges = 0."""
    und = (
        edges.where("src != dst")
        .selectExpr(
            "LEAST(src, dst) AS a", "GREATEST(src, dst) AS b"
        )
        .distinct()
        .localCheckpoint(eager=True)  # reused: m total, intra, degrees
    )
    totals = und.agg(F.count("*").cast("long").alias("m"))
    m_edges = totals.first()["m"]
    if m_edges > max_edges:
        raise RuntimeError(
            f"modularity: {m_edges} undirected edges > max_edges="
            f"{max_edges}; 4*m^2 would overflow int64 — widen the "
            "arithmetic to DECIMAL(38,0) for graphs this size"
        )
    la = labels.selectExpr("node", "label")
    intra = (
        und.join(la.selectExpr("node AS a", "label AS lab_a"), "a")
        .join(la.selectExpr("node AS b", "label AS lab_b"), "b")
        .where("lab_a = lab_b")
        .groupBy(F.col("lab_a").alias("label"))
        .agg(F.count("*").cast("long").alias("in_edges"))
    )
    deg = (
        und.selectExpr("explode(array(a, b)) AS node")
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    per_label = (
        la.join(deg, "node", "left")
        .groupBy("label")
        .agg(
            F.count("*").cast("long").alias("comm_size"),
            F.sum(F.coalesce(F.col("deg"), F.lit(0)))
            .cast("long").alias("deg_sum"),
        )
        .join(intra, "label", "left")
    )
    return (
        per_label.crossJoin(F.broadcast(totals))
        .selectExpr(
            "CAST(label AS BIGINT) AS label",
            "comm_size",
            "deg_sum",
            "CAST(coalesce(in_edges, 0) AS BIGINT) AS in_edges",
            "CAST(m AS BIGINT) AS m_edges",
            "CAST(4 * m * coalesce(in_edges, 0) - deg_sum * deg_sum"
            " AS BIGINT) AS q_num",
        )
    )


def oracle_modularity_sql(edges_cte: str, labels_sql: str) -> str:
    """DuckDB mirror: `edges_cte` defines edges(src, dst); `labels_sql`
    is a complete query yielding (node, label) — nested as a derived
    table so its own WITH chain stays scoped. CTE names here are
    suffixed `_m`: DuckDB (1.0) rejects two MATERIALIZED CTEs sharing a
    name even across nesting levels, and label_prop's own chain uses
    `und`."""
    return f"""
WITH {edges_cte},
und_m AS MATERIALIZED (
  SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges WHERE src != dst GROUP BY 1, 2
),
la_m AS MATERIALIZED (SELECT node, label FROM ({labels_sql})),
tot_m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und_m),
intra_m AS (
  SELECT x.label, CAST(COUNT(*) AS BIGINT) AS in_edges
  FROM und_m u
  JOIN la_m x ON x.node = u.a
  JOIN la_m y ON y.node = u.b
  WHERE x.label = y.label
  GROUP BY 1
),
deg_m AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT a AS node FROM und_m UNION ALL SELECT b FROM und_m
  ) GROUP BY 1
),
pl_m AS (
  SELECT la_m.label, CAST(COUNT(*) AS BIGINT) AS comm_size,
    CAST(SUM(COALESCE(deg_m.deg, 0)) AS BIGINT) AS deg_sum
  FROM la_m LEFT JOIN deg_m ON deg_m.node = la_m.node
  GROUP BY 1
)
SELECT CAST(pl_m.label AS BIGINT) AS label, pl_m.comm_size, pl_m.deg_sum,
  CAST(COALESCE(intra_m.in_edges, 0) AS BIGINT) AS in_edges,
  CAST(tot_m.m AS BIGINT) AS m_edges,
  CAST(4 * tot_m.m * COALESCE(intra_m.in_edges, 0)
       - pl_m.deg_sum * pl_m.deg_sum AS BIGINT) AS q_num
FROM pl_m LEFT JOIN intra_m ON intra_m.label = pl_m.label, tot_m"""
