"""Link prediction: common-neighbor / Jaccard / preferential-attachment
scores for NON-adjacent node pairs — the classic "who should be linked"
primitive (recommendation candidates, knowledge-graph completion, dedup
candidate promotion) over the same kNN graph the triangle/PageRank family
already builds.

Semantics (Liben-Nowell & Kleinberg's batch formulation): for every
unordered pair (u, w) with u < w that shares >= min_common neighbors and
is NOT itself an edge, emit

    cn          = |N(u) & N(w)|             (common neighbors)
    jaccard_e6  = floor(1e6 * cn / |N(u) | N(w)|)
                = floor(1e6 * cn / (deg_u + deg_w - cn))
    pref_attach = deg_u * deg_w

All-integer outputs (the driver-canon-safe palette): the Jaccard ratio
ships as floor fixed-point derived from exact integers, so both engines
agree bit-for-bit.

Scale shape: one wedge self-join keyed on the shared-neighbor id (the
only quadratic-risk exchange — bounded because wedge fan-out per center
is deg^2 and the kNN graph has bounded degree <= 2k by construction; on
power-law graphs the same compact-forward degree cap used by
triangle_counts applies), one left_anti against the edge set to keep
non-edges only, two broadcast-size degree joins. Every exchange carries
integer id pairs; nothing wide ever shuffles. The undirected edge set is
localCheckpointed once and reused by the wedge arms, the anti-join and
the degree aggregation, so the upstream kNN join runs exactly once.

Reference parity: scored over the identical k=6 kNN digraph the reference
suite's graph fixtures use (cf. triangle_counts / pagerank in
operators/graph.py); the oracle recomputes the graph from first
principles via a window-ranked cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JACCARD_SCALE = 1_000_000


def link_prediction(edges: DataFrame, min_common: int = 2) -> DataFrame:
    """(u, w, cn, deg_u, deg_w, jaccard_e6, pref_attach) for every
    non-adjacent pair with >= min_common shared neighbors; u < w."""
    und = (
        edges.selectExpr("doc_a AS a", "doc_b AS b")
        .unionByName(edges.selectExpr("doc_b AS a", "doc_a AS b"))
        .where("a != b")
        .distinct()
        .localCheckpoint(eager=True)  # reused by wedges, anti-join, degrees
    )
    deg = und.groupBy("a").agg(F.count("*").alias("deg"))
    # wedge join: center = shared neighbor a; (u, w) = its neighbor pairs
    x = und.selectExpr("a AS v", "b AS u")
    y = und.selectExpr("a AS v", "b AS w")
    cand = (
        x.join(y, "v")
        .where("u < w")
        .groupBy("u", "w")
        .agg(F.count("*").alias("cn"))
        .where(F.col("cn") >= min_common)
    )
    # prediction targets are NON-edges: drop pairs already connected
    cand = cand.join(
        und.selectExpr("a AS u", "b AS w"), ["u", "w"], "left_anti"
    )
    du = deg.selectExpr("a AS u", "deg AS deg_u")
    dw = deg.selectExpr("a AS w", "deg AS deg_w")
    return (
        cand.join(du, "u")
        .join(dw, "w")
        .selectExpr(
            "CAST(u AS BIGINT) AS u",
            "CAST(w AS BIGINT) AS w",
            "CAST(cn AS BIGINT) AS cn",
            "CAST(deg_u AS BIGINT) AS deg_u",
            "CAST(deg_w AS BIGINT) AS deg_w",
            f"CAST(cn * {JACCARD_SCALE} AS BIGINT) DIV (deg_u + deg_w - cn)"
            " AS jaccard_e6",
            "CAST(deg_u * deg_w AS BIGINT) AS pref_attach",
        )
    )


def oracle_link_pred_sql(edges_cte: str, min_common: int = 2) -> str:
    """DuckDB mirror over a CTE chain ending in edges(src, dst): the same
    wedge-count / anti-join formulation in plain SQL."""
    return f"""
WITH {edges_cte},
und AS (
  SELECT src AS a, dst AS b FROM edges WHERE src != dst
  UNION SELECT dst, src FROM edges WHERE src != dst
),
deg AS (SELECT a, COUNT(*) AS deg FROM und GROUP BY 1),
cand AS (
  SELECT e1.b AS u, e2.b AS w, COUNT(*) AS cn
  FROM und e1 JOIN und e2 ON e1.a = e2.a AND e1.b < e2.b
  GROUP BY 1, 2
  HAVING COUNT(*) >= {min_common}
),
nonedge AS (
  SELECT c.u, c.w, c.cn
  FROM cand c LEFT JOIN und o ON o.a = c.u AND o.b = c.w
  WHERE o.a IS NULL
)
SELECT CAST(n.u AS BIGINT) AS u, CAST(n.w AS BIGINT) AS w,
  CAST(n.cn AS BIGINT) AS cn,
  CAST(du.deg AS BIGINT) AS deg_u, CAST(dw.deg AS BIGINT) AS deg_w,
  CAST((n.cn * {JACCARD_SCALE}) // (du.deg + dw.deg - n.cn) AS BIGINT)
    AS jaccard_e6,
  CAST(du.deg * dw.deg AS BIGINT) AS pref_attach
FROM nonedge n
JOIN deg du ON du.a = n.u
JOIN deg dw ON dw.a = n.w
"""


# Adamic-Adar: 1/ln(deg) weights via a COMPILE-TIME table (the
# patch_entropy device) — ln enters only as floor(ln(d) * 1e6) literals
AA_MAX_DEG = 1024


def _ln_e6_table(n_max: int = AA_MAX_DEG) -> list[int]:
    import math

    return [math.floor(math.log(d) * 1_000_000) for d in range(1, n_max + 1)]


def adamic_adar(edges: DataFrame, min_common: int = 2) -> DataFrame:
    """(u, w, cn, aa_e6, n_unscored): Adamic-Adar link-prediction scores
    for non-adjacent pairs — each shared neighbor v contributes
    1e12 DIV floor(ln(deg_v) * 1e6) (~ 1e6/ln deg_v), so rarely-shared
    hubs count less than exclusive mutual friends. Wedge centers have
    deg >= 2 by construction (they host two distinct neighbors), so
    ln(deg) > 0 and the division is total. Centers beyond the AA_MAX_DEG
    table are NOT silently dropped: they score NULL and are COUNTED in
    n_unscored (zero on bounded-degree graphs like the kNN digraph).

    Scale shape mirrors link_prediction: one wedge self-join on the
    shared-neighbor id with the same bounded-degree argument, the weight
    joins in as a broadcast-size degree lookup + literal-array
    projection, one left_anti against the edge set; id-only exchanges."""
    tab = _ln_e6_table()
    arr = "array(" + ", ".join(f"{v}L" for v in tab) + ")"
    und = (
        edges.selectExpr("doc_a AS a", "doc_b AS b")
        .unionByName(edges.selectExpr("doc_b AS a", "doc_a AS b"))
        .where("a != b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = und.groupBy("a").agg(F.count("*").alias("deg"))
    x = und.selectExpr("a AS v", "b AS u")
    y = und.selectExpr("a AS v", "b AS w")
    wedges = (
        x.join(y, "v")
        .where("u < w")
        .join(F.broadcast(deg.selectExpr("a AS v", "deg AS deg_v")), "v")
        .selectExpr(
            "u", "w",
            f"CASE WHEN deg_v <= {AA_MAX_DEG} THEN "
            f"CAST(1000000000000 AS BIGINT)"
            f" DIV element_at({arr}, CAST(deg_v AS INT)) END AS wt",
        )
    )
    cand = (
        wedges.groupBy("u", "w")
        .agg(
            F.count("*").alias("cn"),
            F.sum("wt").alias("aa"),
            F.sum(F.expr("CAST(wt IS NULL AS INT)")).alias("n_unscored"),
        )
        .where(F.col("cn") >= min_common)
        .join(und.selectExpr("a AS u", "b AS w"), ["u", "w"], "left_anti")
    )
    return cand.selectExpr(
        "CAST(u AS BIGINT) AS u", "CAST(w AS BIGINT) AS w",
        "CAST(cn AS BIGINT) AS cn",
        "CAST(coalesce(aa, 0) AS BIGINT) AS aa_e6",
        "CAST(n_unscored AS BIGINT) AS n_unscored",
    )


def oracle_adamic_adar_sql(edges_cte: str, min_common: int = 2) -> str:
    """DuckDB mirror: identical wedge join, literal ln table, NULL-skip
    sum and unscored census."""
    tab = _ln_e6_table()
    arr = "[" + ", ".join(str(v) for v in tab) + "]"
    return f"""
WITH {edges_cte},
und AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM edges WHERE src != dst
  UNION
  SELECT dst, src FROM edges WHERE src != dst
),
deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY 1),
wedges AS (
  SELECT e1.b AS u, e2.b AS w,
    CASE WHEN d.deg <= {AA_MAX_DEG} THEN
      CAST(1000000000000 AS BIGINT) // ({arr})[CAST(d.deg AS INT)] END AS wt
  FROM und e1 JOIN und e2 ON e1.a = e2.a AND e1.b < e2.b
  JOIN deg d ON d.a = e1.a
),
cand AS (
  SELECT u, w, CAST(COUNT(*) AS BIGINT) AS cn,
    CAST(COALESCE(SUM(wt), 0) AS BIGINT) AS aa_e6,
    CAST(SUM(CASE WHEN wt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_unscored
  FROM wedges GROUP BY 1, 2 HAVING COUNT(*) >= {min_common}
)
SELECT CAST(c.u AS BIGINT) AS u, CAST(c.w AS BIGINT) AS w, c.cn,
  c.aa_e6, c.n_unscored
FROM cand c LEFT JOIN und o ON o.a = c.u AND o.b = c.w
WHERE o.a IS NULL"""
