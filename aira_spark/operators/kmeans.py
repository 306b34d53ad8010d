"""Distributed k-means (Lloyd's algorithm) over integer-quantized
embeddings — iterative ML clustering with a bit-exact cross-engine oracle.

Every intermediate is an exact integer, so the Spark run and the DuckDB
mirror agree bit-for-bit at any parallelism:

  - vectors quantize to int64 (x1024 rounding — the similarity-family
    device), so the squared-L2 distance is an exact BIGINT sum;
  - assignment tie-breaks on (distance ASC, centroid_id ASC);
  - the centroid update is an elementwise FLOOR mean computed by the
    shared nonneg-remainder formula (s - ((s % c) + c) % c) / c, which
    makes the numerator exactly divisible — identical under Spark's
    truncating `div`, DuckDB's `//`, and Python's `//`;
  - an emptied cluster carries its previous centroid (deterministic, no
    reseeding RNG).

Scale shape (per round): the centroid table is k x d integers —
metadata-sized — so it is collected and BAKED INTO THE PROJECTION as
literals (the IVF-seed device, similarity.py): assignment is a pure
zero-shuffle JVM expression (array_min over per-centroid distance
structs — no join, no Python). The only exchange per round is the
centroid update's (cluster, dim) partial-sum aggregation: map-side
combine reduces every task's contribution to k*d rows before the
shuffle, so exchange volume is independent of the row count — the same
bounded-state argument as the HLL/CMS sketches. Seeds are the first k
vectors in vec_id order (deterministic, like the IVF oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT_SPARK = "transform({v}, x -> CAST(round(CAST(x AS DOUBLE) * 1024.0) AS BIGINT))"


def _floor_div(s: str, c: str, engine: str) -> str:
    """Floor division via exact-divisibility adjustment — engine-neutral."""
    num = f"(({s}) - ((({s}) % ({c})) + ({c})) % ({c}))"
    op = "div" if engine == "spark" else "//"
    return f"({num} {op} ({c}))"


def _dist_expr(v: str, centroid: list[int]) -> str:
    """Exact BIGINT squared L2 distance of int64 array `v` to a literal
    centroid — a pure JVM expression (whole-stage codegen)."""
    lits = ", ".join(f"{int(x)}L" for x in centroid)
    return (
        f"aggregate(zip_with({v}, array({lits}), "
        f"(x, y) -> (x - y) * (x - y)), 0L, (acc, x) -> acc + x)"
    )


def _assign_expr(v: str, centroids: list[list[int]]) -> str:
    """argmin over centroids as array_min of (dist, cid) structs — struct
    ordering gives the (distance, centroid_id) tie-break for free."""
    arms = ", ".join(
        f"named_struct('d', {_dist_expr(v, c)}, 'c', CAST({i} AS BIGINT))"
        for i, c in enumerate(centroids)
    )
    return f"array_min(array({arms}))"


def kmeans_fixed(
    emb: DataFrame, k: int = 8, rounds: int = 4, vec_col: str = "embedding"
) -> tuple[DataFrame, list[list[int]]]:
    """Run `rounds` Lloyd iterations; returns (assignments, centroids):
    assignments = (vec_id, cluster, dist) under the FINAL centroids,
    centroids = the final k x d integer table.

    `emb` needs (vec_id, embedding array<double>); quantization happens
    here. The per-round driver collect is k*d integers — metadata-sized."""
    q = emb.selectExpr("vec_id", f"{QUANT_SPARK.format(v=vec_col)} AS v")
    seeds = q.orderBy("vec_id").limit(k).collect()
    if len(seeds) < k:
        raise ValueError(f"k={k} exceeds {len(seeds)} input vectors")
    cents: list[list[int]] = [list(r["v"]) for r in seeds]
    d = len(cents[0])

    for _ in range(rounds):
        a = q.select(
            "vec_id", "v", F.expr(_assign_expr("v", cents)).alias("a")
        )
        partials = (
            a.selectExpr("a.c AS cluster", "posexplode(v) AS (dim, comp)")
            .groupBy("cluster", "dim")
            .agg(
                F.sum("comp").cast("long").alias("s"),
                F.count("*").cast("long").alias("n"),
            )
            .collect()  # k*d rows — bounded, like the IVF centroid sample
        )
        table: dict[tuple[int, int], tuple[int, int]] = {
            (int(r["cluster"]), int(r["dim"])): (int(r["s"]), int(r["n"]))
            for r in partials
        }
        new_cents = []
        for cid in range(k):
            if (cid, 0) in table:
                comp = []
                for dim in range(d):
                    s, n = table[(cid, dim)]
                    comp.append((s - ((s % n) + n) % n) // n)
                new_cents.append(comp)
            else:  # emptied cluster: carry the previous centroid
                new_cents.append(cents[cid])
        cents = new_cents

    assigned = q.select(
        "vec_id", "v", F.expr(_assign_expr("v", cents)).alias("a")
    ).selectExpr(
        "CAST(vec_id AS BIGINT) AS vec_id",
        "a.c AS cluster",
        "CAST(a.d AS BIGINT) AS dist",
        "v",
    )
    return assigned, cents


def kmeans_summary(
    emb: DataFrame, k: int = 8, rounds: int = 4
) -> DataFrame:
    """Driver-checkable union frame (kind, a, b, c) — all BIGINT/STRING:
      ('asn',  vec_id,     cluster,   dist)       every final assignment
      ('cent', cluster_id, n_members, comp_sum)   per-cluster data stats
    comp_sum = SUM over members of the component sum of their vectors —
    computed distributed from the final assignment, so a wrong assignment
    anywhere shifts it."""
    assigned, _ = kmeans_fixed(emb, k, rounds)
    asn = assigned.selectExpr(
        "'asn' AS kind", "vec_id AS a", "cluster AS b", "dist AS c"
    )
    cent = (
        assigned.selectExpr(
            "cluster", "aggregate(v, 0L, (acc, x) -> acc + x) AS vsum"
        )
        .groupBy("cluster")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.sum("vsum").cast("long").alias("comp_sum"),
        )
        .selectExpr("'cent' AS kind", "cluster AS a", "n_members AS b",
                    "comp_sum AS c")
    )
    return asn.unionByName(cent)


DEFAULT_EMB_CTE = (
    "e AS (SELECT vec_id, "
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1024.0) "
    "AS BIGINT)) AS v FROM embeddings)"
)

DUCK_DIST = (
    "CAST(list_sum(list_transform(list_zip(e.v, c.v), "
    "p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT)"
)


def kmeans_cte_prefix(k: int, rounds: int, emb_cte: str) -> str:
    """The shared WITH prefix (no leading `WITH`): embeddings CTE `e`,
    seed table `c0`, and the unrolled Lloyd rounds ending in the final
    centroid table `c{rounds}` — reused by the kmeans and silhouette
    oracles so the centroid chain cannot drift between them."""
    dist = DUCK_DIST
    fdiv = _floor_div("SUM(e.v[dim])", "COUNT(*)", "duckdb")
    rounds_sql = []
    for r in range(1, rounds + 1):
        prev = f"c{r - 1}"
        rounds_sql.append(f"""
a{r} AS MATERIALIZED (
  SELECT vec_id, cid, dist FROM (
    SELECT e.vec_id, c.cid, {dist} AS dist,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
                         ORDER BY {dist}, c.cid) AS rn
    FROM e CROSS JOIN {prev} c
  ) WHERE rn = 1
),
m{r} AS MATERIALIZED (
  SELECT a.cid, dims_t.dim, CAST({fdiv} AS BIGINT) AS comp
  FROM a{r} a JOIN e USING (vec_id)
  CROSS JOIN (SELECT unnest(generate_series(1,
      (SELECT len(v) FROM e LIMIT 1))) AS dim) dims_t
  GROUP BY a.cid, dims_t.dim
),
c{r} AS MATERIALIZED (
  SELECT p.cid, COALESCE(list(m.comp ORDER BY m.dim), p.v) AS v
  FROM {prev} p LEFT JOIN m{r} m ON p.cid = m.cid
  GROUP BY p.cid, p.v
)""")
    return f"""{emb_cte},
c0 AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v
  FROM (SELECT * FROM e ORDER BY vec_id LIMIT {k})
),
{",".join(rounds_sql)}"""


def oracle_kmeans_sql(
    k: int = 8,
    rounds: int = 4,
    emb_cte: str = DEFAULT_EMB_CTE,
) -> str:
    """DuckDB mirror — unrolled Lloyd rounds as MATERIALIZED CTEs (each
    round's tables are referenced twice, so inlining would blow up like
    the BPE chain). Distance, argmin tie-break, floor-mean update, and
    empty-cluster carry all share the Python/Spark formulas."""
    dist = DUCK_DIST
    final = f"c{rounds}"
    return f"""
WITH {kmeans_cte_prefix(k, rounds, emb_cte)},
fin AS MATERIALIZED (
  SELECT vec_id, cid, dist FROM (
    SELECT e.vec_id, c.cid, {dist} AS dist,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
                         ORDER BY {dist}, c.cid) AS rn
    FROM e CROSS JOIN {final} c
  ) WHERE rn = 1
)
SELECT 'asn' AS kind, CAST(vec_id AS BIGINT) AS a, CAST(cid AS BIGINT) AS b,
       CAST(dist AS BIGINT) AS c
FROM fin
UNION ALL
SELECT 'cent', CAST(f.cid AS BIGINT),
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(list_sum(e.v)) AS BIGINT)
FROM fin f JOIN e USING (vec_id)
GROUP BY f.cid
"""
