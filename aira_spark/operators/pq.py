"""Product quantization (PQ) ANN: compress vectors to M byte codes, search
with asymmetric distance computation (ADC) lookup tables.

The billion-vector scale path (Jegou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011; the IVF-PQ layout FAISS popularized):
split each d-dim vector into M subvectors, quantize each against a per-
subspace codebook of K codewords, and store only the M small codes —
64 dims of float32 become M=4 bytes, a 64x memory cut, which is what makes
an in-RAM index of 10^9+ vectors possible at all. A query never decodes:
its distance to every codeword is precomputed once (the M x K ADC lookup
table), so each candidate costs M table lookups instead of d multiplies.

Spark shape: codebooks here are SEEDED (subvectors of the first K vectors
by vec_id — deterministic, SQL-expressible), making encode a ZERO-SHUFFLE
pure-JVM expression (the argmin struct trick shared with kmeans.py); swap
in kmeans_fixed-per-subspace centroids for production recall at no plan
change. The ADC lookup table is Q x M x K integers built driver-side from
the Q collected query vectors (bounded, the IVF precedent) and broadcast
as literal array columns; scoring is again a pure projection. The ONLY
exchange in the whole search is the final per-query top-k window — the
plan a 10^12-vector index wants: codes live columnar, queries broadcast,
nothing quadratic ever shuffles.

Exactness: quantization, codebooks, codes, and ADC distances are all exact
BIGINT arithmetic — identical in Spark and DuckDB at any parallelism; ties
break on (distance, codeword id) / (distance, vec_id) everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kmeans import QUANT_SPARK, _assign_expr

QUANT_DUCK = (
    "list_transform({v}, x -> CAST(round(CAST(x AS DOUBLE) * 1024.0) "
    "AS BIGINT))"
)


def _sub(expr: str, m: int, sub: int) -> str:
    return f"slice({expr}, {m * sub + 1}, {sub})"


def pq_topk(
    emb: DataFrame,
    query_pred: str = "vec_id < 8",
    m_sub: int = 4,
    k_codes: int = 8,
    topk: int = 10,
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, adc_dist, rnk): ADC top-k of every query (rows of
    `emb` matching query_pred) against the PQ-encoded corpus."""
    from pyspark.sql import Window

    spark = emb.sparkSession
    q = emb.selectExpr("vec_id", f"{QUANT_SPARK.format(v=vec_col)} AS v")
    seeds = q.orderBy("vec_id").limit(k_codes).collect()
    if len(seeds) < k_codes:
        raise ValueError(f"k_codes={k_codes} exceeds {len(seeds)} vectors")
    d = len(seeds[0]["v"])
    if d % m_sub:
        raise ValueError(f"dim {d} not divisible by m_sub={m_sub}")
    sub = d // m_sub
    # codebooks[m][j] = j-th seed's m-th subvector (ints)
    cbs = [
        [list(r["v"])[m * sub : (m + 1) * sub] for r in seeds]
        for m in range(m_sub)
    ]
    code_cols = [
        F.expr(_assign_expr(_sub("v", m, sub), cbs[m]))["c"].alias(f"code_{m}")
        for m in range(m_sub)
    ]
    codes = q.select("vec_id", *code_cols)

    queries = q.where(query_pred).collect()
    # ADC lookup tables: Q x M x K exact integer distances, built driver-side
    lut_rows = []
    for r in queries:
        qv = list(r["v"])
        row = {"query_id": int(r["vec_id"])}
        for m in range(m_sub):
            qm = qv[m * sub : (m + 1) * sub]
            row[f"lut_{m}"] = [
                sum((a - b) * (a - b) for a, b in zip(qm, cw))
                for cw in cbs[m]
            ]
        lut_rows.append(row)
    lut_schema = "query_id long, " + ", ".join(
        f"lut_{m} array<long>" for m in range(m_sub)
    )
    luts = spark.createDataFrame(
        [
            tuple([r["query_id"]] + [r[f"lut_{m}"] for m in range(m_sub)])
            for r in lut_rows
        ],
        lut_schema,
    )
    adc = " + ".join(
        f"element_at(lut_{m}, CAST(code_{m} AS INT) + 1)"
        for m in range(m_sub)
    )
    scored = codes.crossJoin(F.broadcast(luts)).selectExpr(
        "query_id", "vec_id", f"CAST({adc} AS BIGINT) AS adc_dist"
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= topk)
        .selectExpr("query_id", "vec_id", "adc_dist", "rnk")
    )


def oracle_pq_sql(
    table: str = "embeddings",
    query_pred: str = "vec_id < 8",
    m_sub: int = 4,
    k_codes: int = 8,
    topk: int = 10,
    dim: int = 64,
) -> str:
    """DuckDB mirror: codebooks/codes/LUT derived relationally from the
    same seeded construction (1-based list_slice, inclusive ends)."""
    sub = dim // m_sub
    ms = ", ".join(f"({m})" for m in range(m_sub))
    dist = (
        "CAST(list_sum(list_transform(list_zip({a}, {b}), "
        "p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT)"
    )
    return f"""
WITH e AS (
  SELECT vec_id, {QUANT_DUCK.format(v='embedding')} AS v FROM {table}
),
seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, v
  FROM e ORDER BY vec_id LIMIT {k_codes}
),
cb AS (
  SELECT o.m, s.j,
         list_slice(s.v, o.m * {sub} + 1, (o.m + 1) * {sub}) AS cw
  FROM seeds s, (VALUES {ms}) AS o(m)
),
cand AS (
  SELECT e.vec_id, cb.m, cb.j,
    {dist.format(a=f"list_slice(e.v, cb.m * {sub} + 1, (cb.m + 1) * {sub})", b="cb.cw")} AS dd
  FROM e, cb
),
codes AS (
  SELECT vec_id, m, j AS code FROM (
    SELECT vec_id, m, j, dd,
      row_number() OVER (PARTITION BY vec_id, m ORDER BY dd, j) AS rn
    FROM cand
  ) WHERE rn = 1
),
qv AS (SELECT vec_id AS query_id, v FROM e WHERE {query_pred}),
lut AS (
  SELECT q.query_id, cb.m, cb.j,
    {dist.format(a=f"list_slice(q.v, cb.m * {sub} + 1, (cb.m + 1) * {sub})", b="cb.cw")} AS dd
  FROM qv q, cb
),
scores AS (
  SELECT l.query_id, c.vec_id, CAST(SUM(l.dd) AS BIGINT) AS adc_dist
  FROM codes c JOIN lut l ON l.m = c.m AND l.j = c.code
  GROUP BY l.query_id, c.vec_id
)
SELECT query_id, vec_id, adc_dist, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY adc_dist, vec_id) AS rnk
  FROM scores
) WHERE rnk <= {topk}"""
