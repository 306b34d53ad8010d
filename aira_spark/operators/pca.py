"""Dominant principal component of the embedding table by fixed-round
power iteration — the embedding-drift / anisotropy diagnostic (a corpus
whose vectors collapse onto one axis has degenerate retrieval; the top
PC + per-vector projection is the standard first look), next to
kmeans/ivf's centroid machinery.

Exact integer fixed point end to end (the pagerank/hits device):

1. covariance NUMERATOR with cross-multiplied centering (the lisa/
   gyration play): M[j,k] = n * P[j,k] - S[j] * S[k] over int64-quantized
   coords q = round(x * 1024) — exact, order-independent;
2. one data-derived normalization m' = floor(M * 1e6 / max|M|) via the
   shared nonneg-remainder floor-division text (trend._floor_div — Spark
   DIV truncates, DuckDB // floors, so the raw operators are NEVER used
   on signed values);
3. `rounds` synchronous iterations v' = floor(M'v * 1e6 / max|M'v|),
   L-inf-normalized to +/-1e6 — both engines hold the identical integer
   vector whether or not the iteration converged;
4. per-vector projection proj = sum_j q_ij * v_j (exact int), the
   score downstream curation sorts/filters on.

Start vector all-ones * 1e6: fully deterministic (no RNG); the sign of
the converged component is therefore identical in both engines (no
sign-fixing needed). Degenerate inputs (all-zero M or a zero iterate)
collapse to the all-zero vector rather than dividing by zero.

Overflow budget (loudly guarded): |M| <= 2 * n^2 * qmax^2 must clear
int64 after the * 1e6 scale, i.e. n^2 * qmax^2 <= 4.6e12. At the test
corpus (n = 2000, qmax ~ 592) that is ~1.4e12 — inside with 3x headroom;
the guard RAISES (never silently truncates) beyond it. The 10^12-vector
scale path is a bounded uniform sample for M (the moment matrix
concentrates at O(1/sqrt(sample)) — the ivf centroid-training precedent)
with the full-corpus projection pass unchanged.

Scale shape: the 64x64 moment fold is a pure double-posexplode
projection + ONE hash agg (4096 partial rows per partition cross the
wire, never vectors); the 8 iteration rounds run on 64-row frames
(broadcast joins); the projection pass is one broadcast join + hash agg
over id-keyed integer rows."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .trend import _floor_div

SCALE = 1_000_000
# n^2 * qmax^2 budget so |M| * 1e6 stays inside int64 (2x for centering)
_BUDGET = 4_600_000_000_000


def pca_top1(emb: DataFrame, dim: int = 64, rounds: int = 8) -> DataFrame:
    """(vec_id, label, proj): exact-integer projection of every embedding
    onto the dominant principal component after `rounds` power-iteration
    steps. `emb` carries (vec_id, label, embedding array quantized to
    1/1024)."""
    qi = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "vec_id", "label",
        (F.col("pos") + 1).alias("j"),
        F.expr("CAST(round(CAST(x AS DOUBLE) * 1024.0) AS BIGINT)")
        .alias("q"),
    ).localCheckpoint(eager=True)

    stats = qi.groupBy().agg(
        F.countDistinct("vec_id").alias("n"),
        F.max(F.abs(F.col("q"))).alias("qmax"),
    ).collect()[0]
    n, qmax = int(stats["n"]), int(stats["qmax"])
    if n * n * qmax * qmax > _BUDGET:
        raise ValueError(
            f"pca_top1 int64 budget exceeded: n={n}, qmax={qmax} "
            f"(n^2*qmax^2={n * n * qmax * qmax} > {_BUDGET}); "
            "sample the moment pass or rescale the quantization"
        )

    # 64x64 raw moments: double posexplode = pure projection, ONE hash agg
    pairs = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "x"), "embedding"
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("j"),
        F.expr("CAST(round(CAST(x AS DOUBLE) * 1024.0) AS BIGINT)")
        .alias("qj"),
        F.posexplode("embedding").alias("pos2", "x2"),
    ).select(
        "j", "qj",
        (F.col("pos2") + 1).alias("k"),
        F.expr("CAST(round(CAST(x2 AS DOUBLE) * 1024.0) AS BIGINT)")
        .alias("qk"),
    )
    p = pairs.groupBy("j", "k").agg(
        F.sum(F.col("qj") * F.col("qk")).cast("long").alias("p")
    )
    s = qi.groupBy("j").agg(F.sum("q").cast("long").alias("s"))

    # The normalization + power iteration runs DRIVER-SIDE on the collected
    # moment state: p is exactly dim^2 <= 4096 rows and s is dim rows BY
    # CONSTRUCTION (independent of corpus size — the kmeans-centroid
    # bounded-collect category), while the Spark formulation paid
    # 8 rounds x (broadcast join + agg + crossJoin + checkpoint) of pure
    # stage latency on 64-row frames (~2.5s at any data size). Python ints
    # are arbitrary-precision, the divisors (mmax/wmax) are positive, and
    # Python // floors — so every value is bit-identical to the engine
    # form the oracle unrolls (trend._floor_div == floor for c > 0).
    prows = {(r["j"], r["k"]): r["p"] for r in p.collect()}
    srows = {r["j"]: r["s"] for r in s.collect()}
    mat = {
        (j, k): n * pv - srows[j] * srows[k]
        for (j, k), pv in prows.items()
    }
    mmax = max((abs(v) for v in mat.values()), default=0)
    mp = {
        jk: (0 if mmax == 0 else (v * SCALE) // mmax)
        for jk, v in mat.items()
    }
    vec = {j: SCALE for j in srows}
    for _ in range(rounds):
        w = {}
        for (j, k), mv in mp.items():
            if k in vec:  # the engine form is an INNER join on k
                w[j] = w.get(j, 0) + mv * vec[k]
        wmax = max((abs(x) for x in w.values()), default=0)
        vec = {
            j: (0 if wmax == 0 else (x * SCALE) // wmax)
            for j, x in w.items()
        }
    v = emb.sparkSession.createDataFrame(
        [(int(j), int(x)) for j, x in sorted(vec.items())], "j long, v long"
    )
    return (
        qi.join(F.broadcast(v), "j")
        .groupBy("vec_id", "label")
        .agg(F.sum(F.col("q") * F.col("v")).cast("long").alias("proj"))
        .selectExpr(
            "CAST(vec_id AS BIGINT) AS vec_id",
            "CAST(label AS BIGINT) AS label",
            "proj",
        )
    )


def oracle_pca_sql(dim: int = 64, rounds: int = 8) -> str:
    """DuckDB mirror over the pre-registered `embeddings` view: identical
    quantization, moment fold, normalization and unrolled iteration."""
    q = "CAST(round(CAST(embedding[s.j] AS DOUBLE) * 1024.0) AS BIGINT)"
    fdiv_m = _floor_div(f"m * {SCALE}", "mmax", "duck")
    fdiv_w = _floor_div(f"w * {SCALE}", "wmax", "duck")
    parts = [
        f"""qi AS MATERIALIZED (
  SELECT vec_id, label, s.j, {q} AS q
  FROM embeddings, (SELECT unnest(generate_series(1, {dim})) AS j) s)""",
        "nv AS (SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n FROM qi)",
        """p AS (
  SELECT a.j, b.j AS k, CAST(SUM(a.q * b.q) AS BIGINT) AS p
  FROM qi a JOIN qi b ON a.vec_id = b.vec_id GROUP BY 1, 2)""",
        "sm AS (SELECT j, CAST(SUM(q) AS BIGINT) AS s FROM qi GROUP BY 1)",
        """mat AS (
  SELECT p.j, p.k, nv.n * p.p - sa.s * sb.s AS m
  FROM p
  JOIN sm sa ON sa.j = p.j
  JOIN sm sb ON sb.j = p.k
  CROSS JOIN nv)""",
        "mm AS (SELECT MAX(ABS(m)) AS mmax FROM mat)",
        f"""mp AS MATERIALIZED (
  SELECT j, k,
    CAST(CASE WHEN mmax = 0 THEN 0 ELSE {fdiv_m} END AS BIGINT) AS m
  FROM mat, mm)""",
        f"v0 AS (SELECT DISTINCT j AS k, CAST({SCALE} AS BIGINT) AS v"
        " FROM qi)",
    ]
    for i in range(rounds):
        parts.append(
            f"wr{i} AS MATERIALIZED (SELECT m.j, "
            f"CAST(SUM(m.m * v.v) AS BIGINT) AS w "
            f"FROM mp m JOIN v{i} v ON v.k = m.k GROUP BY 1)"
        )
        parts.append(
            f"v{i + 1} AS MATERIALIZED (SELECT j AS k, "
            f"CAST(CASE WHEN wmax = 0 THEN 0 ELSE {fdiv_w} END AS BIGINT)"
            f" AS v FROM wr{i}, "
            f"(SELECT MAX(ABS(w)) AS wmax FROM wr{i}) wm)"
        )
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT CAST(q.vec_id AS BIGINT) AS vec_id, CAST(q.label AS BIGINT) AS label,
  CAST(SUM(q.q * v.v) AS BIGINT) AS proj
FROM qi q JOIN v{rounds} v ON v.k = q.j
GROUP BY 1, 2"""
    )
