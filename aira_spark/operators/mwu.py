"""Mann-Whitney U (Wilcoxon rank-sum) drift census for every unordered
group pair — the LOCATION-shift companion of `kstest.ks_pairs`' any-
difference D (Mann & Whitney 1947): "is segment A's value distribution
stochastically larger than B's", the workhorse nonparametric A/B test.

Exactness: the doubled statistic stays integer under ties —

    u2_a = 2*#{v_a > v_b} + #{v_a = v_b}
         = sum_v c_a(v) * (2*C_b(<v) + c_b(v))          (exact BIGINT)

computed from the SAME merged per-value histogram + ONE window cumsum
as ks_pairs (ties merged per value before the cumsum); the identity
u2_a + u2_b = 2*n_a*n_b is pinned by pytest. The tie-corrected normal
z ships floor-e6 through ONE shared IEEE chain with each factor kept
int64 and cast separately —

    z = (u2_a - n_a*n_b) * SQRT(3.0*N*(N-1))
        / (SQRT(n_a)*SQRT(n_b)*SQRT(tfac)),
    tfac = (N+1)*N*(N-1) - sum_t (t^3 - t),   N = n_a + n_b

(the factored form: n_a*n_b*tfac would overflow int64 at N ~ 4e4, the
separate square roots never do; sqrt/multiply order is pinned in the
shared text). All-tied pairs (tfac = 0) emit z = 0. reject05 compares
the INTEGER z_e6 against the e6 critical value — exact.

Scale shape (100 TB): identical to ks_pairs — the per-(group, value)
histogram folds the raw stream map-side FIRST (bounded by groups x
value domain, not rows), the K(K-1)/2 pair table broadcasts onto it,
and each pair's merged values ride one window partition."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_Z = (
    "CASE WHEN tfac > 0 THEN "
    "FLOOR(1000000.0 * (u2_a - n_a * n_b) * "
    "SQRT(3.0 * (n_a + n_b) * (n_a + n_b - 1)) / "
    "(SQRT(CAST(n_a AS DOUBLE)) * SQRT(CAST(n_b AS DOUBLE)) * "
    "SQRT(CAST(tfac AS DOUBLE)))) ELSE 0 END"
)
_CRIT = 1_959_963


def mwu_pairs(samples: DataFrame) -> DataFrame:
    """(grp_a, grp_b, n_a, n_b, u2_a, tfac, z_e6, reject05) for every
    unordered group pair of `samples` carrying (grp string, v bigint)."""
    hist = samples.groupBy("grp", "v").agg(
        F.count("*").cast("long").alias("cnt")
    )
    sizes = hist.groupBy("grp").agg(F.sum("cnt").cast("long").alias("n"))
    pairs = (
        sizes.selectExpr("grp AS grp_a", "n AS n_a")
        .crossJoin(sizes.selectExpr("grp AS grp_b", "n AS n_b"))
        .where("grp_a < grp_b")
    )
    side_a = hist.join(
        F.broadcast(pairs), F.col("grp_a") == F.col("grp")
    ).select(
        "grp_a", "grp_b", "n_a", "n_b", "v",
        F.col("cnt").alias("c_a"), F.lit(0).cast("long").alias("c_b"),
    )
    side_b = hist.join(
        F.broadcast(pairs), F.col("grp_b") == F.col("grp")
    ).select(
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
        "grp_a", "grp_b", "n_a", "n_b", "c_a", "c_b",
        (F.sum("c_b").over(w) - F.col("c_b")).alias("cb_below"),
    )
    return (
        steps.groupBy("grp_a", "grp_b", "n_a", "n_b")
        .agg(
            F.expr(
                "CAST(SUM(c_a * (2 * cb_below + c_b)) AS BIGINT)"
            ).alias("u2_a"),
            F.expr(
                "CAST(SUM((c_a + c_b) * (c_a + c_b) * (c_a + c_b)"
                " - (c_a + c_b)) AS BIGINT)"
            ).alias("tsum"),
        )
        .selectExpr(
            "grp_a", "grp_b", "n_a", "n_b", "u2_a",
            "CAST((n_a + n_b + 1) * (n_a + n_b) * (n_a + n_b - 1) - tsum"
            " AS BIGINT) AS tfac",
        )
        .selectExpr(
            "grp_a", "grp_b", "n_a", "n_b", "u2_a", "tfac",
            f"CAST({_Z} AS BIGINT) AS z_e6",
        )
        .selectExpr(
            "grp_a", "grp_b", "n_a", "n_b", "u2_a", "tfac", "z_e6",
            f"CAST(abs(z_e6) > {_CRIT} AS BIGINT) AS reject05",
        )
    )


def oracle_mwu_sql(samples_sql: str) -> str:
    """DuckDB mirror over a subquery yielding (grp, v) — identical
    histogram-first merge, cumsum-below, factored z chain."""
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
    CAST(SUM(c_a) AS BIGINT) AS c_a, CAST(SUM(c_b) AS BIGINT) AS c_b
  FROM (
    SELECT p.grp_a, p.grp_b, p.n_a, p.n_b, h.v, h.cnt AS c_a,
           CAST(0 AS BIGINT) AS c_b
    FROM hist h JOIN pairs p ON p.grp_a = h.grp
    UNION ALL
    SELECT p.grp_a, p.grp_b, p.n_a, p.n_b, h.v, CAST(0 AS BIGINT), h.cnt
    FROM hist h JOIN pairs p ON p.grp_b = h.grp
  ) GROUP BY 1, 2, 3, 4, 5
),
steps AS (
  SELECT grp_a, grp_b, n_a, n_b, c_a, c_b,
    SUM(c_b) OVER (PARTITION BY grp_a, grp_b ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      - c_b AS cb_below
  FROM merged
),
agg AS (
  SELECT grp_a, grp_b, n_a, n_b,
    CAST(SUM(c_a * (2 * cb_below + c_b)) AS BIGINT) AS u2_a,
    CAST(SUM((c_a + c_b) * (c_a + c_b) * (c_a + c_b) - (c_a + c_b))
         AS BIGINT) AS tsum
  FROM steps GROUP BY 1, 2, 3, 4
),
base AS (
  SELECT grp_a, grp_b, n_a, n_b, u2_a,
    CAST((n_a + n_b + 1) * (n_a + n_b) * (n_a + n_b - 1) - tsum
         AS BIGINT) AS tfac
  FROM agg
),
fin AS (
  SELECT grp_a, grp_b, n_a, n_b, u2_a, tfac,
    CAST({_Z} AS BIGINT) AS z_e6
  FROM base
)
SELECT grp_a, grp_b, n_a, n_b, u2_a, tfac, z_e6,
  CAST(abs(z_e6) > {_CRIT} AS BIGINT) AS reject05
FROM fin
"""
