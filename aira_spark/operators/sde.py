"""Standard deviational ellipse (directional distribution) per group —
the ESRI/CrimeStat staple (Lefever 1926) summarizing WHERE a point set
sits and WHICH WAY it stretches: mean center, the exact variance/
covariance numerators of the coordinate cloud, and the major-axis
orientation class.

    cx = Sx/n, cy = Sy/n
    vx = n*Sxx - Sx^2,  vy = n*Syy - Sy^2,  cov_n = n*Sxy - Sx*Sy
    2*theta = atan2(2*cov, vx - vy)

Exactness: coordinates are EXACT centidegree integers (the synthetic
formula is integer-exact before its float division, so both engines
derive them with zero float ops); all sufficient statistics are exact
BIGINTs; the mean center ships ONCE-divided floor fixed point in
micro-degrees; orientation reuses `moments.ORIENT_CASE`'s atan2-free
sign/magnitude quantization on a = vx - vy, b = 2*cov_n (the common
positive scale cancels — identical device, identical tie rule).
Overflow is GUARDED (the acf device): n * max(x^2+y^2-ish) must clear
int64, enforced as n_max * q_max^2 <= 4e18 per group with a loud
rescale message.

Scale shape (100 TB): ONE map-side-combined hash agg per group carries
six integers — no window, no join, no Python; the guard is a second
tiny agg. Groups are the output rows; nothing scales with points except
the partial sums inside the agg."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .moments import ORIENT_CASE


def std_ellipse(points: DataFrame) -> DataFrame:
    """(grp, n, cx_e6, cy_e6, vx, vy, cov_n, orient) from points carrying
    (grp string, xq bigint, yq bigint) in centidegree units."""
    g = points.agg(
        F.count("*").alias("n"),
        F.max(F.greatest(F.abs("xq"), F.abs("yq"))).alias("qm"),
    ).first()
    if g["qm"] is not None and g["n"] * g["qm"] * g["qm"] > 4_000_000_000_000_000_000:
        raise RuntimeError(
            f"std_ellipse: n * max(q)^2 = {g['n'] * g['qm'] * g['qm']} > 4e18 "
            "— n*Sxx would overflow int64; rescale the coordinate units"
        )
    agg = points.groupBy("grp").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("xq").cast("long").alias("sx"),
        F.sum("yq").cast("long").alias("sy"),
        F.expr("CAST(SUM(xq * xq) AS BIGINT)").alias("sxx"),
        F.expr("CAST(SUM(yq * yq) AS BIGINT)").alias("syy"),
        F.expr("CAST(SUM(xq * yq) AS BIGINT)").alias("sxy"),
    )
    return (
        agg.selectExpr(
            "grp", "n",
            # centideg -> micro-deg: *1e4 then floor-divide by n (all
            # operands nonneg after the +178/+86 fold, but keep DIV-safe)
            "CAST((10000 * sx) DIV n AS BIGINT) AS cx_e6",
            "CAST((10000 * sy) DIV n AS BIGINT) AS cy_e6",
            "CAST(n * sxx - sx * sx AS BIGINT) AS vx",
            "CAST(n * syy - sy * sy AS BIGINT) AS vy",
            "CAST(n * sxy - sx * sy AS BIGINT) AS cov_n",
        )
        .selectExpr(
            "grp", "n", "cx_e6", "cy_e6", "vx", "vy", "cov_n",
            "vx - vy AS a", "2 * cov_n AS b",
        )
        .selectExpr(
            "grp", "n", "cx_e6", "cy_e6", "vx", "vy", "cov_n",
            f"{ORIENT_CASE} AS orient",
        )
    )


def oracle_sde_sql(points_sql: str) -> str:
    """DuckDB mirror over a subquery yielding (grp, xq, yq)."""
    return f"""
WITH p AS ({points_sql}),
agg AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(xq) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
    CAST(SUM(xq * xq) AS BIGINT) AS sxx,
    CAST(SUM(yq * yq) AS BIGINT) AS syy,
    CAST(SUM(xq * yq) AS BIGINT) AS sxy
  FROM p GROUP BY 1
),
base AS (
  SELECT grp, n,
    CAST((10000 * sx) // n AS BIGINT) AS cx_e6,
    CAST((10000 * sy) // n AS BIGINT) AS cy_e6,
    CAST(n * sxx - sx * sx AS BIGINT) AS vx,
    CAST(n * syy - sy * sy AS BIGINT) AS vy,
    CAST(n * sxy - sx * sy AS BIGINT) AS cov_n
  FROM agg
)
SELECT grp, n, cx_e6, cy_e6, vx, vy, cov_n,
  {ORIENT_CASE} AS orient
FROM (SELECT *, vx - vy AS a, 2 * cov_n AS b FROM base)
"""
