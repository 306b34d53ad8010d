"""Emerging hot spot analysis — the ESRI space-time-cube census
(Getis & Ord 1992 Gi* per time slice, Mann-Kendall over each cell's
Gi*-z series, Hamed 2008's pairing), classifying every grid cell as an
intensifying / diminishing / persistent hot or cold spot or noise:
THE standard "where is activity clustering AND which way is it going"
geospatial product, composed from this repo's own exact machines
(`autocorr.gi_hotspots`' halo-scatter Gi* and `mannkendall`'s trend
test).

Exact-portability layering:
  1. per (epoch, cell): v = Σ value (exact BIGINT), queen-3x3-incl-self
     neighborhood pieces k_i (present neighbors) and s_i (their sum) via
     ONE 9-arm halo scatter per epoch — the focal/gi_hotspots exchange.
  2. per epoch: totals (n, sx, sx2) — a 1-row-per-epoch agg BROADCAST
     back; Gi* z ships as floor-e6 BIGINT through ONE shared IEEE chain
     `FLOOR(1e6*num*SQRT(n-1)/SQRT(vfac*kfac))` where num = n*s_i−k_i*sx,
     vfac = n*sx2−sx², kfac = n*k_i−k_i² are exact BIGINTs (sqrt and the
     pinned multiply order are IEEE-correctly-rounded in both engines —
     the kendall/acf rule). Degenerate slices (vfac or kfac <= 0) emit 0.
  3. per cell: Mann-Kendall S / var18 / z over the INTEGER z_e6 series
     (epoch-ordered) — from here everything is exact again.
  4. class: hot/cold at |z| >= 1.96e6 in the LAST OBSERVED epoch of the
     cell, trend at |mk z| >= 1.96e6, via one shared CASE.

Overflow GUARDED not assumed (the acf device): raises when
n_cells * max|v| > 3e9 (then n*sx2 and num exceed int64) telling the
caller to rescale the value column.

Scale shape (100 TB): the raw stream folds map-side to (epoch, cell)
rows before anything else; the halo scatter is a constant 9x fan-out of
those grid-bounded rows (never event-bounded); epoch totals are 1 row
each and broadcast; the MK pair join is epoch-bounded (<= T(T-1)/2 rows
per cell, T = #epochs — a CALENDAR bound). No window wider than a cell's
epoch count, no Python anywhere."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .mannkendall import _SIGN, _Z

# Gi* z in floor-e6 through one shared IEEE chain; 0 when degenerate
_GI_Z = (
    "CASE WHEN vfac > 0 AND kfac > 0 THEN "
    "FLOOR(1000000.0 * num * SQRT(CAST(n - 1 AS DOUBLE)) / "
    "SQRT(CAST(vfac AS DOUBLE) * CAST(kfac AS DOUBLE))) "
    "ELSE 0 END"
)

_CRIT = 1_959_963  # floor(1.959964 * 1e6): two-tailed 5% normal cutoff

_CLASS = (
    f"CASE WHEN cur_z >= {_CRIT} AND mk_z >= {_CRIT} THEN 'intensifying_hot' "
    f"WHEN cur_z >= {_CRIT} AND mk_z <= -{_CRIT} THEN 'diminishing_hot' "
    f"WHEN cur_z >= {_CRIT} THEN 'persistent_hot' "
    f"WHEN cur_z <= -{_CRIT} AND mk_z <= -{_CRIT} THEN 'intensifying_cold' "
    f"WHEN cur_z <= -{_CRIT} AND mk_z >= {_CRIT} THEN 'diminishing_cold' "
    f"WHEN cur_z <= -{_CRIT} THEN 'persistent_cold' "
    f"ELSE 'ns' END"
)

_OFFS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def emerging_hotspots(events: DataFrame, grid_n: int) -> DataFrame:
    """(gx, gy, n_epochs, s_stat, mk_z_e6, cur_z_e6, klass) from events
    carrying (gx, gy, epoch, val) on a grid_n x grid_n integer grid."""
    binned = (
        events.groupBy("gx", "gy", "epoch")
        .agg(F.sum("val").cast("long").alias("v"))
        .localCheckpoint(eager=True)  # reused: guard + scatter + last-epoch
    )
    g = binned.agg(
        F.count_distinct("gx", "gy").alias("nc"),
        F.max(F.abs("v")).alias("vm"),
    ).first()
    if g["vm"] is not None and g["nc"] * g["vm"] > 3_000_000_000:
        raise RuntimeError(
            f"emerging_hotspots: n_cells * max|v| = {g['nc'] * g['vm']} > "
            "3e9 — n*sx2 / num would overflow int64; rescale the value "
            "column before calling"
        )
    arms = ", ".join(
        f"named_struct('tx', gx + {dx}, 'ty', gy + {dy}, "
        f"'is_center', {str(dx == 0 and dy == 0).lower()})"
        for dx, dy in _OFFS
    )
    cells = (
        binned.select("epoch", "v", F.expr(f"explode(array({arms})) AS o"))
        .where(
            (F.col("o.tx") >= 0) & (F.col("o.tx") < grid_n)
            & (F.col("o.ty") >= 0) & (F.col("o.ty") < grid_n)
        )
        .groupBy("epoch", "o.tx", "o.ty")
        .agg(
            F.max(F.when(F.col("o.is_center"), F.col("v"))).alias("vc"),
            F.count("*").cast("long").alias("k_i"),
            F.sum("v").cast("long").alias("s_i"),
        )
        .where(F.col("vc").isNotNull())
    )
    totals = binned.groupBy("epoch").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("long").alias("sx"),
        F.expr("CAST(SUM(v * v) AS BIGINT)").alias("sx2"),
    )
    z = (
        cells.join(F.broadcast(totals), "epoch")
        .selectExpr(
            "epoch", "tx", "ty", "n",
            "CAST(n * s_i - k_i * sx AS BIGINT) AS num",
            "CAST(n * sx2 - sx * sx AS BIGINT) AS vfac",
            "CAST(n * k_i - k_i * k_i AS BIGINT) AS kfac",
        )
        .selectExpr(
            "epoch", "tx", "ty",
            f"CAST({_GI_Z} AS BIGINT) AS z_e6",
        )
        .localCheckpoint(eager=True)  # reused by MK pairs, ties, census
    )
    a = z.selectExpr("tx", "ty", "epoch AS e1", "z_e6 AS y1")
    b = z.selectExpr("tx", "ty", "epoch AS e2", "z_e6 AS y2")
    s = (
        a.join(b, ["tx", "ty"])
        .where("e1 < e2")
        .groupBy("tx", "ty")
        .agg(F.expr(f"CAST(SUM({_SIGN}) AS BIGINT)").alias("s_stat"))
    )
    ties = (
        z.groupBy("tx", "ty", "z_e6").agg(F.count("*").alias("t"))
        .groupBy("tx", "ty")
        .agg(F.expr("CAST(SUM(t*(t-1)*(2*t+5)) AS BIGINT)").alias("tie18"))
    )
    census = z.groupBy("tx", "ty").agg(
        F.count("*").cast("long").alias("n_epochs"),
        F.expr(
            "MAX_BY(z_e6, epoch)"
        ).cast("long").alias("cur_z"),
    )
    mkz = _Z.format(s="s_stat", v="var18")
    return (
        census.join(s, ["tx", "ty"], "left")
        .join(ties, ["tx", "ty"])
        .selectExpr(
            "tx", "ty", "n_epochs", "cur_z",
            "CAST(coalesce(s_stat, 0) AS BIGINT) AS s_stat",
            "CAST(n_epochs * (n_epochs - 1) * (2 * n_epochs + 5) - tie18"
            " AS BIGINT) AS var18",
        )
        .selectExpr(
            "tx", "ty", "n_epochs", "cur_z", "s_stat", "var18",
            f"CAST({mkz} AS BIGINT) AS mk_z",
        )
        .selectExpr(
            "CAST(tx AS BIGINT) AS gx", "CAST(ty AS BIGINT) AS gy",
            "n_epochs", "s_stat", "CAST(mk_z AS BIGINT) AS mk_z_e6",
            "CAST(cur_z AS BIGINT) AS cur_z_e6",
            f"{_CLASS} AS klass",
        )
    )


def oracle_emerging_sql(events_sql: str, grid_n: int) -> str:
    """DuckDB mirror over a subquery yielding (gx, gy, epoch, val):
    identical binning, 9-arm scatter (offsets cross join), broadcast-free
    totals join, shared Gi*-z / MK-z chains and class CASE."""
    sign = _SIGN.replace("y2", "b.z_e6").replace("y1", "a.z_e6")
    mkz = _Z.format(s="s_stat", v="var18")
    return f"""
WITH ev AS ({events_sql}),
binned AS (
  SELECT gx, gy, epoch, CAST(SUM(val) AS BIGINT) AS v
  FROM ev GROUP BY 1, 2, 3
),
offs AS (
  SELECT dx.d AS dx, dy.d AS dy
  FROM (VALUES (-1), (0), (1)) dx(d), (VALUES (-1), (0), (1)) dy(d)
),
scat AS (
  SELECT b.epoch, b.gx + o.dx AS tx, b.gy + o.dy AS ty, b.v,
         (o.dx = 0 AND o.dy = 0) AS is_center
  FROM binned b, offs o
  WHERE b.gx + o.dx >= 0 AND b.gx + o.dx < {grid_n}
    AND b.gy + o.dy >= 0 AND b.gy + o.dy < {grid_n}
),
cells AS (
  SELECT epoch, tx, ty,
    MAX(CASE WHEN is_center THEN v END) AS vc,
    CAST(COUNT(*) AS BIGINT) AS k_i,
    CAST(SUM(v) AS BIGINT) AS s_i
  FROM scat GROUP BY 1, 2, 3
  HAVING MAX(CASE WHEN is_center THEN v END) IS NOT NULL
),
totals AS (
  SELECT epoch, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(v) AS BIGINT) AS sx, CAST(SUM(v * v) AS BIGINT) AS sx2
  FROM binned GROUP BY 1
),
z AS MATERIALIZED (
  SELECT epoch, tx, ty, CAST({_GI_Z} AS BIGINT) AS z_e6
  FROM (
    SELECT c.epoch, c.tx, c.ty, t.n,
      CAST(t.n * c.s_i - c.k_i * t.sx AS BIGINT) AS num,
      CAST(t.n * t.sx2 - t.sx * t.sx AS BIGINT) AS vfac,
      CAST(t.n * c.k_i - c.k_i * c.k_i AS BIGINT) AS kfac
    FROM cells c JOIN totals t ON t.epoch = c.epoch
  )
),
s AS (
  SELECT a.tx, a.ty, CAST(SUM({sign}) AS BIGINT) AS s_stat
  FROM z a JOIN z b ON a.tx = b.tx AND a.ty = b.ty AND a.epoch < b.epoch
  GROUP BY 1, 2
),
ties AS (
  SELECT tx, ty, CAST(SUM(t*(t-1)*(2*t+5)) AS BIGINT) AS tie18
  FROM (SELECT tx, ty, z_e6, COUNT(*) AS t FROM z GROUP BY 1, 2, 3)
  GROUP BY 1, 2
),
census AS (
  SELECT tx, ty, CAST(COUNT(*) AS BIGINT) AS n_epochs,
    CAST(MAX_BY(z_e6, epoch) AS BIGINT) AS cur_z
  FROM z GROUP BY 1, 2
),
base AS (
  SELECT c.tx, c.ty, c.n_epochs, c.cur_z,
    CAST(COALESCE(s.s_stat, 0) AS BIGINT) AS s_stat,
    CAST(c.n_epochs * (c.n_epochs - 1) * (2 * c.n_epochs + 5) - t.tie18
         AS BIGINT) AS var18
  FROM census c LEFT JOIN s ON s.tx = c.tx AND s.ty = c.ty
  JOIN ties t ON t.tx = c.tx AND t.ty = c.ty
),
fin AS (
  SELECT tx, ty, n_epochs, cur_z, s_stat, var18,
    CAST({mkz} AS BIGINT) AS mk_z
  FROM base
)
SELECT CAST(tx AS BIGINT) AS gx, CAST(ty AS BIGINT) AS gy,
  n_epochs, s_stat, CAST(mk_z AS BIGINT) AS mk_z_e6,
  CAST(cur_z AS BIGINT) AS cur_z_e6,
  {_CLASS} AS klass
FROM fin
"""
