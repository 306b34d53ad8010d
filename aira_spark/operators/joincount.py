"""Join-count statistics — the binary-mark spatial autocorrelation census
(Moran 1948; Cliff & Ord 1981, "Spatial Processes" ch. 1) that the
numeric Moran/Geary family in `autocorr.py` cannot express: for a 0/1
mark ("hot" cell) over the grid, count BB / BW / WW rook-adjacent pairs
and compare against the nonfree-sampling (permutation) expectation

    E[BB] = m * nb(nb-1) / (n(n-1)),   E[BW] = 2m * nb*nw / (n(n-1)),

the classic clustering detector for categorical surfaces (disease maps,
land-cover patches) — observed BB >> E[BB] means the hot cells clump.

Semantics: the universe is the OBSERVED cells (cells with data); rook
adjacency links east/north neighbours at the same resolution, so every
unordered adjacent pair is emitted by exactly one member (its
west/south endpoint) — no dedup pass. Observed pair counts are exact
BIGINTs; expectations ship as floor-e6 through a FIXED chain of IEEE
double ops (1e6 * m * (nb/n) * ((nb-1)/(n-1))) — bit-identical in any
engine, no accumulation-order hazard, and immune to the int64 overflow
an exact-rational e6 would hit at m*nb^2 scale.

Scale shape (100 TB): marks arrive pre-aggregated (one row per observed
cell — the caller's groupBy already folded the raw stream), the
neighbour probe is a projection (cell id arithmetic on the packed
(res, ix, iy) int64 — `functions/cells.py:21`), and the single equi-join
on (grp, cell) is the only pair-forming step: fan-out is exactly the
number of adjacent observed pairs <= 2n. Census output is |groups| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aira_spark.functions.cells import COORD_MASK, IX_SHIFT, RES_SHIFT


def _parts(cell: str, engine: str) -> tuple[str, str, str]:
    """(res, ix, iy) extraction text for both engines."""
    if engine == "spark":
        return (
            f"shiftright({cell}, {RES_SHIFT})",
            f"(shiftright({cell}, {IX_SHIFT}) & {COORD_MASK})",
            f"({cell} & {COORD_MASK})",
        )
    return (
        f"({cell} >> {RES_SHIFT})",
        f"(({cell} >> {IX_SHIFT}) & {COORD_MASK})",
        f"({cell} & {COORD_MASK})",
    )


_E_FMT = (
    "CAST(CASE WHEN n_cells > 1 THEN"
    " FLOOR(1000000.0 * CAST(m_pairs AS DOUBLE)"
    " * (CAST({p} AS DOUBLE) / CAST(n_cells AS DOUBLE))"
    " * (CAST({q} AS DOUBLE) / CAST(n_cells - 1 AS DOUBLE)))"
    " ELSE 0 END AS BIGINT)"
)


def join_counts(cells: DataFrame) -> DataFrame:
    """(grp, n_cells, n_black, m_pairs, bb, bw, ww, e_bb_e6, e_bw_e6,
    e_ww_e6) from `cells` carrying one row per observed cell:
    (grp string|long, cell long, mark int 0/1)."""
    res, ix, iy = _parts("cell", "spark")
    base = cells.selectExpr(
        "grp", "cell", "CAST(mark AS BIGINT) AS mark",
        f"{ix} AS ix", f"{iy} AS iy",
        f"shiftleft(CAST(1 AS BIGINT), CAST({res} AS INT)) AS n_side",
    )
    east = base.where("ix < n_side - 1").selectExpr(
        "grp", f"cell + {1 << IX_SHIFT} AS nb_cell", "mark AS mark_a"
    )
    north = base.where("iy < n_side - 1").selectExpr(
        "grp", "cell + 1 AS nb_cell", "mark AS mark_a"
    )
    edges = east.unionByName(north).join(
        cells.selectExpr("grp", "cell AS nb_cell", "CAST(mark AS BIGINT) AS mark_b"),
        ["grp", "nb_cell"],
    )
    pair_stats = edges.groupBy("grp").agg(
        F.count("*").cast("long").alias("m_pairs"),
        F.sum(F.expr("mark_a * mark_b")).cast("long").alias("bb"),
        F.sum(F.expr("(1 - mark_a) * (1 - mark_b)")).cast("long").alias("ww"),
    )
    census = cells.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_cells"),
        F.sum(F.expr("CAST(mark AS BIGINT)")).cast("long").alias("n_black"),
    )
    return (
        census.join(pair_stats, "grp", "left")
        .selectExpr(
            "grp", "n_cells", "n_black",
            "CAST(coalesce(m_pairs, 0) AS BIGINT) AS m_pairs",
            "CAST(coalesce(bb, 0) AS BIGINT) AS bb",
            "CAST(coalesce(m_pairs - bb - ww, 0) AS BIGINT) AS bw",
            "CAST(coalesce(ww, 0) AS BIGINT) AS ww",
        )
        .selectExpr(
            "grp", "n_cells", "n_black", "m_pairs", "bb", "bw", "ww",
            _E_FMT.format(p="n_black", q="n_black - 1") + " AS e_bb_e6",
            "CAST(CASE WHEN n_cells > 1 THEN"
            " FLOOR(2000000.0 * CAST(m_pairs AS DOUBLE)"
            " * (CAST(n_black AS DOUBLE) / CAST(n_cells AS DOUBLE))"
            " * (CAST(n_cells - n_black AS DOUBLE)"
            " / CAST(n_cells - 1 AS DOUBLE))) ELSE 0 END AS BIGINT) AS e_bw_e6",
            _E_FMT.format(p="n_cells - n_black", q="n_cells - n_black - 1")
            + " AS e_ww_e6",
        )
    )


def oracle_joincount_sql(cells_sql: str) -> str:
    """DuckDB mirror over a subquery yielding (grp, cell, mark) — identical
    east/north probe emission, single equi-join, double expectation chain."""
    res, ix, iy = _parts("cell", "duck")
    e_bw = (
        "CAST(CASE WHEN n_cells > 1 THEN"
        " FLOOR(2000000.0 * CAST(m_pairs AS DOUBLE)"
        " * (CAST(n_black AS DOUBLE) / CAST(n_cells AS DOUBLE))"
        " * (CAST(n_cells - n_black AS DOUBLE)"
        " / CAST(n_cells - 1 AS DOUBLE))) ELSE 0 END AS BIGINT)"
    )
    return f"""
WITH cells AS (SELECT grp, cell, CAST(mark AS BIGINT) AS mark FROM ({cells_sql})),
base AS (
  SELECT grp, cell, mark, {ix} AS ix, {iy} AS iy,
    (CAST(1 AS BIGINT) << CAST({res} AS INTEGER)) AS n_side
  FROM cells
),
probes AS (
  SELECT grp, cell + {1 << IX_SHIFT} AS nb_cell, mark AS mark_a
  FROM base WHERE ix < n_side - 1
  UNION ALL
  SELECT grp, cell + 1 AS nb_cell, mark AS mark_a
  FROM base WHERE iy < n_side - 1
),
edges AS (
  SELECT p.grp, p.mark_a, c.mark AS mark_b
  FROM probes p JOIN cells c ON p.grp = c.grp AND p.nb_cell = c.cell
),
ps AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS m_pairs,
    CAST(SUM(mark_a * mark_b) AS BIGINT) AS bb,
    CAST(SUM((1 - mark_a) * (1 - mark_b)) AS BIGINT) AS ww
  FROM edges GROUP BY 1
),
census AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_cells,
    CAST(SUM(mark) AS BIGINT) AS n_black
  FROM cells GROUP BY 1
),
wide AS (
  SELECT c.grp, c.n_cells, c.n_black,
    CAST(COALESCE(p.m_pairs, 0) AS BIGINT) AS m_pairs,
    CAST(COALESCE(p.bb, 0) AS BIGINT) AS bb,
    CAST(COALESCE(p.m_pairs - p.bb - p.ww, 0) AS BIGINT) AS bw,
    CAST(COALESCE(p.ww, 0) AS BIGINT) AS ww
  FROM census c LEFT JOIN ps p ON c.grp = p.grp
)
SELECT grp, n_cells, n_black, m_pairs, bb, bw, ww,
  {_E_FMT.format(p="n_black", q="n_black - 1")} AS e_bb_e6,
  {e_bw} AS e_bw_e6,
  {_E_FMT.format(p="n_cells - n_black", q="n_cells - n_black - 1")} AS e_ww_e6
FROM wide
"""
