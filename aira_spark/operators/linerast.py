"""Trajectory/segment rasterization — every grid cell a hop's line
segment passes through, with per-cell segment and user counts: the
road-usage / corridor-load heatmap (the vector→raster primitive for
LINES, completing the family next to `rasterize.py`'s polygon fill and
`focal.point_density`'s point scatter).

Supercover by exact column sweep (the integer form of Amanatides-Woo
1987 grid traversal, unrolled into set ops): normalize each segment so
ax <= bx, explode its column range [ax DIV C, bx DIV C], clamp the
segment's x-interval to each column, evaluate y at both clamped ends as
the EXACT RATIONAL  y(x) = (ay*dx + (by-ay)*(x-ax)) / dx  kept as an
integer floor over C*dx (coords live in [0, 1e5) so every term is
nonneg — trunc == floor in both engines), and emit the iy span (linear
=> monotone within a column, so the two ends bound it). Cells touched
at exact gridline crossings land in BOTH adjacent columns; the
(seg, cell) DISTINCT collapses them and makes the closed-cell semantics
deterministic. Vertical segments (dx = 0) take the ay/by span directly
via the same CASE text.

Exactness: no floats anywhere; overflow bound ay*dx <= 1e10 and
C*dx <= C*1e5 — both tiny against int64.

Scale shape (100 TB): fan-out per segment is (|dx|+|dy|)/C + 2 —
GEOMETRY-bounded by the box size over the cell size (<= ~42 cells at
C = 5000 in the 1e5 box), never data-bounded; the explode is a pure
per-row map (no join), and ONE distinct + ONE hash agg (both keyed on
(cell) after (seg, cell) dedup) end it. Skewed corridors concentrate
counts, not rows: the distinct's map-side combine bounds any cell's
exchange payload at one row per task."""

from __future__ import annotations

from pyspark.sql import DataFrame

CELL = 5_000  # grid cell size in quantized units -> 20 x 20 grid


def _exprs(div: str, cell: int) -> dict[str, str]:
    """Shared expression texts; `div` is the engine's integer floor-div
    operator (all operands nonneg here, so DIV and // agree)."""
    y_at = (
        "CASE WHEN bx = ax THEN {yv} {div} {C} "
        "ELSE (ay * (bx - ax) + (by - ay) * ({x} - ax)) "
        "{div} ({C} * (bx - ax)) END"
    )
    return {
        "ax": "CASE WHEN axq <= bxq THEN axq ELSE bxq END",
        "ay": "CASE WHEN axq <= bxq THEN ayq ELSE byq END",
        "bx": "CASE WHEN axq <= bxq THEN bxq ELSE axq END",
        "by": "CASE WHEN axq <= bxq THEN byq ELSE ayq END",
        "xs": f"GREATEST(ax, ix * {cell})",
        "xe": f"LEAST(bx, (ix + 1) * {cell})",
        "iys": y_at.format(yv="ay", x="xs", div=div, C=cell),
        "iye": y_at.format(yv="by", x="xe", div=div, C=cell),
    }


def track_raster(segments: DataFrame, cell: int = CELL) -> DataFrame:
    """(gx, gy, n_segs, n_users) from segments carrying
    (seg_id, user_id, axq, ayq, bxq, byq) with coords in [0, 1e5)."""
    from pyspark.sql import functions as F

    e = _exprs("div", cell)
    norm = segments.selectExpr(
        "seg_id", "user_id",
        f"{e['ax']} AS ax", f"{e['ay']} AS ay",
        f"{e['bx']} AS bx", f"{e['by']} AS by",
    )
    cols = norm.selectExpr(
        "seg_id", "user_id", "ax", "ay", "bx", "by",
        f"explode(sequence(ax div {cell}, bx div {cell})) AS ix",
    ).selectExpr(
        "seg_id", "user_id", "ax", "ay", "bx", "by", "ix",
        f"{e['xs']} AS xs", f"{e['xe']} AS xe",
    ).selectExpr(
        "seg_id", "user_id", "ix",
        f"{e['iys']} AS iys", f"{e['iye']} AS iye",
    )
    cells = cols.selectExpr(
        "seg_id", "user_id", "ix",
        "explode(sequence(LEAST(iys, iye), GREATEST(iys, iye))) AS iy",
    ).select("seg_id", "user_id", "ix", "iy").distinct()
    return (
        cells.groupBy("ix", "iy")
        .agg(
            F.count("*").cast("long").alias("n_segs"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .selectExpr(
            "CAST(ix AS BIGINT) AS gx", "CAST(iy AS BIGINT) AS gy",
            "n_segs", "n_users",
        )
    )


def oracle_track_raster_sql(segments_sql: str, cell: int = CELL) -> str:
    """DuckDB mirror over a subquery yielding (seg_id, user_id, axq, ayq,
    bxq, byq): identical normalization, column sweep and iy spans via
    generate_series."""
    e = _exprs("//", cell)
    return f"""
WITH segs AS ({segments_sql}),
norm AS (
  SELECT seg_id, user_id,
    {e['ax']} AS ax, {e['ay']} AS ay, {e['bx']} AS bx, {e['by']} AS by
  FROM segs
),
cols AS (
  SELECT n.seg_id, n.user_id, n.ax, n.ay, n.bx, n.by, g.ix
  FROM norm n,
    LATERAL (SELECT UNNEST(generate_series(n.ax // {cell},
                                           n.bx // {cell})) AS ix) g
),
spans AS (
  SELECT seg_id, user_id, ix, {e['iys']} AS iys, {e['iye']} AS iye
  FROM (SELECT seg_id, user_id, ax, ay, bx, by, ix,
          {e['xs']} AS xs, {e['xe']} AS xe FROM cols)
),
cells AS (
  SELECT DISTINCT s.seg_id, s.user_id, s.ix, g.iy
  FROM spans s,
    LATERAL (SELECT UNNEST(generate_series(LEAST(s.iys, s.iye),
                                           GREATEST(s.iys, s.iye))) AS iy) g
)
SELECT CAST(ix AS BIGINT) AS gx, CAST(iy AS BIGINT) AS gy,
  CAST(COUNT(*) AS BIGINT) AS n_segs,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM cells GROUP BY 1, 2
"""
