"""Morton-range query decomposition — the payoff of the Z-order layout
(functions/cells.py:morton_key, sources/images.py:write_images_zordered):
a 2-D bbox predicate rewritten as a UNION OF 1-D KEY RANGES, which is what
lets a Z-ordered table answer spatial queries through plain parquet
row-group min/max pruning with zero spatial code at scan time.

Decomposition is the standard quadtree recursion (metadata-sized, done
once on the driver exactly like quantile boundaries / k-means centroid
literals): an aligned block fully inside the bbox contributes one
contiguous range [morton(block origin), +4^k); partial blocks split into
their four children; cells at the leaf level contribute unit ranges. The
ranges are BAKED AS LITERAL predicates into both engines' scans, so the
audit (points counted via ranges == points counted via the raw x/y bbox)
is bit-checkable and the range count measures the decomposition's
fragmentation (the perimeter bound: O(2^res) ranges for any bbox)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import SPAN_X, SPAN_Y, X0, Y0, morton_from_xy


def _interleave(ix: int, iy: int, res: int) -> int:
    # bit order MUST match functions/cells.py morton_key: ix at even bits,
    # iy at odd bits
    m = 0
    for b in range(res):
        m |= ((ix >> b) & 1) << (2 * b)
        m |= ((iy >> b) & 1) << (2 * b + 1)
    return m


def bbox_cell_span(
    x0: float, y0: float, x1: float, y1: float, res: int
) -> tuple[int, int, int, int]:
    n = 1 << res
    def cx(x):
        return min(max(int((x - X0) / SPAN_X * n), 0), n - 1)
    def cy(y):
        return min(max(int((y - Y0) / SPAN_Y * n), 0), n - 1)
    return cx(x0), cy(y0), cx(x1), cy(y1)


def morton_ranges(
    ix0: int, iy0: int, ix1: int, iy1: int, res: int
) -> list[tuple[int, int]]:
    """Sorted disjoint [lo, hi) morton ranges covering exactly the cell
    rectangle, via aligned-quadtree-block recursion."""
    out: list[tuple[int, int]] = []

    def rec(bx: int, by: int, k: int) -> None:
        size = 1 << k
        if bx > ix1 or by > iy1 or bx + size - 1 < ix0 or by + size - 1 < iy0:
            return
        if bx >= ix0 and by >= iy0 and bx + size - 1 <= ix1 and by + size - 1 <= iy1:
            lo = _interleave(bx, by, res)
            out.append((lo, lo + (1 << (2 * k))))
            return
        h = size // 2
        for dx in (0, h):
            for dy in (0, h):
                rec(bx + dx, by + dy, k - 1)

    rec(0, 0, res)
    out.sort()
    # merge adjacent ranges (quadtree siblings often abut in morton order)
    merged: list[tuple[int, int]] = []
    for lo, hi in out:
        if merged and merged[-1][1] == lo:
            merged[-1] = (merged[-1][0], hi)
        else:
            merged.append((lo, hi))
    return merged


def range_predicate_sql(ranges: list[tuple[int, int]], key: str) -> str:
    return " OR ".join(f"({key} >= {lo} AND {key} < {hi})" for lo, hi in ranges)


def morton_range_audit(
    points: DataFrame,
    bbox: tuple[float, float, float, float],
    res: int,
) -> DataFrame:
    """One row (n_ranges, n_pts_ranges, n_pts_bbox): the Z-order range scan
    must count exactly the cell-snapped bbox population. `points` carries
    (x, y) doubles."""
    x0, y0, x1, y1 = bbox
    span = bbox_cell_span(x0, y0, x1, y1, res)
    ranges = morton_ranges(*span, res)
    keyed = points.withColumn(
        "mkey", morton_from_xy(F.col("x"), F.col("y"), res)
    )
    n_ranges = len(ranges)
    # broadcast range JOIN, not a literal OR chain: a 64+-arm OR inside the
    # count's hash agg blows past whole-stage codegen's method-size limit
    # (observed janino compile failure -> interpreted fallback); the
    # broadcast non-equi join is the plan a range index produces anyway
    rdf = points.sparkSession.createDataFrame(
        list(ranges), "lo long, hi long"
    )
    by_range = keyed.join(
        F.broadcast(rdf),
        (F.col("mkey") >= F.col("lo")) & (F.col("mkey") < F.col("hi")),
    ).count()
    # the exact cell-snapped bbox: compare at CELL granularity (the ranges
    # cover whole cells, so the direct predicate snaps the same way)
    n = 1 << res
    ix = f"CAST(LEAST(GREATEST(FLOOR((x - {X0}) / {SPAN_X} * {float(n)}), 0), {n - 1}) AS BIGINT)"
    iy = f"CAST(LEAST(GREATEST(FLOOR((y - {Y0}) / {SPAN_Y} * {float(n)}), 0), {n - 1}) AS BIGINT)"
    ix0, iy0, ix1, iy1 = span
    by_bbox = points.where(
        F.expr(
            f"{ix} BETWEEN {ix0} AND {ix1} AND {iy} BETWEEN {iy0} AND {iy1}"
        )
    ).count()
    return points.sparkSession.createDataFrame(
        [(n_ranges, by_range, by_bbox)],
        "n_ranges long, n_pts_ranges long, n_pts_bbox long",
    )


def oracle_morton_sql(
    points_sql: str, bbox: tuple[float, float, float, float], res: int
) -> str:
    """DuckDB mirror: the same literal ranges over an SQL-computed morton
    key (explicit bit interleave), plus the direct cell-snapped count."""
    x0, y0, x1, y1 = bbox
    span = bbox_cell_span(x0, y0, x1, y1, res)
    ranges = morton_ranges(*span, res)
    n = 1 << res
    ix = f"CAST(LEAST(GREATEST(FLOOR((x - {X0}) / {SPAN_X} * {float(n)}), 0), {n - 1}) AS BIGINT)"
    iy = f"CAST(LEAST(GREATEST(FLOOR((y - {Y0}) / {SPAN_Y} * {float(n)}), 0), {n - 1}) AS BIGINT)"
    interleave = " + ".join(
        f"(((ix >> {b}) & 1) << {2 * b}) + (((iy >> {b}) & 1) << {2 * b + 1})"
        for b in range(res)
    )
    ix0, iy0, ix1, iy1 = span
    return f"""
WITH p AS ({points_sql}),
keyed AS (SELECT *, {ix} AS ix, {iy} AS iy FROM p),
mk AS (SELECT *, {interleave} AS mkey FROM keyed)
SELECT CAST({len(ranges)} AS BIGINT) AS n_ranges,
  CAST((SELECT COUNT(*) FROM mk WHERE {range_predicate_sql(ranges, "mkey")})
       AS BIGINT) AS n_pts_ranges,
  CAST((SELECT COUNT(*) FROM mk
        WHERE ix BETWEEN {ix0} AND {ix1} AND iy BETWEEN {iy0} AND {iy1})
       AS BIGINT) AS n_pts_bbox
"""
