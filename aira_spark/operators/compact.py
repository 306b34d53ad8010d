"""Cell-cover compaction (H3 compact/uncompact analog for the quadtree grid).

A cover produced at a fine resolution wastes space and broadcast budget when
large contiguous areas are covered: every fully-covered parent can be
replaced by one cell a level up. `compact_cover` performs the standard
bottom-up compaction — any parent whose 4 children are all present replaces
them, repeated level by level — and `expand_cover` is the exact inverse.

Scale shape: each level is one hash aggregation on the parent id plus one
anti-join, both over CELL IDS ONLY (no geometry, no payload); the level
count is bounded by (from_res - min_res) <= 29, so the whole compaction is a
handful of metadata-light shuffles. At 10^12 images the cover table this
runs on is already the distinct cell set — orders of magnitude smaller than
the input — and a compacted cover shrinks the broadcast side of every
downstream PIP/zonal join (the reason H3 ships compact() as a core op).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import IX_SHIFT, RES_SHIFT, cell_parent


def compact_cover(cells: DataFrame, from_res: int, min_res: int) -> DataFrame:
    """(cell, res): minimal mixed-resolution cover equivalent to the input.

    `cells` must carry a `cell` column wholly at resolution `from_res`
    (duplicates allowed — compaction works on the distinct set). Cells are
    promoted to their parent wherever all 4 children are present, repeated
    down to `min_res`."""
    if not (0 <= min_res <= from_res):
        raise ValueError(f"invalid resolution range {from_res}->{min_res}")
    cur = cells.select(F.col("cell").cast("long").alias("cell")).distinct()
    levels: list[DataFrame] = []
    for r in range(from_res, min_res, -1):
        # each level references `cur` twice (the count==4 promote and the
        # anti-join keep) and the returned union embeds every level's plan,
        # so without truncation the cover's lineage is recomputed 2^levels
        # times in one action. The level frame is the distinct CELL SET
        # (metadata-sized next to the raster), so an eager localCheckpoint
        # per level is cheap and keeps every downstream reference a scan.
        cur = cur.localCheckpoint(eager=True)
        tagged = cur.withColumn("parent", cell_parent(F.col("cell")))
        full = (
            tagged.groupBy("parent").count()
            .filter(F.col("count") == 4)
            .select("parent")
        )
        keep = tagged.join(full, "parent", "left_anti").select("cell")
        levels.append(keep.withColumn("res", F.lit(r).cast("long")))
        cur = full.select(F.col("parent").alias("cell"))
    levels.append(cur.withColumn("res", F.lit(min_res).cast("long")))
    return reduce(lambda a, b: a.unionByName(b), levels)


def expand_cover(compacted: DataFrame, to_res: int) -> DataFrame:
    """Inverse of compact_cover: every (cell, res) row explodes into its
    4^(to_res - res) descendants at `to_res`. Pure JVM SQL (sequence +
    explode over integer child offsets).

    The input must be a true compacted cover (rows disjoint — each fine cell
    descends from exactly one row, which compact_cover guarantees): the
    expansion is emitted as-is with NO dedup, because a distinct() here
    would shuffle the fully-expanded fine-res set — the largest dataset in
    the operator — to remove duplicates that cannot exist."""
    ix = f"((cell div {1 << IX_SHIFT}) % {1 << (RES_SHIFT - IX_SHIFT)})"
    iy = f"(cell % {1 << IX_SHIFT})"
    t = compacted.selectExpr(
        "cell",
        f"shiftleft(CAST(1 AS BIGINT), CAST({to_res} - res AS INT)) AS n",
    ).selectExpr(
        f"CAST({to_res << RES_SHIFT} AS BIGINT) "
        f"+ {ix} * n * {1 << IX_SHIFT} + {iy} * n AS base",
        "n",
    )
    # sequence(0, n*n - 1) enumerates the child square in row-major order;
    # dx = j div n (integer div — exact), dy = j % n
    return (
        t.select(
            F.explode(F.expr("sequence(0, n * n - 1)")).alias("j"), "base", "n"
        )
        .selectExpr(f"base + (j div n) * {1 << IX_SHIFT} + (j % n) AS cell")
    )


def duck_parent_sql(cell_expr: str, res: int) -> str:
    """DuckDB integer expression for the parent of a cell KNOWN to be at
    resolution `res` — the oracle-side mirror of cells.cell_parent (same
    packed layout: cell = res<<58 | ix<<29 | iy; all ops stay in BIGINT)."""
    ix = f"((({cell_expr}) // {1 << IX_SHIFT}) % {1 << (RES_SHIFT - IX_SHIFT)})"
    iy = f"(({cell_expr}) % {1 << IX_SHIFT})"
    return (
        f"({(res - 1) << RES_SHIFT} + ({ix} // 2) * {1 << IX_SHIFT} + ({iy} // 2))"
    )


def compact_levels_sql(from_res: int, min_res: int) -> tuple[str, str]:
    """(level_ctes, final_select) for the DuckDB oracle of compact_cover.

    The caller's WITH chain must already define a CTE `l{from_res}` with one
    column `cell` (the distinct fine-res cover); one CTE pair per level then
    mirrors the promote/keep split of the Spark loop exactly."""
    parts = []
    outs = []
    for r in range(from_res, min_res, -1):
        p = duck_parent_sql("cell", r)
        parts.append(
            f"f{r} AS (SELECT {p} AS cell FROM l{r} GROUP BY 1 HAVING COUNT(*) = 4)"
        )
        parts.append(
            f"k{r} AS (SELECT cell FROM l{r} WHERE {p} NOT IN (SELECT cell FROM f{r}))"
        )
        parts.append(f"l{r - 1} AS (SELECT cell FROM f{r})")
        outs.append(f"SELECT cell, CAST({r} AS BIGINT) AS res FROM k{r}")
    outs.append(f"SELECT cell, CAST({min_res} AS BIGINT) AS res FROM l{min_res}")
    return ",\n".join(parts), "\nUNION ALL ".join(outs)


def compact_cover_grouped(
    cells: DataFrame, from_res: int, min_res: int, grp: str = "grp"
) -> DataFrame:
    """(grp, cell, res): compact_cover with the promote/keep split computed
    independently per group — the primitive behind dissolve (union-by-
    attribute): each group's merged cover compacts on its own, one hash agg
    + one anti-join per level over (grp, cell id) rows only."""
    if not (0 <= min_res <= from_res):
        raise ValueError(f"invalid resolution range {from_res}->{min_res}")
    cur = cells.selectExpr(f"{grp} AS grp", "CAST(cell AS BIGINT) AS cell").distinct()
    levels: list[DataFrame] = []
    for r in range(from_res, min_res, -1):
        cur = cur.localCheckpoint(eager=True)  # same 2^levels-lineage guard
        tagged = cur.withColumn("parent", cell_parent(F.col("cell")))
        full = (
            tagged.groupBy("grp", "parent").count()
            .filter(F.col("count") == 4)
            .select("grp", "parent")
        )
        keep = tagged.join(full, ["grp", "parent"], "left_anti").select("grp", "cell")
        levels.append(keep.withColumn("res", F.lit(r).cast("long")))
        cur = full.select("grp", F.col("parent").alias("cell"))
    levels.append(cur.withColumn("res", F.lit(min_res).cast("long")))
    return reduce(lambda a, b: a.unionByName(b), levels)


def compact_levels_sql_grouped(from_res: int, min_res: int) -> tuple[str, str]:
    """Grouped DuckDB mirror: the caller defines CTE `l{from_res}` with
    columns (grp, cell); NOT EXISTS replaces the anti-join per level."""
    parts = []
    outs = []
    for r in range(from_res, min_res, -1):
        p = duck_parent_sql("cell", r)
        # inside the NOT EXISTS subquery an unqualified `cell` binds to the
        # INNER table (f) — the parent must be computed from t.cell
        pt = duck_parent_sql("t.cell", r)
        parts.append(
            f"f{r} AS (SELECT grp, {p} AS cell FROM l{r} "
            f"GROUP BY 1, 2 HAVING COUNT(*) = 4)"
        )
        parts.append(
            f"k{r} AS (SELECT grp, cell FROM l{r} t WHERE NOT EXISTS "
            f"(SELECT 1 FROM f{r} f WHERE f.grp = t.grp AND f.cell = {pt}))"
        )
        parts.append(f"l{r - 1} AS (SELECT grp, cell FROM f{r})")
        outs.append(f"SELECT grp, cell, CAST({r} AS BIGINT) AS res FROM k{r}")
    outs.append(
        f"SELECT grp, cell, CAST({min_res} AS BIGINT) AS res FROM l{min_res}"
    )
    return ",\n".join(parts), "\nUNION ALL ".join(outs)
