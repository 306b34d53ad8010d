"""Grid-DBSCAN tests: hand-built clusters, core/border/noise roles,
diagonal connectivity, determinism across partitionings."""

from __future__ import annotations

from aira_spark.operators.dbscan import grid_dbscan

RES = 4  # 16x16 grid; cell size 22.5 x 11.25 degrees


def _cxy(gx, gy):
    """world coords at the center of grid cell (gx, gy) at RES."""
    return (-180 + (gx + 0.5) * 360 / 16, -90 + (gy + 0.5) * 180 / 16)


def _pts(spark, cells):
    rows = []
    for i, (gx, gy, n) in enumerate(cells):
        x, y = _cxy(gx, gy)
        rows.extend((i * 100 + j, x, y) for j in range(n))
    return spark.createDataFrame(rows, "point_id long, x double, y double")


def _run(spark, cells, min_pts):
    out = grid_dbscan(_pts(spark, cells), res=RES, min_pts=min_pts)
    return {(r["gx"], r["gy"]): (r["n_pts"], r["role"], r["cluster"])
            for r in out.collect()}


def test_roles_and_single_cluster(spark):
    # dense blob (4,4)=3 and (5,4)=3 pts; lone cell (10, 10)=1 pt
    got = _run(spark, [(4, 4, 3), (5, 4, 3), (10, 10, 1)], min_pts=5)
    # both blob cells see nbh=6 >= 5 -> core, one cluster
    assert got[(4, 4)][1] == "core" and got[(5, 4)][1] == "core"
    assert got[(4, 4)][2] == got[(5, 4)][2]
    # the lone cell: nbh=1 -> not core, no core neighbor -> noise
    assert got[(10, 10)] == (1, "noise", -1)


def test_border_takes_adjacent_core_cluster(spark):
    # (4,4)=12 pts, (5,5)=1, (6,6)=1 with min_pts=13:
    #  (4,4) nbh = 12+1 = 13  -> core
    #  (5,5) nbh = 12+1+1 = 14 -> core (same component, 8-adjacent)
    #  (6,6) nbh = 1+1 = 2     -> rest; adjacent to core (5,5) -> border
    got = _run(spark, [(4, 4, 12), (5, 5, 1), (6, 6, 1)], min_pts=13)
    assert got[(4, 4)][1] == "core"
    assert got[(5, 5)][1] == "core"
    assert got[(4, 4)][2] == got[(5, 5)][2]
    assert got[(6, 6)][1] == "border"
    assert got[(6, 6)][2] == got[(5, 5)][2]
    # non-adjacent singleton (distance 2 from the blob): noise
    got = _run(spark, [(4, 4, 10), (6, 4, 1)], min_pts=10)
    assert got[(6, 4)] == (1, "noise", -1)


def test_diagonal_cores_connect(spark):
    got = _run(spark, [(4, 4, 6), (5, 5, 6)], min_pts=6)
    assert got[(4, 4)][1] == "core" and got[(5, 5)][1] == "core"
    assert got[(4, 4)][2] == got[(5, 5)][2]  # 8-adjacency joins them


def test_two_separate_clusters(spark):
    got = _run(spark, [(2, 2, 6), (12, 12, 6)], min_pts=5)
    assert got[(2, 2)][1] == "core" and got[(12, 12)][1] == "core"
    assert got[(2, 2)][2] != got[(12, 12)][2]


def test_partitioning_invariance(spark):
    cells = [(2, 2, 6), (3, 2, 2), (12, 12, 6), (13, 13, 6), (8, 1, 1)]
    pts = _pts(spark, cells)
    a = sorted(map(tuple, grid_dbscan(pts.coalesce(1), RES, 5).collect()))
    b = sorted(map(tuple, grid_dbscan(pts.repartition(8), RES, 5).collect()))
    assert a == b
