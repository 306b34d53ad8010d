"""Round-4 closing additions: weighted SSSP, interval-overlap join,
per-source quota — hand-case + brute-force mirrors + plan shapes."""

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------ sssp


def _edges_df(spark, triples):
    return spark.createDataFrame(
        [(int(s), int(d), int(w)) for s, d, w in triples],
        "src long, dst long, w long",
    )


def test_sssp_weighted_beats_hop_path(spark):
    """A 3-hop cheap path must beat the 1-hop expensive edge — pins that
    sssp is weighted, not BFS."""
    from aira_spark.operators.graph import sssp_fixed

    edges = _edges_df(
        spark,
        [(0, 3, 10), (0, 1, 1), (1, 2, 1), (2, 3, 1)],
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in sssp_fixed(edges, seeds, rounds=6).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_sssp_matches_numpy_bellman_ford(spark):
    """Fixed-round state == a literal numpy Bellman-Ford after the same
    number of relaxations, on a deterministic pseudo-random digraph."""
    from aira_spark.operators.graph import sssp_fixed

    n = 40
    triples = []
    for u in range(n):
        for j in range(3):
            v = (u * 7 + j * 13 + 5) % n
            if v != u:
                triples.append((u, v, (u * 3 + v) % 6 + 1))
    seeds_py = [0, 17]
    rounds = 5

    INF = float("inf")
    dist = {u: INF for u in range(n)}
    for s in seeds_py:
        dist[s] = 0
    for _ in range(rounds):
        nxt = dict(dist)
        for u, v, w in triples:
            if dist[u] + w < nxt[v]:
                nxt[v] = dist[u] + w
        dist = nxt
    want = {u: int(d) for u, d in dist.items() if d < INF}

    edges = _edges_df(spark, triples)
    seeds = spark.createDataFrame([(s,) for s in seeds_py], "node long")
    got = {
        r["node"]: r["dist"]
        for r in sssp_fixed(edges, seeds, rounds=rounds).collect()
    }
    assert got == want


def test_sssp_converged_on_hand_graph(spark):
    """rounds=6 == rounds=9 on the small graph (fixpoint reached) — the
    bench/oracle round count is not truncating real distances there."""
    from aira_spark.operators.graph import sssp_fixed

    edges = _edges_df(
        spark,
        [(i, (i + 1) % 8, 2) for i in range(8)] + [(3, 6, 1)],
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    a = {r["node"]: r["dist"] for r in sssp_fixed(edges, seeds, rounds=6).collect()}
    b = {r["node"]: r["dist"] for r in sssp_fixed(edges, seeds, rounds=9).collect()}
    assert a == b


# ------------------------------------------------------- interval_overlap


def _ev(spark, rows):
    return spark.createDataFrame(
        [(int(u), t) for u, t in rows], "user_id long, ts string"
    ).select("user_id", F.to_timestamp("ts").alias("ts"))


def test_interval_overlap_hand_case(spark):
    from aira_spark.operators.interval import interval_overlap

    # user 1: span 09:30..11:10 on day D; user 2: one event at 10:05.
    # three busy hours by construction: 10:00 (3 events), 09:00 (1), 11:00 (1)
    ev = _ev(
        spark,
        [
            (1, "2024-03-01 09:30:00"),
            (1, "2024-03-01 10:20:00"),
            (1, "2024-03-01 11:10:00"),
            (2, "2024-03-01 10:05:00"),
            (2, "2024-03-01 10:59:59"),
        ],
    )
    got = {
        (r["user_id"], r["hr"]): (r["overlap_s"], r["n_events"])
        for r in interval_overlap(ev, top_k=2).collect()
    }
    # top-2 busy hours: the 10:00 hour (3 events) then the 09:00 hour (1
    # event, earliest of the tied singles). user 1 overlaps both; user 2
    # only the 10:00 hour.
    assert len(got) == 3
    counts = sorted(n for (_, n) in got.values())
    assert counts == [1, 3, 3]
    # user 1's overlap with the busy 10:00 hour is the full hour;
    # user 2's is 10:05:00..10:59:59 = 3300 s
    full_hour = [v for (u, _), (v, n) in got.items() if u == 1 and n == 3]
    assert full_hour == [3600]
    u2 = [v for (u, _), (v, n) in got.items() if u == 2 and n == 3]
    assert u2 == [3300]


def test_interval_overlap_brute_force_real(spark, sf_dir):
    """Spark result == a python brute force over the real events slice."""
    from aira_spark.operators.interval import interval_overlap

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts")
        .filter(F.col("user_id") % 17 == 0)
    )
    rows = ev.select(
        F.col("user_id").cast("long").alias("u"),
        F.unix_timestamp("ts").cast("long").alias("t"),
    ).collect()
    spans, hours = {}, {}
    for r in rows:
        key = (r["u"], r["t"] // 86400)
        t0, t1 = spans.get(key, (r["t"], r["t"]))
        spans[key] = (min(t0, r["t"]), max(t1, r["t"]))
        hours[r["t"] // 3600] = hours.get(r["t"] // 3600, 0) + 1
    busy = sorted(hours.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    want = set()
    for (u, day), (t0, t1) in spans.items():
        for hr, n in busy:
            lo, hi = max(t0, hr * 3600), min(t1, hr * 3600 + 3599)
            if lo <= hi:
                want.add((u, day, hr, n, hi - lo + 1))
    got = {
        (r["user_id"], r["day"], r["hr"], r["n_events"], r["overlap_s"])
        for r in interval_overlap(ev, top_k=10).collect()
    }
    assert got == want


def test_interval_overlap_plan_broadcasts_busy(spark, sf_dir):
    from aira_spark.operators.interval import interval_overlap

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts"
    )
    plan = interval_overlap(ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ----------------------------------------------------------- source_quota


def test_source_quota_matches_plain_window(spark, sf_dir):
    """Salted two-phase == single-phase row_number (survivor preservation)."""
    from pyspark.sql import Window

    from aira_spark.operators.curation import source_quota

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r["doc_id"], r["source"], r["rk"], r["n_chars"])
        for r in source_quota(docs, cap=7, n_salt=4).collect()
    }
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    want = {
        (r["doc_id"], r["source"], r["rk"], r["n_chars"])
        for r in docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
        )
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 7)
        .collect()
    }
    assert got == want


def test_source_quota_cap_respected(spark, sf_dir):
    from aira_spark.operators.curation import source_quota

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per = (
        source_quota(docs, cap=5)
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.max("rk").alias("mx"))
        .collect()
    )
    assert per and all(r["n"] <= 5 and r["mx"] <= 5 for r in per)


# ------------------------------------------------------------- line_dedup


def test_line_dedup_hand_case(spark):
    """First occurrence wins in (doc_id, seg_idx) order; later copies drop;
    docs reassemble in original segment order; a fully-duplicated doc
    comes back as the empty string."""
    from aira_spark.operators.lines import line_dedup

    seg_a = " ".join(["a"] * 3)
    seg_b = " ".join(["b"] * 3)
    seg_c = " ".join(["c"] * 3)
    docs = spark.createDataFrame(
        [
            (1, f"{seg_a} {seg_b}"),        # both novel
            (2, f"{seg_b} {seg_c}"),        # b is a repeat, c novel
            (3, f"{seg_a} {seg_b}"),        # fully duplicated
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_segs"], r["n_kept"], r["clean_text"])
        for r in line_dedup(docs, seg_words=3).collect()
    }
    assert got == {
        1: (2, 2, f"{seg_a} {seg_b}"),
        2: (2, 1, seg_c),
        3: (2, 0, ""),
    }


def test_line_dedup_ragged_tail_and_within_doc_repeat(spark):
    """A trailing sub-width segment still participates; a repeat WITHIN
    one doc keeps only the earlier position."""
    from aira_spark.operators.lines import line_dedup

    docs = spark.createDataFrame(
        [(7, "x x x x x x y")],  # segs (w=3): 'x x x', 'x x x', 'y'
        "doc_id long, text string",
    )
    (row,) = line_dedup(docs, seg_words=3).collect()
    assert (row["n_segs"], row["n_kept"]) == (3, 2)
    assert row["clean_text"] == "x x x y"


# --------------------------------------------------------- hilbert_layout


def test_hilbert_curve_property():
    """Bijection + unit-step adjacency over the full grid — the defining
    Hilbert property (Z-order fails adjacency at every quadrant seam)."""
    import numpy as np

    from aira_spark.functions.cells import np_hilbert_key

    res = 5
    n = 1 << res
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    k = np_hilbert_key(xs.ravel(), ys.ravel(), res)
    assert sorted(k.tolist()) == list(range(n * n))
    order = np.argsort(k)
    px, py = xs.ravel()[order], ys.ravel()[order]
    steps = np.abs(np.diff(px)) + np.abs(np.diff(py))
    assert (steps == 1).all()


def test_hilbert_locality_beats_morton():
    """The layout payoff, quantified with the RIGHT metric (Moon et al.,
    clustering properties of the Hilbert curve): the number of contiguous
    key runs a bbox query decomposes into — each run is one range scan.
    Hilbert must need fewer runs than Morton summed over the test rects.
    (Mean |Δkey| between adjacent cells is NOT the metric: Morton wins
    that one trivially because x-steps at even x cost exactly +1.)"""
    import numpy as np

    from aira_spark.functions.cells import np_hilbert_key, np_morton_key

    res = 5

    def runs(keyf):
        tot = 0
        for x0, y0, x1, y1 in [
            (2, 3, 9, 12),
            (0, 0, 15, 15),
            (5, 5, 20, 9),
            (10, 2, 29, 29),
            (7, 19, 12, 31),
        ]:
            xs, ys = np.meshgrid(
                np.arange(x0, x1 + 1), np.arange(y0, y1 + 1), indexing="ij"
            )
            k = np.sort(keyf(xs.ravel(), ys.ravel()))
            tot += 1 + int((np.diff(k) > 1).sum())
        return tot

    h = runs(lambda x, y: np_hilbert_key(x, y, res))
    m = runs(
        lambda x, y: np.array(
            [np_morton_key(int(a), int(b), res) for a, b in zip(x, y)]
        )
    )
    assert h < m


def test_hilbert_layout_spark_matches_numpy(spark, sf_dir):
    import numpy as np

    from aira_spark.functions.cells import np_hilbert_key
    from aira_spark.operators.hilbert import hilbert_layout
    from aira_spark.sources.vectors import points_table

    rows = hilbert_layout(points_table(spark, sf_dir), res=6).collect()
    ix = np.array([r["ix"] for r in rows])
    iy = np.array([r["iy"] for r in rows])
    want = np_hilbert_key(ix, iy, 6)
    got = np.array([r["hkey"] for r in rows])
    assert (got == want).all()


def test_hilbert_layout_zero_shuffles(spark, sf_dir):
    from aira_spark.operators.hilbert import hilbert_layout
    from aira_spark.sources.vectors import points_table

    plan = (
        hilbert_layout(points_table(spark, sf_dir))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ------------------------------------------------------ streaming_sliding


def test_streaming_sliding_equals_batch(spark, sf_dir):
    """Final sliding-window state across microbatches == the one-shot
    batch computation (additive counts/sums), and the 2h/1h overlap puts
    every event in exactly two windows (count conservation x2)."""
    from aira_spark.streaming.events import run_streaming_sliding

    got = run_streaming_sliding(spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    want = (
        ev.groupBy(F.window("ts", "2 hours", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.expr("CAST(FLOOR(value * 100.0) AS BIGINT)")).alias(
                "value_cents"
            ),
        )
        .select(
            "event_type",
            F.unix_micros(F.col("window.start")).alias("win_start_us"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("value_cents").cast("long").alias("value_cents"),
        )
    )
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w
    total = sum(r[2] for r in g)
    assert total == 2 * ev.count()


# ------------------------------------------------------------ convex_hulls


def _hull_brute(pts):
    """Independent maximal-edge hull (ids of vertices) over distinct-coord
    points [(x, y, id)] — O(n^3), mirrors neither the chain nor the SQL."""
    if len(pts) <= 2:
        return {p[2] for p in pts}
    verts = set()
    for i, a in enumerate(pts):
        for b in pts[i + 1:]:
            mn = mx = 0
            bad = False
            for c in pts:
                if c is a or c is b:
                    continue
                cr = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
                mn, mx = min(mn, cr), max(mx, cr)
                if cr == 0 and not (
                    (c[0] - a[0]) * (c[0] - b[0]) + (c[1] - a[1]) * (c[1] - b[1]) < 0
                ):
                    bad = True
            if not bad and (mn >= 0 or mx <= 0):
                verts.add(a[2])
                verts.add(b[2])
    return verts


def test_convex_hull_hand_cases(spark):
    """Square + interior point + collinear edge midpoint: vertices are the
    4 corners only. Fully-collinear cluster: the two extremes. Pairs and
    singletons are their own hulls."""
    from aira_spark.operators.hull import convex_hulls

    # coordinates inside one res-4 cell (cells are 22.5 x 11.25 deg)
    rows = [
        # square cluster around (1, 1)
        (1, 1.0, 1.0), (2, 2.0, 1.0), (3, 2.0, 2.0), (4, 1.0, 2.0),
        (5, 1.5, 1.5),            # interior
        (6, 1.5, 1.0),            # collinear on the bottom edge
    ]
    pts = spark.createDataFrame(rows, "point_id long, x double, y double")
    got = {
        r["point_id"] for r in convex_hulls(pts, res=4).collect()
    }
    assert got == {1, 2, 3, 4}

    collinear = spark.createDataFrame(
        [(11, 5.0, 5.0), (12, 5.5, 5.5), (13, 6.0, 6.0)],
        "point_id long, x double, y double",
    )
    got2 = {r["point_id"] for r in convex_hulls(collinear, res=4).collect()}
    assert got2 == {11, 13}

    tiny = spark.createDataFrame(
        [(21, 8.0, 8.0), (22, 8.5, 8.0)],
        "point_id long, x double, y double",
    )
    got3 = {r["point_id"] for r in convex_hulls(tiny, res=4).collect()}
    assert got3 == {21, 22}


def test_convex_hull_brute_force_real(spark, sf_dir):
    from collections import defaultdict

    from aira_spark.operators.hull import Q, convex_hulls
    from aira_spark.functions.cells import np_cell_from_xy
    from aira_spark.sources.vectors import points_table

    pts_df = points_table(spark, sf_dir).filter("point_id % 3 = 0")
    raw = pts_df.collect()
    groups = defaultdict(dict)
    for r in raw:
        grp = int(np_cell_from_xy(r["x"], r["y"], 4))
        qx = int(round(r["x"] * Q))
        qy = int(round(r["y"] * Q))
        k = (qx, qy)
        if k not in groups[grp] or r["point_id"] < groups[grp][k]:
            groups[grp][k] = int(r["point_id"])
    want = set()
    for grp, coords in groups.items():
        pts = [(x, y, pid) for (x, y), pid in coords.items()]
        for pid in _hull_brute(pts):
            want.add((grp, pid))
    got = {
        (r["grp"], r["point_id"])
        for r in convex_hulls(pts_df, res=4).collect()
    }
    assert got == want


def test_convex_hull_contains_all_points(spark, sf_dir):
    """Every cluster point lies inside-or-on its hull polygon (the
    defining property, checked with exact integer ray casting)."""
    from collections import defaultdict

    from aira_spark.operators.hull import convex_hulls, Q, _chain
    from aira_spark.functions.cells import np_cell_from_xy
    from aira_spark.sources.vectors import points_table

    pts_df = points_table(spark, sf_dir).filter("point_id % 5 = 0")
    hull = defaultdict(list)
    for r in convex_hulls(pts_df, res=4).collect():
        hull[r["grp"]].append((r["qx"], r["qy"], r["point_id"]))
    for r in pts_df.collect():
        grp = int(np_cell_from_xy(r["x"], r["y"], 4))
        px, py = int(round(r["x"] * Q)), int(round(r["y"] * Q))
        verts = _chain(sorted(hull[grp]))
        if len(verts) < 3:
            continue  # degenerate hulls checked by the brute-force test
        for i in range(len(verts)):
            a, b = verts[i], verts[(i + 1) % len(verts)]
            cr = (b[0] - a[0]) * (py - a[1]) - (b[1] - a[1]) * (px - a[0])
            assert cr >= 0, (grp, (px, py), a, b)


# ----------------------------------------------------- adaptive_partitions


def test_adaptive_partitions_matches_recursive_quadtree(spark, sf_dir):
    """The closed-form (shallowest level with count <= T) equals a literal
    recursive quadtree split run in python."""
    from collections import Counter, defaultdict

    from aira_spark.functions.cells import np_cell_from_xy
    from aira_spark.operators.adaptive import adaptive_partitions
    from aira_spark.sources.vectors import points_table

    r_min, r_max, T = 2, 6, 8  # low T: sf0.001 has 150 points
    pts_df = points_table(spark, sf_dir)
    raw = [(int(r["point_id"]), r["x"], r["y"]) for r in pts_df.collect()]
    counts = {
        r: Counter(int(np_cell_from_xy(x, y, r)) for _, x, y in raw)
        for r in range(r_min, r_max + 1)
    }

    def leaf(x, y):
        # literal recursion: split while over threshold and depth remains
        for r in range(r_min, r_max + 1):
            c = int(np_cell_from_xy(x, y, r))
            if counts[r][c] <= T or r == r_max:
                return r, c, counts[r][c]
        raise AssertionError

    want = {pid: leaf(x, y) for pid, x, y in raw}
    got = {
        r["point_id"]: (r["leaf_res"], r["leaf_cell"], r["leaf_count"])
        for r in adaptive_partitions(
            pts_df, r_min=r_min, r_max=r_max, threshold=T
        ).collect()
    }
    assert got == want
    # the partitioner's contract: every non-max-depth leaf is bounded
    for res, _, cnt in got.values():
        assert cnt <= T or res == r_max
    # and it actually split somewhere (T=8 forces splits at res 2)
    assert any(res > r_min for res, _, _ in got.values())


# ------------------------------------------------- segment_intersections


def _segs_df(spark, rows):
    return spark.createDataFrame(
        rows, "seg_id long, user_id long, axq long, ayq long, bxq long, byq long"
    )


def test_segment_intersections_hand_cases(spark):
    """Proper X crossing, T-touch, collinear overlap, endpoint touch,
    parallel-disjoint, same-user excluded."""
    from aira_spark.operators.segments import segment_intersections

    segs = _segs_df(
        spark,
        [
            (1, 1, 0, 0, 100, 100),     # diagonal
            (2, 2, 0, 100, 100, 0),     # crosses 1 properly at (50,50)
            (3, 3, 50, 50, 200, 50),    # T-touch: endpoint on seg 1? (50,50) lies on 1
            (4, 4, 300, 300, 400, 300),
            (5, 5, 350, 300, 450, 300), # collinear overlap with 4
            (6, 6, 400, 300, 400, 500), # endpoint touch with 4 at (400,300)
            (7, 7, 0, 500, 100, 500),
            (8, 8, 0, 600, 100, 600),   # parallel to 7, disjoint
            (9, 1, 0, 100, 100, 0),     # same user as... user 1 != seg 2's user,
                                        # but same geometry as 2; vs seg 1 SAME user -> excluded
        ],
    )
    got = {
        (r["seg_a"], r["seg_b"]): r["kind"]
        for r in segment_intersections(segs).collect()
    }
    assert got[(1, 2)] == "proper"
    assert got[(1, 3)] == "touch"
    assert got[(4, 5)] == "touch"
    assert got[(4, 6)] == "touch"
    assert (7, 8) not in got
    assert (1, 9) not in got          # same user
    assert got[(2, 9)] == "touch"     # identical collinear segments, different users
    assert got[(3, 9)] == "touch"     # (50,50) endpoint lies on 9 too


def test_segment_intersections_brute_force_real(spark, sf_dir):
    """Bin-cover candidates lose nothing: Spark == python all-pairs brute
    force with the same integer predicate over real trajectory hops."""
    from collections import defaultdict

    from aira_spark.operators.segments import segment_intersections

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where("user_id % 7 = 0")
        .selectExpr(
            "user_id", "ts", "event_id",
            "CAST((event_id * 2654435761) % 100000 AS BIGINT) AS x",
            "CAST((event_id * 1013904223) % 100000 AS BIGINT) AS y",
        )
        .collect()
    )
    byu = defaultdict(list)
    for r in rows:
        byu[r["user_id"]].append((r["ts"], r["event_id"], r["x"], r["y"]))
    segs = []
    for u, evs in byu.items():
        evs.sort()
        for (t0, e0, x0, y0), (t1, e1, x1, y1) in zip(evs, evs[1:]):
            segs.append((e0, u, x0, y0, x1, y1))

    def cross(ox, oy, ax, ay, bx, by):
        return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)

    def on(px, py, qx, qy, rx, ry):
        return min(px, qx) <= rx <= max(px, qx) and min(py, qy) <= ry <= max(py, qy)

    def hits(s1, s2):
        _, _, ax, ay, bx, by = s1
        _, _, cx, cy, dx, dy = s2
        d1 = cross(cx, cy, dx, dy, ax, ay)
        d2 = cross(cx, cy, dx, dy, bx, by)
        d3 = cross(ax, ay, bx, by, cx, cy)
        d4 = cross(ax, ay, bx, by, dx, dy)
        if ((d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0)) and (
            (d3 > 0 and d4 < 0) or (d3 < 0 and d4 > 0)
        ):
            return "proper"
        if (
            (d1 == 0 and on(cx, cy, dx, dy, ax, ay))
            or (d2 == 0 and on(cx, cy, dx, dy, bx, by))
            or (d3 == 0 and on(ax, ay, bx, by, cx, cy))
            or (d4 == 0 and on(ax, ay, bx, by, dx, dy))
        ):
            return "touch"
        return None

    want = {}
    for i, s1 in enumerate(segs):
        for s2 in segs[i + 1:]:
            if s1[1] == s2[1]:
                continue
            a, b = (s1, s2) if s1[0] < s2[0] else (s2, s1)
            k = hits(a, b)
            if k:
                want[(a[0], b[0])] = k

    sdf = _segs_df(spark, segs)
    got = {
        (r["seg_a"], r["seg_b"]): r["kind"]
        for r in segment_intersections(sdf).collect()
    }
    assert got == want


def test_segment_intersections_hot_bin_guard(spark):
    from aira_spark.operators.segments import segment_intersections

    segs = _segs_df(
        spark, [(i, i, 0, 0, 50, 50) for i in range(30)]
    )
    with pytest.raises(ValueError, match="max_bin"):
        segment_intersections(segs, max_bin=10)


# ------------------------------------------------------- route_proximity


def test_route_proximity_hand_cases(spark):
    """Interior perpendicular hit, endpoint-cap hit/miss, degenerate
    zero-length segment, far miss."""
    from aira_spark.operators.segments import route_proximity

    segs = _segs_df(spark, [(1, 1, 1000, 1000, 5000, 1000), (2, 2, 7000, 7000, 7000, 7000)])
    pts = spark.createDataFrame(
        [
            (10, 3000, 1400),   # 400 above the interior -> hit at d=500
            (11, 3000, 1600),   # 600 above -> miss
            (12, 400, 1000),    # 600 left of endpoint A -> miss at d=500
            (13, 700, 1000),    # 300 left of endpoint A -> hit (cap)
            (14, 7300, 7400),   # dist 500 exactly from the degenerate seg -> hit
            (15, 7301, 7400),   # just outside -> miss
        ],
        "point_id long, pxq long, pyq long",
    )
    got = {
        (r["seg_id"], r["point_id"])
        for r in route_proximity(segs, pts, d=500).collect()
    }
    assert got == {(1, 10), (1, 13), (2, 14)}


def test_route_proximity_brute_force_real(spark, sf_dir):
    from aira_spark.operators.segments import route_proximity

    segs_rows = [
        (int(r["seg_id"]), int(r["user_id"]), int(r["axq"]), int(r["ayq"]),
         int(r["bxq"]), int(r["byq"]))
        for r in __import__("__spark_entry__")._trajectory_segments(
            spark, sf_dir
        ).collect()
    ]
    pts_rows = [
        (i, (i * 48271) % 100000, (i * 69621) % 100000)
        for i in range(0, 150, 2)
    ]
    d = 1500

    def hit(ax, ay, bx, by, px, py):
        dx, dy = bx - ax, by - ay
        den = dx * dx + dy * dy
        t = (px - ax) * dx + (py - ay) * dy
        if den == 0 or t <= 0:
            return (px - ax) ** 2 + (py - ay) ** 2 <= d * d
        if t >= den:
            return (px - bx) ** 2 + (py - by) ** 2 <= d * d
        cr = dx * (py - ay) - dy * (px - ax)
        return cr * cr <= d * d * den

    want = {
        (s[0], p[0])
        for s in segs_rows
        for p in pts_rows
        if hit(s[2], s[3], s[4], s[5], p[1], p[2])
    }
    segs = _segs_df(spark, segs_rows)
    pts = spark.createDataFrame(
        pts_rows, "point_id long, pxq long, pyq long"
    )
    got = {
        (r["seg_id"], r["point_id"])
        for r in route_proximity(segs, pts, d=d).collect()
    }
    assert got == want


# ----------------------------------------- rolling / pivot / rollup surface


def test_rolling_activity_range_frame_skips_gap_days(spark, sf_dir):
    """RANGE (value-based) frame, not ROWS: a day more than 6 days after
    its predecessor must NOT include it. Verified against a python
    recomputation over the real daily aggregates."""
    import __spark_entry__ as em

    rows = em.q_rolling_activity(spark, sf_dir).collect()
    daily = {}
    for r in rows:
        daily[(r["event_type"], r["day"])] = (r["n"], r["cents"])
    for r in rows:
        lo = r["day"] - 6
        n7 = sum(
            n for (t, d), (n, _) in daily.items()
            if t == r["event_type"] and lo <= d <= r["day"]
        )
        c7 = sum(
            c for (t, d), (_, c) in daily.items()
            if t == r["event_type"] and lo <= d <= r["day"]
        )
        assert (r["n_7d"], r["cents_7d"]) == (n7, c7)
        assert r["avg_cents_7d"] == c7 // n7


def test_event_pivot_counts_conserved(spark, sf_dir):
    import __spark_entry__ as em

    rows = em.q_event_pivot(spark, sf_dir).collect()
    total = sum(
        sum(r[f"n_{t}"] for t in em._EVENT_TYPES) for r in rows
    )
    assert total == spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert all(len(r) == 1 + len(em._EVENT_TYPES) for r in rows)


def test_sales_rollup_gid_levels(spark, sf_dir):
    import __spark_entry__ as em

    rows = em.q_sales_rollup(spark, sf_dir).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r["gid"], []).append(r)
    # gid 0 = leaf, 1 = per-segment subtotal, 3 = grand total
    assert set(by_gid) == {0, 1, 3}
    assert len(by_gid[3]) == 1
    grand = by_gid[3][0]
    assert grand["mktsegment"] == "(all)" and grand["priority"] == "(all)"
    assert grand["n_orders"] == sum(r["n_orders"] for r in by_gid[0])
    assert grand["cents"] == sum(r["cents"] for r in by_gid[0])
    for seg_row in by_gid[1]:
        leaf = [
            r for r in by_gid[0] if r["mktsegment"] == seg_row["mktsegment"]
        ]
        assert seg_row["n_orders"] == sum(r["n_orders"] for r in leaf)
