"""Round-4k additions: Theil-Sen robust trend — brute-force python mirrors
+ robustness/zero pins."""

import pytest


# ---------------------------------------------------------------- theilsen


def _brute_sen(rows):
    """rows = (cell, day, cents); mirror of operators/theilsen.py with
    python floor division (// floors, matching the shared floor-div text)."""
    from collections import defaultdict

    daily = defaultdict(int)
    for cell, day, cents in rows:
        daily[(cell, day)] += cents
    by_cell = defaultdict(list)
    for (cell, day), y in daily.items():
        by_cell[cell].append((day, y))
    out = {}
    for cell, pts in by_cell.items():
        pts.sort()
        slopes = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                d1, y1 = pts[i]
                d2, y2 = pts[j]
                slopes.append(((y2 - y1) * 1_000_000 // (d2 - d1), d1, d2))
        slopes.sort()
        n = len(slopes)
        sen = slopes[(n + 1) // 2 - 1][0] if n else 0
        out[cell] = (len(pts), n, sen)
    return out


def _run_sen(spark, rows):
    from aira_spark.operators.theilsen import sen_trends

    ev = spark.createDataFrame(rows, "cell long, day long, cents long")
    return {
        r["cell"]: (r["n_days"], r["n_pairs"], r["sen_slope_e6"])
        for r in sen_trends(ev).collect()
    }


def test_sen_matches_brute_force(spark):
    import random

    rng = random.Random(7)
    rows = []
    for cell in range(6):
        for day in rng.sample(range(30), rng.randint(1, 12)):
            for _ in range(rng.randint(1, 3)):  # multiple events per day
                rows.append((cell, day, rng.randint(-500, 2000)))
    assert _run_sen(spark, rows) == _brute_sen(rows)


def test_sen_resists_outlier_ols_does_not(spark):
    """One wild day: OLS slope goes hugely negative, Sen stays at the
    clean +100 cents/day trend — the breakdown-resistance pin."""
    from aira_spark.operators.theilsen import sen_trends
    from aira_spark.operators.trend import cell_trends

    rows = [(1, d, 1000 + 100 * d) for d in range(9)] + [(1, 9, -2_000_000)]
    ev = sen_trends(
        spark.createDataFrame(rows, "cell long, day long, cents long")
    ).collect()[0]
    ols = cell_trends(
        spark.createDataFrame(rows, "cell long, day long, cents long")
    ).collect()[0]
    assert ev["sen_slope_e6"] == 100_000_000
    assert ols["slope_e6"] < 0


def test_sen_lone_day_and_negative_floor(spark):
    # lone active day -> zero pairs but the cell stays visible;
    # a decaying 2-day cell pins the FLOOR (not truncate-toward-zero)
    # of a negative slope: (-3 cents over 2 days) -> -1500000 e6
    rows = [(1, 5, 42), (2, 0, 10), (2, 2, 7)]
    got = _run_sen(spark, rows)
    assert got[1] == (1, 0, 0)
    assert got[2] == (2, 1, -1_500_000)
