"""Round-4j additions: convoy co-movement detection — brute-force python
mirrors + guard pins."""

import datetime as dt

import pytest


# ------------------------------------------------------------------ convoy


def _toy_pings(spark):
    """Users 1 and 2 ride together for buckets 0-2 (convoy), user 3 meets
    user 1 only in buckets 0 and 2 (non-consecutive — NOT a convoy), user 4
    is far away everywhere. Bursts inside a bucket exercise the
    one-rep-per-bucket collapse (rep = lowest event_id)."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def ping(u, bucket, ix, iy):
        nonlocal eid
        rows.append((u, base + dt.timedelta(hours=bucket), eid, ix, iy))
        eid += 1

    for b in range(3):
        ping(1, b, 100 + b * 10, 200)
        ping(1, b, 900_000, 900_000)  # later burst ping, must be ignored
        ping(2, b, 102 + b * 10, 203)
    ping(3, 0, 101, 201)
    ping(3, 2, 121, 201)
    ping(3, 1, 500_000, 500_000)
    for b in range(3):
        ping(4, b, 200_000_000, 100_000_000)
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, ix long, iy long"
    )


def _brute_convoy(rows, d, bucket_s, k):
    import math

    rep = {}
    for u, ts, eid, ix, iy in rows:
        b = math.floor(ts.replace(tzinfo=dt.timezone.utc).timestamp()) // bucket_s
        key = (u, b)
        if key not in rep or eid < rep[key][0]:
            rep[key] = (eid, ix, iy)
    meets = {}
    keys = sorted(rep)
    for i, (u, b) in enumerate(keys):
        for v, b2 in keys[i + 1:]:
            if b2 != b or v == u:
                continue
            _, ax, ay = rep[(u, b)]
            _, bx, by = rep[(v, b2)]
            if (ax - bx) ** 2 + (ay - by) ** 2 <= d * d:
                pr = (min(u, v), max(u, v))
                meets.setdefault(pr, []).append(b)
    out = {}
    for pr, bs in meets.items():
        bs = sorted(set(bs))
        runs = []
        start = prev = bs[0]
        for b in bs[1:]:
            if b == prev + 1:
                prev = b
            else:
                runs.append((start, prev - start + 1))
                start = prev = b
        runs.append((start, prev - start + 1))
        max_run = max(n for _, n in runs)
        if max_run >= k:
            out[pr] = (
                len(bs), len(runs), max_run, min(s for s, _ in runs)
            )
    return out


def test_convoy_matches_brute_force(spark):
    from aira_spark.operators.convoy import convoy_pairs

    pings = _toy_pings(spark)
    rows = [tuple(r) for r in pings.collect()]
    want = _brute_convoy(rows, d=1_000, bucket_s=3_600, k=2)
    got = {
        (r["user_a"], r["user_b"]): (
            r["n_meet"], r["n_runs"], r["max_run"], r["first_bucket"]
        )
        for r in convoy_pairs(pings, d=1_000, bucket_s=3_600, k=2).collect()
    }
    # brute first_bucket is in bucket units already (both use epoch DIV)
    assert set(got) == set(want)
    for pr in want:
        assert got[pr][:3] == want[pr][:3]
        assert got[pr][3] == want[pr][3]
    assert (1, 2) in got and got[(1, 2)][2] == 3  # the 3-bucket convoy
    assert (1, 3) not in got  # non-consecutive meetings are not a convoy


def test_convoy_cross_cell_pair_found(spark):
    """A pair straddling a grid-cell boundary must still meet — pins the
    3x3 neighbourhood emission."""
    from aira_spark.operators.convoy import convoy_pairs

    base = dt.datetime(2024, 1, 1)
    rows = []
    for b in range(2):
        rows.append((1, base + dt.timedelta(hours=b), b * 2, 999, 500))
        rows.append((2, base + dt.timedelta(hours=b), b * 2 + 1, 1_001, 500))
    pings = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, ix long, iy long"
    )
    got = convoy_pairs(pings, d=1_000, bucket_s=3_600, k=2).collect()
    assert len(got) == 1 and got[0]["max_run"] == 2


def test_convoy_hot_bucket_guard(spark):
    from aira_spark.operators.convoy import convoy_pairs

    base = dt.datetime(2024, 1, 1)
    rows = [(u, base, u, 10, 10) for u in range(30)]
    pings = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, ix long, iy long"
    )
    with pytest.raises(RuntimeError, match="max_cell_users"):
        convoy_pairs(pings, d=1_000, bucket_s=3_600, max_cell_users=10)


# ---------------------------------------------------------------- ripley_k


def _brute_ripley(rows, radii):
    import math
    from collections import defaultdict

    pts = defaultdict(list)
    for pid, mark, x, y in rows:
        pts[mark].append((pid, math.floor(x * 1_000_000), math.floor(y * 1_000_000)))
    out = {}
    area = 360 * 180
    for mark, ps in pts.items():
        n = len(ps)
        for r in radii:
            np_ = 0
            for i in range(n):
                for j in range(i + 1, n):
                    dx = ps[i][1] - ps[j][1]
                    dy = ps[i][2] - ps[j][2]
                    if dx * dx + dy * dy <= r * r:
                        np_ += 1
            khat = (area * 2000 * np_) // (n * (n - 1)) if n > 1 else 0
            out[(mark, r)] = (n, np_, khat)
    return out


def test_ripley_matches_brute_force(spark):
    from aira_spark.operators.ripley import ripley_k

    # mark 0: tight cluster; mark 1: dispersed; mark 2: lone point
    rows = (
        [(i, 0, 10.0 + i / 1000.0, 20.0 + i / 2000.0) for i in range(8)]
        + [(100 + i, 1, -150.0 + i * 30.0, -70.0 + i * 15.0) for i in range(6)]
        + [(200, 2, 0.0, 0.0)]
    )
    pts = spark.createDataFrame(
        rows, "point_id long, mark long, x double, y double"
    )
    radii = (50_000, 1_000_000, 40_000_000)
    want = _brute_ripley(rows, radii)
    got = {
        (r["mark"], r["r_e6"]): (r["n_pts"], r["n_pairs"], r["khat_e3"])
        for r in ripley_k(pts, radii_e6=radii).collect()
    }
    assert got == want
    # clustered mark far exceeds CSR at the small radius; dispersed is 0
    assert got[(0, 50_000)][1] > 0 and got[(1, 50_000)][1] == 0
    # the lone point and the zero-pair mark still emit rows (LEFT join pin)
    assert got[(2, 50_000)] == (1, 0, 0)


def test_ripley_cross_cell_pair_counted(spark):
    """A close pair straddling a pitch boundary must be counted — pins the
    3x3 neighbourhood emission at pitch = r_max."""
    from aira_spark.operators.ripley import ripley_k

    pts = spark.createDataFrame(
        [(1, 0, 0.999, 0.0), (2, 0, 1.001, 0.0)],
        "point_id long, mark long, x double, y double",
    )
    got = ripley_k(pts, radii_e6=(1_000_000,)).collect()
    assert len(got) == 1 and got[0]["n_pairs"] == 1


def test_ripley_hot_cell_guard(spark):
    from aira_spark.operators.ripley import ripley_k

    pts = spark.createDataFrame(
        [(i, 0, 1.0, 1.0) for i in range(30)],
        "point_id long, mark long, x double, y double",
    )
    with pytest.raises(RuntimeError, match="max_cell_points"):
        ripley_k(pts, radii_e6=(1_000_000,), max_cell_points=10)
