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
