"""As-of join (union + last(ignorenulls) backfill) and image x image
footprint overlap/proximity self-join — hand-built semantics cases plus
brute-force cross-checks on sf0.001."""

from datetime import datetime

from pyspark.sql import functions as F


def _ts(s: int):
    return datetime(2024, 1, 1, 0, 0, s)


def _mk(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(15), 100),
            (1, _ts(20), 101),
            (1, _ts(5), 102),
            (2, _ts(40), 103),  # key with no right rows at all
        ],
        "k long, ts timestamp, lv long",
    )
    right = spark.createDataFrame(
        [
            (1, 1, _ts(10), 7.0),
            (1, 2, _ts(20), 8.0),
            (1, 3, _ts(20), None),  # equal-ts tie: greatest rid wins, and a
            # NULL payload field must still count as a match (struct non-null)
        ],
        "k long, rid long, ts timestamp, rv double",
    )
    return left, right


def test_asof_join_semantics(spark):
    from aira_spark.operators.asof import asof_join

    left, right = _mk(spark)
    out = {
        r.lv: (r.r_rid, r.r_rv)
        for r in asof_join(left, right, on="k", right_tie="rid").collect()
    }
    assert len(out) == 4
    assert out[100] == (1, 7.0)  # strictly-prior match
    assert out[101] == (3, None)  # inclusive at equal ts; greatest-rid tie;
    # matched row's NULL field survives (ignorenulls skips rows, not fields)
    assert out[102] == (None, None)  # nothing at-or-before
    assert out[103] == (None, None)  # key absent from right


def test_asof_join_tolerance(spark):
    from aira_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, _ts(25), 1), (1, _ts(50), 2)], "k long, ts timestamp, lv long"
    )
    right = spark.createDataFrame(
        [(1, 10, _ts(20), 1.0)], "k long, rid long, ts timestamp, rv double"
    )
    out = {
        r.lv: r.r_rid
        for r in asof_join(
            left, right, on="k", right_tie="rid", tolerance_us=10_000_000
        ).collect()
    }
    assert out[1] == 10  # 5 s old <= 10 s tolerance
    assert out[2] is None  # 30 s old > tolerance -> nulled


def test_asof_join_events_bruteforce(spark, sf_dir):
    """Operator vs an independent per-row brute force on real events."""
    from aira_spark.operators.asof import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    left = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), "ts"
    )
    got = {
        r.event_id: r.r_view_id
        for r in asof_join(left, right, on="user_id", right_tie="view_id").collect()
    }
    rrows = right.collect()
    by_user = {}
    for r in rrows:
        by_user.setdefault(r.user_id, []).append(r)
    exp = {}
    for l in left.collect():
        cand = [
            r for r in by_user.get(l.user_id, []) if r.ts <= l.ts
        ]
        exp[l.event_id] = (
            max(cand, key=lambda r: (r.ts, r.view_id)).view_id if cand else None
        )
    assert got == exp and len(got) > 0


def test_footprint_overlap_bruteforce(spark, sf_dir):
    """Cell-cover-blocked pairs == all-pairs brute force (prefilter is
    lossless), at pad=0 (strict overlap) and a wide pad."""
    import __spark_entry__ as em
    from aira_spark.operators.chunks import footprint, with_meta
    from aira_spark.operators.spatial import footprint_overlap_join

    wm = with_meta(em._images(spark, sf_dir))
    fp = footprint(wm).select(
        "image_id", "fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax"
    ).collect()
    for pad in (0.0, 16.0):  # sf0.001 footprints sit on a sparse grid:
        # the nearest disjoint neighbors are >8 deg apart, 16 deg finds 166
        got = {
            (r.image_a, r.image_b): (r.olap_w, r.olap_h)
            for r in footprint_overlap_join(wm, pad=pad).collect()
        }
        exp = {}
        for a in fp:
            for b in fp:
                if a.image_id >= b.image_id:
                    continue
                if (
                    a.fp_xmin < b.fp_xmax + pad
                    and b.fp_xmin < a.fp_xmax + pad
                    and a.fp_ymin < b.fp_ymax + pad
                    and b.fp_ymin < a.fp_ymax + pad
                ):
                    exp[(a.image_id, b.image_id)] = (
                        min(a.fp_xmax, b.fp_xmax) - max(a.fp_xmin, b.fp_xmin),
                        min(a.fp_ymax, b.fp_ymax) - max(a.fp_ymin, b.fp_ymin),
                    )
        assert got == exp
    assert len(got) > 0  # the wide pad produced pairs on sf0.001
