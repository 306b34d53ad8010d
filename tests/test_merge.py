"""MERGE INTO (bucket-granular copy-on-write upsert) contracts."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aira_spark.sources.checkpoint import (
    compact_stage,
    merge_stage,
    next_snapshot_id,
    read_stage,
    read_stage_at,
    read_stage_changes,
    verify_manifest,
    write_stage,
)

N_BUCKETS = 8


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [(k, f"v{k}", 100 + k) for k in range(40)],
        "k long, v string, amt long",
    )


def _rows(df):
    return {(r["k"], r["v"], r["amt"]) for r in df.select("k", "v", "amt").collect()}


def test_merge_upserts_and_inserts(spark, base, tmp_path):
    path = str(tmp_path / "t")
    write_stage(base, path, "s", key="k", n_buckets=N_BUCKETS)
    updates = spark.createDataFrame(
        [(3, "NEW3", 999), (7, "NEW7", 777), (100, "INS", 1)],
        "k long, v string, amt long",
    )
    sid, touched = merge_stage(spark, updates, path, "s", key="k", n_buckets=N_BUCKETS)
    got = _rows(read_stage(spark, path))
    expect = {
        (k, f"v{k}", 100 + k) for k in range(40) if k not in (3, 7)
    } | {(3, "NEW3", 999), (7, "NEW7", 777), (100, "INS", 1)}
    assert got == expect
    # count is exact: no duplicate survivors of replaced keys
    assert read_stage(spark, path).count() == 41
    # the manifest still verifies against the POST-merge table content
    cur = read_stage(spark, path).select("k", "v", "amt")
    assert verify_manifest(spark, path, "s", cur, "k", N_BUCKETS)


def test_merge_rewrites_only_touched_buckets(spark, base, tmp_path):
    path = str(tmp_path / "t")
    write_stage(base, path, "s", key="k", n_buckets=N_BUCKETS)
    updates = spark.createDataFrame([(3, "NEW3", 999)], "k long, v string, amt long")
    sid, touched = merge_stage(spark, updates, path, "s", key="k", n_buckets=N_BUCKETS)
    # exactly the buckets containing key 3 rewrote
    from aira_spark.sources.checkpoint import _with_bucket

    b3 = _with_bucket(updates, "k", N_BUCKETS).collect()[0]["bucket"]
    assert touched == [b3]
    snap_dir = f"{path}/data/snap={sid}"
    written = sorted(
        int(d.split("=")[1]) for d in os.listdir(snap_dir) if d.startswith("bucket=")
    )
    assert written == [b3]


def test_merge_preserves_time_travel_and_guards_cdc(spark, base, tmp_path):
    path = str(tmp_path / "t")
    write_stage(base, path, "s", key="k", n_buckets=N_BUCKETS)
    pre_sid = max(
        s["snapshot-id"]
        for s in __import__("json").load(open(f"{path}/metadata.json"))["snapshots"]
    )
    updates = spark.createDataFrame([(3, "NEW3", 999)], "k long, v string, amt long")
    merge_sid, _ = merge_stage(spark, updates, path, "s", key="k", n_buckets=N_BUCKETS)
    # AS OF the pre-merge snapshot: original row for key 3
    old = {r["k"]: r["v"] for r in read_stage_at(spark, path, pre_sid).collect()}
    assert old[3] == "v3"
    new = {r["k"]: r["v"] for r in read_stage_at(spark, path, merge_sid).collect()}
    assert new[3] == "NEW3"
    # CDC across the merge raises (carried rows would replay)
    with pytest.raises(ValueError, match="replace/merge"):
        read_stage_changes(spark, path, pre_sid)
    # bootstrap still works and sees the merged state
    boot = {r["k"]: r["v"] for r in read_stage_changes(spark, path, 0).collect()}
    assert boot[3] == "NEW3"


def test_merge_spec_mismatch_fails_fast(spark, base, tmp_path):
    path = str(tmp_path / "t")
    write_stage(base, path, "s", key="k", n_buckets=N_BUCKETS)
    updates = spark.createDataFrame([(3, "x", 0)], "k long, v string, amt long")
    with pytest.raises(ValueError, match="spec mismatch"):
        merge_stage(spark, updates, path, "s", key="k", n_buckets=16)
    with pytest.raises(ValueError, match="spec mismatch"):
        merge_stage(spark, updates, path, "s", key="v", n_buckets=N_BUCKETS)


def test_repeated_merges_then_compaction(spark, base, tmp_path):
    """Two merges touching overlapping buckets, then compaction: content is
    the final upsert state; manifest verification survives the expiry."""
    path = str(tmp_path / "t")
    write_stage(base, path, "s", key="k", n_buckets=N_BUCKETS)
    m1 = spark.createDataFrame([(3, "A", 1), (5, "B", 2)], "k long, v string, amt long")
    merge_stage(spark, m1, path, "s", key="k", n_buckets=N_BUCKETS)
    m2 = spark.createDataFrame([(3, "C", 9), (200, "D", 4)], "k long, v string, amt long")
    merge_stage(spark, m2, path, "s", key="k", n_buckets=N_BUCKETS)
    expect = (
        {(k, f"v{k}", 100 + k) for k in range(40) if k not in (3, 5)}
        | {(3, "C", 9), (5, "B", 2), (200, "D", 4)}
    )
    assert _rows(read_stage(spark, path)) == expect
    compact_stage(spark, path)
    assert _rows(read_stage(spark, path)) == expect
    cur = read_stage(spark, path).select("k", "v", "amt")
    assert verify_manifest(spark, path, "s", cur, "k", N_BUCKETS)


def test_merge_crash_before_commit_is_invisible(spark, base, tmp_path, monkeypatch):
    """A merge killed between its manifest append and the metadata commit
    leaves an orphan snap= dir readers never see — same protocol as
    write_stage."""
    import aira_spark.sources.checkpoint as cp

    path = str(tmp_path / "t")
    write_stage(base, path, "s", key="k", n_buckets=N_BUCKETS)
    before = _rows(read_stage(spark, path))
    updates = spark.createDataFrame([(3, "NEW3", 999)], "k long, v string, amt long")

    def boom(*a, **kw):
        raise RuntimeError("killed before metadata commit")

    monkeypatch.setattr(cp, "_write_metadata", boom)
    with pytest.raises(RuntimeError):
        merge_stage(spark, updates, path, "s", key="k", n_buckets=N_BUCKETS)
    monkeypatch.undo()
    assert _rows(read_stage(spark, path)) == before  # orphan invisible
    # the crashed id is never reused
    crashed = max(
        int(d.split("=")[1])
        for d in os.listdir(f"{path}/data")
        if d.startswith("snap=")
    )
    assert next_snapshot_id(path) == crashed + 1
    # and the retry succeeds cleanly
    merge_stage(spark, updates, path, "s", key="k", n_buckets=N_BUCKETS)
    got = {r["k"]: r["v"] for r in read_stage(spark, path).collect()}
    assert got[3] == "NEW3"


def test_delete_removes_rows_bucket_granular(spark, base, tmp_path):
    path = str(tmp_path / "t")
    write_stage(base, path, "s", key="k", n_buckets=N_BUCKETS)
    from aira_spark.sources.checkpoint import _with_bucket, delete_stage

    keys = spark.createDataFrame([(3,), (7,), (500,)], "k long")  # 500 absent
    sid, touched = delete_stage(spark, keys, path, "s", key="k", n_buckets=N_BUCKETS)
    got = _rows(read_stage(spark, path))
    assert got == {(k, f"v{k}", 100 + k) for k in range(40) if k not in (3, 7)}
    # touched = buckets of the keys that actually existed
    want = sorted(
        r["bucket"]
        for r in _with_bucket(
            spark.createDataFrame([(3,), (7,)], "k long"), "k", N_BUCKETS
        ).select("bucket").distinct().collect()
    )
    assert touched == want
    cur = read_stage(spark, path).select("k", "v", "amt")
    assert verify_manifest(spark, path, "s", cur, "k", N_BUCKETS)
    # time travel still sees the deleted rows
    pre = [s for s in __import__("json").load(open(f"{path}/metadata.json"))["snapshots"]][0]
    assert 3 in {r["k"] for r in read_stage_at(spark, path, pre["snapshot-id"]).collect()}


def test_delete_no_match_is_noop(spark, base, tmp_path):
    path = str(tmp_path / "t")
    write_stage(base, path, "s", key="k", n_buckets=N_BUCKETS)
    from aira_spark.sources.checkpoint import delete_stage, snapshots

    n_before = len(snapshots(path))
    keys = spark.createDataFrame([(999,)], "k long")
    sid, touched = delete_stage(spark, keys, path, "s", key="k", n_buckets=N_BUCKETS)
    assert (sid, touched) == (0, [])
    assert len(snapshots(path)) == n_before  # no empty snapshot committed
    assert read_stage(spark, path).count() == 40


def test_delete_entire_bucket(spark, tmp_path):
    """Deleting every row of a bucket leaves it empty (shadow only, no new
    files) and the table still reads/verifies."""
    from aira_spark.sources.checkpoint import _with_bucket, delete_stage

    df = spark.createDataFrame(
        [(k, f"v{k}", k) for k in range(24)], "k long, v string, amt long"
    )
    path = str(tmp_path / "t")
    write_stage(df, path, "s", key="k", n_buckets=4)
    # pick one bucket and delete every key in it
    bk = _with_bucket(df, "k", 4).collect()
    target = 2
    doomed = [r["k"] for r in bk if r["bucket"] == target]
    assert doomed  # fixture sanity
    keys = spark.createDataFrame([(k,) for k in doomed], "k long")
    sid, touched = delete_stage(spark, keys, path, "s", key="k", n_buckets=4)
    assert touched == [target]
    got = read_stage(spark, path)
    assert got.count() == 24 - len(doomed)
    assert got.filter(F.col("bucket") == target).count() == 0
    cur = got.select("k", "v", "amt")
    assert verify_manifest(spark, path, "s", cur, "k", 4)


def test_expire_snapshots_drops_fully_shadowed_only(spark, base, tmp_path):
    """A merge that rewrites EVERY bucket fully shadows the base snapshot:
    expire removes it (dir gone, AS-OF raises) without changing the live
    view; a partially-shadowing merge expires nothing."""
    import os

    from aira_spark.sources.checkpoint import expire_snapshots

    # --- partial shadow: nothing expires
    p1 = str(tmp_path / "partial")
    write_stage(base, p1, "s", key="k", n_buckets=N_BUCKETS)
    sid1 = next_snapshot_id(p1) - 1
    upd = spark.createDataFrame([(3, "N3", 1)], "k long, v string, amt long")
    merge_stage(spark, upd, p1, "s", key="k", n_buckets=N_BUCKETS)
    assert expire_snapshots(spark, p1, keep_last=1) == []
    assert os.path.isdir(f"{p1}/data/snap={sid1}")

    # --- full shadow: every base key rewritten -> base snapshot expires
    p2 = str(tmp_path / "full")
    write_stage(base, p2, "s", key="k", n_buckets=N_BUCKETS)
    sid2 = next_snapshot_id(p2) - 1
    all_upd = base.withColumn("v", F.concat(F.lit("U"), F.col("v")))
    merge_stage(spark, all_upd, p2, "s", key="k", n_buckets=N_BUCKETS)
    before = _rows(read_stage(spark, p2))
    assert expire_snapshots(spark, p2, keep_last=1) == [sid2]
    assert _rows(read_stage(spark, p2)) == before  # live view unchanged
    assert not os.path.isdir(f"{p2}/data/snap={sid2}")
    with pytest.raises(ValueError, match="expired"):
        read_stage_at(spark, p2, sid2)
    # idempotent + newest always retained
    assert expire_snapshots(spark, p2, keep_last=1) == []
