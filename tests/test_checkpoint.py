"""Checkpoint / lineage / kill-resume tests (north rule: resumable at
partition granularity with per-partition lineage)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from aira_spark.sources.checkpoint import (
    committed_buckets,
    read_stage,
    resume_stage,
    verify_manifest,
    write_stage,
)

N_BUCKETS = 8


@pytest.fixture()
def source(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def test_write_and_manifest(spark, source, tmp_path):
    path = str(tmp_path / "stage1")
    write_stage(source, path, "stage1", key="o_orderkey", n_buckets=N_BUCKETS)
    assert sorted(committed_buckets(spark, path, "stage1")) == list(range(N_BUCKETS))
    got = read_stage(spark, path)
    assert got.count() == source.count()
    assert verify_manifest(spark, path, "stage1", source, "o_orderkey", N_BUCKETS)


def test_kill_and_resume(spark, source, tmp_path):
    """Simulate a kill after 3 of 8 buckets committed; resume must complete the
    remaining 5 and reproduce the one-shot result exactly."""
    path = str(tmp_path / "stage2")
    write_stage(source, path, "s", key="o_orderkey", n_buckets=N_BUCKETS,
                only_buckets=[0, 1, 2])
    assert sorted(committed_buckets(spark, path, "s")) == [0, 1, 2]

    resume_stage(source, path, "s", key="o_orderkey", n_buckets=N_BUCKETS)
    assert sorted(committed_buckets(spark, path, "s")) == list(range(N_BUCKETS))
    got = read_stage(spark, path)
    assert got.count() == source.count()
    # row-identical to the source (checksum covers values, not just counts)
    assert verify_manifest(spark, path, "s", source, "o_orderkey", N_BUCKETS)
    # resume again: no-op (idempotent)
    resume_stage(source, path, "s", key="o_orderkey", n_buckets=N_BUCKETS)
    assert read_stage(spark, path).count() == source.count()


def test_manifest_detects_corruption(spark, source, tmp_path):
    path = str(tmp_path / "stage3")
    write_stage(source, path, "s", key="o_orderkey", n_buckets=N_BUCKETS)
    tampered = source.withColumn(
        "o_totalprice", F.when(F.col("o_orderkey") == 1, 0.0).otherwise(F.col("o_totalprice"))
    )
    assert not verify_manifest(spark, path, "s", tampered, "o_orderkey", N_BUCKETS)


def test_time_travel_snapshots(spark, source, tmp_path):
    """Snapshot-tagged writes: read_stage_at(id) reconstructs the table as of
    that commit; a resume adds a second snapshot containing only the buckets
    the kill left pending."""
    from aira_spark.sources.checkpoint import next_snapshot_id, read_stage_at, snapshots

    path = str(tmp_path / "tt")
    # snapshot 1: a partial write (kill after half the buckets)
    write_stage(source, path, "s", key="o_orderkey", n_buckets=N_BUCKETS,
                only_buckets=list(range(N_BUCKETS // 2)))
    assert next_snapshot_id(path) == 2
    n1 = read_stage(spark, path).count()
    # snapshot 2: resume commits the remaining buckets
    resume_stage(source, path, "s", key="o_orderkey", n_buckets=N_BUCKETS)
    log = snapshots(path)
    assert [s["snapshot-id"] for s in log] == [1, 2]
    at1 = read_stage_at(spark, path, 1).count()
    at2 = read_stage_at(spark, path, 2).count()
    assert at1 == n1 < at2 == source.count()
    assert read_stage(spark, path).count() == source.count()
    # time travel prunes at the scan: the snap partition filter is pushed down
    plan = read_stage_at(spark, path, 1)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "snap" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]


def test_compaction_preserves_content(spark, source, tmp_path):
    """compact_stage: fewer files, identical content, manifest still verifies."""
    from aira_spark.sources.checkpoint import compact_stage, snapshots

    path = str(tmp_path / "cp")
    # three incremental appends over the SAME buckets => 3 files per bucket
    for i in range(3):
        write_stage(source.filter(F.col("o_orderkey") % 3 == i), path, "s",
                    key="o_orderkey", n_buckets=N_BUCKETS)
    before_rows = {tuple(r) for r in read_stage(spark, path).drop("bucket").collect()}
    files_before, files_after = compact_stage(spark, path)
    assert files_after < files_before
    after_rows = {tuple(r) for r in read_stage(spark, path).drop("bucket").collect()}
    assert after_rows == before_rows
    assert verify_manifest(spark, path, "s", source, key="o_orderkey",
                           n_buckets=N_BUCKETS)
    log = snapshots(path)
    assert log[-1]["summary"]["operation"] == "replace"
    assert all(s.get("expired") for s in log[:-1])
    # AS-OF reads of expired or never-committed snapshots must raise, not
    # silently return wrong data
    from aira_spark.sources.checkpoint import read_stage_at

    with pytest.raises(ValueError, match="expired"):
        read_stage_at(spark, path, 1)
    with pytest.raises(ValueError, match="never committed"):
        read_stage_at(spark, path, 999)
    # the live compacted snapshot still time-travels
    assert read_stage_at(spark, path, log[-1]["snapshot-id"]).count() == len(before_rows)


def test_crash_between_manifest_and_metadata(spark, source, tmp_path, monkeypatch):
    """A write killed AFTER the manifest append but BEFORE the metadata.json
    commit must not strand its buckets: readers never see that snapshot's
    rows (metadata is the sole commit point), so resume must treat them as
    pending and recompute — trusting the manifest alone would skip them
    forever (silent permanent data loss)."""
    import aira_spark.sources.checkpoint as cp

    path = str(tmp_path / "crashwin")
    real_append = cp._append_snapshot

    def crash(*a, **k):
        raise RuntimeError("killed before metadata commit")

    monkeypatch.setattr(cp, "_append_snapshot", crash)
    with pytest.raises(RuntimeError, match="killed"):
        write_stage(source, path, "s", key="o_orderkey", n_buckets=N_BUCKETS)
    # manifest rows exist on disk, but no snapshot was committed:
    assert committed_buckets(spark, path, "s") == []
    monkeypatch.setattr(cp, "_append_snapshot", real_append)
    # resume recomputes every bucket under a fresh snapshot
    resume_stage(source, path, "s", key="o_orderkey", n_buckets=N_BUCKETS)
    assert sorted(committed_buckets(spark, path, "s")) == list(range(N_BUCKETS))
    assert read_stage(spark, path).count() == source.count()
    # the stale manifest rows from the crashed write are excluded from
    # verification too (they describe data readers never see)
    assert verify_manifest(spark, path, "s", source, "o_orderkey", N_BUCKETS)


def test_legacy_layout_write_fails_fast(spark, source, tmp_path):
    """write_stage on a pre-snapshot table (top-level bucket= dirs) must fail
    BEFORE appending anything, not corrupt the table for later readers."""
    import os

    path = str(tmp_path / "legacy")
    os.makedirs(f"{path}/data/bucket=0")
    with pytest.raises(ValueError, match="pre-snapshot layout"):
        write_stage(source, path, "s", key="o_orderkey", n_buckets=N_BUCKETS)
    # nothing was appended: no manifest, no metadata
    assert not os.path.exists(f"{path}/_manifest")
    assert not os.path.exists(f"{path}/metadata.json")


def test_orphan_snapshot_invisible(spark, source, tmp_path):
    """A snap= dir from a killed write (data on disk, metadata never
    committed) is ignored by readers and its id is never reused."""
    import os

    from aira_spark.sources.checkpoint import next_snapshot_id

    path = str(tmp_path / "orphan")
    write_stage(source, path, "s", key="o_orderkey", n_buckets=N_BUCKETS)
    n = read_stage(spark, path).count()
    # simulate a crashed second write: data exists, metadata.json untouched
    source.limit(10).withColumn("bucket", F.lit(0)).write.partitionBy(
        "bucket"
    ).parquet(f"{path}/data/snap=2")
    assert read_stage(spark, path).count() == n  # orphan invisible
    assert next_snapshot_id(path) == 3  # orphan id never reused


def test_incremental_read_between_snapshots(spark, source, tmp_path):
    """read_stage_changes returns exactly the rows appended in the snapshot
    range, prunes older snapshots at the scan, and fails loudly when the
    range is compacted away or ahead of the log."""
    from aira_spark.sources.checkpoint import (
        compact_stage,
        read_stage_changes,
        resume_stage,
    )

    path = str(tmp_path / "cdc")
    half = list(range(N_BUCKETS // 2))
    write_stage(source, path, "s", key="o_orderkey", n_buckets=N_BUCKETS,
                only_buckets=half)
    resume_stage(source, path, "s", key="o_orderkey", n_buckets=N_BUCKETS)

    full = read_stage(spark, path)
    snap1 = {r.o_orderkey for r in read_stage_changes(spark, path, 0, 1).collect()}
    snap2 = {r.o_orderkey for r in read_stage_changes(spark, path, 1).collect()}
    assert snap1 | snap2 == {r.o_orderkey for r in full.collect()}
    assert snap1.isdisjoint(snap2)
    assert len(snap2) > 0
    # bootstrap from 0 equals the full table
    assert read_stage_changes(spark, path, 0).count() == full.count()
    # scan pruning: the snap partition filter reaches the scan
    plan = (
        read_stage_changes(spark, path, 1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    pf = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert "snap" in pf
    # ahead-of-log consumer state fails loudly
    with pytest.raises(ValueError, match="newer than the log"):
        read_stage_changes(spark, path, 99)
    # compaction expires the range -> the exact diff is unrecoverable
    compact_stage(spark, path)
    with pytest.raises(ValueError, match="expired"):
        read_stage_changes(spark, path, 1, 2)


def test_incremental_read_contract_edges(spark, source, tmp_path):
    """CDC cursor contracts: ahead-of-log to_snapshot raises (a consumer must
    never record an unreachable watermark); bootstrap (from=0) survives
    compaction by returning the live table; polling an unwritten stage
    raises a clear error instead of a scan failure."""
    from aira_spark.sources.checkpoint import compact_stage, read_stage_changes

    path = str(tmp_path / "cdc2")
    with pytest.raises(ValueError, match="no snapshots committed"):
        read_stage_changes(spark, path, 0)

    write_stage(source, path, "s", key="o_orderkey", n_buckets=N_BUCKETS,
                only_buckets=list(range(N_BUCKETS // 2)))
    resume_stage(source, path, "s", key="o_orderkey", n_buckets=N_BUCKETS)
    with pytest.raises(ValueError, match="to_snapshot 99 is newer"):
        read_stage_changes(spark, path, 0, 99)

    compact_stage(spark, path)
    # bootstrap after compaction: full current table, no expired-range error
    assert read_stage_changes(spark, path, 0).count() == source.count()
    # bootstrap pinned to an expired snapshot raises via the AS-OF contract
    with pytest.raises(ValueError, match="expired"):
        read_stage_changes(spark, path, 0, 1)

def test_cdc_cursor_overtaken_by_compaction_raises(spark, source, tmp_path):
    """The ADVICE r2 silent-replay hole: snaps 1,2 committed; consumer cursor
    at 2; compaction rewrites 1+2 into replace snap 3; snap 4 appends. The
    replace snapshot lands INSIDE (2, 4] and contains every already-processed
    row — read_stage_changes must raise (re-bootstrap required), never return
    snap 3's rows as 'changes'."""
    from aira_spark.sources.checkpoint import compact_stage, read_stage_changes

    path = str(tmp_path / "cdc3")
    half = list(range(N_BUCKETS // 2))
    write_stage(source, path, "s", key="o_orderkey", n_buckets=N_BUCKETS,
                only_buckets=half)                                   # snap 1
    resume_stage(source, path, "s", key="o_orderkey", n_buckets=N_BUCKETS)  # snap 2
    # consumer processed through snap 2
    compact_stage(spark, path)                                        # snap 3 (replace)
    write_stage(source.limit(25), path, "s2", key="o_orderkey",
                n_buckets=N_BUCKETS)                                  # snap 4
    with pytest.raises(ValueError, match="expired"):
        read_stage_changes(spark, path, 2)
    # a cursor AT the replace snapshot is valid: the diff (3, 4] is exact
    rows = read_stage_changes(spark, path, 3)
    assert rows.count() == 25
    # an orphan cursor id (never committed, below max) is corrupt state:
    # fabricate a crashed write's snap dir (data on disk, metadata untouched)
    # -> next commit skips its id, leaving a genuine gap in the log
    source.limit(5).withColumn("bucket", F.lit(0)).write.partitionBy(
        "bucket"
    ).parquet(f"{path}/data/snap=5")                                  # orphan 5
    write_stage(source.limit(10), path, "s3", key="o_orderkey",
                n_buckets=N_BUCKETS)                                  # snap 6
    with pytest.raises(ValueError, match="never committed"):
        read_stage_changes(spark, path, 5)


def test_remove_orphan_files_gc(spark, source, tmp_path):
    """remove_orphan_files deletes only uncommitted snap dirs older than the
    age guard; committed (live AND expired) snapshots are untouched and
    logical content is unchanged."""
    import os

    from aira_spark.sources.checkpoint import remove_orphan_files

    path = str(tmp_path / "gc")
    write_stage(source, path, "s", key="o_orderkey", n_buckets=N_BUCKETS)
    write_stage(source.limit(50), path, "s", key="o_orderkey",
                n_buckets=N_BUCKETS)
    n = read_stage(spark, path).count()
    # crashed write: data only, never committed to metadata.json
    source.limit(10).withColumn("bucket", F.lit(0)).write.partitionBy(
        "bucket"
    ).parquet(f"{path}/data/snap=3")
    # age guard: a young orphan is presumed in-flight and kept
    assert remove_orphan_files(path, older_than_s=3600) == []
    assert os.path.isdir(f"{path}/data/snap=3")
    # immediate collection removes it; committed dirs survive
    assert remove_orphan_files(path, older_than_s=0) == [3]
    assert not os.path.isdir(f"{path}/data/snap=3")
    assert os.path.isdir(f"{path}/data/snap=1")
    assert os.path.isdir(f"{path}/data/snap=2")
    assert read_stage(spark, path).count() == n
    assert verify_manifest(spark, path, "s", source.union(source.limit(50)),
                           key="o_orderkey", n_buckets=N_BUCKETS)


def test_remove_orphan_files_noop_on_clean_table(spark, source, tmp_path):
    from aira_spark.sources.checkpoint import remove_orphan_files

    path = str(tmp_path / "gc2")
    write_stage(source, path, "s", key="o_orderkey", n_buckets=N_BUCKETS)
    assert remove_orphan_files(path, older_than_s=0) == []
    assert remove_orphan_files(str(tmp_path / "missing")) == []
