"""Per-partition checkpoint / lineage / resume (north rule).

Iceberg-style staged writes: data is bucketed on a stable key hash, each
bucket is written as its own parquet partition, and a *manifest* table records
per-bucket lineage — (stage, bucket, cell_min, cell_max, rows, checksum,
status). A killed job resumes at bucket granularity: committed buckets are
anti-joined away and only pending buckets recompute. The manifest is the
Iceberg-snapshot analog (no Iceberg runtime jar exists in this sandbox —
SURVEY.md §7; the layout and schema are catalog-compatible by design).

The checksum is an order-insensitive 64-bit XOR of row hashes, so resume
results can be verified equal to a one-shot run without sorting anything.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest"


def _with_bucket(df: DataFrame, key: str, n_buckets: int) -> DataFrame:
    return df.withColumn("bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int"))


def write_stage(
    df: DataFrame,
    path: str,
    stage: str,
    key: str,
    n_buckets: int = 32,
    cell_col: str | None = None,
    only_buckets: list[int] | None = None,
) -> None:
    """Write df partitioned by bucket + append per-bucket lineage manifest."""
    data = f"{path}/data"
    if os.path.isdir(data) and any(d.startswith("bucket=") for d in os.listdir(data)):
        # same guard as read_stage, but at write time: appending snap= dirs
        # into a pre-snapshot table would corrupt it (mixed partition layouts,
        # manifest rows without snapshot_id) before any reader notices
        raise ValueError(
            f"{data} uses the pre-snapshot layout (top-level bucket= dirs); "
            "recreate the stage — mixing layouts breaks partition discovery"
        )
    if os.path.exists(f"{path}/metadata.json"):
        # same fail-fast as merge/delete: appending with a different
        # (key, n_buckets) spec would route keys to the wrong buckets —
        # resume would then silently duplicate some rows and skip others
        _load_cow_meta(path, key, n_buckets, "append")
    data_cols = df.columns
    sid = next_snapshot_id(path)
    b = _with_bucket(df, key, n_buckets)
    if only_buckets is not None:
        b = b.filter(F.col("bucket").isin(only_buckets))
    b = b.cache()
    try:
        # snapshot-tagged data dir: every write lands under snap=<id>, so a
        # reader can reconstruct the table AS OF any snapshot (time travel)
        b.write.mode("append").partitionBy("bucket").parquet(
            f"{path}/data/snap={sid}"
        )
        cmin = F.min(cell_col) if cell_col else F.lit(None).cast("long")
        cmax = F.max(cell_col) if cell_col else F.lit(None).cast("long")
        manifest = b.groupBy("bucket").agg(
            F.lit(stage).alias("stage"),
            F.lit(sid).alias("snapshot_id"),
            cmin.alias("cell_min"),
            cmax.alias("cell_max"),
            F.count("*").alias("rows"),
            # order-insensitive checksum: XOR of per-row hashes
            F.expr(
                "bit_xor(" + _row_checksum_expr(data_cols) + ")"
            ).alias("checksum"),
            F.lit("committed").alias("status"),
        )
        mrows = manifest.select(
            "stage", "snapshot_id", "bucket", "cell_min", "cell_max", "rows",
            "checksum", "status"
        )
        # commit covers the WHOLE bucket scope, including hash-empty buckets:
        # a bucket with no manifest row would read as never-committed, so
        # resume_stage re-runs it forever — each retry appending a junk empty
        # snapshot instead of converging to a no-op. A 0-row row (checksum 0,
        # XOR's neutral element) records "written, empty" exactly; ≤ n_buckets
        # rows collect to the driver, the same cost class as an Iceberg
        # manifest-list read.
        collected = mrows.collect()
        present = {r["bucket"] for r in collected}
        scope = only_buckets if only_buckets is not None else range(n_buckets)
        rows_out = collected + [
            (stage, sid, x, None, None, 0, 0, "committed")
            for x in scope
            if x not in present
        ]
        df.sparkSession.createDataFrame(
            rows_out, schema=mrows.schema
        ).coalesce(1).write.mode("append").parquet(f"{path}/{MANIFEST}")
        _append_snapshot(df, path, stage, key, n_buckets, sid)
    finally:
        b.unpersist()


def next_snapshot_id(path: str) -> int:
    """The id the NEXT commit will use: one past both the metadata log AND any
    snap= dir already on disk — a write killed between its data write and its
    metadata append leaves an orphan dir whose id must never be reused (the
    orphan is invisible to readers, which resolve live snapshots from
    metadata.json, and is cleaned up by the next compaction)."""
    max_id = max((s["snapshot-id"] for s in snapshots(path)), default=0)
    data = f"{path}/data"
    if os.path.isdir(data):
        for d in os.listdir(data):
            if d.startswith("snap="):
                max_id = max(max_id, int(d.split("=", 1)[1]))
    return max_id + 1


def live_snapshot_ids(path: str) -> list[int]:
    """Snapshot ids readers may see: committed to metadata.json, not expired."""
    return [s["snapshot-id"] for s in snapshots(path) if not s.get("expired")]


def committed_snapshot_ids(path: str) -> list[int]:
    """Every snapshot id that ever reached the metadata.json commit point —
    live or expired (compaction expires snapshots but preserves their
    content). A snapshot id absent from this list belongs to a write that
    crashed before its commit: its data is an invisible orphan and its
    manifest rows must not count as stored state."""
    return [s["snapshot-id"] for s in snapshots(path)]


def _write_metadata(path: str, meta: dict) -> None:
    """Atomic metadata swap (os.replace) — the commit point for every table
    operation; readers resolve the live file set through this pointer, so a
    crash before the replace leaves the table exactly as it was."""
    import json

    mpath = f"{path}/metadata.json"
    tmp = f"{mpath}.tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, mpath)


def snapshots(path: str) -> list[dict]:
    """The append-only snapshot log (Iceberg metadata.json analog)."""
    import json

    mpath = f"{path}/metadata.json"
    if not os.path.exists(mpath):
        return []
    with open(mpath) as f:
        return json.load(f).get("snapshots", [])


def _append_snapshot(
    df: DataFrame, path: str, stage: str, key: str, n_buckets: int, sid: int
) -> None:
    """Maintain an Iceberg-style `metadata.json` next to the data: table
    schema, partition spec (bucket transform on the key), and an append-only
    snapshot log. Mirrors the Iceberg table-metadata shape so a real catalog
    can adopt the layout when a runtime jar is provisioned (SURVEY.md §7)."""
    import json
    import time
    import uuid

    mpath = f"{path}/metadata.json"
    meta = {
        "format-version": 2,
        "table-uuid": None,
        "location": path,
        "schema": json.loads(df.schema.json()),
        "partition-spec": [
            {"name": "bucket", "transform": f"bucket[{n_buckets}]", "source": key}
        ],
        "snapshots": [],
    }
    if os.path.exists(mpath):
        with open(mpath) as f:
            meta = json.load(f)
    if meta.get("table-uuid") is None:
        meta["table-uuid"] = str(uuid.uuid4())
    meta["snapshots"].append(
        {
            "snapshot-id": sid,
            "timestamp-ms": int(time.time() * 1000),
            "stage": stage,
            "manifest-list": f"{path}/{MANIFEST}",
            "summary": {"operation": "append"},
        }
    )
    _write_metadata(path, meta)


def _row_checksum_expr(cols: list[str]) -> str:
    inner = ", ".join(f"CAST({c} AS STRING)" for c in cols)
    return f"xxhash64({inner})"


def committed_buckets(spark: SparkSession, path: str, stage: str) -> list[int]:
    """Buckets that are durably committed: manifest rows whose snapshot made it
    into metadata.json. The manifest append precedes the metadata commit, so a
    crash between the two leaves manifest rows for a snapshot readers never
    see — trusting the manifest alone would make resume skip those buckets
    forever while read_stage never returns their rows (silent data loss).
    metadata.json is the sole commit point; the manifest is only an index."""
    mpath = f"{path}/{MANIFEST}"
    if not os.path.exists(mpath):
        return []
    committed = committed_snapshot_ids(path)
    m = spark.read.parquet(mpath)
    return [
        r.bucket
        for r in m.filter(
            (F.col("stage") == stage)
            & (F.col("status") == "committed")
            & F.col("snapshot_id").isin(committed)
        )
        .select("bucket")
        .distinct()
        .collect()
    ]


def resume_stage(
    df: DataFrame,
    path: str,
    stage: str,
    key: str,
    n_buckets: int = 32,
    cell_col: str | None = None,
) -> None:
    """Compute and write only the buckets the manifest has not committed yet.

    The anti-join against the manifest is the resume primitive: at cluster
    scale the source re-read prunes to pending buckets before any work runs.
    """
    spark = df.sparkSession
    done = set(committed_buckets(spark, path, stage))
    pending = [x for x in range(n_buckets) if x not in done]
    if not pending:
        return
    write_stage(df, path, stage, key, n_buckets, cell_col, only_buckets=pending)


def _merge_shadow_filter(path: str, ids: list[int]):
    """Bucket shadowing for MERGE snapshots: a merge rewrites the full
    content of its touched buckets into its own snap= dir, so any OLDER
    snapshot's rows for those buckets are superseded. Returns a Column
    excluding them (True = keep), considering only merge snapshots inside
    `ids` — time travel to a pre-merge snapshot never sees the shadow."""
    keep = F.lit(True)
    for s in snapshots(path):
        sid = s["snapshot-id"]
        summ = s.get("summary", {})
        if sid in ids and summ.get("operation") in ("merge", "delete"):
            bs = summ.get("rewritten-buckets", [])
            if bs:
                keep = keep & ~(
                    (F.col("snap") < F.lit(sid)) & F.col("bucket").isin(bs)
                )
    return keep


def _read_snapshots(spark: SparkSession, path: str, ids: list[int]) -> DataFrame:
    """The one snapshot-scan shape every reader shares: layout guard, then
    scan + snap= partition filter + merge-bucket shadowing + drop. Raises
    the designed error on the pre-snapshot layout and on a table with no
    data at all (instead of an opaque PATH_NOT_FOUND / missing-column
    failure at scan time)."""
    data = f"{path}/data"
    if not os.path.isdir(data):
        raise ValueError(f"{path} has no data directory — nothing committed yet")
    if any(d.startswith("bucket=") for d in os.listdir(data)):
        raise ValueError(
            f"{data} uses the pre-snapshot layout (top-level bucket= dirs); "
            "recreate the stage — mixing layouts breaks partition discovery"
        )
    return (
        spark.read.parquet(data)
        .filter(F.col("snap").isin(ids))
        .filter(_merge_shadow_filter(path, ids))
        .drop("snap")
    )


def read_stage(spark: SparkSession, path: str) -> DataFrame:
    """Current table state = union of the LIVE (metadata-committed, not
    expired) snapshots. Orphan snap= dirs from killed writes are never read —
    metadata.json is the commit pointer, exactly as in Iceberg."""
    return _read_snapshots(spark, path, live_snapshot_ids(path))


def read_stage_at(spark: SparkSession, path: str, snapshot_id: int) -> DataFrame:
    """Time travel: the table AS OF `snapshot_id` — only data written by live
    snapshots <= id is read (the `snap=` partition filter prunes the rest at
    the scan, so time travel costs no extra IO). Raises for ids the log has
    never committed or has expired (e.g. after compaction) instead of
    silently returning wrong AS-OF data."""
    log = {s["snapshot-id"]: s for s in snapshots(path)}
    if snapshot_id not in log:
        raise ValueError(f"snapshot {snapshot_id} was never committed at {path}")
    if log[snapshot_id].get("expired"):
        raise ValueError(
            f"snapshot {snapshot_id} at {path} is expired (compacted away); "
            f"live ids: {live_snapshot_ids(path)}"
        )
    keep = [i for i in live_snapshot_ids(path) if i <= snapshot_id]
    return _read_snapshots(spark, path, keep)


def read_stage_changes(
    spark: SparkSession, path: str, from_snapshot: int, to_snapshot: int | None = None
) -> DataFrame:
    """Incremental (CDC-style) read: ONLY the rows appended by snapshots in
    (from_snapshot, to_snapshot] — the Iceberg incremental-scan analog, and
    the primitive a 100 TB pipeline uses to process new arrivals without
    re-reading the table. The `snap=` partition filter prunes every already-
    processed snapshot at the scan, so cost is proportional to the NEW data
    only. from_snapshot = 0 is the bootstrap: it returns the CURRENT table
    (live snapshots — equivalent to read_stage), which stays valid across
    compaction since compaction preserves content.

    Raises when either cursor is newer than the log (a consumer tracking a
    snapshot this table never committed is corrupt — accepting it would let
    the consumer record an unreachable watermark and silently skip every
    later snapshot), and on every way compaction can cut the ground from
    under a from > 0 cursor:

    - the cursor snapshot itself was never committed (orphan id) or has been
      EXPIRED by compaction — the consumer's watermark predates the rewrite,
      so "rows after the cursor" is no longer a meaningful diff;
    - any snapshot in the range is expired, or is a compacted REPLACE
      snapshot (summary.operation == 'replace'). A replace snapshot rewrites
      ALL live rows — it lands inside (from, to] with an id larger than the
      cursor, so without this guard the read would silently return the
      entire table as "changes" (exactly-once violation: every
      already-processed row replays).

    Failing loudly beats silently replaying the whole table; the consumer
    must re-bootstrap (from_snapshot=0) after any compaction that overtook
    its cursor.
    """
    log = snapshots(path)
    if not log:
        raise ValueError(f"no snapshots committed yet at {path}")
    max_id = max(s["snapshot-id"] for s in log)
    for name, cursor in (("from_snapshot", from_snapshot), ("to_snapshot", to_snapshot)):
        if cursor is not None and cursor > max_id:
            raise ValueError(
                f"{name} {cursor} is newer than the log at {path} "
                f"(latest committed: {max_id})"
            )
    if to_snapshot is None:
        to_snapshot = max_id
    if from_snapshot == 0:
        # bootstrap: the table AS OF to_snapshot, not a diff — survives
        # compaction at the head (the compacted snapshot is live), and an
        # explicit expired/uncommitted to_snapshot raises via read_stage_at
        # instead of silently returning an empty or partial table
        return read_stage_at(spark, path, to_snapshot)
    by_id = {s["snapshot-id"]: s for s in log}
    cur = by_id.get(from_snapshot)
    if cur is None:
        raise ValueError(
            f"from_snapshot {from_snapshot} was never committed at {path} "
            "(orphan id) — the consumer's cursor is corrupt; re-bootstrap"
        )
    if cur.get("expired"):
        raise ValueError(
            f"from_snapshot {from_snapshot} at {path} is expired (compacted "
            "away); rows after it were rewritten into a replace snapshot that "
            "mixes them with already-processed data — re-bootstrap from a "
            "full read (from_snapshot=0)"
        )
    if to_snapshot not in by_id:
        # interior orphan: an id below the max that no commit ever used — a
        # consumer recording it as its watermark would fail its NEXT call's
        # from_snapshot check and be forced into a full re-bootstrap; reject
        # the corrupt cursor now, symmetrically with the from_snapshot check
        raise ValueError(
            f"to_snapshot {to_snapshot} was never committed at {path} "
            "(orphan id) — the consumer's cursor is corrupt; re-bootstrap"
        )
    in_range = [
        s for s in log if from_snapshot < s["snapshot-id"] <= to_snapshot
    ]
    expired = [s["snapshot-id"] for s in in_range if s.get("expired")]
    replaced = [
        s["snapshot-id"]
        for s in in_range
        # a replace (compaction) rewrites ALL live rows; a merge/delete
        # rewrites its touched buckets WHOLE (carried old rows + upserts
        # share one snap= dir) — any of them inside the range would replay
        # already-processed rows
        if s.get("summary", {}).get("operation") in ("replace", "merge", "delete")
    ]
    if expired or replaced:
        raise ValueError(
            f"range ({from_snapshot}, {to_snapshot}] at {path} contains "
            f"expired snapshots {expired} / rewrite (replace/merge) "
            f"snapshots {replaced}; the incremental diff is not recoverable "
            "— re-bootstrap from a full read"
        )
    return _read_snapshots(spark, path, [s["snapshot-id"] for s in in_range])


def merge_stage(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    stage: str,
    key: str,
    n_buckets: int = 32,
) -> tuple[int, list[int]]:
    """MERGE INTO (upsert) with bucket-granular copy-on-write — the Iceberg
    MERGE analog for this layout. Rows in `updates` REPLACE current rows
    with the same `key`; new keys insert. Only the buckets that contain an
    updated key rewrite: the new snapshot holds those buckets' full new
    content (carried survivors + upserts), and readers shadow the same
    buckets in OLDER snapshots (see _merge_shadow_filter), so untouched
    buckets' files are never rewritten or re-read differently.

    At 100 TB that granularity is the whole point: a merge touching 1% of
    keys rewrites ~1% of the table (the touched buckets), not all of it,
    and the rewrite unit (bucket) is the same unit resume/lineage already
    verifies. Snapshot isolation is preserved: time travel to a pre-merge
    snapshot returns pre-merge rows; CDC ranges crossing the merge raise
    (read_stage_changes) because a merge snapshot mixes carried old rows
    with new ones. Commit protocol is write_stage's: data lands invisible
    under a fresh snap= dir, manifest rows append, and metadata.json's
    atomic swap is the single commit point — a crash before it leaves an
    orphan dir readers never see.

    `updates` must carry exactly the table's data columns; `key` and
    `n_buckets` must match the table's partition spec (validated against
    metadata.json). Returns (snapshot_id, rewritten_buckets).
    """
    meta = _load_cow_meta(path, key, n_buckets, "merge")
    upd = _with_bucket(updates, key, n_buckets).cache()
    try:
        touched = sorted(
            r["bucket"] for r in upd.select("bucket").distinct().collect()
        )
        if not touched:
            raise ValueError("merge with an empty updates frame is a no-op bug")
        # Iceberg MERGE raises when multiple source rows match one target
        # key; duplicate update keys here would all insert into the
        # rewritten bucket, silently breaking the 'rows REPLACE current
        # rows' contract — fail fast instead (upd is already cached)
        n_rows, n_keys = upd.agg(
            F.count("*"), F.count_distinct(F.col(key))
        ).first()
        if n_rows != n_keys:
            raise ValueError(
                f"merge updates contain duplicate {key!r} values "
                f"({n_rows} rows, {n_keys} distinct keys) — each key must "
                "appear at most once, like Iceberg MERGE's multiple-match error"
            )
        data_cols = updates.columns
        cur = read_stage(spark, path)
        carried = (
            cur.filter(F.col("bucket").isin(touched))
            # anti-join keys from the CACHED upd, not the raw updates
            # lineage — updates may be an expensive upstream computation
            # that upd was cached precisely to avoid re-running
            .join(upd.select(key).distinct(), key, "left_anti")
        )
        out = carried.select(*data_cols, "bucket").unionByName(
            upd.select(*data_cols, "bucket")
        )
        sid = _commit_cow(out, path, stage, data_cols, touched, meta, "merge")
    finally:
        upd.unpersist()
    return sid, touched


def delete_stage(
    spark: SparkSession,
    keys: DataFrame,
    path: str,
    stage: str,
    key: str,
    n_buckets: int = 32,
) -> tuple[int, list[int]]:
    """Row-level DELETE with the same bucket-granular copy-on-write as
    merge_stage: buckets containing a matching key rewrite WITHOUT the
    deleted rows; every other bucket's files are untouched. A bucket whose
    rows are all deleted simply writes nothing under the new snapshot (the
    shadow hides the old rows). Keys with no matching row are a no-op — if
    NOTHING matches, no snapshot commits and (0, []) returns, so retry
    loops don't pile up empty snapshots.

    Same isolation contracts as merge: pre-delete time travel still sees
    the rows, CDC ranges crossing the delete raise, crashes before the
    metadata commit are invisible."""
    meta = _load_cow_meta(path, key, n_buckets, "delete")
    kdf = keys.select(key).distinct()
    cur = read_stage(spark, path)
    # only buckets that actually contain a matching row rewrite
    touched = sorted(
        r["bucket"]
        for r in cur.join(kdf, key, "semi").select("bucket").distinct().collect()
    )
    if not touched:
        return 0, []
    data_cols = [c for c in cur.columns if c != "bucket"]
    out = (
        cur.filter(F.col("bucket").isin(touched))
        .join(kdf, key, "left_anti")
        .select(*data_cols, "bucket")
    )
    sid = _commit_cow(out, path, stage, data_cols, touched, meta, "delete")
    return sid, touched


def _load_cow_meta(path: str, key: str, n_buckets: int, op: str) -> dict:
    """Load metadata.json and validate the (key, n_buckets) spec — hashing
    with a different spec would route keys to the wrong buckets and
    silently duplicate (merge) or miss (delete) them."""
    import json

    mpath = f"{path}/metadata.json"
    if not os.path.exists(mpath):
        raise ValueError(f"{path} has no metadata.json — nothing to {op} into")
    with open(mpath) as f:
        meta = json.load(f)
    spec = (meta.get("partition-spec") or [{}])[0]
    want = f"bucket[{n_buckets}]"
    if spec.get("transform") != want or spec.get("source") != key:
        raise ValueError(
            f"{op} spec mismatch at {path}: table is "
            f"{spec.get('transform')} on {spec.get('source')!r}, {op} asked "
            f"{want} on {key!r} — hashing with a different spec would route "
            "keys to the wrong buckets and silently corrupt them"
        )
    return meta


def _commit_cow(
    out: DataFrame, path: str, stage: str, data_cols: list[str],
    touched: list[int], meta: dict, op: str,
) -> int:
    """Shared copy-on-write commit (merge + delete): write the touched
    buckets' new content under a fresh snap= dir, append manifest rows,
    then the atomic metadata swap — the single commit point. `op` is
    recorded verbatim in the snapshot summary ('merge'/'delete') so the
    audit trail reports deletes as deletes; every consumer
    (_merge_shadow_filter, read_stage_changes, verify_manifest) treats both
    ops as bucket-rewriting."""
    import time

    sid = next_snapshot_id(path)
    out = out.cache()
    try:
        out.write.mode("append").partitionBy("bucket").parquet(
            f"{path}/data/snap={sid}"
        )
        manifest = out.groupBy("bucket").agg(
            F.lit(stage).alias("stage"),
            F.lit(sid).alias("snapshot_id"),
            F.lit(None).cast("long").alias("cell_min"),
            F.lit(None).cast("long").alias("cell_max"),
            F.count("*").alias("rows"),
            F.expr(
                "bit_xor(" + _row_checksum_expr(data_cols) + ")"
            ).alias("checksum"),
            F.lit("committed").alias("status"),
        )
        manifest.select(
            "stage", "snapshot_id", "bucket", "cell_min", "cell_max",
            "rows", "checksum", "status"
        ).write.mode("append").parquet(f"{path}/{MANIFEST}")
        meta["snapshots"].append(
            {
                "snapshot-id": sid,
                "timestamp-ms": int(time.time() * 1000),
                "stage": stage,
                "manifest-list": f"{path}/{MANIFEST}",
                "summary": {
                    "operation": op,
                    "rewritten-buckets": touched,
                },
            }
        )
        _write_metadata(path, meta)  # <- the commit point
    finally:
        out.unpersist()
    return sid


def compact_stage(spark: SparkSession, path: str) -> tuple[int, int]:
    """Small-file maintenance (the rewrite_data_files + expire_snapshots
    analog): rewrites every committed snapshot's data into ONE fresh snapshot
    with one file per bucket, swaps it in, and marks prior snapshots expired
    in metadata.json.

    Logical content is unchanged — verify_manifest still passes, because the
    manifest describes content (rows + order-insensitive checksums), not
    files. Time travel to expired snapshots is intentionally given up (the
    same trade Iceberg snapshot expiration makes). At 100 TB scale this is
    the defense against the accumulating-small-files problem: resume-heavy
    pipelines append many partial snapshots whose file count, not byte count,
    comes to dominate scan planning time.

    Crash safety: the compacted snapshot is written as a fresh snap= dir
    INSIDE data/ (readers ignore it — they resolve live snapshots from
    metadata.json), then the metadata pointer is swapped atomically
    (os.replace). A crash at any earlier point leaves the table unchanged; a
    rerun picks a fresh id (next_snapshot_id also scans disk, so a crashed
    attempt's dir is never reused) and the orphan is deleted by the cleanup
    phase of the next successful compaction. Expired data dirs are removed
    best-effort AFTER the commit — a crash mid-cleanup leaves garbage that
    readers never see.

    Returns (files_before, files_after) counted over LIVE snapshots.
    """
    import json
    import shutil
    import time

    data = f"{path}/data"

    def _count_files(ids: list[int]) -> int:
        n = 0
        for sid_ in ids:
            for _, _, files in os.walk(f"{data}/snap={sid_}"):
                n += sum(1 for f in files if f.endswith(".parquet"))
        return n

    live = live_snapshot_ids(path)
    before = _count_files(live)
    sid = next_snapshot_id(path)
    df = read_stage(spark, path)
    # one shuffle task per bucket value -> one file per bucket; invisible to
    # readers until the metadata commit below
    df.repartition(F.col("bucket")).write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(f"{data}/snap={sid}")

    mpath = f"{path}/metadata.json"
    with open(mpath) as f:
        meta = json.load(f)
    for s in meta["snapshots"]:
        s["expired"] = True
    meta["snapshots"].append(
        {
            "snapshot-id": sid,
            "timestamp-ms": int(time.time() * 1000),
            "stage": "_compaction",
            "manifest-list": f"{path}/{MANIFEST}",
            "summary": {"operation": "replace"},
        }
    )
    _write_metadata(path, meta)  # <- the commit point

    # post-commit cleanup: every snap dir that is not the live compacted one
    # (expired snapshots AND orphans from crashed attempts)
    for d in os.listdir(data):
        if d.startswith("snap=") and d != f"snap={sid}":
            shutil.rmtree(f"{data}/{d}", ignore_errors=True)
    return before, _count_files([sid])


def remove_orphan_files(path: str, older_than_s: float = 0.0) -> list[int]:
    """Delete snap= data dirs that never reached the metadata.json commit
    point (the Iceberg remove_orphan_files maintenance action): a write
    killed between its parquet write and its metadata append leaves a dir
    readers can never see, holding disk until cleaned.

    Unlike compact_stage (which rewrites data and expires history), this is
    a pure garbage collection — live AND expired committed snapshots are
    untouched, so logical content, time travel, and manifests are all
    unchanged.

    `older_than_s` mirrors Iceberg's `older_than` guard: a snap dir younger
    than this many seconds is kept even if uncommitted, because it may be an
    IN-FLIGHT write whose metadata append hasn't happened yet — deleting it
    would corrupt a concurrent writer. Production default in Iceberg is 3
    days; tests pass 0 to collect immediately.

    Returns the snapshot ids whose dirs were removed.
    """
    import shutil
    import time

    data = f"{path}/data"
    if not os.path.isdir(data):
        return []
    committed = set(committed_snapshot_ids(path))
    removed: list[int] = []
    now = time.time()
    for d in sorted(os.listdir(data)):
        if not d.startswith("snap="):
            continue
        sid = int(d.split("=", 1)[1])
        if sid in committed:
            continue
        full = f"{data}/{d}"
        if now - os.path.getmtime(full) < older_than_s:
            continue  # possibly an in-flight write — the Iceberg age guard
        shutil.rmtree(full, ignore_errors=True)
        removed.append(sid)
    return removed


def verify_manifest(spark: SparkSession, path: str, stage: str, df: DataFrame,
                    key: str, n_buckets: int = 32) -> bool:
    """Recompute per-bucket (rows, checksum) from df and compare to manifest."""
    data_cols = df.columns
    expected = (
        _with_bucket(df, key, n_buckets)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("rows_e"),
            F.expr("bit_xor(" + _row_checksum_expr(data_cols) + ")").alias("sum_e"),
        )
    )
    # same committed-snapshot filter as committed_buckets: manifest rows from
    # a crashed (metadata-uncommitted) write must not count toward stored state
    committed = committed_snapshot_ids(path)
    # merge shadowing: a MERGE rewrote its touched buckets' full content, so
    # manifest rows for those buckets from OLDER snapshots describe
    # superseded data — permanently (compaction preserves the post-merge
    # content), hence ALL committed merges shadow, expired or not
    keep = F.lit(True)
    for s in snapshots(path):
        summ = s.get("summary", {})
        if summ.get("operation") in ("merge", "delete"):
            bs = summ.get("rewritten-buckets", [])
            if bs:
                keep = keep & ~(
                    (F.col("snapshot_id") < F.lit(s["snapshot-id"]))
                    & F.col("bucket").isin(bs)
                )
    m = (
        spark.read.parquet(f"{path}/{MANIFEST}")
        .filter(
            (F.col("stage") == stage)
            & (F.col("status") == "committed")
            & F.col("snapshot_id").isin(committed)
        )
        .filter(keep)
        .groupBy("bucket")
        .agg(F.sum("rows").alias("rows_m"), F.expr("bit_xor(checksum)").alias("sum_m"))
    )
    # a manifest row with rows_m = 0 (an explicitly-committed empty bucket)
    # legitimately has no expected-side row; checksums only compare when
    # the bucket actually holds rows (XOR over zero rows is the neutral 0)
    diff = expected.join(m, "bucket", "full").filter(
        (F.coalesce(F.col("rows_e"), F.lit(0)) != F.coalesce(F.col("rows_m"), F.lit(0)))
        | (
            (F.coalesce(F.col("rows_e"), F.lit(0)) > 0)
            & (F.col("sum_e") != F.col("sum_m"))
        )
    )
    return diff.isEmpty()


def expire_snapshots(
    spark: SparkSession, path: str, keep_last: int = 1
) -> list[int]:
    """Iceberg's expire_snapshots maintenance action: drop live snapshots
    whose every row is SHADOWED by later merge/delete rewrites — they
    contribute nothing to the current view and exist only for time travel.
    Expired ids keep their metadata entry (marked expired, so
    read_stage_at raises the designed error instead of returning wrong
    AS-OF data) and their snap= data dir is deleted.

    Safety rules, checked per candidate:
    - the newest `keep_last` live snapshots are never expired (Iceberg's
      retain-last), whatever their contribution;
    - a snapshot is expired ONLY if its visible row count under the
      current shadow filter is exactly 0 (a row-level check, one pruned
      scan per candidate — partition filters make it cheap), so partial
      shadowing can never lose data.

    Returns the expired snapshot ids."""
    import json
    import shutil

    live = live_snapshot_ids(path)
    if len(live) <= keep_last:
        return []
    current = set(live)
    expired: list[int] = []
    data = f"{path}/data"
    for sid in live[:-keep_last] if keep_last else live:
        # this snapshot's partition, under the full shadow filter of the
        # current live set — snap= partition pruning makes it one small scan
        contrib = (
            spark.read.parquet(data)
            .filter(F.col("snap") == sid)
            .filter(_merge_shadow_filter(path, sorted(current)))
            .limit(1)
            .count()
        )
        if contrib == 0:
            expired.append(sid)
            current.discard(sid)

    if not expired:
        return []
    meta_path = f"{path}/metadata.json"
    with open(meta_path) as f:
        meta = json.load(f)
    for s in meta["snapshots"]:
        if s["snapshot-id"] in expired:
            s["expired"] = True
            s.setdefault("summary", {})["expired-by"] = "expire_snapshots"
    _write_metadata(path, meta)
    for sid in expired:
        shutil.rmtree(f"{path}/data/snap={sid}", ignore_errors=True)
    return expired
