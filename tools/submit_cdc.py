"""spark-submit CDC-consumer probe: exactly-once incremental processing over
the checkpoint store's snapshot log, surviving a mid-stream kill.

Run form (tools/run_submit_cdc.sh; swap --master on a real cluster):

    spark-submit --master local[8] --py-files /tmp/aira_spark.zip \
        tools/submit_cdc.py /root/testdata/sf0.001 /tmp/cdc_out

Scenario (the round-2 ADVICE contract, driven end-to-end):
  1. producer appends batch 1 -> consumer processes (0, 1]
  2. producer appends batch 2 -> consumer writes its output for (1, 2] but
     CRASHES before advancing its cursor (kill simulation)
  3. consumer restarts: re-reads (1, 2] — the overwrite-by-range output
     layout makes the replay idempotent — and advances the cursor
  4. producer appends batch 3 -> consumer processes (2, 3]
  5. PROOF: the union of consumed ranges equals the full table exactly
     (row count + order-insensitive checksum), i.e. every row was processed
     exactly once despite the kill
  6. compaction overtakes a stale cursor -> read_stage_changes raises the
     re-bootstrap error (the silent-replay hole closed this round), and the
     consumer recovers by re-bootstrapping from snapshot 0

The consumer cursor is persisted like any real CDC consumer's watermark
(a JSON file next to its output); output idempotence comes from writing each
range to its own directory with mode=overwrite — the Iceberg-consumer
pattern at any scale.
"""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _cursor_path(out: str) -> str:
    return f"{out}/consumer_cursor.json"


def _load_cursor(out: str) -> int:
    p = _cursor_path(out)
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return json.load(f)["cursor"]


def _save_cursor(out: str, cursor: int) -> None:
    with open(_cursor_path(out), "w") as f:
        json.dump({"cursor": cursor}, f)


def consume(spark: SparkSession, stage_path: str, out: str, crash_before_commit: bool = False) -> int:
    """One consumer poll: process (cursor, head], write the derived output
    idempotently (one overwritten dir per range), then advance the cursor.
    Returns rows processed. crash_before_commit simulates a kill AFTER the
    output write but BEFORE the cursor advance — the replay-prone window."""
    from aira_spark.sources.checkpoint import read_stage_changes, snapshots

    cursor = _load_cursor(out)
    head = max(s["snapshot-id"] for s in snapshots(stage_path))
    if head <= cursor:
        return 0
    # cache: the range is scanned for the derived write AND the row count —
    # one snapshot-range read per poll, not two
    changes = read_stage_changes(spark, stage_path, cursor, head).cache()
    # the derived computation a real consumer would run (per-cell counts)
    derived = changes.groupBy("cell").agg(F.count("*").alias("n"))
    derived.write.mode("overwrite").parquet(f"{out}/consumed/range_{cursor}_{head}")
    n = changes.count()
    changes.unpersist()
    if crash_before_commit:
        print(f"CONSUMER kill simulated after output write, before cursor advance "
              f"(range ({cursor}, {head}], rows={n})")
        return n
    _save_cursor(out, head)
    print(f"CONSUMER processed ({cursor}, {head}] rows={n}")
    return n


def _checksum(df: DataFrame, cols: list[str]) -> int:
    row = df.select(
        F.expr(
            "bit_xor(xxhash64(" + ", ".join(f"CAST({c} AS STRING)" for c in cols) + "))"
        ).alias("x")
    ).collect()[0]
    return row.x or 0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/cdc_out"

    spark = SparkSession.builder.appName("aira-cdc-consumer").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from aira_spark.functions.cells import cell_from_xy
    from aira_spark.sources.checkpoint import (
        compact_stage,
        read_stage,
        read_stage_changes,
        write_stage,
    )
    from aira_spark.sources.vectors import points_table

    import shutil

    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    stage = f"{out}/points_stage"

    pts = points_table(spark, sf_dir).select(
        "point_id", cell_from_xy(F.col("x"), F.col("y"), 7).alias("cell")
    ).cache()

    # --- three producer appends, consumer polling between them ---
    thirds = [pts.filter(F.col("point_id") % 3 == i) for i in range(3)]
    write_stage(thirds[0], stage, "pts", key="point_id", n_buckets=8, cell_col="cell")
    n1 = consume(spark, stage, out)                       # (0, 1]

    write_stage(thirds[1], stage, "pts", key="point_id", n_buckets=8, cell_col="cell")
    consume(spark, stage, out, crash_before_commit=True)  # kill mid-stream
    n2 = consume(spark, stage, out)                       # resume: replays (1, 2]

    write_stage(thirds[2], stage, "pts", key="point_id", n_buckets=8, cell_col="cell")
    n3 = consume(spark, stage, out)                       # (2, 3]

    # --- exactly-once proof: incremental union == full table ---
    full = read_stage(spark, stage).select("point_id", "cell")
    inc = (
        read_stage_changes(spark, stage, 0, 1)
        .unionByName(read_stage_changes(spark, stage, 1, 2))
        .unionByName(read_stage_changes(spark, stage, 2, 3))
        .select("point_id", "cell")
    )
    # materialize BEFORE compaction: these plans scan the pre-compaction
    # snapshot dirs, which compaction's post-commit cleanup deletes
    n_full = full.count()
    rows_match = n_full == inc.count() == n1 + n2 + n3
    sum_match = _checksum(full, ["point_id", "cell"]) == _checksum(inc, ["point_id", "cell"])
    print(f"EXACTLY_ONCE rows_match={rows_match} checksum_match={sum_match} "
          f"(n1={n1} n2={n2} n3={n3} total={n_full})")

    # --- compaction overtakes the cursor: loud error, then re-bootstrap ---
    compact_stage(spark, stage)
    try:
        read_stage_changes(spark, stage, 3)  # cursor 3 was expired by compaction
        print("COMPACTION_GUARD FAILED: stale cursor read did not raise")
    except ValueError as exc:
        print(f"COMPACTION_GUARD ok: {str(exc)[:90]}...")
    n_boot = read_stage_changes(spark, stage, 0).count()  # re-bootstrap path
    print(f"REBOOTSTRAP rows={n_boot} (== full {n_full})")

    # --- MERGE INTO: bucket-granular upsert, then the same cursor contract ---
    from aira_spark.sources.checkpoint import merge_stage, snapshots

    pre_merge = max(s["snapshot-id"] for s in snapshots(stage))
    updates = pts.filter(F.col("point_id") % 97 == 0).select(
        "point_id", (-F.col("point_id")).alias("cell")  # sentinel new value
    )
    n_upd = updates.count()
    merge_stage(spark, updates, stage, "pts", key="point_id", n_buckets=8)
    merged = read_stage(spark, stage)
    # sentinel check must match the update rule, not `cell < 0`: point_id 0
    # is a legitimate key and its sentinel -0 == 0
    n_sentinel = merged.filter(
        (F.col("point_id") % 97 == 0) & (F.col("cell") == -F.col("point_id"))
    ).count()
    merge_rows_ok = merged.count() == n_full and n_sentinel == n_upd
    try:
        read_stage_changes(spark, stage, pre_merge)  # range contains the merge
        merge_guard_ok = False
        print("MERGE_GUARD FAILED: cursor across a merge did not raise")
    except ValueError as exc:
        merge_guard_ok = True
        print(f"MERGE_GUARD ok: {str(exc)[:90]}...")
    # re-bootstrap sees exactly the upserted state
    boot2 = read_stage_changes(spark, stage, 0).select("point_id", "cell")
    expect = pts.select(
        "point_id",
        F.when(F.col("point_id") % 97 == 0, -F.col("point_id"))
        .otherwise(F.col("cell")).alias("cell"),
    )
    merge_sum_ok = _checksum(boot2, ["point_id", "cell"]) == _checksum(
        expect, ["point_id", "cell"]
    )
    print(f"MERGE_PROBE rows_ok={merge_rows_ok} guard_ok={merge_guard_ok} "
          f"checksum_ok={merge_sum_ok} (upserts={n_upd})")

    ok = (rows_match and sum_match and n_boot == n_full
          and merge_rows_ok and merge_guard_ok and merge_sum_ok)
    print(f"CDC_PROBE {'PASS' if ok else 'FAIL'}")
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
