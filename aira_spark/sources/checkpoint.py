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


def _row_checksum(df: DataFrame, cols: list[str]):
    return F.xxhash64(*[F.col(c).cast("string") for c in cols])


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
    spark = df.sparkSession
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
        manifest.select(
            "stage", "snapshot_id", "bucket", "cell_min", "cell_max", "rows",
            "checksum", "status"
        ).write.mode("append").parquet(f"{path}/{MANIFEST}")
        _append_snapshot(df, path, stage, key, n_buckets, sid)
    finally:
        b.unpersist()


def next_snapshot_id(path: str) -> int:
    """The id the NEXT write_stage commit will use (metadata.json log + 1)."""
    import json

    mpath = f"{path}/metadata.json"
    if not os.path.exists(mpath):
        return 1
    with open(mpath) as f:
        return len(json.load(f).get("snapshots", [])) + 1


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
    with open(mpath, "w") as f:
        json.dump(meta, f, indent=1)


def _row_checksum_expr(cols: list[str]) -> str:
    inner = ", ".join(f"CAST({c} AS STRING)" for c in cols)
    return f"xxhash64({inner})"


def committed_buckets(spark: SparkSession, path: str, stage: str) -> list[int]:
    mpath = f"{path}/{MANIFEST}"
    if not os.path.exists(mpath):
        return []
    m = spark.read.parquet(mpath)
    return [
        r.bucket
        for r in m.filter((F.col("stage") == stage) & (F.col("status") == "committed"))
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


def read_stage(spark: SparkSession, path: str) -> DataFrame:
    """Current table state = union of all committed snapshots."""
    return spark.read.parquet(f"{path}/data").drop("snap")


def read_stage_at(spark: SparkSession, path: str, snapshot_id: int) -> DataFrame:
    """Time travel: the table AS OF `snapshot_id` — only data files written by
    snapshots <= id are read (the `snap=` partition filter prunes the rest at
    the scan, so time travel costs no extra IO)."""
    return (
        spark.read.parquet(f"{path}/data")
        .filter(F.col("snap") <= F.lit(snapshot_id))
        .drop("snap")
    )


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

    Returns (files_before, files_after).
    """
    import json

    def _count_files(root: str) -> int:
        n = 0
        for _, _, files in os.walk(root):
            n += sum(1 for f in files if f.endswith(".parquet"))
        return n

    data = f"{path}/data"
    before = _count_files(data)
    sid = next_snapshot_id(path)
    df = spark.read.parquet(data).drop("snap")
    # one shuffle task per bucket value -> one file per bucket
    df.repartition(F.col("bucket")).write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(f"{path}/data_new/snap={sid}")

    import shutil

    shutil.move(data, f"{path}/data_expired")
    shutil.move(f"{path}/data_new", data)
    shutil.rmtree(f"{path}/data_expired", ignore_errors=True)

    mpath = f"{path}/metadata.json"
    with open(mpath) as f:
        meta = json.load(f)
    for s in meta["snapshots"]:
        s["expired"] = True
    import time

    meta["snapshots"].append(
        {
            "snapshot-id": sid,
            "timestamp-ms": int(time.time() * 1000),
            "stage": "_compaction",
            "manifest-list": f"{path}/{MANIFEST}",
            "summary": {"operation": "replace"},
        }
    )
    with open(mpath, "w") as f:
        json.dump(meta, f, indent=1)
    return before, _count_files(data)


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
    m = (
        spark.read.parquet(f"{path}/{MANIFEST}")
        .filter((F.col("stage") == stage) & (F.col("status") == "committed"))
        .groupBy("bucket")
        .agg(F.sum("rows").alias("rows_m"), F.expr("bit_xor(checksum)").alias("sum_m"))
    )
    diff = expected.join(m, "bucket", "full").filter(
        (F.col("rows_e") != F.col("rows_m"))
        | (F.col("sum_e") != F.col("sum_m"))
        | F.col("rows_e").isNull()
        | F.col("rows_m").isNull()
    )
    return diff.isEmpty()
