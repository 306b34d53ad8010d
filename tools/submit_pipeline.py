"""spark-submit entry point: the full pipeline as a cluster job (north rule).

Run form (evidenced in tools/run_submit.sh; on a real cluster swap --master):

    cd /root/repo && python -c "import tools.package as p; p.build()"
    spark-submit --master local[8] --py-files /tmp/aira_spark.zip \
        tools/submit_pipeline.py /root/testdata/sf0.001 /tmp/submit_out

Stages (each checkpointed to the Iceberg-layout store with per-partition
lineage, so a killed job resumes at bucket granularity):
  1. ingest    — synthesize/scan the images table
  2. tiles     — meta decode -> chunk/tile enumeration -> cell cover
  3. joined    — footprint cells x points spatial join, per-cell rollup

The job prints per-stage row counts and the manifest tail; rerunning after a
kill recomputes only uncommitted buckets (see tests/test_checkpoint.py for
the kill-and-resume equivalence proof).
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/submit_out"

    spark = SparkSession.builder.appName("aira-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # imports resolved from --py-files zip on executors
    from aira_spark.functions.cells import cell_from_xy
    from aira_spark.operators.chunks import cell_cover, with_meta
    from aira_spark.sources.checkpoint import read_stage, resume_stage
    from aira_spark.sources.images import images_table
    from aira_spark.sources.vectors import points_table

    cell_res = 7

    images = images_table(spark, sf_dir)

    def build_cover() -> "F.DataFrame":
        wm = with_meta(images).select("image_id", "meta")
        return cell_cover(wm, cell_res).select(
            "image_id", F.col("cell").cast("long").alias("cell")
        )

    # stage: cover (checkpointed, resumable: only uncommitted buckets run)
    resume_stage(build_cover(), f"{out}/cover", "cover", key="image_id",
                 n_buckets=16, cell_col="cell")
    cover = read_stage(spark, f"{out}/cover")
    n_cover = cover.count()

    # stage: spatial join + rollup (checkpointed)
    pts = points_table(spark, sf_dir).select(
        "point_id", cell_from_xy(F.col("x"), F.col("y"), cell_res).alias("cell")
    )
    rollup = (
        cover.join(pts, "cell")
        .groupBy("cell")
        .agg(
            F.countDistinct("image_id").alias("n_images"),
            F.countDistinct("point_id").alias("n_points"),
        )
    )
    resume_stage(rollup, f"{out}/rollup", "rollup", key="cell",
                 n_buckets=8, cell_col="cell")
    n_rollup = read_stage(spark, f"{out}/rollup").count()

    # stage: analytics over the ingested points under --py-files — the
    # round-4 operators run as cluster-job stages too (checkpointed)
    from aira_spark.operators.dbscan import grid_dbscan
    from aira_spark.sources.vectors import points_table as pts_table

    clusters = grid_dbscan(pts_table(spark, sf_dir), res=cell_res, min_pts=5)
    resume_stage(
        clusters.selectExpr("gx * 1024 + gy AS cellkey", "*"),
        f"{out}/dbscan", "dbscan", key="cellkey", n_buckets=8,
        cell_col="cellkey",
    )
    n_dbscan = read_stage(spark, f"{out}/dbscan").count()
    n_cores = (
        read_stage(spark, f"{out}/dbscan").where("role = 'core'").count()
    )
    print(f"DBSCAN cells={n_dbscan} cores={n_cores}")

    # table maintenance: compact the cover stage's snapshots (resume-heavy
    # runs accumulate one file set per partial commit) and prove content
    # equality via the manifest checksums
    from aira_spark.sources.checkpoint import compact_stage, verify_manifest

    files_before, files_after = compact_stage(spark, f"{out}/cover")
    ok = verify_manifest(
        spark, f"{out}/cover", "cover", build_cover(), key="image_id", n_buckets=16
    )
    print(f"COMPACTION files {files_before} -> {files_after} verify={ok}")

    manifest = spark.read.parquet(f"{out}/cover/_manifest")
    print(f"RESULT cover_rows={n_cover} rollup_rows={n_rollup}")
    print("MANIFEST sample:")
    for r in manifest.orderBy("bucket").limit(5).collect():
        print(
            f"  stage={r.stage} bucket={r.bucket} rows={r.rows} "
            f"cells=[{r.cell_min},{r.cell_max}] checksum={r.checksum}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
