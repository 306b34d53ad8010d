"""Incremental image ingest under Structured Streaming (SURVEY.md §7's
optional streaming path, made real): newly-arriving image files stream
through the SAME decode UDF + footprint cell-cover operators as the batch
pipeline and append to a parquet sink per microbatch.

All operators in the chain (pandas-UDF metadata decode, footprint
projection, cover explode) are stateless row transforms, so append mode
needs no watermark and the accumulated sink equals the batch result exactly
— which is what the DuckDB oracle checks. maxFilesPerTrigger=1 forces
multiple microbatches so the incremental path is genuinely exercised.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_image_cover_stream(
    spark: SparkSession, images: DataFrame, res: int
) -> DataFrame:
    """Stream `images` (staged as 4 parquet files, one microbatch each)
    through meta-decode -> cell cover; returns the accumulated sink as a
    DataFrame of (image_id, cell)."""
    from ..operators.chunks import cell_cover, with_meta

    # the sink intentionally outlives this call — it IS the returned table
    # (the DataFrame reads it lazily); stage + checkpoint are cleaned on
    # every path, including failures before the stream starts
    stage = tempfile.mkdtemp(prefix="aira_ingest_src_")
    sink = tempfile.mkdtemp(prefix="aira_ingest_sink_")
    ckpt = tempfile.mkdtemp(prefix="aira_ingest_ckpt_")
    try:
        images.select("image_id", "bytes").repartition(4).write.mode(
            "overwrite"
        ).parquet(stage)
        schema = spark.read.parquet(stage).schema

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        covered = cell_cover(with_meta(stream), res).select("image_id", "cell")
        q = (
            covered.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout=600):
            q.stop()
            raise RuntimeError("image ingest stream did not finish within 600s")
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.read.parquet(sink)
