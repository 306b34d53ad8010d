"""Structured Streaming path: incremental event aggregation.

readStream -> watermark -> windowed aggregation -> writeStream (availableNow,
memory sink). Demonstrates the streaming ingest pattern for incremental image
arrival (SURVEY.md §1.4: streaming optional) — same aggregation semantics as
the batch events_hourly query, so the two are cross-checkable.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_events_hourly_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the hourly event rollup as a stream over the events table; returns
    the final (batch) result table."""
    src = f"{sf_dir}/events.parquet"
    stage = tempfile.mkdtemp(prefix="aira_stream_")
    shutil.copy(src, os.path.join(stage, "events.parquet"))
    schema = spark.read.parquet(src).schema

    name = f"events_hourly_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(schema)
        .parquet(stage)
        # watermarks require TIMESTAMP (the parquet column is TIMESTAMP_NTZ);
        # session timezone is pinned to UTC so the cast is value-preserving
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.expr("CAST(FLOOR(value * 100.0) AS BIGINT)")).alias("value_cents"),
        )
        .select(
            F.col("event_type"),
            F.col("window.start").cast("string").alias("hour"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("value_cents").cast("long").alias("value_cents"),
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    shutil.rmtree(stage, ignore_errors=True)
    return spark.table(name)
