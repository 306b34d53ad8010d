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

from py4j.protocol import Py4JError
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _run_to_table(
    spark: SparkSession, stream: DataFrame, prefix: str, mode: str, stage: str
) -> DataFrame:
    """Shared availableNow -> memory-sink runner: starts the query, awaits
    completion (raising — not silently returning partial results — if the
    timeout elapses), then removes the staging dir and returns the table.

    State-store partition sizing: a streaming query's state partition count
    is frozen from spark.sql.shuffle.partitions at START — and every stateful
    operator pays per-partition state-store open/commit/maintenance in EVERY
    microbatch (a stream-stream join keeps 4 stores per partition), so
    inheriting a batch-analytics conf (64 here) makes tiny-state queries pay
    64x fixed overhead per batch: measured 39s -> 10s at sf0.1 for
    stream_stream_join just by sizing this down. Production sizing is
    state volume / target rows-per-partition, set explicitly per stream;
    the sandbox runners stage bounded inputs (<= hundreds of k rows), so the
    default is a small constant, env-overridable
    (SPARK_GRAFT_STREAM_STATE_PARTITIONS). Hash partitioning of state is
    semantics-free — results are bit-identical at any setting (oracle-gated).
    The session conf is restored after the run; batch queries never see it."""
    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    state_sp = min(
        int(old_sp),
        max(1, int(os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "8"))),
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(state_sp))
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout=600):
            q.stop()
            raise RuntimeError(f"streaming query {name} did not finish within 600s")
        # capture the executed streaming plan for plan-shape tests (PLANS.md
        # evidence): batch DataFrames can't see inside a streaming query
        try:
            LAST_PLANS[prefix] = q._jsq.explainInternal(True)
        except (Py4JError, AttributeError):
            # _jsq is an internal API (absent under Spark Connect;
            # explainInternal can throw through py4j) — evidence only,
            # never fail the run for it
            pass
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        shutil.rmtree(stage, ignore_errors=True)
    return spark.table(name)


# last executed streaming plan per runner prefix (evidence for plan tests)
LAST_PLANS: dict[str, str] = {}


def _n_batches() -> int:
    """Microbatch count for the sketch streams (files staged with
    maxFilesPerTrigger=1). Default 4; bench.py sets
    SPARK_GRAFT_STREAM_BATCHES=2 — per-microbatch session overhead, not
    data, dominates these at bench scale. Oracle/pytest runs leave it
    unset, so correctness always exercises 4-batch accumulation."""
    return max(1, int(os.environ.get("SPARK_GRAFT_STREAM_BATCHES", "4")))


def run_sessionize_stream(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 30
) -> DataFrame:
    """Streaming sessionization: merge events per event_type into sessions
    separated by > gap_minutes of inactivity, via the built-in
    `session_window` (watermarked, stateful merge inside Spark's streaming
    state store). Session end = last event ts + gap (Spark semantics; the
    DuckDB oracle reproduces the same split rule with a lag/cumsum).

    Returns (event_type, start_us, end_us, n_events, value_cents) — epoch
    microseconds so both engines compare exact integers, not timestamp
    formatting."""
    src = f"{sf_dir}/events.parquet"
    stage = tempfile.mkdtemp(prefix="aira_sessions_")
    shutil.copy(src, os.path.join(stage, "events.parquet"))
    schema = spark.read.parquet(src).schema

    stream = (
        spark.readStream.schema(schema)
        .parquet(stage)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.expr("CAST(FLOOR(value * 100.0) AS BIGINT)")).alias("value_cents"),
        )
        .select(
            "event_type",
            F.unix_micros(F.col("session_window.start")).alias("start_us"),
            F.unix_micros(F.col("session_window.end")).alias("end_us"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("value_cents").cast("long").alias("value_cents"),
        )
    )
    return _run_to_table(spark, stream, "sessions", "complete", stage)


def run_stateful_totals_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): running
    per-(event_type, user_bucket) totals carried across microbatches.

    The input is staged as 4 parquet files read with maxFilesPerTrigger=1, so
    the state genuinely crosses batch boundaries (each key's totals accumulate
    over up to 4 updates). Totals are order-independent (count/sum/min/max),
    so the final emission per key equals the batch aggregate — which is what
    the DuckDB oracle computes. Update-mode memory sink keeps every emission;
    the final row per key is selected with max_by on the monotone count."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as Ty

    src = f"{sf_dir}/events.parquet"
    stage = tempfile.mkdtemp(prefix="aira_stateful_")
    spark.read.parquet(src).repartition(4).write.mode("overwrite").parquet(stage)
    schema = spark.read.parquet(src).schema

    out_schema = Ty.StructType(
        [
            Ty.StructField("event_type", Ty.StringType()),
            Ty.StructField("user_bucket", Ty.LongType()),
            Ty.StructField("n_events", Ty.LongType()),
            Ty.StructField("value_cents", Ty.LongType()),
            Ty.StructField("min_ts_us", Ty.LongType()),
            Ty.StructField("max_ts_us", Ty.LongType()),
        ]
    )
    state_schema = Ty.StructType(
        [
            Ty.StructField("n", Ty.LongType()),
            Ty.StructField("cents", Ty.LongType()),
            Ty.StructField("mn", Ty.LongType()),
            Ty.StructField("mx", Ty.LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import numpy as np

        n, cents, mn, mx = state.get if state.exists else (0, 0, None, None)
        for pdf in pdfs:
            us = pdf["ts"].astype("int64") // 1000
            n += len(pdf)
            cents += int(np.floor(pdf["value"].to_numpy() * 100.0).astype("int64").sum())
            bmn, bmx = int(us.min()), int(us.max())
            mn = bmn if mn is None else min(mn, bmn)
            mx = bmx if mx is None else max(mx, bmx)
        state.update((n, cents, mn, mx))
        yield pd.DataFrame(
            [(key[0], key[1], n, cents, mn, mx)], columns=out_schema.fieldNames()
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .withColumn("user_bucket", F.col("user_id") % 16)
        .groupBy("event_type", "user_bucket")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )
    emitted = _run_to_table(spark, stream, "stateful", "update", stage)
    # last (= running-total) emission per key: n_events is strictly increasing
    return (
        emitted
        .groupBy("event_type", "user_bucket")
        .agg(
            F.max("n_events").alias("n_events"),
            F.expr("max_by(value_cents, n_events)").alias("value_cents"),
            F.expr("max_by(min_ts_us, n_events)").alias("min_ts_us"),
            F.expr("max_by(max_ts_us, n_events)").alias("max_ts_us"),
        )
    )


def run_events_hourly_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the hourly event rollup as a stream over the events table; returns
    the final (batch) result table."""
    src = f"{sf_dir}/events.parquet"
    stage = tempfile.mkdtemp(prefix="aira_stream_")
    shutil.copy(src, os.path.join(stage, "events.parquet"))
    schema = spark.read.parquet(src).schema

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
    return _run_to_table(spark, stream, "events_hourly", "complete", stage)


def run_streaming_dedup(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Streaming exact dedup (applyInPandasWithState): first-seen keeper per
    text hash, with duplicate counts carried across microbatches.

    The doc table is staged as 4 parquet files read with maxFilesPerTrigger=1
    so keys genuinely recur across batches. State per md5(text) = (keeper_id,
    n_seen); keeper = running MIN doc_id and n_seen a running count, both
    order-independent, so the final emission per key equals the batch
    exact_dedup result exactly — the same DuckDB oracle checks both. At scale
    this is the continuous-ingest dedup: arriving documents stream in, state
    lives in the state store keyed by content hash, and duplicates are
    flagged online instead of re-scanning the corpus."""
    import pandas as pd
    from pyspark.sql import types as Ty
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stage = tempfile.mkdtemp(prefix="aira_sdedup_")
    hashed = docs.selectExpr("doc_id", "md5(text) AS text_hash")
    hashed.repartition(4).write.mode("overwrite").parquet(stage)
    schema = hashed.schema

    out_schema = Ty.StructType(
        [
            Ty.StructField("text_hash", Ty.StringType()),
            Ty.StructField("n_dups", Ty.LongType()),
            Ty.StructField("keeper_id", Ty.LongType()),
        ]
    )
    state_schema = Ty.StructType(
        [Ty.StructField("n", Ty.LongType()), Ty.StructField("keeper", Ty.LongType())]
    )

    def update(key, pdfs, state: GroupState):
        n, keeper = state.get if state.exists else (0, None)
        for pdf in pdfs:
            n += len(pdf)
            bmin = int(pdf["doc_id"].min())
            keeper = bmin if keeper is None else min(keeper, bmin)
        state.update((n, keeper))
        yield pd.DataFrame([(key[0], n, keeper)], columns=out_schema.fieldNames())

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .groupBy("text_hash")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )
    emitted = _run_to_table(spark, stream, "sdedup", "update", stage)
    # final (= complete) emission per key: n_dups is strictly increasing
    return emitted.groupBy("text_hash").agg(
        F.max("n_dups").alias("n_dups"),
        F.min("keeper_id").alias("keeper_id"),
    )


def run_streaming_hll(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Streaming HLL distinct sketch: vocabulary size per source computed
    incrementally as documents arrive.

    The sketch registers ARE the streaming state — a native max/count
    aggregation keyed on (source, bucket), so state is BOUNDED at m = 256
    rows per group no matter how many values stream past (the property that
    makes distinct-count viable on an unbounded stream at all; exact
    streaming COUNT(DISTINCT) would grow state with the vocabulary). The doc
    table is staged as 4 parquet files read with maxFilesPerTrigger=1 so
    registers genuinely accumulate across microbatches. The final register
    fold reuses operators/sketch.fold_registers, so the result equals the
    batch hll_distinct (and the same DuckDB oracle checks both)."""
    from ..operators.sketch import fold_registers, hll_registers

    stage = tempfile.mkdtemp(prefix="aira_shll_")
    src = docs.selectExpr("source", "text")
    src.repartition(_n_batches()).write.mode("overwrite").parquet(stage)

    pairs = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .selectExpr("source AS grp", "explode(split(text, ' ')) AS v")
        .where(F.expr("length(v) > 0"))
    )
    regs = hll_registers(pairs)  # streaming max/count agg: the register state
    emitted = _run_to_table(spark, regs, "shll", "complete", stage)
    return fold_registers(emitted)


def run_streaming_cms(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Streaming count-min counters: term-frequency sketch state accumulated
    as a native streaming COUNT aggregation keyed on (grp, row, bucket) —
    bounded at d*w = 4096 rows per group on an unbounded stream, and counts
    are additive across microbatches, so the final emission equals the batch
    cms_counters exactly (returned here as the counter table; callers point-
    query it exactly like the batch path)."""
    from ..functions.sketchfns import CM_DEPTH, cm_bucket_expr

    stage = tempfile.mkdtemp(prefix="aira_scms_")
    src = docs.selectExpr("source", "text")
    src.repartition(_n_batches()).write.mode("overwrite").parquet(stage)

    arms = ", ".join(
        f"named_struct('row', {i}, 'bucket', {cm_bucket_expr('v', i, 'spark')})"
        for i in range(CM_DEPTH)
    )
    counters = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .selectExpr("source AS grp", "explode(split(text, ' ')) AS v")
        .where(F.expr("length(v) > 0"))
        .selectExpr("grp", f"explode(array({arms})) AS rb")
        .groupBy("grp", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .count()
        .selectExpr("grp", "row", "bucket", "CAST(count AS BIGINT) AS cnt")
    )
    return _run_to_table(spark, counters, "scms", "complete", stage)


def run_streaming_density(
    spark: SparkSession, points: DataFrame, res: int
) -> DataFrame:
    """Streaming point-density heat map: the KDE kernel smoothing of
    operators/focal.point_density computed incrementally as points arrive.

    Structured Streaming allows ONE aggregation per query, so the state is
    keyed at the FINER (target, source-cell) granularity — a native SUM of
    kernel weights per (tx, ty, src) triple, bounded at 9x the occupied
    cells regardless of how many points stream past (the same
    finer-key-state device as the streaming HLL registers) — and the final
    batch fold per (tx, ty) reproduces batch point_density bit-for-bit, so
    the same DuckDB oracle checks the streaming path."""
    from ..functions.cells import cell_from_xy, cell_ix, cell_iy
    from ..operators.focal import DENSITY_KERNEL

    nf = 1 << res
    stage = tempfile.mkdtemp(prefix="aira_sdens_")
    src = points.select("point_id", "x", "y")
    src.repartition(_n_batches()).write.mode("overwrite").parquet(stage)

    offs = ", ".join(
        f"named_struct('dx', {dx}, 'dy', {dy}, 'w', {w})"
        for (dx, dy), w in sorted(DENSITY_KERNEL.items())
    )
    cells = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .select(cell_from_xy(F.col("x"), F.col("y"), res).alias("cell"))
        .select(
            cell_ix(F.col("cell")).alias("gx"),
            cell_iy(F.col("cell")).alias("gy"),
        )
    )
    scattered = cells.select(
        "gx", "gy", F.expr(f"explode(array({offs}))").alias("o")
    ).select(
        (F.col("gx") + F.col("o.dx")).alias("tx"),
        (F.col("gy") + F.col("o.dy")).alias("ty"),
        F.col("gx").alias("sx"),
        F.col("gy").alias("sy"),
        F.col("o.w").alias("w"),
    ).where(
        (F.col("tx") >= 0) & (F.col("tx") < nf)
        & (F.col("ty") >= 0) & (F.col("ty") < nf)
    )
    state = scattered.groupBy("tx", "ty", "sx", "sy").agg(
        F.sum("w").cast("long").alias("wsum")
    )
    emitted = _run_to_table(spark, state, "sdens", "complete", stage)
    return emitted.groupBy("tx", "ty").agg(
        F.count("*").cast("long").alias("n_src_cells"),
        F.sum("wsum").cast("long").alias("density_16"),
    ).select(
        F.col("tx").cast("long").alias("gx"),
        F.col("ty").cast("long").alias("gy"),
        "n_src_cells",
        "density_16",
    )


def run_streaming_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream joined to the CUSTOMER
    dimension (stream-static joins broadcast the static side per
    microbatch — the standard streaming dimension lookup, no state), then
    a watermarked hourly rollup per market segment. Returns the final
    table: (mktsegment, hour, n_events, value_cents) — equal to the batch
    join+agg bit-for-bit (the oracle)."""
    src = f"{sf_dir}/events.parquet"
    stage = tempfile.mkdtemp(prefix="aira_stream_")
    shutil.copy(src, os.path.join(stage, "events.parquet"))
    schema = spark.read.parquet(src).schema
    dim = spark.read.parquet(f"{sf_dir}/customer.parquet").selectExpr(
        "c_custkey AS user_id", "c_mktsegment AS mktsegment"
    )

    stream = (
        spark.readStream.schema(schema)
        .parquet(stage)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .join(F.broadcast(dim), "user_id")  # stream-static: per-batch lookup
        .groupBy(F.window("ts", "1 hour"), F.col("mktsegment"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.expr("CAST(FLOOR(value * 100.0) AS BIGINT)")).alias("value_cents"),
        )
        .select(
            "mktsegment",
            F.col("window.start").cast("string").alias("hour"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("value_cents").cast("long").alias("value_cents"),
        )
    )
    return _run_to_table(spark, stream, "streaming_enrich", "complete", stage)


def run_streaming_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window streaming aggregation: 2-hour windows sliding every
    hour, so each event lands in exactly TWO overlapping windows — the
    overlap fan-out the tumbling rollups (run_events_hourly_stream) never
    exercise. Input staged as _n_batches() files read with
    maxFilesPerTrigger=1 so window state accumulates across microbatch
    boundaries; counts/sums are additive, so the final table equals the
    batch computation — which the DuckDB oracle reproduces by fanning
    each event into its two window starts. Window starts emitted as epoch
    microseconds (session tz pinned UTC; exact integers, canon-safe)."""
    src = f"{sf_dir}/events.parquet"
    stage = tempfile.mkdtemp(prefix="aira_sliding_")
    spark.read.parquet(src).repartition(_n_batches()).write.mode(
        "overwrite"
    ).parquet(stage)
    schema = spark.read.parquet(src).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "2 hours", "1 hour"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.expr("CAST(FLOOR(value * 100.0) AS BIGINT)")).alias("value_cents"),
        )
        .select(
            F.col("event_type"),
            F.unix_micros(F.col("window.start")).alias("win_start_us"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("value_cents").cast("long").alias("value_cents"),
        )
    )
    return _run_to_table(spark, stream, "sliding", "complete", stage)


ORACLE_STREAMING_SLIDING = """
WITH ue AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t,
    CAST(FLOOR(value * 100.0) AS BIGINT) AS cents
  FROM events
),
fan AS (
  SELECT event_type, t, cents,
    UNNEST([(t // 3600) * 3600, (t // 3600) * 3600 - 3600]) AS ws
  FROM ue
)
SELECT event_type, CAST(ws * 1000000 AS BIGINT) AS win_start_us,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(cents) AS BIGINT) AS value_cents
FROM fan GROUP BY 1, 2
"""


def run_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream INNER JOIN with event-time watermarks on both sides:
    view -> purchase attribution per user within 4 hours — the one
    Structured Streaming operator class the rest of the roster never
    exercises (two unbounded sides, join STATE retained and evicted by
    the watermark + time-bound condition, append-only output).

    Correctness-by-construction for the stream == batch oracle: both
    sides are staged as _n_batches() TIME-SLICED files (equal event-time
    ranges, written in ascending order so the file source replays them
    oldest-first). Each side's stream is then time-ascending, so no
    arriving row is ever older than the global (min-of-sides) watermark
    and nothing is late-dropped; Spark evicts view-side state only when
    v_ts + 4h < watermark, by which point every matching purchase has
    either arrived or would itself be late — so the append output is
    EXACTLY the batch join, which the DuckDB oracle runs verbatim.

    Scale shape: state is bounded by the 4h window x per-user arrival
    rate per side (the watermark evicts beyond it); the join itself is a
    stream-symmetric hash join keyed on user_id — hot users salt the same
    way the batch side does. Returns (user_id, v_id, p_id, v_us, p_us,
    p_cents) — exact integers only.

    HARNESS CAVEAT (sandbox-only, not the operator's scale story): the
    time-sliced staging below is a driver loop writing n small files so a
    file-source stream can replay them in event-time order — it exists
    solely to make the stream == batch oracle well-defined in a test
    sandbox with no real broker. Production input is an actual stream
    (Kafka / files landing in arrival order); nothing about the JOIN
    depends on this staging. Each slice is written in ONE pass with
    partitionBy(event_type) — one job per slice, both sides — rather
    than two filtered scans per slice."""
    src = f"{sf_dir}/events.parquet"
    ev = spark.read.parquet(src).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    lo, hi = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).collect()[0]
    n = _n_batches()
    stage = tempfile.mkdtemp(prefix="aira_ssjoin_")
    sdir = os.path.join(stage, "sides")
    vdir = os.path.join(sdir, "event_type=view")
    pdir = os.path.join(sdir, "event_type=purchase")
    width = (hi - lo) // n + 1
    for i in range(n):
        # single filtered scan per slice; partitionBy splits the two sides
        # into event_type=view/ and event_type=purchase/ in the same job
        ev.where(F.unix_micros("ts") >= lo + i * width).where(
            F.unix_micros("ts") < lo + (i + 1) * width
        ).where("event_type IN ('view', 'purchase')").selectExpr(
            "event_type", "user_id", "event_id", "ts",
            "CAST(FLOOR(value * 100.0) AS BIGINT) AS cents",
        ).coalesce(1).write.mode("append").partitionBy(
            "event_type"
        ).parquet(sdir)

    # partitionBy only materializes event_type= subdirs for values actually
    # present; a slice set with zero views (or purchases) would leave that
    # side's directory missing and the schema read below would raise
    # PATH_NOT_FOUND. An empty write with the staged file schema (partition
    # column excluded) keeps the join well-defined: it returns empty, which
    # IS the batch-oracle answer for an absent side.
    for d in (vdir, pdir):
        if not os.path.exists(d):
            ev.limit(0).selectExpr(
                "user_id", "event_id", "ts",
                "CAST(0 AS BIGINT) AS cents",
            ).coalesce(1).write.parquet(d)

    v = (
        spark.readStream.schema(spark.read.parquet(vdir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(vdir)
        .selectExpr("user_id AS v_user", "event_id AS v_id", "ts AS v_ts")
        .withWatermark("v_ts", "1 hour")
    )
    p = (
        spark.readStream.schema(spark.read.parquet(pdir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(pdir)
        .selectExpr(
            "user_id AS p_user", "event_id AS p_id", "ts AS p_ts",
            "cents AS p_cents",
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = v.join(
        p,
        F.expr(
            "v_user = p_user AND p_ts >= v_ts "
            "AND p_ts <= v_ts + interval 4 hours"
        ),
    ).selectExpr(
        "CAST(v_user AS BIGINT) AS user_id",
        "CAST(v_id AS BIGINT) AS v_id",
        "CAST(p_id AS BIGINT) AS p_id",
        "unix_micros(v_ts) AS v_us",
        "unix_micros(p_ts) AS p_us",
        "CAST(p_cents AS BIGINT) AS p_cents",
    )
    return _run_to_table(spark, joined, "ssjoin", "append", stage)


ORACLE_STREAM_STREAM_JOIN = """
WITH v AS (
  SELECT user_id, event_id AS v_id, ts AS v_ts FROM events
  WHERE event_type = 'view'
),
p AS (
  SELECT user_id, event_id AS p_id, ts AS p_ts,
    CAST(FLOOR(value * 100.0) AS BIGINT) AS p_cents
  FROM events WHERE event_type = 'purchase'
)
SELECT CAST(v.user_id AS BIGINT) AS user_id,
  CAST(v.v_id AS BIGINT) AS v_id, CAST(p.p_id AS BIGINT) AS p_id,
  CAST(epoch_us(v.v_ts) AS BIGINT) AS v_us,
  CAST(epoch_us(p.p_ts) AS BIGINT) AS p_us, p.p_cents
FROM v JOIN p ON v.user_id = p.user_id
  AND p.p_ts >= v.v_ts AND p.p_ts <= v.v_ts + INTERVAL 4 HOUR
"""
