"""As-of (most-recent-prior) join over event streams, as a single-shuffle
window backfill — the time-series operator Spark lacks natively.

For every left row, find the right row with the greatest right_ts <= left_ts
within the same key (ties on right_ts broken by the greatest tie column).
The naive formulation is a range join (l.key = r.key AND r.ts <= l.ts) +
row_number, which Spark executes as a per-key row EXPLOSION (every left row
joins every earlier right row before ranking). Instead, union both sides and
take a running `last(right_struct, ignorenulls=True)` over (key ORDER BY ts)
— the classic backfill trick:

- ONE hash shuffle on the key + one in-partition sort (the same cost as the
  sort-merge join Spark would need anyway), zero row explosion; at 10^12
  events this is the difference between O(n log n) and O(n * matches).
- at equal timestamps the right row sorts BEFORE the left row, so the match
  is inclusive (r.ts <= l.ts); among equal-ts right rows the greatest
  tie-column value wins (sorted ascending, last() takes the latest).
- the right payload travels as ONE struct column: a right row whose payload
  FIELDS are null still has a non-null struct, so ignorenulls skips only
  genuine left rows, never a matched right row with null fields.
- hot keys: the shuffle key is the join key; skewed keys salt the same way
  as operators/skew.py (windows need the full key in one partition, so the
  salting unit is the key's time-slices with boundary replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_us: int | None = None,
    right_tie: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row + the matched right row's columns
    (prefixed `r_`, null when no right row precedes it).

    on: equality key column (present in both sides).
    left_ts/right_ts: event-time columns (TimestampType).
    tolerance_us: if set, a match older than this many microseconds before
        the left timestamp is discarded (nulled), like pandas merge_asof.
    right_tie: column breaking equal-right_ts ties (greatest wins); defaults
        to the first non-key right column.
    """
    rcols = [c for c in right.columns if c != on]
    if right_tie is None:
        right_tie = rcols[0]
    payload = F.struct(*[F.col(c) for c in rcols])

    # a right row with NULL event time can never be "at or before" anything
    # (the range-join definition r.ts <= l.ts excludes it) — drop it here,
    # else NULLS-FIRST ordering would sort it before every row and last()
    # would backfill it as a bogus oldest match
    right = right.filter(F.col(right_ts).isNotNull())
    # the tie column keeps its NATIVE type (string/timestamp/decimal order
    # correctly; a blind long cast would null non-numerics and truncate
    # sub-second timestamps, silently losing the greatest-tie-wins contract)
    tie_type = right.schema[right_tie].dataType

    l = left.withColumn("_side", F.lit(1)).withColumn(
        "_r", F.lit(None).cast(
            right.select(payload.alias("_r")).schema["_r"].dataType
        )
    ).withColumn("_ts", F.col(left_ts)).withColumn("_tie", F.lit(None).cast(tie_type))
    r = (
        right.withColumn("_side", F.lit(0))
        .withColumn("_r", payload)
        .withColumn("_ts", F.col(right_ts))
        .withColumn("_tie", F.col(right_tie))
    )
    l_tagged = l.select(
        on, "_side", "_ts", "_tie", "_r",
        *[F.col(c) for c in left.columns if c != on],
    )
    r_tagged = r.select(
        on, "_side", "_ts", "_tie", "_r",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c != on],
    )
    u = l_tagged.unionByName(r_tagged)

    # right rows (side 0) sort before left rows at equal ts -> inclusive
    # match; equal-ts right rows sort by tie asc -> last() takes the max
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w)).filter(
        F.col("_side") == 1
    )
    if tolerance_us is not None:
        # interval arithmetic, not unix_micros: works for both TIMESTAMP and
        # TIMESTAMP_NTZ and never consults the session timezone
        ok = F.col("_m")[right_ts] >= F.col("_ts") - F.expr(
            f"INTERVAL {int(tolerance_us)} MICROSECOND"
        )
        matched = matched.withColumn(
            "_m", F.when(ok, F.col("_m")).otherwise(F.lit(None))
        )
    out = matched.select(
        on,
        *[c for c in left.columns if c != on],
        *[F.col("_m")[c].alias(f"r_{c}") for c in rcols],
    )
    return out
