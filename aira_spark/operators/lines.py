"""Segment-level exact dedup with document reassembly — the CCNet-style
"line dedup" curation step: drop every repeated paragraph corpus-wide
(keeping its FIRST occurrence in (doc_id, position) order) and re-emit
each document rebuilt from its surviving segments.

The synthetic corpus has no newlines, so the segmentation unit is a fixed
12-word window (deterministic, both engines compute it identically); the
machinery — corpus-wide first-occurrence election + in-order reassembly —
is exactly what a newline-segmented pipeline runs.

Scale shape: segments explode as (doc_id, seg_idx, seg) rows; the
first-occurrence election is ONE hash agg on seg (map-side combinable —
boilerplate-hot segments partial-aggregate before the exchange, unlike a
window over seg which would sort a hot segment in one task); the keep
test is an equi-join back on seg carrying only the winner key; reassembly
is one hash agg on doc_id with an in-memory sort_array over that doc's
own segments. Nothing collects; text crosses exactly two exchanges."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEG_WORDS = 12
# order key = doc_id * 2^20 + seg_idx: total first-occurrence order as one
# BIGINT (seg_idx is bounded far below 2^20 by any real document)
_IDX_BITS = 20


def doc_segments(docs: DataFrame, seg_words: int = SEG_WORDS) -> DataFrame:
    """(doc_id, seg_idx, seg): fixed `seg_words`-word segments, last one
    ragged — pure column arithmetic, no Python."""
    w = F.split(F.col("text"), " ")
    n_seg = F.ceil(F.size(w) / F.lit(seg_words)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.concat_ws(
            " ", F.slice(w, i * seg_words + 1, seg_words)
        ),
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(segs).alias("seg_idx", "seg"),
    )


def line_dedup(docs: DataFrame, seg_words: int = SEG_WORDS) -> DataFrame:
    """(doc_id, n_segs, n_kept, clean_text): per document, how many
    segments survived corpus-wide first-occurrence dedup and the document
    rebuilt from the survivors in original order (empty string when every
    segment was a repeat)."""
    segs = doc_segments(docs, seg_words)
    key = (
        F.col("doc_id") * F.lit(1 << _IDX_BITS) + F.col("seg_idx")
    ).cast("long")
    with_key = segs.withColumn("k", key)
    winners = with_key.groupBy("seg").agg(F.min("k").alias("mn"))
    kept = (
        with_key.join(winners, "seg")
        .where(F.col("k") == F.col("mn"))
        .select("doc_id", "seg_idx", "seg")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("seg_idx", "seg"))
                ),
                lambda s: s["seg"],
            ),
        ).alias("clean_text"),
    )
    totals = segs.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_segs")
    )
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_segs",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


def oracle_line_dedup_sql(
    table: str = "documents", seg_words: int = SEG_WORDS
) -> str:
    """DuckDB mirror: list_slice segmentation, MIN-key election, and
    string_agg(... ORDER BY seg_idx) reassembly."""
    k = 1 << _IDX_BITS
    return f"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, string_split(text, ' ') AS w
  FROM {table}
),
s AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS seg_idx,
    array_to_string(
      list_slice(w, t.i * {seg_words} + 1, t.i * {seg_words} + {seg_words}),
      ' ') AS seg
  FROM d, UNNEST(range(0, CAST(ceil(len(w) / {seg_words}.0) AS BIGINT))) AS t(i)
),
winners AS (
  SELECT seg, MIN(doc_id * {k} + seg_idx) AS mn FROM s GROUP BY seg
),
kept AS (
  SELECT s.doc_id, s.seg_idx, s.seg
  FROM s JOIN winners ww ON ww.seg = s.seg
  WHERE s.doc_id * {k} + s.seg_idx = ww.mn
),
rebuilt AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
    string_agg(seg, ' ' ORDER BY seg_idx) AS clean_text
  FROM kept GROUP BY doc_id
),
totals AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs FROM s GROUP BY doc_id
)
SELECT t.doc_id, t.n_segs,
  CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
  COALESCE(r.clean_text, '') AS clean_text
FROM totals t LEFT JOIN rebuilt r ON r.doc_id = t.doc_id
"""
