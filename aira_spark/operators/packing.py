"""Sequence packing for LLM pretraining: deterministic concat-and-chunk.

The standard pretraining data layout concatenates documents and slices the
token stream into fixed-size context windows. This operator assigns every
document its (shard, pack, offset) coordinates WITHOUT materializing the
token stream: token counts are exact-integer SQL (the BPE-ish pre-tokenizer
of functions/textfns.n_bpe_tokens), the document order inside a shard is
total and deterministic (doc_id), and the pack coordinates are pure window
arithmetic — so a 10^12-document run is one shuffle (hash-partition by
shard) plus a per-shard sort, and the DuckDB oracle reproduces every value
bit-for-bit from the same formula text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import textfns as tf

ENG = "spark"


def pack_sequences(
    docs: DataFrame, budget: int = 512, n_shards: int = 8
) -> DataFrame:
    """(doc_id, shard, n_tok, pack_id, pack_offset, straddles): concat-and-
    chunk packing coordinates per document.

    - shard: h64(doc_id) mod n_shards — a deterministic hash split, so shard
      membership is reproducible across runs and engines (NOT round-robin,
      which would depend on physical row order).
    - within a shard, documents are packed in doc_id order; `pack_id` is the
      context window the document STARTS in, `pack_offset` its first token's
      position there, `straddles` whether it crosses a window boundary
      (concat-and-chunk splits such docs across windows).

    Scale shape: one shuffle keyed on shard; the per-shard running sum is a
    window cumsum (sort within shard). At 10^12 docs, n_shards is sized so a
    shard sorts in memory (e.g. 2^20 shards x ~10^6 docs); shards are
    independent, so the stage parallelizes perfectly and no global sort or
    driver pass exists anywhere."""
    t = docs.selectExpr(
        "doc_id",
        f"CAST({tf.n_bpe_tokens('text', ENG)} AS BIGINT) AS n_tok",
        f"pmod({tf.h64('CAST(doc_id AS STRING)', ENG)}, {n_shards}) AS shard",
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    t = t.withColumn("tok_start", start)
    b = int(budget)
    # `div` is Spark's INTEGER division (DuckDB spells it `//`): exact at any
    # magnitude, unlike `/`+cast which detours through a double
    return t.selectExpr(
        "doc_id",
        "CAST(shard AS BIGINT) AS shard",
        "n_tok",
        "CAST(tok_start AS BIGINT) AS tok_start",
        f"tok_start div {b} AS pack_id",
        f"tok_start % {b} AS pack_offset",
        f"((tok_start + n_tok - 1) div {b}) > (tok_start div {b}) AS straddles",
    )
