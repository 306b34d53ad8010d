"""Exact Gram matrix (X^T X) over the embedding table — THE input to PCA /
whitening / linear probes, computed the way distributed PCA actually does
it: every Arrow batch folds its own d x d partial Gram with one numpy
matmul, and a single tiny aggregation sums the partials. No join, no
per-component explode; the only exchange carries d(d+1)/2-row partials per
task, whatever the row count.

Exactness: components quantize to int64 at x1024 (the similarity-family
convention, kmeans.py QUANT_SPARK), so every partial product is an exact
integer and the fold is order-independent — bit-identical to the DuckDB
mirror that brute-forces the same sums by component unnesting. Overflow
budget: |q| <= ~2^13 per component, products <= 2^26, so int64 partials
hold ~2^37 rows per task and the BIGINT total ~2^37 globally at these
magnitudes — beyond that, promote the final agg to DECIMAL(38,0) (one cast,
same plan)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_matrix(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(i, j, gram) for the upper triangle i <= j (0-based component
    indexes): gram = sum over rows of q_i * q_j, q = round(x * 1024)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            # float64 BEFORE scaling (float32 would lose bits in the
            # product), and HALF-AWAY-FROM-ZERO to match SQL round() —
            # np.rint is half-to-even and disagrees on exact .5 grid hits
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64) * 1024.0
            x = (np.floor(np.abs(v) + 0.5) * np.sign(v)).astype(np.int64)
            g = x.T @ x
            acc = g if acc is None else acc + g
        if acc is None:
            return
        d = acc.shape[0]
        iu, ju = np.triu_indices(d)
        yield pd.DataFrame(
            {"i": iu, "j": ju, "part": acc[iu, ju]}
        )

    parts = emb.select(vec_col).mapInPandas(
        fn, schema="i long, j long, part long"
    )
    return parts.groupBy("i", "j").agg(
        F.sum("part").cast("long").alias("gram")
    )


def oracle_gram_sql(table: str = "embeddings", d: int = 64) -> str:
    """DuckDB mirror: brute-force component pair sums over the same x1024
    quantization — an independent formulation (unnest join, not matmul)."""
    return f"""
WITH q AS (
  SELECT list_transform(embedding,
    x -> CAST(round(CAST(x AS DOUBLE) * 1024.0) AS BIGINT)) AS v
  FROM {table}
),
ij AS (
  SELECT i.i, j.j FROM unnest(generate_series(1, {d})) AS i(i),
       unnest(generate_series(1, {d})) AS j(j)
  WHERE i.i <= j.j
)
SELECT CAST(ij.i - 1 AS BIGINT) AS i, CAST(ij.j - 1 AS BIGINT) AS j,
       CAST(SUM(q.v[ij.i] * q.v[ij.j]) AS BIGINT) AS gram
FROM q, ij
GROUP BY 1, 2
"""
