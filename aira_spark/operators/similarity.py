"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline (JVM-side zip_with/aggregate —
no Python), and an LSH-bucketed approximate path for scale: random-hyperplane
signatures computed in a vectorized Arrow UDF, candidates restricted to
matching buckets, exact re-rank inside buckets only.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as Ty


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def cosine(a, b):
    return _dot(a, b) / F.sqrt(_dot(a, a)) / F.sqrt(_dot(b, b))


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """Exact top-k by cosine: (query_id, neighbor_id, rank, cos).

    queries: (query_id, qvec) — small, broadcast; embeddings never shuffle.
    Deterministic tie-break on (cos desc, neighbor_id).
    """
    e = embeddings.select(F.col("vec_id").alias("neighbor_id"),
                          F.col("embedding").alias("vec"))
    q = F.broadcast(queries.select("query_id", "qvec"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        e.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("vec"), F.col("qvec")), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


SIG_SCHEMA = Ty.StructType(
    [
        Ty.StructField("vec_id", Ty.LongType()),
        Ty.StructField("bucket", Ty.LongType()),
    ]
)


def _planes(n_planes: int, dim: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes (seeded; no Date/now)."""
    rng = np.random.default_rng(20240816)
    return rng.standard_normal((n_planes, dim))


def lsh_signatures(embeddings: DataFrame, n_planes: int = 12, dim: int = 64) -> DataFrame:
    """(vec_id, bucket): sign-of-dot-product signature packed into a long.
    Vectorized: one numpy matmul per Arrow batch."""
    planes = _planes(n_planes, dim)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=SIG_SCHEMA.fieldNames())
                continue
            mat = np.vstack(pdf["embedding"].to_numpy())
            bits = (mat @ planes.T) > 0
            weights = (1 << np.arange(n_planes)).astype(np.int64)
            buckets = bits.astype(np.int64) @ weights
            yield pd.DataFrame({"vec_id": pdf["vec_id"].astype("int64"),
                                "bucket": buckets})

    return embeddings.select("vec_id", "embedding").mapInPandas(fn, schema=SIG_SCHEMA)


def lsh_ann_topk(embeddings: DataFrame, k: int = 10, n_planes: int = 8) -> DataFrame:
    """Approximate all-pairs top-k: candidates share an LSH bucket; exact
    cosine re-rank within buckets. The bucket join is an equi-join shuffle on
    a near-uniform key — the 10^12-scale path (vs brute force O(n^2))."""
    sigs = lsh_signatures(embeddings, n_planes)
    vecs = embeddings.select("vec_id", "embedding").join(sigs, "vec_id")
    a = vecs.select(F.col("bucket"), F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("qvec"))
    b = vecs.select(F.col("bucket"), F.col("vec_id").alias("neighbor_id"),
                    F.col("embedding").alias("vec"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        a.join(b, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("vec"), F.col("qvec")), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def embedding_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                             n_planes: int = 6) -> DataFrame:
    """Near-duplicate embedding pairs (cos >= threshold) via LSH blocking."""
    sigs = lsh_signatures(embeddings, n_planes)
    vecs = embeddings.select("vec_id", "embedding").join(sigs, "vec_id")
    a = vecs.select("bucket", F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = vecs.select("bucket", F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", F.round(cosine(F.col("ea"), F.col("eb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", "cos")
    )
