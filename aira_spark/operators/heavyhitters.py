"""Exact heavy hitters by sketch-then-verify — the two-pass pattern that
finds every item with frequency > n/k WITHOUT a full groupBy over the
long tail (the tail is the problem at 100 TB: billions of distinct keys
shuffle for nothing when only a handful can possibly clear n/k).

Pass 1 (candidates): each Arrow batch emits the items whose BATCH-local
count exceeds batch_n/k — a vectorized value_counts, no per-row Python.
Soundness is the Misra-Gries pigeonhole: if an item's global count
exceeds n/k then its count exceeds n_b/k in at least one batch b
(otherwise summing the per-batch bounds caps the global count at n/k).
So the union of per-batch candidates is a SUPERSET of the true heavy
hitters, of size <= k per batch regardless of skew.

Pass 2 (verify): exact recount restricted to the candidate set via a
broadcast semi-join, then the exact threshold cnt * k > n. The final
output is therefore EXACT and independent of partitioning/batching —
candidates vary with the split, the verified set does not (the property
that makes the operator oracle-checkable at all).

Integer end-to-end; total n rides a broadcast single-row cross join so
the whole job is one pipeline (no driver-side collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(items: DataFrame, k: int = 20) -> DataFrame:
    """(item, cnt, n_total) for every item with cnt * k > n_total; input
    is a single-column frame item:long."""
    from collections.abc import Iterator

    import pandas as pd

    def candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vc = pdf["item"].value_counts()
            # strict batch-local threshold: count > n_b / k
            cand = vc[vc * k > len(pdf)].index.to_numpy()
            yield pd.DataFrame({"item": cand})

    cand = (
        items.mapInPandas(candidates, schema="item long")
        .distinct()
    )
    exact = (
        items.join(F.broadcast(cand), "item")
        .groupBy("item")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    total = items.agg(F.count("*").cast("long").alias("n_total"))
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * k > F.col("n_total"))
        .selectExpr(
            "CAST(item AS BIGINT) AS item",
            "cnt",
            "n_total",
        )
    )


def oracle_heavy_hitters_sql(items_sql: str, k: int = 20) -> str:
    """DuckDB mirror: the direct full GROUP BY + HAVING formulation."""
    return f"""
WITH it AS ({items_sql}),
tot AS (SELECT COUNT(*) AS n_total FROM it)
SELECT CAST(item AS BIGINT) AS item,
  CAST(COUNT(*) AS BIGINT) AS cnt,
  CAST(MAX(tot.n_total) AS BIGINT) AS n_total
FROM it CROSS JOIN tot
GROUP BY 1
HAVING COUNT(*) * {k} > MAX(tot.n_total)
"""
