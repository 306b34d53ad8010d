"""Frequent 3-itemsets by A-priori candidate pruning — the Agrawal-Srikant
device that makes frequent-set mining feasible at basket scale: a triple
can only be frequent if all THREE of its sub-pairs are frequent, so
candidates are generated from the (small) frequent-pair table and the
exponential within-basket triple enumeration never happens.

Support is RELATIVE (the standard definition): s = max(floor_abs,
n_baskets DIV den), computed inside the plan from a broadcast single-row
count — an absolute threshold silently stops pruning the moment the data
grows (measured: minsup=5 at 10x the baskets made every pair "frequent"
and the stage-4 recount exploded to 100s; the relative threshold keeps
the same selectivity at every scale and the sf0.01 oracle unchanged).

Pipeline (every step an equi-join or hash agg on small integer ids):
  1. distinct (basket, item); frequent items f1 (support >= s)
  2. frequent pairs f2 from the within-basket pair join of f1 items;
     the within-basket PAIR ROWS are kept (localCheckpoint) because
  3. candidate triples come from f2(a,b) x f2(a,c), b < c, CLOSED by
     requiring (b,c) in f2 (full A-priori), and
  4. exact support anchors each candidate on its (a,b) PAIR occurrences
     — pair rows join broadcast candidates on (a,b), then one
     (basket, c) equi-join checks the third item. Anchoring on pairs
     instead of single items keeps the fan-out at
     |candidates sharing (a,b)| (a handful) instead of
     |candidates sharing a| x |rows of the hottest item| (the 100-TB
     skew trap on Zipf baskets).

Output is EXACT (stage 4 recounts; HAVING support >= s), and candidates
after closure are a superset of the answer by the A-priori lemma, so
pruning loses nothing. Deterministic set algebra end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_triples(
    baskets: DataFrame, floor_abs: int = 5, den: int = 3000
) -> DataFrame:
    """(item_a, item_b, item_c, support) with item_a < item_b < item_c and
    support >= max(floor_abs, n_baskets DIV den); `baskets` needs
    (order_id, item)."""
    bi = baskets.select("order_id", "item").distinct().localCheckpoint(
        eager=True  # reused by the count, f1, the pair join, and recount
    )
    tot = bi.agg(
        F.expr(
            f"GREATEST(CAST({floor_abs} AS BIGINT),"
            f" COUNT(DISTINCT order_id) DIV {den}) AS ms"
        )
    )
    f1 = (
        bi.groupBy("item")
        .agg(F.count("*").alias("s"))
        .crossJoin(F.broadcast(tot))
        .where(F.col("s") >= F.col("ms"))
        .select("item")
    )
    fbi = bi.join(F.broadcast(f1), "item").select("order_id", "item")
    pair_rows = (
        fbi.selectExpr("order_id", "item AS a")
        .join(fbi.selectExpr("order_id", "item AS b"), "order_id")
        .where("a < b")
        .localCheckpoint(eager=True)  # reused: f2 agg + the recount anchor
    )
    f2 = (
        pair_rows.groupBy("a", "b")
        .agg(F.count("*").alias("s"))
        .crossJoin(F.broadcast(tot))
        .where(F.col("s") >= F.col("ms"))
        .select("a", "b")
        .localCheckpoint(eager=True)  # reused by 2 generate arms + prune
    )
    cand = (
        f2.selectExpr("a", "b")
        .join(f2.selectExpr("a", "b AS c"), "a")
        .where("b < c")
        # A-priori closure: (b, c) must itself be frequent
        .join(f2.selectExpr("a AS b", "b AS c"), ["b", "c"])
        .select("a", "b", "c")
    )
    t = (
        pair_rows.join(F.broadcast(cand), ["a", "b"])
        .join(
            bi.selectExpr("order_id", "item AS c"), ["order_id", "c"]
        )
        .groupBy("a", "b", "c")
        .agg(F.count("*").cast("long").alias("support"))
        .crossJoin(F.broadcast(tot))
        .where(F.col("support") >= F.col("ms"))
    )
    return t.selectExpr(
        "CAST(a AS BIGINT) AS item_a",
        "CAST(b AS BIGINT) AS item_b",
        "CAST(c AS BIGINT) AS item_c",
        "support",
    )


def oracle_triples_sql(
    baskets_sql: str, floor_abs: int = 5, den: int = 3000
) -> str:
    """DuckDB mirror: the direct 3-way within-basket join — no A-priori
    (independent formulation); same relative threshold."""
    return f"""
WITH bi AS (SELECT DISTINCT order_id, item FROM ({baskets_sql})),
tot AS (SELECT GREATEST({floor_abs},
                        COUNT(DISTINCT order_id) // {den}) AS ms FROM bi)
SELECT CAST(x.item AS BIGINT) AS item_a, CAST(y.item AS BIGINT) AS item_b,
  CAST(z.item AS BIGINT) AS item_c, CAST(COUNT(*) AS BIGINT) AS support
FROM bi x
JOIN bi y ON x.order_id = y.order_id AND x.item < y.item
JOIN bi z ON x.order_id = z.order_id AND y.item < z.item
GROUP BY 1, 2, 3
HAVING COUNT(*) >= (SELECT ms FROM tot)
"""
