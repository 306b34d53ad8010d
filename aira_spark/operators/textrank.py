"""TextRank keyword extraction (Mihalcea & Tarau 2004) — weighted PageRank
over the word co-occurrence graph, the unsupervised keyphrase scorer a
curation pipeline runs to summarize/score documents without labels. Sits
on cooccur.py's skip-gram machinery and graph.py's fixed-round device.

Graph: unordered word pairs co-occurring within a WINDOW-token span,
edge weight = total ordered co-occurrence count (symmetrized), pruned at
min_count BEFORE any join (the Zipf guard). Scores iterate

    r'(b) = TELEPORT + sum_{a ~ b} ((r(a) * w_ab) DIV wdeg(a) * 850000)
                                                            DIV 1000000

for FIXED rounds — exact integer micros, order-independent at any
parallelism (the pagerank device), with the division ORDER pinned so
every intermediate stays inside int64: r*w <= mass * w ~ 1e13, then DIV
wdeg <= r, then * 850000 <= ~8.5e14. All operands nonneg so DIV and //
agree. Out-degree varies (unlike pagerank_fixed's kNN digraph), hence
the per-node weighted degree in the denominator.

Scale shape (100 TB): skip-gram pairs are a pure per-document projection
(posexplode + window arms — the generator never leaves the row); the
exchanges carry only (w1, w2, count) and (word, integer) rows with
map-side combine — text never shuffles; per round ONE equi-join of the
static localCheckpointed edge list vs the rank frontier + one hash agg."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMP_NUM, DAMP_DEN = 850_000, 1_000_000
TELEPORT = 150_000
INIT_MICROS = 1_000_000


def textrank(
    docs: DataFrame, window: int = 3, min_count: int = 3, rounds: int = 6
) -> DataFrame:
    """(word, wdeg, rank_micros): weighted-PageRank keyword scores after
    `rounds` synchronous iterations over the windowed co-occurrence
    graph. `docs` needs (doc_id, text); tokens split on single spaces."""
    toks = docs.selectExpr("split(text, ' ') AS ws")
    arms = ", ".join(
        f"try_element_at(ws, pos + 1 + {k})" for k in range(1, window + 1)
    )
    ordered = (
        toks.selectExpr("ws", "posexplode(ws) AS (pos, w1)")
        .selectExpr("w1", f"explode(array({arms})) AS w2")
        .where(F.col("w2").isNotNull() & (F.col("w1") != F.col("w2")))
    )
    und = (
        ordered.selectExpr(
            "least(w1, w2) AS a", "greatest(w1, w2) AS b"
        )
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("w"))
        .where(F.col("w") >= min_count)
    )
    edges = (
        und.selectExpr("a", "b", "w")
        .unionByName(und.selectExpr("b AS a", "a AS b", "w"))
        .localCheckpoint(eager=True)
    )
    wdeg = edges.groupBy("a").agg(F.sum("w").cast("long").alias("wdeg"))
    ranks = wdeg.select(
        F.col("a").alias("node"),
        F.lit(INIT_MICROS).cast("long").alias("rank_micros"),
    )
    for i in range(rounds):
        contrib = (
            edges.join(wdeg, "a")
            .join(ranks, F.col("a") == F.col("node"))
            .selectExpr(
                "b",
                f"(rank_micros * w) DIV wdeg * {DAMP_NUM} DIV {DAMP_DEN}"
                " AS c",
            )
            .groupBy("b")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            wdeg.select("a")
            .join(contrib, F.col("a") == F.col("b"), "left")
            .select(
                F.col("a").alias("node"),
                (F.lit(TELEPORT) + F.coalesce(F.col("inflow"), F.lit(0)))
                .cast("long")
                .alias("rank_micros"),
            )
        )
        if (i + 1) % 2 == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return (
        ranks.join(wdeg, F.col("node") == F.col("a"))
        .selectExpr("node AS word", "wdeg", "rank_micros")
    )


def oracle_textrank_sql(
    docs_sql: str, window: int = 3, min_count: int = 3, rounds: int = 6
) -> str:
    """DuckDB mirror over a subquery yielding (doc_id, text): identical
    pair generation, symmetrized weights and unrolled pinned-order
    integer iteration."""
    # 1-based ws[pos] is Spark's 0-based element_at(ws, pos + 1): the k-th
    # following token is ws[pos + k] here vs try_element_at(ws, pos+1+k)
    arms = ", ".join(
        f"ws[pos + {k}]" for k in range(1, window + 1)
    )
    parts = [
        f"docs AS ({docs_sql})",
        "tk AS (SELECT string_split(text, ' ') AS ws FROM docs)",
        "pos_t AS (SELECT ws, unnest(generate_series(1, len(ws))) AS pos"
        " FROM tk)",
        f"""ordered AS (
  SELECT ws[pos] AS w1, unnest([{arms}]) AS w2 FROM pos_t)""",
        """und AS (
  SELECT least(w1, w2) AS a, greatest(w1, w2) AS b,
    CAST(COUNT(*) AS BIGINT) AS w
  FROM ordered WHERE w2 IS NOT NULL AND w1 != w2
  GROUP BY 1, 2 HAVING COUNT(*) >= """ + str(min_count) + ")",
        "edges AS MATERIALIZED (SELECT a, b, w FROM und "
        "UNION ALL SELECT b, a, w FROM und)",
        "wd AS (SELECT a, CAST(SUM(w) AS BIGINT) AS wdeg FROM edges"
        " GROUP BY 1)",
        f"r0 AS (SELECT a AS node, CAST({INIT_MICROS} AS BIGINT)"
        " AS rank_micros FROM wd)",
    ]
    for i in range(rounds):
        parts.append(
            f"r{i + 1} AS MATERIALIZED (SELECT n.a AS node, "
            f"CAST({TELEPORT} + COALESCE((SELECT SUM("
            f"(r.rank_micros * e.w) // w2.wdeg * {DAMP_NUM} // {DAMP_DEN}"
            f") FROM edges e JOIN wd w2 ON w2.a = e.a "
            f"JOIN r{i} r ON r.node = e.a WHERE e.b = n.a), 0) "
            f"AS BIGINT) AS rank_micros FROM wd n)"
        )
    # NOTE: ws[pos + k] out of range returns NULL in DuckDB (try_element_at
    # parity); 1-based ws[pos] aligns with posexplode's pos + 1
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT r.node AS word, wd.wdeg, r.rank_micros
FROM r{rounds} r JOIN wd ON wd.a = r.node"""
    )
