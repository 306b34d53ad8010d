"""Data-quality profiler — the per-column census (rows, nulls, distincts,
min/max) every warehouse runs on ingest to catch schema drift, null
floods, and silent truncation before they poison downstream jobs.

Shape: ONE pass over the table computes every column's aggregates in a
single wide aggregation (Catalyst evaluates all expressions in the same
hash agg — no per-column scans), then the wide row unpivots into the
(column, stat) long form. min/max ship as STRINGS (canon-safe for every
column type; numeric order is preserved per-column by zero-padding where
the caller wants it — the profile is a census, not a sort key)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_s, max_s) per column."""
    cols = cols or df.columns
    aggs = [F.count("*").cast("long").alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"{c}__nulls"),
            F.countDistinct(c).cast("long").alias(f"{c}__nd"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    arms = ", ".join(
        f"named_struct('col_name', '{c}', 'n_nulls', `{c}__nulls`, "
        f"'n_distinct', `{c}__nd`, 'min_s', `{c}__min`, 'max_s', `{c}__max`)"
        for c in cols
    )
    return wide.selectExpr(
        "__n AS n_rows", f"explode(array({arms})) AS p"
    ).selectExpr(
        "p.col_name", "n_rows",
        "CAST(p.n_nulls AS BIGINT) AS n_nulls",
        "CAST(p.n_distinct AS BIGINT) AS n_distinct",
        "p.min_s", "p.max_s",
    )


def oracle_profile_sql(table: str, cols: list[str]) -> str:
    arms = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows, "
        f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, "
        f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct, "
        f"MIN(CAST({c} AS VARCHAR)) AS min_s, MAX(CAST({c} AS VARCHAR)) AS max_s "
        f"FROM {table}"
        for c in cols
    )
    return arms
