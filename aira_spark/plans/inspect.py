"""Physical-plan inspection helpers: make the plan shape testable.

The scale contract is enforced as assertions on the optimized plan — the
polygon side of PIP must broadcast, filters must reach the parquet scan,
chunk enumeration must stay inside whole-stage codegen — rather than hoped
for. Used by tests/test_plans.py and by hand while tuning (.explain loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def count_in_plan(df: DataFrame, needle: str, mode: str = "simple") -> int:
    # simple mode prints each physical node once (formatted repeats names in
    # the per-node detail section, which double-counts)
    return plan_string(df, mode).count(needle)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df) or "BroadcastNestedLoopJoin" in plan_string(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan."""
    s = plan_string(df, "simple")
    return s.count("Exchange hashpartitioning") + s.count("Exchange rangepartitioning")


def pushed_filters(df: DataFrame) -> str:
    s = plan_string(df)
    return "\n".join(ln.strip() for ln in s.splitlines() if "PushedFilters" in ln)
