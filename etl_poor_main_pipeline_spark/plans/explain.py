"""Plan inspection helpers — the 100 TB posture's feedback loop.

The scale rules (SURVEY §4, instructions): filters and projections must
reach the parquet scan, partition predicates must prune directories, and
the hot path must stay inside whole-stage codegen (no Python row UDFs).
These helpers turn those rules into assertions usable in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the formatted plan (empty if none)."""
    plan = explain_str(df)
    return "\n".join(line for line in plan.splitlines() if "PushedFilters" in line)


def has_partition_filter(df: DataFrame, column: str) -> bool:
    plan = explain_str(df)
    for line in plan.splitlines():
        if "PartitionFilters" in line and column in line:
            return True
    return False


def assert_no_python_udf(df: DataFrame) -> None:
    """Fail if the plan contains a row-at-a-time Python UDF (BatchEvalPython).
    Arrow-batched pandas UDFs (ArrowEvalPython / FlatMapGroupsInPandas /
    MapInPandas) are the sanctioned Python path and are allowed."""
    plan = explain_str(df)
    if "BatchEvalPython" in plan:
        raise AssertionError(f"row-at-a-time Python UDF in plan:\n{plan}")


def codegen_stage_count(df: DataFrame) -> int:
    plan = explain_str(df)
    ids = {line.split("(")[1].split(")")[0] for line in plan.splitlines() if "WholeStageCodegen" in line and "(" in line}
    return len(ids)
