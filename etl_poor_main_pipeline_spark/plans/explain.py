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


def read_schema_report(df: DataFrame) -> dict[str, list[str]]:
    """Column-level scan lineage: which columns each parquet scan actually
    reads (the pruned ReadSchema), keyed by the scan's file location.
    This is the column-pruning audit in programmatic form — at 100 TB the
    difference between a 2-column and a 40-column ReadSchema IS the query
    cost, and this report is how a pipeline asserts it mechanically
    (tools/explain_audit.py renders the human version)."""
    import re

    plan = explain_str(df)
    report: dict[str, list[str]] = {}
    location = None
    for line in plan.splitlines():
        m = re.search(r"Location:.*\[([^\]]*)\]", line)
        if m:
            location = m.group(1).rstrip("/").rsplit("/", 1)[-1]
        m = re.search(r"ReadSchema: struct<([^>]*)>", line)
        if m and location is not None:
            cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
            report.setdefault(location, sorted(set(cols)))
            location = None
    return report
