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


def global_window_nodes(df: DataFrame) -> list[str]:
    """Arguments lines of Window nodes that plan with an EMPTY partition
    spec — the 'WindowExec: No Partition Defined' shape that serializes the
    whole input through one task at 100 TB.

    Detection (formatted plan): a Window/WindowInPandas node prints
    ``Arguments: [exprs], [partitionSpec], [orderSpec]`` with empty specs
    OMITTED, so the bracket-group count disambiguates:
      3 groups -> partitioned (safe);
      2 groups -> global IFF the trailing group is an order spec (every
        sort order prints ``ASC``/``DESC``); else it is a partition spec
        with no ordering (safe);
      1 group -> global, unordered frame.
    """
    import re

    lines = explain_str(df).splitlines()
    bad: list[str] = []
    for i, ln in enumerate(lines):
        if not re.match(r"\(\d+\) (Window|WindowInPandas)\b", ln.strip()):
            continue
        for j in range(i + 1, min(i + 8, len(lines))):
            stripped = lines[j].strip()
            if not stripped.startswith("Arguments:"):
                continue
            args = stripped[len("Arguments:"):]
            groups, depth, cur = [], 0, []
            for ch in args:
                if ch == "[":
                    depth += 1
                    if depth == 1:
                        cur = []
                        continue
                elif ch == "]":
                    depth -= 1
                    if depth == 0:
                        groups.append("".join(cur))
                        continue
                if depth >= 1:
                    cur.append(ch)
            is_global = len(groups) <= 1 or (
                len(groups) == 2
                and (" ASC" in groups[-1] or " DESC" in groups[-1])
            )
            if is_global:
                bad.append(ln.strip() + " " + args.strip())
            break
    return bad


def assert_no_global_window(df: DataFrame) -> None:
    """Fail if the plan contains an unpartitioned Window (single-partition
    bottleneck at scale). Sibling of :func:`assert_no_python_udf`; asserted
    over the whole registry in tests/test_no_global_window.py, with the two
    deliberately-global SQL-semantics demos (window_ntile,
    window_distribution) and the global-order spec twin
    (training_pack_greedy) as the only sanctioned exceptions."""
    bad = global_window_nodes(df)
    if bad:
        raise AssertionError(
            "global (unpartitioned) Window in plan — single-partition "
            "bottleneck at scale:\n" + "\n".join(bad)
        )


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
