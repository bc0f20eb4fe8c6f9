"""Dependency-ordered local runner for the medallion DAG (E4).

The reference orchestrates its three layers as Airflow tasks in Docker
containers (README.md:143-172); the graph itself — bronze feeding two
per-country silvers feeding gold — is scheduler-independent. This module
declares that graph once and runs it through the SAME runnable-module
entry points the containers would invoke (``pipelines.__main__.main``),
so an e2e test (and a developer without Airflow) exercises exactly the
production task boundaries: each task is a fresh argv-driven invocation,
and a task's nonzero exit aborts its dependents — the Airflow failure
semantics.

Scale note: the runner parallelizes within a topological level with
threads. Each task here shares one local SparkSession (module-level
``get_spark`` is a singleton); under Airflow each task is its own
spark-submit, so per-level parallelism is cluster-scheduler work, not
driver threads.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Task:
    """One orchestrated invocation of ``pipelines.__main__.main``."""

    name: str
    argv: tuple[str, ...]
    upstream: tuple[str, ...] = field(default_factory=tuple)


def medallion_dag(
    lake_root: str, date_id: str, countries: Sequence[str] = ("US", "CA")
) -> dict[str, Task]:
    """The reference's DAG shape (README.md:143-172): one bronze ingest,
    one silver per country, one gold fan-in."""
    tasks = {
        "bronze": Task("bronze", ("bronze", "--lake-root", lake_root, "--date-id", date_id))
    }
    for c in countries:
        tasks[f"silver_{c}"] = Task(
            f"silver_{c}",
            ("silver", "--lake-root", lake_root, "--date-id", date_id, "--country", c),
            upstream=("bronze",),
        )
    tasks["gold"] = Task(
        "gold",
        ("gold", "--lake-root", lake_root, "--date-id", date_id),
        upstream=tuple(f"silver_{c}" for c in countries),
    )
    return tasks


#: Canonical instance used by the Airflow artifact's docstring/tests.
MEDALLION_DAG = medallion_dag("/tmp/lake", "1970-01-01")


def topological_layers(tasks: Mapping[str, Task]) -> list[list[str]]:
    """Kahn's algorithm, grouped by level (tasks within a level have no
    mutual dependencies and may run in parallel). Raises on cycles."""
    remaining = dict(tasks)
    done: set[str] = set()
    layers: list[list[str]] = []
    while remaining:
        ready = sorted(
            name for name, t in remaining.items() if set(t.upstream) <= done
        )
        if not ready:
            raise ValueError(f"dependency cycle among: {sorted(remaining)}")
        layers.append(ready)
        for name in ready:
            done.add(name)
            del remaining[name]
    return layers


def run_medallion(
    lake_root: str,
    date_id: str,
    countries: Sequence[str] = ("US", "CA"),
    runner: Callable[[list[str]], int] | None = None,
) -> list[str]:
    """Run the full medallion chain in dependency order through the
    per-layer entry points. Returns task names in completion order.

    ``runner``: callable taking the argv list, returning an exit code —
    defaults to ``pipelines.__main__.main`` (in-process; tests may inject
    a recorder, Airflow replaces the whole function with operators). A
    nonzero exit raises and skips all dependents, matching scheduler
    semantics.
    """
    if runner is None:
        from ..pipelines.__main__ import main as runner  # noqa: PLC0415

    tasks = medallion_dag(lake_root, date_id, countries)
    completed: list[str] = []
    for layer in topological_layers(tasks):
        for name in layer:
            rc = runner(list(tasks[name].argv))
            if rc != 0:
                raise RuntimeError(
                    f"task {name} exited {rc}; skipping dependents "
                    f"(completed: {completed})"
                )
            completed.append(name)
    return completed
