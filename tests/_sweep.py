"""Threaded registry-sweep helper for the plan-guard tests.

The three registry-wide plan guards (global window, unbounded
nested-loop join, unbounded broadcast) each build and inspect ~700 query
plans sequentially; together they were ~16 min of the suite's wall.
Catalyst analysis/optimization happens in the JVM and py4j calls release
the GIL while blocked on the gateway socket, so building the plans from a
small thread pool parallelizes the dominant cost without changing what is
checked — same probes, same assertions, same witness strings.

Spark is explicitly multi-thread-safe for concurrent query submission
(guide §2.6); the query builders here mutate no session conf (the
streaming builders that do are skipped by every sweep).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable

SWEEP_THREADS = 8


def sweep(
    items,
    probe: Callable,
) -> tuple[dict[str, list[str]], dict[str, str]]:
    """Run ``probe(name, fn) -> list[str] witnesses`` over ``items``
    (name, fn) pairs concurrently. Returns ``(offenders, build_errors)``
    where offenders maps name -> the probe's non-empty witness list and
    build_errors maps name -> repr of the exception (reported, not
    masked — identical semantics to the old sequential loops)."""

    def one(nf):
        name, fn = nf
        try:
            return name, probe(name, fn), None
        except Exception as exc:  # noqa: BLE001 - report, don't mask peers
            return name, None, repr(exc)[:200]

    offenders: dict[str, list[str]] = {}
    build_errors: dict[str, str] = {}
    with ThreadPoolExecutor(max_workers=SWEEP_THREADS) as pool:
        for name, bad, err in pool.map(one, list(items)):
            if err is not None:
                build_errors[name] = err
            elif bad:
                offenders[name] = bad
    return offenders, build_errors
