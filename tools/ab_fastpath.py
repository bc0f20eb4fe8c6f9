"""Per-query A/B of the small-input posture (fastpath.small_input_posture:
AQE off + right-sized shuffle fan-out) vs default session confs, over the
FULL registry at sf0.1 on an idle host.

This table is the committed evidence behind fastpath.AQE_KEEP_QUERIES.
Round 7 shipped the posture process-wide with an unsubstantiated "no query
regresses" docstring claim; this measurement replaced the claim: the
posture wins or ties on 497/499 queries (including the iterative
graph/dedup pipelines) and hurts exactly two tiny-frame join loops, which
the harnesses now opt out. tests/test_fastpath.py enforces two-way
consistency between the opt-out list and this file's output.

Usage (idle host — any concurrent Spark/pytest makes timings garbage):

    python tools/ab_fastpath.py [sf_dir] [query ...]   # measure (subset ok)
    python tools/ab_fastpath.py --rewrite              # re-emit outputs only

Per query: wall = build + execute + count, OFF first then ON back-to-back
(matched host conditions), min-of-2 above 0.3s, same warm-up as bench.py.
The ON leg uses process-wide posture semantics (posture active during
build AND action, so eager checkpoint loops feel it). A subset run merges
into the existing AB_FASTPATH.json so per-wave top-ups don't clobber the
full table. `gate` records the harness policy for the row: 'aqe' if the
name is in fastpath.AQE_KEEP_QUERIES, else 'posture'.

Writes AB_FASTPATH.json and rewrites the '## fastpath A/B' section at the
end of RATIO.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MIN2_THRESHOLD_SEC = 0.3
JSON_PATH = os.path.join(REPO, "AB_FASTPATH.json")


def write_outputs(rows: dict, sf_dir: str) -> None:
    from etl_poor_main_pipeline_spark.fastpath import AQE_KEEP_QUERIES

    for name, r in rows.items():
        r["gate"] = "aqe" if name in AQE_KEEP_QUERIES else "posture"

    with open(JSON_PATH, "w") as fh:
        json.dump({"sf_dir": sf_dir, "rows": rows}, fh, sort_keys=True)

    regressed = {
        n: r
        for n, r in rows.items()
        if r["ratio"] and r["ratio"] > 1.5 and r["off"] > 0.3
    }
    missed = {n: r for n, r in regressed.items() if r["gate"] == "posture"}
    off_total = sum(r["off"] for r in rows.values())
    on_total = sum(r["on"] for r in rows.values())
    policy_total = sum(
        r["off"] if r["gate"] == "aqe" else r["on"] for r in rows.values()
    )
    lines = [
        "## fastpath A/B — small-input posture ON vs OFF, full registry, idle",
        "",
        f"Source: tools/ab_fastpath.py at {sf_dir} (min-of-2 above 0.3s, "
        "OFF/ON back-to-back per query; ON = process-wide semantics, "
        "posture during build AND action). `gate` is the shipped harness "
        "policy: posture everywhere except the measured regressions in "
        "fastpath.AQE_KEEP_QUERIES.",
        "",
        f"- queries measured: {len(rows)}",
        f"- total wall: OFF {off_total:.1f}s, ON {on_total:.1f}s, "
        f"shipped policy {policy_total:.1f}s",
        f"- regressed >1.5x under ON (and >0.3s OFF): {len(regressed)} "
        f"({sorted(regressed)})"
        + (
            f" — NOT opted out: {sorted(missed)} (fix AQE_KEEP_QUERIES)"
            if missed
            else " — all opted out to AQE"
        ),
        "",
        "| query | off_s | on_s | on/off | gate |",
        "|---|---|---|---|---|",
    ]
    for n in sorted(rows, key=lambda n: -(rows[n]["ratio"] or 0)):
        r = rows[n]
        lines.append(
            f"| {n} | {r['off']} | {r['on']} | {r['ratio']} | {r['gate']} |"
        )
    section = "\n".join(lines) + "\n"

    ratio_md = os.path.join(REPO, "RATIO.md")
    text = open(ratio_md).read() if os.path.exists(ratio_md) else "# RATIO\n\n"
    marker = "## fastpath A/B"
    if marker in text:
        # callable replacement: query names / sf_dir strings in the table
        # must not be interpreted as \g backreference templates
        text = re.sub(
            re.escape(marker) + r".*?(?=\n## (?!fastpath A/B)|\Z)",
            lambda m: section,
            text,
            flags=re.S,
        )
    else:
        text = text.rstrip() + "\n\n" + section
    with open(ratio_md, "w") as fh:
        fh.write(text)
    print(
        f"ab: wrote AB_FASTPATH.json + RATIO.md section "
        f"({len(rows)} queries, {len(regressed)} regressed, "
        f"{len(missed)} not opted out)",
        file=sys.stderr,
    )


def main() -> None:
    args = [a for a in sys.argv[1:]]
    if args and args[0] == "--rewrite":
        with open(JSON_PATH) as fh:
            store = json.load(fh)
        write_outputs(store["rows"], store.get("sf_dir", "?"))
        return

    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    only = set(args[1:])

    from etl_poor_main_pipeline_spark.fastpath import small_input_posture
    from etl_poor_main_pipeline_spark.registry import queries
    from etl_poor_main_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ab_fastpath", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    qs["flagship_silver_shape"](spark, sf_dir).count()  # JVM/codegen warm-up
    try:  # iterative stage-graph warm-up, same stance as bench.py
        qs["pagerank_docs"](spark, "/root/testdata/sf0.001").count()
    except Exception:
        pass

    def run_off(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        return time.perf_counter() - t0

    def run_on(fn) -> float:
        t0 = time.perf_counter()
        with small_input_posture(spark, sf_dir):
            fn(spark, sf_dir).count()
        return time.perf_counter() - t0

    def timed(runner, fn) -> float:
        e = runner(fn)
        if e > MIN2_THRESHOLD_SEC:
            e = min(e, runner(fn))
        return round(e, 3)

    rows: dict[str, dict] = {}
    if only and os.path.exists(JSON_PATH):  # subset top-up: merge into prior
        with open(JSON_PATH) as fh:
            rows = json.load(fh)["rows"]
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            off = timed(run_off, fn)
            on = timed(run_on, fn)
        except Exception as exc:
            print(f"ab: {name} FAILED: {exc}", file=sys.stderr)
            continue
        rows[name] = {
            "off": off,
            "on": on,
            "ratio": round(on / off, 2) if off > 0 else None,
        }
        print(f"ab: {name}: off {off}s on {on}s ({rows[name]['ratio']}x)", file=sys.stderr)

    write_outputs(rows, sf_dir)


if __name__ == "__main__":
    main()
