"""PLANS.md must cover every query above the slow-ledger bar — the
round-5..7 recurring staleness (hand-maintained audit list lagging the
ledger) is closed mechanically: tools/explain_audit.py derives its
section list from the committed idle ledger, and this test asserts the
committed PLANS.md actually covers it (same sync pattern as
tools/sync_counts.py)."""

from __future__ import annotations

import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_plans_md_covers_every_slow_ledger_query():
    with open(os.path.join(REPO, "BENCH_QUERIES.json")) as fh:
        ledger = json.load(fh)
    with open(os.path.join(REPO, "PLANS.md")) as fh:
        sections = set(re.findall(r"^## (\S+)", fh.read(), flags=re.M))

    from tools.explain_audit import SLOW_LEDGER_SEC

    # only queries that still exist can be audited (renames drop out of
    # the ledger at the next refresh)
    from etl_poor_main_pipeline_spark.registry import queries

    names = set(queries())
    slow = {
        n for n, w in ledger.items() if w > SLOW_LEDGER_SEC and n in names
    }
    missing = sorted(slow - sections)
    assert not missing, (
        f"{len(missing)} queries above {SLOW_LEDGER_SEC:g}s idle lack a "
        f"PLANS.md section (regenerate: python tools/explain_audit.py): "
        f"{missing}"
    )
