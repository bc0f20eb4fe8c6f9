"""Mechanized full-registry parity sweep (VERDICT r6 task #6).

Runs EVERY registered query against its DuckDB oracle at sf0.01 — the same
row-count / column-set / value-hash compare the driver applies — so the
README's "N/N oracle-verified" claim is load-bearing per commit, not prose.

Deselected by default (pytest.ini adds `-m "not full_parity"`); run once per
wave batch with:

    python -m pytest -m full_parity tests/test_full_parity.py -q

(~15-20 min on local[8] at sf0.01.)
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.full_parity
def test_full_registry_parity():
    # Subprocess so the sweep owns its SparkSession confs (the shared test
    # session would otherwise leak warehouse/shuffle settings into timings).
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "parity.py"), SF_DIR],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    tail = "\n".join(proc.stdout.splitlines()[-40:])
    assert proc.returncode == 0, (
        f"parity sweep failed (exit {proc.returncode}); last lines:\n{tail}\n"
        f"stderr tail:\n{proc.stderr[-2000:]}"
    )
    # Record the run so wave commits can cite it (VERDICT r7 #6: the sweep
    # existed but nothing proved it ran). Opt-in via PARITY_LOG=1 so plain
    # pytest runs stay hermetic (ADVICE r8: unconditional appends dirtied
    # the tree on every run and interleaved under concurrency). One line
    # per run: timestamp, HEAD (+dirty when the tree differs from HEAD —
    # VERDICT r8 #3: a clean-looking HEAD field on a dirty-tree sweep
    # claimed a query count the commit didn't contain), and parity.py's
    # final "N pass, M fail" summary.
    import datetime
    import os

    if os.environ.get("PARITY_LOG") != "1":
        return

    summary = next(
        (
            ln.strip()
            for ln in reversed(proc.stdout.splitlines())
            if " pass, " in ln
        ),
        "summary line missing",
    )
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=REPO,
        capture_output=True,
        text=True,
    ).stdout.strip()
    dirty = subprocess.run(
        ["git", "status", "--porcelain"],
        cwd=REPO,
        capture_output=True,
        text=True,
    ).stdout.strip()
    head_field = f"{head or '?'}{'+dirty' if dirty else ''}"
    stamp = datetime.datetime.now().astimezone().isoformat(timespec="seconds")
    with open(REPO / "PARITY.log", "a") as fh:
        fh.write(f"{stamp} HEAD={head_field} sf0.01 {summary}\n")
