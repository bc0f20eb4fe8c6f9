"""Small-input posture (fastpath.py): size-derived, restoring, scale no-op,
and the MEASURED per-query opt-out list (AQE_KEEP_QUERIES) that keeps AQE
for the plans the committed A/B shows the posture hurts."""

from __future__ import annotations

import json
import os

from etl_poor_main_pipeline_spark.fastpath import (
    AQE_KEEP_QUERIES,
    corpus_bytes,
    small_input_posture,
    small_input_shuffle_partitions,
)

SF = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_corpus_bytes_positive():
    n = corpus_bytes(SF)
    assert 0 < n < 256 << 20


def test_partitions_formula_floor_and_growth():
    assert small_input_shuffle_partitions(1) == 8
    assert small_input_shuffle_partitions(64 << 20) == 32
    # monotone in bytes
    assert small_input_shuffle_partitions(128 << 20) >= small_input_shuffle_partitions(
        64 << 20
    )


def test_posture_applies_and_restores(spark):
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    with small_input_posture(spark, SF) as on:
        assert on is True
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) <= int(prev_sp)
    assert spark.conf.get("spark.sql.adaptive.enabled") == prev_aqe
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev_sp


def test_posture_noop_at_scale(spark):
    # Threshold below the corpus size -> cluster posture untouched.
    with small_input_posture(spark, SF, threshold_bytes=1) as on:
        assert on is False
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_posture_restores_on_error(spark):
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        with small_input_posture(spark, SF):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get("spark.sql.adaptive.enabled") == prev_aqe


def test_aqe_keep_matches_committed_ab():
    """Two-way consistency between the measured opt-out list and the
    committed full-registry A/B (AB_FASTPATH.json):
      (a) every query the A/B measured >1.5x slower under the posture
          (and non-trivial, off > 0.3s) is in AQE_KEEP_QUERIES;
      (b) every AQE_KEEP entry shows a real (>1.25x) regression in the
          A/B — no stale or hand-picked entries.
    Regenerate the A/B with tools/ab_fastpath.py after plan changes."""
    with open(os.path.join(REPO, "AB_FASTPATH.json")) as fh:
        rows = json.load(fh)["rows"]
    regressed = {
        n
        for n, r in rows.items()
        if r["ratio"] and r["ratio"] > 1.5 and r["off"] > 0.3
    }
    missing = regressed - AQE_KEEP_QUERIES
    assert not missing, (
        f"measured posture regressions not in AQE_KEEP_QUERIES: {missing}"
    )
    for name in AQE_KEEP_QUERIES:
        assert name in rows, f"{name} absent from the committed A/B"
        assert rows[name]["ratio"] and rows[name]["ratio"] > 1.25, (
            f"{name} no longer regresses under the posture "
            f"({rows[name]['ratio']}x); drop it from AQE_KEEP_QUERIES"
        )


def test_aqe_keep_names_exist(spark):
    from etl_poor_main_pipeline_spark.registry import queries

    qs = queries()
    for name in AQE_KEEP_QUERIES:
        assert name in qs, f"AQE_KEEP entry {name} not in the registry"
