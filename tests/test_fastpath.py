"""Small-input posture (fastpath.py): size-derived, restoring, scale no-op."""

from __future__ import annotations

from etl_poor_main_pipeline_spark.fastpath import (
    corpus_bytes,
    small_input_posture,
    small_input_shuffle_partitions,
)

SF = "/root/testdata/sf0.001"


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
