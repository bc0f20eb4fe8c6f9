"""Wave 86: winnowing pairs, l-diversity, Wilson intervals."""

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
    unbounded_nested_loop_joins,
)
from etl_poor_main_pipeline_spark.registry_ext85 import (
    _WP_MIN_SHARED,
    _WP_TOPK,
    q_l_diversity_audit,
    q_wilson_interval_bins,
    q_winnowing_candidate_pairs,
)

SF = "/root/testdata/sf0.001"


def test_winnowing_pairs_ordered_and_bounded(spark):
    rows = q_winnowing_candidate_pairs(spark, SF).collect()
    assert 0 < len(rows) <= _WP_TOPK
    shared = [r.n_shared_fps for r in rows]
    assert shared == sorted(shared, reverse=True)
    for r in rows:
        assert r.a_id < r.b_id
        assert r.n_shared_fps >= _WP_MIN_SHARED


def test_l_diversity_bounds(spark):
    rows = q_l_diversity_audit(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_low_diversity_groups <= r.n_groups
        assert r.min_l >= 1
        # dominant share is a fraction in (0, 1]
        assert 0 < r.worst_dominant_share_micro <= 1_000_000


def test_wilson_interval_brackets_rate(spark):
    rows = q_wilson_interval_bins(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.wilson_lo_micro <= r.rate_micro <= r.wilson_hi_micro <= 1_000_000
        # interval is non-degenerate at every bin's n
        assert r.wilson_hi_micro > r.wilson_lo_micro


def test_wave86_plans_are_scale_safe(spark):
    for fn in (
        q_winnowing_candidate_pairs,
        q_l_diversity_audit,
        q_wilson_interval_bins,
    ):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
        assert not unbounded_nested_loop_joins(df)
