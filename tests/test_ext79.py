"""Wave 80: Qini uplift, conformal calibration, salt planner."""

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
)
from etl_poor_main_pipeline_spark.registry_ext79 import (
    _CONF_ALPHA_PCT,
    _SALT_TARGET_ROWS,
    q_conformal_interval_calibration,
    q_salt_factor_planner,
    q_uplift_qini_by_score,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_qini_cumulative_walk_is_monotone(spark):
    rows = sorted(
        q_uplift_qini_by_score(spark, SF).collect(), key=lambda r: -r.score
    )
    assert rows
    prev_cn = 0
    for r in rows:
        assert r.cn_t + r.cn_c >= prev_cn  # cumulative counts grow downward
        prev_cn = r.cn_t + r.cn_c
        assert r.cr_t <= r.cn_t and r.cr_c <= r.cn_c
    # the bottom row covers the full population
    users = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert rows[-1].cn_t + rows[-1].cn_c == users


def test_conformal_coverage_near_target(spark):
    rows = q_conformal_interval_calibration(spark, SF).collect()
    assert rows
    target = (100 - _CONF_ALPHA_PCT) / 100.0
    for r in rows:
        assert r.half_width > 0
        assert 0 <= r.n_covered <= r.n_test
        # split-conformal guarantee: coverage within sampling noise of target
        assert abs(r.coverage_micro / 1e6 - target) < 0.12


def test_salt_planner_caps_slices(spark):
    rows = q_salt_factor_planner(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.salt_factor >= 2  # only keys that need salting are listed
        assert r.post_slice_rows <= _SALT_TARGET_ROWS
        assert r.post_slice_rows * r.salt_factor >= r.cnt  # no rows lost
        assert r.post_max_rows <= _SALT_TARGET_ROWS
        assert r.pre_max_rows >= r.cnt or r.pre_max_rows >= _SALT_TARGET_ROWS


def test_wave80_plans_are_scale_safe(spark):
    for fn in (
        q_uplift_qini_by_score,
        q_conformal_interval_calibration,
        q_salt_factor_planner,
    ):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
