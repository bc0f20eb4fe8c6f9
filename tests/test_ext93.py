"""Wave 94: PSM nearest-bucket ATT, doubly-robust eval, RDD screen."""

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_python_udf,
    unbounded_nested_loop_joins,
)
from etl_poor_main_pipeline_spark.registry_ext93 import (
    q_doubly_robust_eval,
    q_propensity_match_att,
    q_regression_discontinuity,
)

SF = "/root/testdata/sf0.001"


def test_psm_matches_within_caliper(spark):
    r = q_propensity_match_att(spark, SF).collect()[0]
    assert r.n_treated > 0 and r.n_control > 0
    assert 0 < r.n_matched <= r.n_treated
    # matching can only move the estimate BETWEEN the naive diff and zero
    # or past it — no sign constraint holds in general, but both numbers
    # must exist and be finite
    assert r.att_milli is not None and r.naive_diff_milli is not None


def test_dr_blends_model_and_ips(spark):
    r = q_doubly_robust_eval(spark, SF).collect()[0]
    assert r.n_eval > 0
    assert r.model_milli > 0 and r.ips_milli > 0 and r.dr_milli > 0
    # DR = model + correction; with near-uniform propensities it lands
    # in the convex-ish hull of the two component estimates (wide band)
    lo = min(r.model_milli, r.ips_milli)
    hi = max(r.model_milli, r.ips_milli)
    spread = max(hi - lo, 100)
    assert lo - 2 * spread <= r.dr_milli <= hi + 2 * spread


def test_rdd_sides_and_cutoff(spark):
    r = q_regression_discontinuity(spark, SF).collect()[0]
    assert r.n_below > 0 and r.n_above > 0
    assert r.cut > 0
    assert r.jump_milli == r.icept_above_milli - r.icept_below_milli or (
        # floor() of the difference vs difference of floors: 1-milli slack
        abs(r.jump_milli - (r.icept_above_milli - r.icept_below_milli)) <= 1
    )


def test_wave93_plans_are_clean(spark):
    for q in (
        q_propensity_match_att,
        q_doubly_robust_eval,
        q_regression_discontinuity,
    ):
        df = q(spark, SF)
        assert_no_python_udf(df)
        assert not unbounded_nested_loop_joins(df)
