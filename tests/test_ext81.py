"""Wave 82: Markov removal attribution, DP noisy release, Platt scaling."""

import math

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
    unbounded_nested_loop_joins,
)
from etl_poor_main_pipeline_spark.registry_ext81 import (
    _MK_CHANNELS,
    q_dp_noisy_histogram,
    q_markov_removal_attribution,
    q_platt_calibration_newton,
)

SF = "/root/testdata/sf0.001"


def test_markov_attribution_shares_and_bounds(spark):
    rows = q_markov_removal_attribution(spark, SF).collect()
    assert sorted(r.channel for r in rows) == sorted(_MK_CHANNELS)
    full = {r.conv_full_micro for r in rows}
    assert len(full) == 1 and 0 < full.pop() <= 1_000_000
    for r in rows:
        # removing a channel can only lose conversion probability
        assert 0 <= r.conv_removed_micro <= r.conv_full_micro
        assert 0 <= r.removal_effect_micro <= 1_000_000
    share_sum = sum(r.attribution_micro for r in rows)
    assert abs(share_sum - 1_000_000) <= len(rows)  # rounding slack


def test_dp_noise_applied_and_consistent(spark):
    rows = q_dp_noisy_histogram(spark, SF).collect()
    assert len(rows) > 0
    moved = 0
    for r in rows:
        assert r.abs_err_micro == abs(r.noisy_micro - 1_000_000 * r.n_true)
        if r.abs_err_micro > 0:
            moved += 1
        # Laplace(1) tail: essentially all draws inside +-40
        assert r.abs_err_micro < 40_000_000
    assert moved >= len(rows) - 1  # hash-seeded noise is ~never exactly 0
    again = q_dp_noisy_histogram(spark, SF).collect()
    assert rows == again  # deterministic release


def test_platt_fit_beats_chance_and_slopes_up(spark):
    r = q_platt_calibration_newton(spark, SF).collect()[0]
    assert r.n > 0
    # higher value -> higher purchase propensity on this corpus
    assert r.a_micro > 0
    # mean log-loss beats the ln(2) coin-flip baseline
    assert r.mean_logloss_micro < int(math.log(2) * 1e6)


def test_wave82_plans_are_scale_safe(spark):
    for fn in (
        q_markov_removal_attribution,
        q_dp_noisy_histogram,
        q_platt_calibration_newton,
    ):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
        assert not unbounded_nested_loop_joins(df)
