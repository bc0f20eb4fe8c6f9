"""Wave 85: Poisson bootstrap CI, rank-exact robust means, date dim."""

import datetime

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
    unbounded_nested_loop_joins,
)
from etl_poor_main_pipeline_spark.registry_ext84 import (
    _BOOT_B,
    _DD_END,
    _DD_START,
    q_bootstrap_ci_hashed,
    q_date_dimension_build,
    q_trimmed_mean_rank,
)

SF = "/root/testdata/sf0.001"


def test_bootstrap_ci_brackets_observed_mean(spark):
    rows = q_bootstrap_ci_hashed(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_reps == _BOOT_B
        assert r.ci_lo_micro <= r.ci_hi_micro
        # a 90% CI from a well-mixed bootstrap should bracket the observed
        # mean on every type of this corpus (means are tight at n~400/type)
        assert r.ci_lo_micro <= r.obs_mean_micro <= r.ci_hi_micro


def test_trimmed_mean_is_between_extremes(spark):
    r = q_trimmed_mean_rank(spark, SF).collect()[0]
    assert r.n > 0 and 0 < r.cut_each_tail < r.n // 2
    # value ~ Uniform-ish [0, 500): both robust means must be interior
    assert 0 < r.trimmed_mean_micro < 500_000_000
    assert 0 < r.winsorized_mean_micro < 500_000_000
    # winsorized and trimmed should agree within a few value units
    assert abs(r.trimmed_mean_micro - r.winsorized_mean_micro) < 20_000_000


def test_date_dimension_shape(spark):
    rows = q_date_dimension_build(spark, SF).collect()
    d0 = datetime.date.fromisoformat(_DD_START)
    d1 = datetime.date.fromisoformat(_DD_END)
    assert len(rows) == (d1 - d0).days + 1
    by_id = {r.date_id: r for r in rows}
    r = by_id["1996-02-29"]  # leap day
    assert r.days_in_month == 29 and r.is_month_end
    assert by_id["1995-01-01"].iso_dow == 7  # a Sunday
    assert by_id["1995-01-07"].is_weekend  # a Saturday
    weekends = sum(1 for r in rows if r.is_weekend)
    assert abs(weekends - 2 * len(rows) / 7) < 6


def test_wave85_plans_are_scale_safe(spark):
    for fn in (q_bootstrap_ci_hashed, q_trimmed_mean_rank, q_date_dimension_build):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
        assert not unbounded_nested_loop_joins(df)
