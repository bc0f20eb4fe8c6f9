"""Wave 88: exact moments, rank-exact Gini, HHI concentration."""

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
    unbounded_nested_loop_joins,
)
from etl_poor_main_pipeline_spark.registry_ext87 import (
    q_gini_concentration_rank,
    q_hhi_market_concentration,
    q_moments_skew_kurtosis,
)

SF = "/root/testdata/sf0.001"


def test_moments_match_direct_computation(spark):
    rows = q_moments_skew_kurtosis(spark, SF).collect()
    assert rows
    from etl_poor_main_pipeline_spark.sources.read import load_table

    vals = {}
    for r in load_table(spark, SF, "events").select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(round(r.value * 1e3) / 1e3)
    for r in rows:
        xs = vals[r.event_type]
        n = len(xs)
        mu = sum(xs) / n
        m2 = sum((x - mu) ** 2 for x in xs) / n
        m3 = sum((x - mu) ** 3 for x in xs) / n
        m4 = sum((x - mu) ** 4 for x in xs) / n
        assert r.n == n
        assert abs(r.mean_milli - mu * 1e3) < 2
        assert abs(r.skewness_micro / 1e6 - m3 / m2**1.5) < 1e-3
        assert abs(r.excess_kurtosis_micro / 1e6 - (m4 / m2**2 - 3)) < 1e-3


def test_gini_bounds_and_top_share(spark):
    import math

    r = q_gini_concentration_rank(spark, SF).collect()[0]
    assert 0 <= r.gini_micro <= 1_000_000
    # the top-ranked slice holds at least its own population share (its
    # size is n - ceil(0.9 n), which is coarser than 10% at small n)
    n_top = r.n - math.ceil(r.n * 0.9)
    assert n_top >= 1
    assert r.top_decile_share_micro >= (1_000_000 * n_top) // r.n - 1
    assert r.top_decile_share_micro <= 1_000_000


def test_hhi_bounds(spark):
    rows = q_hhi_market_concentration(spark, SF).collect()
    assert rows
    for r in rows:
        # 0..10000 scale with centi precision; monopoly when one customer
        assert 0 < r.hhi_centi <= 1_000_000 + r.n_customers
        if r.n_customers == 1:
            assert abs(r.hhi_centi - 1_000_000) <= 1
        # HHI lower bound 10000/n on the centi scale
        assert r.hhi_centi >= 1_000_000 // r.n_customers - r.n_customers


def test_wave88_plans_are_scale_safe(spark):
    for fn in (
        q_moments_skew_kurtosis,
        q_gini_concentration_rank,
        q_hhi_market_concentration,
    ):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
        assert not unbounded_nested_loop_joins(df)
