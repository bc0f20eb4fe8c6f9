"""Wave 91: k-center greedy seeding, James-Stein shrinkage, pinball loss."""

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
    unbounded_nested_loop_joins,
)
from etl_poor_main_pipeline_spark.registry_ext90 import (
    _KPP_K,
    q_james_stein,
    q_kmeanspp_farthest_seed,
    q_pinball_loss_eval,
)

SF = "/root/testdata/sf0.001"


def test_kmeanspp_seeds_are_distinct_and_greedy(spark):
    rows = q_kmeanspp_farthest_seed(spark, SF).collect()
    assert [r.step for r in rows] == list(range(1, _KPP_K + 1))
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == _KPP_K  # a point is never chosen twice
    assert rows[0].dist2_micro == 0  # the seed has no predecessor
    # greedy invariant: each later pick's distance to the growing chosen
    # set can only shrink or hold (the min over a superset)
    d = [r.dist2_micro for r in rows[1:]]
    assert d == sorted(d, reverse=True)
    assert all(x > 0 for x in d)


def test_james_stein_shrinks_toward_grand_mean(spark):
    rows = q_james_stein(spark, SF).collect()
    assert len(rows) >= 4  # k >= 4 or the estimator degenerates
    for r in rows:
        assert 0 <= r.shrink_factor_micro <= 1_000_000
    # shrunk means lie between raw means and the grand mean: the spread
    # of shrunk means never exceeds the spread of raw means
    raws = [r.raw_mean_milli for r in rows]
    shrunk = [r.shrunk_mean_milli for r in rows]
    assert max(shrunk) - min(shrunk) <= max(raws) - min(raws)


def test_pinball_loss_grid(spark):
    rows = q_pinball_loss_eval(spark, SF).collect()
    assert rows
    by_type = {}
    for r in rows:
        assert r.p_pct in (50, 90, 99)
        assert r.n_train > 0 and r.n_test > 0
        assert r.pinball_milli >= 0
        by_type.setdefault(r.event_type, []).append(r)
    for tr in by_type.values():
        assert [r.p_pct for r in tr] == [50, 90, 99]
        # forecasts are order statistics: monotone in p
        fs = [r.f_milli for r in tr]
        assert fs == sorted(fs)


def test_wave90_plans_are_bounded(spark):
    for q in (q_kmeanspp_farthest_seed, q_james_stein, q_pinball_loss_eval):
        df = q(spark, SF)
        assert_no_global_window(df)
        assert_no_python_udf(df)
        assert not unbounded_nested_loop_joins(df)
