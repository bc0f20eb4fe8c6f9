"""Wave 96: Good-Turing, Chao1 richness, vocabulary coverage curve."""

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
    unbounded_nested_loop_joins,
)
from etl_poor_main_pipeline_spark.registry_ext95 import (
    _COV_PS,
    _GT_RS,
    q_chao1_vocab_richness,
    q_good_turing_unseen_mass,
    q_vocab_coverage_curve,
)

SF = "/root/testdata/sf0.001"


def test_good_turing_grid(spark):
    rows = q_good_turing_unseen_mass(spark, SF).collect()
    assert [r.r for r in rows] == _GT_RS
    r1 = rows[0]
    assert r1.n_tokens > 0 and r1.v_types > 0
    assert r1.s_r > 0  # trigram singletons exist — the tail is real
    assert 0 < r1.p_unseen_micro < 1_000_000
    for r in rows:
        if r.s_r > 0 and r.s_r_plus_1 > 0:
            # GT discounts: adjusted count stays positive and below a few r
            assert 0 < r.r_star_milli < (r.r + 1) * 1000 * 10


def test_chao1_dominates_observed(spark):
    r = q_chao1_vocab_richness(spark, SF).collect()[0]
    assert r.n1 > 0 and r.v_types > 0
    assert r.chao1_est >= r.v_types  # richness estimate never below observed
    assert 0 < r.coverage_micro < 1_000_000


def test_coverage_curve_monotone(spark):
    rows = q_vocab_coverage_curve(spark, SF).collect()
    assert [r.p_pct for r in rows] == _COV_PS
    needs = [r.types_needed for r in rows]
    assert needs == sorted(needs)  # more mass needs more types
    assert all(n > 0 for n in needs)


def test_wave95_plans_are_bounded(spark):
    for q in (
        q_good_turing_unseen_mass,
        q_chao1_vocab_richness,
        q_vocab_coverage_curve,
    ):
        df = q(spark, SF)
        assert_no_global_window(df)
        assert_no_python_udf(df)
        assert not unbounded_nested_loop_joins(df)
