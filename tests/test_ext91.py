"""Wave 92: cross-source leakage, Simpson screen, Bradley-Terry."""

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
    unbounded_nested_loop_joins,
)
from etl_poor_main_pipeline_spark.registry_ext91 import (
    q_bradley_terry_strengths,
    q_cross_source_leakage,
    q_simpsons_paradox_screen,
)

SF = "/root/testdata/sf0.001"


def test_leakage_matrix_is_directional_containment(spark):
    rows = q_cross_source_leakage(spark, SF).collect()
    assert rows  # the prefix fingerprint must find real leaks (not vacuous)
    by_pair = {(r.src_a, r.src_b): r for r in rows}
    for r in rows:
        assert r.src_a != r.src_b
        assert 0 < r.n_shared <= r.n_fp_a
        assert 0 < r.containment_micro <= 1_000_000
        # shared count is symmetric even though containment is directional
        rev = by_pair.get((r.src_b, r.src_a))
        assert rev is not None and rev.n_shared == r.n_shared


def test_simpson_screen_shape(spark):
    rows = q_simpsons_paradox_screen(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_groups >= 2
    assert 0 <= r.n_opposing <= r.n_groups
    assert r.paradox == (r.n_opposing * 2 > r.n_groups)


def test_bradley_terry_strengths(spark):
    rows = q_bradley_terry_strengths(spark, SF).collect()
    assert len(rows) >= 2
    tot = sum(r.strength_micro for r in rows)
    assert abs(tot - 1_000_000) <= len(rows)  # normalized (rounding slack)
    for r in rows:
        assert r.games > 0 and 0 <= r.wins <= r.games
        assert r.strength_micro > 0
    # BT is monotone-ish in win rate on a dense comparison graph: the
    # highest-strength item must not have the worst win rate
    best = max(rows, key=lambda r: r.strength_micro)
    worst_rate = min(r.wins / r.games for r in rows)
    assert best.wins / best.games > worst_rate


def test_wave91_plans_are_bounded(spark):
    for q in (
        q_cross_source_leakage,
        q_simpsons_paradox_screen,
        q_bradley_terry_strengths,
    ):
        df = q(spark, SF)
        assert_no_global_window(df)
        assert_no_python_udf(df)
        assert not unbounded_nested_loop_joins(df)
