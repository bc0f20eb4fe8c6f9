"""Wave 95: LOO source ablation, quantile treatment effects, class weights."""

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
    unbounded_nested_loop_joins,
)
from etl_poor_main_pipeline_spark.registry_ext94 import (
    _QTE_PS,
    q_class_balanced_weights,
    q_loo_source_ablation,
    q_quantile_treatment_effects,
)

SF = "/root/testdata/sf0.001"


def test_loo_deltas_sum_structure(spark):
    rows = q_loo_source_ablation(spark, SF).collect()
    assert len(rows) >= 2
    deltas = [r.loo_delta_micro for r in rows]
    assert deltas == sorted(deltas, reverse=True)  # ranked for pruning
    # a source whose mean is below the corpus mean must have positive
    # LOO delta (dropping it raises the mean), and vice versa
    mean_all = sum(r.mean_milli * r.n for r in rows) / sum(r.n for r in rows)
    for r in rows:
        if r.mean_milli < mean_all - 1:
            assert r.loo_delta_micro >= 0
        if r.mean_milli > mean_all + 1:
            assert r.loo_delta_micro <= 0


def test_qte_grid(spark):
    rows = q_quantile_treatment_effects(spark, SF).collect()
    assert [r.p_pct for r in rows] == _QTE_PS
    for r in rows:
        assert r.qte_milli == r.q_treated - r.q_control
        assert r.q_treated > 0 and r.q_control > 0
    # per-arm quantiles are monotone in p
    for col in ("q_treated", "q_control"):
        vals = [getattr(r, col) for r in rows]
        assert vals == sorted(vals)


def test_class_balanced_weights(spark):
    rows = q_class_balanced_weights(spark, SF).collect()
    assert len(rows) >= 2
    k = len(rows)
    # normalized: weights sum to k (in micro, with rounding slack)
    assert abs(sum(r.weight_micro for r in rows) - k * 1_000_000) <= k
    for r in rows:
        assert 0 < r.effective_n <= r.n + 1
    # rarer classes never get SMALLER weights
    by_n = sorted(rows, key=lambda r: r.n)
    for a, b in zip(by_n, by_n[1:]):
        assert a.weight_micro >= b.weight_micro


def test_wave94_plans_are_bounded(spark):
    for q in (
        q_loo_source_ablation,
        q_quantile_treatment_effects,
        q_class_balanced_weights,
    ):
        df = q(spark, SF)
        assert_no_global_window(df)
        assert_no_python_udf(df)
        assert not unbounded_nested_loop_joins(df)
