"""Wave 84: referential integrity, seasonal-naive MASE, completeness."""

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
    unbounded_nested_loop_joins,
)
from etl_poor_main_pipeline_spark.registry_ext83 import (
    _RI_EDGES,
    q_hourly_completeness_audit,
    q_referential_integrity_audit,
    q_seasonal_naive_mase,
)

SF = "/root/testdata/sf0.001"


def test_ri_audit_covers_every_edge_and_corpus_is_clean(spark):
    rows = {r.fk_edge: r for r in q_referential_integrity_audit(spark, SF).collect()}
    assert len(rows) == len(_RI_EDGES)
    for r in rows.values():
        assert r.n_child > 0
        assert 0 <= r.n_orphans <= r.n_child
        assert r.orphan_rate_micro <= 1_000_000
    # the driver corpus is referentially clean — the audit must say so
    assert all(r.n_orphans == 0 for r in rows.values())


def test_mase_consistency(spark):
    rows = q_seasonal_naive_mase(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_hours > 0
        assert r.mae_seasonal_micro >= 0 and r.mae_naive_micro > 0
        # mase_micro is the exact ratio of the two MAE numerators
        approx = r.mae_seasonal_micro / r.mae_naive_micro
        assert abs(r.mase_micro / 1e6 - approx) < 0.01


def test_completeness_bounds(spark):
    rows = q_hourly_completeness_audit(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_present + r.n_missing == r.n_expected
        assert 0 < r.completeness_micro <= 1_000_000
        assert r.longest_gap_hours >= 0
        assert 0 <= r.tail_lag_hours


def test_wave84_plans_are_scale_safe(spark):
    for fn in (
        q_referential_integrity_audit,
        q_seasonal_naive_mase,
        q_hourly_completeness_audit,
    ):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
        assert not unbounded_nested_loop_joins(df)
