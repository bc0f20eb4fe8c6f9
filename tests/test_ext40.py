"""Wave 41: hierarchy rollup, interval union, tolerance as-of join."""

from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
)
from etl_poor_main_pipeline_spark.registry_ext40 import (
    _ASOF_TOL_S,
    _IU_WINDOW_MIN,
    q_asof_join_tolerance,
    q_hierarchy_rollup_paths,
    q_interval_union_active_time,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_hierarchy_rollup_conserves_totals(spark):
    rows = q_hierarchy_rollup_paths(spark, SF).collect()
    d = load_table(spark, SF, "documents")
    totals = d.agg(F.count(F.lit(1)), F.sum("n_chars")).collect()[0]
    assert sum(r.n_leaves for r in rows) == totals[0]
    assert sum(r.total_chars for r in rows) == totals[1]
    for r in rows:
        assert r.max_child_chars <= r.total_chars
        assert 1 <= r.n_children <= 10


def test_interval_union_bounds(spark):
    rows = q_interval_union_active_time(spark, SF).collect()
    e = load_table(spark, SF, "events")
    per_user = {
        r.user_id: r.n for r in e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    win = _IU_WINDOW_MIN * 60
    for r in rows:
        n_events = per_user[r.user_id]
        assert 1 <= r.n_islands <= n_events
        # each island is at least one window long; unions never exceed
        # the sum of the separate intervals
        assert r.n_islands * win <= r.active_seconds <= n_events * win


def test_asof_tolerance_never_exceeds_bound(spark):
    rows = q_asof_join_tolerance(spark, SF).collect()
    assert rows
    n_stale_or_none = 0
    for r in rows:
        if r.fresh_signup_id is None:
            n_stale_or_none += 1
            assert r.staleness_s is None
        else:
            assert 0 <= r.staleness_s <= _ASOF_TOL_S
    # the 1h bound must actually cut something relative to the plain asof
    assert n_stale_or_none > 0


def test_wave41_plans_are_scale_safe(spark):
    for fn in (
        q_hierarchy_rollup_paths,
        q_interval_union_active_time,
        q_asof_join_tolerance,
    ):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
