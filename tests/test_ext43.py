"""Wave 44: bitmap distinct rollup, Theil-Sen slope, gaps and islands."""

from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
)
from etl_poor_main_pipeline_spark.registry_ext43 import (
    _TS_LAGS,
    q_bitmap_rollup_week,
    q_calendar_gap_islands,
    q_theil_sen_slope,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_bitmap_rollup_equals_direct_distinct(spark):
    got = {r.week: r.n_distinct_users for r in q_bitmap_rollup_week(spark, SF).collect()}
    e = load_table(spark, SF, "events")
    want = {
        r.week: r.n
        for r in e.groupBy(
            F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


def test_theil_sen_covers_types_and_lags(spark):
    rows = q_theil_sen_slope(spark, SF).collect()
    types = {
        r.event_type
        for r in load_table(spark, SF, "events").select("event_type").distinct().collect()
    }
    seen = {(r.event_type, r.lag) for r in rows}
    for t in types:
        assert (t, _TS_LAGS[0]) in seen, t
    for r in rows:
        assert r.n_pairs > 0


def test_gap_islands_consistent(spark):
    r = q_calendar_gap_islands(spark, SF).collect()[0]
    o = load_table(spark, SF, "orders")
    n_days = o.select(F.to_date("o_orderdate")).distinct().count()
    assert r.n_days == n_days
    assert 1 <= r.n_islands <= r.n_days
    assert r.longest_streak_days <= r.n_days
    assert r.longest_streak_days >= (r.n_days + r.n_islands - 1) // r.n_islands


def test_wave44_plans_are_scale_safe(spark):
    for fn in (q_bitmap_rollup_week, q_theil_sen_slope, q_calendar_gap_islands):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
