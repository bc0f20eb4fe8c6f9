"""Wave 35: pre-agg pyramid, null-safe join, share-of-total,
foreachBatch upsert streaming, table profiling."""

from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
    explain_str,
)
from etl_poor_main_pipeline_spark.registry_ext34 import (
    _PROFILE_COLS,
    q_hierarchical_rollup_reuse,
    q_null_safe_join,
    q_share_of_total_agg,
    q_streaming_upsert_latest,
    q_table_stats_profile,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_rollup_levels_consistent(spark):
    rows = q_hierarchical_rollup_reuse(spark, SF).collect()
    hours = [r for r in rows if r.grain == "hour"]
    days = [r for r in rows if r.grain == "day"]
    assert hours and days
    assert sum(r.n for r in hours) == sum(r.n for r in days)
    n_events = load_table(spark, SF, "events").count()
    assert sum(r.n for r in days) == n_events


def test_null_safe_join_keeps_null_bucket(spark):
    rows = {r.dim_label: r for r in q_null_safe_join(spark, SF).collect()}
    assert "URGENT-NULL" in rows  # plain equality would drop this bucket
    n_orders = load_table(spark, SF, "orders").count()
    assert sum(r.n for r in rows.values()) == n_orders


def test_null_safe_join_is_hash_not_nested_loop(spark):
    plan = explain_str(q_null_safe_join(spark, SF))
    assert "NestedLoop" not in plan, plan


def test_share_of_total_sums_to_one(spark):
    rows = q_share_of_total_agg(spark, SF).collect()
    assert rows
    assert abs(sum(r.share_ppm for r in rows) - 1_000_000) <= len(rows)


def test_streaming_upsert_equals_batch_latest(spark):
    got = {
        r.event_type: r.n_users_latest
        for r in q_streaming_upsert_latest(spark, SF).collect()
    }
    from pyspark.sql.window import Window

    e = load_table(spark, SF, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    want = {
        r.event_type: r.n
        for r in e.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_profile_covers_all_columns_exactly(spark):
    rows = {r.column: r for r in q_table_stats_profile(spark, SF).collect()}
    assert set(rows) == set(_PROFILE_COLS)
    o = load_table(spark, SF, "orders")
    assert rows["o_orderkey"].n_distinct == o.count()  # key column: all distinct
    assert all(r.n_null == 0 for r in rows.values())


def test_wave35_plans_are_scale_safe(spark):
    for fn in (
        q_hierarchical_rollup_reuse,
        q_null_safe_join,
        q_share_of_total_agg,
        q_table_stats_profile,
    ):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
