"""Wave 38: distributed CUME_DIST twin, seasonal decomposition, 2-D
heatmap binning."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
)
from etl_poor_main_pipeline_spark.registry_ext37 import (
    q_distributed_cume_dist,
    q_heatmap_bin_2d,
    q_seasonal_decompose_mean,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_distributed_cume_dist_equals_global_window(spark):
    got = {
        r.c_custkey: (r.bal_cume_dist, r.bal_pct_rank)
        for r in q_distributed_cume_dist(spark, SF).collect()
    }
    c = load_table(spark, SF, "customer")
    w = Window.orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    want = {
        r.c_custkey: (r.cd, r.pr)
        for r in c.select(
            "c_custkey",
            F.round(F.cume_dist().over(w), 6).alias("cd"),
            F.round(F.percent_rank().over(w), 6).alias("pr"),
        ).collect()
    }
    assert got == want


def test_distributed_cume_dist_plan_is_partition_parallel(spark):
    df = q_distributed_cume_dist(spark, SF)
    assert_no_global_window(df)  # the whole point of the twin
    assert_no_python_udf(df)


def test_seasonal_decompose_sane(spark):
    rows = q_seasonal_decompose_mean(spark, SF).collect()
    assert rows
    n_events = load_table(spark, SF, "events").count()
    assert sum(r.n_events for r in rows) == n_events
    for r in rows:
        assert r.trough_seasonal_micro <= r.peak_seasonal_micro
        assert r.resid_mad_micro >= 0


def test_heatmap_cells_cover_all_orders(spark):
    rows = q_heatmap_bin_2d(spark, SF).collect()
    assert rows
    n_orders = load_table(spark, SF, "orders").count()
    assert sum(r.n for r in rows) == n_orders
    assert all(r.price_bin >= 0 for r in rows)


def test_wave38_plans_are_scale_safe(spark):
    for fn in (q_seasonal_decompose_mean, q_heatmap_bin_2d):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
