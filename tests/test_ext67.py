"""Wave 68: fanout Gini, engagement entropy, degree assortativity."""

import math

from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
)
from etl_poor_main_pipeline_spark.registry_ext67 import (
    q_degree_assortativity,
    q_fanout_gini,
    q_user_diversity_entropy,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_gini_matches_bruteforce(spark):
    r = q_fanout_gini(spark, SF).collect()[0]
    fans = [
        row.f
        for row in load_table(spark, SF, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("f"))
        .collect()
    ]
    n, s = len(fans), sum(fans)
    mad = sum(abs(a - b) for a in fans for b in fans)
    assert r.n == n
    assert r.gini_micro == math.floor(1e6 * mad / (2 * n * s) + 0.5)
    assert 0 <= r.gini_micro < 1_000_000


def test_entropy_histogram_covers_users(spark):
    rows = q_user_diversity_entropy(spark, SF).collect()
    users = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert sum(r.n_users for r in rows) == users
    for r in rows:
        assert 0 <= r.bucket <= 9


def test_assortativity_in_valid_range(spark):
    r = q_degree_assortativity(spark, SF).collect()[0]
    assert -1_000_000 <= r.r_micro <= 1_000_000
    assert r.m2 > 0 and r.m2 % 2 == 0  # both directions of each edge


def test_wave68_plans_are_scale_safe(spark):
    for fn in (q_fanout_gini, q_user_diversity_entropy, q_degree_assortativity):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
