"""Wave 63: RANSAC line fit, Grubbs test, MoM growth."""

import math

from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
)
from etl_poor_main_pipeline_spark.registry_ext62 import (
    _RANSAC_TRIALS,
    q_grubbs_outlier_test,
    q_month_over_month_growth,
    q_ransac_line_fit,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_ransac_picks_a_trial_with_inliers(spark):
    rows = q_ransac_line_fit(spark, SF).collect()
    assert len(rows) == 5
    counts = {
        r.event_type: r.n
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert 0 <= r.best_trial < len(_RANSAC_TRIALS)
        assert 1 <= r.n_inliers <= counts[r.event_type]


def test_grubbs_matches_bruteforce(spark):
    rows = {r.event_type: r for r in q_grubbs_outlier_test(spark, SF).collect()}
    pdf = (
        load_table(spark, SF, "events")
        .select("event_type", "value", "event_id")
        .toPandas()
    )
    for t, g in pdf.groupby("event_type"):
        vs = [(int(v * 100.0 + 0.5), e) for v, e in zip(g.value, g.event_id)]
        n = len(vs)
        s = sum(v for v, _ in vs)
        ss = sum(v * v for v, _ in vs)
        best = max(vs, key=lambda p: (abs(n * p[0] - s), -p[1]))
        want_g = math.floor(
            1e6 * abs(n * best[0] - s) / math.sqrt(n * ss - s * s) + 0.5
        )
        r = rows[t]
        assert r.outlier_v_c == best[0]
        assert r.g_micro == want_g, t


def test_mom_growth_consistency(spark):
    rows = q_month_over_month_growth(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.rev_c > 0 and r.prev_rev_c > 0
        want = math.floor(1e6 * r.rev_c / r.prev_rev_c + 0.5)
        assert r.growth_ratio_micro == want


def test_wave63_plans_are_scale_safe(spark):
    for fn in (q_ransac_line_fit, q_grubbs_outlier_test, q_month_over_month_growth):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
