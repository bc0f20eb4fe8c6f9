"""Wave 49: histogram split finder, calibration bins, grouped k-fold."""

from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
)
from etl_poor_main_pipeline_spark.registry_ext48 import (
    _KFOLD,
    _SPLIT_POS,
    q_calibration_bins,
    q_group_kfold_assignment,
    q_histogram_split_finder,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_split_finder_beats_every_other_threshold(spark):
    rows = {r.feature: r for r in q_histogram_split_finder(spark, SF).collect()}
    assert set(rows) == {"value", "hour"}
    pdf = (
        load_table(spark, SF, "events")
        .select(
            F.when(F.col("event_type") == _SPLIT_POS, 1).otherwise(0).alias("y"),
            F.floor(F.col("value") / 10.0).cast("bigint").alias("value"),
            F.hour("ts").cast("bigint").alias("hour"),
        )
        .toPandas()
    )
    for feat, r in rows.items():
        assert r.nl + r.nr == len(pdf)
        assert r.posl + r.posr == int(pdf.y.sum())
        # brute-force: no other threshold scores higher
        g = pdf.groupby(feat).y.agg(["count", "sum"]).sort_index()
        nt, post = g["count"].sum(), g["sum"].sum()
        best = None
        nl = posl = 0
        for b, row in g.iterrows():
            nl += row["count"]
            posl += row["sum"]
            nr, posr = nt - nl, post - posl
            if nl == 0 or nr == 0:
                continue
            score = (posl**2 + (nl - posl) ** 2) / nl + (
                posr**2 + (nr - posr) ** 2
            ) / nr
            if best is None or score > best[0]:
                best = (score, b)
        assert r.split_bin == best[1], feat


def test_calibration_bins_partition_the_rows(spark):
    rows = q_calibration_bins(spark, SF).collect()
    n_total = load_table(spark, SF, "events").count()
    assert sum(r.n for r in rows) == n_total
    for r in rows:
        assert 0 <= r.frac_pos_micro <= 1_000_000
        assert r.abs_gap_micro == abs(r.mean_pred_micro - r.frac_pos_micro)


def test_group_kfold_covers_everything_without_leakage(spark):
    rows = q_group_kfold_assignment(spark, SF).collect()
    e = load_table(spark, SF, "events")
    assert sum(r.n_events for r in rows) == e.count()
    assert sum(r.n_users for r in rows) == e.select("user_id").distinct().count()
    assert {r.fold for r in rows} <= set(range(_KFOLD))


def test_wave49_plans_are_scale_safe(spark):
    for fn in (
        q_histogram_split_finder,
        q_calibration_bins,
        q_group_kfold_assignment,
    ):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
