"""Wave 52: streaming left-outer join, prune simulation, max drawdown."""

from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
)
from etl_poor_main_pipeline_spark.registry_ext51 import (
    q_manifest_prune_sim,
    q_max_drawdown,
    q_streaming_left_join,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_streaming_left_join_emits_matched_and_unmatched(spark):
    rows = q_streaming_left_join(spark, SF).collect()
    matched = [r for r in rows if r.converted]
    unmatched = [r for r in rows if not r.converted]
    assert matched, "some clicks convert in the fixture"
    assert unmatched, "watermark flushes unmatched clicks"
    for r in unmatched:
        assert r.purchase_id is None
    # never more output clicks than source clicks
    n_clicks = (
        load_table(spark, SF, "events").where(F.col("event_type") == "click").count()
    )
    assert len({r.click_id for r in rows}) <= n_clicks


def test_prune_sim_monotone_and_bounded(spark):
    rows = {r.pred: r for r in q_manifest_prune_sim(spark, SF).collect()}
    assert set(rows) == {"custkey_point", "custkey_range", "price_high", "both"}
    for r in rows.values():
        assert 0 <= r.n_scanned <= r.n_files
    # a point predicate must scan no more files than the enclosing range
    assert rows["custkey_point"].n_scanned <= rows["custkey_range"].n_files
    # adding a predicate can only prune further
    assert rows["both"].n_scanned <= rows["custkey_range"].n_scanned


def test_max_drawdown_matches_bruteforce(spark):
    rows = {r.event_type: r for r in q_max_drawdown(spark, SF).collect()}
    pdf = (
        load_table(spark, SF, "events")
        .select("event_type", "value", F.unix_micros("ts").alias("t"), "event_id")
        .toPandas()
    )
    for t, g in pdf.groupby("event_type"):
        g = g.sort_values(["t", "event_id"])
        peak, best = -1, 0
        for v in (int(x * 100.0 + 0.5) for x in g.value):
            peak = max(peak, v)
            best = max(best, peak - v)
        assert rows[t].max_drawdown_c == best, t
        assert rows[t].peak_c - rows[t].trough_c == best


def test_wave52_plans_are_scale_safe(spark):
    for fn in (q_manifest_prune_sim, q_max_drawdown):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
