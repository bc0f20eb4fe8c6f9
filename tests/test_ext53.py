"""Wave 54: trigram index, Poisson bootstrap CI, CDC net effect."""

from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
)
from etl_poor_main_pipeline_spark.registry_ext53 import (
    _TRGM_PATTERN,
    q_cdc_net_effect,
    q_poisson_bootstrap_ci,
    q_trigram_like_index,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_trigram_index_equals_bruteforce_like(spark):
    got = {r.doc_id for r in q_trigram_like_index(spark, SF).collect()}
    want = {
        r.doc_id
        for r in load_table(spark, SF, "documents")
        .where(F.contains(F.col("text"), F.lit(_TRGM_PATTERN)))
        .collect()
    }
    assert got == want
    assert got, "pattern should match some fixture documents"


def test_bootstrap_interval_brackets_point_mean(spark):
    rows = q_poisson_bootstrap_ci(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.boot_lo_micro <= r.boot_hi_micro
        # the point mean should fall inside (or at worst on) the interval
        assert r.boot_lo_micro - 2_000_000 <= r.mean_micro <= r.boot_hi_micro + 2_000_000
        # interval should be non-degenerate for a 200-row stratum
        assert r.boot_hi_micro > r.boot_lo_micro


def test_cdc_net_effect_rules(spark):
    rows = q_cdc_net_effect(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.net_op in ("I", "U", "D")
        if r.net_op == "D":
            assert r.last_value_c is None
        else:
            assert r.last_value_c is not None
        assert r.n_changes >= 1
    # keys with net_op NONE (signup..error) are absent entirely
    users = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert len(rows) <= users


def test_wave54_plans_are_scale_safe(spark):
    for fn in (q_trigram_like_index, q_poisson_bootstrap_ci, q_cdc_net_effect):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
