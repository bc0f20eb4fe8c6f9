"""Wave 33: PII redaction, boilerplate prune, interval overlap, target
encoding, feature hashing, MAD outliers, bipartite HITS."""

import math

from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
)
from etl_poor_main_pipeline_spark.registry_ext32 import (
    _FH_BUCKETS,
    q_boilerplate_ngram_prune,
    q_feature_hashing_sparse,
    q_hits_event_types,
    q_interval_overlap_months,
    q_mad_outliers_robust,
    q_pii_redact_scrub,
    q_target_mean_encoding,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_pii_redaction_counts_and_idempotence(spark):
    rows = q_pii_redact_scrub(spark, SF).collect()
    assert rows
    for r in rows[:50]:
        # doc_id%3+1 synthetic emails plus the fixed alt-domain one
        assert r.n_email == (r.doc_id % 3 + 1) + 1
        assert r.n_phone == 1
        assert r.n_card == 1
        assert len(r.scrub_md5) == 32


def test_boilerplate_prune_bounds(spark):
    rows = q_boilerplate_ngram_prune(spark, SF).collect()
    assert rows
    total_boiler = 0
    for r in rows:
        assert 0 <= r.n_boiler <= r.n_grams
        assert r.boiler_ppm == math.floor(1e6 * r.n_boiler / r.n_grams + 0.5)
        total_boiler += r.n_boiler
    assert total_boiler > 0  # template corpus: frequent grams must exist


def test_interval_overlap_consistency(spark):
    rows = {r.month: r for r in q_interval_overlap_months(spark, SF).collect()}
    assert rows
    # every overlapping lineitem contributes >= 1 day to its month
    for r in rows.values():
        assert r.sum_overlap_days >= r.n_in_flight


def test_target_encoding_excludes_self(spark):
    df = q_target_mean_encoding(spark, SF)
    rows = df.limit(200).collect()
    assert rows
    # LOO encoding differs across orders within a segment unless the
    # removed values are equal — spot-check it is not the plain mean
    orders = load_table(spark, SF, "orders")
    seg_mean = {
        r.segment: r.mean_x10000
        for r in orders.join(
            load_table(spark, SF, "customer"),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.floor(
                F.lit(10000.0)
                * F.avg(F.floor(F.lit(100.0) * F.col("o_totalprice") + F.lit(0.5)))
            ).alias("mean_x10000")
        )
        .collect()
    }
    diffs = sum(1 for r in rows if abs(r.loo_cents_x10000 - seg_mean[r.segment]) > 0)
    assert diffs > 0


def test_feature_hashing_bounded_and_conserving(spark):
    rows = q_feature_hashing_sparse(spark, SF).collect()
    assert 0 < len(rows) <= _FH_BUCKETS
    docs = load_table(spark, SF, "documents")
    n_tokens_true = docs.select(
        F.size(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != F.lit(""))
        ).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert sum(r.n_tokens for r in rows) == n_tokens_true  # mass conserved


def test_mad_outlier_gate_sane(spark):
    rows = q_mad_outliers_robust(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.mad_cents_x4 >= 0
        assert 0 <= r.n_outliers < r.n  # robust gate never flags everything


def test_hits_authorities_normalized(spark):
    rows = q_hits_event_types(spark, SF).collect()
    assert rows
    # L1-normalized: micro scores sum to ~1e6 (rounding slack 1 per row)
    assert abs(sum(r.auth_micro for r in rows) - 1_000_000) <= len(rows)


def test_wave33_plans_are_scale_safe(spark):
    for fn in (
        q_pii_redact_scrub,
        q_boilerplate_ngram_prune,
        q_interval_overlap_months,
        q_target_mean_encoding,
        q_feature_hashing_sparse,
        q_mad_outliers_robust,
        q_hits_event_types,
    ):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
