"""Wave 78: SRM guardrail, contrastive negatives, Mahalanobis outliers."""

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
)
from etl_poor_main_pipeline_spark.registry_ext77 import (
    _MAH_TOPK,
    _NEG_K,
    _SRM_CRIT_MICRO,
    q_ab_srm_check,
    q_mahalanobis_outliers_diag,
    q_negative_sampling_contrastive,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_srm_counts_partition_days(spark):
    rows = q_ab_srm_check(spark, SF).collect()
    total = load_table(spark, SF, "events").count()
    assert sum(r.n_a + r.n_b for r in rows) == total
    for r in rows:
        expect = (r.n_a - r.n_b) ** 2 / (r.n_a + r.n_b)
        assert abs(r.chi2_micro / 1e6 - expect) < 1e-3
        assert r.srm_flag == (r.chi2_micro > _SRM_CRIT_MICRO)


def test_negative_samples_valid_and_deterministic(spark):
    rows = q_negative_sampling_contrastive(spark, SF).collect()
    assert rows
    docs = load_table(spark, SF, "documents").selectExpr(
        "doc_id",
        "md5(array_join(array_sort(array_distinct("
        "filter(split(lower(text), '\\\\s+'), t -> t <> ''))), ' ')) as fp",
    ).collect()
    fp = {d.doc_id: d.fp for d in docs}
    n_ids = max(fp) + 1
    for r in rows:
        assert 1 <= r.neg_rank <= _NEG_K
        assert r.neg_id == (r.anchor_id * 31 + r.neg_rank * 97) % n_ids
        assert r.neg_id != r.anchor_id
        assert fp[r.neg_id] != fp[r.anchor_id]  # negative is a true non-dup
        assert fp[r.pos_id] == fp[r.anchor_id]  # positive shares the group
        assert r.pos_id != r.anchor_id
    # rerun is bit-identical (pure function of the corpus)
    again = q_negative_sampling_contrastive(spark, SF).collect()
    assert rows == again


def test_mahalanobis_topk_ordered_positive(spark):
    rows = q_mahalanobis_outliers_diag(spark, SF).collect()
    assert len(rows) == _MAH_TOPK
    ds = [r.md2_micro for r in rows]
    assert ds == sorted(ds, reverse=True)
    assert all(d > 0 for d in ds)


def test_wave78_plans_are_scale_safe(spark):
    for fn in (
        q_ab_srm_check,
        q_negative_sampling_contrastive,
        q_mahalanobis_outliers_diag,
    ):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
