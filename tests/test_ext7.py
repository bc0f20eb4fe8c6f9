"""Wave-8 operator semantics the oracle compare can't pin down."""

from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.plans.explain import pushed_filters
from etl_poor_main_pipeline_spark.registry import _t
from etl_poor_main_pipeline_spark.registry_ext7 import (
    q_runtime_filter_semi,
    q_sketch_hll_mergeable,
)

SF = "/root/testdata/sf0.001"


def test_hll_estimate_close_to_exact(spark):
    """The query now carries its accuracy claim in-band (oracle-graded):
    exact anchor + merged_within_5pct boolean."""
    est = q_sketch_hll_mergeable(spark, SF).head()
    exact = _t(spark, SF, "orders").select("o_custkey").distinct().count()
    assert est.n_groups == 5
    assert est.exact_customers == exact
    assert est.merged_within_5pct


def test_hll_sketch_merge_equals_single_sketch(spark):
    """Mergeability: union of per-group sketches == one global sketch."""
    o = _t(spark, SF, "orders")
    merged = (
        o.groupBy("o_orderpriority")
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .head()
        .e
    )
    single = o.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("e")
    ).head().e
    assert merged == single


def test_runtime_filter_reaches_parquet_scan(spark):
    """The dim-derived IN list must appear in the fact scan's
    PushedFilters — that is the point of the manual runtime filter."""
    df = q_runtime_filter_semi(spark, SF)
    pf = pushed_filters(df)
    assert "l_suppkey" in pf and "In(" in pf
