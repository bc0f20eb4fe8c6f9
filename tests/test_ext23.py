"""Wave 24: deterministic splits, triangle counting, context-window
packing, mergeable partial aggregates."""

from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.registry_ext23 import (
    _CTX,
    q_context_window_pack,
    q_incremental_agg_merge,
    q_split_train_val_test,
    q_triangle_count,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_split_is_partition_and_roughly_80_10_10(spark):
    rows = q_split_train_val_test(spark, SF).collect()
    n_total = load_table(spark, SF, "documents").count()
    by_split = {}
    for r in rows:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    assert sum(by_split.values()) == n_total  # a partition: no loss, no dup
    assert set(by_split) == {"train", "val", "test"}
    assert by_split["train"] / n_total > 0.7  # md5 targets ~80.1%
    # leakage check the docstring promises: every language reaches train
    langs = {r.lang for r in rows}
    train_langs = {r.lang for r in rows if r.split == "train"}
    assert train_langs == langs


def test_split_is_order_independent(spark):
    """The split must depend only on the key: shuffling input rows
    changes nothing."""
    a = {(r.split, r.lang): r.n_docs for r in q_split_train_val_test(spark, SF).collect()}
    # force a different physical order/partitioning upstream
    d = load_table(spark, SF, "documents").repartition(7, "lang")
    d.createOrReplaceTempView("documents_shuffled")
    b = {(r.split, r.lang): r.n_docs for r in q_split_train_val_test(spark, SF).collect()}
    assert a == b


def test_triangles_nonempty_and_symmetric_bounds(spark):
    rows = q_triangle_count(spark, SF).collect()
    assert rows  # template-heavy corpus forms cliques
    total = sum(r.n_triangles for r in rows)
    assert total % 3 == 0  # every triangle contributes to exactly 3 nodes
    assert all(r.n_triangles >= 1 for r in rows)


def test_pack_windows_are_full_except_last(spark):
    rows = q_context_window_pack(spark, SF).collect()
    assert rows
    ids = [r.window_id for r in rows]
    assert ids == list(range(len(ids)))  # contiguous stream, no gaps
    for r in rows[:-1]:
        assert r.n_tokens == _CTX  # interior windows exactly full
    assert 0 < rows[-1].n_tokens <= _CTX
    # conservation: window tokens sum to the corpus token count
    d = load_table(spark, SF, "documents")
    n_corpus = d.select(
        F.sum(F.size(F.filter(F.split("text", r"\s+"), lambda t: t != "")))
    ).collect()[0][0]
    assert sum(r.n_tokens for r in rows) == n_corpus


def test_incremental_merge_equals_direct_aggregate(spark):
    """Merged partial states must equal a direct scan — the mergeability
    contract itself, asserted in-engine (the oracle asserts it
    cross-engine)."""
    merged = {r.month: r for r in q_incremental_agg_merge(spark, SF).collect()}
    li = load_table(spark, SF, "lineitem")
    direct = {
        r.month: r
        for r in li.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double"), 2
            ).alias("revenue"),
        )
        .collect()
    }
    assert set(merged) == set(direct)
    for m in merged:
        assert merged[m].n_items == direct[m].n_items
        assert merged[m].revenue == direct[m].revenue
