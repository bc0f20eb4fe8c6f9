"""Wave 57: containment dedup, Zipf slope, RAG chunk overlap."""

import math

from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.functions.text import tokens_expr
from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
)
from etl_poor_main_pipeline_spark.registry_ext56 import (
    _CONT_THRESH,
    _RAG_STRIDE,
    _RAG_WIDTH,
    q_containment_dedup_pairs,
    q_rag_chunk_overlap,
    q_zipf_slope_tokens,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_containment_pairs_verified_on_driver(spark):
    rows = q_containment_dedup_pairs(spark, SF).collect()
    assert rows, "template-heavy fixture should yield containment pairs"
    toks = {
        r.doc_id: set(r.ts)
        for r in load_table(spark, SF, "documents")
        .select("doc_id", tokens_expr("text").alias("ts"))
        .collect()
    }
    for r in rows[:200]:
        a, b = toks[r.id_small], toks[r.id_big]
        c = len(a & b) / len(a)
        assert c >= _CONT_THRESH
        assert r.containment_micro == math.floor(1e6 * c + 0.5)


def test_zipf_slope_is_negative(spark):
    rows = q_zipf_slope_tokens(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        # frequency decreases with rank: slope must be negative
        assert r.slope_micro < 0
        assert r.n > 10


def test_rag_chunks_cover_and_overlap(spark):
    rows = {r.doc_id: r for r in q_rag_chunk_overlap(spark, SF).collect()}
    docs = (
        load_table(spark, SF, "documents")
        .select("doc_id", F.size(tokens_expr("text")).alias("n"))
        .collect()
    )
    for d in docs:
        if d.n == 0:
            assert d.doc_id not in rows
            continue
        r = rows[d.doc_id]
        assert r.n_chunks == (d.n + _RAG_STRIDE - 1) // _RAG_STRIDE
        # overlap duplicates tokens when the doc spans multiple strides
        if d.n > _RAG_WIDTH:
            assert r.sum_chunk_tokens > d.n
        assert r.sum_chunk_tokens >= d.n


def test_wave57_plans_are_scale_safe(spark):
    for fn in (q_containment_dedup_pairs, q_zipf_slope_tokens, q_rag_chunk_overlap):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
