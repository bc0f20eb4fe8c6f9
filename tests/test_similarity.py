import numpy as np
from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.operators.similarity import (
    cosine_self_join,
    ivf_build,
    ivf_search,
    topk_cosine,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_topk_matches_numpy_bruteforce(spark):
    e = load_table(spark, SF, "embeddings")
    rows = e.collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    q = vecs[0]

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    expected = sorted(
        ((round(cos(q, v), 6), -k) for k, v in vecs.items() if k != 0), reverse=True
    )[:10]
    expected_ids = [-i for _, i in expected]

    got = topk_cosine(e.filter(F.col("vec_id") != 0), list(q), k=10).collect()
    assert [r.vec_id for r in got] == expected_ids


def test_ivf_recall_at_10(spark):
    e = load_table(spark, SF, "embeddings")
    q = list(e.filter(F.col("vec_id") == 0).head().embedding)
    exact = {r.vec_id for r in topk_cosine(e.filter(F.col("vec_id") != 0), q, k=10).collect()}
    assigned, cents = ivf_build(e.filter(F.col("vec_id") != 0), num_centroids=16)
    approx = {r.vec_id for r in ivf_search(assigned, cents, q, k=10, nprobe=8).collect()}
    # coarse quantization with random-ish fixture vectors: expect >=40% overlap
    assert len(exact & approx) >= 4


def test_self_join_gemm_matches_expression_path(spark):
    e = load_table(spark, SF, "embeddings").limit(100)
    gemm = {
        (r.id_a, r.id_b, r.cosine)
        for r in cosine_self_join(e, threshold=0.2, block_col="label").collect()
    }
    expr = {
        (r.id_a, r.id_b, r.cosine)
        for r in cosine_self_join(
            e.filter(F.col("label") == 5), threshold=0.2, block_col=None
        ).collect()
    }
    # expression path runs on one label; every pair it finds must be in the
    # GEMM result with an identical rounded cosine
    assert expr <= gemm


def test_no_python_row_udfs_in_topk_plan(spark):
    from etl_poor_main_pipeline_spark.plans.explain import assert_no_python_udf

    e = load_table(spark, SF, "embeddings")
    q = list(e.filter(F.col("vec_id") == 0).head().embedding)
    assert_no_python_udf(topk_cosine(e, q, k=5))


def test_srp_lsh_recall_at_10(spark):
    from etl_poor_main_pipeline_spark.registry_ext4 import q_similarity_srp_lsh

    e = load_table(spark, SF, "embeddings")
    q = list(e.filter(F.col("vec_id") == 0).head().embedding)
    exact = {r.vec_id for r in topk_cosine(e.filter(F.col("vec_id") != 0), q, k=10).collect()}
    approx = {r.vec_id for r in q_similarity_srp_lsh(spark, SF).collect()}
    # 16 sign bits with Hamming<=4 probing: expect >=40% overlap on the
    # random-ish fixture vectors (same bar as IVF)
    assert len(exact & approx) >= 4
