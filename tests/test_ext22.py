"""Wave 23: LLM-curation depth — SemDeDup, chunk dedup, sparse cosine,
portable bloom filter, bigram LM scorer, quantile gate."""

from etl_poor_main_pipeline_spark.registry_ext22 import (
    _SD_TAU_MICRO,
    q_bigram_logprob,
    q_bloom_runtime_filter,
    q_chunk_dedup_rebuild,
    q_quality_quantile_gate,
    q_semdedup_prune,
    q_sparse_cosine_topk,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_semdedup_covers_every_vector_and_drops_some(spark):
    n = load_table(spark, SF, "embeddings").count()
    rows = q_semdedup_prune(spark, SF).collect()
    assert len(rows) == n  # every vector classified exactly once
    dropped = [r for r in rows if r.status == "dropped"]
    assert 0 < len(dropped) < n  # non-vacuous at the fixture threshold
    # a vector can only be dropped by a LOWER-id neighbor, so the
    # smallest id overall is always kept
    assert min(rows, key=lambda r: r.vec_id).status == "kept"


def test_chunk_dedup_conserves_chunks_and_finds_dups(spark):
    rows = q_chunk_dedup_rebuild(spark, SF).collect()
    assert rows
    total = sum(r.n_chunks for r in rows)
    kept = sum(r.n_kept for r in rows)
    assert 0 < kept < total  # cross-doc duplicate chunks exist and are cut
    assert all(0 <= r.n_kept <= r.n_chunks for r in rows)
    assert all(r.n_tokens_kept <= r.n_chunks * 16 for r in rows)


def test_sparse_cosine_is_ranked_and_excludes_query(spark):
    rows = q_sparse_cosine_topk(spark, SF).collect()
    assert len(rows) == 15
    assert all(r.doc_id != 0 for r in rows)
    scores = [r.score_micro for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert scores[0] > 0  # word-salad corpus shares terms: non-vacuous


def test_bloom_has_no_false_negatives_and_bounded_fp(spark):
    row = q_bloom_runtime_filter(spark, SF).head()
    assert row.no_false_negatives  # the defining bloom invariant
    assert row.n_pass >= row.n_true
    assert row.n_false_pos == row.n_pass - row.n_true
    # 8192 bits / ~150 keys * 3 hashes -> fpr well under 5%
    non_members = row.n_probe - row.n_true
    assert row.n_false_pos <= 0.05 * non_members


def test_bigram_scores_are_valid_logprobs(spark):
    rows = q_bigram_logprob(spark, SF).collect()
    assert rows
    # mean log-probability is strictly negative; micro-int keeps ordering
    assert all(r.score_micro < 0 for r in rows)
    assert all(r.n_bigrams >= 1 for r in rows)


def test_quantile_gate_keeps_at_least_half_per_lang(spark):
    rows = q_quality_quantile_gate(spark, SF).collect()
    assert rows
    for r in rows:
        # >= median keeps at least half (ties can push above half)
        assert r.n_kept * 2 >= r.n_docs
        assert r.n_kept <= r.n_docs


def test_semdedup_threshold_is_the_fixture_sweet_spot():
    # pin the documented constant so a silent edit surfaces here
    assert _SD_TAU_MICRO == 350_000
