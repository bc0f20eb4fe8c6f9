"""Wave 28: Markov transitions, term drift, BPE merge candidates."""

from etl_poor_main_pipeline_spark.registry_ext27 import (
    _BPE_TOP,
    _DRIFT_TOP,
    q_bpe_merge_candidates,
    q_markov_transitions,
    q_term_drift_chi2,
)

SF = "/root/testdata/sf0.001"


def test_markov_rows_normalize_to_one(spark):
    rows = q_markov_transitions(spark, SF).collect()
    assert rows
    by_src = {}
    for r in rows:
        by_src.setdefault(r.src, []).append(r)
    for src, rs in by_src.items():
        total_p = sum(r.p_micro for r in rs)
        # floor-rounded micro probabilities sum to ~1 per source state
        assert abs(total_p - 1_000_000) <= len(rs)
        assert all(r.n_transitions > 0 for r in rs)


def test_drift_is_ranked_and_counts_positive(spark):
    rows = q_term_drift_chi2(spark, SF).collect()
    assert len(rows) == _DRIFT_TOP
    scores = [r.chi2_micro for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r.n_half_a + r.n_half_b > 0 for r in rows)


def test_bpe_candidates_are_bigrams_by_frequency(spark):
    rows = q_bpe_merge_candidates(spark, SF).collect()
    assert len(rows) == _BPE_TOP
    assert all(len(r.pair) == 2 for r in rows)
    counts = [r.n for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert counts[0] > 100  # word-salad corpus has heavy repeated bigrams
