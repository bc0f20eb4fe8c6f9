"""Wave 87: frequent sequences, RAKE keywords, watermark-bounded dedup."""

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
    unbounded_nested_loop_joins,
)
from etl_poor_main_pipeline_spark.registry_ext86 import (
    _RAKE_MIN_OCC,
    _RAKE_STOPWORDS,
    _SEQ_TOPK,
    q_frequent_sequences_topk,
    q_rake_keyword_extract,
    q_streaming_dedup_within_watermark,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_frequent_sequences_ranked_and_well_formed(spark):
    rows = q_frequent_sequences_topk(spark, SF).collect()
    assert 0 < len(rows) <= _SEQ_TOPK
    supports = [r.n_users for r in rows]
    assert supports == sorted(supports, reverse=True)
    types = {"click", "error", "purchase", "signup", "view"}
    for r in rows:
        a, b, c = r.pattern.split(" > ")
        assert {a, b, c} <= types
        assert r.n_occurrences >= r.n_users > 0


def test_rake_phrases_have_no_stopwords(spark):
    rows = q_rake_keyword_extract(spark, SF).collect()
    assert rows
    stop = set(_RAKE_STOPWORDS.split("|"))
    scores = [r.score_micro for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        words = r.phrase.split(" ")
        assert len(words) == r.n_words >= 2
        assert not (set(words) & stop), r.phrase
        assert r.n_occurrences >= _RAKE_MIN_OCC
        # a phrase's per-occurrence score is >= 1.0 per word (deg >= freq
        # is false in general, but deg >= its own phrase length share
        # keeps scores positive)
        assert r.score_micro > 0


def test_streaming_dedup_wm_equals_batch_distinct(spark):
    got = {
        (r.user_id, r.event_type)
        for r in q_streaming_dedup_within_watermark(spark, SF).collect()
    }
    want = {
        (r.user_id, r.event_type)
        for r in load_table(spark, SF, "events").select("user_id", "event_type").distinct().collect()
    }
    assert got == want


def test_wave87_batch_plans_are_scale_safe(spark):
    for fn in (q_frequent_sequences_topk, q_rake_keyword_extract):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
        assert not unbounded_nested_loop_joins(df)
