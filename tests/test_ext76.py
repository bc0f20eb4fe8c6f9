"""Wave 77: Shapley attribution, blocking recall audit, changepoint."""

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
)
from etl_poor_main_pipeline_spark.registry_ext76 import (
    _SHAP_CHANNELS,
    q_blocking_recall_audit,
    q_changepoint_binseg,
    q_shapley_attribution,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_shapley_efficiency_axiom(spark):
    rows = q_shapley_attribution(spark, SF).collect()
    assert {r.channel for r in rows} == set(_SHAP_CHANNELS)
    v_full = rows[0].v_full
    # efficiency: shapley values sum to v(full) - v(empty)
    ev = load_table(spark, SF, "events").select("user_id", "event_type").collect()
    import collections

    touched = collections.defaultdict(set)
    purchased = set()
    for e in ev:
        if e.event_type == "purchase":
            purchased.add(e.user_id)
        elif e.event_type in _SHAP_CHANNELS:
            touched[e.user_id].add(e.event_type)
    v_empty = sum(1 for u in purchased if not touched[u])
    assert v_full == len(purchased)
    total_micro = sum(r.shapley_micro for r in rows)
    assert abs(total_micro - (v_full - v_empty) * 1_000_000) <= len(rows)  # floor slack


def test_blocking_recall_ordering(spark):
    rows = {r.scheme: r for r in q_blocking_recall_audit(spark, SF).collect()}
    assert set(rows) == {"lang", "band", "lang_band", "tok1"}
    for r in rows.values():
        assert 0 <= r.n_captured <= r.n_true
        assert r.n_captured <= r.n_candidates
        assert 0 <= r.recall_micro <= 1_000_000
    # intersection blocks capture no more than either component
    assert rows["lang_band"].n_captured <= rows["lang"].n_captured
    assert rows["lang_band"].n_captured <= rows["band"].n_captured
    assert rows["lang_band"].n_candidates <= min(
        rows["lang"].n_candidates, rows["band"].n_candidates
    )
    # monotonicity: adding a second predicate can only lower capture
    assert rows["lang_band"].recall_micro <= rows["lang"].recall_micro
    assert rows["lang_band"].recall_micro <= rows["band"].recall_micro
    # the audit's reason to exist: on this corpus lang is independent of
    # the template text, so lang-based blocking recall collapses (<50%)
    assert rows["lang"].recall_micro < 500_000


def test_changepoint_split_strictly_interior(spark):
    rows = q_changepoint_binseg(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.i <= r.n - 1  # split leaves both segments non-empty
        assert r.sse_tera >= 0


def test_wave77_plans_are_scale_safe(spark):
    for fn in (q_shapley_attribution, q_blocking_recall_audit, q_changepoint_binseg):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
