"""Mechanized guard against the round-4 defect class: a nested-loop pair
join (CartesianProduct / BroadcastNestedLoopJoin) whose inputs BOTH scale
with the corpus does O(N^2) work at 100 TB no matter how fast it runs at
sf0.1 (VERDICT.md round 4: proportional-sample quadratics — blocking
recall audit at 24.5s, knn vote, kendall tau). Every batch registry query
must plan every nested-loop join with at least one provably bounded side —
a LIMIT / TakeOrderedAndProject (the hash-rank fixed-count sample idiom),
a keyless aggregate, a literal table/spine — or appear on the sanctioned
list below with a reason the detector cannot see.

Sanctioned exceptions (all bounded by DOMAIN, not by plan shape — a
grouping aggregate over a value-bounded key, which no plan inspection can
distinguish from a grouping aggregate over an id):
  * join_cross — SQL-surface CROSS JOIN demo over the two O(25)-row dims.
  * range_join_band — the deliberate non-equi band-join demo; its own
    docstring states banding keys converts it to equi at scale.
  * ks_two_sample_drift — bins x event_type grid, both sides value-domain
    aggregates (value deciles, ~5 event types).
  * fanout_gini — Gini mean-absolute-difference over the order-fanout
    value histogram (fanout values, not orders).
  * contrastive_margin_stats / embedding_silhouette_margin — vectors x
    label-centroids, centroid side bounded by the label domain.
  * retrieval_eval_metrics — triangular rank over the BM25 top-15; the
    LIMIT is hidden behind a lazy localCheckpoint that feeds two sides.
  * uplift_qini_by_score — cumulative sums over score-bucket aggregates
    (bounded bucket domain).
  * kmv_set_ops — event-type pair grid: both sides grouping aggregates
    over the 5-value event_type enum, each further k-bounded (KMV k=64).

The scan_prefix triangular close (`_g_prev < _g`) is exempted inside the
detector itself — its totals frame is group_width (4096x) smaller than the
input by construction, the documented bounded-reduction idiom.

Streaming queries are exercised in their own tests (building them here
would re-run whole pipelines); skipped by prefix, same as the global
window guard.
"""

from __future__ import annotations

from etl_poor_main_pipeline_spark import registry
from etl_poor_main_pipeline_spark.plans.explain import unbounded_nested_loop_joins

SF = "/root/testdata/sf0.001"

ALLOWED_NESTED_LOOP = {
    "join_cross",
    "range_join_band",
    "ks_two_sample_drift",
    "fanout_gini",
    "contrastive_margin_stats",
    "embedding_silhouette_margin",
    # matryoshka_overlap left the list in round 8: its fixed-count query
    # set now carries an explicit limit() the detector can size.
    "retrieval_eval_metrics",
    "uplift_qini_by_score",
    "kmv_set_ops",
    # Wave 122: grouping aggregates over VALUE-DOMAIN-bounded keys feeding
    # a constant-size cross — deci value cells (<= ~5k rows at any corpus
    # size) for the Hodges-Lehmann pairwise-difference frame, and the 3x7
    # shift-x-weekday enum table crossed with itself for gamma's
    # concordance count.
    "hodges_lehmann_shift",
    "goodman_kruskal_gamma",
    # Wave 126: the 3x3 agreement table's row margins crossed with its
    # column margins (both grouping aggregates over the 3-value activity
    # BAND domain) for weighted kappa's expected-disagreement sum.
    "weighted_kappa_depth",
    # Wave 127: the 7-row weekday-block range frame crossed with itself
    # for Quade's block-weight midranks — 7x7 = 49 pairs, ENUM-bounded
    # at any corpus size.
    "quade_test",
    # Wave 133: the SampEn template frame (one row per day minus 2)
    # self-joined on d < d' — days^2 pairs, calendar-bounded at any
    # corpus size.
    "sample_entropy_daily",
    # Wave 134: joint (deca-value x hour) / unit-value cell frames
    # crossed with themselves for the V-statistic and kernel pair sums —
    # both value-domain-bounded (<= ~1.2k / ~500 cells at any corpus
    # size; the hodges_lehmann category).
    "distance_correlation",
    "mmd_rbf_2samp",
    # Wave 136: UNIT value cells triangularly self-joined for the Qn
    # pairwise-difference frame — value-domain-bounded (<= ~500 cells;
    # the hodges_lehmann category). medcouple_skewness shares the shape
    # but its kernel join carries the broadcast cuts frame, which the
    # detector sizes as a bounded side — no sanction entry needed (the
    # staleness check below flags one as stale).
    "qn_scale_estimator",
    # Wave 152: the (event_type x weekday) z-test family (35 cells,
    # ENUM-bounded at any corpus size) rank-joined on p-value order for
    # Holm's step-down cummax and the BY critical ranks — 35x35 pairs,
    # the fdr_bh/quade_test category; the frames sit behind a
    # localCheckpoint so the detector cannot size them.
    "holm_bonferroni_correction",
    "benjamini_yekutieli_fdr",
    # Wave 158: the observed x-level frame crossed with the observed
    # y-level frame to densify Hoeffding's joint grid — bounded by the
    # two VALUE DOMAINS (activity counts × centi means), CONSTANT in
    # the corpus; the hodges_lehmann/distance_correlation category
    # (the frames sit behind a localCheckpoint so the detector cannot
    # size them).
    "hoeffding_d",
    # (passing_bablok_regression left the list in round 14: its
    # calendar-day slope pair join — still days²/2 and calendar-bounded
    # — now sits UPSTREAM of the round-14 plan-split barriers, so the
    # detector no longer sees a nested-loop join at all and the
    # staleness check below demands the entry go.)
}

STREAM_PREFIXES = ("streaming_", "stream_")


def test_no_unbounded_nested_loop_join_across_registry(spark):
    from _sweep import sweep

    qs = registry.queries()
    items = [
        (name, fn)
        for name, fn in qs.items()
        if not name.startswith(STREAM_PREFIXES) and name not in ALLOWED_NESTED_LOOP
    ]
    offenders, build_errors = sweep(
        items, lambda name, fn: unbounded_nested_loop_joins(fn(spark, SF))
    )
    assert not build_errors, f"queries failed to build: {build_errors}"
    assert not offenders, (
        "nested-loop join with no bounded side (quadratic at scale) in: "
        + "; ".join(f"{n}: {'; '.join(a)[:200]}" for n, a in offenders.items())
    )


def test_sanctioned_nested_loops_still_nested(spark):
    """The allowed list must stay honest: if a sanctioned query stops
    planning an unbounded nested-loop join (someone bounded or keyed it),
    drop it from ALLOWED_NESTED_LOOP rather than leaving a stale
    exception."""
    qs = registry.queries()
    stale = [
        name
        for name in sorted(ALLOWED_NESTED_LOOP)
        if not unbounded_nested_loop_joins(qs[name](spark, SF))
    ]
    assert not stale, (
        f"no longer plan an unbounded nested-loop join: {stale}; remove "
        "them from ALLOWED_NESTED_LOOP"
    )
