"""Mechanized guard against the round-3 defect class: an unpartitioned
Window ('WindowExec: No Partition Defined') serializes the whole input
through ONE task — correct at sf0.1, catastrophic at 100 TB. Every batch
registry query must plan without one; a new wave cannot reintroduce the
defect unnoticed.

Sanctioned exceptions (each docstring cross-references its scale-safe
variant):
  * window_ntile / window_distribution — the literal SQL semantics being
    demonstrated IS a total-order NTILE/CUME_DIST; the scale-safe
    equivalent is equi_depth_histogram's two-phase rank.
  * training_pack_greedy — global-order spec twin, kept oracle-pinned;
    training_pack_sharded is the scale default.
  * group_sequential_obf — cumulative interim looks over the DAILY
    aggregate frame: the window input is calendar-bounded (one row per
    experiment day, ~365-3650 rows at any corpus size), so the single
    task processes a constant-size frame — the bounded-frame category,
    not a corpus scan. (Catalyst folds the constant partition key, so
    the plan prints as unpartitioned.)
  * propensity_match_att — the nearest-control prefix scans run over the
    LITERAL 1001-row propensity-bucket spine (spark.range(0, 1001)),
    constant at any corpus size; the corpus itself is only aggregated.
  * regression_discontinuity — the rank-exact cutoff CDF runs over the
    per-n_chars bin frame, bounded by the document-length DOMAIN (a few
    thousand rows), not the corpus (same category as pinball_loss_eval's
    per-type value bins, which carry a real partition key).
  * ams_f2_sketch — the median-of-groups window runs over the sketch's
    GROUP SUMS (one row per AMS group, a fixed sketch parameter), after
    the corpus is reduced map-side into the sketch.
  * rank_biased_overlap — row_number runs over the two LIMIT-d ranked
    lists (_RBO_D rows each, a query constant), not the corpus.
  * nelson_aalen_hazard — the cumulative-hazard window runs over the DAY
    spine (one row per calendar day, calendar-bounded at any corpus size).
  * successive_halving_bandit — per-round ranking runs over the surviving
    ARM list (enum-bounded event sources, halved each round).
  * pr_auc_average_precision — the precision-prefix window runs over
    DISTINCT centi-score value cells (≤10k rows by score domain), after a
    groupBy reduces the corpus to per-cell counts.
  * kruskal_wallis_rank_test — midrank assignment runs over DISTINCT
    value cells (score-domain-bounded), post-reduce.
  * periodogram_fixed_periods — the spectral sums run over the HOURLY
    spine and a fixed candidate-period grid (both calendar/constant
    bounded).
  * pettitt_changepoint — the Mann-Whitney U prefix window runs over the
    HOURLY aggregate spine (calendar-bounded).
  * variance_ratio_random_walk — lag/rolling windows run over the HOURLY
    aggregate spine (calendar-bounded).

Streaming queries are exercised (and drained) in their own tests; building
them here would re-run whole pipelines, so they are skipped by prefix.
"""

from __future__ import annotations

from etl_poor_main_pipeline_spark import registry
from etl_poor_main_pipeline_spark.plans.explain import global_window_nodes

SF = "/root/testdata/sf0.001"

ALLOWED_GLOBAL = {
    "window_ntile",
    "window_distribution",
    "training_pack_greedy",
    "group_sequential_obf",
    "propensity_match_att",
    "regression_discontinuity",
    # Waves 101-110 bounded-frame adjudications (see module docstring):
    "ams_f2_sketch",
    # greedy_max_coverage was sanctioned here through round 9; its r10
    # rewrite computes the K-step running sum driver-side (each round's
    # 1-row winner is collected under LIMIT 1), so no window remains.
    "rank_biased_overlap",
    "nelson_aalen_hazard",
    "successive_halving_bandit",
    "pr_auc_average_precision",
    "kruskal_wallis_rank_test",
    "periodogram_fixed_periods",
    "pettitt_changepoint",
    "variance_ratio_random_walk",
    # Wave 111: prefix-ECDF walk over centi VALUE CELLS (domain-bounded,
    # same category as pr_auc_average_precision)
    "cramer_von_mises_2samp",
    # Wave 115: cumulative walk over (n_chars) VALUE CELLS (domain-bounded)
    "palma_ratio_lengths",
    # Wave 115: cumulative/lag windows over the calendar-bounded hourly
    # spine (same category as pettitt_changepoint)
    "page_hinkley_drift",
    "dickey_fuller_unit_root",
    # Wave 116: lag window over the hourly spine / prefix walks over
    # centi VALUE CELLS (both domain-bounded, sanctioned categories)
    "granger_causality_hourly",
    "kuiper_two_sample",
    "mood_median_test",
    # Wave 117: variance-weighted prefix walk over centi VALUE CELLS
    "anderson_darling_2samp",
    # Wave 118: risk-set suffix walk over duration-DAY cells (calendar-
    # bounded, same category as pettitt_changepoint) / pairwise-distance
    # prefix walk over centi VALUE CELLS (same category as
    # cramer_von_mises_2samp)
    "log_rank_survival",
    "energy_distance_2samp",
    # Wave 120: midrank/dominance prefix walks over centi VALUE CELLS
    # (same category as cramer_von_mises_2samp)
    "brunner_munzel_test",
    "cliffs_delta_effect",
    # Wave 121: order-statistic CDF / midrank prefix walks over centi
    # VALUE CELLS (same category)
    "pot_mean_excess",
    "cucconi_test",
    # Wave 122: midrank/score prefix walks over centi VALUE CELLS (same
    # category); hodges_lehmann walks the value-domain-bounded DECI
    # difference-cell frame (cells x cells, constant at any corpus size)
    "wilcoxon_signed_rank",
    "ansari_bradley_test",
    "jonckheere_terpstra_trend",
    "hodges_lehmann_shift",
    # Wave 124: lag/prefix/rank windows over the calendar-bounded DAILY
    # spine (same category as pettitt_changepoint/dickey_fuller); bartels
    # additionally walks the value-cell frame (CvM category)
    "kpss_stationarity",
    "engle_granger_coint",
    "permutation_entropy_daily",
    "turning_point_test",
    "cox_stuart_trend",
    "bartels_rank_vonneumann",
    # Wave 126: decile cuts off the score-cell CDF — scores snapped to
    # whole value units, so the walked frame is bounded by the per-user
    # activity envelope (value-cell category), not user cardinality
    "decile_lift_table",
    # Wave 127: the n_t-weighted log-rank's suffix walk over
    # calendar-bounded duration-day cells (same sanctioned cell-walk
    # category as log_rank_survival)
    "gehan_breslow_wilcoxon",
    # Wave 128: Lorenz prefix / top-share suffix walks over DECI-UNIT
    # per-user total cells — bounded by the per-user activity envelope
    # (the decile_lift_table sanction category), not user cardinality
    "lorenz_curve_deciles",
    "top_share_percentiles",
    # Wave 130: risk-set suffix walks + KM ln-prefix walks over the
    # calendar-bounded duration-day spine (the log_rank_survival
    # sanction category); rmst partitions its walks by cohort.
    # cox_ph_newton_1cov shares the same walk but localCheckpoints the
    # ~60-row day-cell frame before its Newton loop, so the returned
    # plan shows LogicalRDD instead of the Window — no sanction entry
    # (the staleness check below would flag one as stale).
    "aalen_johansen_cif",
    "schoenfeld_ph_check",
    # Wave 133: lag/lead windows over the calendar-bounded DAILY spine
    # (same category as pettitt_changepoint/dickey_fuller).
    # sample_entropy_daily shares the category but localCheckpoints its
    # template frame before the pair join, so the returned plan shows
    # LogicalRDD instead of the Window — no sanction entry (the
    # staleness check below would flag one as stale, as it did for
    # cox_ph_newton_1cov).
    "diebold_mariano",
    "theil_u2_forecast",
    # Wave 134: midrank prefix walk over CENTI deviation cells (CvM
    # category) and the decile cut off the MILLI score-cell CDF
    # (decile_lift_table category — score domain <= 1001 cells by
    # construction)
    "conover_squared_ranks",
    "hosmer_lemeshow_gof",
    # Wave 136: median/MAD/quartile CDF walks over CENTI/UNIT value
    # cells and the rank-select walks over pair-difference / kernel
    # cells — all value-domain-bounded (CvM / hodges_lehmann categories).
    # (huber_m_location / tukey_biweight_location left the list in round
    # 14: their walks now run as sorted-array lambdas over the bounded
    # cell frame — no Window in the plan at all.)
    "qn_scale_estimator",
    "medcouple_skewness",
    # Wave 140: HAC lag windows over the calendar-bounded DAILY spine
    # (the pettitt/dickey_fuller category)
    "trend_ols_newey_west",
    # Wave 138: the final rank runs over the <= 5-row event-type ENUM
    # score frame (the successive_halving_bandit category)
    "katz_centrality_types",
    # Wave 139: the hockey-stick rank-sum walk runs over CENTI value
    # cells (CvM category); huber/biweight/expectile/weibull checkpoint
    # their cell frames, so only lmoments keeps a visible Window
    "lmoments_profile",
    # Wave 143: Western Electric lag windows over the checkpointed
    # calendar-bounded DAILY spine (the pettitt/dickey_fuller category)
    "western_electric_rules",
    # Wave 144: risk-set suffix walks / survival ln-prefix walks over
    # calendar-bounded duration-day or week cells (the
    # log_rank_survival sanction category); the walked frames are
    # localCheckpointed but the walks themselves sit above the
    # checkpoint and stay visible
    "tarone_ware_test",
    "peto_peto_test",
    "actuarial_life_table",
    "km_greenwood_ci",
    # Wave 151: AR(2) lag window over the checkpointed calendar-bounded
    # DAILY spine (the pettitt/dickey_fuller category)
    "ar2_yule_walker_forecast",
    # Wave 156: cumulative + row_number walks over the checkpointed
    # calendar-bounded DAILY spine (the pettitt/dickey_fuller category)
    "buishand_range_test",
    "snht_homogeneity",
    # Wave 160: risk-set suffix walk over calendar-bounded duration-day
    # cells (the log_rank_survival sanction category)
    "harrell_c_index",
    # Wave 137's curriculum_pacing_plan cuts deciles off the
    # token-count cell CDF (document-length-DOMAIN bounded) but
    # localCheckpoints the decile frame before the phase cross, so the
    # returned plan shows LogicalRDD instead of the Window — no sanction
    # entry (the staleness check below flags one as stale, as with
    # cox_ph_newton_1cov / sample_entropy_daily).
}

STREAM_PREFIXES = ("streaming_", "stream_")


def test_no_global_window_across_registry(spark):
    from _sweep import sweep

    qs = registry.queries()
    items = [
        (name, fn)
        for name, fn in qs.items()
        if not name.startswith(STREAM_PREFIXES) and name not in ALLOWED_GLOBAL
    ]
    offenders, build_errors = sweep(
        items, lambda name, fn: global_window_nodes(fn(spark, SF))
    )
    assert not build_errors, f"queries failed to build: {build_errors}"
    assert not offenders, (
        "unpartitioned Window planned by: "
        + "; ".join(f"{n}: {a[0][:200]}" for n, a in offenders.items())
    )


def test_sanctioned_globals_still_global(spark):
    """The allowed list must stay honest: if a sanctioned query stops
    planning a global window (someone made it scale-safe), drop it from
    ALLOWED_GLOBAL rather than leaving a stale exception."""
    qs = registry.queries()
    for name in ALLOWED_GLOBAL:
        assert global_window_nodes(qs[name](spark, SF)), (
            f"{name} no longer plans a global window; remove it from "
            "ALLOWED_GLOBAL"
        )
