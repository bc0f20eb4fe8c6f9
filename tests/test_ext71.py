"""Wave 72: rolling OLS slope, Kendall tau-b, CUPED variance reduction."""

import math

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
)
from etl_poor_main_pipeline_spark.registry_ext71 import (
    _OLS_WIN,
    q_cuped_adjustment,
    q_kendall_tau_rankings,
    q_rolling_ols_slope,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_rolling_ols_matches_numpy_on_one_window(spark):
    rows = q_rolling_ols_slope(spark, SF).collect()
    assert rows
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    # pick the last (fullest) window of the first type and re-fit directly
    et, series = sorted(by_type.items())[0]
    series = sorted(series, key=lambda r: r.day_idx)
    assert all(2 <= r.n_win <= _OLS_WIN for r in series)
    daily = {}
    for e in (
        load_table(spark, SF, "events")
        .selectExpr(
            "event_type",
            "cast(datediff(cast(ts as date), DATE'1970-01-01') as bigint) as x",
            "cast(floor(1e6 * value + 0.5) as bigint) as vm",
        )
        .where(f"event_type = '{et}'")
        .collect()
    ):
        daily[e.x] = daily.get(e.x, 0) + e.vm
    days = sorted(daily)
    last = series[-1]
    xs = [x for x in days if x <= last.day_idx][-_OLS_WIN:]
    ys = [daily[x] for x in xs]
    n = len(xs)
    assert n == last.n_win
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert last.slope_micro == math.floor(slope + 0.5)


def test_kendall_tau_counts_are_consistent(spark):
    rows = q_kendall_tau_rankings(spark, SF).collect()
    assert rows
    for r in rows:
        # every pair is concordant, discordant, or tied on >=1 axis
        tied_any = r.ties_x + r.ties_y - r.ties_xy
        assert r.concordant + r.discordant + tied_any == r.n_pairs
        assert -1_000_000 <= r.tau_b_micro <= 1_000_000
        # documents ranked longer-chars <-> more-tokens: strong agreement
        assert r.tau_b_micro > 0


def test_cuped_reduces_variance_when_correlated(spark):
    row = q_cuped_adjustment(spark, SF).collect()[0]
    assert row.n > 0
    assert 0 <= row.var_reduction_micro <= 1_000_000
    assert row.var_adj_unit <= row.var_y_unit
    # definitionally: reduction == rho^2 >= 0, and adjusted var formula holds
    assert row.var_adj_unit >= 0


def test_wave72_plans_are_scale_safe(spark):
    for fn in (q_rolling_ols_slope, q_kendall_tau_rankings, q_cuped_adjustment):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
