"""Wave 146: forecasting completers pinned against direct Python folds
— Holt-Winters additive (Winters 1960) with m=7 and dyadic smoothing,
the theta method (Assimakopoulos & Nikolopoulos 2000) as trend + SES
of the theta=2 line, Croston (1972) intermittent demand, and Trigg
(1964) tracking signal with the 0.51 action limit."""

import math
from collections import defaultdict

from etl_poor_main_pipeline_spark.registry_ext146 import (
    _TS_LIMIT,
    q_croston_intermittent,
    q_holt_winters_additive,
    q_theta_method_forecast,
    q_tracking_signal_trigg,
)

SF = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000


def _daily(spark):
    from decimal import Decimal

    from etl_poor_main_pipeline_spark.registry import _t

    rows = (
        _t(spark, SF, "events")
        .selectExpr("unix_micros(ts) AS t_us", "value", "event_type")
        .collect()
    )
    acc = defaultdict(lambda: [Decimal(0), 0])
    for r in rows:
        d = r.t_us // DAY_US
        acc[d][0] += Decimal(str(r.value)).quantize(Decimal("0.000001"))
        acc[d][1] += 1
    return {
        d: math.floor(1e6 * float(s) / c + 0.5) for d, (s, c) in acc.items()
    }, rows


def test_holt_winters_matches_reference(spark):
    daily, _ = _daily(spark)
    ys = [daily[d] for d in sorted(daily)]
    n = len(ys)
    l0 = sum(ys[:7]) / 7e6
    b0 = (ys[7] - ys[0]) / 7e6
    sv = [y / 1e6 - l0 for y in ys[:7]]
    lv, tr = l0, b0
    for y in ys[7:]:
        ln = 0.5 * (y / 1e6 - sv[0]) + 0.5 * (lv + tr)
        tr = 0.25 * (ln - lv) + 0.75 * tr
        sv = sv[1:] + [0.5 * (y / 1e6 - ln) + 0.5 * sv[0]]
        lv = ln
    out = q_holt_winters_additive(spark, SF).collect()[0]
    assert out.n_days == n
    assert out.level_micro == math.floor(1e6 * lv + 0.5)
    assert out.trend_micro == math.floor(1e6 * tr + 0.5)
    assert out.fc1_micro == math.floor(1e6 * (lv + tr + sv[0]) + 0.5)
    assert out.fc7_micro == math.floor(1e6 * (lv + 7.0 * tr + sv[6]) + 0.5)


def test_theta_matches_reference(spark):
    daily, _ = _daily(spark)
    ds = sorted(daily)
    n, d0, d1 = len(ds), min(ds), max(ds)
    sd = sum(ds)
    sdd = sum(d * d for d in ds)
    sy = sum(daily[d] for d in ds)
    sdy = sum(d * daily[d] for d in ds)
    cxx = n * sdd - sd * sd
    cxy = n * sdy - sd * sy
    b = cxy / cxx
    am = math.floor((sy - b * sd) / n + b * d0 + 0.5)
    bm = math.floor(b + 0.5)
    zs = [2 * daily[d] - (am + bm * (d - d0)) for d in ds]
    acc = zs[0] / 1e6
    for z in zs[1:]:
        acc = 0.5 * (z / 1e6) + 0.5 * acc
    out = q_theta_method_forecast(spark, SF).collect()[0]
    assert (out.n_days, out.slope_micro) == (n, bm)
    assert out.ses_micro == math.floor(1e6 * acc + 0.5)
    fc1 = 0.5 * ((am + bm * (d1 - d0 + 1)) / 1e6 + acc) * 1e6
    fc7 = 0.5 * ((am + bm * (d1 - d0 + 7)) / 1e6 + acc) * 1e6
    assert out.fc1_micro == math.floor(fc1 + 0.5)
    assert out.fc7_micro == math.floor(fc7 + 0.5)


def test_croston_matches_reference(spark):
    _, rows = _daily(spark)
    dem = defaultdict(int)
    for r in rows:
        if r.event_type == "purchase":
            dem[r.t_us // DAY_US] += 1
    ds = sorted(dem)
    z, p = float(dem[ds[0]]), 1.0
    for i in range(1, len(ds)):
        z = 0.125 * dem[ds[i]] + 0.875 * z
        p = 0.125 * (ds[i] - ds[i - 1]) + 0.875 * p
    out = q_croston_intermittent(spark, SF).collect()[0]
    assert out.n_demand_days == len(ds)
    assert out.z_milli == math.floor(1e3 * z + 0.5)
    assert out.p_milli == math.floor(1e3 * p + 0.5)
    assert out.fc_milli == math.floor(1e3 * z / p + 0.5)


def test_tracking_signal_matches_reference(spark):
    daily, _ = _daily(spark)
    ys = [daily[d] for d in sorted(daily)]
    e = m = 0.0
    al = 0
    for i in range(1, len(ys)):
        err = (ys[i] - ys[i - 1]) / 1e6
        e = 0.25 * err + 0.75 * e
        m = 0.25 * abs(err) + 0.75 * m
        if m > 0.0 and abs(e / m) > _TS_LIMIT:
            al += 1
    out = q_tracking_signal_trigg(spark, SF).collect()[0]
    assert out.n_days == len(ys)
    assert out.e_smooth_micro == math.floor(1e6 * e + 0.5)
    assert out.mad_micro == math.floor(1e6 * m + 0.5)
    assert out.ts_milli == math.floor(1e3 * e / m + 0.5)
    assert out.n_alarms == al
