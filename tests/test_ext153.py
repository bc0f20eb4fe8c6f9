"""Wave 153: influence/outlier completers pinned against direct Python
implementations — Rosner (1983) generalized ESD, Cook (1977) distance
with hat leverage, delete-1 jackknife slope SE, and Tukey median
polish with the lower-median convention."""

import math
from collections import Counter, defaultdict

from etl_poor_main_pipeline_spark.registry_ext153 import (
    _ESD_ROUNDS,
    q_cooks_distance_trend,
    q_generalized_esd_outliers,
    q_jackknife_slope_se,
    q_median_polish_2way,
)

SF = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000


def _events(spark):
    from etl_poor_main_pipeline_spark.registry import _t

    return (
        _t(spark, SF, "events")
        .selectExpr("unix_micros(ts) AS t_us", "value", "event_type",
                    "cast((dayofweek(ts) + 5) % 7 as bigint) AS dow0")
        .collect()
    )


def test_generalized_esd_matches_reference(spark):
    rows = _events(spark)
    cells = Counter(math.floor(r.value * 100.0 + 0.5) for r in rows)
    expect = []
    for i in range(1, _ESD_ROUNDS + 1):
        n = sum(cells.values())
        s1 = sum(w * v for v, w in cells.items())
        s2 = sum(w * v * v for v, w in cells.items())
        mean = s1 / n
        sd = math.sqrt((s2 - s1 * mean) / (n - 1))
        best = max(
            ((abs(v - mean), -v) for v in cells),
        )
        vc_out = -best[1]
        expect.append(
            (i, n, vc_out, math.floor(1e3 * best[0] / sd + 0.5))
        )
        cells[vc_out] -= 1
        if cells[vc_out] == 0:
            del cells[vc_out]
    got = [
        (r.round_i, r.n_remaining, r.vc_removed, r.r_milli)
        for r in q_generalized_esd_outliers(spark, SF).collect()
    ]
    assert got == expect


def _daily(rows):
    acc = defaultdict(int)
    for r in rows:
        acc[r.t_us // DAY_US] += math.floor(r.value * 1e6 + 0.5)
    return {d: math.floor(vm / 1e3 + 0.5) for d, vm in acc.items()}


def test_cooks_distance_matches_reference(spark):
    daily = _daily(_events(spark))
    ds = sorted(daily)
    n, d0 = len(ds), min(ds)
    sd_ = sum(ds)
    sdd = sum(d * d for d in ds)
    sy = sum(daily[d] for d in ds)
    sdy = sum(d * daily[d] for d in ds)
    syy = sum(daily[d] ** 2 for d in ds)
    cxx = n * sdd - sd_ * sd_
    cxy = n * sdy - sd_ * sy
    cyy = n * syy - sy * sy
    b = cxy / cxx
    am = math.floor((sy - b * sd_) / n + 0.5)
    bm = math.floor(b + 0.5)
    sse = (cyy - cxy * cxy / cxx) / n
    mse = sse / (n - 2)
    sxx_c = sdd - sd_ * sd_ / n
    rows_out = []
    for d in ds:
        h = 1.0 / n + (d - sd_ / n) ** 2 / sxx_c
        e = daily[d] - am - bm * d
        dc = (e * e) * h / (2.0 * mse * (1.0 - h) ** 2)
        rows_out.append(
            (
                d - d0,
                math.floor(e + 0.5),
                math.floor(1e6 * h + 0.5),
                math.floor(1e3 * dc + 0.5),
            )
        )
    rows_out.sort(key=lambda r: (-r[3], r[0]))
    expect = rows_out[:5]
    got = [
        (r.day_t, r.e_milli, r.h_micro, r.cooks_d_milli)
        for r in q_cooks_distance_trend(spark, SF).collect()
    ]
    assert sorted(got) == sorted(expect)


def test_jackknife_matches_reference(spark):
    daily = _daily(_events(spark))
    ds = sorted(daily)
    n = len(ds)
    sd_ = sum(ds)
    sdd = sum(d * d for d in ds)
    sy = sum(daily[d] for d in ds)
    sdy = sum(d * daily[d] for d in ds)
    b_full = (n * sdy - sd_ * sy) / (n * sdd - sd_ * sd_)
    bims = []
    for d in ds:
        np_ = n - 1.0
        sx = sd_ - d
        sxx = sdd - d * d
        syl = sy - daily[d]
        sxy = sdy - d * daily[d]
        bi = (np_ * sxy - sx * syl) / (np_ * sxx - sx * sx)
        bims.append(math.floor(1e6 * bi + 0.5))
    sb = sum(bims)
    sbb = sum(b * b for b in bims)
    var = (n - 1) / n * (sbb - sb * sb / n) / 1e12
    out = q_jackknife_slope_se(spark, SF).collect()[0]
    assert out.n_days == n
    assert out.b_full_micro == math.floor(1e6 * b_full + 0.5)
    assert out.b_jack_mean_micro == math.floor(sb / n + 0.5)
    assert out.se_jack_micro == math.floor(1e6 * math.sqrt(var) + 0.5)


def _lower_median(vals):
    s = sorted(vals)
    return s[(len(s) + 1) // 2 - 1]


def test_median_polish_matches_reference(spark):
    rows = _events(spark)
    acc = defaultdict(lambda: [0, 0])
    for r in rows:
        c = acc[(r.event_type, r.dow0)]
        c[0] += math.floor(r.value * 1e6 + 0.5)
        c[1] += 1
    y = {k: math.floor(s / c + 0.5) for k, (s, c) in acc.items()}
    types = sorted({t for t, _ in y})
    dows = sorted({d for _, d in y})
    res = dict(y)
    re_ = {t: 0 for t in types}
    ce = {d: 0 for d in dows}
    g = 0
    for _ in range(2):
        for t in types:
            m = _lower_median([res[(t, d)] for d in dows if (t, d) in res])
            for d in dows:
                if (t, d) in res:
                    res[(t, d)] -= m
            re_[t] += m
        gm = _lower_median(list(re_.values()))
        for t in types:
            re_[t] -= gm
        g += gm
        for d in dows:
            m = _lower_median([res[(t, d)] for t in types if (t, d) in res])
            for t in types:
                if (t, d) in res:
                    res[(t, d)] -= m
            ce[d] += m
        gm = _lower_median(list(ce.values()))
        for d in dows:
            ce[d] -= gm
        g += gm
    out = {
        (r.event_type, r.dow0): r
        for r in q_median_polish_2way(spark, SF).collect()
    }
    assert set(out) == set(y)
    for k in y:
        r = out[k]
        t, d = k
        assert r.y_micro == y[k]
        assert r.row_eff_micro == re_[t], (k, r.row_eff_micro, re_[t])
        assert r.col_eff_micro == ce[d]
        assert r.grand_micro == g
        assert r.residual_micro == res[k]
        # decomposition identity: y = grand + row + col + residual
        assert r.y_micro == r.grand_micro + r.row_eff_micro + r.col_eff_micro + r.residual_micro
