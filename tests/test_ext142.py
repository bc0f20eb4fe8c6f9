"""Wave 142: OLS misspecification diagnostics pinned against direct
Python implementations — White (1980) LM with the h/h² auxiliary,
Goldfeld-Quandt (1965) subsample variance F, Chow (1960) midpoint break
F, and Ramsey (1969) RESET with the squared fitted value."""

import math
from collections import defaultdict

from etl_poor_main_pipeline_spark.registry_ext142 import (
    _GQ_HI_MIN,
    _GQ_LO_MAX,
    q_chow_break_daily,
    q_goldfeld_quandt_variance,
    q_ramsey_reset_daily,
    q_white_lm_test,
)

SF = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000
HOUR_US = 3_600_000_000


def _events(spark):
    from etl_poor_main_pipeline_spark.registry import _t

    return (
        _t(spark, SF, "events")
        .selectExpr("unix_micros(ts) AS t_us", "value")
        .collect()
    )


def _daily(rows):
    acc = defaultdict(int)
    for r in rows:
        acc[r.t_us // DAY_US] += math.floor(r.value * 1e6 + 0.5)
    return {d: math.floor(vm / 1e3 + 0.5) for d, vm in acc.items()}


def _ols_sse(pts):
    """(n, b, a, sse) of y on x by exact centered moments in double."""
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sxx = sum(x * x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    syy = sum(y * y for _, y in pts)
    cxx = n * sxx - sx * sx
    cxy = n * sxy - sx * sy
    cyy = n * syy - sy * sy
    b = cxy / cxx
    a = (sy - b * sx) / n
    sse = (cyy - cxy * cxy / cxx) / n
    return n, b, a, sse


def test_white_lm_matches_reference(spark):
    rows = _events(spark)
    pts = [
        ((r.t_us // HOUR_US) % 24, math.floor(r.value * 1e6 + 0.5))
        for r in rows
    ]
    n, b, a, _ = _ols_sse(pts)
    am, bm = math.floor(a + 0.5), math.floor(b + 0.5)
    aux = [
        (h, h * h, math.floor((y - am - bm * h) ** 2 / 1e12 + 0.5))
        for h, y in pts
    ]
    s1 = sum(h for h, _, _ in aux)
    s2 = sum(h2 for _, h2, _ in aux)
    s12 = sum(h * h2 for h, h2, _ in aux)
    s22 = sum(h2 * h2 for _, h2, _ in aux)
    su = sum(u for _, _, u in aux)
    s1u = sum(h * u for h, _, u in aux)
    s2u = sum(h2 * u for _, h2, u in aux)
    suu = sum(u * u for _, _, u in aux)
    c11 = n * sum(h * h for h, _, _ in aux) - s1 * s1
    c22 = n * s22 - s2 * s2
    c12 = n * s12 - s1 * s2
    c1u = n * s1u - s1 * su
    c2u = n * s2u - s2 * su
    cuu = n * suu - su * su
    det = c11 * c22 - c12 * c12
    b1 = (c22 * c1u - c12 * c2u) / det
    b2 = (c11 * c2u - c12 * c1u) / det
    r2 = (b1 * c1u + b2 * c2u) / cuu
    out = q_white_lm_test(spark, SF).collect()[0]
    assert out.n == n and out.b_micro == bm
    assert out.white_milli == math.floor(1e3 * n * r2 + 0.5)
    assert out.reject_05 == (n * r2 > 5.991464547107979)


def test_goldfeld_quandt_matches_reference(spark):
    rows = _events(spark)
    lo, hi = [], []
    for r in rows:
        h = (r.t_us // HOUR_US) % 24
        y = math.floor(r.value * 1e3 + 0.5)
        if h <= _GQ_LO_MAX:
            lo.append((h, y))
        elif h >= _GQ_HI_MIN:
            hi.append((h, y))
    n_lo, _, _, sse_lo = _ols_sse(lo)
    n_hi, _, _, sse_hi = _ols_sse(hi)
    gq = (sse_hi / (n_hi - 2)) / (sse_lo / (n_lo - 2))
    out = q_goldfeld_quandt_variance(spark, SF).collect()[0]
    assert (out.n_lo, out.n_hi, out.df_lo, out.df_hi) == (
        n_lo, n_hi, n_lo - 2, n_hi - 2,
    )
    assert out.gq_milli == math.floor(1e3 * gq + 0.5)


def test_chow_matches_reference(spark):
    daily = _daily(_events(spark))
    d0, d1 = min(daily), max(daily)
    tb = (d1 - d0 + 1) // 2
    pts = [(d - d0, y) for d, y in daily.items()]
    seg1 = [(t, y) for t, y in pts if t < tb]
    seg2 = [(t, y) for t, y in pts if t >= tb]
    n, _, _, sse_p = _ols_sse(pts)
    _, _, _, sse_1 = _ols_sse(seg1)
    _, _, _, sse_2 = _ols_sse(seg2)
    chow = ((sse_p - sse_1 - sse_2) / 2.0) / ((sse_1 + sse_2) / (n - 4))
    out = q_chow_break_daily(spark, SF).collect()[0]
    assert (out.n_days, out.t_break) == (n, tb)
    assert out.chow_milli == math.floor(1e3 * chow + 0.5)


def test_ramsey_reset_matches_reference(spark):
    daily = _daily(_events(spark))
    d0 = min(daily)
    pts = [(d - d0, y) for d, y in daily.items()]
    n, b, a, sse_r_chk = _ols_sse(pts)
    am, bm = math.floor(a + 0.5), math.floor(b + 0.5)
    aug = [(t, ((am + bm * t) // 1000) ** 2, y) for t, y in pts]
    s1 = sum(t for t, _, _ in aug)
    s11 = sum(t * t for t, _, _ in aug)
    s2 = sum(z for _, z, _ in aug)
    s12 = sum(t * z for t, z, _ in aug)
    s22 = sum(z * z for _, z, _ in aug)
    su = sum(y for _, _, y in aug)
    s1u = sum(t * y for t, _, y in aug)
    s2u = sum(z * y for _, z, y in aug)
    suu = sum(y * y for _, _, y in aug)
    c11 = n * s11 - s1 * s1
    c22 = n * s22 - s2 * s2
    c12 = n * s12 - s1 * s2
    c1u = n * s1u - s1 * su
    c2u = n * s2u - s2 * su
    cuu = n * suu - su * su
    det = c11 * c22 - c12 * c12
    b1 = (c22 * c1u - c12 * c2u) / det
    b2 = (c11 * c2u - c12 * c1u) / det
    sse_u = (cuu - b1 * c1u - b2 * c2u) / n
    sse_r = (cuu - c1u * c1u / c11) / n
    reset = (sse_r - sse_u) / (sse_u / (n - 3))
    out = q_ramsey_reset_daily(spark, SF).collect()[0]
    assert (out.n_days, out.slope_milli) == (n, bm)
    assert out.reset_milli == math.floor(1e3 * reset + 0.5)
