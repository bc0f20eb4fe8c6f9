"""Wave 151: circular statistics and AR(2) pinned against direct
Python implementations — mean direction / resultant length (Fisher
§2.3), Rayleigh test with the Fisher §4.3 p approximation, the
Best-Fisher three-branch von Mises κ inversion, and AR(2) Yule-Walker
with chained two-step forecasts."""

import math
from collections import Counter, defaultdict
from decimal import Decimal

from etl_poor_main_pipeline_spark.registry_ext151 import (
    q_ar2_yule_walker_forecast,
    q_circular_mean_hour,
    q_rayleigh_uniformity_test,
    q_vonmises_concentration,
)

SF = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000
MIN_US = 60_000_000
TWO_PI = 2.0 * math.pi


def _events(spark):
    from etl_poor_main_pipeline_spark.registry import _t

    return (
        _t(spark, SF, "events")
        .selectExpr("unix_micros(ts) AS t_us", "value")
        .collect()
    )


def _resultant(rows):
    cells = Counter((r.t_us // MIN_US) % 1440 for r in rows)
    n = sum(cells.values())
    c = sum(
        w * math.floor(1e9 * math.cos(TWO_PI * m / 1440.0) + 0.5)
        for m, w in cells.items()
    )
    s = sum(
        w * math.floor(1e9 * math.sin(TWO_PI * m / 1440.0) + 0.5)
        for m, w in cells.items()
    )
    return n, c, s


def _rbar(n, c, s):
    return math.sqrt(float(c) * c + float(s) * s) / (n * 1e9)


def test_circular_mean_matches_reference(spark):
    n, c, s = _resultant(_events(spark))
    at = math.floor(1e9 * math.atan2(float(s), float(c)) + 0.5)
    minutes = ((at / 1e9) % TWO_PI) * 1440.0 / TWO_PI
    out = q_circular_mean_hour(spark, SF).collect()[0]
    assert out.n == n
    assert out.mean_minute_milli == math.floor(1e3 * minutes + 0.5)
    assert out.rbar_micro == math.floor(1e6 * _rbar(n, c, s) + 0.5)


def test_rayleigh_matches_reference(spark):
    n, c, s = _resultant(_events(spark))
    r = _rbar(n, c, s)
    z = n * r * r
    ex = math.floor(1e9 * math.exp(-z) + 0.5)
    p = min(max(ex / 1e9 * (1.0 + (2.0 * z - z * z) / (4.0 * n)), 0.0), 1.0)
    out = q_rayleigh_uniformity_test(spark, SF).collect()[0]
    assert out.n == n
    assert out.z_milli == math.floor(1e3 * z + 0.5)
    assert out.p_micro == math.floor(1e6 * p + 0.5)
    assert out.reject_05 == (p < 0.05)


def test_vonmises_matches_reference(spark):
    n, c, s = _resultant(_events(spark))
    r = _rbar(n, c, s)
    if r < 0.53:
        kappa, branch = 2.0 * r + r**3 + 5.0 * r**5 / 6.0, 1
    elif r < 0.85:
        kappa, branch = -0.4 + 1.39 * r + 0.43 / (1.0 - r), 2
    else:
        kappa, branch = 1.0 / (r**3 - 4.0 * r * r + 3.0 * r), 3
    out = q_vonmises_concentration(spark, SF).collect()[0]
    assert out.n == n
    assert out.rbar_micro == math.floor(1e6 * r + 0.5)
    assert out.kappa_milli == math.floor(1e3 * kappa + 0.5)
    assert out.branch == branch


def test_ar2_matches_reference(spark):
    rows = _events(spark)
    acc = defaultdict(lambda: [Decimal(0), 0])
    for r in rows:
        d = r.t_us // DAY_US
        acc[d][0] += Decimal(str(r.value)).quantize(Decimal("0.000001"))
        acc[d][1] += 1
    ys = [
        math.floor(1e6 * float(sv) / c + 0.5)
        for d, (sv, c) in sorted(acc.items())
    ]
    n = len(ys)
    sy = sum(ys)
    syy = sum(y * y for y in ys)
    mu = sy / n
    c0 = syy / n - mu * mu
    p1 = sum(ys[i] * ys[i - 1] for i in range(1, n))
    p2 = sum(ys[i] * ys[i - 2] for i in range(2, n))
    sl1a = sum(ys[:-1])
    sl1b = sum(ys[1:])
    sl2a = sum(ys[:-2])
    sl2b = sum(ys[2:])
    r1 = (p1 - mu * (sl1a + sl1b) + (n - 1.0) * mu * mu) / (n * c0)
    r2 = (p2 - mu * (sl2a + sl2b) + (n - 2.0) * mu * mu) / (n * c0)
    r1m = math.floor(1e6 * r1 + 0.5)
    r2m = math.floor(1e6 * r2 + 0.5)
    rr1, rr2 = r1m / 1e6, r2m / 1e6
    phi1 = rr1 * (1.0 - rr2) / (1.0 - rr1 * rr1)
    phi2 = (rr2 - rr1 * rr1) / (1.0 - rr1 * rr1)
    mu2 = sy / n / 1e6
    f1 = mu2 + phi1 * (ys[-1] / 1e6 - mu2) + phi2 * (ys[-2] / 1e6 - mu2)
    f2 = mu2 + phi1 * (f1 - mu2) + phi2 * (ys[-1] / 1e6 - mu2)
    out = q_ar2_yule_walker_forecast(spark, SF).collect()[0]
    assert out.n_days == n
    assert out.phi1_micro == math.floor(1e6 * phi1 + 0.5)
    assert out.phi2_micro == math.floor(1e6 * phi2 + 0.5)
    assert out.fc1_micro == math.floor(1e6 * f1 + 0.5)
    assert out.fc2_micro == math.floor(1e6 * f2 + 0.5)
