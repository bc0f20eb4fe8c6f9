"""Wave 149: distribution-fit completers pinned against direct Python
implementations — lognormal closed-form MLE with fitted quantiles,
beta method of moments, zero-inflated Poisson MoM with the exact
user×day zero mass, and the D'Agostino-Belanger-D'Agostino (1990) K²
omnibus (Johnson SU skewness z, Anscombe-Glynn kurtosis z)."""

import math
from collections import Counter, defaultdict

from etl_poor_main_pipeline_spark.registry_ext149 import (
    _CHI2_95,
    _Z90,
    q_beta_mom_discount,
    q_dagostino_k2_normality,
    q_lognormal_fit_quantiles,
    q_zip_mom_fit,
)

SF = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000


def _events(spark):
    from etl_poor_main_pipeline_spark.registry import _t

    return (
        _t(spark, SF, "events")
        .selectExpr("user_id", "unix_micros(ts) AS t_us", "value",
                    "event_type")
        .collect()
    )


def test_lognormal_matches_reference(spark):
    rows = _events(spark)
    cells = Counter(
        math.floor(r.value * 100.0 + 0.5) for r in rows
    )
    cells.pop(0, None)
    n = sum(cells.values())
    slm = sum(
        w * math.floor(1e6 * math.log(vc / 100.0) + 0.5)
        for vc, w in cells.items()
    )
    slm2 = sum(
        w * math.floor(1e6 * math.log(vc / 100.0) + 0.5) ** 2
        for vc, w in cells.items()
    )
    mu = slm / n / 1e6
    sig = math.sqrt((slm2 / n - (slm / n) ** 2) / 1e12)
    out = q_lognormal_fit_quantiles(spark, SF).collect()[0]
    assert out.n == n
    assert out.mu_micro == math.floor(1e6 * mu + 0.5)
    assert out.sigma_micro == math.floor(1e6 * sig + 0.5)
    assert out.median_micro == math.floor(1e6 * math.exp(mu) + 0.5)
    assert out.p90_micro == math.floor(
        1e6 * math.exp(mu + _Z90 * sig) + 0.5
    )


def test_beta_mom_matches_reference(spark):
    from etl_poor_main_pipeline_spark.registry import _t

    rows = _t(spark, SF, "lineitem").selectExpr("l_discount").collect()
    xs = [math.floor(r.l_discount * 1000.0 + 0.5) for r in rows]
    n = len(xs)
    sx = sum(xs)
    sxx = sum(x * x for x in xs)
    mean = sx / n / 1e3
    var = (sxx - sx * sx / n) / (n - 1) / 1e6
    t = mean * (1.0 - mean) / var - 1.0
    out = q_beta_mom_discount(spark, SF).collect()[0]
    assert out.n == n
    assert out.mean_milli == math.floor(1e3 * mean + 0.5)
    assert out.var_micro == math.floor(1e6 * var + 0.5)
    assert out.alpha_milli == math.floor(1e3 * mean * t + 0.5)
    assert out.beta_milli == math.floor(1e3 * (1.0 - mean) * t + 0.5)


def test_zip_mom_matches_reference(spark):
    rows = _events(spark)
    users = {r.user_id for r in rows}
    days = {r.t_us // DAY_US for r in rows}
    nz = defaultdict(int)
    for r in rows:
        if r.event_type == "purchase":
            nz[(r.user_id, r.t_us // DAY_US)] += 1
    n_cells = len(users) * len(days)
    s1 = sum(nz.values())
    s2 = sum(c * c for c in nz.values())
    m1 = s1 / n_cells
    m2 = s2 / n_cells
    lam = m2 / m1 - 1.0
    pi = 1.0 - m1 / lam
    out = q_zip_mom_fit(spark, SF).collect()[0]
    assert (out.n_cells, out.n_nonzero) == (n_cells, len(nz))
    assert out.lambda_milli == math.floor(1e3 * lam + 0.5)
    assert out.pi_milli == math.floor(1e3 * pi + 0.5)


def test_dagostino_k2_matches_reference(spark):
    rows = _events(spark)
    cells = Counter(math.floor(r.value * 100.0 + 0.5) for r in rows)
    n = sum(cells.values())
    s1 = sum(w * v for v, w in cells.items())
    s2 = sum(w * v * v for v, w in cells.items())
    s3 = sum(w * v**3 for v, w in cells.items())
    s4 = sum(w * v**4 for v, w in cells.items())
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3.0 * mu * (s2 / n) + 2.0 * mu**3
    m4 = s4 / n - 4.0 * mu * (s3 / n) + 6.0 * mu * mu * (s2 / n) - 3.0 * mu**4
    g1 = m3 / (m2 * math.sqrt(m2))
    g2 = m4 / (m2 * m2)
    y = g1 * math.sqrt((n + 1.0) * (n + 3.0) / (6.0 * (n - 2.0)))
    b2 = (
        3.0 * (n * n + 27.0 * n - 70.0) * (n + 1.0) * (n + 3.0)
        / ((n - 2.0) * (n + 5.0) * (n + 7.0) * (n + 9.0))
    )
    w2 = -1.0 + math.sqrt(2.0 * (b2 - 1.0))
    lnw = math.floor(1e9 * (0.5 * math.log(w2)) + 0.5)
    alpha = math.sqrt(2.0 / (w2 - 1.0))
    lnz = math.floor(
        1e9 * math.log(y / alpha + math.sqrt((y / alpha) ** 2 + 1.0))
        + 0.5
    )
    z1 = (1.0 / math.sqrt(lnw / 1e9)) * (lnz / 1e9)
    eb2 = 3.0 * (n - 1.0) / (n + 1.0)
    vb2 = (
        24.0 * n * (n - 2.0) * (n - 3.0)
        / ((n + 1.0) ** 2 * (n + 3.0) * (n + 5.0))
    )
    x = (g2 - eb2) / math.sqrt(vb2)
    sb1 = (
        6.0 * (n * n - 5.0 * n + 2.0) / ((n + 7.0) * (n + 9.0))
    ) * math.sqrt(
        6.0 * (n + 3.0) * (n + 5.0) / (n * (n - 2.0) * (n - 3.0))
    )
    a = 6.0 + 8.0 / sb1 * (
        2.0 / sb1 + math.sqrt(1.0 + 4.0 / (sb1 * sb1))
    )
    cb_arg = (1.0 - 2.0 / a) / (
        1.0 + x * math.sqrt(2.0 / (a - 4.0))
    )
    cbr = math.floor(1e9 * math.copysign(abs(cb_arg) ** (1 / 3), cb_arg) + 0.5)
    z2 = (1.0 - 2.0 / (9.0 * a) - cbr / 1e9) / math.sqrt(
        2.0 / (9.0 * a)
    )
    k2 = z1 * z1 + z2 * z2
    out = q_dagostino_k2_normality(spark, SF).collect()[0]
    assert out.n == n
    assert out.z_skew_milli == math.floor(1e3 * z1 + 0.5)
    assert out.z_kurt_milli == math.floor(1e3 * z2 + 0.5)
    assert out.k2_milli == math.floor(1e3 * k2 + 0.5)
    assert out.reject_05 == (k2 > _CHI2_95)
