"""Wave-162 literature pins: recompute Passing-Bablok (direct slope
enumeration with the K-offset), Alexander-Govern (scipy's published
formula), Chauvenet (exact inverse-normal via statistics.NormalDist),
Fisher's g (direct periodogram), and the Bhapkar identity from
collected rows with independent Python implementations."""

from __future__ import annotations

import math
from statistics import NormalDist

from etl_poor_main_pipeline_spark.registry_ext162 import (
    _DAY_US,
    _HALF_US,
    q_alexander_govern_test,
    q_bhapkar_test,
    q_chauvenet_criterion,
    q_fisher_g_periodicity,
    q_passing_bablok_regression,
)

SF = "/root/testdata/sf0.001"


def _daily_halves(spark):
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            f"unix_micros(ts) div {_DAY_US} as d",
            f"cast((unix_micros(ts) % {_DAY_US}) >= {_HALF_US} as int)"
            " as pm",
            "cast(floor(value * 100.0 + 0.5) as bigint) as vc",
        )
        .collect()
    )
    acc: dict[int, list[list[int]]] = {}
    for r in rows:
        acc.setdefault(r.d, [[], []])[r.pm].append(r.vc)
    out = {}
    for d, (am, pmv) in acc.items():
        if am and pmv:
            out[d] = (
                math.floor(sum(am) / len(am) + 0.5),
                math.floor(sum(pmv) / len(pmv) + 0.5),
            )
    return out


def test_passing_bablok_matches_direct(spark):
    daily = _daily_halves(spark)
    days = sorted(daily)
    slopes = []
    for i, di in enumerate(days):
        xi, yi = daily[di]
        for dj in days[i + 1:]:
            xj, yj = daily[dj]
            if xj == xi:
                continue
            s = math.floor(1e6 * (yj - yi) / (xj - xi) + 0.5)
            if s != -1_000_000:
                slopes.append(s)
    slopes.sort()
    n = len(slopes)
    k = sum(1 for s in slopes if s < -1_000_000)
    if n % 2 == 1:
        b_x2 = 2 * slopes[(n + 1) // 2 + k - 1]
    else:
        b_x2 = slopes[n // 2 + k - 1] + slopes[n // 2 + k]
    resid = sorted(2_000_000 * y - b_x2 * x for x, y in daily.values())
    m = len(resid)
    a2med = resid[(m + 1) // 2 - 1]  # lower median
    out = q_passing_bablok_regression(spark, SF).collect()[0]
    assert out.n_days == m
    assert out.n_slopes == n
    assert out.k_offset == k
    assert out.slope_micro_x2 == b_x2
    assert out.intercept_micro == math.floor(a2med / 200.0 + 0.5)


def _groups(spark):
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "event_type",
            "cast(floor(value * 1e6 + 0.5) as bigint) as vm",
        )
        .collect()
    )
    g: dict[str, list[int]] = {}
    for r in rows:
        g.setdefault(r.event_type, []).append(r.vm)
    return g


def test_alexander_govern_matches_direct(spark):
    """scipy.stats.alexandergovern's published formula (Hill 1970
    transformation), unsnapped — the snapped pipeline must agree to
    ~1e-3 on the chi-square-scale statistic."""
    g = _groups(spark)
    stats = {}
    for t, v in g.items():
        nj = len(v)
        mean = sum(v) / nj / 1e6
        var = (sum(x * x for x in v) / 1e12 - (sum(v) / 1e6) ** 2 / nj) / (
            nj - 1
        )
        stats[t] = (nj, mean, var / nj)  # se2
    siw = sum(1 / se2 for _, _, se2 in stats.values())
    grand = sum(m / se2 for _, m, se2 in stats.values()) / siw
    a_stat = 0.0
    for nj, m, se2 in stats.values():
        t = (m - grand) / math.sqrt(se2)
        df = nj - 1
        a = df - 0.5
        b = 48 * a * a
        c = math.sqrt(a * math.log(1 + t * t / df))
        z = (
            c
            + (c**3 + 3 * c) / b
            - (4 * c**7 + 33 * c**5 + 240 * c**3 + 855 * c)
            / (10 * b * b + 8 * b * c**4 + 1000 * b)
        )
        a_stat += z * z
    out = q_alexander_govern_test(spark, SF).collect()[0]
    assert out.k == len(g)
    assert out.n == sum(len(v) for v in g.values())
    assert abs(out.a_stat_micro / 1e6 - a_stat) < 1e-2
    assert out.reject_05 == (
        out.a_stat_micro > {2: 3841459, 3: 5991465, 4: 7814728,
                            5: 9487729, 6: 11070498}[out.k]
    )


def _daily_means_micro(spark, scale):
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            f"unix_micros(ts) div {_DAY_US} as d",
            f"cast(floor(value * {scale} + 0.5) as bigint) as vm",
        )
        .collect()
    )
    acc: dict[int, list[int]] = {}
    for r in rows:
        acc.setdefault(r.d, []).append(r.vm)
    return {d: math.floor(sum(v) / len(v) + 0.5) for d, v in acc.items()}


def test_chauvenet_matches_direct(spark):
    daily = _daily_means_micro(spark, "1e6")
    xs = list(daily.values())
    n = len(xs)
    mean = sum(xs) / n / 1e6
    sd = math.sqrt(
        (sum(x * x for x in xs) / 1e12 - (sum(xs) / 1e6) ** 2 / n) / (n - 1)
    )
    zc = NormalDist().inv_cdf(1 - 1 / (4 * n))
    zs = {d: (x / 1e6 - mean) / sd for d, x in daily.items()}
    n_out = sum(1 for z in zs.values() if abs(z) > zc)
    worst = max(abs(z) for z in zs.values())
    worst_day = min(d for d, z in zs.items() if abs(abs(z) - worst) < 1e-12)
    out = q_chauvenet_criterion(spark, SF).collect()[0]
    assert out.n_days == n
    # Acklam probit is ~1.15e-9 max relative error vs the exact inverse
    assert abs(out.z_crit_milli / 1e3 - zc) < 2e-3
    assert out.n_outliers == n_out
    assert out.worst_day == worst_day
    assert abs(abs(out.worst_z_milli) / 1e3 - worst) < 2e-3


def test_fisher_g_matches_direct(spark):
    daily = _daily_means_micro(spark, "100.0")
    xs = [daily[d] for d in sorted(daily)]
    t = len(xs)
    mean = sum(xs) / t
    n_freqs = (t - 1) // 2
    best_i, best_k, tot_i = -1.0, -1, 0.0
    for k in range(1, n_freqs + 1):
        c = sum(
            (x - mean) * math.cos(2 * math.pi * ((k * r) % t) / t)
            for r, x in enumerate(xs)
        )
        s = sum(
            (x - mean) * math.sin(2 * math.pi * ((k * r) % t) / t)
            for r, x in enumerate(xs)
        )
        ik = c * c + s * s
        tot_i += ik
        if ik > best_i:
            best_i, best_k = ik, k
    g = best_i / tot_i
    out = q_fisher_g_periodicity(spark, SF).collect()[0]
    assert out.n_days == t
    assert out.n_freqs == n_freqs
    assert out.k_star == best_k
    assert abs(out.g_micro / 1e6 - g) < 1e-3
    p = n_freqs * (1 - out.g_micro / 1e6) ** (n_freqs - 1)
    assert out.reject_05 == (p < 0.05)


def test_bhapkar_identity(spark):
    from etl_poor_main_pipeline_spark.registry_ext127 import (
        q_stuart_maxwell_test,
    )

    sm = q_stuart_maxwell_test(spark, SF).collect()[0]
    out = q_bhapkar_test(spark, SF).collect()[0]
    assert out.n_users == sm.n_users
    assert out.chi2_sm_milli == sm.chi2_milli
    chi2 = sm.chi2_milli / 1e3
    w = chi2 / (1 - chi2 / sm.n_users)
    assert out.w_milli == math.floor(w * 1e3 + 0.5)
    # Bhapkar >= Stuart-Maxwell always (the published ordering)
    assert out.w_milli >= out.chi2_sm_milli
    assert out.reject_05 == (out.w_milli > 5991)
