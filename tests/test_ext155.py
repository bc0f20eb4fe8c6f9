"""Wave-155 literature pins: recompute the k-sample Anderson-Darling,
Lepage, Fligner-Killeen, and van der Waerden statistics from collected
rows with INDEPENDENT per-observation Python implementations (direct
midrank loops, no cell algebra) and check the queries' closed-form /
cell-walk outputs against them. The Acklam probit is additionally
pinned against known normal quantiles."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from etl_poor_main_pipeline_spark.registry_ext155 import (
    _CHI2_2_95_MICRO,
    _CHI2_4_95_MICRO,
    _LP_A,
    _LP_B,
    q_anderson_darling_ksamp,
    q_fligner_killeen_test,
    q_lepage_location_scale,
    q_van_der_waerden_test,
)

SF = "/root/testdata/sf0.001"


def _events(spark):
    return (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "event_type",
            "cast(floor(value * 100.0 + 0.5) as bigint) as vc",
        )
        .collect()
    )


def _acklam(p: float) -> float:
    """Acklam's probit, the same coefficients the SQL emits."""
    a = (
        -3.969683028665376e+01, 2.209460984245205e+02,
        -2.759285104469687e+02, 1.383577518672690e+02,
        -3.066479806614716e+01, 2.506628277459239e+00,
    )
    b = (
        -5.447609879822406e+01, 1.615858368580409e+02,
        -1.556989798598866e+02, 6.680131188771972e+01,
        -1.328068155288572e+01,
    )
    c = (
        -7.784894002430293e-03, -3.223964580411365e-01,
        -2.400758277161838e+00, -2.549732539343734e+00,
        4.374664141464968e+00, 2.938163982698783e+00,
    )
    d = (
        7.784695709041462e-03, 3.224671290700398e-01,
        2.445134137142996e+00, 3.754408661907416e+00,
    )
    plow = 0.02425

    def horner(cs, v, trail_one=False):
        x = cs[0]
        for cc in cs[1:]:
            x = x * v + cc
        if trail_one:
            x = x * v + 1.0
        return x

    def sln(u):
        return math.floor(1e9 * math.log(u) + 0.5) / 1e9

    if p < plow:
        q = math.sqrt(-2.0 * sln(p))
        return horner(c, q) / horner(d, q, True)
    if p > 1.0 - plow:
        q = math.sqrt(-2.0 * sln(1.0 - p))
        return -horner(c, q) / horner(d, q, True)
    q = p - 0.5
    r = q * q
    return q * horner(a, r) / horner(b, r, True)


def test_acklam_matches_known_quantiles():
    # Φ⁻¹ at textbook points, max |ε| ≈ 1.15e-9 per Acklam (2003)
    assert abs(_acklam(0.975) - 1.959963985) < 1e-7
    assert abs(_acklam(0.5)) < 1e-12
    assert abs(_acklam(0.99) - 2.326347874) < 1e-7
    assert abs(_acklam(0.1) - (-1.281551566)) < 1e-7
    assert abs(_acklam(0.001) - (-3.090232306)) < 1e-6


def _pooled_cells(rows):
    """sorted distinct vc with pooled count l and per-group counts."""
    by_vc = Counter(r.vc for r in rows)
    by_gvc = Counter((r.event_type, r.vc) for r in rows)
    vcs = sorted(by_vc)
    return vcs, by_vc, by_gvc


def test_ad_ksamp_matches_direct_formula(spark):
    rows = _events(spark)
    vcs, l, f = _pooled_cells(rows)
    groups = sorted({r.event_type for r in rows})
    n_j = Counter(r.event_type for r in rows)
    n = len(rows)
    # direct Scholz-Stephens midrank A2akN (float, no staging)
    a2 = 0.0
    for g in groups:
        s = 0.0
        cum_l = 0
        cum_f = 0
        for vc in vcs:
            li = l[vc]
            fi = f.get((g, vc), 0)
            bi = cum_l + li / 2.0
            mi = cum_f + fi / 2.0
            den = bi * (n - bi) - n * li / 4.0
            s += li / n * (n * mi - n_j[g] * bi) ** 2 / den
            cum_l += li
            cum_f += fi
        a2 += s / n_j[g]
    a2 *= (n - 1.0) / n
    out = q_anderson_darling_ksamp(spark, SF).collect()[0]
    assert out.k == len(groups)
    assert out.n == n
    assert abs(out.a2_akn_micro / 1e6 - a2) < 1e-3


def test_lepage_matches_direct_midranks(spark):
    rows = [r for r in _events(spark) if r.event_type in (_LP_A, _LP_B)]
    vcs, l, f = _pooled_cells(rows)
    n = len(rows)
    m = sum(1 for r in rows if r.event_type == _LP_A)
    nb = n - m
    # direct per-position midrank / AB-score averages within tie runs
    w = 0.0
    wa = 0.0
    suma = 0.0
    sumaa = 0.0
    tie3 = 0
    pos = 0
    for vc in vcs:
        li = l[vc]
        ca = f.get((_LP_A, vc), 0)
        ranks = range(pos + 1, pos + li + 1)
        midrank = sum(ranks) / li
        ab_scores = [min(r, n + 1 - r) for r in ranks]
        ab_avg = sum(ab_scores) / li
        w += ca * midrank
        wa += math.floor(1e6 * ca * ab_avg + 0.5) / 1e6  # query's snap
        suma += sum(ab_scores)
        sumaa += sum(s * s for s in ab_scores)
        tie3 += li**3 - li
        pos += li
    ew = m * (n + 1) / 2.0
    varw = m * nb * (n + 1) / 12.0 - m * nb * tie3 / (12.0 * n * (n - 1))
    zw = (w - ew) / math.sqrt(varw)
    ea = m * suma / n
    vara = m * nb * (n * sumaa - suma * suma) / (n * n * (n - 1.0))
    za = (wa - ea) / math.sqrt(vara)
    out = q_lepage_location_scale(spark, SF).collect()[0]
    assert (out.n_a, out.n_b) == (m, nb)
    assert abs(out.zw_milli / 1e3 - zw) < 2e-3
    assert abs(out.za_milli / 1e3 - za) < 2e-3
    lep = zw * zw + za * za
    assert abs(out.lepage_micro / 1e6 - lep) < 1e-4
    assert out.reject_05 == (out.lepage_micro > _CHI2_2_95_MICRO)


def _normal_scores_direct(rows, key_fn, p_fn):
    """Direct pooled-midrank normal scores: per element a = probit(p(R̄)),
    replicating the query's per-cell micro snap of the score."""
    zs = [key_fn(r) for r in rows]
    cnt = Counter(zs)
    n = len(zs)
    pos = 0
    score_of = {}
    for z in sorted(cnt):
        li = cnt[z]
        midrank = pos + (li + 1) / 2.0
        a = _acklam(p_fn(midrank, n))
        score_of[z] = math.floor(1e6 * a + 0.5) / 1e6
        pos += li
    per_g = defaultdict(lambda: [0, 0.0, 0.0])  # n_j, Σa, Σa²
    for r, z in zip(rows, zs):
        g = per_g[r.event_type]
        g[0] += 1
        g[1] += score_of[z]
        g[2] += score_of[z] ** 2
    return n, per_g


def test_fligner_killeen_matches_direct(spark):
    rows = _events(spark)
    # group lower medians
    by_g = defaultdict(list)
    for r in rows:
        by_g[r.event_type].append(r.vc)
    med = {
        g: sorted(v)[(len(v) + 1) // 2 - 1] for g, v in by_g.items()
    }
    n, per_g = _normal_scores_direct(
        rows,
        key_fn=lambda r: abs(r.vc - med[r.event_type]),
        p_fn=lambda rb, n: 0.5 + rb / (2.0 * (n + 1)),
    )
    sa = sum(g[1] for g in per_g.values())
    saa = sum(g[2] for g in per_g.values())
    abar = sa / n
    v2 = (saa - n * abar * abar) / (n - 1.0)
    stat = sum(
        nj * (sj / nj - abar) ** 2 for nj, sj, _ in per_g.values()
    ) / v2
    out = q_fligner_killeen_test(spark, SF).collect()[0]
    assert out.k == len(per_g)
    assert out.n == n
    assert abs(out.stat_micro / 1e6 - stat) < 1e-3
    assert out.reject_05 == (out.stat_micro > _CHI2_4_95_MICRO)


def test_van_der_waerden_matches_direct(spark):
    rows = _events(spark)
    n, per_g = _normal_scores_direct(
        rows,
        key_fn=lambda r: r.vc,
        p_fn=lambda rb, n: rb / (n + 1.0),
    )
    saa = sum(g[2] for g in per_g.values())
    s2 = saa / (n - 1.0)
    stat = sum(nj * (sj / nj) ** 2 for nj, sj, _ in per_g.values()) / s2
    out = q_van_der_waerden_test(spark, SF).collect()[0]
    assert out.k == len(per_g)
    assert out.n == n
    assert abs(out.stat_micro / 1e6 - stat) < 1e-3
    assert out.reject_05 == (out.stat_micro > _CHI2_4_95_MICRO)
