"""Wave 152: multiple-comparison and effect-size completers pinned
against direct Python implementations — Holm (1979) step-down
adjusted p-values, Benjamini-Yekutieli (2001) harmonic-corrected
critical values, Agresti-Coull (1998) intervals, and the ANOVA
effect-size trio (Cohen 1988)."""

import math
from collections import defaultdict

from etl_poor_main_pipeline_spark.registry_ext152 import (
    _ALPHA_MICRO,
    _Z95,
    q_agresti_coull_interval,
    q_benjamini_yekutieli_fdr,
    q_cohens_f2_effect,
    q_holm_bonferroni_correction,
)

SF = "/root/testdata/sf0.001"


def _events(spark):
    from etl_poor_main_pipeline_spark.registry import _t

    return (
        _t(spark, SF, "events")
        .selectExpr(
            "event_type",
            "cast((dayofweek(ts) + 5) % 7 as bigint) AS dow0",
            "value",
        )
        .collect()
    )


def _phi(z):
    return 1.0 / (1.0 + math.exp(-1.5976 * z - 0.070566 * z * z * z))


def _family(rows):
    cells = defaultdict(lambda: [0, 0])
    n_all = s_all = ss_all = 0
    for r in rows:
        vm = math.floor(1e6 * r.value + 0.5)
        c = cells[(r.event_type, r.dow0)]
        c[0] += 1
        c[1] += vm
        n_all += 1
        s_all += vm
        ss_all += vm * vm
    sd = math.sqrt((ss_all - s_all * (s_all / n_all)) / (n_all - 1))
    fam = {}
    for (t, d), (ng, sg) in cells.items():
        z = math.floor(
            ((sg / ng - s_all / n_all) / (sd / math.sqrt(ng))) * 1e6 + 0.5
        )
        az = abs(z / 1e6)
        fam[(t, d)] = math.floor(2.0 * (1.0 - _phi(az)) * 1e6 + 0.5)
    return fam


def test_holm_matches_reference(spark):
    fam = _family(_events(spark))
    m = len(fam)
    order = sorted(fam.items(), key=lambda kv: (kv[1], kv[0]))
    expect = {}
    for i, ((t, d), p) in enumerate(order, start=1):
        ph = max(
            min((m - j) * order[j][1], 1_000_000)
            for j in range(i)
        )
        # (m - rank + 1) with rank = j+1 -> multiplier m - j
        expect[(t, d)] = (p, ph)
    out = {
        (r.event_type, r.dow0): r
        for r in q_holm_bonferroni_correction(spark, SF).collect()
    }
    assert set(out) == set(expect)
    for k, (p, ph) in expect.items():
        r = out[k]
        assert r.p_micro == p, k
        assert r.p_holm_micro == ph, k
        assert r.reject_10 == (ph <= _ALPHA_MICRO)


def test_by_matches_reference(spark):
    fam = _family(_events(spark))
    m = len(fam)
    cm = sum(math.floor(1e9 / i + 0.5) for i in range(1, m + 1))
    order = sorted(fam.items(), key=lambda kv: (kv[1], kv[0]))
    out = {
        (r.event_type, r.dow0): r
        for r in q_benjamini_yekutieli_fdr(spark, SF).collect()
    }
    assert set(out) == set(fam)
    # BY is a STEP-UP procedure: k* = max{i : p_(i) <= crit_i}, reject
    # ALL ranks <= k* (not a per-cell p <= crit comparison).
    crits = {
        i: math.floor(i / m * (_ALPHA_MICRO / (cm / 1e9)) + 0.5)
        for i in range(1, m + 1)
    }
    k_star = max(
        (i for i, (_, p) in enumerate(order, start=1) if p <= crits[i]),
        default=0,
    )
    for i, ((t, d), p) in enumerate(order, start=1):
        r = out[(t, d)]
        assert r.p_micro == p
        assert r.crit_by_micro == crits[i]
        assert r.reject_by == (i <= k_star)


def test_agresti_coull_matches_reference(spark):
    rows = _events(spark)
    g = defaultdict(lambda: [0, 0])
    for r in rows:
        g[r.dow0][0] += 1
        g[r.dow0][1] += 1 if r.event_type == "purchase" else 0
    out = {
        r.dow0: r for r in q_agresti_coull_interval(spark, SF).collect()
    }
    assert set(out) == set(g)
    z2 = _Z95 * _Z95
    for d, (n, x) in g.items():
        nt = n + z2
        pt = (x + z2 / 2.0) / nt
        hw = _Z95 * math.sqrt(pt * (1.0 - pt) / nt)
        r = out[d]
        assert (r.n, r.x) == (n, x)
        assert r.p_milli == math.floor(1e3 * x / n + 0.5)
        assert r.lo_micro == max(math.floor(1e6 * (pt - hw) + 0.5), 0)
        assert r.hi_micro == min(
            math.floor(1e6 * (pt + hw) + 0.5), 1_000_000
        )


def test_cohens_f2_matches_reference(spark):
    rows = _events(spark)
    g = defaultdict(list)
    for r in rows:
        g[r.event_type].append(math.floor(r.value * 100.0 + 0.5))
    nt = sum(len(v) for v in g.values())
    k = len(g)
    ty = sum(sum(v) for v in g.values())
    tyy = sum(y * y for v in g.values() for y in v)
    tb = sum(
        math.floor(sum(v) * float(sum(v)) / len(v) + 0.5)
        for v in g.values()
    )
    sst = tyy - ty * ty / nt
    ssb = tb - ty * ty / nt
    msw = (sst - ssb) / (nt - k)
    eta2 = ssb / sst
    omega2 = (ssb - (k - 1) * msw) / (sst + msw)
    f2 = eta2 / (1.0 - eta2)
    out = q_cohens_f2_effect(spark, SF).collect()[0]
    assert (out.n, out.k) == (nt, k)
    assert out.eta2_micro == math.floor(1e6 * eta2 + 0.5)
    assert out.omega2_micro == math.floor(1e6 * omega2 + 0.5)
    assert out.f2_micro == math.floor(1e6 * f2 + 0.5)
