"""Wave 148: variance-homogeneity and agreement completers pinned
against direct Python implementations — Bartlett (1937) with the C
correction, Hartley F-max / Cochran C, Scott (1955) pi with pooled
marginals, and Krippendorff's alpha under the ordinal metric
(Krippendorff 2004 §11.3)."""

import math
from collections import Counter, defaultdict

from etl_poor_main_pipeline_spark.registry_ext148 import (
    _CHI4_95,
    _KA_CODERS,
    _KA_LCM,
    _RANKS,
    q_bartlett_variance_test,
    q_krippendorff_alpha_ordinal,
    q_scott_pi_agreement,
    q_variance_outlier_ratios,
)

SF = "/root/testdata/sf0.001"


def _events(spark):
    from etl_poor_main_pipeline_spark.registry import _t

    return (
        _t(spark, SF, "events")
        .selectExpr("user_id", "unix_micros(ts) AS t_us", "event_id",
                    "event_type", "value")
        .collect()
    )


def _group_var(rows):
    g = defaultdict(list)
    for r in rows:
        g[r.event_type].append(math.floor(r.value * 100.0 + 0.5))
    out = {}
    for t, ys in g.items():
        n = len(ys)
        sy = sum(ys)
        syy = sum(y * y for y in ys)
        bss = math.floor(sy * float(sy) / n + 0.5)
        s2 = (syy - float(bss)) / (n - 1)
        out[t] = (n, syy, bss, s2)
    return out


def test_bartlett_matches_reference(spark):
    gv = _group_var(_events(spark))
    k = len(gv)
    nt = sum(n for n, *_ in gv.values())
    tyy = sum(syy for _, syy, *_ in gv.values())
    tb = sum(bss for *_, bss, _ in gv.values())
    wln = sum(
        (n - 1) * math.floor(1e6 * math.log(s2) + 0.5)
        for n, _, _, s2 in gv.values()
    )
    hsum = sum(
        math.floor(1e9 / (n - 1) + 0.5) for n, *_ in gv.values()
    )
    sp2 = (tyy - tb) / (nt - k)
    c = 1.0 + (hsum / 1e9 - 1.0 / (nt - k)) / (3.0 * (k - 1))
    stat = (
        (nt - k) * math.floor(1e6 * math.log(sp2) + 0.5) / 1e6
        - wln / 1e6
    ) / c
    out = q_bartlett_variance_test(spark, SF).collect()[0]
    assert (out.n, out.k) == (nt, k)
    assert out.bartlett_milli == math.floor(1e3 * stat + 0.5)
    assert out.reject_05 == (stat > _CHI4_95)


def test_variance_ratios_match_reference(spark):
    gv = _group_var(_events(spark))
    s2m = [math.floor(1e6 * s2 + 0.5) for *_, s2 in gv.values()]
    out = q_variance_outlier_ratios(spark, SF).collect()[0]
    assert out.k == len(gv)
    assert out.fmax_milli == math.floor(1e3 * max(s2m) / min(s2m) + 0.5)
    assert out.cochran_c_milli == math.floor(
        1e3 * max(s2m) / sum(s2m) + 0.5
    )


def _ratings(rows):
    first = {}
    for r in rows:
        u = r.t_us // 86_400_000_000
        c = r.user_id % _KA_CODERS
        key = (u, c)
        cand = (r.t_us, r.event_id, r.event_type)
        if key not in first or cand < first[key]:
            first[key] = cand
    return {(u, c): v for (u, c), (_, _, v) in first.items()}


def test_scott_pi_matches_reference(spark):
    ratings = _ratings(_events(spark))
    by_unit = defaultdict(dict)
    for (u, c), v in ratings.items():
        by_unit[u][c] = v
    pairs = [
        (cs[0], cs[1]) for cs in by_unit.values() if 0 in cs and 1 in cs
    ]
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    marg = Counter(v for p in pairs for v in p)
    sq = sum(v * v for v in marg.values())
    pi = (4 * n * agree - sq) / (4 * n * n - sq)
    out = q_scott_pi_agreement(spark, SF).collect()[0]
    assert (out.n_units, out.agree) == (n, agree)
    assert out.pi_micro == math.floor(1e6 * pi + 0.5)


def test_krippendorff_ordinal_matches_reference(spark):
    ratings = _ratings(_events(spark))
    by_unit = defaultdict(dict)
    for (u, c), v in ratings.items():
        by_unit[u][c] = v
    rm = {u: cs for u, cs in by_unit.items() if len(cs) >= 2}
    marg = Counter(v for cs in rm.values() for v in cs.values())
    n = sum(marg.values())

    def d2s(a, b):
        ra, rb = _RANKS[a], _RANKS[b]
        lo, hi = min(ra, rb), max(ra, rb)
        bs = sum(
            nv for v, nv in marg.items() if lo <= _RANKS[v] <= hi
        )
        return (2 * bs - marg[a] - marg[b]) ** 2

    s_scaled = 0
    for cs in rm.values():
        m = len(cs)
        coders = sorted(cs)
        for a in coders:
            for b in coders:
                if a != b:
                    s_scaled += (_KA_LCM // (m - 1)) * d2s(cs[a], cs[b])
    e_scaled = sum(
        marg[a] * marg[b] * d2s(a, b)
        for a in marg
        for b in marg
        if a != b
    )
    alpha = 1.0 - s_scaled * (n - 1) / (float(_KA_LCM) * e_scaled)
    out = q_krippendorff_alpha_ordinal(spark, SF).collect()[0]
    assert (out.n_units, out.n_ratings) == (len(rm), n)
    assert out.alpha_micro == math.floor(1e6 * alpha + 0.5)
