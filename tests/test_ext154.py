"""Wave 154: one-sample EDF normality tests and the Gini split pinned
against direct Python implementations — Lilliefors (1967) fitted-KS,
Anderson-Darling (1954) A² with tie-run rank algebra, one-sample
Cramér-von Mises W², and the CART Gini-gain threshold."""

import math
from collections import Counter

from etl_poor_main_pipeline_spark.registry_ext154 import (
    q_anderson_darling_normal,
    q_cvm_normal_gof,
    q_gini_gain_split,
    q_lilliefors_ks_normal,
)

SF = "/root/testdata/sf0.001"


def _phi(z):
    return 1.0 / (1.0 + math.exp(-1.5976 * z - 0.070566 * z * z * z))


def _frame(spark):
    from etl_poor_main_pipeline_spark.registry import _t

    rows = (
        _t(spark, SF, "events").selectExpr("value", "event_type").collect()
    )
    cells = Counter(math.floor(r.value * 100.0 + 0.5) for r in rows)
    n = sum(cells.values())
    s1 = sum(w * v for v, w in cells.items())
    s2 = sum(w * v * v for v, w in cells.items())
    mean = s1 / n
    sd = math.sqrt((s2 - s1 * mean) / (n - 1))
    frame = []
    nb = 0
    for vc in sorted(cells):
        w = cells[vc]
        pm = max(min(math.floor(1e6 * _phi((vc - mean) / sd) + 0.5),
                     999_999), 1)
        frame.append((vc, nb + 1, nb + w, pm))
        nb += w
    return rows, cells, n, mean, sd, frame


def test_lilliefors_matches_reference(spark):
    _, _, n, mean, sd, frame = _frame(spark)
    dp = max(rb / n - pm / 1e6 for _, ra, rb, pm in frame)
    dm = max(pm / 1e6 - (ra - 1) / n for _, ra, rb, pm in frame)
    out = q_lilliefors_ks_normal(spark, SF).collect()[0]
    assert out.n == n
    assert out.mean_centi == math.floor(mean + 0.5)
    assert out.sd_centi_micro == math.floor(1e6 * sd + 0.5)
    assert out.d_plus_micro == math.floor(1e6 * dp + 0.5)
    assert out.d_minus_micro == math.floor(1e6 * dm + 0.5)
    assert out.d_micro == math.floor(1e6 * max(dp, dm) + 0.5)


def test_anderson_darling_matches_reference(spark):
    _, _, n, _, _, frame = _frame(spark)
    s = 0
    for _, ra, rb, pm in frame:
        c1 = (rb - ra + 1) * (ra + rb - 1)
        c2 = (rb - ra + 1) * (2 * n + 1 - ra - rb)
        lnp = math.floor(1e9 * math.log(pm / 1e6) + 0.5)
        lnq = math.floor(1e9 * math.log(1.0 - pm / 1e6) + 0.5)
        s += c1 * lnp + c2 * lnq
    a2 = -n - s / 1e9 / n
    out = q_anderson_darling_normal(spark, SF).collect()[0]
    assert out.n == n
    assert out.a2_milli == math.floor(1e3 * a2 + 0.5)


def test_cvm_matches_reference(spark):
    _, _, n, _, _, frame = _frame(spark)
    s = 0
    for _, ra, rb, pm in frame:
        p = pm / 1e6
        runw = rb - ra + 1
        s1r = runw * (ra + rb - 1)
        s2r3 = rb * (2 * rb - 1) * (2 * rb + 1) - (ra - 1) * (
            2 * (ra - 1) - 1
        ) * (2 * (ra - 1) + 1)
        term = (
            runw * p * p
            - p / n * s1r
            + s2r3 / 3.0 / (4.0 * n * n)
        )
        s += math.floor(1e9 * term + 0.5)
    w2 = 1.0 / (12.0 * n) + s / 1e9
    out = q_cvm_normal_gof(spark, SF).collect()[0]
    assert out.n == n
    assert out.w2_micro == math.floor(1e6 * w2 + 0.5)
    # direct per-observation reference: same W² to snapping tolerance
    direct = 1.0 / (12.0 * n)
    i = 0
    for vc, ra, rb, pm in frame:
        for i_ in range(ra, rb + 1):
            direct += (pm / 1e6 - (2 * i_ - 1) / (2.0 * n)) ** 2
    assert abs(direct - w2) < 1e-5


def test_gini_split_matches_reference(spark):
    rows, _, _, _, _, _ = _frame(spark)
    cells = {}
    for r in rows:
        vc = math.floor(r.value * 100.0 + 0.5)
        w, p = cells.get(vc, (0, 0))
        cells[vc] = (w + 1, p + (1 if r.event_type == "purchase" else 0))
    n = sum(w for w, _ in cells.values())
    npos = sum(p for _, p in cells.values())
    gp = 2.0 * (npos / n) * (1.0 - npos / n)
    best = None
    wb = pb = 0
    for vc in sorted(cells):
        w, p = cells[vc]
        wb += w
        pb += p
        if n - wb <= 0:
            continue
        nl, pl = wb, pb
        nr, pr = n - wb, npos - pb
        gl = 2.0 * (pl / nl) * (1.0 - pl / nl)
        gr = 2.0 * (pr / nr) * (1.0 - pr / nr)
        gain = gp - (nl / n) * gl - (nr / n) * gr
        gm = math.floor(1e6 * gain + 0.5)
        if best is None or (gm, -vc) > best:
            best = (gm, -vc)
    out = q_gini_gain_split(spark, SF).collect()[0]
    assert (out.n, out.n_pos) == (n, npos)
    assert out.gini_parent_micro == math.floor(1e6 * gp + 0.5)
    assert (out.gain_micro, -out.thr_vc) == best
