"""Wave-163 literature pins: recompute Sobel's z (direct two-regression
OLS), KR-20, the Katz/Wald 2x2 intervals, the Schnabel estimate, and
van den Broek's score statistic from collected rows with independent
Python implementations."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from etl_poor_main_pipeline_spark.registry_ext163 import (
    _DAY_US,
    _HOUR_US,
    q_kr20_reliability,
    q_relative_risk_katz,
    q_schnabel_census,
    q_sobel_mediation_test,
    q_zero_inflation_score,
)

SF = "/root/testdata/sf0.001"


def _events(spark, cols):
    return spark.read.parquet(f"{SF}/events.parquet").selectExpr(*cols).collect()


def test_sobel_matches_direct(spark):
    rows = _events(spark, [f"unix_micros(ts) div {_DAY_US} as d", "event_type"])
    acc = defaultdict(lambda: [0, 0, 0])
    for r in rows:
        if r.event_type == "click":
            acc[r.d][0] += 1
        elif r.event_type == "view":
            acc[r.d][1] += 1
        elif r.event_type == "purchase":
            acc[r.d][2] += 1
    xs = [v[0] for v in acc.values()]
    ms = [v[1] for v in acc.values()]
    ys = [v[2] for v in acc.values()]
    n = len(xs)

    def cen(u, v):
        return n * sum(a * b for a, b in zip(u, v)) - sum(u) * sum(v)

    cxx, cmm, cyy = cen(xs, xs), cen(ms, ms), cen(ys, ys)
    cxm, cxy, cmy = cen(xs, ms), cen(xs, ys), cen(ms, ys)
    a = cxm / cxx
    sse1 = (cmm - cxm * cxm / cxx) / n
    sa2 = sse1 / (n - 2) * n / cxx
    det = cxx * cmm - cxm * cxm
    b = (cxx * cmy - cxm * cxy) / det
    cp = (cmm * cxy - cxm * cmy) / det
    sse2 = (cyy - cp * cxy - b * cmy) / n
    sb2 = sse2 / (n - 3) * n * cxx / det
    z = a * b / math.sqrt(a * a * sb2 + b * b * sa2)
    out = q_sobel_mediation_test(spark, SF).collect()[0]
    assert out.n_days == n
    assert abs(out.a_micro / 1e6 - a) < 2e-6
    assert abs(out.b_micro / 1e6 - b) < 2e-6
    assert abs(out.sobel_z_milli / 1e3 - z) < 2e-3
    assert out.reject_05 == (abs(out.sobel_z_milli) > 1960)


def test_kr20_matches_direct(spark):
    rows = _events(spark, ["user_id", "event_type"])
    cnts = Counter((r.user_id, r.event_type) for r in rows)
    users = sorted({u for u, _ in cnts})
    types = sorted({t for _, t in cnts})
    n = len(users)
    thr = {
        t: -(-sum(c for (u, tt), c in cnts.items() if tt == t) // n)
        for t in types
    }
    hit = {
        (u, t): int(cnts.get((u, t), 0) > thr[t])
        for u in users
        for t in types
    }
    scores = [sum(hit[(u, t)] for t in types) for u in users]
    p = {t: sum(hit[(u, t)] for u in users) / n for t in types}
    sum_pq = sum(pj * (1 - pj) for pj in p.values())
    mean_s = sum(scores) / n
    var = sum((s - mean_s) ** 2 for s in scores) / (n - 1)
    k = len(types)
    kr20 = k / (k - 1) * (1 - sum_pq / var)
    out = q_kr20_reliability(spark, SF).collect()[0]
    assert (out.k_items, out.n_users) == (k, n)
    assert abs(out.sum_pq_micro / 1e6 - sum_pq) < 2e-6
    assert abs(out.var_total_micro / 1e6 - var) < 2e-6
    assert abs(out.kr20_micro / 1e6 - kr20) < 2e-5
    # KR-20 is bounded above by 1
    assert out.kr20_micro <= 1_000_000


def test_relative_risk_matches_direct(spark):
    rows = _events(
        spark,
        [
            f"cast(pmod(unix_micros(ts) div {_DAY_US} + 3, 7) >= 5 as int)"
            " as wk",
            "cast(event_type = 'purchase' as int) as pur",
        ],
    )
    a = sum(1 for r in rows if r.wk and r.pur)
    b = sum(1 for r in rows if r.wk and not r.pur)
    c = sum(1 for r in rows if not r.wk and r.pur)
    d = sum(1 for r in rows if not r.wk and not r.pur)
    p1, p0 = a / (a + b), c / (c + d)
    rr = p1 / p0
    se = math.sqrt(1 / a - 1 / (a + b) + 1 / c - 1 / (c + d))
    lo = rr * math.exp(-1.96 * se)
    hi = rr * math.exp(1.96 * se)
    rd = p1 - p0
    serd = math.sqrt(p1 * (1 - p1) / (a + b) + p0 * (1 - p0) / (c + d))
    out = q_relative_risk_katz(spark, SF).collect()[0]
    assert (out.a, out.b, out.c, out.d) == (a, b, c, d)
    assert abs(out.rr_micro / 1e6 - rr) < 2e-6
    assert abs(out.rr_lo_micro / 1e6 - lo) < 1e-4
    assert abs(out.rr_hi_micro / 1e6 - hi) < 1e-4
    assert abs(out.rd_micro / 1e6 - rd) < 2e-6
    assert abs(out.rd_lo_micro / 1e6 - (rd - 1.96 * serd)) < 1e-4
    assert abs(out.rd_hi_micro / 1e6 - (rd + 1.96 * serd)) < 1e-4
    assert abs(out.nnt_milli / 1e3 - 1 / abs(rd)) < 2
    assert out.significant_05 == (out.rr_lo_micro > 1_000_000
                                  or out.rr_hi_micro < 1_000_000)


def test_schnabel_matches_direct(spark):
    rows = _events(
        spark,
        ["user_id", f"unix_micros(ts) div {_DAY_US} div 7 as w"],
    )
    uw = {(r.user_id, r.w) for r in rows}
    first = {}
    for u, w in sorted(uw, key=lambda p: p[1]):
        first.setdefault(u, w)
    weeks = sorted({w for _, w in uw})
    sum_cm = sum_r = marked = 0
    for w in weeks:
        active = [u for u, ww in uw if ww == w]
        ct = len(active)
        rt = sum(1 for u in active if first[u] < w)
        mt = sum(1 for u, fw in first.items() if fw < w)
        sum_cm += ct * mt
        sum_r += rt
        marked += ct - rt
    out = q_schnabel_census(spark, SF).collect()[0]
    assert out.n_weeks == len(weeks)
    assert out.n_marked_total == marked == len(first)
    assert out.sum_cm == sum_cm
    assert out.sum_r == sum_r
    assert out.n_hat_milli == math.floor(
        1e3 * sum_cm / (sum_r + 1) + 0.5
    )


def test_zero_inflation_matches_direct(spark):
    rows = _events(
        spark,
        [
            f"unix_micros(ts) div {_DAY_US} as d",
            f"(unix_micros(ts) % {_DAY_US}) div {_HOUR_US} as h",
            "event_type",
        ],
    )
    days = sorted({r.d for r in rows})
    cnt = Counter((r.d, r.h) for r in rows if r.event_type == "purchase")
    n = 24 * len(days)
    sy = sum(cnt.values())
    n0 = n - sum(1 for v in cnt.values() if v > 0)
    lam = sy / n
    p0 = math.exp(-lam)
    s = (n0 / p0 - n) ** 2 / (n * (1 - p0) / p0 - n * lam)
    out = q_zero_inflation_score(spark, SF).collect()[0]
    assert (out.n_cells, out.n_zero) == (n, n0)
    assert abs(out.lambda_micro / 1e6 - lam) < 2e-6
    assert abs(out.score_milli / 1e3 - s) < 1e-1
    assert out.reject_05 == (out.score_milli > 3841)
