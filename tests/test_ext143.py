"""Wave 143: SPC pinned against direct Python implementations and the
published control-chart constants (Montgomery, Introduction to
Statistical Quality Control, Appendix VI, n=5: A2=0.577, d2=2.326,
D3=0, D4=2.114) — X̄-R chart, variable-n p-chart, Cp/Cpk, and the four
Western Electric run rules."""

import math
from collections import defaultdict

from etl_poor_main_pipeline_spark.registry_ext143 import (
    _A2,
    _D2,
    _D4,
    _LSL,
    _SUB_N,
    _USL,
    q_cp_cpk_capability,
    q_p_chart_limits,
    q_western_electric_rules,
    q_xbar_r_chart_limits,
)

SF = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000


def test_control_constants_match_literature():
    assert (_SUB_N, _A2, _D2, _D4) == (5, 0.577, 2.326, 2.114)


def _events(spark):
    from etl_poor_main_pipeline_spark.registry import _t

    return (
        _t(spark, SF, "events")
        .selectExpr("user_id", "unix_micros(ts) AS t_us", "value",
                    "event_type")
        .collect()
    )


def _subgroups(rows):
    cells = defaultdict(list)
    for r in rows:
        cells[(r.user_id, r.t_us // DAY_US)].append(
            math.floor(r.value * 1e6 + 0.5)
        )
    out = []
    for vs in cells.values():
        if len(vs) == _SUB_N:
            out.append(
                (math.floor(sum(vs) / 5.0 + 0.5), max(vs) - min(vs))
            )
    return out


def _chart(rows):
    sub = _subgroups(rows)
    g = len(sub)
    xbb = math.floor(sum(x for x, _ in sub) / g + 0.5)
    rbar = math.floor(sum(r for _, r in sub) / g + 0.5)
    ucl_x = math.floor(xbb + _A2 * rbar + 0.5)
    lcl_x = math.floor(xbb - _A2 * rbar + 0.5)
    ucl_r = math.floor(_D4 * rbar + 0.5)
    return sub, g, xbb, rbar, ucl_x, lcl_x, ucl_r


def test_xbar_r_matches_reference(spark):
    rows = _events(spark)
    sub, g, xbb, rbar, ucl_x, lcl_x, ucl_r = _chart(rows)
    beyond_x = sum(1 for x, _ in sub if x > ucl_x or x < lcl_x)
    beyond_r = sum(1 for _, r in sub if r > ucl_r)
    out = q_xbar_r_chart_limits(spark, SF).collect()[0]
    assert (out.g, out.xbarbar_micro, out.rbar_micro) == (g, xbb, rbar)
    assert (out.ucl_x_micro, out.lcl_x_micro, out.ucl_r_micro) == (
        ucl_x, lcl_x, ucl_r,
    )
    assert (out.beyond_x, out.beyond_r) == (beyond_x, beyond_r)


def test_p_chart_matches_reference(spark):
    rows = _events(spark)
    daily = defaultdict(lambda: [0, 0])
    for r in rows:
        d = r.t_us // DAY_US
        daily[d][0] += 1
        daily[d][1] += 1 if r.event_type == "error" else 0
    nt = sum(v[0] for v in daily.values())
    et = sum(v[1] for v in daily.values())
    pbar = math.floor(1e6 * et / nt + 0.5) / 1e6
    out = {r.d: r for r in q_p_chart_limits(spark, SF).collect()}
    assert set(out) == set(daily)
    for d, (n, err) in daily.items():
        w = 3.0 * math.sqrt(pbar * (1.0 - pbar) / n)
        ucl = math.floor(1e6 * (pbar + w) + 0.5)
        lcl = max(math.floor(1e6 * (pbar - w) + 0.5), 0)
        pm = math.floor(1e6 * err / n + 0.5)
        r = out[d]
        assert (r.n, r.n_err, r.p_micro) == (n, err, pm)
        assert (r.ucl_micro, r.lcl_micro) == (ucl, lcl)
        assert r.out_of_control == (pm > ucl or pm < lcl)


def test_cp_cpk_matches_reference(spark):
    rows = _events(spark)
    _, g, xbb, rbar, *_ = _chart(rows)
    sig = rbar / _D2
    cp = (_USL - _LSL) / (6.0 * sig)
    cpk = min(_USL - xbb, xbb - _LSL) / (3.0 * sig)
    out = q_cp_cpk_capability(spark, SF).collect()[0]
    assert out.g == g
    assert out.sigma_micro == math.floor(sig + 0.5)
    assert out.cp_milli == math.floor(1e3 * cp + 0.5)
    assert out.cpk_milli == math.floor(1e3 * cpk + 0.5)


def test_western_electric_matches_reference(spark):
    rows = _events(spark)
    acc = defaultdict(lambda: [0, 0])
    for r in rows:
        d = r.t_us // DAY_US
        acc[d][0] += math.floor(r.value * 1e6 + 0.5)
        acc[d][1] += 1
    xs = [
        math.floor(s / c + 0.5) for d, (s, c) in sorted(acc.items())
    ]
    nd = len(xs)
    cm = math.floor(sum(xs) / nd + 0.5)
    sm = math.floor(
        math.sqrt(
            (sum(x * x for x in xs) - sum(xs) ** 2 / nd) / nd
        )
        + 0.5
    )
    r1 = sum(1 for x in xs if x > cm + 3 * sm or x < cm - 3 * sm)
    r2 = r3 = r4 = 0
    for i in range(nd):
        if i >= 2:
            win = xs[i - 2 : i + 1]
            if (
                sum(1 for x in win if x > cm + 2 * sm) >= 2
                or sum(1 for x in win if x < cm - 2 * sm) >= 2
            ):
                r2 += 1
        if i >= 4:
            win = xs[i - 4 : i + 1]
            if (
                sum(1 for x in win if x > cm + sm) >= 4
                or sum(1 for x in win if x < cm - sm) >= 4
            ):
                r3 += 1
        if i >= 7:
            win = xs[i - 7 : i + 1]
            if all(x > cm for x in win) or all(x < cm for x in win):
                r4 += 1
    out = q_western_electric_rules(spark, SF).collect()[0]
    assert (out.n_days, out.r1, out.r2, out.r3, out.r4) == (
        nd, r1, r2, r3, r4,
    )
