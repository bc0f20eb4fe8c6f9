"""Wave 144: survival completers pinned against direct Python
implementations — Tarone-Ware (1977) sqrt(n)-weighted log-rank,
Peto-Peto-Prentice with the (n+1)-denominator modified survival weight
(Klein & Moeschberger §7.3), the actuarial life table with half-
interval censoring exposure, and Greenwood (1926) variance with the
linear clamped 95% band."""

import math
from collections import defaultdict

from etl_poor_main_pipeline_spark.registry_ext144 import (
    _WEEK_DAYS,
    q_actuarial_life_table,
    q_km_greenwood_ci,
    q_peto_peto_test,
    q_tarone_ware_test,
)

SF = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000


def _durations(spark):
    from etl_poor_main_pipeline_spark.registry import _t

    rows = (
        _t(spark, SF, "events")
        .selectExpr("user_id", "unix_micros(ts) AS t_us", "event_type")
        .collect()
    )
    acc = {}
    for r in rows:
        d = r.t_us // DAY_US
        u = acc.setdefault(r.user_id, [d, None, d])
        u[0] = min(u[0], d)
        u[2] = max(u[2], d)
        if r.event_type == "purchase":
            u[1] = d if u[1] is None else min(u[1], d)
    durs = []
    for uid, (d0, dp, dl) in acc.items():
        t = (dp - d0) if dp is not None else (dl - d0)
        durs.append((1 if uid % 2 == 0 else 0, t, 1 if dp is not None else 0))
    return durs


def _risk(durs):
    cells = defaultdict(lambda: [0, 0, 0, 0])  # d1, dt, a1, at
    for g1, t, ev in durs:
        c = cells[t]
        c[0] += ev * g1
        c[1] += ev
        c[2] += g1
        c[3] += 1
    out = []
    n1 = nt = 0
    for t in sorted(cells, reverse=True):
        d1, dt, a1, at = cells[t]
        n1 += a1
        nt += at
        out.append((t, d1, dt, n1, nt))
    return sorted(out)


def _weighted_z(risk, wfn):
    so = sv = 0
    for t, d1, dt, n1, nt in risk:
        if dt > 0 and nt > 1:
            w = wfn(t, dt, nt)
            oe = d1 - dt * n1 / nt
            v = dt * (n1 / nt) * (1.0 - n1 / nt) * (nt - dt) / (nt - 1)
            so += math.floor(1e6 * w * oe + 0.5)
            sv += math.floor(1e6 * w * w * v + 0.5)
    z = (so / 1e6) / math.sqrt(sv / 1e6)
    return so, sv, math.floor(1e3 * z + 0.5)


def test_tarone_ware_matches_reference(spark):
    durs = _durations(spark)
    risk = _risk(durs)
    so, sv, zm = _weighted_z(risk, lambda t, dt, nt: math.sqrt(nt))
    out = q_tarone_ware_test(spark, SF).collect()[0]
    assert out.n_users == max(nt for *_, nt in risk)
    assert (out.oe_micro, out.v_micro, out.z_milli) == (so, sv, zm)


def test_peto_peto_matches_reference(spark):
    durs = _durations(spark)
    risk = _risk(durs)
    # S-tilde prefix product with nano-snapped ln, micro-snapped weight
    stm = {}
    lnp = 0
    for t, d1, dt, n1, nt in risk:
        if dt > 0:
            lnp += math.floor(1e9 * math.log(1.0 - dt / (nt + 1.0)) + 0.5)
        stm[t] = math.floor(1e6 * math.exp(lnp / 1e9) + 0.5)
    so, sv, zm = _weighted_z(risk, lambda t, dt, nt: stm[t] / 1e6)
    out = q_peto_peto_test(spark, SF).collect()[0]
    assert (out.oe_micro, out.v_micro, out.z_milli) == (so, sv, zm)


def test_actuarial_life_table_matches_reference(spark):
    durs = _durations(spark)
    iv = defaultdict(lambda: [0, 0])
    for _, t, ev in durs:
        w = t // _WEEK_DAYS
        iv[w][0] += ev
        iv[w][1] += 1 - ev
    n_all = len(durs)
    rows = {r.week: r for r in q_actuarial_life_table(spark, SF).collect()}
    assert set(rows) == set(iv)
    gone = 0
    lnc = 0
    for w in sorted(iv):
        d, c = iv[w]
        n_enter = n_all - gone
        n_eff = n_enter - c / 2.0
        q = d / n_eff if n_eff > 0 else 1.0
        r = rows[w]
        assert (r.n_enter, r.d, r.c) == (n_enter, d, c)
        assert r.n_eff_milli == math.floor(1e3 * n_eff + 0.5)
        assert r.q_micro == math.floor(1e6 * q + 0.5) if n_eff > 0 else 1_000_000
        s_enter = 0 if lnc <= -99_000_000_000 else math.floor(
            1e6 * math.exp(lnc / 1e9) + 0.5
        )
        assert r.s_enter_micro == s_enter
        if d == 0:
            pass
        elif d < n_eff:
            lnc += math.floor(1e9 * math.log(1.0 - d / n_eff) + 0.5)
        else:
            lnc = -99_000_000_000
        gone += d + c


def test_km_greenwood_matches_reference(spark):
    durs = _durations(spark)
    risk = _risk(durs)
    lnc = gwc = 0
    expect = []
    for t, d1, dt, n1, nt in risk:
        if dt == 0:
            continue
        if dt < nt:
            lnc += math.floor(1e9 * math.log(1.0 - dt / nt) + 0.5)
            gwc += math.floor(1e9 * dt / (nt * (nt - dt)) + 0.5)
        else:
            lnc = -99_000_000_000
        if lnc <= -99_000_000_000:
            expect.append((t, dt, nt, 0, 0, 0, 0))
        else:
            s = math.exp(lnc / 1e9)
            se = s * math.sqrt(gwc / 1e9)
            expect.append(
                (
                    t,
                    dt,
                    nt,
                    math.floor(1e6 * s + 0.5),
                    math.floor(1e6 * se + 0.5),
                    max(math.floor(1e6 * (s - 1.96 * se) + 0.5), 0),
                    min(math.floor(1e6 * (s + 1.96 * se) + 0.5), 1_000_000),
                )
            )
    got = [
        (r.day, r.d, r.n_risk, r.s_micro, r.se_micro, r.lo_micro, r.hi_micro)
        for r in q_km_greenwood_ci(spark, SF).collect()
    ]
    assert got == expect
