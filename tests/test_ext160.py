"""Wave-160 literature pins: recompute Lin's CCC, the Deming slope,
TDI/CP, and Harrell's C (direct O(n²) comparable-pair loop with the
lifelines conventions) from collected rows with independent Python
implementations."""

from __future__ import annotations

import math
from collections import defaultdict

from etl_poor_main_pipeline_spark.registry_ext160 import (
    _CP_DELTA_MICRO,
    _DAY_US,
    _HOUR_US,
    _TDI_KAPPA,
    q_deming_regression,
    q_harrell_c_index,
    q_lin_ccc_agreement,
    q_tdi_coverage_agreement,
)

SF = "/root/testdata/sf0.001"


def _pairs(spark):
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "user_id",
            f"unix_micros(ts) div {_DAY_US} as d",
            f"cast((unix_micros(ts) % {_DAY_US}) div {_HOUR_US} >= 12"
            " as int) as pm",
            "cast(floor(value * 1e6 + 0.5) as bigint) as vm",
        )
        .collect()
    )
    acc = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for r in rows:
        acc[(r.user_id, r.d)][r.pm][0] += r.vm
        acc[(r.user_id, r.d)][r.pm][1] += 1
    out = []
    for halves in acc.values():
        if len(halves) == 2:
            x = math.floor(halves[0][0] / halves[0][1] + 0.5)
            y = math.floor(halves[1][0] / halves[1][1] + 0.5)
            out.append((x, y))
    return out


def _moments(pts):
    n = len(pts)
    mx = sum(x for x, _ in pts) / n
    my = sum(y for _, y in pts) / n
    vx = sum((x - mx) ** 2 for x, _ in pts) / n
    vy = sum((y - my) ** 2 for _, y in pts) / n
    vxy = sum((x - mx) * (y - my) for x, y in pts) / n
    return n, mx, my, vx, vy, vxy


def test_lin_ccc_matches_direct(spark):
    pts = _pairs(spark)
    n, mx, my, vx, vy, vxy = _moments(pts)
    ccc = 2 * vxy / (vx + vy + (mx - my) ** 2)
    r = vxy / math.sqrt(vx * vy)
    out = q_lin_ccc_agreement(spark, SF).collect()[0]
    assert out.n_pairs == n
    assert abs(out.ccc_micro / 1e6 - ccc) < 1e-4
    assert abs(out.pearson_micro / 1e6 - r) < 1e-4
    assert abs(out.cb_micro / 1e6 - ccc / r) < 1e-4


def test_deming_matches_direct(spark):
    pts = _pairs(spark)
    n, mx, my, vx, vy, vxy = _moments(pts)
    slope = (vy - vx + math.sqrt((vy - vx) ** 2 + 4 * vxy**2)) / (2 * vxy)
    intercept = (my - slope * mx) / 1e6
    out = q_deming_regression(spark, SF).collect()[0]
    assert out.n_pairs == n
    assert abs(out.slope_micro / 1e6 - slope) < 1e-4
    assert abs(out.intercept_micro / 1e6 - intercept) < 1e-4


def test_tdi_cp_match_direct(spark):
    pts = _pairs(spark)
    n = len(pts)
    msd = sum((x - y) ** 2 for x, y in pts) / n / 1e12
    nw = sum(1 for x, y in pts if abs(x - y) <= _CP_DELTA_MICRO)
    out = q_tdi_coverage_agreement(spark, SF).collect()[0]
    assert out.n_pairs == n
    assert abs(out.msd_micro / 1e6 - msd) < 1e-4
    assert abs(out.tdi90_micro / 1e6 - _TDI_KAPPA * math.sqrt(msd)) < 1e-4
    assert out.n_within == nw
    assert out.cp_micro == math.floor(1e6 * nw / n + 0.5)


def test_harrell_c_matches_direct_pair_loop(spark):
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "user_id",
            f"unix_micros(ts) div {_DAY_US} as d",
            "event_type",
        )
        .collect()
    )
    first = defaultdict(lambda: [None, None, None])  # d0, dp, dl
    for r in rows:
        f = first[r.user_id]
        f[0] = r.d if f[0] is None else min(f[0], r.d)
        f[2] = r.d if f[2] is None else max(f[2], r.d)
        if r.event_type == "purchase":
            f[1] = r.d if f[1] is None else min(f[1], r.d)
    subj = []
    for uid, (d0, dp, dl) in first.items():
        t = (dp - d0) if dp is not None else (dl - d0)
        subj.append((1 if uid % 2 == 0 else 0, t, 1 if dp is not None else 0))
    n = len(subj)
    num = 0.0
    den = 0
    for i in range(n):
        gi, ti, ei = subj[i]
        if not ei:
            continue
        for j in range(n):
            if j == i:
                continue
            gj, tj, ej = subj[j]
            comparable = tj > ti or (tj == ti and ej == 0)
            if not comparable:
                continue
            den += 1
            if gi > gj:
                num += 1.0
            elif gi == gj:
                num += 0.5
    out = q_harrell_c_index(spark, SF).collect()[0]
    assert out.n_users == n
    assert out.n_events == sum(e for _, _, e in subj)
    assert out.comparable_pairs == den
    assert abs(out.c_index_micro / 1e6 - num / den) < 2e-6
