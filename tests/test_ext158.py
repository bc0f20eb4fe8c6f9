"""Wave-158 literature pins: recompute Hoeffding's D (direct O(n²)
c-function loop), the Gini mean difference + index (direct pairwise
|x_i - x_j|), Bowley/Moors octile moments, and Cohen's d / Hedges' g
from collected rows with independent Python implementations."""

from __future__ import annotations

import math
from collections import defaultdict

from etl_poor_main_pipeline_spark.registry_ext158 import (
    _CD_A,
    _CD_B,
    _DAY_US,
    q_bowley_moors_robust_moments,
    q_cohens_d_hedges_g,
    q_gini_mean_difference,
    q_hoeffding_d,
)

SF = "/root/testdata/sf0.001"


def test_hoeffding_d_matches_direct_c_function(spark):
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "user_id",
            f"unix_micros(ts) div {_DAY_US} as d",
            "cast(floor(value * 1e6 + 0.5) as bigint) as vm",
        )
        .collect()
    )
    acc = defaultdict(lambda: [0, 0])
    for r in rows:
        acc[(r.user_id, r.d)][0] += r.vm
        acc[(r.user_id, r.d)][1] += 1
    pts = [
        (c, math.floor(s / c / 1e4 + 0.5))
        for s, c in (tuple(v) for v in acc.values())
    ]
    n = len(pts)
    assert n > 5

    def c(u):  # Hmisc c-function
        return 1.0 if u > 0 else (0.5 if u == 0 else 0.0)

    # midranks and Q via the direct O(n²) definition:
    # R_i = 1/2 + Σ_j c(x_i - x_j)  (j = i contributes 1/2 -> midrank),
    # Q_i = 1 + Σ_{j≠i} c(x_i-x_j)·c(y_i-y_j)
    #     = 1 + Σ_j c(·)·c(·) - 1/4   (the self term is c(0)² = 1/4)
    rs, ss, qs = [], [], []
    for xi, yi in pts:
        rs.append(0.5 + sum(c(xi - xj) for xj, _ in pts))
        ss.append(0.5 + sum(c(yi - yj) for _, yj in pts))
        qs.append(
            1.0
            + sum(c(xi - xj) * c(yi - yj) for xj, yj in pts)
            - 0.25
        )
    d1 = sum((q - 1) * (q - 2) for q in qs)
    d2 = sum((r - 1) * (r - 2) * (s - 1) * (s - 2) for r, s in zip(rs, ss))
    d3 = sum((r - 2) * (s - 2) * (q - 1) for r, s, q in zip(rs, ss, qs))
    dd = (
        30.0
        * ((n - 2) * (n - 3) * d1 + d2 - 2 * (n - 2) * d3)
        / (n * (n - 1) * (n - 2) * (n - 3) * (n - 4))
    )
    out = q_hoeffding_d(spark, SF).collect()[0]
    assert out.n == n
    assert abs(out.d_micro / 1e6 - dd) < 1e-4
    # component sums (n-scaled, nano-snapped) agree too
    assert abs(out.d1_nano / 1e9 - d1 / n**2) < 1e-5
    assert abs(out.d2_nano / 1e9 - d2 / n**4) < 1e-5
    assert abs(out.d3_nano / 1e9 - d3 / n**3) < 1e-5


def _values_centi(spark):
    return [
        r.vc
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr("cast(floor(value * 100.0 + 0.5) as bigint) as vc")
        .collect()
    ]


def test_gmd_matches_direct_pairwise(spark):
    vs = sorted(_values_centi(spark))
    n = len(vs)
    # direct pairwise via the sorted identity (O(n) after sort)
    gmd = (
        2.0
        * sum((2 * i - n - 1) * v for i, v in enumerate(vs, 1))
        / (n * (n - 1))
        / 100.0
    )
    mean = sum(vs) / n / 100.0
    out = q_gini_mean_difference(spark, SF).collect()[0]
    assert out.n == n
    assert abs(out.gmd_micro / 1e6 - gmd) < 1e-5
    assert abs(out.gini_micro / 1e6 - gmd / (2 * mean)) < 1e-5


def test_bowley_moors_matches_direct(spark):
    vs = sorted(_values_centi(spark))
    n = len(vs)
    e = {k: vs[math.ceil(k * n / 8) - 1] for k in range(1, 8)}
    bow = (e[6] + e[2] - 2 * e[4]) / (e[6] - e[2])
    moors = ((e[7] - e[5]) + (e[3] - e[1])) / (e[6] - e[2])
    out = q_bowley_moors_robust_moments(spark, SF).collect()[0]
    assert out.n == n
    for k in range(1, 8):
        assert getattr(out, f"e{k}") == e[k]
    assert abs(out.bowley_micro / 1e6 - bow) < 2e-6
    assert abs(out.moors_micro / 1e6 - moors) < 2e-6


def test_cohens_d_hedges_g_matches_direct(spark):
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "event_type",
            "cast(floor(value * 1e6 + 0.5) as bigint) as vm",
        )
        .collect()
    )
    a = [r.vm / 1e6 for r in rows if r.event_type == _CD_A]
    b = [r.vm / 1e6 for r in rows if r.event_type == _CD_B]
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = sum((x - ma) ** 2 for x in a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
    sp = math.sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
    d = (ma - mb) / sp
    j = 1.0 - 3.0 / (4.0 * (na + nb - 2) - 1.0)
    out = q_cohens_d_hedges_g(spark, SF).collect()[0]
    assert (out.n_a, out.n_b) == (na, nb)
    assert abs(out.d_micro / 1e6 - d) < 1e-4
    assert abs(out.g_micro / 1e6 - j * d) < 1e-4
    assert abs(out.sp_micro / 1e6 - sp) < 1e-4
