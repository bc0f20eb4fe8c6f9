"""Wave-157 literature pins: recompute Kuiper's V, the Hodges-Ajne m,
Rao's spacing U, and Greenwood's G from collected minute-of-day values
with independent per-observation Python implementations (sorted-sample
EDF loops and direct gap enumeration, no cell algebra)."""

from __future__ import annotations

import math
from collections import Counter

from etl_poor_main_pipeline_spark.registry_ext157 import (
    _DAY_US,
    _KUIPER_95_MICRO,
    q_greenwood_spacing_stat,
    q_hodges_ajne_test,
    q_kuiper_uniformity,
    q_rao_spacing_test,
)

SF = "/root/testdata/sf0.001"


def _minutes(spark):
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(f"(unix_micros(ts) % {_DAY_US}) div 60000000 as mc")
        .collect()
    )
    return sorted(r.mc for r in rows)


def test_kuiper_matches_direct(spark):
    mcs = _minutes(spark)
    n = len(mcs)
    dp = max((i / n) - (2 * mc + 1) / 2880.0 for i, mc in enumerate(mcs, 1))
    dm = max((2 * mc + 1) / 2880.0 - (i - 1) / n for i, mc in enumerate(mcs, 1))
    v = dp + dm
    vmod = v * (math.sqrt(n) + 0.155 + 0.24 / math.sqrt(n))
    out = q_kuiper_uniformity(spark, SF).collect()[0]
    assert out.n == n
    assert abs(out.v_micro / 1e6 - v) < 2e-6
    assert abs(out.v_mod_micro / 1e6 - vmod) < 1e-4
    assert out.reject_05 == (out.v_mod_micro > _KUIPER_95_MICRO)


def test_hodges_ajne_matches_direct(spark):
    mcs = _minutes(spark)
    n = len(mcs)
    cnt = Counter(mcs)
    m = min(
        sum(cnt.get((t + i) % 1440, 0) for i in range(720))
        for t in range(1440)
    )
    out = q_hodges_ajne_test(spark, SF).collect()[0]
    assert out.n == n
    assert out.m == m
    assert out.m_over_n_micro == math.floor(1e6 * m / n + 0.5)


def _circular_gaps_direct(mcs):
    """All n circular spacings in MINUTES: zero for duplicates within a
    minute, occupied-cell gaps otherwise (incl. the wrap)."""
    cnt = Counter(mcs)
    occ = sorted(cnt)
    gaps = []
    for i, mc in enumerate(occ):
        gaps.extend([0] * (cnt[mc] - 1))
        nxt = occ[(i + 1) % len(occ)]
        gaps.append((nxt - mc) % 1440 if len(occ) > 1 else 1440)
    return gaps


def test_rao_matches_direct(spark):
    mcs = _minutes(spark)
    n = len(mcs)
    gaps = _circular_gaps_direct(mcs)
    assert len(gaps) == n
    assert sum(gaps) == 1440
    lam = 1440.0 / n
    u = 0.5 * sum(abs(g - lam) for g in gaps)
    out = q_rao_spacing_test(spark, SF).collect()[0]
    assert out.n == n
    assert abs(out.u_minutes_micro / 1e6 - u) < 1e-4
    assert abs(out.u_degrees_micro / 1e6 - u / 4.0) < 1e-4


def test_greenwood_matches_direct(spark):
    mcs = _minutes(spark)
    n = len(mcs)
    gaps = _circular_gaps_direct(mcs)
    g = sum((x / 1440.0) ** 2 for x in gaps)
    out = q_greenwood_spacing_stat(spark, SF).collect()[0]
    assert out.n == n
    assert abs(out.g_nano / 1e9 - g) < 1e-6
    assert abs(out.n_g_micro / 1e6 - n * g) < 1e-3
