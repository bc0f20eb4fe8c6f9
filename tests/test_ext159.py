"""Wave-159 literature pins: recompute Siegel-Tukey (direct
per-position alternating scores), Quesenberry-Miller (direct spacings
sequence), Dixon's Q, and the Lorenz deciles from collected rows with
independent Python implementations."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from etl_poor_main_pipeline_spark.registry_ext159 import (
    _DAY_US,
    _ST_A,
    _ST_B,
    q_dixon_q_extremes,
    q_lorenz_value_deciles,
    q_quesenberry_miller_spacings,
    q_siegel_tukey_test,
)

SF = "/root/testdata/sf0.001"


def _st_score(r: int, n: int) -> int:
    """The module's documented closed alternating-rank pattern."""
    m = (n + 1) // 2
    if r <= m:
        return 2 * r - 1 if r % 2 == 1 else 2 * r
    s = n + 1 - r
    return 2 * s if s % 2 == 1 else 2 * s - 1


def test_st_scores_are_classic_permutation_for_even_n():
    # even N: exactly the classic 1,4,5,8,... / 2,3,6,7,... assignment
    assert [_st_score(r, 6) for r in range(1, 7)] == [1, 4, 5, 6, 3, 2]
    assert sorted(_st_score(r, 10) for r in range(1, 11)) == list(
        range(1, 11)
    )
    assert sorted(_st_score(r, 5) for r in range(1, 6)) == list(range(1, 6))


def test_siegel_tukey_matches_direct(spark):
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(f"event_type in ('{_ST_A}', '{_ST_B}')")
        .selectExpr(
            "event_type",
            "cast(floor(value * 100.0 + 0.5) as bigint) as vc",
        )
        .collect()
    )
    vcs = sorted({r.vc for r in rows})
    cnt = Counter(r.vc for r in rows)
    ca = Counter(r.vc for r in rows if r.event_type == _ST_A)
    n = len(rows)
    m = sum(ca.values())
    nb2 = n - m
    pos = 0
    w = 0.0
    suma = 0
    suma2 = 0.0
    for vc in vcs:
        li = cnt[vc]
        scores = [_st_score(r, n) for r in range(pos + 1, pos + li + 1)]
        avg = sum(scores) / li
        w += math.floor(1e6 * ca.get(vc, 0) * avg + 0.5) / 1e6
        suma += sum(scores)
        suma2 += sum(s * s for s in scores)
        pos += li
    ew = m * suma / n
    var = m * nb2 * (n * suma2 - suma * suma) / (n * n * (n - 1.0))
    z = (w - ew) / math.sqrt(var)
    out = q_siegel_tukey_test(spark, SF).collect()[0]
    assert (out.n_a, out.n_b) == (m, nb2)
    # exact-integer pins: the closed odd/even subseries forms must
    # reproduce ΣA and 3·ΣA² bit-for-bit (a coefficient slip in the
    # run-sum algebra cannot hide inside the z tolerance)
    assert int(out.suma) == suma
    assert int(out.suma23) == round(3 * suma2)
    var_q = (
        m * nb2 * (n * int(out.suma23) / 3.0 - suma * suma)
        / (n * n * (n - 1.0))
    )
    assert abs(var_q - var) <= 1e-9 * var
    assert abs(out.w_micro / 1e6 - w) < 1e-4
    assert abs(out.z_milli / 1e3 - z) < 2e-3
    assert out.reject_05 == (abs(out.z_milli) > 1960)


def _minute_spacings(spark):
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(f"(unix_micros(ts) % {_DAY_US}) div 60000000 as mc")
        .collect()
    )
    mcs = sorted(r.mc for r in rows)
    cnt = Counter(mcs)
    occ = sorted(cnt)
    seq = []
    for i, mc in enumerate(occ):
        seq.extend([0] * (cnt[mc] - 1))
        nxt = occ[(i + 1) % len(occ)]
        seq.append((nxt - mc) % 1440 if len(occ) > 1 else 1440)
    return len(mcs), seq


def test_quesenberry_miller_matches_direct(spark):
    n, seq = _minute_spacings(spark)
    assert len(seq) == n and sum(seq) == 1440
    d = [g / 1440.0 for g in seq]
    b = sum(x * x for x in d) + sum(
        d[i] * d[(i + 1) % n] for i in range(n)
    )
    out = q_quesenberry_miller_spacings(spark, SF).collect()[0]
    assert out.n == n
    assert abs(out.b_nano / 1e9 - b) < 1e-6
    assert abs(out.n_b_micro / 1e6 - n * b) < 1e-3


def test_dixon_q_matches_direct(spark):
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            f"unix_micros(ts) div {_DAY_US} as d",
            "cast(floor(value * 1e6 + 0.5) as bigint) as vm",
        )
        .collect()
    )
    acc = defaultdict(lambda: [0, 0])
    for r in rows:
        acc[r.d][0] += r.vm
        acc[r.d][1] += 1
    xs = sorted(math.floor(s / c + 0.5) for s, c in
                (tuple(v) for v in acc.values()))
    n = len(xs)
    qlow = (xs[1] - xs[0]) / (xs[-1] - xs[0])
    qhigh = (xs[-1] - xs[-2]) / (xs[-1] - xs[0])
    out = q_dixon_q_extremes(spark, SF).collect()[0]
    assert out.n_days == n
    assert (out.x1, out.x2, out.xn1, out.xn) == (
        xs[0], xs[1], xs[-2], xs[-1]
    )
    assert abs(out.q_low_micro / 1e6 - qlow) < 2e-6
    assert abs(out.q_high_micro / 1e6 - qhigh) < 2e-6


def test_lorenz_deciles_match_direct(spark):
    vs = sorted(
        r.vc
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr("cast(floor(value * 100.0 + 0.5) as bigint) as vc")
        .collect()
    )
    n = len(vs)
    sv = sum(vs)
    out = {r.k: r for r in q_lorenz_value_deciles(spark, SF).collect()}
    assert set(out) == set(range(1, 11))
    for k in range(1, 11):
        rk = math.ceil(k * n / 10)
        share = sum(vs[:rk]) / sv
        r = out[k]
        assert r.rank_k == rk
        assert r.pop_share_micro == math.floor(1e6 * rk / n + 0.5)
        assert abs(r.cum_value_share_micro / 1e6 - share) < 2e-6
    # the curve is convex-increasing and ends at 1
    assert out[10].cum_value_share_micro == 1_000_000
