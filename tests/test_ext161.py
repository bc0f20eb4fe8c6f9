"""Wave-161 literature pins: recompute the 1-D Wasserstein distance,
the BWS B statistic, Dunn's pairwise z, the Cressie-Read family, mean
ridits, and the PAA/SAX segments from collected rows with independent
Python implementations (direct formulas, not the module's SQL
algebra)."""

from __future__ import annotations

import math
from collections import Counter

from etl_poor_main_pipeline_spark.registry_ext161 import (
    _WD_A,
    _WD_B,
    q_bws_test,
    q_cressie_read_divergence,
    q_dunn_posthoc_pairs,
    q_ridit_analysis,
    q_sax_paa_daily,
    q_wasserstein_distance_2samp,
)

SF = "/root/testdata/sf0.001"


def _two_samples(spark):
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(f"event_type in ('{_WD_A}', '{_WD_B}')")
        .selectExpr(
            "event_type",
            "cast(floor(value * 100.0 + 0.5) as bigint) as vc",
        )
        .collect()
    )
    xa = sorted(r.vc for r in rows if r.event_type == _WD_A)
    xb = sorted(r.vc for r in rows if r.event_type == _WD_B)
    return xa, xb


def test_wasserstein_matches_direct(spark):
    """Direct CDF-integral W1 (the scipy.stats.wasserstein_distance
    construction) on the centi-quantized samples."""
    xa, xb = _two_samples(spark)
    vals = sorted(set(xa) | set(xb))
    ca = Counter(xa)
    cb = Counter(xb)
    na, nb = len(xa), len(xb)
    w1 = 0.0
    cuma = cumb = 0
    for v, vn in zip(vals, vals[1:]):
        cuma += ca.get(v, 0)
        cumb += cb.get(v, 0)
        w1 += abs(cuma / na - cumb / nb) * (vn - v)
    w1 /= 100.0  # centi -> value units
    out = q_wasserstein_distance_2samp(spark, SF).collect()[0]
    assert (out.n_a, out.n_b) == (na, nb)
    assert abs(out.w1_micro / 1e6 - w1) < 2e-6


def _bws_side(own_sorted_ranks, m_own, m_other):
    n = m_own + m_other
    s = 0.0
    for i, r in enumerate(own_sorted_ranks, start=1):
        num = (r - n / m_own * i) ** 2
        den = (
            (i / (m_own + 1))
            * (1 - i / (m_own + 1))
            * m_other
            * n
            / m_own
        )
        s += num / den
    return s / m_own


def test_bws_matches_direct(spark):
    """Baumgartner et al. (1998) eq. 1-2 with pooled midranks."""
    xa, xb = _two_samples(spark)
    pooled = Counter(xa) + Counter(xb)
    vals = sorted(pooled)
    midrank = {}
    below = 0
    for v in vals:
        midrank[v] = below + (pooled[v] + 1) / 2
        below += pooled[v]
    ra = sorted(midrank[v] for v in xa)
    rb = sorted(midrank[v] for v in xb)
    bx = _bws_side(ra, len(xa), len(xb))
    by = _bws_side(rb, len(xb), len(xa))
    b = (bx + by) / 2
    out = q_bws_test(spark, SF).collect()[0]
    assert (out.n_a, out.n_b) == (len(xa), len(xb))
    assert abs(out.b_x_micro / 1e6 - bx) < 1e-4
    assert abs(out.b_y_micro / 1e6 - by) < 1e-4
    assert abs(out.b_stat_micro / 1e6 - b) < 1e-4
    assert out.reject_05 == (out.b_stat_micro > 2_493_000)


def _all_groups(spark):
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "event_type",
            "cast(floor(value * 100.0 + 0.5) as bigint) as vc",
        )
        .collect()
    )
    groups: dict[str, list[int]] = {}
    for r in rows:
        groups.setdefault(r.event_type, []).append(r.vc)
    return groups


def test_dunn_matches_direct(spark):
    groups = _all_groups(spark)
    pooled = Counter()
    for v in groups.values():
        pooled.update(v)
    n = sum(pooled.values())
    midrank = {}
    below = 0
    for v in sorted(pooled):
        midrank[v] = below + (pooled[v] + 1) / 2
        below += pooled[v]
    st = sum(l**3 - l for l in pooled.values())
    var_base = (n * (n + 1) - st / (n - 1)) / 12.0
    mean_rank = {
        t: sum(midrank[v] for v in vs) / len(vs) for t, vs in groups.items()
    }
    out = {
        (r.ti, r.tj): r for r in q_dunn_posthoc_pairs(spark, SF).collect()
    }
    ts = sorted(groups)
    assert len(out) == len(ts) * (len(ts) - 1) // 2
    for i, ti in enumerate(ts):
        for tj in ts[i + 1:]:
            z = (mean_rank[ti] - mean_rank[tj]) / math.sqrt(
                var_base * (1 / len(groups[ti]) + 1 / len(groups[tj]))
            )
            row = out[(ti, tj)]
            assert (row.n_i, row.n_j) == (len(groups[ti]), len(groups[tj]))
            assert abs(row.z_milli / 1e3 - z) < 2e-3
            assert row.reject_bonf05 == (abs(row.z_milli) > 2807)


def test_cressie_read_matches_direct(spark):
    groups = _all_groups(spark)
    o = {t: len(v) for t, v in groups.items()}
    n = sum(o.values())
    k = len(o)
    e = n / k

    def pd(lam):
        return (
            2.0
            / (lam * (lam + 1))
            * sum(oi * ((oi / e) ** lam - 1) for oi in o.values())
        )

    expect = {
        "pearson_chi2": pd(1.0),
        "cressie_read": pd(2.0 / 3.0),
        "freeman_tukey": pd(-0.5),
        "neyman": pd(-2.0),
        "g_test": 2.0 * sum(oi * math.log(oi / e) for oi in o.values()),
        "mod_g_test": 2.0 * sum(e * math.log(e / oi) for oi in o.values()),
    }
    rows = {r.member: r for r in q_cressie_read_divergence(spark, SF).collect()}
    assert set(rows) == set(expect)
    for member, val in expect.items():
        # micro snapping of pow/ln inside the O-weighted sums costs up
        # to ~n ulps of 1e-6 relative to the unsnapped direct value
        assert abs(rows[member].stat_micro / 1e6 - val) < 0.3, member
    # Pearson identity: PD(1) == classic chi-square
    chi2 = sum((oi - e) ** 2 / e for oi in o.values())
    assert abs(rows["pearson_chi2"].stat_micro / 1e6 - chi2) < 0.3


def test_ridit_matches_direct(spark):
    groups = _all_groups(spark)
    pooled = Counter()
    for v in groups.values():
        pooled.update(v)
    n = sum(pooled.values())
    ridit = {}
    below = 0
    for v in sorted(pooled):
        ridit[v] = (below + pooled[v] / 2) / n
        below += pooled[v]
    rows = {r.event_type: r for r in q_ridit_analysis(spark, SF).collect()}
    for t, vs in groups.items():
        mean_r = sum(ridit[v] for v in vs) / len(vs)
        z = (mean_r - 0.5) * math.sqrt(12 * len(vs))
        assert abs(rows[t].mean_ridit_micro / 1e6 - mean_r) < 2e-6
        assert abs(rows[t].z_milli / 1e3 - z) < 2e-3
        assert rows[t].reject_05 == (abs(rows[t].z_milli) > 1960)
    # mean ridit of the pooled sample is 1/2 by construction
    tot = sum(len(v) for v in groups.values())
    pooled_mean = sum(
        len(vs) * (rows[t].mean_ridit_micro / 1e6)
        for t, vs in groups.items()
    ) / tot
    assert abs(pooled_mean - 0.5) < 1e-4


def test_sax_matches_direct(spark):
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "unix_micros(ts) div 86400000000 as d",
            "cast(floor(value * 1e6 + 0.5) as bigint) as vm",
        )
        .collect()
    )
    acc: dict[int, list[int]] = {}
    for r in rows:
        acc.setdefault(r.d, []).append(r.vm)
    daily = {
        d: math.floor(sum(v) / len(v) + 0.5) for d, v in acc.items()
    }
    xs = [daily[d] for d in sorted(daily)]
    t = len(xs)
    mu = sum(xs) / t
    sd = math.sqrt(sum(x * x for x in xs) / t - mu * mu)
    segs: dict[int, list[int]] = {}
    for r0, x in enumerate(xs):
        segs.setdefault((r0 * 12) // t, []).append(x)
    out = {r.seg: r for r in q_sax_paa_daily(spark, SF).collect()}
    assert set(out) == set(segs)
    bp = 0.6744897501960817
    for s, vals in segs.items():
        paa = sum(vals) / len(vals)
        z = (paa - mu) / sd
        sym = "a" if z < -bp else "b" if z < 0 else "c" if z < bp else "d"
        row = out[s]
        assert row.n_days == len(vals)
        assert abs(row.paa_micro - paa) <= 0.5
        assert abs(row.z_milli / 1e3 - z) < 2e-3
        assert row.symbol == sym, (s, z)
