"""Wave 145: survey-sampling design estimators pinned against direct
Python implementations — Kish (1965) n_eff/deff, Horvitz-Thompson
(1952) with exact 256/k expansion weights over the md5-threshold
sample, the one-way-ANOVA cluster design effect (Kish 1965 ch. 5), and
1-in-k systematic sampling by id residue."""

import hashlib
import math
from collections import Counter, defaultdict

from etl_poor_main_pipeline_spark.registry_ext145 import (
    _HT_DESIGN,
    _SYS_K,
    _SYS_R,
    q_cluster_design_effect,
    q_horvitz_thompson_total,
    q_kish_design_effect,
    q_systematic_sample_estimate,
)

SF = "/root/testdata/sf0.001"


def _events(spark):
    from etl_poor_main_pipeline_spark.registry import _t

    return (
        _t(spark, SF, "events")
        .selectExpr("event_id", "user_id", "event_type", "value")
        .collect()
    )


def test_ht_design_weights_are_exact_inverses():
    hexv = {"80": 128, "40": 64, "zz": 256, "20": 32}
    for s, (t, w) in _HT_DESIGN.items():
        assert w * hexv[t] == 256, (s, t, w)


def test_kish_matches_reference(spark):
    rows = _events(spark)
    w = Counter(r.user_id for r in rows)
    k = len(w)
    sw = sum(w.values())
    sww = sum(v * v for v in w.values())
    out = q_kish_design_effect(spark, SF).collect()[0]
    assert (out.n_users, out.n_events) == (k, sw)
    assert out.neff_milli == math.floor(1e3 * sw * sw / sww + 0.5)
    assert out.deff_milli == math.floor(1e3 * k * sww / (sw * sw) + 0.5)


def test_horvitz_thompson_matches_reference(spark):
    rows = _events(spark)
    n_frame = len(rows)
    true_total = sum(math.floor(r.value * 1e6 + 0.5) for r in rows)
    n_s = ht = 0
    for r in rows:
        t, w = _HT_DESIGN[r.event_type]
        b = hashlib.md5(str(r.event_id).encode()).hexdigest()[:2]
        if b < t:
            n_s += 1
            ht += math.floor(r.value * 1e6 + 0.5) * w
    out = q_horvitz_thompson_total(spark, SF).collect()[0]
    assert (out.n_frame, out.n_sampled) == (n_frame, n_s)
    assert (out.true_total_micro, out.ht_total_micro) == (true_total, ht)
    assert out.rel_err_micro == math.floor(
        1e6 * (ht - true_total) / true_total + 0.5
    )
    # the design should land within a few percent of truth
    assert abs(out.rel_err_micro) < 100_000


def test_cluster_deff_matches_reference(spark):
    rows = _events(spark)
    cl = defaultdict(list)
    for r in rows:
        cl[r.user_id].append(math.floor(r.value * 100.0 + 0.5))
    k = len(cl)
    n = sum(len(v) for v in cl.values())
    smm = sum(len(v) ** 2 for v in cl.values())
    ty = sum(sum(v) for v in cl.values())
    tyy = sum(y * y for v in cl.values() for y in v)
    tbss = sum(
        math.floor(sum(v) * float(sum(v)) / len(v) + 0.5)
        for v in cl.values()
    )
    sst = tyy - ty * ty / n
    ssb = tbss - ty * ty / n
    msb = ssb / (k - 1)
    msw = (sst - ssb) / (n - k)
    m0 = (n - smm / n) / (k - 1)
    rho = (msb - msw) / (msb + (m0 - 1) * msw)
    deff = 1.0 + (m0 - 1) * rho
    out = q_cluster_design_effect(spark, SF).collect()[0]
    assert (out.k_clusters, out.n) == (k, n)
    assert out.m0_milli == math.floor(1e3 * m0 + 0.5)
    assert out.rho_micro == math.floor(1e6 * rho + 0.5)
    assert out.deff_milli == math.floor(1e3 * deff + 0.5)


def test_systematic_matches_reference(spark):
    rows = _events(spark)
    n_frame = len(rows)
    ty = sum(math.floor(r.value * 1e6 + 0.5) for r in rows)
    samp = [
        math.floor(r.value * 1e6 + 0.5)
        for r in rows
        if r.event_id % _SYS_K == _SYS_R
    ]
    est = sum(samp) / len(samp)
    tru = ty / n_frame
    out = q_systematic_sample_estimate(spark, SF).collect()[0]
    assert (out.k, out.r, out.n_frame, out.n_sampled) == (
        _SYS_K, _SYS_R, n_frame, len(samp),
    )
    assert out.est_mean_micro == math.floor(est + 0.5)
    assert out.true_mean_micro == math.floor(tru + 0.5)
    assert out.err_micro == math.floor(est - tru + 0.5)
