"""Wave 141: binary-eval completers pinned against direct Python
implementations — Matthews (1975) phi coefficient, the credit-scoring
KS separation statistic on tie-corrected CDFs, tie-inclusive top-decile
lift/capture, and Fowlkes-Mallows (1983) / Youden (1950) J / balanced
accuracy — all at the exact median-cell threshold convention."""

import math
from collections import Counter

from etl_poor_main_pipeline_spark.registry_ext141 import (
    q_fowlkes_mallows_youden,
    q_ks_model_separation,
    q_lift_capture_topdecile,
    q_matthews_corrcoef_binary,
)

SF = "/root/testdata/sf0.001"


def _cells(spark):
    from etl_poor_main_pipeline_spark.registry import _t

    rows = (
        _t(spark, SF, "events")
        .select("value", "event_type")
        .collect()
    )
    nb, pb = Counter(), Counter()
    for r in rows:
        vc = math.floor(r.value * 100.0 + 0.5)
        nb[vc] += 1
        pb[vc] += 1 if r.event_type == "purchase" else 0
    return nb, pb


def _median_confusion(nb, pb):
    n = sum(nb.values())
    npos = sum(pb.values())
    cum = 0
    thr = None
    for vc in sorted(nb):
        cum += nb[vc]
        if cum >= (n + 1) // 2:
            thr = vc
            break
    tp = sum(pb[vc] for vc in nb if vc >= thr)
    fp = sum(nb[vc] - pb[vc] for vc in nb if vc >= thr)
    return n, npos, thr, tp, fp, npos - tp, (n - npos) - fp


def test_matthews_matches_reference(spark):
    nb, pb = _cells(spark)
    n, npos, thr, tp, fp, fn, tn = _median_confusion(nb, pb)
    num = tp * tn - fp * fn
    den = (
        math.sqrt(tp + fp)
        * math.sqrt(tp + fn)
        * math.sqrt(tn + fp)
        * math.sqrt(tn + fn)
    )
    mcc = num / den if den > 0 else 0.0
    out = q_matthews_corrcoef_binary(spark, SF).collect()[0]
    assert (out.n, out.thr_vc, out.tp, out.fp, out.fn, out.tn) == (
        n, thr, tp, fp, fn, tn,
    )
    assert out.mcc_micro == math.floor(1e6 * mcc + 0.5)
    # sanity: value is a weak predictor of purchase -> |phi| well below 1
    assert abs(out.mcc_micro) < 500_000


def test_ks_separation_matches_reference(spark):
    nb, pb = _cells(spark)
    n, npos = sum(nb.values()), sum(pb.values())
    cp = cn = 0
    best = (-1, None)
    for vc in sorted(nb):
        cp += pb[vc]
        cn += nb[vc]
        dm = math.floor(
            1e6 * abs(cp / npos - (cn - cp) / (n - npos)) + 0.5
        )
        if dm > best[0]:
            best = (dm, vc)
    out = q_ks_model_separation(spark, SF).collect()[0]
    assert (out.n, out.n_pos) == (n, npos)
    assert (out.d_micro, out.vc_at_max) == best


def test_lift_topdecile_matches_reference(spark):
    nb, pb = _cells(spark)
    n, npos = sum(nb.values()), sum(pb.values())
    k = (n + 9) // 10
    n_before = 0
    thr = None
    for vc in sorted(nb):  # largest vc with from-top count >= k
        if n - n_before >= k:
            thr = vc
        n_before += nb[vc]
    n_top = sum(nb[vc] for vc in nb if vc >= thr)
    pos_top = sum(pb[vc] for vc in nb if vc >= thr)
    lift = (pos_top / n_top) / (npos / n)
    out = q_lift_capture_topdecile(spark, SF).collect()[0]
    assert (out.n, out.n_pos, out.k_target, out.thr_vc) == (n, npos, k, thr)
    assert (out.n_top, out.pos_top) == (n_top, pos_top)
    assert out.lift_micro == math.floor(1e6 * lift + 0.5)
    assert out.capture_micro == math.floor(1e6 * pos_top / npos + 0.5)
    assert out.n_top >= k  # tie-inclusive: at least the decile target


def test_fowlkes_mallows_youden_matches_reference(spark):
    nb, pb = _cells(spark)
    n, npos, thr, tp, fp, fn, tn = _median_confusion(nb, pb)
    prec = tp / (tp + fp) if tp + fp > 0 else 0.0
    tpr = tp / npos
    fpr = fp / (n - npos)
    tnr = tn / (n - npos)
    out = q_fowlkes_mallows_youden(spark, SF).collect()[0]
    assert (out.n, out.thr_vc) == (n, thr)
    assert out.fm_micro == math.floor(1e6 * math.sqrt(prec * tpr) + 0.5)
    assert out.youden_micro == math.floor(1e6 * (tpr - fpr) + 0.5)
    assert out.balacc_micro == math.floor(1e6 * (tpr + tnr) / 2.0 + 0.5)
