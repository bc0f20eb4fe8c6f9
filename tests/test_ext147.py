"""Wave 147: GLM and panel completers pinned against direct Python
implementations — Poisson log-linear IRLS (McCullagh & Nelder ch. 2)
with deviance/Pearson GoF, grouped-binomial logistic IRLS, the panel
between estimator, and the through-origin first-difference
estimator."""

import math
from collections import defaultdict

from etl_poor_main_pipeline_spark.registry_ext147 import (
    _IRLS_STEPS,
    q_between_estimator_panel,
    q_first_difference_estimator,
    q_logistic_irls_value,
    q_poisson_irls_trend,
)

SF = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000
HOUR_US = 3_600_000_000


def _events(spark):
    from etl_poor_main_pipeline_spark.registry import _t

    return (
        _t(spark, SF, "events")
        .selectExpr("user_id", "unix_micros(ts) AS t_us", "value",
                    "event_type")
        .collect()
    )


def test_poisson_irls_matches_reference(spark):
    rows = _events(spark)
    daily = defaultdict(int)
    for r in rows:
        if r.event_type == "error":
            daily[r.t_us // DAY_US] += 1
    d0 = min(daily)
    pts = [(d - d0, y) for d, y in daily.items()]
    n = len(pts)
    sy = sum(y for _, y in pts)
    am = math.floor(1e6 * math.log(sy / n) + 0.5)
    bm = 0
    for _ in range(_IRLS_STEPS):
        ua = ub = iaa = iab = ibb = 0
        for t, y in pts:
            mu = math.floor(1e6 * math.exp((am + bm * t) / 1e6) + 0.5)
            ua += y * 1_000_000 - mu
            ub += t * (y * 1_000_000 - mu)
            iaa += mu
            iab += t * mu
            ibb += t * t * mu
        det = iaa * float(ibb) - float(iab) * iab
        da = (float(ibb) * ua - float(iab) * ub) / det
        db = (float(iaa) * ub - float(iab) * ua) / det
        am = math.floor(am + da + 0.5)
        bm = math.floor(bm + db + 0.5)
    ty = tmu = tdv = tpx = 0
    for t, y in pts:
        mu = math.floor(1e6 * math.exp((am + bm * t) / 1e6) + 0.5)
        ty += y
        tmu += mu
        if y > 0:
            tdv += math.floor(1e9 * y * math.log(y * 1e6 / mu) + 0.5)
        tpx += math.floor(1e9 * (y - mu / 1e6) ** 2 / (mu / 1e6) + 0.5)
    dev = 2.0 * (tdv / 1e9 - (ty - tmu / 1e6))
    out = q_poisson_irls_trend(spark, SF).collect()[0]
    assert (out.n_days, out.a_micro, out.b_micro) == (n, am, bm)
    assert out.deviance_milli == math.floor(1e3 * dev + 0.5)
    assert out.pearson_milli == math.floor(1e3 * tpx / 1e9 + 0.5)


def test_logistic_irls_matches_reference(spark):
    rows = _events(spark)
    cells = defaultdict(lambda: [0, 0])
    for r in rows:
        vc = math.floor(r.value * 100.0 + 0.5)
        cells[vc][0] += 1
        cells[vc][1] += 1 if r.event_type == "purchase" else 0
    n = sum(v[0] for v in cells.values())
    npos = sum(v[1] for v in cells.values())
    am = math.floor(1e6 * math.log(npos / (n - npos)) + 0.5)
    bqm = 0
    for _ in range(_IRLS_STEPS):
        ua = ubc = iaa = iabc = ibbc = 0
        for vc, (nc, yc) in cells.items():
            z = (am + bqm * vc / 100.0) / 1e6
            pm = math.floor(1e6 / (1.0 + math.exp(-z)) + 0.5)
            u = yc * 1_000_000 - nc * pm
            w = math.floor(nc * float(pm) * (1e6 - pm) / 1e6 + 0.5)
            ua += u
            ubc += vc * u
            iaa += w
            iabc += vc * w
            ibbc += vc * vc * w
        det = iaa * (ibbc / 1e4) - (iabc / 1e2) * (iabc / 1e2)
        da = ((ibbc / 1e4) * ua - (iabc / 1e2) * (ubc / 1e2)) / det
        db = (iaa * (ubc / 1e2) - (iabc / 1e2) * ua) / det
        am = math.floor(am + da + 0.5)
        bqm = math.floor(bqm + db + 0.5)
    out = q_logistic_irls_value(spark, SF).collect()[0]
    assert (out.n, out.n_pos, out.a_micro) == (n, npos, am)
    assert out.b_milli == math.floor(bqm / 1e3 + 0.5)


def _user_means(rows):
    acc = defaultdict(lambda: [0, 0, 0])
    for r in rows:
        y = math.floor(r.value * 1e6 + 0.5)
        h = (r.t_us // HOUR_US) % 24
        a = acc[r.user_id]
        a[0] += y
        a[1] += h
        a[2] += 1
    return {
        u: (math.floor(sy / c + 0.5), math.floor(1e6 * sh / c + 0.5))
        for u, (sy, sh, c) in acc.items()
    }


def test_between_estimator_matches_reference(spark):
    rows = _events(spark)
    means = _user_means(rows)
    k = len(means)
    sx = sum(x for _, x in means.values())
    sxx = sum(x * x for _, x in means.values())
    sy = sum(y for y, _ in means.values())
    sxy = sum(x * y for y, x in means.values())
    syy = sum(y * y for y, _ in means.values())
    cxx = k * sxx - sx * sx
    cxy = k * sxy - sx * sy
    cyy = k * syy - sy * sy
    b = cxy / cxx * 1e6
    sse = (cyy - cxy * cxy / cxx) / k
    se = math.sqrt(sse / (k - 2) / (cxx / k)) * 1e6
    out = q_between_estimator_panel(spark, SF).collect()[0]
    assert out.k_users == k
    assert out.b_micro_per_hour == math.floor(b + 0.5)
    assert out.se_micro == math.floor(se + 0.5)
    assert out.t_milli == math.floor(1e3 * b / se + 0.5)


def test_first_difference_matches_reference(spark):
    rows = _events(spark)
    cell = defaultdict(lambda: [0, 0, 0])
    for r in rows:
        y = math.floor(r.value * 1e6 + 0.5)
        h = (r.t_us // HOUR_US) % 24
        c = cell[(r.user_id, r.t_us // DAY_US)]
        c[0] += y
        c[1] += h
        c[2] += 1
    snapped = {
        k: (math.floor(sy / c + 0.5), math.floor(1e6 * sh / c + 0.5))
        for k, (sy, sh, c) in cell.items()
    }
    by_user = defaultdict(list)
    for (u, d), (ym, xm) in snapped.items():
        by_user[u].append((d, ym, xm))
    np_ = sxx = sxy = syy = 0
    for u, pts in by_user.items():
        pts.sort()
        for i in range(1, len(pts)):
            dy = pts[i][1] - pts[i - 1][1]
            dx = pts[i][2] - pts[i - 1][2]
            np_ += 1
            sxx += dx * dx
            sxy += dx * dy
            syy += dy * dy
    b = sxy / sxx * 1e6
    sse = syy - sxy * sxy / sxx
    se = math.sqrt(sse / (np_ - 1) / sxx) * 1e6
    out = q_first_difference_estimator(spark, SF).collect()[0]
    assert out.n_pairs == np_
    assert out.b_micro_per_hour == math.floor(b + 0.5)
    assert out.se_micro == math.floor(se + 0.5)
