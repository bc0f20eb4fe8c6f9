"""Wave 70: Welch t-test, chi-squared independence, BH-FDR correction."""

import math

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
)
from etl_poor_main_pipeline_spark.registry_ext69 import (
    _BH_ALPHA_MICRO,
    q_chi2_independence,
    q_fdr_bh_correction,
    q_welch_t_test,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_welch_matches_direct_computation(spark):
    row = q_welch_t_test(spark, SF).collect()[0]
    vals = {
        s: [
            math.floor(100.0 * r.o_totalprice + 0.5)
            for r in load_table(spark, SF, "orders")
            .where(f"o_orderstatus = '{s}'")
            .collect()
        ]
        for s in ("F", "O")
    }
    n1, n2 = len(vals["F"]), len(vals["O"])
    assert (row.n1, row.n2) == (n1, n2)
    m1, m2 = sum(vals["F"]) / n1, sum(vals["O"]) / n2
    v1 = sum((x - m1) ** 2 for x in vals["F"]) / (n1 - 1)
    v2 = sum((x - m2) ** 2 for x in vals["O"]) / (n2 - 1)
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / math.sqrt(se2)
    assert abs(row.t_micro / 1e6 - t) < 1e-3
    df = se2 * se2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1))
    assert abs(row.df_milli / 1e3 - df) < 0.1
    # Welch df is bounded by min(n1,n2)-1 below and n1+n2-2 above
    assert min(n1, n2) - 1 <= row.df_milli / 1e3 <= n1 + n2 - 2


def test_chi2_statistic_and_effect_size(spark):
    row = q_chi2_independence(spark, SF).collect()[0]
    docs = load_table(spark, SF, "documents").select("lang", "source").collect()
    from collections import Counter

    cells = Counter((r.lang, r.source) for r in docs)
    rows = Counter(r.lang for r in docs)
    cols = Counter(r.source for r in docs)
    n = len(docs)
    chi2 = sum(
        (o - rows[l] * cols[s] / n) ** 2 / (rows[l] * cols[s] / n)
        for (l, s), o in cells.items()
    )
    assert row.n == n
    assert row.dof == (len(rows) - 1) * (len(cols) - 1)
    assert abs(row.chi2_micro / 1e6 - chi2) < 1e-3
    v = math.sqrt(chi2 / (n * min(len(rows) - 1, len(cols) - 1)))
    assert abs(row.cramers_v_micro / 1e6 - v) < 1e-3
    assert 0 <= row.cramers_v_micro <= 1_000_000


def test_bh_rejection_set_is_a_prefix_and_valid(spark):
    rows = sorted(q_fdr_bh_correction(spark, SF).collect(), key=lambda r: r.rk)
    assert rows
    m = len(rows)
    ps = [r.p_micro for r in rows]
    assert ps == sorted(ps)  # ranked ascending by p
    assert [r.rk for r in rows] == list(range(1, m + 1))
    for r in rows:
        assert 0 <= r.p_micro <= 1_000_000
        assert r.bh_cut_micro == math.floor(_BH_ALPHA_MICRO * r.rk / m)
    # BH rejection set is exactly ranks 1..k_max
    k_max = max((r.rk for r in rows if r.p_micro <= r.bh_cut_micro), default=0)
    for r in rows:
        assert r.rejected == (r.rk <= k_max)


def test_wave70_plans_are_scale_safe(spark):
    for fn in (q_welch_t_test, q_chi2_independence, q_fdr_bh_correction):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
