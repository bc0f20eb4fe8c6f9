"""Wave 81: exact rank statistics via value-cell reduction."""

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
    unbounded_nested_loop_joins,
)
from etl_poor_main_pipeline_spark.registry_ext80 import (
    q_kendall_tau_exact_cells,
    q_somers_d_cells,
    q_spearman_rho_exact,
)

SF = "/root/testdata/sf0.001"


def test_tau_pair_accounting_identity(spark):
    """C + D + ties_x + ties_y - ties_xy == n_pairs (every unordered pair
    lands in exactly one bucket; x-ties and y-ties both include the joint
    ties once)."""
    for r in q_kendall_tau_exact_cells(spark, SF).collect():
        assert (
            r.concordant + r.discordant + r.ties_x + r.ties_y - r.ties_xy
            == r.n_pairs
        ), r
        assert r.n_pairs == r.n_docs * (r.n_docs - 1) // 2
        assert -1_000_000 <= r.tau_b_micro <= 1_000_000


def test_measures_agree_in_sign_and_bounds(spark):
    taus = {r.lang: r for r in q_kendall_tau_exact_cells(spark, SF).collect()}
    soms = {r.lang: r for r in q_somers_d_cells(spark, SF).collect()}
    rhos = {r.lang: r for r in q_spearman_rho_exact(spark, SF).collect()}
    assert set(taus) == set(soms) == set(rhos)
    for lang, t in taus.items():
        s, rho = soms[lang], rhos[lang]
        assert (s.concordant, s.discordant) == (t.concordant, t.discordant)
        assert -1_000_000 <= s.gamma_micro <= 1_000_000
        assert -1_000_000 <= s.somers_d_yx_micro <= 1_000_000
        assert -1_000_000 <= rho.rho_micro <= 1_000_000
        # n_chars and token count are strongly positively related on this
        # corpus: every measure should agree on a clearly positive sign
        assert t.tau_b_micro > 0 and rho.rho_micro > 0 and s.gamma_micro > 0
        # |gamma| >= |tau_b| always (gamma drops ties from the denominator)
        assert abs(s.gamma_micro) >= abs(t.tau_b_micro) - 1


def test_wave81_plans_are_scale_safe(spark):
    for fn in (q_kendall_tau_exact_cells, q_somers_d_cells, q_spearman_rho_exact):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
        assert not unbounded_nested_loop_joins(df)
