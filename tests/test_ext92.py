"""Wave 93: IPS/SNIPS off-policy eval, runs-test shuffle audit, entropy rate."""

import math

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
    unbounded_nested_loop_joins,
)
from etl_poor_main_pipeline_spark.registry_ext92 import (
    q_ips_snips_offline_eval,
    q_markov_entropy_rate,
    q_runs_test_shuffle_audit,
)

SF = "/root/testdata/sf0.001"


def test_ips_snips_estimates(spark):
    r = q_ips_snips_offline_eval(spark, SF).collect()[0]
    assert r.n_logged > 0
    assert r.direct_milli > 0 and r.ips_milli > 0 and r.snips_milli > 0
    # SNIPS divides by sum(w); with frequency-derived propensities the
    # weights average to ~k/k = 1 over the log, so SNIPS stays within a
    # factor of the IPS estimate (a sanity band, not an identity)
    assert 0.5 < r.snips_milli / r.ips_milli < 2.0


def test_runs_test_on_md5_shuffle_is_unbiased(spark):
    r = q_runs_test_shuffle_audit(spark, SF).collect()[0]
    assert r.n > 0
    assert 1 <= r.runs <= r.n
    # the md5 order IS a good shuffle: the runs z-statistic must not
    # scream clustering (|z| < 4 even at small n)
    assert abs(r.z_micro) < 4_000_000


def test_entropy_rate_bounds(spark):
    r = q_markov_entropy_rate(spark, SF).collect()[0]
    # entropy rate of a K-state chain lies in [0, ln K]; the corpus has
    # a handful of event types, so ln(8) is a generous ceiling
    assert 0 <= r.entropy_rate_micro <= int(math.log(8) * 1e6)
    assert 0 <= r.empirical_cond_entropy_micro <= int(math.log(8) * 1e6)
    # stationary-weighted and empirical-weighted entropies agree loosely
    # (both weightings are near the chain's visit frequencies)
    assert abs(r.entropy_rate_micro - r.empirical_cond_entropy_micro) < 500_000


def test_wave92_plans_are_bounded(spark):
    for q in (
        q_ips_snips_offline_eval,
        q_runs_test_shuffle_audit,
        q_markov_entropy_rate,
    ):
        df = q(spark, SF)
        assert_no_global_window(df)
        assert_no_python_udf(df)
        assert not unbounded_nested_loop_joins(df)
