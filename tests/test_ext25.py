"""Wave 26: cohort retention, association rules, TWAP, Benford DQ."""

from etl_poor_main_pipeline_spark.registry_ext25 import (
    q_assoc_rules_lift,
    q_benford_digit_check,
    q_cohort_retention,
    q_time_weighted_avg,
)
from etl_poor_main_pipeline_spark.sources.read import read_events

SF = "/root/testdata/sf0.001"


def test_retention_triangle_shape(spark):
    rows = q_cohort_retention(spark, SF).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = r.n_active
    n_users = read_events(spark, SF).select("user_id").distinct().count()
    for offsets in by_cohort.values():
        assert 0 in offsets  # every cohort is active in its own week
        # no later week can exceed the cohort's own size
        assert all(n <= offsets[0] for n in offsets.values())
    assert sum(o[0] for o in by_cohort.values()) == n_users  # cohorts partition users


def test_assoc_rules_bounds(spark):
    rows = q_assoc_rules_lift(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r.confidence_micro <= 1_000_000  # confidence is a probability
        assert r.lift_micro > 0
        assert r.n_ab >= 5
    # rules come in both directions with equal pair support
    sup = {(r.item_a, r.item_b): r.n_ab for r in rows}
    for (a, b), n in sup.items():
        assert sup.get((b, a)) == n


def test_twap_lies_within_value_envelope(spark):
    rows = q_time_weighted_avg(spark, SF).collect()
    assert rows
    import pyspark.sql.functions as F

    env = {
        r.user_id: (r.lo, r.hi)
        for r in read_events(spark, SF)
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in rows:
        lo, hi = env[r.user_id]
        # a weighted average cannot leave the min/max envelope
        assert lo * 1e6 - 1 <= r.twap_micro <= hi * 1e6 + 1
        assert r.total_us > 0


def test_benford_shares_sum_to_one(spark):
    rows = q_benford_digit_check(spark, SF).collect()
    assert 1 <= len(rows) <= 9
    assert abs(sum(r.observed_micro for r in rows) - 1_000_000) < len(rows) + 1
    # expected curve is monotonically decreasing in the digit
    exp = [r.expected_micro for r in sorted(rows, key=lambda r: r.digit)]
    assert exp == sorted(exp, reverse=True)
