"""Wave 73: golden-record survivorship, bad-record quarantine, OOV audit."""

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
)
from etl_poor_main_pipeline_spark.registry_ext72 import (
    _BAD_MOD,
    _GR_FIELDS,
    q_bad_record_quarantine,
    q_golden_record_survivorship,
    q_oov_rate_audit,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_golden_record_latest_nonnull_per_attribute(spark):
    rows = {r.user_id: r for r in q_golden_record_survivorship(spark, SF).collect()}
    ev = (
        load_table(spark, SF, "events")
        .selectExpr(
            "user_id",
            "event_type",
            "unix_micros(ts) as tsu",
            "event_id",
            "cast(get_json_object(props, '$.k') as bigint) as k",
        )
        .collect()
    )
    import collections

    expect = collections.defaultdict(dict)
    for field, (etype, values, mod) in _GR_FIELDS.items():
        best = {}
        for e in ev:
            if e.event_type != etype or e.k is None:
                continue
            key = (e.tsu, e.event_id)
            if e.user_id not in best or key > best[e.user_id][0]:
                best[e.user_id] = (key, values[e.k % mod])
        for uid, (_, val) in best.items():
            expect[uid][field] = val
    for uid, r in rows.items():
        for field in _GR_FIELDS:
            assert getattr(r, field) == expect[uid].get(field)
        assert r.completeness == len(expect[uid])
    # every user with any contributing event appears
    assert set(rows) == {e.user_id for e in ev}


def test_quarantine_counts_exact(spark):
    row = q_bad_record_quarantine(spark, SF).collect()[0]
    orders = load_table(spark, SF, "orders").collect()
    bad = sum(1 for o in orders if o.o_orderkey % _BAD_MOD == 3)
    assert row.total == len(orders)
    assert row.quarantined == bad
    assert row.good == len(orders) - bad
    assert row.good_key_sum == sum(
        o.o_orderkey for o in orders if o.o_orderkey % _BAD_MOD != 3
    )
    assert 1 <= row.good_statuses <= 3


def test_oov_rates_bounded_and_consistent(spark):
    rows = q_oov_rate_audit(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.oov_occ <= r.n_occ
        assert 0 <= r.oov_types <= r.n_types
        # the vocabulary covers frequent tokens, so occurrence-weighted
        # OOV must not exceed type-weighted OOV
        assert r.oov_occ_rate_micro <= r.oov_type_rate_micro


def test_wave73_plans_are_scale_safe(spark):
    for fn in (
        q_golden_record_survivorship,
        q_bad_record_quarantine,
        q_oov_rate_audit,
    ):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
