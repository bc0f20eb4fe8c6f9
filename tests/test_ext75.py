"""Wave 76: Fellegi-Sunter linkage, item-item CF, DiD estimator."""

import collections

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
)
from etl_poor_main_pipeline_spark.registry_ext75 import (
    _CF_MIN_CO,
    _CF_TOPK,
    _FS_LLR_MATCH,
    _FS_LLR_NONMATCH,
    q_difference_in_differences,
    q_fellegi_sunter_linkage,
    q_itemcf_cosine_topk,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_fs_decision_table_separates_matches(spark):
    rows = q_fellegi_sunter_linkage(spark, SF).collect()
    assert 1 < len(rows) <= 8  # at most 2^3 agreement patterns
    # LLR orders purity: full-agreement pattern is purest and classified match
    top, bottom = rows[0], rows[-1]
    assert top.ag_bal and top.ag_seg and top.ag_name
    assert top.decision == "match"
    assert top.llr_micro >= _FS_LLR_MATCH * 1e6
    assert bottom.llr_micro <= _FS_LLR_NONMATCH * 1e6
    assert bottom.decision == "non_match"
    # purity (n_true / n_pairs) decreases with LLR rank
    purities = [r.n_true / r.n_pairs for r in rows]
    assert purities[0] > 0.5
    assert purities[-1] < 0.01
    for r in rows:
        assert r.decision in ("match", "possible", "non_match")


def test_itemcf_topk_shape_and_symmetric_counts(spark):
    rows = q_itemcf_cosine_topk(spark, SF).collect()
    assert rows
    per_item = collections.defaultdict(list)
    for r in rows:
        per_item[r.pa].append(r)
        assert r.co >= _CF_MIN_CO
        assert r.pa != r.pb
        assert 0 < r.cos_micro <= 1_000_000
    li = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets = collections.defaultdict(set)
    for x in li:
        baskets[x.l_orderkey].add(x.l_partkey)
    co = collections.Counter()
    for items in baskets.values():
        s = sorted(items)
        for i, pa in enumerate(s):
            for pb in s[i + 1 :]:
                co[(pa, pb)] += 1
    for pa, lst in per_item.items():
        lst = sorted(lst, key=lambda r: r.rk)
        assert [r.rk for r in lst] == list(range(1, len(lst) + 1))
        assert len(lst) <= _CF_TOPK
        for r in lst:
            assert co[(min(r.pa, r.pb), max(r.pa, r.pb))] == r.co


def test_did_cells_partition_event_count(spark):
    row = q_difference_in_differences(spark, SF).collect()[0]
    total = load_table(spark, SF, "events").count()
    assert row.n_c_pre + row.n_c_post + row.n_t_pre + row.n_t_post == total
    assert row.se_micro > 0
    # t = did / se at micro scale
    approx_t = row.did_micro / row.se_micro * 1e6
    assert abs(approx_t - row.t_stat_micro) < 5e3  # rounding slack


def test_wave76_plans_are_scale_safe(spark):
    for fn in (
        q_fellegi_sunter_linkage,
        q_itemcf_cosine_topk,
        q_difference_in_differences,
    ):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
