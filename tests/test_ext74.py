"""Wave 75: grid-DBSCAN, FIFO lot matching, trimmed means."""

import collections

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
)
from etl_poor_main_pipeline_spark.registry_ext74 import (
    _DB_MINPTS,
    _FIFO_IN,
    _FIFO_OUT,
    q_dbscan_grid_clustering,
    q_fifo_lot_matching,
    q_trimmed_mean_robust,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_dbscan_core_cells_clustered_sparse_noise(spark):
    rows = q_dbscan_grid_clustering(spark, SF).collect()
    n = load_table(spark, SF, "embeddings").count()
    assert len(rows) == n
    by_cell = collections.Counter((r.cx, r.cy) for r in rows)
    clusters = collections.defaultdict(set)
    for r in rows:
        if by_cell[(r.cx, r.cy)] >= _DB_MINPTS:
            # dense cells must be clustered (non-noise)
            assert r.cluster != -1
            clusters[r.cluster].add((r.cx, r.cy))
        else:
            assert r.cluster == -1
    assert clusters  # at least one dense region exists
    # points in the same cell always share a cluster id
    cell_lbl = {}
    for r in rows:
        key = (r.cx, r.cy)
        assert cell_lbl.setdefault(key, r.cluster) == r.cluster


def test_fifo_conservation_and_fifo_order(spark):
    rows = q_fifo_lot_matching(spark, SF).collect()
    assert rows
    ev = (
        load_table(spark, SF, "events")
        .selectExpr(
            "user_id", "event_id", "event_type",
            "cast(floor(1e6 * value + 0.5) as bigint) as qty",
        )
        .where(f"event_type in ('{_FIFO_IN}', '{_FIFO_OUT}')")
        .collect()
    )
    bought = collections.Counter()
    used = collections.Counter()
    for e in ev:
        (bought if e.event_type == _FIFO_IN else used)[e.user_id] += e.qty
    matched = collections.Counter()
    per_buy = collections.Counter()
    for r in rows:
        assert r.matched_micro > 0
        matched[r.user_id] += r.matched_micro
        per_buy[(r.user_id, r.buy_id)] += r.matched_micro
    buy_qty = {
        (e.user_id, e.event_id): e.qty for e in ev if e.event_type == _FIFO_IN
    }
    # total matched per user = min(bought, used); no lot over-allocated
    for uid in set(bought) | set(used):
        assert matched[uid] == min(bought[uid], used[uid])
    for key, m in per_buy.items():
        assert m <= buy_qty[key]


def test_trimmed_mean_within_range_and_kept_counts(spark):
    rows = q_trimmed_mean_robust(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.kept == r.n - 2 * (r.n * 10 // 100)
        # trimming a right-skewed positive metric pulls the mean down or flat
        assert r.trimmed_mean_micro <= r.raw_mean_micro + 1
        assert r.shift_micro == r.trimmed_mean_micro - r.raw_mean_micro or abs(
            r.shift_micro - (r.trimmed_mean_micro - r.raw_mean_micro)
        ) <= 1  # independent floors differ at most 1 ulp-of-floor


def test_wave75_plans_are_scale_safe(spark):
    for fn in (q_fifo_lot_matching, q_trimmed_mean_robust):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
