"""Wave 69: MMR re-rank, business days, dedup evidence tokens."""

from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
)
from etl_poor_main_pipeline_spark.registry_ext68 import (
    _BIZ_DAYS,
    _EVID_TOP,
    _MMR_K,
    q_business_day_deadline,
    q_dedup_evidence_tokens,
    q_mmr_rerank,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_mmr_distinct_picks_and_first_is_top_rel(spark):
    rows = sorted(q_mmr_rerank(spark, SF).collect(), key=lambda r: r.rank)
    assert len(rows) == _MMR_K
    assert len({r.vec_id for r in rows}) == _MMR_K
    # rank 1 is the pure-relevance argmax (no penalty yet)
    scores = [r.mmr_score_micro for r in rows]
    assert scores[0] == max(scores)


def test_business_days_spans_valid(spark):
    rows = q_business_day_deadline(spark, SF).collect()
    orders = load_table(spark, SF, "orders").count()
    assert sum(r.n_orders for r in rows) == orders
    for r in rows:
        # 7 business days span 9-11 calendar days depending on start dow
        assert 9 <= r.cal_days <= _BIZ_DAYS + 4
        assert 0 <= r.dow0 <= 6
    # each weekday start maps to exactly one span
    assert len({r.dow0 for r in rows}) == len(rows)


def test_evidence_tokens_are_truly_shared_and_rare_first(spark):
    rows = q_dedup_evidence_tokens(spark, SF).collect()
    assert rows
    by_pair = {}
    for r in rows:
        by_pair.setdefault((r.id_a, r.id_b), []).append(r)
    texts = {
        r.doc_id: set(r.ts)
        for r in load_table(spark, SF, "documents")
        .select(
            "doc_id",
            F.expr(
                "array_distinct(filter(split(lower(text), '\\\\s+'), t -> t <> ''))"
            ).alias("ts"),
        )
        .collect()
    }
    for (a, b), rs in by_pair.items():
        assert len(rs) <= _EVID_TOP
        rs = sorted(rs, key=lambda r: r.rk)
        dfs = [r.df for r in rs]
        assert dfs == sorted(dfs)  # rarest first
        for r in rs:
            assert r.w in texts[a] and r.w in texts[b]


def test_wave69_plans_are_scale_safe(spark):
    for fn in (q_business_day_deadline, q_dedup_evidence_tokens):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
