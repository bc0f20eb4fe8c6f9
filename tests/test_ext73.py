"""Wave 74: personalized PageRank, label propagation, skip-gram PMI."""

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
)
from etl_poor_main_pipeline_spark.registry_ext73 import (
    _LP_SEED_MOD,
    _PPR_DAMP,
    _PPR_SEED_MOD,
    _SG_MIN_W,
    _SG_TOPK,
    q_label_propagation,
    q_personalized_pagerank,
    q_skipgram_cooccurrence,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_ppr_mass_concentrates_on_seeds(spark):
    rows = q_personalized_pagerank(spark, SF).collect()
    n_docs = load_table(spark, SF, "documents").count()
    assert len(rows) == n_docs
    seeds = [r for r in rows if r.doc_id % _PPR_SEED_MOD == 0]
    others = [r for r in rows if r.doc_id % _PPR_SEED_MOD != 0]
    # every seed holds at least its own teleport share
    teleport_nano = (1.0 - _PPR_DAMP) / len(seeds) * 1e9
    for s in seeds:
        assert s.rank_nano >= int(teleport_nano) - 1
    # non-seeds earn rank only via walks: mean seed rank >> mean other rank
    # (the template-heavy corpus is densely connected, so mass spreads —
    # a 2x separation is the robust invariant)
    assert sum(s.rank_nano for s in seeds) / len(seeds) > 2 * (
        sum(o.rank_nano for o in others) / max(len(others), 1)
    )
    # some mass leaks out of the seed set iff the graph connects it
    assert all(o.rank_nano >= 0 for o in others)


def test_label_prop_seeds_clamped_and_rounds_monotone(spark):
    rows = q_label_propagation(spark, SF).collect()
    docs = {
        r.doc_id: r.source
        for r in load_table(spark, SF, "documents").select("doc_id", "source").collect()
    }
    for r in rows:
        if r.doc_id % _LP_SEED_MOD == 0:
            assert r.lbl == docs[r.doc_id]  # seed label never overwritten
            assert r.round_labeled == 0
        elif r.lbl is not None:
            assert 1 <= r.round_labeled <= 3
        else:
            assert r.round_labeled is None


def test_skipgram_support_and_ordering(spark):
    rows = q_skipgram_cooccurrence(spark, SF).collect()
    assert 0 < len(rows) <= _SG_TOPK
    keys = [(r.pmi_micro, r.w1, r.w2) for r in rows]
    assert keys == sorted(keys, key=lambda t: (-t[0], t[1], t[2]))
    for r in rows:
        assert r.wab >= _SG_MIN_W
        assert r.w1 < r.w2  # normalized pair order, no self-pairs


def test_wave74_plans_are_scale_safe(spark):
    for fn in (q_skipgram_cooccurrence,):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
