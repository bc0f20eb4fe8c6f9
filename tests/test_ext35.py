"""Wave 36: URL canonicalization, tokenizer fertility, percentile
bands, contrastive margins, weighted medians."""

from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
)
from etl_poor_main_pipeline_spark.registry_ext35 import (
    q_bpe_fertility_by_lang,
    q_contrastive_margin_stats,
    q_daily_percentile_bands,
    q_grouped_weighted_median,
    q_url_canonicalize_dedup,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_url_canon_collapses_tracking_params(spark):
    rows = q_url_canonicalize_dedup(spark, SF).collect()
    assert rows  # doc_id mod-arithmetic guarantees collisions
    for r in rows[:20]:
        assert r.n_raw_urls >= 2
        assert "utm_" not in r.canonical_url
        assert "ref=" not in r.canonical_url
        assert "www." not in r.canonical_url
        assert r.canonical_url == r.canonical_url.lower()
        assert r.min_doc < r.max_doc


def test_fertility_bounds(spark):
    rows = q_bpe_fertility_by_lang(spark, SF).collect()
    assert rows
    for r in rows:
        # merges only ever REDUCE symbol count; >= 1 symbol per word
        assert r.n_words <= r.n_symbols
        assert 1_000_000 <= r.fertility_ppm


def test_percentile_bands_ordered(spark):
    rows = q_daily_percentile_bands(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.p50 <= r.p95 <= r.p99


def test_contrastive_margins_cover_all_vectors(spark):
    rows = q_contrastive_margin_stats(spark, SF).collect()
    assert rows
    n_vecs = load_table(spark, SF, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == n_vecs
    for r in rows:
        assert 0 <= r.n_violations <= r.n_vecs


def test_weighted_median_matches_brute_force(spark):
    rows = {
        r.l_returnflag: r.wmedian_cents
        for r in q_grouped_weighted_median(spark, SF).collect()
    }
    li = (
        load_table(spark, SF, "lineitem")
        .select(
            "l_returnflag",
            F.floor(F.lit(100.0) * F.col("l_extendedprice") + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
            F.col("l_quantity").cast("bigint").alias("w"),
        )
        .collect()
    )
    by_flag: dict[str, list[tuple[int, int]]] = {}
    for r in li:
        by_flag.setdefault(r.l_returnflag, []).append((r.cents, r.w))
    for flag, pairs in by_flag.items():
        pairs.sort()
        total = sum(w for _, w in pairs)
        half = -(-total // 2)  # ceil
        cum = 0
        for cents, w in pairs:
            cum += w
            if cum >= half:
                assert rows[flag] == cents, flag
                break


def test_wave36_plans_are_scale_safe(spark):
    for fn in (
        q_url_canonicalize_dedup,
        q_bpe_fertility_by_lang,
        q_daily_percentile_bands,
        q_contrastive_margin_stats,
        q_grouped_weighted_median,
    ):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
