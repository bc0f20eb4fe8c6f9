"""Wave-4 operator semantics the oracle compare can't pin down."""

from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.registry_ext3 import (
    q_histogram_bins,
    q_rolling_hash_fingerprint,
    q_sample_deterministic,
    q_try_cast_null_safe,
)

SF = "/root/testdata/sf0.001"


def _py_rolling_hash(text: str) -> int:
    h = 0
    for ch in text:
        h = (h * 31 + ord(ch)) % 1_000_000_007
    return h


def test_rolling_hash_matches_python(spark):
    rows = q_rolling_hash_fingerprint(spark, SF).limit(20).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    assert rows
    for r in rows:
        assert r.fingerprint == _py_rolling_hash(docs[r.doc_id])


def test_histogram_bins_partition_rows(spark):
    out = q_histogram_bins(spark, SF).collect()
    total = sum(r.n for r in out)
    n_rows = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    assert total == n_rows
    assert all(0 <= r.bin <= 9 for r in out)


def test_try_cast_never_throws(spark):
    out = q_try_cast_null_safe(spark, SF)
    bad = out.filter(~F.col("seg_is_null")).count()
    assert bad == 0  # every non-numeric cast degraded to NULL, no error
    assert out.filter(F.col("name_num").isNotNull()).count() == out.count()


def test_sample_fraction_close(spark):
    n_sampled = q_sample_deterministic(spark, SF).collect()[0].n_sampled
    n_rows = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    frac = n_sampled / n_rows
    # md5-prefix < '10' keeps 1/16 of key-space; orders have ~4 lines each
    assert 0.03 < frac < 0.10


def test_approx_percentile_rank_contract(spark):
    """The query now grades the GK sketch's rank guarantee in-band: every
    (group, q) row must report rank_ok=True, and groups x 3 quantiles."""
    from etl_poor_main_pipeline_spark.registry_ext5 import q_approx_percentile

    rows = q_approx_percentile(spark, SF).collect()
    assert len(rows) == 9  # 3 return flags x 3 quantiles
    assert all(r.rank_ok for r in rows)
    assert {r.q for r in rows} == {0.5, 0.9, 0.99}
