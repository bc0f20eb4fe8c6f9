"""Operator registry, wave 16: exact distinct counting via bitmap
aggregation (the mergeable two-level pattern) and the conditional
aggregate family (count_if / bool_or / bool_and, SQL FILTER semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import QuerySpec, _t


def q_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] §2.6 agg: EXACT distinct counts via bitmap aggregation —
    ``groupBy(key, bitmap_bucket_number(v))`` builds one fixed-size (4KB)
    bitmap per bucket with ``bitmap_construct_agg(bitmap_bit_position(v))``,
    then ``sum(bitmap_count(...))`` folds buckets per key. Unlike
    COUNT(DISTINCT), the partial state is mergeable and bounded: partial
    bitmaps combine map-side and re-merge across shuffles/increments
    (OR-able), which is what makes exact distinct viable at 100 TB and in
    incremental/rollup pipelines — HLL trades exactness for smaller
    state; bitmaps keep exactness for dense integer domains. The oracle
    is plain COUNT(DISTINCT): the bitmap path must be value-identical."""
    li = _t(spark, sf_dir, "lineitem")
    inner = li.groupBy(
        "l_returnflag", F.bitmap_bucket_number(F.col("l_partkey")).alias("bkt")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position(F.col("l_partkey"))).alias("bm"))
    return inner.groupBy("l_returnflag").agg(
        F.sum(F.bitmap_count("bm")).cast("bigint").alias("n_distinct_parts")
    )


_ORACLE_BITMAP_DISTINCT = """
SELECT l_returnflag, cast(count(DISTINCT l_partkey) AS bigint) AS n_distinct_parts
FROM lineitem GROUP BY l_returnflag
"""


def q_conditional_agg_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] §2.6 agg: conditional aggregates per order priority —
    ``count_if`` (SQL FILTER semantics), ``bool_or``/``bool_and``
    (ANY/EVERY), and a filtered decimal sum. All map straight onto
    partial-aggregable built-ins; no CASE-wrapping is needed for the
    boolean reductions."""
    o = _t(spark, sf_dir, "orders")
    big = F.col("o_totalprice") > 200000
    return o.groupBy("o_orderpriority").agg(
        F.count_if(big).cast("bigint").alias("n_big"),
        F.bool_or(big).alias("any_big"),
        F.bool_and(big).alias("all_big"),
        F.round(
            F.sum(F.when(big, F.col("o_totalprice")).cast("decimal(18,6)")).cast("double"), 2
        ).alias("sum_big"),
    )


_ORACLE_COND_AGG = """
SELECT o_orderpriority,
       cast(count(*) FILTER (WHERE o_totalprice > 200000) AS bigint) AS n_big,
       bool_or(o_totalprice > 200000) AS any_big,
       bool_and(o_totalprice > 200000) AS all_big,
       round(cast(sum(cast(o_totalprice AS decimal(18,6)))
                  FILTER (WHERE o_totalprice > 200000) AS double), 2) AS sum_big
FROM orders GROUP BY o_orderpriority
"""


def q_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X8 per-source contribution cap: keep at most 15 documents
    per source, chosen by a deterministic hash ranking (md5 of doc_id,
    id tiebreak) — the "cap any one domain's share of the corpus"
    curation step, reproducible across runs/engines because the ranking
    is content-addressed, not RNG-sampled. One shuffle on source; the
    window is a per-partition top-N (rank <= cap prunes early under
    WindowGroupLimit). Returns the kept (source, doc_id, rank) set."""
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("source", "doc_id", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= 15)
        .select("source", "doc_id", F.col("rank").cast("bigint").alias("rank"))
    )


_ORACLE_SOURCE_CAP = """
SELECT source, doc_id, cast(rank AS bigint) AS rank FROM (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(cast(doc_id AS varchar)), doc_id) AS rank
  FROM documents
) WHERE rank <= 15
"""


REGISTRY_EXT15: dict[str, QuerySpec] = {
    "bitmap_exact_distinct": QuerySpec(
        q_bitmap_exact_distinct, _ORACLE_BITMAP_DISTINCT, "§2.6 agg bitmap"
    ),
    "conditional_agg_family": QuerySpec(q_conditional_agg_family, _ORACLE_COND_AGG, "§2.6 agg"),
    "per_source_cap": QuerySpec(q_per_source_cap, _ORACLE_SOURCE_CAP, "X8 [EXT]"),
}
