"""Operator registry, wave 17: warehouse maintenance surface — MERGE
(upsert) emulation on plain parquet semantics, and the skew-diagnosis
aggregate that informs the salted scale paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import QuerySpec, _dsum, _dsum_sql, _t


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] W1-adjacent MERGE emulation without a table format: updates
    win over base via anti-join + union (the "poor man's MERGE" that
    pairs with the reference's delete-and-insert stance — on a lake this
    lands as dynamic partition overwrite of the touched partitions; with
    Delta/Iceberg it becomes a native MERGE INTO, same logical shape).
    The update batch is derived deterministically from the fixture:
    every o_orderkey % 97 == 0 gets repriced *1.10 and flagged, plus an
    insert set with shifted keys. Output aggregates the merged table so
    the hash check covers exactly the rows each branch contributed."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    updates = o.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * F.lit(1.10)).alias("o_totalprice"),
    )
    inserts = updates.select(
        (F.col("o_orderkey") + F.lit(10_000_000)).alias("o_orderkey"),
        F.lit("I").alias("o_orderstatus"),
        F.col("o_totalprice"),
    )
    merged = (
        o.join(updates.select("o_orderkey"), "o_orderkey", "left_anti")
        .unionByName(updates)
        .unionByName(inserts)
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum(F.col("o_totalprice"), "sum_price"),
    )


_ORACLE_MERGE = f"""
WITH updates AS (
  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 1.10 AS o_totalprice
  FROM orders WHERE o_orderkey % 97 = 0
),
inserts AS (
  SELECT o_orderkey + 10000000 AS o_orderkey, 'I' AS o_orderstatus, o_totalprice
  FROM updates
),
merged AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
  UNION ALL SELECT * FROM updates
  UNION ALL SELECT * FROM inserts
)
SELECT o_orderstatus,
       cast(count(*) AS bigint) AS n_orders,
       {_dsum_sql("o_totalprice", "sum_price")}
FROM merged GROUP BY o_orderstatus
"""


def q_skew_key_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] scale diagnosis: per-join-key cardinality profile of
    lineitem's l_orderkey — key count, max/avg rows per key, and the
    skew ratio that decides whether a join needs salting or AQE skew
    splitting (the measurement behind join_salted_skew). Two-level agg:
    the per-key count shuffles on the key, the profile reduces to one
    row."""
    li = _t(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    return per_key.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("n").cast("bigint").alias("max_rows_per_key"),
        F.round(F.avg("n"), 4).alias("avg_rows_per_key"),
        F.round(F.max("n") / F.avg("n"), 4).alias("skew_ratio"),
    )


_ORACLE_SKEW = """
WITH per_key AS (SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY l_orderkey)
SELECT cast(count(*) AS bigint) AS n_keys,
       cast(max(n) AS bigint) AS max_rows_per_key,
       round(avg(n), 4) AS avg_rows_per_key,
       round(max(n) / avg(n), 4) AS skew_ratio
FROM per_key
"""


def q_scd2_dimension_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] W1-adjacent SCD Type 2: apply a change batch to a dimension
    while PRESERVING history — updated keys close their current row
    (is_current=false, valid_to=batch date) and append a new version;
    untouched keys pass through. The change batch derives
    deterministically from the fixture (every c_custkey % 89 == 0 moves
    to segment 'RESEGMENTED'). Same anti-join/union shape as the MERGE
    emulation plus the version bookkeeping — history tables are how
    slowly-changing dims stay joinable as-of any date at warehouse
    scale."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    changed = c.filter(F.col("c_custkey") % 89 == 0)
    unchanged = c.join(changed.select("c_custkey"), "c_custkey", "left_anti")
    keep = unchanged.select(
        "c_custkey", "c_mktsegment",
        F.lit(1).alias("version"), F.lit(True).alias("is_current"),
        F.lit(None).cast("string").alias("valid_to"),
    )
    closed = changed.select(
        "c_custkey", "c_mktsegment",
        F.lit(1).alias("version"), F.lit(False).alias("is_current"),
        F.lit("2024-02-01").alias("valid_to"),
    )
    opened = changed.select(
        "c_custkey", F.lit("RESEGMENTED").alias("c_mktsegment"),
        F.lit(2).alias("version"), F.lit(True).alias("is_current"),
        F.lit(None).cast("string").alias("valid_to"),
    )
    out = keep.unionByName(closed).unionByName(opened)
    return out.select(
        "c_custkey", "c_mktsegment",
        F.col("version").cast("bigint").alias("version"),
        "is_current", "valid_to",
    )


_ORACLE_SCD2 = """
WITH changed AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 89 = 0)
SELECT c_custkey, c_mktsegment, cast(1 AS bigint) AS version,
       true AS is_current, cast(NULL AS varchar) AS valid_to
FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM changed)
UNION ALL
SELECT c_custkey, c_mktsegment, 1, false, '2024-02-01' FROM changed
UNION ALL
SELECT c_custkey, 'RESEGMENTED', 2, true, cast(NULL AS varchar) FROM changed
"""


REGISTRY_EXT16: dict[str, QuerySpec] = {
    "merge_upsert_emulation": QuerySpec(q_merge_upsert, _ORACLE_MERGE, "W1 [EXT] merge"),
    "skew_key_stats": QuerySpec(q_skew_key_stats, _ORACLE_SKEW, "[EXT] scale diag"),
    "scd2_dimension_update": QuerySpec(q_scd2_dimension_update, _ORACLE_SCD2, "W1 [EXT] scd2"),
}
