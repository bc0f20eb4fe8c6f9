"""Operator registry, wave 6: the hard correlated-subquery TPC-H shapes
(Q16/Q21/Q22 adapted to the fixture's column set), map explosion, and the
approximate-percentile surface. Same conventions as registry.py.

The Q16/Q21/Q22 adaptations keep each query's *plan challenge* — NOT IN
decorrelation, double EXISTS/NOT EXISTS against the same fact table,
scalar-subquery threshold + anti join — while substituting columns the
TPC-H-ish fixture actually has (no partsupp/phone/comment columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import QuerySpec, _t


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        _t(spark, sf_dir, n).createOrReplaceTempView(f"ext5_{n}")


def q_tpch_q16_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute combo,
    excluding suppliers matched by a NOT IN subquery (Catalyst plans the
    NOT IN as a null-aware anti join)."""
    _views(spark, sf_dir, "lineitem", "part", "supplier")
    return spark.sql(
        """
        SELECT p_brand, p_type, p_size,
               cast(count(DISTINCT l_suppkey) as bigint) AS supplier_cnt
        FROM ext5_lineitem JOIN ext5_part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM ext5_supplier WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
        LIMIT 50
        """
    )


_ORACLE_Q16 = """
SELECT p_brand, p_type, p_size,
       cast(count(DISTINCT l_suppkey) as bigint) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
LIMIT 50
"""


def q_tpch_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the *sole* late shipper on
    finished multi-supplier orders — EXISTS plus NOT EXISTS correlated
    against the same fact table ("late" = shipped >90 days after the
    order date, the fixture's only date pair)."""
    _views(spark, sf_dir, "lineitem", "orders", "supplier")
    return spark.sql(
        """
        SELECT s_name, cast(count(*) as bigint) AS numwait
        FROM ext5_supplier, ext5_lineitem l1, ext5_orders
        WHERE s_suppkey = l1.l_suppkey
          AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
          AND EXISTS (
            SELECT 1 FROM ext5_lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM ext5_lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 20
        """
    )


_ORACLE_Q21 = """
SELECT s_name, cast(count(*) as bigint) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""


def q_tpch_q22_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy-but-inactive customers — scalar-subquery
    threshold (average positive balance) + NOT EXISTS anti join (no order
    since 2000 — the fixture's stand-in for Q22's no-orders-at-all, which
    would be vacuous here), grouped
    by market segment (the fixture's stand-in for Q22's country code)."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_mktsegment,
               cast(count(*) as bigint) AS numcust,
               round(cast(sum(cast(c_acctbal as decimal(18,6))) as double), 2) AS totacctbal
        FROM ext5_customer c
        WHERE c_acctbal > (
            SELECT avg(c_acctbal) FROM ext5_customer WHERE c_acctbal > 0.0
          )
          AND NOT EXISTS (
            SELECT 1 FROM ext5_orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2000-01-01'
          )
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment ASC
        """
    )


_ORACLE_Q22 = """
SELECT c_mktsegment,
       cast(count(*) as bigint) AS numcust,
       round(cast(sum(cast(c_acctbal as decimal(18,6))) as double), 2) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment ASC
"""


def q_explode_map_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map explosion: a per-row map<string,double> unpivoted to
    (key, value) rows via explode — the MapType counterpart of unpivot."""
    li = _t(spark, sf_dir, "lineitem")
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity"), F.lit("disc"), F.col("l_discount")
    )
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
        F.explode(m).alias("metric", "val"),
    )


_ORACLE_EXPLODE_MAP = """
SELECT l_orderkey, cast(l_linenumber as bigint) AS l_linenumber,
       'qty' AS metric, l_quantity AS val
FROM lineitem
UNION ALL
SELECT l_orderkey, cast(l_linenumber as bigint), 'disc', l_discount
FROM lineitem
"""


def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (GK sketch) under an accuracy-contract
    oracle.

    The sketch returns an actual element per quantile whose *rank* is
    within n/accuracy of the target rank — that rank guarantee is the
    contract, and it's what the graded output asserts: for each
    (group, q), ``rank_ok`` = target rank lies within
    [count(< v) - tol, count(<= v) + tol], tol = n/1000 + 1. The oracle
    pins the group's exact row count and asserts TRUE. The sketch value
    itself can't hash-match across engines (merge-order dependent), but
    the guarantee is deterministic for fixed data."""
    li = _t(spark, sf_dir, "lineitem")
    approx = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 1000).alias("_pcts")
    )
    qlits = F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
    qs = approx.select(
        "l_returnflag", F.posexplode(F.col("_pcts")).alias("_i", "v")
    ).select(
        "l_returnflag", F.element_at(qlits, F.col("_i") + 1).alias("q"), "v"
    )
    ranks = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
    lt = (
        li.join(qs, "l_returnflag")
        .groupBy("l_returnflag", "q", "v")
        .agg(
            F.sum((F.col("l_extendedprice") < F.col("v")).cast("bigint")).alias("n_lt"),
            F.sum((F.col("l_extendedprice") <= F.col("v")).cast("bigint")).alias("n_le"),
        )
    )
    tol = F.col("n") / 1000.0 + 1.0
    target = F.col("q") * F.col("n")
    return (
        lt.join(ranks, "l_returnflag")
        .select(
            "l_returnflag",
            "q",
            F.col("n").cast("bigint").alias("n"),
            ((F.col("n_lt") - tol <= target) & (target <= F.col("n_le") + tol)).alias(
                "rank_ok"
            ),
        )
    )


_ORACLE_APPROX_PCT = """
SELECT l_returnflag, q, count(*) AS n, TRUE AS rank_ok
FROM lineitem CROSS JOIN (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q)
GROUP BY l_returnflag, q
"""


REGISTRY_EXT5: dict[str, QuerySpec] = {
    "tpch_q16_shape": QuerySpec(q_tpch_q16_shape, _ORACLE_Q16, "§2.6 subquery"),
    "tpch_q21_shape": QuerySpec(q_tpch_q21_shape, _ORACLE_Q21, "§2.6 subquery"),
    "tpch_q22_shape": QuerySpec(q_tpch_q22_shape, _ORACLE_Q22, "§2.6 subquery"),
    "explode_map_entries": QuerySpec(q_explode_map_entries, _ORACLE_EXPLODE_MAP, "§2.6 scalar"),
    "approx_percentile_sketch": QuerySpec(
        q_approx_percentile, _ORACLE_APPROX_PCT, "§2.6 agg approx, accuracy-contract oracle"
    ),
}
