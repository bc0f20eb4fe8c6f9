"""Operator registry, wave 7: the remaining classic TPC-H shapes adapted
to the fixture's column set (no partsupp table, so Q2/Q9/Q11/Q20 replace
partsupp with lineitem-derived supply facts while keeping each query's
*plan challenge*): Q2 correlated-min supplier selection, Q7 bidirectional
nation-pair volume, Q8 market-share ratio-of-sums, Q9 profit rollup,
Q11 scalar-subquery HAVING threshold, Q13 outer-join two-level agg,
Q15 max-revenue view self-reference, Q17 correlated-avg quantile filter,
Q20 grouped-HAVING semi join. Same conventions as registry.py: bigint
casts on counts/years, decimal-path sums for deterministic double
aggregation (see registry._dsum), total ORDER BY tiebreaks.

All joins here are star-shaped fact->dim: Catalyst broadcasts the dim
sides (nation/region/supplier/part at these SFs; at 100 TB supplier/part
exceed the threshold and AQE picks sort-merge on the sorted bucket —
nothing in the query text pins a strategy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import QuerySpec, _t


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        _t(spark, sf_dir, n).createOrReplaceTempView(f"ext6_{n}")


# Round while still in the decimal domain, THEN cast: rounding after the
# double cast breaks on exact half-way sums (….665 -> engines disagree on
# which double neighbour they round), which 3-decimal amounts hit often.
_DSUM = "cast(round(sum(cast({c} as decimal(18,6))), 2) as double)"


# --------------------------------------------------------------------------
# Q2: min-cost supplier per part (correlated scalar-min subquery).
# partsupp.ps_supplycost -> unit price observed in lineitem
# (l_extendedprice / l_quantity); region-restricted on both the outer
# query and the correlated min, exactly like Q2's EUROPE clamp.

_Q2_BODY = """
SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_type
FROM {p}part
JOIN {p}lineitem ON p_partkey = l_partkey
JOIN {p}supplier ON s_suppkey = l_suppkey
JOIN {p}nation ON s_nationkey = n_nationkey
JOIN {p}region ON n_regionkey = r_regionkey
WHERE p_size = 15 AND p_type = 'LARGE' AND r_name = 'EUROPE'
  AND l_extendedprice / l_quantity = (
    SELECT min(l2.l_extendedprice / l2.l_quantity)
    FROM {p}lineitem l2
    JOIN {p}supplier s2 ON s2.s_suppkey = l2.l_suppkey
    JOIN {p}nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN {p}region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE'
  )
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 100
"""


def q_tpch_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest-supplier-per-part via a correlated
    scalar-min subquery over the same region-clamped join tree; Catalyst
    decorrelates to an aggregate + equi-join on l_partkey. Unit price
    stands in for ps_supplycost (no partsupp in the corpus); IEEE
    division is bit-deterministic so the min-equality match is safe
    cross-engine."""
    _views(spark, sf_dir, "part", "lineitem", "supplier", "nation", "region")
    return spark.sql(_Q2_BODY.format(p="ext6_"))


# --------------------------------------------------------------------------
# Q7: volume shipping between two nations, both directions.

_Q7_BODY = """
SELECT supp_nation, cust_nation, l_year, {dsum} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         cast(year(l_shipdate) as bigint) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM {p}lineitem
  JOIN {p}supplier ON s_suppkey = l_suppkey
  JOIN {p}orders ON o_orderkey = l_orderkey
  JOIN {p}customer ON c_custkey = o_custkey
  JOIN {p}nation n1 ON s_nationkey = n1.n_nationkey
  JOIN {p}nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q_tpch_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bidirectional nation-pair shipping volume by year. The
    nation dimension joins twice under different roles (supplier side /
    customer side) — both broadcast; the disjunctive pair filter prunes
    after the dual join, and the year rollup is a partial-aggregated
    shuffle on three low-cardinality keys."""
    _views(spark, sf_dir, "lineitem", "supplier", "orders", "customer", "nation")
    return spark.sql(_Q7_BODY.format(p="ext6_", dsum=_DSUM.format(c="volume")))


# --------------------------------------------------------------------------
# Q8: national market share inside a region (ratio of conditional sum
# to total sum, both via the deterministic decimal path).

_Q8_BODY = """
SELECT o_year,
       round(
         cast(sum(cast(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END
                       as decimal(18,6))) as double)
         / cast(sum(cast(volume as decimal(18,6))) as double), 6) AS mkt_share
FROM (
  SELECT cast(year(o_orderdate) as bigint) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n1.n_name AS nation
  FROM {p}lineitem
  JOIN {p}part ON p_partkey = l_partkey
  JOIN {p}supplier ON s_suppkey = l_suppkey
  JOIN {p}orders ON o_orderkey = l_orderkey
  JOIN {p}customer ON c_custkey = o_custkey
  JOIN {p}nation n1 ON s_nationkey = n1.n_nationkey
  JOIN {p}nation n2 ON c_nationkey = n2.n_nationkey
  JOIN {p}region ON n2.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_2's share of ASIA-customer STANDARD-part revenue
    per year — conditional-sum / total-sum over one pass (no self-join);
    numerator and denominator both take the exact decimal path before
    one double division, so the ratio is cross-engine deterministic."""
    _views(
        spark, sf_dir,
        "lineitem", "part", "supplier", "orders", "customer", "nation", "region",
    )
    return spark.sql(_Q8_BODY.format(p="ext6_"))


# --------------------------------------------------------------------------
# Q9: product-type profit by supplier nation and year. ps_supplycost ->
# 10% of p_retailprice as the unit-cost proxy.

_Q9_BODY = """
SELECT nation, o_year, {dsum} AS sum_profit
FROM (
  SELECT n_name AS nation,
         cast(year(o_orderdate) as bigint) AS o_year,
         l_extendedprice * (1 - l_discount)
           - 0.1 * p_retailprice * l_quantity AS amount
  FROM {p}lineitem
  JOIN {p}part ON p_partkey = l_partkey
  JOIN {p}supplier ON s_suppkey = l_suppkey
  JOIN {p}orders ON o_orderkey = l_orderkey
  JOIN {p}nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
ORDER BY nation ASC, o_year DESC
"""


def q_tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit (revenue minus a retail-price-derived unit cost,
    standing in for ps_supplycost) rolled up by supplier nation and
    order year, part-name LIKE filter pushed to the part scan."""
    _views(spark, sf_dir, "lineitem", "part", "supplier", "orders", "nation")
    return spark.sql(_Q9_BODY.format(p="ext6_", dsum=_DSUM.format(c="amount")))


# --------------------------------------------------------------------------
# Q11: important part values for a nation group, HAVING > global-fraction
# scalar subquery. partsupp value -> lineitem extendedprice sums.

_Q11_BODY = """
WITH vals AS (
  SELECT l_partkey, {dsum} AS part_value
  FROM {p}lineitem
  JOIN {p}supplier ON s_suppkey = l_suppkey
  JOIN {p}nation ON s_nationkey = n_nationkey
  JOIN {p}region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM vals
WHERE part_value > (
  SELECT 2.0 * cast(sum(cast(part_value as decimal(18,2))) as double) / count(*)
  FROM vals
)
ORDER BY part_value DESC, l_partkey ASC
LIMIT 100
"""


def q_tpch_q11_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value for one region's suppliers, kept
    only above a threshold from a scalar subquery over the same CTE
    (grouped rows + global scalar = reused exchange, not a recompute).
    Real Q11 scales its fraction by 1/SF; 2x the mean part value is the
    scale-free equivalent, selective at every fixture SF. Values are
    2-decimal-rounded doubles before the exact decimal re-sum + exact
    count division, so the threshold is cross-engine deterministic."""
    _views(spark, sf_dir, "lineitem", "supplier", "nation", "region")
    return spark.sql(_Q11_BODY.format(p="ext6_", dsum=_DSUM.format(c="l_extendedprice")))


# --------------------------------------------------------------------------
# Q13: customer order-count distribution via filtered LEFT OUTER join.

_Q13_BODY = """
SELECT c_count, cast(count(*) as bigint) AS custdist
FROM (
  SELECT c_custkey, cast(count(o_orderkey) as bigint) AS c_count
  FROM {p}customer
  LEFT OUTER JOIN {p}orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: two-level aggregation over a left outer join whose
    non-equi residual (priority filter) lives in the join condition, so
    customers with only urgent orders still appear with c_count=0 — the
    semantics ON-clause-vs-WHERE gets wrong. (o_comment NOT LIKE in real
    Q13 -> priority filter; corpus has no comment column.)"""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q13_BODY.format(p="ext6_"))


# --------------------------------------------------------------------------
# Q15: top supplier(s) by quarterly revenue = max over an aggregated view.

_Q15_BODY = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {dsum} AS total_revenue
  FROM {p}lineitem
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM {p}supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) hitting the max quarterly revenue — the
    aggregated CTE feeds both the join and the scalar max (reused
    exchange, not recomputed); revenue equality is safe because both
    sides come off the same rounded decimal sum."""
    _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(
        _Q15_BODY.format(p="ext6_", dsum=_DSUM.format(c="l_extendedprice * (1 - l_discount)"))
    )


# --------------------------------------------------------------------------
# Q17: small-quantity-order revenue, correlated per-part average.

_Q17_BODY = """
SELECT round(cast(sum(cast(l_extendedprice as decimal(18,6))) as double) / 7.0, 2)
         AS avg_yearly
FROM {p}lineitem
JOIN {p}part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
  AND l_quantity < (
    SELECT 0.2 * avg(l2.l_quantity)
    FROM {p}lineitem l2
    WHERE l2.l_partkey = p_partkey
  )
"""


def q_tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: lost-revenue-if-no-small-orders — correlated AVG
    subquery decorrelated to a groupBy(l_partkey) + join. Quantities are
    integer-valued doubles so the average is exact and the 0.2x boundary
    compare is cross-engine stable; returns exactly one row (possibly
    NULL sum)."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q17_BODY.format(p="ext6_"))


# --------------------------------------------------------------------------
# Q20: suppliers with excess shipped quantity of a part family (grouped
# HAVING semi join standing in for the partsupp availqty subquery).

_Q20_BODY = """
SELECT s_name, s_acctbal
FROM {p}supplier
JOIN {p}nation ON s_nationkey = n_nationkey
JOIN {p}region ON n_regionkey = r_regionkey
WHERE r_name = 'AMERICA'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM {p}lineitem
    JOIN {p}part ON p_partkey = l_partkey
    WHERE p_name LIKE 'blue%'
      AND l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > 25
  )
ORDER BY s_name, s_acctbal
"""


def q_tpch_q20_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: region-filtered suppliers who moved >25 units of
    any 'blue' part in 1997 — an IN over a grouped+HAVING subquery that
    Spark plans as aggregate -> left semi join. Integer-valued double
    quantities keep the HAVING threshold exact; region (not a single
    nation) keeps the result nonempty at every fixture SF."""
    _views(spark, sf_dir, "supplier", "nation", "region", "lineitem", "part")
    return spark.sql(_Q20_BODY.format(p="ext6_"))


def _oracle(body: str, **kw: str) -> str:
    return body.format(p="", **kw)


REGISTRY_EXT6: dict[str, QuerySpec] = {
    "tpch_q2_shape": QuerySpec(q_tpch_q2_shape, _oracle(_Q2_BODY), "§2.6 subquery"),
    "tpch_q7_volume": QuerySpec(
        q_tpch_q7_volume, _oracle(_Q7_BODY, dsum=_DSUM.format(c="volume")), "§2.6 join/agg"
    ),
    "tpch_q8_market_share": QuerySpec(q_tpch_q8_market_share, _oracle(_Q8_BODY), "§2.6 join/agg"),
    "tpch_q9_profit": QuerySpec(
        q_tpch_q9_profit, _oracle(_Q9_BODY, dsum=_DSUM.format(c="amount")), "§2.6 join/agg"
    ),
    "tpch_q11_shape": QuerySpec(
        q_tpch_q11_shape,
        _oracle(_Q11_BODY, dsum=_DSUM.format(c="l_extendedprice")),
        "§2.6 subquery",
    ),
    "tpch_q13_custdist": QuerySpec(q_tpch_q13_custdist, _oracle(_Q13_BODY), "§2.6 outer join/agg"),
    "tpch_q15_top_supplier": QuerySpec(
        q_tpch_q15_top_supplier,
        _oracle(_Q15_BODY, dsum=_DSUM.format(c="l_extendedprice * (1 - l_discount)")),
        "§2.6 subquery",
    ),
    "tpch_q17_small_qty": QuerySpec(q_tpch_q17_small_qty, _oracle(_Q17_BODY), "§2.6 subquery"),
    "tpch_q20_shape": QuerySpec(q_tpch_q20_shape, _oracle(_Q20_BODY), "§2.6 subquery"),
}
