"""Operator registry, wave 5: remaining join/set-op/window forms, funnel
analysis, three more TPC-H shapes, and SRP-LSH similarity search. Same
conventions as registry.py.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators import similarity
from .registry import QuerySpec, _dsum, _dsum_sql, _t


def q_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join: all suppliers, with their lineitem revenue when
    present (suppliers without sales keep NULLs)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )
    return (
        rev.join(s, rev.l_suppkey == s.s_suppkey, "right")
        .select("s_suppkey", "s_name", "revenue")
    )


_ORACLE_RIGHT_OUTER = f"""
SELECT s_suppkey, s_name, revenue
FROM (
  SELECT l_suppkey, {_dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')}
  FROM lineitem GROUP BY l_suppkey
) r RIGHT JOIN supplier s ON r.l_suppkey = s.s_suppkey
"""


def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN (cartesian product) of the two smallest dims — every
    (region, nation) combination regardless of relationship."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


_ORACLE_CROSS = "SELECT r_name, n_name FROM region CROSS JOIN nation"


def q_union_missing_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union by name with missing columns null-filled (schema-evolution
    union: two projections of different width combined)."""
    o = _t(spark, sf_dir, "orders")
    a = o.select("o_orderkey", "o_totalprice")
    b = o.select("o_orderkey", F.col("o_orderpriority").alias("prio"))
    return a.unionByName(b, allowMissingColumns=True)


_ORACLE_UNION_MISSING = """
SELECT o_orderkey, o_totalprice, NULL AS prio FROM orders
UNION ALL
SELECT o_orderkey, NULL, o_orderpriority FROM orders
"""


def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded sliding frame: 4-row moving average/sum of order totals per
    customer (ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate"), F.col("o_orderkey"))
        .rowsBetween(-3, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w), 4).alias("avg_last4"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("sum_last4"),
    )


_ORACLE_MOVING_AVG = """
SELECT o_orderkey,
       round(avg(o_totalprice) OVER w, 4) AS avg_last4,
       round(sum(o_totalprice) OVER w, 2) AS sum_last4
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""


def q_dense_rank_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY pattern with dense_rank: top-3 price ranks per order
    priority, keeping ties (dense_rank admits >3 rows per group)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.dense_rank().over(w).alias("price_rank"),
        )
        .filter(F.col("price_rank") <= 3)
    )


_ORACLE_DENSE_RANK = """
SELECT o_orderkey, o_orderpriority, price_rank FROM (
  SELECT o_orderkey, o_orderpriority,
         dense_rank() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS price_rank
  FROM orders
) WHERE price_rank <= 3
"""


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis over the event stream: users whose first view is
    followed by a click, then a purchase, in timestamp order. Built as
    three chained min-timestamp aggregations (each stage conditions on
    the previous stage's time) — the standard scalable funnel shape: no
    per-user Python, just conditional aggs + joins on user_id."""
    e = _t(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased_after_click")))
    )


_ORACLE_FUNNEL = """
WITH v AS (
  SELECT user_id, min(ts) AS view_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS click_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.view_ts
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS purchase_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
  GROUP BY e.user_id
)
SELECT cast((SELECT count(*) FROM v) as bigint) AS n_viewed,
       cast((SELECT count(*) FROM c) as bigint) AS n_clicked_after_view,
       cast((SELECT count(*) FROM p) as bigint) AS n_purchased_after_click
"""


def q_tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer,
    top 20 (join customer x nation x orders x lineitem, filter R flag)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


_ORACLE_Q10 = f"""
SELECT c_custkey, c_name, n_name,
       {_dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q_tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share of one ship-date month —
    conditional numerator over a joined aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    ).join(p, li.l_partkey == p.p_partkey)
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0).cast("decimal(18,6)")).cast("double")
            / F.sum(rev.cast("decimal(18,6)")).cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


_ORACLE_Q14 = """
SELECT round(
         100.0
         * cast(sum(cast(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount)
                         ELSE 0.0 END as decimal(18,6))) as double)
         / cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6))) as double),
         6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1996-02-01'
"""


def q_tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    clauses — exercises OR-of-ANDs predicate pushdown through a join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    clause1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 20))
    )
    clause2 = (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size").between(10, 30))
        & (F.col("l_quantity").between(10, 35))
    )
    clause3 = (
        (F.col("p_brand") == "Brand#3")
        & (F.col("p_size").between(20, 50))
        & (F.col("l_quantity").between(20, 50))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.filter(clause1 | clause2 | clause3).agg(
        _dsum(rev, "revenue"), F.count(F.lit(1)).alias("n_items")
    )


_ORACLE_Q19 = f"""
SELECT {_dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')},
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
"""


def q_similarity_srp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X3 scale path #2: signed-random-projection (SRP) LSH top-k.
    16 fixed seeded hyperplanes give every vector a 16-bit sign bucket;
    candidates are vectors whose bucket is within Hamming distance 6 of
    the query bucket (a cheap integer filter), exact cosine ranks only
    the candidates. Deterministic given the seeded planes, so the oracle
    (same planes embedded as literals) gives full parity; recall vs the
    exact top-k is additionally asserted in tests."""
    from .functions.vectors import cosine_similarity

    e = _t(spark, sf_dir, "embeddings")
    dim, nplanes = 64, 16
    rnd = random.Random(7)
    planes = [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(nplanes)]

    def bucket_expr(col):
        acc = F.lit(0)
        for i, plane in enumerate(planes):
            dot = F.aggregate(
                F.zip_with(
                    col.cast("array<double>"),
                    F.array(*[F.lit(w) for w in plane]),
                    lambda x, w: x * w,
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            acc = acc + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
        return acc

    # parameter fetch, not a Spark job (see similarity.query_vector)
    qv = list(similarity.query_vector(sf_dir, vec_id=0))
    qbucket = sum(
        (1 << i)
        for i, plane in enumerate(planes)
        if sum(x * w for x, w in zip(qv, plane)) > 0
    )
    qlit = F.array(*[F.lit(float(x)) for x in qv])
    cands = (
        e.filter(F.col("vec_id") != 0)
        .withColumn("_bucket", bucket_expr(F.col("embedding")))
        .filter(F.bit_count(F.col("_bucket").bitwiseXOR(F.lit(qbucket))) <= 6)
    )
    return (
        cands.select(
            "vec_id",
            F.round(cosine_similarity(F.col("embedding"), qlit), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(10)
    )


def _srp_oracle() -> str:
    """DuckDB twin for SRP-LSH, generated from the same seeded planes the
    Spark query uses (random.Random(7) — identical float sequence, so the
    embedded literals equal the Spark-side F.lit planes bit-for-bit). The
    sign test ``dot > 0`` is the only FP comparison; a flip would need a
    dot within the engines' summation-order noise of 0 (~1e-13 odds per
    dot on this data)."""
    dim, nplanes = 64, 16
    rnd = random.Random(7)
    planes = [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(nplanes)]
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], "
        f"[{','.join(repr(w) for w in plane)}]::DOUBLE[]) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, plane in enumerate(planes)
    )
    return f"""
WITH b AS (
  SELECT vec_id, embedding, {bucket_terms} AS bucket
  FROM embeddings
), q AS (SELECT embedding::DOUBLE[] AS qv, bucket AS qb FROM b WHERE vec_id = 0)
SELECT vec_id,
       round(list_cosine_similarity(embedding::DOUBLE[], (SELECT qv FROM q)), 6) AS cosine
FROM b
WHERE vec_id <> 0 AND bit_count(xor(bucket, (SELECT qb FROM q))) <= 6
ORDER BY cosine DESC, vec_id ASC
LIMIT 10
"""


REGISTRY_EXT4: dict[str, QuerySpec] = {
    "join_right_outer": QuerySpec(q_join_right_outer, _ORACLE_RIGHT_OUTER, "§2.6 join"),
    "join_cross": QuerySpec(q_cross_join, _ORACLE_CROSS, "§2.6 join"),
    "union_missing_cols": QuerySpec(q_union_missing_cols, _ORACLE_UNION_MISSING, "U1 ext"),
    "window_moving_avg": QuerySpec(q_window_moving_avg, _ORACLE_MOVING_AVG, "§2.6 window"),
    "window_dense_rank_qualify": QuerySpec(q_dense_rank_qualify, _ORACLE_DENSE_RANK, "§2.6 window"),
    "event_funnel": QuerySpec(q_event_funnel, _ORACLE_FUNNEL, "§2.6 events"),
    "tpch_q10_returns": QuerySpec(q_tpch_q10_returns, _ORACLE_Q10, "§2.6 join+agg"),
    "tpch_q14_promo": QuerySpec(q_tpch_q14_promo, _ORACLE_Q14, "§2.6 join+agg"),
    "tpch_q19_disjunctive": QuerySpec(q_tpch_q19_disjunctive, _ORACLE_Q19, "§2.6 join+agg"),
    "similarity_srp_lsh": QuerySpec(q_similarity_srp_lsh, _srp_oracle(), "X3 approx, full parity"),
}
