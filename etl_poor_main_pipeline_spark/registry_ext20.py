"""Operator registry, wave 21: recursive CTEs (new in Spark 4.0) — the
last relational-surface family the registry lacked. The recursive spine
is the canonical warehouse use (calendar dimension generation + gapfill);
the same SQL text runs verbatim on DuckDB, so the oracle IS the query.

Scale stance: each recursion step is one Catalyst iteration over the
previous step's (tiny) frame — the spine is O(levels) rows, never data-
sized; the single data-sized operation is the one monthly aggregate over
orders, which is a plain partial-agg + exchange. Keep recursion for
dimension-sized structures (calendars, org trees, BOM graphs); data-sized
fixpoints belong to the iterative-DataFrame pattern (pagerank_docs,
dedup_collapse_components) where each step is a checkpointed join, not a
semantic-naive-loop CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import QuerySpec, _dsum_sql, _t

# identical text runs on Spark SQL and DuckDB: recursive month spine over
# the fixture's full date envelope (fixed literals — SF-independent), then
# a left join so empty months surface as explicit zero rows (the gapfill).
_RECURSIVE_SQL = f"""
WITH RECURSIVE months(m) AS (
  SELECT TIMESTAMP '1995-01-01 00:00:00'
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM months
  WHERE m < TIMESTAMP '2001-08-01 00:00:00'
)
SELECT substr(cast(cast(m AS date) AS string), 1, 7) AS month,
       cast(count(o_orderkey) AS bigint) AS n_orders,
       {_dsum_sql('coalesce(o_totalprice, 0.0)', 'revenue')}
FROM months
LEFT JOIN orders
  ON substr(cast(cast(o_orderdate AS date) AS string), 1, 7)
     = substr(cast(cast(m AS date) AS string), 1, 7)
GROUP BY 1
ORDER BY 1
"""


def q_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] §2.6 recursive CTE (Spark 4 WITH RECURSIVE): generate the
    calendar month spine by recursion and left-join monthly order
    revenue, so months with no orders appear as explicit zeros — the
    calendar-dimension + gapfill pattern. The oracle is the SAME SQL
    text: both engines implement ANSI recursive UNION ALL."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_RECURSIVE_SQL)


REGISTRY_EXT20: dict[str, QuerySpec] = {
    "recursive_month_spine": QuerySpec(
        q_recursive_month_spine, _RECURSIVE_SQL, "§2.6 recursive CTE [EXT]"
    ),
}
