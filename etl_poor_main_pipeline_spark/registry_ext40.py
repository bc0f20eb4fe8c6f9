"""Operator registry, wave 41: hierarchy rollups, interval union, and
tolerance-bounded as-of joins.

Scale stances:
- hierarchy rollup: the ancestor chain is a FIXED-depth expression
  (parent = id div 10, 3 levels) — each level is one aggregate, the
  tree rolls up bottom-to-top with no recursion at runtime.
- interval union: the classic sweep-line merge compiled to a
  partitioned window — running max of interval ends per user detects
  island starts; two window passes, shuffle only the user key.
- as-of tolerance: the asof_join_events union-window construction plus
  one staleness predicate — matches older than the tolerance NULL out
  (the "don't serve stale features" rule every feature store applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import QuerySpec, _t

# --------------------------------------------------------------------------
# Fixed-depth hierarchy rollup (agg [EXT])
# --------------------------------------------------------------------------


def q_hierarchy_rollup_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] hierarchical (BOM/org-tree) rollup over the synthetic
    3-level doc hierarchy leaf -> parent (doc_id div 10) -> grandparent
    (div 100): per GRANDPARENT subtree, total chars, leaf count, and
    the heaviest direct child subtree. Fixed-depth ancestor chains are
    pure expressions — the rollup is two cascaded aggregates
    (leaf->parent, parent->grandparent), each map-side combined; no
    recursion, no self-join at runtime."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        (F.col("doc_id") / 10).cast("bigint").alias("parent"),
        (F.col("doc_id") / 100).cast("bigint").alias("grandparent"),
    )
    parents = d.groupBy("grandparent", "parent").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_leaves"),
        F.sum("n_chars").cast("bigint").alias("chars"),
    )
    return (
        parents.groupBy("grandparent")
        .agg(
            F.sum("n_leaves").cast("bigint").alias("n_leaves"),
            F.sum("chars").cast("bigint").alias("total_chars"),
            F.max("chars").cast("bigint").alias("max_child_chars"),
            F.count(F.lit(1)).cast("bigint").alias("n_children"),
        )
        .orderBy("grandparent")
    )


_ORACLE_HIERARCHY = """
WITH parents AS (
  SELECT doc_id // 100 AS grandparent, doc_id // 10 AS parent,
         count(*)::BIGINT AS n_leaves, sum(n_chars)::BIGINT AS chars
  FROM documents GROUP BY 1, 2
)
SELECT grandparent,
       sum(n_leaves)::BIGINT AS n_leaves,
       sum(chars)::BIGINT AS total_chars,
       max(chars)::BIGINT AS max_child_chars,
       count(*)::BIGINT AS n_children
FROM parents GROUP BY grandparent ORDER BY grandparent
"""


# --------------------------------------------------------------------------
# Interval union / merge (X9 [EXT])
# --------------------------------------------------------------------------

_IU_WINDOW_MIN = 5  # each event opens a 5-minute activity interval


def q_interval_union_active_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X9 interval UNION (merge overlapping intervals): each event
    opens a {_IU_WINDOW_MIN}-minute activity interval; per user, merge
    overlaps and report merged-island count and total active seconds —
    the billing/uptime primitive. Sweep-line compiled to windows: an
    island STARTS where the interval's start exceeds the running max
    end of all earlier intervals; island id = running count of starts;
    then per-island [min(start), max(end)] lengths sum exactly (integer
    epoch seconds). Two partitioned window passes, shuffle = user key."""
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("start_s"),
        (F.col("ts").cast("long") + _IU_WINDOW_MIN * 60).alias("end_s"),
    )
    w = Window.partitionBy("user_id").orderBy("start_s", "event_id")
    prev_max_end = F.max("end_s").over(w.rowsBetween(Window.unboundedPreceding, -1))
    marked = e.withColumn(
        "is_start",
        F.when(
            prev_max_end.isNull() | (F.col("start_s") > prev_max_end), 1
        ).otherwise(0),
    )
    islands = marked.withColumn(
        "island",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_island = islands.groupBy("user_id", "island").agg(
        (F.max("end_s") - F.min("start_s")).alias("len_s")
    )
    return (
        per_island.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_islands"),
            F.sum("len_s").cast("bigint").alias("active_seconds"),
        )
        .orderBy("user_id")
    )


_ORACLE_INTERVAL_UNION = f"""
WITH e AS (
  SELECT user_id, event_id,
         (epoch_us(ts) // 1000000) AS start_s,
         (epoch_us(ts) // 1000000) + {_IU_WINDOW_MIN * 60} AS end_s
  FROM events
),
marked AS (
  SELECT user_id, event_id, start_s, end_s,
         CASE WHEN max(end_s) OVER (PARTITION BY user_id ORDER BY start_s, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   IS NULL
                OR start_s > max(end_s) OVER (PARTITION BY user_id ORDER BY start_s, event_id
                                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS is_start
  FROM e
),
islands AS (
  SELECT user_id, start_s, end_s,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY start_s, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM marked
),
per_island AS (
  SELECT user_id, island, max(end_s) - min(start_s) AS len_s
  FROM islands GROUP BY user_id, island
)
SELECT user_id, count(*)::BIGINT AS n_islands,
       sum(len_s)::BIGINT AS active_seconds
FROM per_island GROUP BY user_id ORDER BY user_id
"""


# --------------------------------------------------------------------------
# As-of join with staleness tolerance (join [EXT])
# --------------------------------------------------------------------------

_ASOF_TOL_S = 3600  # 1 hour


def q_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] as-of join with a STALENESS BOUND: each purchase gets the
    most recent prior signup of the same user ONLY if it is at most
    {_ASOF_TOL_S}s old — the "don't serve stale features" rule every
    feature store applies to point-in-time lookups. Same union +
    single-window construction as asof_join_events (no pairwise join);
    the tolerance is one predicate that NULLs out stale matches, and
    the output keeps the unmatched/stale rows (the feature-freshness
    audit needs to count them)."""
    ev = _t(spark, sf_dir, "events")
    merged = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").cast("long").alias("t_s"),
            F.col("event_id").alias("eid"),
            F.lit(1).alias("is_p"),
            F.lit(None).cast("long").alias("s_ts"),
            F.lit(None).cast("long").alias("s_id"),
        )
        .unionByName(
            ev.filter(F.col("event_type") == "signup").select(
                "user_id",
                F.col("ts").cast("long").alias("t_s"),
                F.col("event_id").alias("eid"),
                F.lit(0).alias("is_p"),
                F.col("ts").cast("long").alias("s_ts"),
                F.col("event_id").alias("s_id"),
            )
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_s", F.asc("is_p"), "eid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lastsig = merged.withColumn(
        "ls", F.max(F.when(F.col("is_p") == 0, F.struct("s_ts", "s_id"))).over(w)
    )
    return (
        lastsig.where(F.col("is_p") == 1)
        .select(
            F.col("eid").alias("purchase_id"),
            "user_id",
            F.when(
                F.col("ls").isNotNull()
                & (F.col("t_s") - F.col("ls.s_ts") <= _ASOF_TOL_S),
                F.col("ls.s_id"),
            ).alias("fresh_signup_id"),
            F.when(
                F.col("ls").isNotNull()
                & (F.col("t_s") - F.col("ls.s_ts") <= _ASOF_TOL_S),
                F.col("t_s") - F.col("ls.s_ts"),
            )
            .cast("bigint")
            .alias("staleness_s"),
        )
        .orderBy("purchase_id")
    )


_ORACLE_ASOF_TOL = f"""
WITH merged AS (
  SELECT user_id, (epoch_us(ts) // 1000000) AS t_s, event_id AS eid,
         1 AS is_p, NULL::BIGINT AS s_ts, NULL::BIGINT AS s_id
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, (epoch_us(ts) // 1000000) AS t_s, event_id AS eid,
         0 AS is_p, (epoch_us(ts) // 1000000) AS s_ts, event_id AS s_id
  FROM events WHERE event_type = 'signup'
),
lastsig AS (
  SELECT *,
         max(CASE WHEN is_p = 0 THEN struct_pack(s_ts := s_ts, s_id := s_id) END)
           OVER (PARTITION BY user_id ORDER BY t_s, is_p, eid
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ls
  FROM merged
)
SELECT eid AS purchase_id, user_id,
       CASE WHEN ls IS NOT NULL AND t_s - ls.s_ts <= {_ASOF_TOL_S}
            THEN ls.s_id END AS fresh_signup_id,
       CASE WHEN ls IS NOT NULL AND t_s - ls.s_ts <= {_ASOF_TOL_S}
            THEN t_s - ls.s_ts END AS staleness_s
FROM lastsig WHERE is_p = 1 ORDER BY purchase_id
"""


REGISTRY_EXT40: dict[str, QuerySpec] = {
    "hierarchy_rollup_paths": QuerySpec(
        q_hierarchy_rollup_paths, _ORACLE_HIERARCHY, "agg [EXT] tree rollup"
    ),
    "interval_union_active_time": QuerySpec(
        q_interval_union_active_time, _ORACLE_INTERVAL_UNION, "X9 [EXT] interval merge"
    ),
    "asof_join_tolerance": QuerySpec(
        q_asof_join_tolerance, _ORACLE_ASOF_TOL, "join [EXT] bounded-staleness as-of"
    ),
}
