"""Operator registry, wave 14: entity-resolution fuzzy matching and
time-series gap-fill — two more training-data-pipeline staples, both
pure built-in expressions with full-parity twins.

- ``fuzzy_join_levenshtein``: edit-distance self-join with length-bucket
  blocking — the record-linkage primitive behind cross-source dedup.
- ``timeseries_gapfill_interpolate``: densify an hourly rollup to a full
  grid and linearly interpolate missing values — the hypertable
  gap-fill/rollup shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators.dedup import spread
from .registry import QuerySpec, _t


def q_fuzzy_join_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X2 record linkage: supplier-name pairs with edit distance
    <= 1. Blocking: side A keys on name length, side B explodes to
    {len-1, len, len+1} — a levenshtein <= t pair can differ in length by
    at most t, so the +-1 length-band equi-join is lossless for t=1 (the
    oracle states the clean quadratic form; the blocked plan returns the
    identical set). Each pair meets on exactly one key (B's band that
    equals A's length), so no post-join dedup is needed. At scale the
    equi-join shuffles on small int keys and the quadratic explosion is
    confined to same-band buckets; production blocking composes this
    with a q-gram prefix key the same way."""
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    # synthetic names share one length, so the length band is one bucket
    # and the probe side pays ~n^2/2 levenshtein evals; spread the
    # one-split probe scan across cores (no-op at scale)
    a = spread(s).select(
        F.col("s_suppkey").alias("supkey_a"),
        F.col("s_name").alias("name_a"),
        F.length("s_name").alias("blk"),
    )
    b = s.select(
        F.col("s_suppkey").alias("supkey_b"),
        F.col("s_name").alias("name_b"),
        F.explode(
            F.array(
                F.length("s_name") - 1, F.length("s_name"), F.length("s_name") + 1
            )
        ).alias("blk"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("supkey_a") < F.col("supkey_b"))
        .withColumn("lev_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("lev_dist") <= 1)
        .select(
            "supkey_a",
            "supkey_b",
            "name_a",
            "name_b",
            F.col("lev_dist").cast("bigint").alias("lev_dist"),
        )
    )


_ORACLE_FUZZY_LEV = """
SELECT a.s_suppkey AS supkey_a, b.s_suppkey AS supkey_b,
       a.s_name AS name_a, b.s_name AS name_b,
       cast(levenshtein(a.s_name, b.s_name) AS bigint) AS lev_dist
FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 1
"""


def q_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X9 time-series densify + linear interpolation: hourly
    per-type value sums over events, expanded to the full [min,max]
    hourly grid (every type x every hour), with missing hours filled by
    linear interpolation between the nearest populated neighbors
    (nearest-edge fill at the boundaries) — the hypertable
    gap-fill/rollup shape.

    Determinism: bucket sums take the exact decimal path and are rounded
    BEFORE interpolation, hour arithmetic is integer epoch-hours, and
    the interpolation formula is one double expression evaluated on
    identical inputs in both engines, rounded to 4. Scale shape: one
    shuffle for the agg, one broadcast-able grid join, two windows per
    type partition (sequential scans, no extra shuffle since agg/window
    share the type key in the partition spec)."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6).alias("sv"),
    )
    bounds = agg.agg(
        F.min("h").alias("mn"), F.max("h").alias("mx")
    )
    types = ev.select("event_type").distinct()
    grid = (
        types.crossJoin(bounds)
        .select(
            "event_type",
            F.explode(F.sequence("mn", "mx", F.expr("interval 1 hour"))).alias("h"),
        )
    )
    full = grid.join(agg, ["event_type", "h"], "left").withColumn(
        "eh", (F.unix_timestamp("h") / 3600).cast("bigint")
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("eh")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("eh")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    marked = (
        full.withColumn("pv", F.last("sv", ignorenulls=True).over(wp))
        .withColumn(
            "ph",
            F.last(F.when(F.col("sv").isNotNull(), F.col("eh")), ignorenulls=True).over(wp),
        )
        .withColumn("nv", F.first("sv", ignorenulls=True).over(wn))
        .withColumn(
            "nh",
            F.first(F.when(F.col("sv").isNotNull(), F.col("eh")), ignorenulls=True).over(wn),
        )
    )
    filled = F.when(F.col("sv").isNotNull(), F.col("sv")).otherwise(
        F.when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("eh") - F.col("ph")).cast("double")
            / (F.col("nh") - F.col("ph")).cast("double")
        )
    )
    return marked.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
        # interpolation at dyadic fractions (e.g. a single-hour gap -> 0.5)
        # lands values exactly on .xxxx5 — engine round() half-way rules
        # differ, so the value-defining floor(x*1e4+0.5)/1e4 is used in both
        (F.floor(filled * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)).alias(
            "sum_value_filled"
        ),
    )


_ORACLE_GAPFILL = """
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         cast(count(*) AS bigint) AS n_events,
         round(cast(sum(cast(value AS decimal(18,6))) AS double), 6) AS sv
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(h) AS mn, max(h) AS mx FROM agg),
grid AS (
  SELECT t.event_type, bounds.mn + to_hours(g.off) AS h
  FROM (SELECT DISTINCT event_type FROM events) t, bounds, range(0, 100000) g(off)
  WHERE bounds.mn + to_hours(g.off) <= bounds.mx
),
full_g AS (
  SELECT g.event_type, g.h, a.n_events, a.sv,
         cast(epoch(g.h) / 3600 AS bigint) AS eh
  FROM grid g LEFT JOIN agg a ON a.event_type = g.event_type AND a.h = g.h
),
marked AS (
  SELECT *,
         last_value(sv IGNORE NULLS) OVER wp AS pv,
         last_value(CASE WHEN sv IS NOT NULL THEN eh END IGNORE NULLS) OVER wp AS ph,
         first_value(sv IGNORE NULLS) OVER wn AS nv,
         first_value(CASE WHEN sv IS NOT NULL THEN eh END IGNORE NULLS) OVER wn AS nh
  FROM full_g
  WINDOW wp AS (PARTITION BY event_type ORDER BY eh
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         wn AS (PARTITION BY event_type ORDER BY eh
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
)
SELECT event_type,
       strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
       coalesce(n_events, 0) AS n_events,
       floor(10000.0 * (CASE WHEN sv IS NOT NULL THEN sv
                  WHEN pv IS NULL THEN nv
                  WHEN nv IS NULL THEN pv
                  ELSE pv + (nv - pv) * cast(eh - ph AS double) / cast(nh - ph AS double)
             END) + 0.5) / 10000.0 AS sum_value_filled
FROM marked
"""


REGISTRY_EXT13: dict[str, QuerySpec] = {
    "fuzzy_join_levenshtein": QuerySpec(q_fuzzy_join_levenshtein, _ORACLE_FUZZY_LEV, "X2 [EXT]"),
    "timeseries_gapfill_interpolate": QuerySpec(q_timeseries_gapfill, _ORACLE_GAPFILL, "X9 [EXT]"),
}
