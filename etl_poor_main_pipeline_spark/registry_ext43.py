"""Operator registry, wave 44: re-aggregatable exact distinct (bitmap
rollup), robust trend estimation (Theil-Sen), and gaps-and-islands.

Scale stances:
- bitmap rollup: the NON-additive partial state hierarchical_rollup_
  reuse cannot carry — day-level bitmaps OR-merge into weeks without
  rescanning facts; 4KB-bounded state per (key, bucket), exact.
- Theil-Sen: pairwise slopes restricted to fixed rank lags (3 per
  row), so the pair space is O(rows), not O(rows^2); the lag join
  shuffles on the (type, rank) key; medians on micro ints.
- gaps/islands: the day - rank trick with the Blelloch rank standing
  in for the global row_number — islands from a distinct-days frame
  that is calendar-bounded, never row-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators.scan_prefix import global_rank_zero
from .registry import QuerySpec, _t

# --------------------------------------------------------------------------
# Bitmap distinct rollup day -> week (agg [EXT])
# --------------------------------------------------------------------------


def q_bitmap_rollup_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] agg: EXACT weekly distinct users rolled up from DAY-level
    bitmap partials — the re-aggregation count(DISTINCT) cannot do and
    hierarchical_rollup_reuse's additive sums cannot express: day
    bitmaps (bitmap_construct_agg, 4KB per bucket) OR-merge
    (bitmap_or_agg) into week bitmaps without touching the fact table
    again. This is how exact distinct survives incremental/rollup
    pipelines at 100 TB. Oracle: plain per-week COUNT(DISTINCT) — the
    bitmap path must be value-identical."""
    e = _t(spark, sf_dir, "events").select(
        F.date_trunc("week", "ts").alias("week"),
        F.date_trunc("day", "ts").alias("day"),
        "user_id",
    )
    day_bm = e.groupBy(
        "week", "day", F.bitmap_bucket_number(F.col("user_id")).alias("bkt")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position(F.col("user_id"))).alias("bm"))
    week_bm = day_bm.groupBy("week", "bkt").agg(F.bitmap_or_agg("bm").alias("bm"))
    return (
        week_bm.groupBy(F.date_format("week", "yyyy-MM-dd").alias("week"))
        .agg(F.sum(F.bitmap_count("bm")).cast("bigint").alias("n_distinct_users"))
        .orderBy("week")
    )


_ORACLE_BITMAP_WEEK = """
SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
       cast(count(DISTINCT user_id) AS bigint) AS n_distinct_users
FROM events GROUP BY 1 ORDER BY week
"""


# --------------------------------------------------------------------------
# Theil-Sen robust slope (X7 stats [EXT])
# --------------------------------------------------------------------------

_TS_LAGS = (1, 17, 101)


def q_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Theil-Sen robust trend: per event type, the MEDIAN of
    pairwise value slopes — the estimator that shrugs off the outliers
    that wreck least squares. The classic O(n^2) pair space is bounded
    to fixed rank lags {lags} (each row pairs with its +L-th neighbor
    in time order), keeping the pair count O(rows) while sampling
    short-, mid- and long-range slopes. Rank windows are partitioned by
    type; the lag pairing is an equi-join on (type, rank+L); slopes
    land on micro ints and the median doubles exactly."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros("ts").alias("t_us"),
        F.floor(F.lit(1e6) * F.col("value") + F.lit(0.5)).alias("v_micro"),
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("t_us", "event_id")
    ranked = e.withColumn("rn", F.row_number().over(w)).localCheckpoint(eager=False)
    lags = ranked.select(
        "event_type",
        "rn",
        F.explode(F.array(*[F.lit(x) for x in _TS_LAGS])).alias("lag"),
    ).select("event_type", "lag", (F.col("rn") + F.col("lag")).alias("rn2"), F.col("rn"))
    a = ranked.select(
        "event_type", F.col("rn"), F.col("t_us").alias("t1"), F.col("v_micro").alias("v1")
    )
    b = ranked.select(
        "event_type",
        F.col("rn").alias("rn2"),
        F.col("t_us").alias("t2"),
        F.col("v_micro").alias("v2"),
    )
    pairs = (
        lags.join(a, ["event_type", "rn"])
        .join(b, ["event_type", "rn2"])
        .where(F.col("t2") > F.col("t1"))
        .select(
            "event_type",
            "lag",
            F.floor(
                F.lit(1e6)
                * (
                    (F.col("v2") - F.col("v1")).cast("double")
                    / ((F.col("t2") - F.col("t1")).cast("double") / F.lit(1e6))
                )
                / F.lit(1e6)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("slope_micro"),
        )
    )
    return (
        pairs.groupBy("event_type", "lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            (F.lit(2.0) * F.percentile("slope_micro", F.lit(0.5)))
            .cast("bigint")
            .alias("slope_med_x2"),
        )
        .select("event_type", F.col("lag").cast("bigint").alias("lag"), "n_pairs", "slope_med_x2")
        .orderBy("event_type", "lag")
    )


def _oracle_theil_sen() -> str:
    lag_rows = ", ".join(f"({x})" for x in _TS_LAGS)
    return f"""
WITH ranked AS (
  SELECT event_type, epoch_us(ts) AS t_us,
         floor(1000000.0 * value + 0.5) AS v_micro,
         row_number() OVER (PARTITION BY event_type ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
),
pairs AS (
  SELECT a.event_type, l.lag,
         cast(floor(1000000.0
               * ((b.v_micro - a.v_micro) * 1.0
                  / ((b.t_us - a.t_us) * 1.0 / 1000000.0))
               / 1000000.0 + 0.5) AS bigint) AS slope_micro
  FROM ranked a
  JOIN (VALUES {lag_rows}) l(lag) ON true
  JOIN ranked b ON b.event_type = a.event_type AND b.rn = a.rn + l.lag
  WHERE b.t_us > a.t_us
)
SELECT event_type, cast(lag AS bigint) AS lag,
       count(*)::BIGINT AS n_pairs,
       cast(2.0 * quantile_cont(slope_micro, 0.5) AS bigint) AS slope_med_x2
FROM pairs GROUP BY event_type, lag ORDER BY event_type, lag
"""


# --------------------------------------------------------------------------
# Gaps and islands (X7 [EXT])
# --------------------------------------------------------------------------

_GI_EPOCH = "1992-01-01"


def q_calendar_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 gaps-and-islands over the order calendar: which
    CONSECUTIVE-day streaks have at least one order, how many streaks,
    and the longest one — the uptime/coverage question, solved with the
    classic day-minus-rank trick where the global row_number is the
    Blelloch rank (operators/scan_prefix.global_rank_zero), so no
    single-partition window exists even though the problem is a total
    order. The distinct-days frame is CALENDAR-bounded (rows/365 per
    year), not row-bounded — the two-phase rank is overkill here and
    exactly right at a billion-row fact table feeding it."""
    o = _t(spark, sf_dir, "orders").select(
        F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit(_GI_EPOCH)))
        .cast("bigint")
        .alias("day")
    ).distinct()
    n_parts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    ranked = global_rank_zero(o, ["day"], n_parts, out="r0")
    islands = ranked.select((F.col("day") - F.col("r0")).alias("island"), "day")
    per_island = islands.groupBy("island").agg(
        F.count(F.lit(1)).cast("bigint").alias("len_days")
    )
    return per_island.agg(
        F.sum("len_days").cast("bigint").alias("n_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.max("len_days").cast("bigint").alias("longest_streak_days"),
    )


_ORACLE_GAP_ISLANDS = f"""
WITH days AS (
  SELECT DISTINCT cast(date_diff('day', DATE '{_GI_EPOCH}', o_orderdate::DATE) AS bigint) AS day
  FROM orders
),
ranked AS (
  SELECT day, row_number() OVER (ORDER BY day) - 1 AS r0 FROM days
),
per_island AS (
  SELECT day - r0 AS island, count(*)::BIGINT AS len_days
  FROM ranked GROUP BY island
)
SELECT sum(len_days)::BIGINT AS n_days,
       count(*)::BIGINT AS n_islands,
       max(len_days)::BIGINT AS longest_streak_days
FROM per_island
"""


REGISTRY_EXT43: dict[str, QuerySpec] = {
    "bitmap_rollup_week": QuerySpec(
        q_bitmap_rollup_week, _ORACLE_BITMAP_WEEK, "agg [EXT] mergeable exact distinct"
    ),
    "theil_sen_slope": QuerySpec(
        q_theil_sen_slope, _oracle_theil_sen(), "X7 [EXT] robust trend"
    ),
    "calendar_gap_islands": QuerySpec(
        q_calendar_gap_islands, _ORACLE_GAP_ISLANDS, "X7 [EXT] gaps and islands"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_theil_sen_slope.__doc__ = q_theil_sen_slope.__doc__.format(lags=_TS_LAGS)  # noqa: E501
