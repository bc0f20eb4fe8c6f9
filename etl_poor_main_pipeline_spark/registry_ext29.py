"""Operator registry, wave 30: marketing/product attribution — last-touch
credit assignment within a lookback window, and time-to-convert
percentiles. The two queries every growth team runs against the event
stream.

Scale stances:
- attribution: purchases join clicks user-keyed (co-partitioned) with
  the lookback predicate inside the join; the per-purchase election is
  one window (rank by click recency) — no cross-user data movement
  beyond the user-key shuffle both sides already need.
- time-to-convert: two per-user firsts from ONE conditional aggregate
  pass, then exact interpolated percentiles over the (small) converter
  set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import QuerySpec, _t

_ATTR_WINDOW_H = 24


def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X9 last-touch attribution: every purchase is credited to the
    user's most recent click within {_ATTR_WINDOW_H}h (ties broken on
    click event_id); purchases with no qualifying click stay explicitly
    unattributed. Output per purchase: the credited click and the
    click-to-purchase latency in seconds — the table ad-spend
    attribution reads. The election is rank-by-recency inside the
    user-keyed join; nothing shuffles beyond the user key."""
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("p_us"),
    )
    c = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros("ts").alias("c_us"),
    )
    j = p.join(c, "user_id", "left").where(
        F.col("click_id").isNull()
        | (
            (F.col("c_us") <= F.col("p_us"))
            & (F.col("p_us") - F.col("c_us") <= _ATTR_WINDOW_H * 3600 * 1_000_000)
        )
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.desc_nulls_last("c_us"), F.desc_nulls_last("click_id")
    )
    best = j.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    # purchases whose every click fails the window predicate drop out of
    # the filtered join entirely — restore them via a left join on the
    # full purchase set so unattributed rows are explicit
    return (
        p.select("purchase_id", "user_id", "p_us")
        .join(best.select("purchase_id", "click_id", "c_us"), "purchase_id", "left")
        .select(
            "purchase_id",
            "user_id",
            "click_id",
            F.when(
                F.col("click_id").isNotNull(),
                ((F.col("p_us") - F.col("c_us")) / 1_000_000).cast("bigint"),
            ).alias("latency_sec"),
        )
        .orderBy("purchase_id")
    )


_ORACLE_ATTRIB = f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts) AS c_us
  FROM events WHERE event_type = 'click'
),
j AS (
  SELECT p.purchase_id, p.user_id, p.p_us, c.click_id, c.c_us,
         row_number() OVER (PARTITION BY p.purchase_id
                            ORDER BY c.c_us DESC, c.click_id DESC) AS rn
  FROM p JOIN c ON c.user_id = p.user_id
   AND c.c_us <= p.p_us AND p.p_us - c.c_us <= cast({_ATTR_WINDOW_H} AS bigint) * 3600 * 1000000
)
SELECT p.purchase_id, p.user_id, j.click_id,
       CASE WHEN j.click_id IS NOT NULL
            THEN cast((p.p_us - j.c_us) // 1000000 AS bigint) END AS latency_sec
FROM p LEFT JOIN (SELECT * FROM j WHERE rn = 1) j USING (purchase_id)
ORDER BY p.purchase_id
"""


def q_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X9 time-to-convert: for users whose first click precedes
    their first purchase, the p25/p50/p75 of the conversion latency in
    seconds, plus converter counts. Both firsts come from one
    conditional aggregate over the event stream; the percentile runs
    over the converter set only. One row out — the funnel-velocity
    headline metric."""
    e = _t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "click", F.unix_micros("ts"))
        ).alias("first_click_us"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("first_purchase_us"),
    )
    conv = firsts.where(
        F.col("first_click_us").isNotNull()
        & F.col("first_purchase_us").isNotNull()
        & (F.col("first_purchase_us") > F.col("first_click_us"))
    ).select(
        (
            (F.col("first_purchase_us") - F.col("first_click_us")) / 1_000_000
        ).cast("bigint").alias("sec")
    )
    return conv.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converters"),
        F.round(F.percentile(F.col("sec").cast("double"), F.lit(0.25)), 4).alias("p25_sec"),
        F.round(F.percentile(F.col("sec").cast("double"), F.lit(0.5)), 4).alias("p50_sec"),
        F.round(F.percentile(F.col("sec").cast("double"), F.lit(0.75)), 4).alias("p75_sec"),
    )


_ORACLE_TTC = """
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS fc,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS fp
  FROM events GROUP BY user_id
),
conv AS (
  SELECT cast((fp - fc) // 1000000 AS bigint) AS sec
  FROM firsts WHERE fc IS NOT NULL AND fp IS NOT NULL AND fp > fc
)
SELECT cast(count(*) AS bigint) AS n_converters,
       round(quantile_cont(cast(sec AS double), 0.25), 4) AS p25_sec,
       round(quantile_cont(cast(sec AS double), 0.5), 4) AS p50_sec,
       round(quantile_cont(cast(sec AS double), 0.75), 4) AS p75_sec
FROM conv
"""


REGISTRY_EXT29: dict[str, QuerySpec] = {
    "attribution_last_touch": QuerySpec(
        q_attribution_last_touch, _ORACLE_ATTRIB, "X9 [EXT] attribution"
    ),
    "funnel_time_to_convert": QuerySpec(
        q_funnel_time_to_convert, _ORACLE_TTC, "X9 [EXT] funnel velocity"
    ),
}
