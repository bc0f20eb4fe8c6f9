"""Operator registry, wave 26: behavioral-analytics depth over the
events stream — cohort retention, association rules (support/confidence/
lift), time-weighted averages, and a Benford first-digit DQ check.
These are the product-analytics shapes every event warehouse serves.

Scale stances:
- cohort retention: two aggregates (per-user cohort week, distinct
  user-week activity) joined on user — both user-keyed, co-partitioned;
  the final (cohort, offset) rollup is tiny.
- association rules: baskets are distinct (user, item); the pair join is
  per-user (items-per-user bounded, ~|event_type| here), the standard
  market-basket blocking. Frequencies join back broadcast (item
  vocabulary is small by definition of the rule mining).
- TWAP: one window (lead) partitioned by user — no global sort; the
  interval arithmetic is integer microseconds and value-weighted sums
  run through decimal, so the ratio is cross-engine exact.
- Benford: a single projection + 9-row aggregate; the expected curve is
  computed in-engine (identical doubles both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import QuerySpec, _t

# --------------------------------------------------------------------------
# Cohort retention (X9 [EXT])
# --------------------------------------------------------------------------


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X9 weekly cohort retention: users are cohorted by the
    Monday-start week of their FIRST event; for every (cohort week,
    week offset) the count of cohort users still active that week. The
    canonical retention triangle — offset 0 equals cohort size, later
    offsets are the decay a product team tracks."""
    e = _t(spark, sf_dir, "events")
    cohort = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            ((F.datediff(F.col("week"), F.col("cohort_week")) / 7).cast("bigint")).alias(
                "week_offset"
            ),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


_ORACLE_COHORT = """
WITH cohort AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
)
SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
       cast(date_diff('day', c.cohort_week, a.week) // 7 AS bigint) AS week_offset,
       cast(count(DISTINCT a.user_id) AS bigint) AS n_active
FROM activity a JOIN cohort c USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# Association rules: support / confidence / lift (X9 [EXT])
# --------------------------------------------------------------------------

_AR_MIN_SUPPORT = 5  # pairs co-occurring in at least this many baskets


def q_assoc_rules_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X9 market-basket association rules over (user, event_type)
    baskets: for every ordered item pair a->b with co-occurrence >=
    {_AR_MIN_SUPPORT} users, report support, confidence(a->b) and lift,
    micro-scaled. The pair join is blocked per user (bounded basket
    width), item frequencies are broadcast back — the distributed
    Apriori first pass."""
    e = _t(spark, sf_dir, "events")
    basket = e.select("user_id", "event_type").distinct()
    n_users = basket.select("user_id").distinct().count()  # scalar, one job
    freq = basket.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    a = basket.select("user_id", F.col("event_type").alias("item_a"))
    b = basket.select("user_id", F.col("event_type").alias("item_b"))
    pairs = (
        a.join(b, "user_id")
        .where(F.col("item_a") != F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("double").alias("n_ab"))
        .where(F.col("n_ab") >= _AR_MIN_SUPPORT)
    )
    fa = freq.select(F.col("event_type").alias("item_a"), F.col("n").alias("n_a"))
    fb = freq.select(F.col("event_type").alias("item_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(fa), "item_a")
        .join(F.broadcast(fb), "item_b")
        .select(
            "item_a",
            "item_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.floor(F.lit(1000000.0) * F.col("n_ab") / F.col("n_a") + F.lit(0.5))
            .cast("bigint")
            .alias("confidence_micro"),
            F.floor(
                F.lit(1000000.0) * F.col("n_ab") * F.lit(float(n_users))
                / (F.col("n_a") * F.col("n_b"))
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("lift_micro"),
        )
        .orderBy("item_a", "item_b")
    )


_ORACLE_ASSOC = f"""
WITH basket AS (SELECT DISTINCT user_id, event_type FROM events),
nu AS (SELECT cast(count(DISTINCT user_id) AS double) AS n FROM basket),
freq AS (SELECT event_type, cast(count(*) AS double) AS n FROM basket GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS item_a, b.event_type AS item_b,
         cast(count(*) AS double) AS n_ab
  FROM basket a JOIN basket b
    ON a.user_id = b.user_id AND a.event_type <> b.event_type
  GROUP BY 1, 2 HAVING count(*) >= {_AR_MIN_SUPPORT}
)
SELECT p.item_a, p.item_b,
       cast(p.n_ab AS bigint) AS n_ab,
       cast(floor(1000000.0 * p.n_ab / fa.n + 0.5) AS bigint) AS confidence_micro,
       cast(floor(1000000.0 * p.n_ab * nu.n / (fa.n * fb.n) + 0.5) AS bigint) AS lift_micro
FROM pairs p
JOIN freq fa ON fa.event_type = p.item_a
JOIN freq fb ON fb.event_type = p.item_b, nu
ORDER BY p.item_a, p.item_b
"""


# --------------------------------------------------------------------------
# Time-weighted average (X9 [EXT] time series)
# --------------------------------------------------------------------------


def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X9 per-user time-weighted average value (TWAP): each
    observation holds until the user's next event; the average weights
    each value by its holding time in integer microseconds. One lead()
    window per user (ties broken on event_id for a total order), decimal
    value*duration sums, and a double division at the end — the
    time-series aggregate sensor/price pipelines need, exact across
    engines. Users with a single event (no interval) are excluded."""
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = (
        e.select("user_id", "event_id", "ts", "value")
        .withColumn("next_us", F.lead(F.unix_micros(F.col("ts"))).over(w))
        .where(F.col("next_us").isNotNull())
        .select(
            "user_id",
            (F.col("next_us") - F.unix_micros(F.col("ts"))).alias("dur_us"),
            "value",
        )
    )
    return (
        iv.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            F.sum("dur_us").cast("bigint").alias("total_us"),
            F.floor(
                F.lit(1000000.0)
                * F.sum((F.col("value") * F.col("dur_us")).cast("decimal(38,6)")).cast(
                    "double"
                )
                / F.sum("dur_us")
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("twap_micro"),
        )
        .orderBy("user_id")
    )


_ORACLE_TWAP = """
WITH iv AS (
  SELECT user_id,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - epoch_us(ts) AS dur_us,
         value
  FROM events
)
SELECT user_id,
       cast(count(*) AS bigint) AS n_intervals,
       cast(sum(dur_us) AS bigint) AS total_us,
       cast(floor(1000000.0 * cast(sum(cast(value * dur_us AS decimal(38,6))) AS double) / sum(dur_us) + 0.5) AS bigint) AS twap_micro
FROM iv WHERE dur_us IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


# --------------------------------------------------------------------------
# Benford first-digit DQ check (W/DQ [EXT])
# --------------------------------------------------------------------------


def q_benford_digit_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] DQ: first-significant-digit distribution of o_totalprice
    against the Benford expectation log10(1+1/d) — the classic synthetic
    -data / fraud screen. Output per digit: count, observed share and
    expected share (micro-scaled; the expectation is computed in-engine
    so both sides evaluate identical doubles). A fabricated uniform
    price column fails this check loudly — which the fixture does,
    making the output non-vacuous."""
    o = _t(spark, sf_dir, "orders")
    digits = o.select(
        F.substring(
            F.floor(F.abs(F.col("o_totalprice"))).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    ).where(F.col("digit") >= 1)
    total = digits.count()  # scalar anchor, one job
    return (
        digits.groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            "digit",
            "n",
            F.floor(F.lit(1000000.0) * F.col("n") / F.lit(float(total)) + F.lit(0.5))
            .cast("bigint")
            .alias("observed_micro"),
            F.floor(
                F.lit(1000000.0) * F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("expected_micro"),
        )
        .orderBy("digit")
    )


_ORACLE_BENFORD = """
WITH digits AS (
  SELECT cast(substr(cast(cast(floor(abs(o_totalprice)) AS bigint) AS varchar), 1, 1) AS int) AS digit
  FROM orders
),
filtered AS (SELECT digit FROM digits WHERE digit >= 1),
total AS (SELECT cast(count(*) AS double) AS t FROM filtered)
SELECT digit,
       cast(count(*) AS bigint) AS n,
       cast(floor(1000000.0 * count(*) / total.t + 0.5) AS bigint) AS observed_micro,
       cast(floor(1000000.0 * log10(1.0 + 1.0 / digit) + 0.5) AS bigint) AS expected_micro
FROM filtered, total
GROUP BY digit, total.t ORDER BY digit
"""


REGISTRY_EXT25: dict[str, QuerySpec] = {
    "cohort_retention": QuerySpec(
        q_cohort_retention, _ORACLE_COHORT, "X9 [EXT] retention triangle"
    ),
    "assoc_rules_lift": QuerySpec(
        q_assoc_rules_lift, _ORACLE_ASSOC, "X9 [EXT] market basket"
    ),
    "time_weighted_avg": QuerySpec(q_time_weighted_avg, _ORACLE_TWAP, "X9 [EXT] TWAP"),
    "benford_digit_check": QuerySpec(
        q_benford_digit_check, _ORACLE_BENFORD, "DQ [EXT] Benford screen"
    ),
}
