"""Operator registry, wave 59: foreign-key conformance audit,
inter-arrival burstiness, and position-based multi-touch attribution.

Scale stances:
- FK audit: five parent-child relationships checked with anti-join
  counts (broadcast the parent key sets where small, shuffled
  left-anti otherwise — Catalyst picks); output is
  relationship-bounded.
- Burstiness: per-key lag windows; gap moments accumulate in
  decimal(38,0) so the coefficient of variation is exact-int under
  one sqrt.
- Attribution: conversions join their 7-day click lookback on
  (user, time-range) — the bounded-window join shape; position
  credit (40/20/40) is an exact rational of the touch count, floored
  to micro BEFORE the final aggregate.

Reference parity: none; [EXT] X7/X9/W tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import QuerySpec, _t

# --------------------------------------------------------------------------
# Foreign-key conformance audit (W/X7 [EXT])
# --------------------------------------------------------------------------

_FK_RELS = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
)


def q_fk_conformance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] W/X7 referential-integrity audit across the star schema:
    for each declared FK relationship, child row count and orphan
    count (child keys with no parent) — the conformance gate a
    warehouse load runs before publishing. One LEFT join per
    relationship against the distinct parent keys carries both counts
    in a single aggregate (a child row matches at most once, so
    count(*) is still the child count and a null parent marks an
    orphan) — the round-14 fold of the former anti-join + separate
    child-count pass per relationship (19 scheduler jobs -> 7).
    Catalyst broadcasts the small parent side."""
    out = None
    for child, ck, parent, pk in _FK_RELS:
        c = _t(spark, sf_dir, child).select(F.col(ck).alias("k"))
        p = (
            _t(spark, sf_dir, parent)
            .select(F.col(pk).alias("k"))
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        row = (
            c.join(p, "k", "left")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_child"),
                F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_orphans"),
            )
            .select(
                F.lit(f"{child}.{ck}->{parent}.{pk}").alias("relationship"),
                "n_child",
                "n_orphans",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("relationship")


def _oracle_fk() -> str:
    parts = []
    for child, ck, parent, pk in _FK_RELS:
        parts.append(
            f"""
SELECT '{child}.{ck}->{parent}.{pk}' AS relationship,
       (SELECT count(*)::BIGINT FROM {child}) AS n_child,
       (SELECT count(*)::BIGINT FROM {child} c
        WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                          WHERE p.{pk} = c.{ck})) AS n_orphans"""
        )
    return " UNION ALL ".join(parts) + " ORDER BY relationship"


# --------------------------------------------------------------------------
# Inter-arrival burstiness (X7/X9 [EXT])
# --------------------------------------------------------------------------


def q_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7/X9 inter-arrival analysis: per event_type, the mean
    gap, coefficient of variation, and the burstiness parameter
    B = (sigma - mu) / (sigma + mu) (Goh & Barabasi) — B ~ 0 for a
    Poisson process, B -> 1 for bursty traffic; the signal that sizes
    stream buffers and rate limits. Gaps are lag windows PARTITIONED
    by event_type in integer microseconds; moments accumulate in
    decimal(38,0), so everything up to the final sqrt is exact."""
    w = Window.partitionBy("event_type").orderBy("t_us", "event_id")
    gaps = (
        _t(spark, sf_dir, "events")
        .select("event_type", F.unix_micros("ts").alias("t_us"), "event_id")
        .withColumn("prev", F.lag("t_us").over(w))
        .where(F.col("prev").isNotNull())
        .select("event_type", (F.col("t_us") - F.col("prev")).alias("g"))
    )
    agg = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("g").cast("decimal(38,0)")).alias("sg"),
        F.sum((F.col("g").cast("decimal(38,0)") * F.col("g").cast("decimal(38,0)"))).alias("sgg"),
    )
    # n*sigma = sqrt(n*sgg - sg^2); mu = sg/n  =>  cv = n*sigma / sg
    nsigma = F.sqrt(
        (F.col("n").cast("decimal(38,0)") * F.col("sgg") - F.col("sg") * F.col("sg")).cast(
            "double"
        )
    )
    mu_us = F.col("sg").cast("double") / F.col("n")
    cv = nsigma / F.col("sg").cast("double")
    return agg.select(
        "event_type",
        "n",
        F.floor(mu_us / F.lit(1e6) * F.lit(1e3) + F.lit(0.5)).cast("bigint").alias(
            "mean_gap_ms"
        ),
        F.floor(F.lit(1e6) * cv + F.lit(0.5)).cast("bigint").alias("cv_micro"),
        F.floor(
            F.lit(1e6) * (nsigma - mu_us * F.col("n")) / (nsigma + mu_us * F.col("n"))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("burstiness_micro"),
    ).orderBy("event_type")


_ORACLE_BURSTINESS = """
WITH e AS (
  SELECT event_type, epoch_us(ts) AS t_us, event_id FROM events
),
gaps AS (
  SELECT event_type, g FROM (
    SELECT event_type,
           t_us - lag(t_us) OVER (PARTITION BY event_type
                                  ORDER BY t_us, event_id) AS g
    FROM e
  ) WHERE g IS NOT NULL
),
agg AS (
  SELECT event_type, count(*)::BIGINT AS n,
         sum(cast(g AS hugeint)) AS sg,
         sum(cast(g AS hugeint) * cast(g AS hugeint)) AS sgg
  FROM gaps GROUP BY 1
)
SELECT event_type, n,
       cast(floor(cast(sg AS double) / n / 1e6 * 1e3 + 0.5) AS bigint)
         AS mean_gap_ms,
       cast(floor(1e6 * sqrt(cast(n * sgg - sg * sg AS double))
                  / cast(sg AS double) + 0.5) AS bigint) AS cv_micro,
       cast(floor(1e6 * (sqrt(cast(n * sgg - sg * sg AS double))
                         - cast(sg AS double))
                  / (sqrt(cast(n * sgg - sg * sg AS double))
                     + cast(sg AS double)) + 0.5) AS bigint)
         AS burstiness_micro
FROM agg ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Position-based multi-touch attribution (X9 [EXT])
# --------------------------------------------------------------------------

_ATTR_LOOKBACK_H = 168  # 7 days


def q_attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X9 position-based (40/20/40) multi-touch attribution:
    every purchase distributes credit over the user's clicks in the
    prior {h}h — 40% to the first touch, 40% to the last, 20% split
    over the middles (1 touch: 100%; 2 touches: 50/50). Credit is an
    exact rational of the touch count floored to micro per touch, so
    the final roll-up (credit earned per click hour-of-day) is an
    integer aggregate. The conversions-to-touches join is
    (user, bounded-time-range) — state-bounded at any scale."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("t_us"), "event_id"
    )
    conv = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_id"), F.col("t_us").alias("p_t")
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("c_id"),
        F.col("t_us").alias("c_t"),
    )
    touches = conv.join(clicks, "user_id").where(
        (F.col("c_t") < F.col("p_t"))
        & (F.col("c_t") >= F.col("p_t") - F.lit(_ATTR_LOOKBACK_H * 3_600_000_000))
    )
    w = Window.partitionBy("p_id").orderBy("c_t", "c_id")
    wn = Window.partitionBy("p_id")
    ranked = touches.withColumn("rk", F.row_number().over(w)).withColumn(
        "nt", F.count(F.lit(1)).over(wn)
    )
    credit = (
        F.when(F.col("nt") == 1, F.lit(1_000_000))
        .when(F.col("nt") == 2, F.lit(500_000))
        .when(F.col("rk") == 1, F.lit(400_000))
        .when(F.col("rk") == F.col("nt"), F.lit(400_000))
        .otherwise(
            F.floor(F.lit(200_000.0) / (F.col("nt") - F.lit(2)) + F.lit(0.5))
        )
    )
    return (
        ranked.select(
            F.floor((F.col("c_t") / F.lit(3_600_000_000)) % 24).cast("bigint").alias(
                "click_hod_utc"
            ),
            credit.cast("bigint").alias("credit_micro"),
        )
        .groupBy("click_hod_utc")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum("credit_micro").cast("bigint").alias("credit_micro_sum"),
        )
        .orderBy("click_hod_utc")
    )


_ORACLE_ATTRIBUTION = f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS t_us, event_id FROM events
),
conv AS (
  SELECT user_id, event_id AS p_id, t_us AS p_t FROM e
  WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, event_id AS c_id, t_us AS c_t FROM e
  WHERE event_type = 'click'
),
touches AS (
  SELECT c.p_id, k.c_id, k.c_t
  FROM conv c JOIN clicks k ON k.user_id = c.user_id
  WHERE k.c_t < c.p_t
    AND k.c_t >= c.p_t - {_ATTR_LOOKBACK_H} * 3600000000
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY p_id ORDER BY c_t, c_id) AS rk,
         count(*) OVER (PARTITION BY p_id) AS nt
  FROM touches
),
credited AS (
  SELECT cast(floor((c_t / 3600000000.0)) AS bigint) % 24 AS click_hod_utc,
         cast(CASE WHEN nt = 1 THEN 1000000
                   WHEN nt = 2 THEN 500000
                   WHEN rk = 1 THEN 400000
                   WHEN rk = nt THEN 400000
                   ELSE cast(floor(200000.0 / (nt - 2) + 0.5) AS bigint)
              END AS bigint) AS credit_micro
  FROM ranked
)
SELECT click_hod_utc, count(*)::BIGINT AS n_touches,
       sum(credit_micro)::BIGINT AS credit_micro_sum
FROM credited GROUP BY 1 ORDER BY click_hod_utc
"""


REGISTRY_EXT58: dict[str, QuerySpec] = {
    "fk_conformance_audit": QuerySpec(
        q_fk_conformance_audit, _oracle_fk(), "W/X7 [EXT] referential integrity"
    ),
    "interarrival_burstiness": QuerySpec(
        q_interarrival_burstiness, _ORACLE_BURSTINESS, "X7/X9 [EXT] traffic shape"
    ),
    "attribution_position_based": QuerySpec(
        q_attribution_position_based, _ORACLE_ATTRIBUTION, "X9 [EXT] multi-touch credit"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_attribution_position_based.__doc__ = q_attribution_position_based.__doc__.format(h=_ATTR_LOOKBACK_H)  # noqa: E501
