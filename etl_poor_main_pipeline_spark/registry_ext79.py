"""Operator registry, wave 80: uplift measurement, conformal
calibration, and physical-plan skew budgeting.

Scale stances:
- Qini: user-level features fold in one grouped aggregate; the curve
  walks SCORE BUCKETS (a small discrete domain by construction), so
  the cumulative sums run as a broadcast non-equi self-join over the
  aggregated bucket frame — tens of rows — never a global window
  over users.
- Conformal: calibration/test split is an md5-prefix projection;
  per-group interval width is an ORDER-STATISTIC rank pick
  (value at rank ceil((n_cal+1)*(1-alpha)) under a group-PARTITIONED
  window — engines agree exactly, unlike interpolated quantiles);
  coverage audit is one conditional aggregate.
- Salt planner: the key histogram is one aggregate; per-key salt
  factors and the projected post-salt max partition are pure
  expressions — the advisory artifact a skew-aware job submits
  before the real join.

Reference parity: none; [EXT] X7/X8/X9 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import QuerySpec, _t

# --------------------------------------------------------------------------
# Qini uplift curve by score bucket (X7/X9 [EXT])
# --------------------------------------------------------------------------


def q_uplift_qini_by_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7/X9 Qini uplift curve: treatment = odd user_id,
    targeting score = the user's click count (a small discrete
    domain — buckets, not quantiles), response = any purchase.
    Walking buckets from the highest score down, the curve reports
    cumulative treated/control counts and responses plus the Qini
    value n_resp_t - n_resp_c * (n_t / n_c) — how much extra
    response targeting the top buckets earns. The cumulative walk
    runs as a broadcast non-equi self-join over the AGGREGATED
    bucket frame (tens of rows by construction), never a global
    window over users."""
    ev = _t(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("score"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("resp"),
    )
    buckets = (
        users.withColumn("treat", F.col("user_id") % 2 == 1)
        .groupBy("score")
        .agg(
            F.sum(F.when(F.col("treat"), 1).otherwise(0)).cast("bigint").alias("n_t"),
            F.sum(F.when(~F.col("treat"), 1).otherwise(0)).cast("bigint").alias("n_c"),
            F.sum(F.when(F.col("treat"), F.col("resp")).otherwise(0))
            .cast("bigint")
            .alias("r_t"),
            F.sum(F.when(~F.col("treat"), F.col("resp")).otherwise(0))
            .cast("bigint")
            .alias("r_c"),
        )
    )
    rhs = buckets.selectExpr(
        "score as s2", "n_t as n_t2", "n_c as n_c2", "r_t as r_t2", "r_c as r_c2"
    )
    cum = (
        buckets.join(F.broadcast(rhs), F.expr("s2 >= score"), "left")
        .groupBy("score", "n_t", "n_c", "r_t", "r_c")
        .agg(
            F.sum("n_t2").cast("bigint").alias("cn_t"),
            F.sum("n_c2").cast("bigint").alias("cn_c"),
            F.sum("r_t2").cast("bigint").alias("cr_t"),
            F.sum("r_c2").cast("bigint").alias("cr_c"),
        )
    )
    qini = F.when(F.col("cn_c") == 0, F.col("cr_t").cast("double")).otherwise(
        F.col("cr_t").cast("double")
        - F.col("cr_c").cast("double")
        * (F.col("cn_t").cast("double") / F.col("cn_c").cast("double"))
    )
    return cum.select(
        "score",
        "n_t",
        "n_c",
        "cn_t",
        "cn_c",
        "cr_t",
        "cr_c",
        F.floor(qini * F.lit(1e3) + F.lit(0.5)).cast("bigint").alias("qini_milli"),
    ).orderBy(F.desc("score"))


_ORACLE_QINI = """
WITH users AS (
  SELECT user_id,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS score,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS resp
  FROM events GROUP BY user_id
),
buckets AS (
  SELECT score,
         sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_t,
         sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_c,
         sum(CASE WHEN user_id % 2 = 1 THEN resp ELSE 0 END)::BIGINT AS r_t,
         sum(CASE WHEN user_id % 2 = 0 THEN resp ELSE 0 END)::BIGINT AS r_c
  FROM users GROUP BY score
),
cum AS (
  SELECT b.score, b.n_t, b.n_c, b.r_t, b.r_c,
         sum(b2.n_t)::BIGINT AS cn_t, sum(b2.n_c)::BIGINT AS cn_c,
         sum(b2.r_t)::BIGINT AS cr_t, sum(b2.r_c)::BIGINT AS cr_c
  FROM buckets b LEFT JOIN buckets b2 ON b2.score >= b.score
  GROUP BY b.score, b.n_t, b.n_c, b.r_t, b.r_c
)
SELECT score, n_t, n_c, cn_t, cn_c, cr_t, cr_c,
       cast(floor((CASE WHEN cn_c = 0 THEN cast(cr_t AS double)
                   ELSE cast(cr_t AS double)
                        - cast(cr_c AS double) * (cast(cn_t AS double) / cast(cn_c AS double)) END)
                  * 1000.0 + 0.5) AS bigint) AS qini_milli
FROM cum ORDER BY score DESC
"""


# --------------------------------------------------------------------------
# Split-conformal interval calibration (X7/X8 [EXT])
# --------------------------------------------------------------------------

_CONF_ALPHA_PCT = 10  # 90% target coverage
_CONF_CAL_PREFIX = "8"  # md5 half -> calibration, rest -> test


def q_conformal_interval_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7/X8 split-conformal prediction intervals: the model is
    the per-event_type calibration mean; nonconformity = |value -
    mean| in exact micros. The calibration half (md5-prefix split, no
    RNG) yields the interval half-width as an ORDER-STATISTIC — the
    residual at rank ceil((n_cal+1)*(1-alpha)) under a type-
    PARTITIONED window (engines agree exactly; interpolated
    quantiles would not). The held-out half then audits empirical
    coverage against the {c}% target — the distribution-free
    guarantee check."""
    ev = _t(spark, sf_dir, "events").selectExpr(
        "event_type",
        "event_id",
        "cast(floor(1e6 * value + 0.5) as bigint) as vm",
        f"substr(md5(cast(event_id as string)), 1, 1) < '{_CONF_CAL_PREFIX}' as is_cal",
    )
    mean = ev.where("is_cal").groupBy("event_type").agg(
        F.floor(
            F.sum("vm").cast("double") / F.count(F.lit(1)).cast("double") + F.lit(0.5)
        )
        .cast("bigint")
        .alias("mu"),
        F.count(F.lit(1)).cast("bigint").alias("n_cal"),
    )
    cal = (
        ev.where("is_cal")
        .join(F.broadcast(mean), "event_type")
        .selectExpr("event_type", "abs(vm - mu) as res", "n_cal", "event_id")
    )
    wr = Window.partitionBy("event_type").orderBy("res", "event_id")
    width = (
        cal.withColumn("rk", F.row_number().over(wr))
        .where(
            F.col("rk")
            == F.ceil(
                (F.col("n_cal") + 1).cast("double")
                * F.lit((100 - _CONF_ALPHA_PCT) / 100.0)
            ).cast("int")
        )
        .selectExpr("event_type", "res as half_width")
    )
    test = ev.where("NOT is_cal")
    return (
        test.join(F.broadcast(mean.select("event_type", "mu", "n_cal")), "event_type")
        .join(F.broadcast(width), "event_type")
        .groupBy("event_type", "mu", "n_cal", "half_width")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(
                F.when(
                    F.expr("abs(vm - mu) <= half_width"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_covered"),
        )
        .selectExpr(
            "event_type",
            "n_cal",
            "n_test",
            "half_width",
            "n_covered",
            "cast(floor(cast(n_covered as double) / cast(n_test as double) * 1000000.0 + 0.5) as bigint) as coverage_micro",
        )
        .orderBy("event_type")
    )


_ORACLE_CONFORMAL = f"""
WITH ev AS (
  SELECT event_type, event_id,
         cast(floor(1000000.0 * value + 0.5) AS bigint) AS vm,
         substr(md5(cast(event_id AS varchar)), 1, 1) < '{_CONF_CAL_PREFIX}' AS is_cal
  FROM events
),
mean AS (
  SELECT event_type,
         cast(floor(cast(sum(vm) AS double) / count(*) + 0.5) AS bigint) AS mu,
         count(*)::BIGINT AS n_cal
  FROM ev WHERE is_cal GROUP BY event_type
),
cal AS (
  SELECT e.event_type, abs(e.vm - m.mu) AS res, m.n_cal, e.event_id
  FROM ev e JOIN mean m USING (event_type) WHERE e.is_cal
),
width AS (
  SELECT event_type, res AS half_width FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY res, event_id) AS rk
    FROM cal
  ) WHERE rk = cast(ceil(cast(n_cal + 1 AS double) * {(100 - _CONF_ALPHA_PCT) / 100.0!r}) AS int)
)
SELECT e.event_type, m.n_cal, count(*)::BIGINT AS n_test, w.half_width,
       sum(CASE WHEN abs(e.vm - m.mu) <= w.half_width THEN 1 ELSE 0 END)::BIGINT AS n_covered,
       cast(floor(cast(sum(CASE WHEN abs(e.vm - m.mu) <= w.half_width
                               THEN 1 ELSE 0 END) AS double)
                  / cast(count(*) AS double) * 1000000.0 + 0.5)
            AS bigint) AS coverage_micro
FROM ev e JOIN mean m USING (event_type) JOIN width w USING (event_type)
WHERE NOT e.is_cal
GROUP BY e.event_type, m.n_cal, w.half_width
ORDER BY e.event_type
"""


# --------------------------------------------------------------------------
# Salt-factor planner (X9/E [EXT])
# --------------------------------------------------------------------------

_SALT_TARGET_ROWS = 20  # rows per (key, salt) slice the plan aims for


def q_salt_factor_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X9/E skew-salting plan advisor: the l_partkey histogram
    (one aggregate) yields, for every key heavier than the target
    slice of {t} rows, the salt factor ceil(count/target) plus the
    projected per-slice row counts — the artifact a skew-aware join
    submits as a broadcast plan before shuffling the real data.
    Reports only keys needing salt, plus summary columns (broadcast
    1-row) projecting the pre/post-salt maximum partition
    load."""
    li = _t(spark, sf_dir, "lineitem")
    hist = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    planned = hist.withColumn(
        "salt_factor",
        F.ceil(F.col("cnt").cast("double") / F.lit(float(_SALT_TARGET_ROWS))).cast(
            "bigint"
        ),
    ).withColumn(
        "post_slice_rows",
        F.ceil(F.col("cnt").cast("double") / F.col("salt_factor").cast("double")).cast(
            "bigint"
        ),
    )
    summary = planned.agg(
        F.max("cnt").cast("bigint").alias("pre_max_rows"),
        F.max("post_slice_rows").cast("bigint").alias("post_max_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    )
    return (
        planned.where(F.col("salt_factor") > 1)
        .crossJoin(F.broadcast(summary))
        .select(
            "l_partkey",
            "cnt",
            "salt_factor",
            "post_slice_rows",
            "pre_max_rows",
            "post_max_rows",
            "n_keys",
        )
        .orderBy(F.desc("cnt"), F.asc("l_partkey"))
    )


_ORACLE_SALT = f"""
WITH hist AS (
  SELECT l_partkey, count(*)::BIGINT AS cnt FROM lineitem GROUP BY l_partkey
),
planned AS (
  SELECT l_partkey, cnt,
         cast(ceil(cast(cnt AS double) / {float(_SALT_TARGET_ROWS)!r}) AS bigint) AS salt_factor,
         cast(ceil(cast(cnt AS double)
                   / cast(ceil(cast(cnt AS double) / {float(_SALT_TARGET_ROWS)!r}) AS double))
              AS bigint) AS post_slice_rows
  FROM hist
),
summary AS (
  SELECT max(cnt)::BIGINT AS pre_max_rows,
         max(post_slice_rows)::BIGINT AS post_max_rows,
         count(*)::BIGINT AS n_keys
  FROM planned
)
SELECT l_partkey, cnt, salt_factor, post_slice_rows,
       pre_max_rows, post_max_rows, n_keys
FROM planned CROSS JOIN summary
WHERE salt_factor > 1
ORDER BY cnt DESC, l_partkey ASC
"""


REGISTRY_EXT79: dict[str, QuerySpec] = {
    "uplift_qini_by_score": QuerySpec(
        q_uplift_qini_by_score, _ORACLE_QINI, "X7/X9 [EXT] Qini uplift curve"
    ),
    "conformal_interval_calibration": QuerySpec(
        q_conformal_interval_calibration, _ORACLE_CONFORMAL, "X7/X8 [EXT] conformal"
    ),
    "salt_factor_planner": QuerySpec(
        q_salt_factor_planner, _ORACLE_SALT, "X9/E [EXT] skew plan advisor"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_conformal_interval_calibration.__doc__ = q_conformal_interval_calibration.__doc__.format(c=100 - _CONF_ALPHA_PCT)  # noqa: E501
q_salt_factor_planner.__doc__ = q_salt_factor_planner.__doc__.format(t=_SALT_TARGET_ROWS)  # noqa: E501
