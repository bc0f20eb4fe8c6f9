"""Operator registry, wave 49: supervised-data preparation ops —
histogram split finding, probability calibration bins, and grouped
k-fold assignment.

Scale stances:
- Split finder: the EXACT shape distributed GBDT implementations
  (XGBoost/LightGBM `hist`) use — the fact table reduces map-side to
  per-(feature, bin) label histograms (domain-bounded frames), the
  left/right cumulative counts are windows PARTITIONED by feature,
  and the best-split argmax runs over bins, never rows. Scores stay
  bit-deterministic: integer histogram counts convert exactly to
  doubles (< 2^53) and the score is two correctly-rounded IEEE
  divisions plus one addition — identical in any engine.
- Calibration: per-row predictions land on micro-ints before any sum;
  the reliability diagram is a 10-bucket aggregate.
- Grouped k-fold: fold = md5-prefix hash of the GROUP key (user), the
  leakage-proof assignment (every event of a user lands in one fold);
  pure projection + aggregate, the established stratified_sample_md5
  idiom.

Reference parity: none (no ML surface in the reference); [EXT] X7/X8
tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import QuerySpec, _t
from .sources.read import hour_of_day

# --------------------------------------------------------------------------
# Histogram split finder (X7 [EXT])
# --------------------------------------------------------------------------

_SPLIT_POS = "purchase"  # binary label: event_type == 'purchase'


def q_histogram_split_finder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 histogram-based best-split search (the core of
    distributed gradient-boosted trees): for the binary label
    event_type=='{pos}', find per feature the threshold bin minimizing
    weighted Gini impurity. Features: value (10-unit bins) and
    hour-of-day. The fact table reduces to per-(feature, bin) label
    histograms; cumulative left/right counts are feature-partitioned
    windows; the split score maximizes
    (posL^2+negL^2)/nL + (posR^2+negR^2)/nR — exact-int numerators,
    two IEEE divisions, deterministic across engines. Ties break on
    the smallest bin. The hour feature is pure integer arithmetic on
    unix_micros (sources.read.hour_of_day) — no calendar extraction,
    so the bin contents are identical under every hosting session's
    timezone/read-path posture (round-4 driver divergence)."""
    e = _t(spark, sf_dir, "events").select(
        F.when(F.col("event_type") == _SPLIT_POS, 1).otherwise(0).alias("y"),
        F.floor(F.col("value") / F.lit(10.0)).cast("bigint").alias("value_bin"),
        hour_of_day("ts").alias("hour_bin"),
    )
    hist = (
        e.select(F.lit("value").alias("feature"), F.col("value_bin").alias("bin"), "y")
        .unionByName(
            e.select(F.lit("hour").alias("feature"), F.col("hour_bin").alias("bin"), "y")
        )
        .groupBy("feature", "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("pos"),
        )
    )
    w = Window.partitionBy("feature").orderBy("bin")
    cum = hist.select(
        "feature",
        "bin",
        F.sum("n").over(w).alias("nl"),
        F.sum("pos").over(w).alias("posl"),
    )
    tot = hist.groupBy("feature").agg(
        F.sum("n").cast("bigint").alias("nt"), F.sum("pos").cast("bigint").alias("post")
    )
    scored = (
        cum.join(F.broadcast(tot), "feature")
        .where((F.col("nl") > 0) & (F.col("nt") - F.col("nl") > 0))
        .select(
            "feature",
            "bin",
            "nl",
            "posl",
            (F.col("nt") - F.col("nl")).alias("nr"),
            (F.col("post") - F.col("posl")).alias("posr"),
            (
                (
                    F.col("posl") * F.col("posl")
                    + (F.col("nl") - F.col("posl")) * (F.col("nl") - F.col("posl"))
                ).cast("double")
                / F.col("nl").cast("double")
                + (
                    (F.col("post") - F.col("posl")) * (F.col("post") - F.col("posl"))
                    + (F.col("nt") - F.col("nl") - F.col("post") + F.col("posl"))
                    * (F.col("nt") - F.col("nl") - F.col("post") + F.col("posl"))
                ).cast("double")
                / (F.col("nt") - F.col("nl")).cast("double")
            ).alias("score"),
        )
    )
    pick = Window.partitionBy("feature").orderBy(F.desc("score"), F.asc("bin"))
    return (
        scored.withColumn("rk", F.row_number().over(pick))
        .where(F.col("rk") == 1)
        .select(
            "feature",
            F.col("bin").alias("split_bin"),
            "nl",
            "posl",
            "nr",
            "posr",
            F.floor(F.lit(1e6) * F.col("score") + F.lit(0.5))
            .cast("bigint")
            .alias("score_micro"),
        )
        .orderBy("feature")
    )


_ORACLE_SPLIT = f"""
WITH e AS (
  SELECT CASE WHEN event_type = '{_SPLIT_POS}' THEN 1 ELSE 0 END AS y,
         cast(floor(value / 10.0) AS bigint) AS value_bin,
         cast((epoch_us(ts) // 3600000000) % 24 AS bigint) AS hour_bin
  FROM events
),
long AS (
  SELECT 'value' AS feature, value_bin AS bin, y FROM e
  UNION ALL
  SELECT 'hour' AS feature, hour_bin AS bin, y FROM e
),
hist AS (
  SELECT feature, bin, count(*)::BIGINT AS n, sum(y)::BIGINT AS pos
  FROM long GROUP BY 1, 2
),
cum AS (
  SELECT feature, bin,
         sum(n) OVER (PARTITION BY feature ORDER BY bin) AS nl,
         sum(pos) OVER (PARTITION BY feature ORDER BY bin) AS posl
  FROM hist
),
tot AS (
  SELECT feature, sum(n)::BIGINT AS nt, sum(pos)::BIGINT AS post
  FROM hist GROUP BY 1
),
scored AS (
  SELECT c.feature, c.bin, c.nl, c.posl,
         (t.nt - c.nl) AS nr, (t.post - c.posl) AS posr,
         (cast(c.posl * c.posl + (c.nl - c.posl) * (c.nl - c.posl) AS double)
            / cast(c.nl AS double)
          + cast((t.post - c.posl) * (t.post - c.posl)
                 + (t.nt - c.nl - t.post + c.posl) * (t.nt - c.nl - t.post + c.posl)
                 AS double) / cast(t.nt - c.nl AS double)) AS score
  FROM cum c JOIN tot t USING (feature)
  WHERE c.nl > 0 AND t.nt - c.nl > 0
),
p AS (
  SELECT *, row_number() OVER (PARTITION BY feature
                               ORDER BY score DESC, bin ASC) AS rk
  FROM scored
)
SELECT feature, bin AS split_bin,
       nl::BIGINT AS nl, posl::BIGINT AS posl,
       nr::BIGINT AS nr, posr::BIGINT AS posr,
       cast(floor(1e6 * score + 0.5) AS bigint) AS score_micro
FROM p WHERE rk = 1 ORDER BY feature
"""


# --------------------------------------------------------------------------
# Calibration / reliability bins (X7 [EXT])
# --------------------------------------------------------------------------


def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 reliability diagram: treating value/500 as a predicted
    probability of the 'purchase' label, bucket predictions into 10
    bins and report per bin the count, mean predicted probability and
    observed positive rate (all micro-ints), plus the bin's absolute
    calibration gap — the per-bin terms of expected calibration error.
    Per-row predictions floor onto micro-ints BEFORE summation, so the
    aggregate is integer-deterministic; one map-side-combinable
    aggregate over the facts."""
    e = _t(spark, sf_dir, "events").select(
        F.when(F.col("event_type") == _SPLIT_POS, 1).otherwise(0).alias("y"),
        F.least(
            F.floor(F.col("value") / F.lit(50.0)).cast("bigint"), F.lit(9).cast("bigint")
        ).alias("pbin"),
        F.floor(F.lit(1e6) * F.col("value") / F.lit(500.0) + F.lit(0.5))
        .cast("bigint")
        .alias("pred_micro"),
    )
    return (
        e.groupBy("pbin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.floor(F.sum("pred_micro") / F.count(F.lit(1)) + F.lit(0.5))
            .cast("bigint")
            .alias("mean_pred_micro"),
            F.floor(F.lit(1e6) * F.sum("y") / F.count(F.lit(1)) + F.lit(0.5))
            .cast("bigint")
            .alias("frac_pos_micro"),
        )
        .withColumn(
            "abs_gap_micro",
            F.abs(F.col("mean_pred_micro") - F.col("frac_pos_micro")).cast("bigint"),
        )
        .orderBy("pbin")
    )


_ORACLE_CALIBRATION = f"""
WITH e AS (
  SELECT CASE WHEN event_type = '{_SPLIT_POS}' THEN 1 ELSE 0 END AS y,
         least(cast(floor(value / 50.0) AS bigint), 9) AS pbin,
         cast(floor(1e6 * value / 500.0 + 0.5) AS bigint) AS pred_micro
  FROM events
),
b AS (
  SELECT pbin, count(*)::BIGINT AS n,
         cast(floor(sum(pred_micro) / count(*) + 0.5) AS bigint) AS mean_pred_micro,
         cast(floor(1e6 * sum(y) / count(*) + 0.5) AS bigint) AS frac_pos_micro
  FROM e GROUP BY 1
)
SELECT pbin, n, mean_pred_micro, frac_pos_micro,
       cast(abs(mean_pred_micro - frac_pos_micro) AS bigint) AS abs_gap_micro
FROM b ORDER BY pbin
"""


# --------------------------------------------------------------------------
# Grouped k-fold assignment (X8 [EXT])
# --------------------------------------------------------------------------

_KFOLD = 5


def q_group_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X8 grouped {k}-fold cross-validation assignment: the fold
    is a function of the USER (md5-prefix hash mod {k}), so all of a
    user's events share one fold — the assignment that prevents
    user-level leakage between train and validation. No RNG state, no
    order dependence: re-running on any partitioning yields identical
    folds (the deterministic-split contract of split_train_val_test).
    Reports per fold: users, events, positives."""
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.when(F.col("event_type") == _SPLIT_POS, 1).otherwise(0).alias("y"),
        (
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            % F.lit(_KFOLD)
        ).alias("fold"),
    )
    return (
        e.groupBy("fold")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("y").cast("bigint").alias("n_pos"),
        )
        .orderBy("fold")
    )


_ORACLE_KFOLD = f"""
WITH e AS (
  SELECT user_id,
         CASE WHEN event_type = '{_SPLIT_POS}' THEN 1 ELSE 0 END AS y,
         ('0x' || substr(md5(cast(user_id AS varchar)), 1, 8))::BIGINT
           % {_KFOLD} AS fold
  FROM events
)
SELECT fold, count(DISTINCT user_id)::BIGINT AS n_users,
       count(*)::BIGINT AS n_events, sum(y)::BIGINT AS n_pos
FROM e GROUP BY 1 ORDER BY fold
"""


REGISTRY_EXT48: dict[str, QuerySpec] = {
    "histogram_split_finder": QuerySpec(
        q_histogram_split_finder, _ORACLE_SPLIT, "X7 [EXT] GBDT split search"
    ),
    "calibration_bins": QuerySpec(
        q_calibration_bins, _ORACLE_CALIBRATION, "X7 [EXT] reliability diagram"
    ),
    "group_kfold_assignment": QuerySpec(
        q_group_kfold_assignment, _ORACLE_KFOLD, "X8 [EXT] leakage-safe CV folds"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_histogram_split_finder.__doc__ = q_histogram_split_finder.__doc__.format(pos=_SPLIT_POS)  # noqa: E501
q_group_kfold_assignment.__doc__ = q_group_kfold_assignment.__doc__.format(k=_KFOLD)  # noqa: E501
