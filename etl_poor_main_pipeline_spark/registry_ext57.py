"""Operator registry, wave 58: temporal-split Markov evaluation,
weekday seasonality indices, and join-fanout profiling.

Scale stances:
- Markov eval: the time-respecting train/test split every sequence
  model needs — transitions learned on the first half of the clock,
  accuracy measured on the second, no leakage. Transition argmax is a
  rank window over the (states x states)-bounded matrix; test pairs
  come from lag windows PARTITIONED by user.
- Seasonality: integer cent sums; each index is a cross-multiplied
  exact-decimal ratio (no double summation).
- Fanout profile: the join-cardinality histogram a planner consults
  before a big join — per-key counts, then a histogram over the
  (max-fanout)-bounded frame, plus both orphan directions via anti
  joins.

Reference parity: none; [EXT] X7/X9 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import QuerySpec, _t

# --------------------------------------------------------------------------
# Temporal-split Markov top-1 accuracy (X9 [EXT])
# --------------------------------------------------------------------------


def q_markov_top1_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X9 next-event model evaluation with a TEMPORAL split:
    per-user transition pairs before the corpus time midpoint train a
    Markov model (per current state, the most frequent next state,
    count-desc/state-asc tie-break); pairs after the midpoint measure
    top-1 accuracy — the leakage-free protocol for sequence models.
    Pair building is a lag window PARTITIONED by user; the transition
    matrix and its argmax are states^2-bounded; test scoring is one
    broadcast join."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("t_us"), "event_id"
    )
    mid = e.agg(
        ((F.min("t_us") + F.max("t_us")) / F.lit(2)).cast("bigint").alias("mid")
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    pairs = (
        e.withColumn("nxt", F.lead("event_type").over(w))
        .withColumn("nxt_t", F.lead("t_us").over(w))
        .where(F.col("nxt").isNotNull())
        .crossJoin(F.broadcast(mid))
        # a pair belongs to train iff it COMPLETES before the midpoint
        .select(
            "event_type",
            "nxt",
            (F.col("nxt_t") < F.col("mid")).alias("is_train"),
        )
    )
    trans = (
        pairs.where(F.col("is_train"))
        .groupBy("event_type", "nxt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    pick = Window.partitionBy("event_type").orderBy(F.desc("c"), F.asc("nxt"))
    model = (
        trans.withColumn("rk", F.row_number().over(pick))
        .where(F.col("rk") == 1)
        .select("event_type", F.col("nxt").alias("pred"))
    )
    test = pairs.where(~F.col("is_train"))
    scored = test.join(F.broadcast(model), "event_type", "left")
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(F.when(F.col("nxt") == F.col("pred"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_correct"),
        )
        .withColumn(
            "acc_micro",
            F.floor(F.lit(1e6) * F.col("n_correct") / F.col("n_test") + F.lit(0.5))
            .cast("bigint"),
        )
        .orderBy("event_type")
    )


_ORACLE_MARKOV_ACC = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS t_us, event_id FROM events
),
mid AS (SELECT cast((min(t_us) + max(t_us)) / 2 AS bigint) AS mid FROM e),
pairs AS (
  SELECT event_type, nxt, (nxt_t < (SELECT mid FROM mid)) AS is_train
  FROM (
    SELECT event_type,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS nxt,
           lead(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS nxt_t
    FROM e
  ) WHERE nxt IS NOT NULL
),
trans AS (
  SELECT event_type, nxt, count(*)::BIGINT AS c
  FROM pairs WHERE is_train GROUP BY 1, 2
),
model AS (
  SELECT event_type, nxt AS pred FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type
                                 ORDER BY c DESC, nxt ASC) AS rk
    FROM trans
  ) WHERE rk = 1
),
test AS (SELECT * FROM pairs WHERE NOT is_train)
SELECT t.event_type, count(*)::BIGINT AS n_test,
       sum(CASE WHEN t.nxt = m.pred THEN 1 ELSE 0 END)::BIGINT AS n_correct,
       cast(floor(1e6 * sum(CASE WHEN t.nxt = m.pred THEN 1 ELSE 0 END)
                  / count(*) + 0.5) AS bigint) AS acc_micro
FROM test t LEFT JOIN model m USING (event_type)
GROUP BY 1 ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Weekday seasonality index (X7 [EXT])
# --------------------------------------------------------------------------


def q_weekday_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 weekday seasonality: per (event_type, ISO weekday),
    the mean value as an index against the type's overall mean (1e6 =
    no effect) — the de-seasonalization lookup every forecast and
    anomaly job joins against. Index = cross-multiplied exact ratio
    sum_dw * n_all / (n_dw * sum_all) in decimal(38,0) — no double
    summation, one exact division to a micro."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.dayofweek("ts").cast("bigint").alias("dow"),
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("bigint").alias("v"),
    )
    per_dw = e.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dw"),
        F.sum(F.col("v").cast("decimal(38,0)")).alias("s_dw"),
    )
    per_t = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        F.sum(F.col("v").cast("decimal(38,0)")).alias("s_all"),
    )
    return (
        per_dw.join(F.broadcast(per_t), "event_type")
        .select(
            "event_type",
            "dow",
            "n_dw",
            F.floor(
                F.lit(1e6)
                * (F.col("s_dw") * F.col("n_all").cast("decimal(38,0)")).cast("double")
                / (F.col("n_dw").cast("decimal(38,0)") * F.col("s_all")).cast("double")
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("index_micro"),
        )
        .orderBy("event_type", "dow")
    )


_ORACLE_SEASONALITY = """
WITH e AS (
  SELECT event_type, cast(isodow(ts) % 7 + 1 AS bigint) AS dow,
         cast(floor(value * 100.0 + 0.5) AS bigint) AS v
  FROM events
),
per_dw AS (
  SELECT event_type, dow, count(*)::BIGINT AS n_dw,
         sum(cast(v AS hugeint)) AS s_dw
  FROM e GROUP BY 1, 2
),
per_t AS (
  SELECT event_type, count(*)::BIGINT AS n_all, sum(cast(v AS hugeint)) AS s_all
  FROM e GROUP BY 1
)
SELECT d.event_type, d.dow, d.n_dw,
       cast(floor(1e6 * cast(d.s_dw * t.n_all AS double)
                  / cast(d.n_dw * t.s_all AS double) + 0.5) AS bigint)
         AS index_micro
FROM per_dw d JOIN per_t t USING (event_type)
ORDER BY event_type, dow
"""


# --------------------------------------------------------------------------
# Join-fanout profile (X7/W [EXT])
# --------------------------------------------------------------------------


def q_join_fanout_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7/W join-cardinality profile for orders -> lineitem: the
    histogram of per-order line counts plus both orphan directions —
    what a planner (or a data engineer sizing a shuffle) checks before
    a big join. Per-key counts aggregate map-side; the histogram runs
    over the max-fanout-bounded frame; orphans are anti-join counts.
    Output rows: one per observed fanout, plus 'orphan_order' /
    'orphan_line' audit rows (fanout = 0/-1)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    per_key = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("fanout")
    )
    hist = (
        o.join(per_key, o.o_orderkey == per_key.l_orderkey, "inner")
        .groupBy("fanout")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )
    orphan_orders = o.join(
        per_key, o.o_orderkey == per_key.l_orderkey, "left_anti"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    orphan_lines = li.join(
        o, li.l_orderkey == o.o_orderkey, "left_anti"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    audit = orphan_orders.select(
        F.lit(0).cast("bigint").alias("fanout"), F.col("n").alias("n_orders")
    ).unionByName(
        orphan_lines.select(
            F.lit(-1).cast("bigint").alias("fanout"), F.col("n").alias("n_orders")
        )
    )
    return hist.unionByName(audit).orderBy("fanout")


_ORACLE_FANOUT = """
WITH per_key AS (
  SELECT l_orderkey, count(*)::BIGINT AS fanout FROM lineitem GROUP BY 1
),
hist AS (
  SELECT p.fanout, count(*)::BIGINT AS n_orders
  FROM orders o JOIN per_key p ON o.o_orderkey = p.l_orderkey
  GROUP BY 1
),
orphan_orders AS (
  SELECT 0::BIGINT AS fanout, count(*)::BIGINT AS n_orders
  FROM orders o WHERE NOT EXISTS
    (SELECT 1 FROM per_key p WHERE p.l_orderkey = o.o_orderkey)
),
orphan_lines AS (
  SELECT (-1)::BIGINT AS fanout, count(*)::BIGINT AS n_orders
  FROM lineitem l WHERE NOT EXISTS
    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
)
SELECT * FROM hist
UNION ALL SELECT * FROM orphan_orders
UNION ALL SELECT * FROM orphan_lines
ORDER BY fanout
"""


REGISTRY_EXT57: dict[str, QuerySpec] = {
    "markov_top1_accuracy": QuerySpec(
        q_markov_top1_accuracy, _ORACLE_MARKOV_ACC, "X9 [EXT] sequence-model eval"
    ),
    "weekday_seasonality_index": QuerySpec(
        q_weekday_seasonality_index, _ORACLE_SEASONALITY, "X7 [EXT] seasonality lookup"
    ),
    "join_fanout_profile": QuerySpec(
        q_join_fanout_profile, _ORACLE_FANOUT, "X7/W [EXT] join cardinality audit"
    ),
}
