"""Operator registry, wave 46: time-series II — trailing EWMA, CUSUM
changepoint detection, and largest-triangle downsampling.

Scale stances:
- EWMA: the classic recursive definition is a sequential scan; the
  production shape is the TRAILING-K truncated form (weights below
  1e-9 after 64 lags at alpha=0.3), which is a partitioned top-K per
  key — embarrassingly parallel, no global order. The 64 weights are
  embedded as IDENTICAL double literals in both engines (repr
  round-trips exactly), so no pow() library divergence can flip a
  floor: every per-row term lands on a nano-int before summation.
- CUSUM: D_t = n*cumsum_t - t*total is kept in pure bigint (value
  cents), so the argmax is exact; the cumulative sum is a window
  PARTITIONED by event_type — per-series parallel, and at 100 TB a
  series that outgrows one task would go through the Blelloch prefix
  helper (operators/scan_prefix.py) exactly like training_pack_*.
- LTTB: per-series fixed-width rank buckets (64 points each) reduce to
  per-bucket moment triples (sum_t, sum_v, count); the triangle-area
  argmax against NEIGHBOR-BUCKET AVERAGES is an integer cross product
  (fractions cleared by c_prev*c_next), so selection is exact and the
  only shuffles are the bucket aggregation and two bucket+/-1
  equi-joins on frames n/64 the input size. This is the simplified
  parallel variant of Steinarsson's LTTB (the sequential original
  chains on the previously *selected* point; using the previous
  bucket's average instead removes the chain, the standard
  parallelization).

Reference parity: no time-series surface exists in the reference
(SURVEY §2.6); [EXT] X7/X9 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import QuerySpec, _t

# --------------------------------------------------------------------------
# Trailing EWMA per event_type
# --------------------------------------------------------------------------

_EWMA_ALPHA = 0.3
_EWMA_K = 64
# w_k = alpha * (1-alpha)^(k-1), k = 1..K (newest first). Plain Python
# floats; repr() round-trips exactly, so both engines see bit-identical
# doubles and every product below is IEEE-determined.
_EWMA_W = [_EWMA_ALPHA * (1.0 - _EWMA_ALPHA) ** k for k in range(_EWMA_K)]


def q_ewma_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7/X9 trailing exponentially weighted moving average of
    events.value per event_type (alpha=0.3, truncated at 64 lags where
    the weight has decayed below 1e-10 of the head): the smoothed
    "current level" a monitoring pipeline keeps per key. Newest-first
    row_number is a window PARTITIONED by event_type; each term
    value*w[rn] uses a literal-embedded weight and lands on a nano-int,
    so the normalized average is integer-deterministic."""
    w_arr = F.array(*[F.lit(w) for w in _EWMA_W])
    win = Window.partitionBy("event_type").orderBy(
        F.desc("t_us"), F.desc("event_id")
    )
    e = (
        _t(spark, sf_dir, "events")
        .select(
            "event_type", "value", F.unix_micros("ts").alias("t_us"), "event_id"
        )
        .withColumn("rn", F.row_number().over(win))
        .where(F.col("rn") <= _EWMA_K)
    )
    terms = e.select(
        "event_type",
        F.floor(F.lit(1e9) * F.col("value") * F.element_at(w_arr, F.col("rn")) + F.lit(0.5))
        .cast("bigint")
        .alias("term_nano"),
        F.floor(F.lit(1e9) * F.element_at(w_arr, F.col("rn")) + F.lit(0.5))
        .cast("bigint")
        .alias("w_nano"),
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_used"),
            F.sum("term_nano").alias("st"),
            F.sum("w_nano").alias("sw"),
        )
        .select(
            "event_type",
            "n_used",
            F.floor(F.lit(1e6) * F.col("st") / F.col("sw") + F.lit(0.5))
            .cast("bigint")
            .alias("ewma_micro"),
        )
        .orderBy("event_type")
    )


def _oracle_ewma() -> str:
    w_list = ", ".join(repr(w) for w in _EWMA_W)
    return f"""
WITH e AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events
),
terms AS (
  SELECT event_type,
         cast(floor(1e9 * value * (list_value({w_list}))[rn] + 0.5) AS bigint)
           AS term_nano,
         cast(floor(1e9 * (list_value({w_list}))[rn] + 0.5) AS bigint) AS w_nano
  FROM e WHERE rn <= {_EWMA_K}
)
SELECT event_type, count(*)::BIGINT AS n_used,
       cast(floor(1e6 * sum(term_nano) / sum(w_nano) + 0.5) AS bigint)
         AS ewma_micro
FROM terms GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------------------------
# CUSUM changepoint per event_type
# --------------------------------------------------------------------------


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7/X9 CUSUM changepoint: per event_type, the time index
    maximizing |cumulative deviation from the series mean| — the
    standard single-changepoint locator. The statistic is cleared of
    fractions: D_t = n*cumsum_t - t*total (value cents), pure bigint,
    so the argmax (tie-break: earliest index) is exact. Cumsum and the
    argmax selection are both windows partitioned by event_type."""
    ord_w = Window.partitionBy("event_type").orderBy("t_us", "event_id")
    e = (
        _t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
            .cast("bigint")
            .alias("v"),
            F.unix_micros("ts").alias("t_us"),
            "event_id",
        )
        .withColumn("rn", F.row_number().over(ord_w))
        .withColumn("cum", F.sum("v").over(ord_w))
    )
    tot = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s"),
    )
    d = e.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "n",
        "rn",
        "t_us",
        (F.col("n") * F.col("cum") - F.col("rn") * F.col("s")).alias("d_t"),
    )
    pick_w = Window.partitionBy("event_type").orderBy(
        F.desc(F.abs(F.col("d_t"))), F.asc("rn")
    )
    return (
        d.withColumn("pick", F.row_number().over(pick_w))
        .where(F.col("pick") == 1)
        .select(
            "event_type",
            "n",
            F.col("rn").cast("bigint").alias("cp_idx"),
            F.col("t_us").cast("bigint").alias("cp_t_us"),
            F.abs(F.col("d_t")).cast("bigint").alias("d_max"),
            F.signum(F.col("d_t")).cast("bigint").alias("d_sign"),
        )
        .orderBy("event_type")
    )


_ORACLE_CUSUM = """
WITH e AS (
  SELECT event_type,
         cast(floor(value * 100.0 + 0.5) AS bigint) AS v,
         epoch_us(ts) AS t_us, event_id
  FROM events
),
r AS (
  SELECT event_type, v, t_us,
         row_number() OVER (PARTITION BY event_type ORDER BY t_us, event_id) AS rn,
         sum(v) OVER (PARTITION BY event_type ORDER BY t_us, event_id) AS cum
  FROM e
),
tot AS (
  SELECT event_type, count(*)::BIGINT AS n, sum(v)::BIGINT AS s
  FROM e GROUP BY 1
),
d AS (
  SELECT r.event_type, t.n, r.rn, r.t_us,
         (t.n * r.cum - r.rn * t.s) AS d_t
  FROM r JOIN tot t USING (event_type)
),
p AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY abs(d_t) DESC, rn ASC) AS pick
  FROM d
)
SELECT event_type, n, cast(rn AS bigint) AS cp_idx,
       cast(t_us AS bigint) AS cp_t_us,
       cast(abs(d_t) AS bigint) AS d_max,
       cast(sign(d_t) AS bigint) AS d_sign
FROM p WHERE pick = 1 ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Largest-triangle downsampling (bucketed LTTB variant)
# --------------------------------------------------------------------------

_LTTB_BUCKET = 64


def q_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7/X9 largest-triangle downsampling, per event_type: keep
    one visually-representative point per {b}-point rank bucket — the
    point forming the LARGEST TRIANGLE with the neighbor buckets'
    average points (Steinarsson's LTTB, parallel bucket-average
    variant). Buckets reduce to integer moment triples (sum_t, sum_v,
    count) on rebased SECONDS and value CENTS; the area comparison is
    an exact integer cross product (fractions cleared by the neighbor
    counts), tie-broken on the earliest rank. First/last buckets pin
    the series' first/last point, as LTTB requires. Shuffles: one
    bucket agg + two bucket+/-1 equi-joins on n/{b}-sized frames."""
    ord_w = Window.partitionBy("event_type").orderBy("t_us", "event_id")
    raw = _t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("bigint").alias("v"),
        F.unix_micros("ts").alias("t_us"),
        "event_id",
    )
    tmin = raw.groupBy("event_type").agg(F.min("t_us").alias("t0"))
    pts = (
        raw.join(F.broadcast(tmin), "event_type")
        .select(
            "event_type",
            "v",
            ((F.col("t_us") - F.col("t0")) / F.lit(1_000_000))
            .cast("bigint")
            .alias("t_s"),
            "t_us",
            "event_id",
        )
        .withColumn("rn", F.row_number().over(ord_w))
        .withColumn(
            "bkt", ((F.col("rn") - F.lit(1)) / F.lit(_LTTB_BUCKET)).cast("bigint")
        )
    )
    aggs = pts.groupBy("event_type", "bkt").agg(
        F.sum("t_s").cast("bigint").alias("st"),
        F.sum("v").cast("bigint").alias("sv"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    prev = aggs.select(
        "event_type",
        (F.col("bkt") + F.lit(1)).alias("bkt"),
        F.col("st").alias("st_a"),
        F.col("sv").alias("sv_a"),
        F.col("c").alias("c_a"),
    )
    nxt = aggs.select(
        "event_type",
        (F.col("bkt") - F.lit(1)).alias("bkt"),
        F.col("st").alias("st_b"),
        F.col("sv").alias("sv_b"),
        F.col("c").alias("c_b"),
    )
    scored = (
        pts.join(prev, ["event_type", "bkt"], "left")
        .join(nxt, ["event_type", "bkt"], "left")
        .withColumn(
            "area_num",
            F.abs(
                (F.col("t_s") * F.col("c_a") - F.col("st_a"))
                * (F.col("sv_b") * F.col("c_a") - F.col("sv_a") * F.col("c_b"))
                - (F.col("v") * F.col("c_a") - F.col("sv_a"))
                * (F.col("st_b") * F.col("c_a") - F.col("st_a") * F.col("c_b"))
            ),
        )
        .withColumn(
            "sel_key",
            F.when(F.col("c_a").isNull(), -F.col("rn"))  # first bucket: first point
            .when(F.col("c_b").isNull(), F.col("rn"))  # last bucket: last point
            .otherwise(F.col("area_num")),
        )
    )
    pick_w = Window.partitionBy("event_type", "bkt").orderBy(
        F.desc("sel_key"), F.asc("rn")
    )
    return (
        scored.withColumn("pick", F.row_number().over(pick_w))
        .where(F.col("pick") == 1)
        .select(
            "event_type",
            "bkt",
            F.col("rn").cast("bigint").alias("rn"),
            "t_s",
            F.col("v").alias("v_cents"),
        )
        .orderBy("event_type", "bkt")
    )


_ORACLE_LTTB = f"""
WITH raw AS (
  SELECT event_type,
         cast(floor(value * 100.0 + 0.5) AS bigint) AS v,
         epoch_us(ts) AS t_us, event_id
  FROM events
),
tmin AS (SELECT event_type, min(t_us) AS t0 FROM raw GROUP BY 1),
pts AS (
  SELECT r.event_type, r.v,
         cast((r.t_us - m.t0) // 1000000 AS bigint) AS t_s,
         row_number() OVER (PARTITION BY r.event_type
                            ORDER BY r.t_us, r.event_id) AS rn
  FROM raw r JOIN tmin m USING (event_type)
),
b AS (
  SELECT *, cast((rn - 1) // {_LTTB_BUCKET} AS bigint) AS bkt FROM pts
),
aggs AS (
  SELECT event_type, bkt, sum(t_s)::BIGINT AS st, sum(v)::BIGINT AS sv,
         count(*)::BIGINT AS c
  FROM b GROUP BY 1, 2
),
scored AS (
  SELECT p.event_type, p.bkt, p.rn, p.t_s, p.v,
         abs((p.t_s * a.c - a.st) * (n.sv * a.c - a.sv * n.c)
             - (p.v * a.c - a.sv) * (n.st * a.c - a.st * n.c)) AS area_num,
         a.c AS c_a, n.c AS c_b
  FROM b p
  LEFT JOIN aggs a ON a.event_type = p.event_type AND a.bkt = p.bkt - 1
  LEFT JOIN aggs n ON n.event_type = p.event_type AND n.bkt = p.bkt + 1
),
sel AS (
  SELECT *,
         CASE WHEN c_a IS NULL THEN -rn
              WHEN c_b IS NULL THEN rn
              ELSE area_num END AS sel_key
  FROM scored
),
p AS (
  SELECT *, row_number() OVER (PARTITION BY event_type, bkt
                               ORDER BY sel_key DESC, rn ASC) AS pick
  FROM sel
)
SELECT event_type, bkt, cast(rn AS bigint) AS rn, t_s, v AS v_cents
FROM p WHERE pick = 1 ORDER BY event_type, bkt
"""


REGISTRY_EXT45: dict[str, QuerySpec] = {
    "ewma_trailing": QuerySpec(
        q_ewma_trailing, _oracle_ewma(), "X7 [EXT] exponential smoothing"
    ),
    "cusum_changepoint": QuerySpec(
        q_cusum_changepoint, _ORACLE_CUSUM, "X7 [EXT] changepoint detection"
    ),
    "lttb_downsample": QuerySpec(
        q_lttb_downsample, _ORACLE_LTTB, "X7 [EXT] series downsampling"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_lttb_downsample.__doc__ = q_lttb_downsample.__doc__.format(b=_LTTB_BUCKET)  # noqa: E501
