"""Operator registry, wave 56: nested-percentile SLA reporting,
embedding centroid drift, and log-return volatility.

Scale stances:
- Nested percentile: the "p99 of per-user p95s" ops question — the
  inner p95 is a per-user aggregate (map-side partial, user-keyed
  shuffle), and the outer p99 runs over the USER-bounded frame, never
  the raw rows. Both percentiles ride the established 2x-integer
  exactness trick (no engine interpolation mismatch).
- Centroid drift: the embedding-monitoring primitive — per
  (label, half) centroids from decimal(28,12) sums (merge-order
  proof), then one cosine per label on a 10-row frame. Detects
  distribution shift between data halves before it poisons ANN
  serving.
- Volatility: per-series log returns on rank-adjacent pairs (windows
  PARTITIONED by event_type); each return lands on a nano-int, and
  the variance numerator n*sum(r^2) - (sum r)^2 stays exact-int under
  one sqrt.

Reference parity: none; [EXT] X3/X7 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import QuerySpec, _t

# --------------------------------------------------------------------------
# Nested percentile SLA (X7 [EXT])
# --------------------------------------------------------------------------


def q_nested_percentile_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 nested-percentile SLA: per event_type, the p99 ACROSS
    USERS of each user's p95 value — the correct way to report tail
    latency without letting heavy users dominate (the plain global p99
    is a different, usually wrong, number and is reported alongside
    for contrast). Percentiles are ORDER STATISTICS (value at rank
    ceil(p*n)) — pure integer selection, immune to the engine
    interpolation-order divergence that bites continuous percentiles
    at non-dyadic fractions. Inner p95: per-user sorted-array pick
    (arrays bounded by per-user event counts). Outer p99 and the
    global p99: domain-binned CDFs (value cents) with windows
    PARTITIONED by event_type — bin-bounded, never row-bounded."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("bigint").alias("v"),
    )
    per_user = e.groupBy("event_type", "user_id").agg(
        F.expr(
            "element_at(array_sort(collect_list(v)),"
            " cast((95 * count(v) + 99) div 100 as int))"
        )
        .cast("bigint")
        .alias("p95_c")
    )

    def _binned_pick(df, val, pct, out):
        """value at rank ceil(pct*n) via a domain-binned CDF."""
        bins = df.groupBy("event_type", val).agg(F.count(F.lit(1)).alias("c"))
        w = Window.partitionBy("event_type").orderBy(val)
        tot = df.groupBy("event_type").agg(F.count(F.lit(1)).alias("nt"))
        cum = bins.withColumn("cum", F.sum("c").over(w)).join(
            F.broadcast(tot), "event_type"
        )
        return (
            cum.where(
                F.col("cum") >= ((F.lit(pct) * F.col("nt") + F.lit(99)) / 100).cast("bigint")
            )
            .groupBy("event_type")
            .agg(F.min(val).cast("bigint").alias(out))
        )

    nested = _binned_pick(per_user, "p95_c", 99, "p99_of_p95_c")
    n_users = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    flat = _binned_pick(e, "v", 99, "global_p99_c")
    return (
        n_users.join(nested, "event_type").join(flat, "event_type").orderBy("event_type")
    )


_ORACLE_NESTED_PCT = """
WITH e AS (
  SELECT event_type, user_id,
         cast(floor(value * 100.0 + 0.5) AS bigint) AS v
  FROM events
),
per_user AS (
  SELECT event_type, user_id,
         (list_sort(list(v)))[cast((95 * count(v) + 99) // 100 AS bigint)]::BIGINT
           AS p95_c
  FROM e GROUP BY 1, 2
),
nb AS (
  SELECT event_type, p95_c, count(*)::BIGINT AS c FROM per_user GROUP BY 1, 2
),
ncum AS (
  SELECT event_type, p95_c,
         sum(c) OVER (PARTITION BY event_type ORDER BY p95_c) AS cum,
         (SELECT count(*) FROM per_user p WHERE p.event_type = nb.event_type) AS nt
  FROM nb
),
nested AS (
  SELECT event_type, min(p95_c)::BIGINT AS p99_of_p95_c
  FROM ncum WHERE cum >= (99 * nt + 99) // 100 GROUP BY 1
),
gb AS (SELECT event_type, v, count(*)::BIGINT AS c FROM e GROUP BY 1, 2),
gcum AS (
  SELECT event_type, v,
         sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cum,
         (SELECT count(*) FROM e x WHERE x.event_type = gb.event_type) AS nt
  FROM gb
),
flat AS (
  SELECT event_type, min(v)::BIGINT AS global_p99_c
  FROM gcum WHERE cum >= (99 * nt + 99) // 100 GROUP BY 1
),
nu AS (SELECT event_type, count(*)::BIGINT AS n_users FROM per_user GROUP BY 1)
SELECT u.event_type, u.n_users, n.p99_of_p95_c, f.global_p99_c
FROM nu u JOIN nested n USING (event_type) JOIN flat f USING (event_type)
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Embedding centroid drift (X3 [EXT])
# --------------------------------------------------------------------------


def q_embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X3 embedding drift monitor: split the corpus into two
    halves (vec_id parity — the deterministic stand-in for
    "yesterday vs today"), compute per-(label, half) centroids with
    decimal(28,12) sums, and report the cosine between each label's
    half-centroids — cosines falling from ~1 flag representation
    drift before it degrades ANN recall. The dim-explode aggregate is
    the only row-scale stage; everything after is a 10-row frame."""
    e = _t(spark, sf_dir, "embeddings").select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"),
    )
    cent = (
        e.groupBy("label", "half", "pos")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("cv")
        )
        .groupBy("label", "half")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, cv))), s -> s.cv)"
            ).alias("cvec"),
            F.count(F.lit(1)).cast("bigint").alias("n_dims"),
        )
    )
    a = cent.where(F.col("half") == 0).select("label", F.col("cvec").alias("va"))
    b = cent.where(F.col("half") == 1).select("label", F.col("cvec").alias("vb"))
    cos = (
        "cast(floor(1e6 * aggregate("
        "  zip_with(va, vb, (x, y) -> named_struct('d', x * y, 'nx', x * x, 'ny', y * y)),"
        "  named_struct('d', cast(0.0 as double), 'nx', cast(0.0 as double), 'ny', cast(0.0 as double)),"
        "  (acc, s) -> named_struct('d', acc.d + s.d, 'nx', acc.nx + s.nx, 'ny', acc.ny + s.ny),"
        "  acc -> acc.d / (sqrt(acc.nx) * sqrt(acc.ny))"
        ") + 0.5) as bigint)"
    )
    return (
        a.join(b, "label")
        .selectExpr("label", f"{cos} as drift_cos_micro")
        .orderBy("label")
    )


_ORACLE_CENTROID_DRIFT = """
WITH dims AS (
  SELECT label, vec_id % 2 AS half, generate_subscripts(embedding, 1) AS pos,
         cast(unnest(embedding) AS double) AS x
  FROM embeddings
),
cent AS (
  SELECT label, half, pos,
         cast(sum(cast(x AS decimal(28,12))) AS double) / count(*) AS cv
  FROM dims GROUP BY 1, 2, 3
),
cvecs AS (
  SELECT label, half, list(cv ORDER BY pos) AS cvec FROM cent GROUP BY 1, 2
)
SELECT a.label,
       cast(floor(1e6 * list_cosine_similarity(a.cvec, b.cvec) + 0.5) AS bigint)
         AS drift_cos_micro
FROM cvecs a JOIN cvecs b ON a.label = b.label AND a.half = 0 AND b.half = 1
ORDER BY a.label
"""


# --------------------------------------------------------------------------
# Log-return volatility (X7 [EXT])
# --------------------------------------------------------------------------


def q_log_return_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 realized volatility: per event_type, the population
    stddev of adjacent log returns ln(v_t / v_{t-1}) in time order —
    the stability metric for any monitored ratio-scale KPI. The lag
    pairing is a window PARTITIONED by event_type; each return lands
    on a NANO-int, so the variance numerator n*sum(r^2) - (sum r)^2
    is exact integer under a single sqrt."""
    w = Window.partitionBy("event_type").orderBy("t_us", "event_id")
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
        .withColumn("v_prev", F.lag("v").over(w))
        .where(F.col("v_prev").isNotNull() & (F.col("v") > 0) & (F.col("v_prev") > 0))
        .select(
            "event_type",
            F.floor(
                F.lit(1e9) * F.log(F.col("v").cast("double") / F.col("v_prev"))
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("r_nano"),
        )
    )
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r_nano").cast("decimal(38,0)").alias("sr"),
        F.sum(
            (F.col("r_nano").cast("decimal(38,0)") * F.col("r_nano").cast("decimal(38,0)"))
        ).alias("srr"),
    )
    return agg.select(
        "event_type",
        "n",
        # population stddev of nano returns, reported in nano units
        F.floor(
            F.sqrt(
                (
                    F.col("n").cast("decimal(38,0)") * F.col("srr")
                    - F.col("sr") * F.col("sr")
                ).cast("double")
            )
            / F.col("n")
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("vol_nano"),
    ).orderBy("event_type")


_ORACLE_VOLATILITY = """
WITH e AS (
  SELECT event_type,
         cast(floor(value * 100.0 + 0.5) AS bigint) AS v,
         epoch_us(ts) AS t_us, event_id
  FROM events
),
r AS (
  SELECT event_type, v,
         lag(v) OVER (PARTITION BY event_type ORDER BY t_us, event_id) AS v_prev
  FROM e
),
ret AS (
  SELECT event_type,
         cast(floor(1e9 * ln(v * 1.0 / v_prev) + 0.5) AS bigint) AS r_nano
  FROM r WHERE v_prev IS NOT NULL AND v > 0 AND v_prev > 0
),
agg AS (
  SELECT event_type, count(*)::BIGINT AS n,
         sum(cast(r_nano AS hugeint)) AS sr,
         sum(cast(r_nano AS hugeint) * cast(r_nano AS hugeint)) AS srr
  FROM ret GROUP BY 1
)
SELECT event_type, n,
       cast(floor(sqrt(cast(n * srr - sr * sr AS double)) / n + 0.5) AS bigint)
         AS vol_nano
FROM agg ORDER BY event_type
"""


REGISTRY_EXT55: dict[str, QuerySpec] = {
    "nested_percentile_sla": QuerySpec(
        q_nested_percentile_sla, _ORACLE_NESTED_PCT, "X7 [EXT] tail-latency reporting"
    ),
    "embedding_centroid_drift": QuerySpec(
        q_embedding_centroid_drift, _ORACLE_CENTROID_DRIFT, "X3 [EXT] drift monitor"
    ),
    "log_return_volatility": QuerySpec(
        q_log_return_volatility, _ORACLE_VOLATILITY, "X7 [EXT] realized volatility"
    ),
}
