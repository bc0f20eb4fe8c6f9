"""Operator registry, wave 91: model-prep tier — deterministic k-center
greedy seeding (the k-means++ init), James-Stein empirical-Bayes shrinkage
of per-group means, and rank-exact pinball-loss quantile-forecast
evaluation.

Scale stances:
- k-center greedy: K passes over the corpus, each pass = one broadcast of
  the (<= K)-row chosen set + one min/argmax aggregate — the canonical
  iterative-broadcast pattern (no corpus x corpus term; the argmax lands
  via TakeOrdered LIMIT 1). K is a literal.
- James-Stein: two grouped aggregates (per-source moments) + one keyless
  global reduce broadcast back — the per-domain quality-score smoother
  that beats raw per-group means whenever k >= 4 groups share variance.
- Pinball: train-side quantiles are ORDER STATISTICS from a domain-binned
  CDF (value-milli bins, windows partitioned by event_type over the
  value DOMAIN, never the corpus — the repo's documented rank-exact
  quantile rule); the evaluation is one join + one aggregate per (type,
  p) cell.

Float discipline: distances/losses micro-round before any cross-engine
comparison or argmax (ulp-safe everywhere off the .5 knife edge); sums
run through decimal(38,16).

Reference parity: none; [EXT] X3/X7 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import QuerySpec, _t

# --------------------------------------------------------------------------
# Deterministic k-center greedy seeding (k-means++ init) (X3 [EXT])
# --------------------------------------------------------------------------

_KPP_K = 4

_D2 = (
    "aggregate(zip_with(v, cv, (a, b) -> (a - b) * (a - b)),"
    " cast(0.0 as double), (acc, x) -> acc + x)"
)


def q_kmeanspp_farthest_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X3 deterministic k-means++ initialization by k-center greedy
    (farthest-point traversal): seed with the minimum vec_id, then {k}-1
    times add the vector maximizing the (micro-rounded) squared distance
    to its nearest chosen center, vec_id tiebreak. Each round broadcasts
    the <= {k}-row chosen set and reduces with one min + one TakeOrdered
    LIMIT 1 — K scans, zero corpus-sized shuffles, the init step
    vector_centroids' Lloyd iteration starts from. Output: (step, vec_id,
    dist2_micro to the previously-chosen set; 0 for the seed)."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    chosen = (
        e.orderBy("vec_id")
        .limit(1)
        .select(F.lit(1).alias("step"), "vec_id", "v", F.lit(0).cast("bigint").alias("dist2_micro"))
    )
    for step in range(2, _KPP_K + 1):
        cset = chosen.select(F.col("v").alias("cv"))
        # distance over ALL centers: an already-chosen point is distance 0
        # to itself and can never win the argmax (k-center semantics)
        mind = (
            e.crossJoin(F.broadcast(cset))
            .selectExpr("vec_id", f"cast(floor(1e6 * ({_D2}) + 0.5) as bigint) as d2")
            .groupBy("vec_id")
            .agg(F.min("d2").alias("mind"))
        )
        nxt = (
            mind.join(e, "vec_id")
            .orderBy(F.desc("mind"), F.asc("vec_id"))
            .limit(1)
            .select(
                F.lit(step).alias("step"),
                "vec_id",
                "v",
                F.col("mind").alias("dist2_micro"),
            )
        )
        chosen = chosen.unionAll(nxt)
    return chosen.select("step", "vec_id", "dist2_micro").orderBy("step")


def _kpp_oracle() -> str:
    d2 = (
        "cast(floor(1e6 * list_sum(list_transform(range(1, 65),"
        " i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))) + 0.5) AS bigint)"
    )
    parts = [
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),",
        "c1 AS (SELECT 1 AS step, vec_id, v, 0::BIGINT AS dist2_micro"
        " FROM e ORDER BY vec_id LIMIT 1)",
    ]
    prev_union = "SELECT * FROM c1"
    for step in range(2, _KPP_K + 1):
        parts[-1] += ","
        parts.append(
            f"m{step} AS (SELECT e.vec_id, min({d2}) AS mind"
            f" FROM e CROSS JOIN ({prev_union}) c"
            f" GROUP BY e.vec_id),"
        )
        parts.append(
            f"c{step} AS (SELECT {step} AS step, m.vec_id, e.v,"
            f" m.mind AS dist2_micro"
            f" FROM m{step} m JOIN e USING (vec_id)"
            f" ORDER BY m.mind DESC, m.vec_id ASC LIMIT 1)"
        )
        prev_union += f" UNION ALL SELECT * FROM c{step}"
    parts.append(
        f"SELECT step, vec_id, dist2_micro FROM ({prev_union}) ORDER BY step"
    )
    return "\n".join(parts)


# --------------------------------------------------------------------------
# James-Stein empirical-Bayes shrinkage of per-source means (X7 [EXT])
# --------------------------------------------------------------------------


def q_james_stein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 positive-part James-Stein shrinkage of per-source mean
    document length toward the grand mean: with k >= 4 groups,
    shrunk_g = gm + max(0, 1 - ((k-3) * s2w / n_g) / S) * (m_g - gm),
    where s2w = pooled within-group variance and S = sum_h (m_h - gm)^2
    — the estimator that dominates raw per-group means in total squared
    error, i.e. what a curation pipeline should publish as per-domain
    quality scores when some domains have 10 docs and some have 10M.
    Plan: one grouped-moments aggregate, one keyless reduce over the
    k-row group frame (twice — moments, then between-group SS), both
    broadcast back; exact integer moments through decimal."""
    d = _t(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("bigint").alias("y")
    )
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("y").cast("decimal(19,0)")).alias("s1"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(19,0)")).alias("s2"),
    )
    glob = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("s1").alias("t1"),
        F.sum("s2").alias("t2"),
        F.sum(
            (
                F.col("s1").cast("double") * F.col("s1").cast("double")
                / F.col("n").cast("double")
            ).cast("decimal(38,16)")
        ).alias("grp_ss"),
    )
    base = g.crossJoin(F.broadcast(glob)).selectExpr(
        "source",
        "n",
        "k",
        "cast(s1 as double) / cast(n as double) as m",
        "cast(t1 as double) / cast(nn as double) as gm",
        "(cast(t2 as double) - cast(grp_ss as double))"
        " / cast(nn - k as double) as s2w",
    )
    ss = base.agg(
        F.sum(((F.col("m") - F.col("gm")) * (F.col("m") - F.col("gm"))).cast("decimal(38,16)")).alias(
            "ss_between"
        )
    )
    return (
        base.crossJoin(F.broadcast(ss))
        .selectExpr(
            "source",
            "n",
            "cast(floor(1e3 * m + 0.5) as bigint) as raw_mean_milli",
            "greatest(0.0, 1.0 - (cast(k - 3 as double) * s2w / cast(n as double))"
            " / cast(ss_between as double)) as b",
            "gm",
            "m",
        )
        .selectExpr(
            "source",
            "n",
            "raw_mean_milli",
            "cast(floor(1e6 * b + 0.5) as bigint) as shrink_factor_micro",
            "cast(floor(1e3 * (gm + b * (m - gm)) + 0.5) as bigint) as shrunk_mean_milli",
        )
        .orderBy("source")
    )


_ORACLE_JAMES_STEIN = """
WITH d AS (SELECT source, n_chars::BIGINT AS y FROM documents),
g AS (
  SELECT source, count(*)::BIGINT AS n,
         sum(y::HUGEINT) AS s1, sum(y::HUGEINT * y) AS s2
  FROM d GROUP BY 1
),
gtot AS (
  SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS nn,
         sum(s1) AS t1, sum(s2) AS t2,
         sum(cast(cast(s1 AS double) * cast(s1 AS double)
             / cast(n AS double) AS decimal(38,16))) AS grp_ss
  FROM g
),
base AS (
  SELECT source, n, k,
         cast(s1 AS double) / cast(n AS double) AS m,
         cast(t1 AS double) / cast(nn AS double) AS gm,
         (cast(t2 AS double) - cast(grp_ss AS double))
           / cast(nn - k AS double) AS s2w
  FROM g CROSS JOIN gtot
),
ss AS (
  SELECT sum(cast((m - gm) * (m - gm) AS decimal(38,16))) AS ss_between FROM base
)
SELECT source, n,
       cast(floor(1e3 * m + 0.5) AS bigint) AS raw_mean_milli,
       cast(floor(1e6 * greatest(0.0, 1.0 - (cast(k - 3 AS double) * s2w
                  / cast(n AS double)) / cast(ss_between AS double)) + 0.5)
            AS bigint) AS shrink_factor_micro,
       cast(floor(1e3 * (gm + greatest(0.0, 1.0 - (cast(k - 3 AS double) * s2w
                  / cast(n AS double)) / cast(ss_between AS double))
                  * (m - gm)) + 0.5) AS bigint) AS shrunk_mean_milli
FROM base CROSS JOIN ss
ORDER BY source
"""


# --------------------------------------------------------------------------
# Pinball-loss quantile forecast evaluation (X7 [EXT])
# --------------------------------------------------------------------------

_PINBALL_PS = ["0.5", "0.9", "0.99"]


def q_pinball_loss_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 quantile-forecast evaluation: per event_type, forecast
    the {p} quantiles of `value` from the first half of the observed
    day span (rank-exact order statistics from a value-milli binned
    CDF — windows run over the value DOMAIN within each type, never
    the corpus), then score the second half with pinball loss
    L_p(y, f) = max(p*(y-f), (p-1)*(y-f)) — the scoring rule proper
    for quantiles, and the standard forecast-competition metric.
    Output per (event_type, p): train/test sizes, forecast, mean
    pinball loss (milli/micro ints)."""
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events").selectExpr(
        "event_type",
        "unix_micros(ts) div 86400000000 as day",
        "cast(floor(1e3 * value + 0.5) as bigint) as vmilli",
    )
    span = e.agg(
        ((F.min("day") + F.max("day") + 1) / 2).cast("bigint").alias("split_day")
    )
    e2 = e.crossJoin(F.broadcast(span))
    train = e2.where(F.col("day") < F.col("split_day"))
    test = e2.where(F.col("day") >= F.col("split_day"))

    bins = train.groupBy("event_type", "vmilli").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.partitionBy("event_type").orderBy("vmilli")
    cdf = bins.select(
        "event_type", "vmilli", F.sum("c").over(w).alias("cum")
    )
    ntr = train.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n_train"))
    ps = ", ".join(_PINBALL_PS)
    targets = ntr.selectExpr(
        "event_type", "n_train", f"explode(array({ps})) as p"
    ).selectExpr(
        "event_type", "n_train", "p", "cast(ceil(p * n_train) as bigint) as rk"
    )
    fc = (
        cdf.join(targets, "event_type")
        .where(F.col("cum") >= F.col("rk"))
        .groupBy("event_type", "p", "n_train")
        .agg(F.min("vmilli").alias("f_milli"))
    )
    scored = test.join(F.broadcast(fc), "event_type").selectExpr(
        "event_type",
        "p",
        "n_train",
        "f_milli",
        "cast(greatest(p * cast(vmilli - f_milli as double),"
        " (p - 1.0) * cast(vmilli - f_milli as double)) as decimal(38,16)) as loss",
    )
    return (
        scored.groupBy("event_type", "p", "n_train", "f_milli")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.floor(
                F.lit(1000.0) * F.sum("loss").cast("double") / F.count(F.lit(1))
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("pinball_milli"),
        )
        .select(
            "event_type",
            F.floor(F.col("p") * 100 + F.lit(0.5)).cast("bigint").alias("p_pct"),
            "n_train",
            "n_test",
            "f_milli",
            "pinball_milli",
        )
        .orderBy("event_type", "p_pct")
    )


_ORACLE_PINBALL = f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         cast(floor(1e3 * value + 0.5) AS bigint) AS vmilli
  FROM events
),
span AS (SELECT (min(day) + max(day) + 1) // 2 AS split_day FROM e),
train AS (SELECT e.* FROM e CROSS JOIN span WHERE day < split_day),
test AS (SELECT e.* FROM e CROSS JOIN span WHERE day >= split_day),
bins AS (
  SELECT event_type, vmilli, count(*)::BIGINT AS c FROM train GROUP BY 1, 2
),
cdf AS (
  SELECT event_type, vmilli,
         sum(c) OVER (PARTITION BY event_type ORDER BY vmilli) AS cum
  FROM bins
),
ntr AS (SELECT event_type, count(*)::BIGINT AS n_train FROM train GROUP BY 1),
targets AS (
  SELECT event_type, n_train, p, cast(ceil(p * n_train) AS bigint) AS rk
  FROM ntr, (SELECT unnest([{", ".join(_PINBALL_PS)}]) AS p)
),
fc AS (
  SELECT cdf.event_type, p, n_train, min(vmilli) AS f_milli
  FROM cdf JOIN targets ON cdf.event_type = targets.event_type
  WHERE cum >= rk
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT t.event_type, p, n_train, f_milli,
         cast(greatest(p * cast(vmilli - f_milli AS double),
              (p - 1.0) * cast(vmilli - f_milli AS double))
              AS decimal(38,16)) AS loss
  FROM test t JOIN fc ON t.event_type = fc.event_type
)
SELECT event_type,
       cast(floor(p * 100 + 0.5) AS bigint) AS p_pct,
       n_train,
       count(*)::BIGINT AS n_test,
       f_milli,
       cast(floor(1000.0 * cast(sum(loss) AS double) / count(*) + 0.5)
            AS bigint) AS pinball_milli
FROM scored
GROUP BY event_type, p, n_train, f_milli
ORDER BY event_type, p_pct
"""


REGISTRY_EXT90: dict[str, QuerySpec] = {
    "kmeanspp_farthest_seed": QuerySpec(
        q_kmeanspp_farthest_seed, _kpp_oracle(), "X3 [EXT] k-center greedy init"
    ),
    "james_stein_shrinkage": QuerySpec(
        q_james_stein, _ORACLE_JAMES_STEIN, "X7 [EXT] EB shrinkage of group means"
    ),
    "pinball_loss_eval": QuerySpec(
        q_pinball_loss_eval, _ORACLE_PINBALL, "X7 [EXT] quantile forecast eval"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_kmeanspp_farthest_seed.__doc__ = q_kmeanspp_farthest_seed.__doc__.format(k=_KPP_K)  # noqa: E501
q_pinball_loss_eval.__doc__ = q_pinball_loss_eval.__doc__.format(p=_PINBALL_PS)  # noqa: E501
