"""Operator registry, wave 94: causal-inference completion tier —
propensity-score matching (bucketed nearest-control ATT), doubly-robust
off-policy evaluation, and a regression-discontinuity screen. Completes
the repo's causal family (diff-in-diff, CUPED, uplift/Qini, IPS/SNIPS).

Scale stances:
- PSM: propensity lands on a milli grid, so "nearest control" becomes a
  DOMAIN-bounded problem: per-bucket control aggregates (<= 1001 rows),
  nearest nonempty bucket via prefix max/min windows OVER THE BUCKET
  FRAME (domain-bounded, never the corpus), broadcast back onto treated
  units. Matching is with replacement (each treated unit matches its
  bucket's nearest control mean) — the classical estimator that
  parallelizes; greedy without-replacement is inherently sequential.
- DR: one outcome-model aggregate (per-action mean from the md5 train
  half) + one weighted reduce — the estimator that stays consistent if
  EITHER the propensities or the outcome model is right.
- RDD: two local-linear fits from exact integer moment sums within a
  literal bandwidth each side of the cutoff; the cutoff itself is a
  rank-exact median from the domain-binned CDF.

Reference parity: none; [EXT] X7 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import QuerySpec, _t

# --------------------------------------------------------------------------
# Propensity-score matching ATT (X7 [EXT])
# --------------------------------------------------------------------------

_PSM_CALIPER = 50  # milli-buckets; matches farther than this are dropped


def q_propensity_match_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 propensity-score matching: treatment = document source in
    the lexicographic top half of the source enum; outcome = chars per
    token (milli); propensity proxy = the min-max-normalized document
    length (milli grid). Each treated doc matches the nearest
    control-occupied propensity bucket within a {c}-bucket caliper
    (with replacement, matched outcome = that bucket's control mean);
    ATT = mean(y_treated - y_matched). The bucket frame is <= 1001 rows
    (the milli domain), so nearest-bucket search is two prefix windows
    over the DOMAIN and matching is a broadcast join — corpus work is
    two scans. Output: counts, matched count, ATT and naive diff
    (milli) — their gap is the selection bias matching removed."""
    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "source",
        "n_chars",
        r"cast(floor(1e3 * n_chars / size(filter(split(text, '\\s+'), t -> t <> ''))"
        r" + 0.5) as bigint) as y",
    )
    srcs = d.select("source").distinct()
    ns = srcs.agg(F.count(F.lit(1)).cast("bigint").alias("ns"))
    flag = (
        srcs.crossJoin(F.broadcast(ns))
        .withColumn(
            "sr",
            F.row_number().over(Window.partitionBy("ns").orderBy("source")) - 1,
        )
        .selectExpr("source", "CASE WHEN sr * 2 >= ns THEN 1 ELSE 0 END as t")
    )
    mm = d.agg(
        F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi")
    )
    scored = (
        d.join(F.broadcast(flag), "source")
        .crossJoin(F.broadcast(mm))
        .selectExpr(
            "doc_id",
            "t",
            "y",
            "cast(floor(1e3 * cast(n_chars - lo as double)"
            " / cast(hi - lo as double) + 0.5) as bigint) as pb",
        )
    )
    ctrl = scored.where("t = 0").groupBy("pb").agg(
        F.count(F.lit(1)).cast("bigint").alias("nc"),
        F.avg(F.col("y").cast("double")).alias("cy"),
    )
    # bucket spine 0..1000 with nearest control bucket via two prefix scans
    spine = spark.range(0, 1001).selectExpr("id as pb")
    occ = spine.join(ctrl, "pb", "left").selectExpr(
        "pb",
        "CASE WHEN nc IS NULL THEN NULL ELSE pb END as has",
        "cy",
    )
    wup = Window.orderBy("pb").rowsBetween(Window.unboundedPreceding, 0)
    wdn = Window.orderBy(F.desc("pb")).rowsBetween(Window.unboundedPreceding, 0)
    near = occ.select(
        "pb",
        F.last("has", ignorenulls=True).over(wup).alias("below"),
        F.last("has", ignorenulls=True).over(wdn).alias("above"),
    ).selectExpr(
        "pb",
        "CASE WHEN below IS NULL THEN above"
        " WHEN above IS NULL THEN below"
        " WHEN pb - below <= above - pb THEN below ELSE above END as mb",
    )
    match = (
        near.join(ctrl.selectExpr("pb as mb", "cy"), "mb")
        .where(F.expr(f"abs(pb - mb) <= {_PSM_CALIPER}"))
        .select("pb", "cy")
    )
    treated = scored.where("t = 1")
    matched = treated.join(F.broadcast(match), "pb")
    return (
        matched.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_matched"),
            F.floor(
                F.avg(F.col("y").cast("double") - F.col("cy")) + F.lit(0.5)
            )
            .cast("bigint")
            .alias("att_milli"),
        )
        .crossJoin(
            F.broadcast(
                scored.groupBy("t").agg(
                    F.count(F.lit(1)).alias("n"), F.avg(F.col("y").cast("double")).alias("my")
                )
                .agg(
                    F.sum(F.when(F.col("t") == 1, F.col("n"))).cast("bigint").alias("n_treated"),
                    F.sum(F.when(F.col("t") == 0, F.col("n"))).cast("bigint").alias("n_control"),
                    F.floor(
                        F.sum(F.when(F.col("t") == 1, F.col("my")))
                        - F.sum(F.when(F.col("t") == 0, F.col("my")))
                        + F.lit(0.5)
                    )
                    .cast("bigint")
                    .alias("naive_diff_milli"),
                )
            )
        )
        .select("n_treated", "n_control", "n_matched", "att_milli", "naive_diff_milli")
    )


_ORACLE_PSM = rf"""
WITH d AS (
  SELECT doc_id, source, n_chars,
         cast(floor(1e3 * n_chars / len(list_filter(string_split_regex(text, '\s+'),
              t -> t <> '')) + 0.5) AS bigint) AS y
  FROM documents
),
srcs AS (SELECT DISTINCT source FROM d),
ns AS (SELECT count(*)::BIGINT AS ns FROM srcs),
flag AS (
  SELECT source, CASE WHEN (row_number() OVER (ORDER BY source) - 1) * 2 >= ns
                      THEN 1 ELSE 0 END AS t
  FROM srcs CROSS JOIN ns
),
mm AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM d),
scored AS (
  SELECT doc_id, t, y,
         cast(floor(1e3 * cast(n_chars - lo AS double)
              / cast(hi - lo AS double) + 0.5) AS bigint) AS pb
  FROM d JOIN flag USING (source) CROSS JOIN mm
),
ctrl AS (
  SELECT pb, count(*)::BIGINT AS nc, avg(cast(y AS double)) AS cy
  FROM scored WHERE t = 0 GROUP BY 1
),
spine AS (SELECT unnest(range(0, 1001)) AS pb),
occ AS (
  SELECT s.pb, CASE WHEN c.nc IS NULL THEN NULL ELSE s.pb END AS has
  FROM spine s LEFT JOIN ctrl c USING (pb)
),
near AS (
  SELECT pb,
         CASE WHEN below IS NULL THEN above
              WHEN above IS NULL THEN below
              WHEN pb - below <= above - pb THEN below ELSE above END AS mb
  FROM (
    SELECT pb,
           max(has) OVER (ORDER BY pb ROWS UNBOUNDED PRECEDING) AS below,
           min(has) OVER (ORDER BY pb DESC ROWS UNBOUNDED PRECEDING) AS above
    FROM occ
  )
),
match AS (
  SELECT near.pb, c.cy
  FROM near JOIN ctrl c ON c.pb = near.mb
  WHERE abs(near.pb - near.mb) <= {_PSM_CALIPER}
),
att AS (
  SELECT count(*)::BIGINT AS n_matched,
         cast(floor(avg(cast(s.y AS double) - m.cy) + 0.5) AS bigint) AS att_milli
  FROM scored s JOIN match m USING (pb) WHERE s.t = 1
),
naive AS (
  SELECT sum(CASE WHEN t = 1 THEN n END)::BIGINT AS n_treated,
         sum(CASE WHEN t = 0 THEN n END)::BIGINT AS n_control,
         cast(floor(sum(CASE WHEN t = 1 THEN my END)
              - sum(CASE WHEN t = 0 THEN my END) + 0.5) AS bigint) AS naive_diff_milli
  FROM (SELECT t, count(*) AS n, avg(cast(y AS double)) AS my FROM scored GROUP BY t)
)
SELECT n_treated, n_control, n_matched, att_milli, naive_diff_milli
FROM naive CROSS JOIN att
"""


# --------------------------------------------------------------------------
# Doubly-robust off-policy evaluation (X7 [EXT])
# --------------------------------------------------------------------------


def q_doubly_robust_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 doubly-robust off-policy value of the uniform target
    policy: DR = mean over logged rows of [ qbar + w * (r - q(a)) ],
    where q(a) = per-action mean reward fit on the md5-TRAIN half,
    qbar = mean of q over actions (the target policy's model value),
    and w = (1/K)/freq(a) as in ips_snips_offline_eval. Scored on the
    held-out half, reported next to the model-only and IPS-only
    estimates — the DR estimate stays consistent if EITHER component
    is right, which is why production off-policy systems default to
    it. Two grouped aggregates + one weighted reduce; milli outputs."""
    e = _t(spark, sf_dir, "events").selectExpr(
        "event_type",
        "cast(floor(1e3 * value + 0.5) as bigint) as rk",
        "CASE WHEN substring(md5(cast(event_id as string)), 1, 1) < '8'"
        " THEN 1 ELSE 0 END as is_train",
    )
    q = e.where("is_train = 1").groupBy("event_type").agg(
        F.avg(F.col("rk").cast("double")).alias("qa")
    )
    qbar = q.agg(F.avg("qa").alias("qbar"))
    prop = e.where("is_train = 0").groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_a")
    )
    tot = prop.agg(
        F.sum("n_a").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    scored = (
        e.where("is_train = 0")
        .join(F.broadcast(q), "event_type")
        .join(F.broadcast(prop), "event_type")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(qbar))
        .selectExpr(
            "rk",
            "qa",
            "qbar",
            "cast(n as double) / (cast(k as double) * cast(n_a as double)) as w",
        )
        .selectExpr(
            "qbar",
            "cast(qbar + w * (cast(rk as double) - qa) as decimal(38,16)) as dr_term",
            "cast(w * cast(rk as double) as decimal(38,16)) as ips_term",
        )
    )
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        F.floor(F.first("qbar") + F.lit(0.5)).cast("bigint").alias("model_milli"),
        F.floor(F.sum("ips_term").cast("double") / F.count(F.lit(1)) + F.lit(0.5))
        .cast("bigint")
        .alias("ips_milli"),
        F.floor(F.sum("dr_term").cast("double") / F.count(F.lit(1)) + F.lit(0.5))
        .cast("bigint")
        .alias("dr_milli"),
    )


_ORACLE_DR = """
WITH e AS (
  SELECT event_type, cast(floor(1e3 * value + 0.5) AS bigint) AS rk,
         CASE WHEN substr(md5(cast(event_id AS varchar)), 1, 1) < '8'
              THEN 1 ELSE 0 END AS is_train
  FROM events
),
q AS (
  SELECT event_type, avg(cast(rk AS double)) AS qa
  FROM e WHERE is_train = 1 GROUP BY 1
),
qbar AS (SELECT avg(qa) AS qbar FROM q),
prop AS (
  SELECT event_type, count(*)::BIGINT AS n_a FROM e WHERE is_train = 0 GROUP BY 1
),
tot AS (SELECT sum(n_a)::BIGINT AS n, count(*)::BIGINT AS k FROM prop),
scored AS (
  SELECT qbar,
         cast(qbar + (cast(n AS double) / (cast(k AS double) * cast(n_a AS double)))
              * (cast(rk AS double) - qa) AS decimal(38,16)) AS dr_term,
         cast((cast(n AS double) / (cast(k AS double) * cast(n_a AS double)))
              * cast(rk AS double) AS decimal(38,16)) AS ips_term
  FROM e JOIN q USING (event_type) JOIN prop USING (event_type)
  CROSS JOIN tot CROSS JOIN qbar
  WHERE is_train = 0
)
SELECT count(*)::BIGINT AS n_eval,
       cast(floor(any_value(qbar) + 0.5) AS bigint) AS model_milli,
       cast(floor(cast(sum(ips_term) AS double) / count(*) + 0.5) AS bigint) AS ips_milli,
       cast(floor(cast(sum(dr_term) AS double) / count(*) + 0.5) AS bigint) AS dr_milli
FROM scored
"""


# --------------------------------------------------------------------------
# Regression-discontinuity screen (X7 [EXT])
# --------------------------------------------------------------------------

_RDD_BW = 300  # bandwidth in n_chars units each side of the cutoff

_RDD_FIT = (
    "(cast(n as double) * cast(sxy as double)"
    " - cast(sx as double) * cast(sy as double))"
    " / (cast(n as double) * cast(sxx as double)"
    " - cast(sx as double) * cast(sx as double))"
)


def q_regression_discontinuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 regression-discontinuity screen at the median document
    length: running variable x = n_chars (centered at the rank-exact
    median from a domain-binned CDF), outcome y = chars per token
    (milli); local-linear fits on each side within a +/-{bw}-char
    bandwidth; the discontinuity = difference of the two intercepts at
    the cutoff, the causal jump estimate IF treatment switched at the
    threshold. On this synthetic corpus the honest answer is ~no jump
    — the screen's value is the machinery: exact integer moment sums,
    rank-exact cutoff, identical fit text in both engines. Output: the
    cutoff, per-side ns/slopes/intercepts, and the jump (milli)."""
    d = _t(spark, sf_dir, "documents").selectExpr(
        "n_chars",
        r"cast(floor(1e3 * n_chars / size(filter(split(text, '\\s+'), t -> t <> ''))"
        r" + 0.5) as bigint) as y",
    )
    n_tot = d.agg(F.count(F.lit(1)).cast("bigint").alias("nt"))
    bins = d.groupBy("n_chars").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wb = Window.partitionBy(F.lit(1)).orderBy("n_chars")
    cutoff = (
        bins.select("n_chars", F.sum("c").over(wb).alias("cum"))
        .crossJoin(F.broadcast(n_tot))
        .where(F.expr("cum * 2 >= nt"))
        .agg(F.min("n_chars").cast("bigint").alias("cut"))
    )
    sides = (
        d.crossJoin(F.broadcast(cutoff))
        .where(F.expr(f"abs(n_chars - cut) <= {_RDD_BW}"))
        .selectExpr(
            "CASE WHEN n_chars >= cut THEN 1 ELSE 0 END as side",
            "cast(n_chars - cut as bigint) as x",
            "y",
        )
    )
    g = sides.groupBy("side").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(19,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(19,0)")).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(19,0)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(19,0)")).alias("sxx"),
    )
    fits = g.selectExpr(
        "side",
        "n",
        f"{_RDD_FIT} as slope",
        f"cast(sy as double) / cast(n as double)"
        f" - ({_RDD_FIT}) * cast(sx as double) / cast(n as double) as icept",
    )
    wide = fits.groupBy().pivot("side", [0, 1]).agg(
        F.first("n").alias("n"),
        F.first("slope").alias("slope"),
        F.first("icept").alias("icept"),
    )
    return (
        wide.crossJoin(F.broadcast(cutoff))
        .selectExpr(
            "cut",
            "`0_n` as n_below",
            "`1_n` as n_above",
            "cast(floor(1e3 * `0_slope` + 0.5) as bigint) as slope_below_milli",
            "cast(floor(1e3 * `1_slope` + 0.5) as bigint) as slope_above_milli",
            "cast(floor(`0_icept` + 0.5) as bigint) as icept_below_milli",
            "cast(floor(`1_icept` + 0.5) as bigint) as icept_above_milli",
            "cast(floor(`1_icept` - `0_icept` + 0.5) as bigint) as jump_milli",
        )
    )


_ORACLE_RDD = rf"""
WITH d AS (
  SELECT n_chars,
         cast(floor(1e3 * n_chars / len(list_filter(string_split_regex(text, '\s+'),
              t -> t <> '')) + 0.5) AS bigint) AS y
  FROM documents
),
n_tot AS (SELECT count(*)::BIGINT AS nt FROM d),
cutoff AS (
  SELECT min(n_chars)::BIGINT AS cut FROM (
    SELECT n_chars, sum(c) OVER (ORDER BY n_chars) AS cum
    FROM (SELECT n_chars, count(*)::BIGINT AS c FROM d GROUP BY 1)
  ) CROSS JOIN n_tot WHERE cum * 2 >= nt
),
sides AS (
  SELECT CASE WHEN n_chars >= cut THEN 1 ELSE 0 END AS side,
         cast(n_chars - cut AS bigint) AS x, y
  FROM d CROSS JOIN cutoff WHERE abs(n_chars - cut) <= {_RDD_BW}
),
g AS (
  SELECT side, count(*)::BIGINT AS n,
         sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
         sum(x::HUGEINT * y) AS sxy, sum(x::HUGEINT * x) AS sxx
  FROM sides GROUP BY 1
),
fits AS (
  SELECT side, n, {_RDD_FIT} AS slope,
         cast(sy AS double) / cast(n AS double)
           - ({_RDD_FIT}) * cast(sx AS double) / cast(n AS double) AS icept
  FROM g
)
SELECT cut,
       max(CASE WHEN side = 0 THEN n END)::BIGINT AS n_below,
       max(CASE WHEN side = 1 THEN n END)::BIGINT AS n_above,
       cast(floor(1e3 * max(CASE WHEN side = 0 THEN slope END) + 0.5) AS bigint)
         AS slope_below_milli,
       cast(floor(1e3 * max(CASE WHEN side = 1 THEN slope END) + 0.5) AS bigint)
         AS slope_above_milli,
       cast(floor(max(CASE WHEN side = 0 THEN icept END) + 0.5) AS bigint)
         AS icept_below_milli,
       cast(floor(max(CASE WHEN side = 1 THEN icept END) + 0.5) AS bigint)
         AS icept_above_milli,
       cast(floor(max(CASE WHEN side = 1 THEN icept END)
            - max(CASE WHEN side = 0 THEN icept END) + 0.5) AS bigint) AS jump_milli
FROM fits CROSS JOIN cutoff
GROUP BY cut
"""


REGISTRY_EXT93: dict[str, QuerySpec] = {
    "propensity_match_att": QuerySpec(
        q_propensity_match_att, _ORACLE_PSM, "X7 [EXT] PSM nearest-bucket ATT"
    ),
    "doubly_robust_eval": QuerySpec(
        q_doubly_robust_eval, _ORACLE_DR, "X7 [EXT] DR off-policy value"
    ),
    "regression_discontinuity": QuerySpec(
        q_regression_discontinuity, _ORACLE_RDD, "X7 [EXT] RDD jump screen"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_propensity_match_att.__doc__ = q_propensity_match_att.__doc__.format(c=_PSM_CALIPER)  # noqa: E501
q_regression_discontinuity.__doc__ = q_regression_discontinuity.__doc__.format(bw=_RDD_BW)  # noqa: E501
