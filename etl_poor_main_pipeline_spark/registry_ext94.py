"""Operator registry, wave 95: data-valuation tier — leave-one-source-out
ablation (the one-pass data-valuation screen), quantile treatment effects
(completing the causal family beyond the mean), and class-balanced
effective-number weights (the long-tail reweighting rule).

Scale stances:
- LOO ablation: every leave-one-out mean is CLOSED FORM from per-group
  and global moment sums — one grouped aggregate + one broadcast reduce
  computes all |sources| ablations in a single pass (no per-ablation
  rescan, the reason LOO-by-re-running never ships).
- QTE: per-arm rank-exact quantiles from the domain-binned CDF
  (windows partitioned by ARM over value bins — bounded by the value
  domain, the pinball_loss_eval shape); the effect is a broadcast join
  of two tiny quantile frames.
- Class weights: one grouped count; beta^n is the only transcendental
  and snaps to the micro grid immediately in both engines (the repo's
  libm determinism rule).

Reference parity: none; [EXT] X7/X8 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import QuerySpec, _t

_YEXPR = (
    r"cast(floor(1e3 * n_chars / size(filter(split(text, '\\s+'), t -> t <> ''))"
    r" + 0.5) as bigint)"
)
_YEXPR_DUCK = (
    r"cast(floor(1e3 * n_chars / len(list_filter(string_split_regex(text, '\s+'),"
    r" t -> t <> '')) + 0.5) AS bigint)"
)


# --------------------------------------------------------------------------
# Leave-one-source-out ablation (X7/X8 [EXT])
# --------------------------------------------------------------------------


def q_loo_source_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7/X8 one-pass data valuation: for every source, the
    leave-one-out delta of the corpus mean quality (chars per token,
    milli) — what the corpus metric would do if that source were
    dropped. mu_loo = (S - S_g) / (N - n_g) is closed form from group
    and global sums, so ALL |sources| ablations cost one grouped
    aggregate + one broadcast reduce (re-running the pipeline per
    ablation is the naive O(|sources|) scans this replaces). Positive
    delta = dropping the source would RAISE mean quality, i.e. the
    source's marginal value is negative — the ranking a curation
    pipeline uses to pick its next pruning target."""
    d = _t(spark, sf_dir, "documents").selectExpr("source", f"{_YEXPR} as y")
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("y").cast("decimal(19,0)")).alias("s"),
    )
    glob = g.agg(
        F.sum("n").cast("bigint").alias("nn"), F.sum("s").alias("ss")
    )
    return (
        g.crossJoin(F.broadcast(glob))
        .selectExpr(
            "source",
            "n",
            "cast(floor(cast(s as double) / cast(n as double) + 0.5) as bigint)"
            " as mean_milli",
            # delta in milli-y units scaled 1e3 -> micro in y units
            "cast(floor(1e3 * ((cast(ss as double) - cast(s as double))"
            " / cast(nn - n as double)"
            " - cast(ss as double) / cast(nn as double)) + 0.5) as bigint)"
            " as loo_delta_micro",
        )
        .orderBy(F.desc("loo_delta_micro"), "source")
    )


_ORACLE_LOO = rf"""
WITH d AS (SELECT source, {_YEXPR_DUCK} AS y FROM documents),
g AS (
  SELECT source, count(*)::BIGINT AS n, sum(y::HUGEINT) AS s FROM d GROUP BY 1
),
gtot AS (SELECT sum(n)::BIGINT AS nn, sum(s) AS ss FROM g)
SELECT source, n,
       cast(floor(cast(s AS double) / cast(n AS double) + 0.5) AS bigint)
         AS mean_milli,
       cast(floor(1e3 * ((cast(ss AS double) - cast(s AS double))
            / cast(nn - n AS double)
            - cast(ss AS double) / cast(nn AS double)) + 0.5) AS bigint)
         AS loo_delta_micro
FROM g CROSS JOIN gtot
ORDER BY loo_delta_micro DESC, source
"""


# --------------------------------------------------------------------------
# Quantile treatment effects (X7 [EXT])
# --------------------------------------------------------------------------

_QTE_PS = [25, 50, 75, 90]


def q_quantile_treatment_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 quantile treatment effects at p = {ps}: arms are the
    deterministic md5 halves of doc_id; outcome = chars per token
    (milli); per-arm quantiles are rank-exact order statistics from a
    value-binned CDF (windows partitioned by ARM over the value
    DOMAIN — the pinball_loss_eval shape, never a corpus-ordered
    window); QTE_p = q_treated(p) - q_control(p). Means hide
    distributional shifts — an intervention can leave the mean flat
    while compressing the tails, which is exactly what the QTE curve
    shows."""
    d = _t(spark, sf_dir, "documents").selectExpr(
        "CASE WHEN substring(md5(cast(doc_id as string)), 1, 1) < '8'"
        " THEN 1 ELSE 0 END as arm",
        f"{_YEXPR} as y",
    )
    bins = d.groupBy("arm", "y").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w = Window.partitionBy("arm").orderBy("y")
    cdf = bins.select("arm", "y", F.sum("c").over(w).alias("cum"))
    narm = d.groupBy("arm").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ps = ", ".join(str(p) for p in _QTE_PS)
    targets = narm.selectExpr(
        "arm", "n", f"explode(array({ps})) as p_pct"
    ).selectExpr(
        "arm",
        "p_pct",
        "cast(ceil(cast(p_pct as double) / 100.0 * n) as bigint) as rk",
    )
    qs = (
        cdf.join(targets, "arm")
        .where(F.col("cum") >= F.col("rk"))
        .groupBy("arm", "p_pct")
        .agg(F.min("y").alias("q"))
    )
    t = qs.where("arm = 1").selectExpr("p_pct", "q as q_treated")
    c = qs.where("arm = 0").selectExpr("p_pct", "q as q_control")
    return (
        t.join(c, "p_pct")
        .selectExpr(
            "cast(p_pct as bigint) as p_pct",
            "q_treated",
            "q_control",
            "q_treated - q_control as qte_milli",
        )
        .orderBy("p_pct")
    )


_ORACLE_QTE = rf"""
WITH d AS (
  SELECT CASE WHEN substr(md5(cast(doc_id AS varchar)), 1, 1) < '8'
              THEN 1 ELSE 0 END AS arm,
         {_YEXPR_DUCK} AS y
  FROM documents
),
bins AS (SELECT arm, y, count(*)::BIGINT AS c FROM d GROUP BY 1, 2),
cdf AS (
  SELECT arm, y, sum(c) OVER (PARTITION BY arm ORDER BY y) AS cum FROM bins
),
narm AS (SELECT arm, count(*)::BIGINT AS n FROM d GROUP BY 1),
targets AS (
  SELECT arm, p_pct, cast(ceil(cast(p_pct AS double) / 100.0 * n) AS bigint) AS rk
  FROM narm, (SELECT unnest([{", ".join(str(p) for p in _QTE_PS)}]) AS p_pct)
),
qs AS (
  SELECT cdf.arm, p_pct, min(y) AS q
  FROM cdf JOIN targets ON cdf.arm = targets.arm
  WHERE cum >= rk GROUP BY 1, 2
)
SELECT cast(p_pct AS bigint) AS p_pct,
       t.q AS q_treated, c.q AS q_control,
       t.q - c.q AS qte_milli
FROM (SELECT p_pct, q FROM qs WHERE arm = 1) t
JOIN (SELECT p_pct, q FROM qs WHERE arm = 0) c USING (p_pct)
ORDER BY p_pct
"""


# --------------------------------------------------------------------------
# Class-balanced effective-number weights (X8 [EXT])
# --------------------------------------------------------------------------

_CB_BETA = "0.9999"


def q_class_balanced_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X8 class-balanced reweighting by effective number of
    samples (Cui et al.): E_n = (1 - beta^n) / (1 - beta) with beta =
    {b}; weight w = 1 / E_n, normalized so weights sum to the number
    of classes. As n grows, E_n saturates at 1/(1-beta) — near-dup
    samples stop adding information, so frequent classes stop
    accumulating weight, the principled middle ground between "no
    reweighting" and "inverse frequency". beta^n = exp(n ln beta)
    snaps to the micro grid immediately (libm determinism rule). One
    grouped count over events; everything after is enum-bounded."""
    e = _t(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    base = e.selectExpr(
        "event_type",
        "n",
        f"floor(1e6 * exp(cast(n as double) * ln({_CB_BETA})) + 0.5) / 1e6 as bn",
    ).selectExpr(
        "event_type",
        "n",
        f"(1.0 - bn) / (1.0 - {_CB_BETA}) as en",
    )
    tot = base.agg(
        F.sum((F.lit(1.0) / F.col("en")).cast("decimal(38,16)")).alias("tw"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    return (
        base.crossJoin(F.broadcast(tot))
        .selectExpr(
            "event_type",
            "n",
            "cast(floor(en + 0.5) as bigint) as effective_n",
            "cast(floor(1e6 * (1.0 / en) * cast(k as double)"
            " / cast(tw as double) + 0.5) as bigint) as weight_micro",
        )
        .orderBy("event_type")
    )


_ORACLE_CBW = f"""
WITH e AS (SELECT event_type, count(*)::BIGINT AS n FROM events GROUP BY 1),
base AS (
  SELECT event_type, n,
         (1.0 - floor(1e6 * exp(cast(n AS double) * ln({_CB_BETA})) + 0.5) / 1e6)
           / (1.0 - {_CB_BETA}) AS en
  FROM e
),
tot AS (
  SELECT sum(cast(1.0 / en AS decimal(38,16))) AS tw, count(*)::BIGINT AS k
  FROM base
)
SELECT event_type, n,
       cast(floor(en + 0.5) AS bigint) AS effective_n,
       cast(floor(1e6 * (1.0 / en) * cast(k AS double) / cast(tw AS double)
            + 0.5) AS bigint) AS weight_micro
FROM base CROSS JOIN tot
ORDER BY event_type
"""


REGISTRY_EXT94: dict[str, QuerySpec] = {
    "loo_source_ablation": QuerySpec(
        q_loo_source_ablation, _ORACLE_LOO, "X7/X8 [EXT] one-pass LOO valuation"
    ),
    "quantile_treatment_effects": QuerySpec(
        q_quantile_treatment_effects, _ORACLE_QTE, "X7 [EXT] QTE curve"
    ),
    "class_balanced_weights": QuerySpec(
        q_class_balanced_weights, _ORACLE_CBW, "X8 [EXT] effective-number weights"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_quantile_treatment_effects.__doc__ = q_quantile_treatment_effects.__doc__.format(ps=_QTE_PS)  # noqa: E501
q_class_balanced_weights.__doc__ = q_class_balanced_weights.__doc__.format(b=_CB_BETA)  # noqa: E501
