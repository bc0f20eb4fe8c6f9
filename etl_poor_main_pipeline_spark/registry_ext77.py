"""Operator registry, wave 78: experiment guardrails + training-pair
generation — sample-ratio-mismatch detection, deterministic
contrastive negative sampling, and diagonal-Mahalanobis outliers.

Scale stances:
- SRM: one grouped day aggregate; the chi-squared goodness-of-fit
  statistic is a closed form over exact counts. The guardrail every
  experiment platform evaluates before trusting an A/B readout.
- Negative sampling: anchors/positives come from the exact-duplicate
  fingerprint groups (one hash aggregate); negatives come from a
  DETERMINISTIC hash ring (anchor*31 + j*97 mod N) resolved by an
  equi-join against the corpus — no RNG, reproducible epoch over any
  cluster size, invalid slots dropped (never resampled) so the
  output is a pure function of the corpus.
- Mahalanobis: per-dim exact moments (one decimal-summed aggregate,
  broadcast back), squared-z sum per point, bounded top-k head.

Reference parity: none; [EXT] X2/X3/X7 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import QuerySpec, _t

# --------------------------------------------------------------------------
# Sample-ratio-mismatch check (X7 [EXT])
# --------------------------------------------------------------------------

_SRM_CRIT_MICRO = 3_841_459  # chi2(1dof) 95% critical value, micro


def q_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 sample-ratio-mismatch guardrail: assignment is
    user_id parity (expected 50/50); per epoch day, the 1-dof
    chi-squared goodness-of-fit statistic (nA - nB)^2 / (nA + nB)
    over EXACT event counts, flagged against the 3.841 critical
    value. A day that trips SRM invalidates that day's experiment
    readout — the cheapest, highest-value check in the experiment
    pipeline. One grouped aggregate; closed-form statistic."""
    ev = _t(spark, sf_dir, "events")
    g = (
        ev.selectExpr(
            "cast(datediff(cast(ts as date), DATE'1970-01-01') as bigint) as day",
            "cast(user_id % 2 as int) as arm",
        )
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
        )
    )
    diff = (F.col("n_a") - F.col("n_b")).cast("double")
    tot = (F.col("n_a") + F.col("n_b")).cast("double")
    chi2 = diff * diff / tot
    return g.select(
        "day",
        "n_a",
        "n_b",
        F.floor(chi2 * F.lit(1e6) + F.lit(0.5)).cast("bigint").alias("chi2_micro"),
        (F.floor(chi2 * F.lit(1e6) + F.lit(0.5)) > _SRM_CRIT_MICRO).alias("srm_flag"),
    ).orderBy("day")


_ORACLE_SRM = f"""
WITH g AS (
  SELECT date_diff('day', DATE '1970-01-01', cast(ts AS date))::BIGINT AS day,
         sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
         sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b
  FROM events GROUP BY 1
)
SELECT day, n_a, n_b,
       cast(floor(cast(n_a - n_b AS double) * cast(n_a - n_b AS double)
                  / cast(n_a + n_b AS double) * 1000000.0 + 0.5) AS bigint) AS chi2_micro,
       cast(floor(cast(n_a - n_b AS double) * cast(n_a - n_b AS double)
                  / cast(n_a + n_b AS double) * 1000000.0 + 0.5) AS bigint)
         > {_SRM_CRIT_MICRO} AS srm_flag
FROM g ORDER BY day
"""


# --------------------------------------------------------------------------
# Deterministic contrastive negative sampling (X2/X8 [EXT])
# --------------------------------------------------------------------------

_NEG_K = 3


def q_negative_sampling_contrastive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X2/X8 contrastive training-pair generation: anchors are
    docs in bag-of-words duplicate groups (md5 of the sorted distinct
    token set — catches reordered near-copies; one hash aggregate);
    the positive is gmin for every non-minimum member and gmax for
    the group minimum itself (for groups of size >= 3 this pairs the
    minimum with the LARGEST member, not the second-smallest — both
    engines encode the same rule, so parity is exact);
    each anchor draws {k} negative candidates from the deterministic
    hash ring (anchor*31 + j*97) mod N, resolved by an equi-join
    against the corpus, with candidates that collide with the anchor
    or share its fingerprint DROPPED (never resampled) — the output
    is a pure function of the corpus, reproducible across epochs and
    cluster sizes, no RNG state anywhere."""
    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "md5(array_join(array_sort(array_distinct("
        "filter(split(lower(text), '\\\\s+'), t -> t <> ''))), ' ')) as fp",
    )
    grp = d.groupBy("fp").agg(
        F.count(F.lit(1)).cast("bigint").alias("gsz"),
        F.min("doc_id").cast("bigint").alias("gmin"),
        F.max("doc_id").cast("bigint").alias("gmax"),
    )
    n_row = d.agg((F.max("doc_id") + 1).cast("bigint").alias("n_ids"))
    anchors = (
        d.join(F.broadcast(grp), "fp")
        .where(F.col("gsz") >= 2)
        .selectExpr(
            "doc_id as anchor_id",
            "fp",
            "CASE WHEN doc_id = gmin THEN gmax ELSE gmin END as pos_id",
        )
    )
    cand = anchors.crossJoin(F.broadcast(n_row)).selectExpr(
        "anchor_id",
        "fp",
        "pos_id",
        f"explode(transform(sequence(1, {_NEG_K}), j -> "
        "named_struct('j', j, 'neg_id', (anchor_id * 31 + j * 97) % n_ids))) as c",
    ).selectExpr("anchor_id", "fp", "pos_id", "c.j as neg_rank", "c.neg_id as neg_id")
    corpus = d.selectExpr("doc_id as neg_id", "fp as neg_fp")
    return (
        cand.join(corpus, "neg_id")
        .where((F.col("neg_id") != F.col("anchor_id")) & (F.col("neg_fp") != F.col("fp")))
        .select(
            "anchor_id",
            "pos_id",
            F.col("neg_rank").cast("bigint").alias("neg_rank"),
            "neg_id",
        )
        .orderBy("anchor_id", "neg_rank")
    )


_ORACLE_NEGSAMPLE = rf"""
WITH d AS (SELECT doc_id, md5(array_to_string(list_sort(list_distinct(
  list_filter(string_split_regex(lower(text), '\s+'), t -> t <> ''))), ' ')) AS fp
  FROM documents),
grp AS (
  SELECT fp, count(*)::BIGINT AS gsz, min(doc_id)::BIGINT AS gmin,
         max(doc_id)::BIGINT AS gmax
  FROM d GROUP BY fp
),
n_row AS (SELECT (max(doc_id) + 1)::BIGINT AS n_ids FROM d),
anchors AS (
  SELECT d.doc_id AS anchor_id, d.fp,
         CASE WHEN d.doc_id = g.gmin THEN g.gmax ELSE g.gmin END AS pos_id
  FROM d JOIN grp g USING (fp) WHERE g.gsz >= 2
),
cand AS (
  SELECT a.anchor_id, a.fp, a.pos_id, j.j AS neg_rank,
         (a.anchor_id * 31 + j.j * 97) % n.n_ids AS neg_id
  FROM anchors a CROSS JOIN n_row n
  CROSS JOIN (SELECT unnest([1, 2, 3]) AS j) j
)
SELECT c.anchor_id, c.pos_id, cast(c.neg_rank AS bigint) AS neg_rank, c.neg_id
FROM cand c JOIN d nd ON nd.doc_id = c.neg_id
WHERE c.neg_id <> c.anchor_id AND nd.fp <> c.fp
ORDER BY c.anchor_id, c.neg_rank
"""


# --------------------------------------------------------------------------
# Diagonal-Mahalanobis outliers (X3/X7 [EXT])
# --------------------------------------------------------------------------

_MAH_D = 8
_MAH_TOPK = 20


def q_mahalanobis_outliers_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X3/X7 diagonal-Mahalanobis outlier detection over the
    head-{d} embedding block: per-dim mean/variance from one
    decimal-summed exact-moment aggregate (broadcast back as a 1-row
    frame), squared standardized distance per point as a pure
    expression, and a bounded top-{k} head (distance micro, vec_id
    tie-break). The diagonal approximation needs no matrix inverse —
    the O(d) screening pass that precedes any full-covariance
    scoring."""
    e = _t(spark, sf_dir, "embeddings")
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for j in range(_MAH_D):
        xj = F.element_at("embedding", j + 1).cast("double")
        aggs.append(F.sum(xj.cast("decimal(28,10)")).cast("double").alias(f"s_{j}"))
        aggs.append(
            F.sum((xj * xj).cast("decimal(28,10)")).cast("double").alias(f"ss_{j}")
        )
    mom = e.agg(*aggs)
    moments = mom.selectExpr(
        *[f"s_{j} / n as mu_{j}" for j in range(_MAH_D)],
        *[f"ss_{j} / n - (s_{j} / n) * (s_{j} / n) as var_{j}" for j in range(_MAH_D)],
    )
    dist = " + ".join(
        f"(cast(element_at(embedding, {j + 1}) as double) - mu_{j})"
        f" * (cast(element_at(embedding, {j + 1}) as double) - mu_{j}) / var_{j}"
        for j in range(_MAH_D)
    )
    return (
        e.crossJoin(F.broadcast(moments))
        .selectExpr(
            "vec_id",
            f"cast(floor(({dist}) * 1000000.0 + 0.5) as bigint) as md2_micro",
        )
        .orderBy(F.desc("md2_micro"), F.asc("vec_id"))
        .limit(_MAH_TOPK)
    )


def _oracle_mahalanobis() -> str:
    moment_exprs = ["cast(count(*) AS double) AS n"]
    for j in range(_MAH_D):
        moment_exprs.append(
            f"cast(sum(cast(cast(embedding[{j + 1}] AS double) AS decimal(28,10))) AS double) AS s_{j}"
        )
        moment_exprs.append(
            f"cast(sum(cast(cast(embedding[{j + 1}] AS double) * cast(embedding[{j + 1}] AS double)"
            f" AS decimal(28,10))) AS double) AS ss_{j}"
        )
    mu_var = ", ".join(
        [f"s_{j} / n AS mu_{j}" for j in range(_MAH_D)]
        + [f"ss_{j} / n - (s_{j} / n) * (s_{j} / n) AS var_{j}" for j in range(_MAH_D)]
    )
    dist = " + ".join(
        f"(cast(embedding[{j + 1}] AS double) - mu_{j})"
        f" * (cast(embedding[{j + 1}] AS double) - mu_{j}) / var_{j}"
        for j in range(_MAH_D)
    )
    return f"""
WITH mom AS (SELECT {", ".join(moment_exprs)} FROM embeddings),
moments AS (SELECT {mu_var} FROM mom)
SELECT vec_id,
       cast(floor(({dist}) * 1000000.0 + 0.5) AS bigint) AS md2_micro
FROM embeddings CROSS JOIN moments
ORDER BY md2_micro DESC, vec_id ASC
LIMIT {_MAH_TOPK}
"""


REGISTRY_EXT77: dict[str, QuerySpec] = {
    "ab_srm_check": QuerySpec(q_ab_srm_check, _ORACLE_SRM, "X7 [EXT] SRM guardrail"),
    "negative_sampling_contrastive": QuerySpec(
        q_negative_sampling_contrastive, _ORACLE_NEGSAMPLE, "X2/X8 [EXT] training pairs"
    ),
    "mahalanobis_outliers_diag": QuerySpec(
        q_mahalanobis_outliers_diag, _oracle_mahalanobis(), "X3/X7 [EXT] outlier screen"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_negative_sampling_contrastive.__doc__ = q_negative_sampling_contrastive.__doc__.format(k=_NEG_K)  # noqa: E501
q_mahalanobis_outliers_diag.__doc__ = q_mahalanobis_outliers_diag.__doc__.format(d=_MAH_D, k=_MAH_TOPK)  # noqa: E501
