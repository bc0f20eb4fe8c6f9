"""Operator registry, wave 43: distribution-drift monitoring (PSI),
one-way ANOVA, and corpus duplication profiling.

Scale stances:
- PSI: two cohort histograms from ONE pass (conditional sums per bin),
  per-bin drift terms decimal-summed — the model-monitoring metric
  computed without ever materializing either cohort separately.
- ANOVA: every moment is an EXACT integer/decimal sum (counts, cent
  sums, decimal cent-squares); the F statistic is derived in double
  from identical exact inputs, so both engines agree bit-for-bit.
- duplication profile: three cascaded bounded aggregates
  (fingerprint -> cluster size -> size histogram).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import QuerySpec, _t

# --------------------------------------------------------------------------
# Population Stability Index drift (X7/ML monitoring [EXT])
# --------------------------------------------------------------------------

_PSI_BIN = 50000  # cents per price bin


def q_psi_drift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Population Stability Index — the model-monitoring drift
    metric: split orders into two deterministic cohorts (o_orderkey
    parity, standing in for reference-vs-current windows), histogram
    both over fixed {_PSI_BIN}-cent price bins IN ONE PASS (conditional
    sums), and report each bin's PSI contribution (pa - pb) *
    ln(pa/pb), micro-scaled. Bins where either cohort is empty are
    reported with NULL contribution (the standard clamp, documented
    rather than silently smoothed). Proportions divide exact bigint
    counts — identical doubles in both engines."""
    o = _t(spark, sf_dir, "orders").select(
        F.expr(f"floor(100.0 * o_totalprice + 0.5) div {_PSI_BIN}")
        .cast("bigint")
        .alias("bin"),
        (F.col("o_orderkey") % 2 == 0).alias("is_a"),
    )
    bins = o.groupBy("bin").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).cast("bigint").alias("n_b"),
    )
    totals = bins.agg(
        F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b")
    )
    pa = F.col("n_a") / F.col("t_a")
    pb = F.col("n_b") / F.col("t_b")
    contrib = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.floor(F.lit(1e6) * (pa - pb) * F.log(pa / pb) + F.lit(0.5)),
    ).cast("bigint")
    return (
        bins.crossJoin(F.broadcast(totals))
        .select("bin", "n_a", "n_b", contrib.alias("psi_contrib_micro"))
        .orderBy("bin")
    )


_ORACLE_PSI = f"""
WITH o AS (
  SELECT cast(floor(100.0 * o_totalprice + 0.5) AS bigint) // {_PSI_BIN} AS bin,
         o_orderkey % 2 = 0 AS is_a
  FROM orders
),
bins AS (
  SELECT bin,
         sum(CASE WHEN is_a THEN 1 ELSE 0 END)::BIGINT AS n_a,
         sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END)::BIGINT AS n_b
  FROM o GROUP BY bin
),
totals AS (SELECT sum(n_a) AS t_a, sum(n_b) AS t_b FROM bins)
SELECT bin, n_a, n_b,
       CASE WHEN n_a > 0 AND n_b > 0 THEN
         cast(floor(1000000.0
               * (n_a * 1.0 / t_a - n_b * 1.0 / t_b)
               * ln((n_a * 1.0 / t_a) / (n_b * 1.0 / t_b)) + 0.5) AS bigint)
       END AS psi_contrib_micro
FROM bins, totals ORDER BY bin
"""


# --------------------------------------------------------------------------
# One-way ANOVA (X7 stats [EXT])
# --------------------------------------------------------------------------


def q_anova_f_between_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 one-way ANOVA of order value across priorities: does
    o_orderpriority explain any variance in o_totalprice? Every moment
    is EXACT — group counts and cent sums as bigint, cent-squares
    through decimal(38,0) — and SS_between / SS_within / F derive in
    double from those identical exact inputs, so both engines agree
    bit-for-bit (group terms decimal-summed before the final double).
    One grouped aggregate + one 5-row reduce."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.floor(F.lit(100.0) * F.col("o_totalprice") + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    g = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("cents").cast("bigint").alias("s_g"),
        F.sum((F.col("cents") * F.col("cents")).cast("decimal(38,0)")).alias("ss_g"),
    )
    # per-group double terms from exact ints, decimal-summed across groups
    term_b = (
        (F.col("s_g").cast("double") * F.col("s_g").cast("double"))
        / F.col("n_g").cast("double")
    ).cast("decimal(38,6)")
    term_w = (
        F.col("ss_g").cast("double")
        - (F.col("s_g").cast("double") * F.col("s_g").cast("double"))
        / F.col("n_g").cast("double")
    ).cast("decimal(38,6)")
    red = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_g").cast("bigint").alias("n_total"),
        F.sum("s_g").cast("double").alias("s_all"),
        F.sum(term_b).cast("double").alias("sum_sq_means"),
        F.sum(term_w).cast("double").alias("ss_within"),
    )
    ss_between = F.col("sum_sq_means") - (
        F.col("s_all") * F.col("s_all") / F.col("n_total").cast("double")
    )
    f_stat = (ss_between / (F.col("k") - 1).cast("double")) / (
        F.col("ss_within") / (F.col("n_total") - F.col("k")).cast("double")
    )
    return red.select(
        "k",
        "n_total",
        F.floor(ss_between / F.lit(1e6)).cast("bigint").alias("ss_between_mega"),
        F.floor(F.col("ss_within") / F.lit(1e6)).cast("bigint").alias("ss_within_mega"),
        F.floor(f_stat * F.lit(1e6) + F.lit(0.5)).cast("bigint").alias("f_micro"),
    )


_ORACLE_ANOVA = """
WITH o AS (
  SELECT o_orderpriority,
         cast(floor(100.0 * o_totalprice + 0.5) AS bigint) AS cents
  FROM orders
),
g AS (
  SELECT o_orderpriority,
         count(*)::BIGINT AS n_g,
         sum(cents)::BIGINT AS s_g,
         sum(cast(cents * cents AS DECIMAL(38,0))) AS ss_g
  FROM o GROUP BY o_orderpriority
),
red AS (
  SELECT count(*)::BIGINT AS k,
         sum(n_g)::BIGINT AS n_total,
         cast(sum(s_g) AS double) AS s_all,
         cast(sum(cast(cast(s_g AS double) * cast(s_g AS double) / cast(n_g AS double)
                       AS DECIMAL(38,6))) AS double) AS sum_sq_means,
         cast(sum(cast(cast(ss_g AS double)
                       - cast(s_g AS double) * cast(s_g AS double) / cast(n_g AS double)
                       AS DECIMAL(38,6))) AS double) AS ss_within
  FROM g
)
SELECT k, n_total,
       cast(floor((sum_sq_means - s_all * s_all / cast(n_total AS double)) / 1000000.0)
            AS bigint) AS ss_between_mega,
       cast(floor(ss_within / 1000000.0) AS bigint) AS ss_within_mega,
       cast(floor(((sum_sq_means - s_all * s_all / cast(n_total AS double))
                     / cast(k - 1 AS double))
                  / (ss_within / cast(n_total - k AS double)) * 1000000.0 + 0.5)
            AS bigint) AS f_micro
FROM red
"""


# --------------------------------------------------------------------------
# Corpus duplication profile (X1 audit [EXT])
# --------------------------------------------------------------------------


def q_dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X1 the duplication PROFILE (frequency-of-frequencies): how
    many canonical-form clusters have exactly 1, 2, 3... members — the
    power-law audit that tells a corpus builder whether duplication is
    a long tail of pairs or a few mega-clusters (which changes the
    dedup strategy). Canonical form = sorted distinct token set md5
    (incremental_dedup_delta's key). Three cascaded bounded
    aggregates, all map-side combined."""
    d = _t(spark, sf_dir, "documents")
    fp = F.md5(
        F.array_join(
            F.array_sort(
                F.array_distinct(
                    F.filter(
                        F.split(F.lower(F.col("text")), r"\s+"),
                        lambda t: t != F.lit(""),
                    )
                )
            ),
            " ",
        )
    )
    clusters = d.select(fp.alias("fp")).groupBy("fp").agg(
        F.count(F.lit(1)).cast("bigint").alias("size")
    )
    return (
        clusters.groupBy("size")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            (F.count(F.lit(1)) * F.col("size")).cast("bigint").alias("n_docs"),
        )
        .select("size", "n_clusters", "n_docs")
        .orderBy("size")
    )


_ORACLE_DUP_HIST = r"""
WITH clusters AS (
  SELECT md5(array_to_string(list_sort(list_distinct(
           list_filter(string_split_regex(lower(text), '\s+'), t -> t <> ''))),
           ' ')) AS fp,
         count(*)::BIGINT AS size
  FROM documents GROUP BY fp
)
SELECT size, count(*)::BIGINT AS n_clusters,
       (count(*) * size)::BIGINT AS n_docs
FROM clusters GROUP BY size ORDER BY size
"""


REGISTRY_EXT42: dict[str, QuerySpec] = {
    "psi_drift_deciles": QuerySpec(
        q_psi_drift_deciles, _ORACLE_PSI, "X7 [EXT] PSI drift monitoring"
    ),
    "anova_f_between_groups": QuerySpec(
        q_anova_f_between_groups, _ORACLE_ANOVA, "X7 [EXT] one-way ANOVA"
    ),
    "dup_cluster_size_histogram": QuerySpec(
        q_dup_cluster_size_histogram, _ORACLE_DUP_HIST, "X1 [EXT] duplication profile"
    ),
}
