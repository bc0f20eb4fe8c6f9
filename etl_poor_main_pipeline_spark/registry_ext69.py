"""Operator registry, wave 70: hypothesis-testing tier — Welch's
unequal-variance t-test, chi-squared independence (with Cramer's V),
and Benjamini-Hochberg FDR correction over a family of group tests.

Scale stances:
- Welch t: one conditional two-group aggregate over exact integer
  moments (cent sums as bigint, squares through decimal(38,0)) — a
  single map-side-combinable pass, no shuffle beyond the 1-row reduce.
- Chi-squared: cell counts via one grouped aggregate; row/column
  marginals are tiny aggregates broadcast-joined back; the final
  per-cell (O-E)^2/E terms are decimal-summed so the reduction is
  order-independent across engines and partitions.
- BH-FDR: the per-group z-tests are one grouped aggregate against
  1-row broadcast global moments; the p-value RANK over the test
  family (|event_type| x 7 dow groups — tens of rows by construction)
  uses a broadcast non-equi self-join rank, not a global window, so
  the guard stays clean and the shape generalizes to thousands of
  simultaneous tests.

All normal CDF evaluations use the Bowling logistic approximation
(identical expression text in both engines), so p-values are
bit-deterministic without erf support.

Reference parity: none; [EXT] X7 stats tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import QuerySpec, _t

# --------------------------------------------------------------------------
# Welch's unequal-variance t-test (X7 [EXT])
# --------------------------------------------------------------------------

_WELCH_A = "F"  # o_orderstatus group A
_WELCH_B = "O"  # o_orderstatus group B


def q_welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Welch's t-test: is mean o_totalprice different between
    finished ('F') and open ('O') orders, without assuming equal
    variances? Moments are EXACT — cent sums as bigint, cent-squares
    through decimal(38,0) — then t and the Welch-Satterthwaite df
    derive in double from identical exact inputs, so both engines
    agree bit-for-bit. One conditional aggregate, 1-row result."""
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderstatus").isin(_WELCH_A, _WELCH_B)
    )
    cents = F.floor(F.lit(100.0) * F.col("o_totalprice") + F.lit(0.5)).cast("bigint")
    is_a = F.col("o_orderstatus") == _WELCH_A
    red = o.select(
        is_a.alias("is_a"), cents.alias("c")
    ).agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).cast("bigint").alias("n2"),
        F.sum(F.when(F.col("is_a"), F.col("c")).otherwise(0)).cast("bigint").alias("s1"),
        F.sum(F.when(~F.col("is_a"), F.col("c")).otherwise(0)).cast("bigint").alias("s2"),
        F.sum(
            F.when(F.col("is_a"), (F.col("c") * F.col("c")).cast("decimal(38,0)")).otherwise(
                F.lit(0).cast("decimal(38,0)")
            )
        ).alias("ss1"),
        F.sum(
            F.when(~F.col("is_a"), (F.col("c") * F.col("c")).cast("decimal(38,0)")).otherwise(
                F.lit(0).cast("decimal(38,0)")
            )
        ).alias("ss2"),
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    m1 = F.col("s1").cast("double") / n1d
    m2 = F.col("s2").cast("double") / n2d
    v1 = (F.col("ss1").cast("double") - F.col("s1").cast("double") * m1) / (n1d - 1)
    v2 = (F.col("ss2").cast("double") - F.col("s2").cast("double") * m2) / (n2d - 1)
    se2 = v1 / n1d + v2 / n2d
    t = (m1 - m2) / F.sqrt(se2)
    df_w = (se2 * se2) / (
        (v1 / n1d) * (v1 / n1d) / (n1d - 1) + (v2 / n2d) * (v2 / n2d) / (n2d - 1)
    )
    return red.select(
        "n1",
        "n2",
        F.floor(m1 - m2 + F.lit(0.5)).cast("bigint").alias("mean_diff_cents"),
        F.floor(t * F.lit(1e6) + F.lit(0.5)).cast("bigint").alias("t_micro"),
        F.floor(df_w * F.lit(1e3) + F.lit(0.5)).cast("bigint").alias("df_milli"),
    )


_ORACLE_WELCH = f"""
WITH o AS (
  SELECT o_orderstatus = '{_WELCH_A}' AS is_a,
         cast(floor(100.0 * o_totalprice + 0.5) AS bigint) AS c
  FROM orders WHERE o_orderstatus IN ('{_WELCH_A}', '{_WELCH_B}')
),
red AS (
  SELECT sum(CASE WHEN is_a THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END)::BIGINT AS n2,
         sum(CASE WHEN is_a THEN c ELSE 0 END)::BIGINT AS s1,
         sum(CASE WHEN NOT is_a THEN c ELSE 0 END)::BIGINT AS s2,
         sum(CASE WHEN is_a THEN cast(c * c AS DECIMAL(38,0))
                  ELSE cast(0 AS DECIMAL(38,0)) END) AS ss1,
         sum(CASE WHEN NOT is_a THEN cast(c * c AS DECIMAL(38,0))
                  ELSE cast(0 AS DECIMAL(38,0)) END) AS ss2
  FROM o
),
d AS (
  SELECT n1, n2,
         cast(s1 AS double) / cast(n1 AS double) AS m1,
         cast(s2 AS double) / cast(n2 AS double) AS m2,
         (cast(ss1 AS double) - cast(s1 AS double) * (cast(s1 AS double) / cast(n1 AS double)))
           / (cast(n1 AS double) - 1) AS v1,
         (cast(ss2 AS double) - cast(s2 AS double) * (cast(s2 AS double) / cast(n2 AS double)))
           / (cast(n2 AS double) - 1) AS v2
  FROM red
),
e AS (
  SELECT n1, n2, m1, m2, v1, v2,
         v1 / cast(n1 AS double) + v2 / cast(n2 AS double) AS se2
  FROM d
)
SELECT n1, n2,
       cast(floor(m1 - m2 + 0.5) AS bigint) AS mean_diff_cents,
       cast(floor((m1 - m2) / sqrt(se2) * 1000000.0 + 0.5) AS bigint) AS t_micro,
       cast(floor((se2 * se2) / (
              (v1 / cast(n1 AS double)) * (v1 / cast(n1 AS double)) / (cast(n1 AS double) - 1)
            + (v2 / cast(n2 AS double)) * (v2 / cast(n2 AS double)) / (cast(n2 AS double) - 1)
            ) * 1000.0 + 0.5) AS bigint) AS df_milli
FROM e
"""


# --------------------------------------------------------------------------
# Chi-squared independence + Cramer's V (X7 [EXT])
# --------------------------------------------------------------------------


def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 chi-squared test of independence between document
    ``lang`` and ``source``: one grouped cell-count aggregate, tiny
    row/column marginal aggregates broadcast-joined back, and the
    per-cell (O-E)^2/E terms decimal(38,12)-summed so the reduction
    is order-independent across partitions AND engines. Reports the
    statistic, degrees of freedom, and Cramer's V effect size. All
    inputs to the double math are exact bigint counts."""
    d = _t(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    rows = d.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("r_tot"))
    cols = d.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("c_tot"))
    tot = d.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    exp = (
        F.col("r_tot").cast("double")
        * F.col("c_tot").cast("double")
        / F.col("n").cast("double")
    )
    term = (
        (F.col("o").cast("double") - exp) * (F.col("o").cast("double") - exp) / exp
    ).cast("decimal(38,12)")
    joined = (
        cells.join(F.broadcast(rows), "lang")
        .join(F.broadcast(cols), "source")
        .crossJoin(F.broadcast(tot))  # 1-row total, broadcast by construction
    )
    red = joined.agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.countDistinct("lang").cast("bigint").alias("n_rows"),
        F.countDistinct("source").cast("bigint").alias("n_cols"),
        F.sum(term).cast("double").alias("chi2"),
    )
    dof = (F.col("n_rows") - 1) * (F.col("n_cols") - 1)
    v = F.sqrt(
        F.col("chi2")
        / (
            F.col("n").cast("double")
            * F.least(F.col("n_rows") - 1, F.col("n_cols") - 1).cast("double")
        )
    )
    return red.select(
        "n",
        "n_cells",
        dof.cast("bigint").alias("dof"),
        F.floor(F.col("chi2") * F.lit(1e6) + F.lit(0.5)).cast("bigint").alias("chi2_micro"),
        F.floor(v * F.lit(1e6) + F.lit(0.5)).cast("bigint").alias("cramers_v_micro"),
    )


_ORACLE_CHI2 = """
WITH cells AS (
  SELECT lang, source, count(*)::BIGINT AS o FROM documents GROUP BY lang, source
),
r AS (SELECT lang, count(*)::BIGINT AS r_tot FROM documents GROUP BY lang),
c AS (SELECT source, count(*)::BIGINT AS c_tot FROM documents GROUP BY source),
t AS (SELECT count(*)::BIGINT AS n FROM documents),
j AS (
  SELECT cells.o, r.r_tot, c.c_tot, t.n, cells.lang, cells.source,
         cast(r.r_tot AS double) * cast(c.c_tot AS double) / cast(t.n AS double) AS e
  FROM cells JOIN r USING (lang) JOIN c USING (source) CROSS JOIN t
),
red AS (
  SELECT max(n)::BIGINT AS n,
         count(*)::BIGINT AS n_cells,
         count(DISTINCT lang)::BIGINT AS n_rows,
         count(DISTINCT source)::BIGINT AS n_cols,
         cast(sum(cast((cast(o AS double) - e) * (cast(o AS double) - e) / e
                       AS DECIMAL(38,12))) AS double) AS chi2
  FROM j
)
SELECT n, n_cells,
       cast((n_rows - 1) * (n_cols - 1) AS bigint) AS dof,
       cast(floor(chi2 * 1000000.0 + 0.5) AS bigint) AS chi2_micro,
       cast(floor(sqrt(chi2 / (cast(n AS double)
                 * cast(least(n_rows - 1, n_cols - 1) AS double))) * 1000000.0 + 0.5)
            AS bigint) AS cramers_v_micro
FROM red
"""


# --------------------------------------------------------------------------
# Benjamini-Hochberg FDR correction (X7 [EXT])
# --------------------------------------------------------------------------

_BH_ALPHA_MICRO = 100_000  # alpha = 0.10 in micro units

# Bowling et al. logistic approximation of the standard normal CDF:
# Phi(z) ~= 1 / (1 + exp(-1.5976 z - 0.070566 z^3)). Identical text in
# both engines -> bit-identical p-values without erf support.
_PHI = "(1.0 / (1.0 + exp(-1.5976 * {z} - 0.070566 * {z} * {z} * {z})))"


def q_fdr_bh_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Benjamini-Hochberg FDR over a family of simultaneous
    z-tests: for each (event_type, Monday-0 dow) cell, test whether
    mean event value differs from the global mean, then control the
    false-discovery rate at alpha=0.10 across the whole family.
    Per-group and global moments are exact (value micros as bigint,
    squares through decimal(38,0)); p-values use the Bowling logistic
    Phi approximation (identical text both engines). The p-value rank
    runs as a broadcast non-equi self-join over the AGGREGATED test
    frame (|event_type| x 7 rows by construction — tens, not
    millions), NOT a global window, so the scale guard stays clean."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("cast((dayofweek(ts) + 5) % 7 as bigint)").alias("dow0"),
        F.floor(F.lit(1e6) * F.col("value") + F.lit(0.5)).cast("bigint").alias("vm"),
    )
    g = ev.groupBy("event_type", "dow0").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("vm").cast("bigint").alias("s_g"),
    )
    glob = ev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        F.sum("vm").cast("bigint").alias("s_all"),
        F.sum((F.col("vm") * F.col("vm")).cast("decimal(38,0)")).alias("ss_all"),
    )
    # z_g = (mean_g - mu) / (sd / sqrt(n_g)), micros -> value units
    tests = g.crossJoin(F.broadcast(glob)).selectExpr(
        "event_type",
        "dow0",
        "n_g",
        """cast(floor(
             ((cast(s_g as double) / cast(n_g as double)
               - cast(s_all as double) / cast(n_all as double))
              / (sqrt((cast(ss_all as double)
                       - cast(s_all as double)
                         * (cast(s_all as double) / cast(n_all as double)))
                      / (cast(n_all as double) - 1))
                 / sqrt(cast(n_g as double))))
             * 1000000.0 + 0.5) as bigint) as z_micro""",
    )
    z = "(cast(z_micro as double) / 1000000.0)"
    az = f"abs({z})"
    p_expr = (
        f"cast(floor(2.0 * (1.0 - {_PHI.format(z=az)}) * 1000000.0 + 0.5) as bigint)"
    )
    tests = tests.selectExpr(
        "event_type", "dow0", "n_g", "z_micro", f"{p_expr} as p_micro"
    )
    # join-based rank over the tiny aggregated family (no global window)
    rhs = tests.selectExpr(
        "p_micro as p2", "event_type as et2", "dow0 as dw2"
    )
    ranked = (
        tests.join(
            F.broadcast(rhs),
            F.expr(
                "p2 < p_micro OR (p2 = p_micro AND (et2 < event_type "
                "OR (et2 = event_type AND dw2 < dow0)))"
            ),
            "left",
        )
        .groupBy("event_type", "dow0", "n_g", "z_micro", "p_micro")
        .agg((F.count("p2") + 1).cast("bigint").alias("rk"))
    )
    m = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    withcut = ranked.crossJoin(F.broadcast(m)).withColumn(
        "bh_cut_micro",
        F.floor(
            F.lit(float(_BH_ALPHA_MICRO))
            * F.col("rk").cast("double")
            / F.col("m").cast("double")
        ).cast("bigint"),
    )
    kmax = withcut.agg(
        F.coalesce(
            F.max(F.when(F.col("p_micro") <= F.col("bh_cut_micro"), F.col("rk"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("k_max")
    )
    return (
        withcut.crossJoin(F.broadcast(kmax))
        .select(
            "event_type",
            "dow0",
            "n_g",
            "z_micro",
            "p_micro",
            "rk",
            "bh_cut_micro",
            (F.col("rk") <= F.col("k_max")).alias("rejected"),
        )
        .orderBy("rk")
    )


_ORACLE_BH = f"""
WITH ev AS (
  SELECT event_type,
         cast(isodow(ts) - 1 AS bigint) AS dow0,
         cast(floor(1000000.0 * value + 0.5) AS bigint) AS vm
  FROM events
),
g AS (
  SELECT event_type, dow0, count(*)::BIGINT AS n_g, sum(vm)::BIGINT AS s_g
  FROM ev GROUP BY event_type, dow0
),
gm AS (
  SELECT count(*)::BIGINT AS n_all, sum(vm)::BIGINT AS s_all,
         sum(cast(vm * vm AS DECIMAL(38,0))) AS ss_all
  FROM ev
),
tests AS (
  SELECT event_type, dow0, n_g,
         cast(floor(
           ((cast(s_g AS double) / cast(n_g AS double)
             - cast(s_all AS double) / cast(n_all AS double))
            / (sqrt((cast(ss_all AS double)
                     - cast(s_all AS double)
                       * (cast(s_all AS double) / cast(n_all AS double)))
                    / (cast(n_all AS double) - 1))
               / sqrt(cast(n_g AS double))))
           * 1000000.0 + 0.5) AS bigint) AS z_micro
  FROM g CROSS JOIN gm
),
withp AS (
  SELECT event_type, dow0, n_g, z_micro,
         cast(floor(2.0 * (1.0 - {_PHI.format(z="abs((cast(z_micro as double) / 1000000.0))")})
              * 1000000.0 + 0.5) AS bigint) AS p_micro
  FROM tests
),
ranked AS (
  SELECT a.event_type, a.dow0, a.n_g, a.z_micro, a.p_micro,
         (1 + count(b.p_micro))::BIGINT AS rk
  FROM withp a
  LEFT JOIN withp b
    ON b.p_micro < a.p_micro
    OR (b.p_micro = a.p_micro AND (b.event_type < a.event_type
        OR (b.event_type = a.event_type AND b.dow0 < a.dow0)))
  GROUP BY a.event_type, a.dow0, a.n_g, a.z_micro, a.p_micro
),
m AS (SELECT count(*)::BIGINT AS m FROM ranked),
withcut AS (
  SELECT ranked.*, cast(floor({float(_BH_ALPHA_MICRO)!r} * cast(rk AS double)
                        / cast(m.m AS double)) AS bigint) AS bh_cut_micro
  FROM ranked CROSS JOIN m
),
kmax AS (
  SELECT coalesce(max(CASE WHEN p_micro <= bh_cut_micro THEN rk END), 0)::BIGINT AS k_max
  FROM withcut
)
SELECT event_type, dow0, n_g, z_micro, p_micro, rk, bh_cut_micro,
       rk <= k_max AS rejected
FROM withcut CROSS JOIN kmax
ORDER BY rk
"""


REGISTRY_EXT69: dict[str, QuerySpec] = {
    "welch_t_test": QuerySpec(q_welch_t_test, _ORACLE_WELCH, "X7 [EXT] Welch t-test"),
    "chi2_independence": QuerySpec(
        q_chi2_independence, _ORACLE_CHI2, "X7 [EXT] chi-squared independence"
    ),
    "fdr_bh_correction": QuerySpec(
        q_fdr_bh_correction, _ORACLE_BH, "X7 [EXT] Benjamini-Hochberg FDR"
    ),
}
