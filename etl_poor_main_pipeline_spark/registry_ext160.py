"""Wave 160 [EXT]: method-agreement and survival-concordance
completers — Lin's (1989) concordance correlation coefficient between
the AM and PM half-day means (the agreement statistic Bland-Altman
bounds and Pearson's r each only half-capture), Deming orthogonal
regression (errors-in-variables λ=1, the method-comparison line OLS
gets wrong), Lin's (2000) total deviation index + coverage probability
(TDI/CP, the absolute-agreement pair), and Harrell's (1982) C-index
for the survival cohort model. Companions of the shipped
bland_altman_limits / icc_2_1 / cronbach_alpha (agreement),
theil_sen_slope / kfold_cv_ridge_1d (robust/validated fits), and
cox_ph_newton_1cov / log_rank_survival (whose fitted hazard ratio
Harrell's C grades as a ranking).

Pairs frame: per (user, day) with BOTH half-days present, x = AM mean
(micro-snapped), y = PM mean — the registry_ext122 pairing. All
moments stage exact integer micro sums through decimal(38,0)/HUGEINT.

Harrell's C conventions (documented — implementations differ): risk
score = the cohort indicator g1 (even user_id, the cox_ph covariate);
comparable pairs are (i event, t_j > t_i any status) plus
(i event, j censored, t_j = t_i); same-day event-event pairs are
incomparable; tied risk scores 1/2 (the lifelines convention). With a
binary score everything reduces to suffix risk-set counts per group
over the duration-day cells:
  2·num = Σ_t d1·(2·(A0+c0) + (A1+c1)) + d0·(A0+c0)
  den   = Σ_t (d1 + d0)·(A1+A0+c1+c0)
(d/c = same-day events/censored per group, A = strictly-later counts),
C = 2·num / (2·2·den)… i.e. C = num2/(2·den) with num2 the first sum.

Scale notes (the 100x question): CCC/Deming/TDI are single
conditional-moment aggregates over the pair frame; Harrell's C is a
suffix walk over CALENDAR-BOUNDED duration-day cells (the sanctioned
log_rank_survival category).

Reference parity: none; [EXT] X7 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import QuerySpec, _t
from .registry_ext130 import _per_user_tte

_DEC = "cast({x} as decimal(38,0))"
_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000
#: TDI proportion p = 0.9 -> kappa = the normal quantile at (1+p)/2
_TDI_KAPPA = 1.6448536269514722  # qnorm(0.95)
#: CP tolerance delta in VALUE units
_CP_DELTA_MICRO = 500_000  # |AM - PM| <= 0.5


def _half_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per (user, day) with both half-days present: x = AM
    mean, y = PM mean, micro-snapped (the registry_ext122 pairing)."""
    e = _t(spark, sf_dir, "events")
    halves = (
        e.select(
            "user_id",
            F.expr(f"unix_micros(ts) div {_DAY_US}").alias("d"),
            F.expr(
                f"cast((unix_micros(ts) % {_DAY_US}) div {_HOUR_US} >= 12"
                " as int)"
            ).alias("pm"),
            F.expr("cast(floor(value * 1e6 + 0.5) as bigint)").alias("vm"),
        )
        .groupBy("user_id", "d", "pm")
        .agg(
            F.expr(
                "cast(floor(cast(sum(vm) as double) / count(1) + 0.5)"
                " as bigint)"
            ).alias("m")
        )
    )
    return (
        halves.groupBy("user_id", "d")
        .agg(
            F.count(F.lit(1)).alias("nh"),
            F.sum(F.expr("if(pm = 0, m, cast(0 as bigint))")).alias("x"),
            F.sum(F.expr("if(pm = 1, m, cast(0 as bigint))")).alias("y"),
        )
        .filter(F.col("nh") == 2)
        .select("x", "y")
    )


_SQL_HALF_PAIRS = f"""
pairs AS (
  SELECT sum(CASE WHEN pm = 0 THEN m ELSE 0 END) AS x,
         sum(CASE WHEN pm = 1 THEN m ELSE 0 END) AS y
  FROM (
    SELECT user_id, epoch_us(ts) // {_DAY_US} AS d,
           CASE WHEN (epoch_us(ts) % {_DAY_US}) // {_HOUR_US} >= 12
                THEN 1 ELSE 0 END AS pm,
           cast(floor(cast(sum(cast(floor(value * 1e6 + 0.5) AS BIGINT))
               AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS m
    FROM events
    GROUP BY 1, 2, 3
  )
  GROUP BY user_id, d
  HAVING count(*) = 2
)
"""


def _pair_moments(pairs: DataFrame) -> DataFrame:
    return pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr(f"{_DEC.format(x='x')} * x")).alias("sxx"),
        F.sum(F.expr(f"{_DEC.format(x='y')} * y")).alias("syy"),
        F.sum(F.expr(f"{_DEC.format(x='x')} * y")).alias("sxy"),
    )


_SQL_PAIR_MOMENTS = """
m AS (
  SELECT count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x::HUGEINT * x) AS sxx, sum(y::HUGEINT * y) AS syy,
         sum(x::HUGEINT * y) AS sxy
  FROM pairs
)
"""

# n-denominator central moments (Lin 1989 uses the biased forms), in
# VALUE units (the 1e12 micro² scale cancels inside every ratio)
_NN = "cast(n as double)"
_VX = f"((cast(sxx as double) - cast(sx as double) * cast(sx as double) / {_NN}) / {_NN})"
_VY = f"((cast(syy as double) - cast(sy as double) * cast(sy as double) / {_NN}) / {_NN})"
_VXY = f"((cast(sxy as double) - cast(sx as double) * cast(sy as double) / {_NN}) / {_NN})"
_DMEAN = f"((cast(sx as double) - cast(sy as double)) / {_NN})"


def q_lin_ccc_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Lin (1989) concordance correlation between AM and PM
    half-day means: ρc = 2·s_xy / (s_x² + s_y² + (x̄-ȳ)²) with
    n-denominator moments — Pearson's r times the bias-correction
    factor C_b, so it penalizes location AND scale shift, not just
    scatter. Output one row: n_pairs, ccc_micro, pearson_micro,
    cb_micro."""
    m = _pair_moments(_half_pairs(spark, sf_dir))
    ccc = f"(2.0 * {_VXY} / ({_VX} + {_VY} + {_DMEAN} * {_DMEAN}))"
    r = f"({_VXY} / sqrt({_VX} * {_VY}))"
    return m.selectExpr(
        "n AS n_pairs",
        f"cast(floor(1e6 * {ccc} + 0.5) as bigint) AS ccc_micro",
        f"cast(floor(1e6 * {r} + 0.5) as bigint) AS pearson_micro",
        f"cast(floor(1e6 * {ccc} / {r} + 0.5) as bigint) AS cb_micro",
    )


_DUCK_VX = "((cast(sxx AS DOUBLE) - cast(sx AS DOUBLE) * cast(sx AS DOUBLE) / cast(n AS DOUBLE)) / cast(n AS DOUBLE))"
_DUCK_VY = "((cast(syy AS DOUBLE) - cast(sy AS DOUBLE) * cast(sy AS DOUBLE) / cast(n AS DOUBLE)) / cast(n AS DOUBLE))"
_DUCK_VXY = "((cast(sxy AS DOUBLE) - cast(sx AS DOUBLE) * cast(sy AS DOUBLE) / cast(n AS DOUBLE)) / cast(n AS DOUBLE))"
_DUCK_DMEAN = "((cast(sx AS DOUBLE) - cast(sy AS DOUBLE)) / cast(n AS DOUBLE))"
_DUCK_CCC = (
    f"(2.0 * {_DUCK_VXY} / ({_DUCK_VX} + {_DUCK_VY}"
    f" + {_DUCK_DMEAN} * {_DUCK_DMEAN}))"
)
_DUCK_R = f"({_DUCK_VXY} / sqrt({_DUCK_VX} * {_DUCK_VY}))"

_ORACLE_CCC = f"""
WITH {_SQL_HALF_PAIRS.strip()},
{_SQL_PAIR_MOMENTS.strip()}
SELECT n AS n_pairs,
       cast(floor(1e6 * {_DUCK_CCC} + 0.5) AS BIGINT) AS ccc_micro,
       cast(floor(1e6 * {_DUCK_R} + 0.5) AS BIGINT) AS pearson_micro,
       cast(floor(1e6 * {_DUCK_CCC} / {_DUCK_R} + 0.5) AS BIGINT)
         AS cb_micro
FROM m
"""


def q_deming_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Deming orthogonal regression of PM on AM half-day
    means (error-variance ratio λ = 1): the method-comparison line
    that treats BOTH variables as noisy —
    slope = (s_yy - s_xx + √((s_yy-s_xx)² + 4·s_xy²)) / (2·s_xy),
    intercept = ȳ - slope·x̄ (n-denominator moments; sqrt is
    IEEE-exact). Output one row: n_pairs, slope_micro,
    intercept_micro."""
    m = _pair_moments(_half_pairs(spark, sf_dir))
    slope = (
        f"(({_VY} - {_VX} + sqrt(({_VY} - {_VX}) * ({_VY} - {_VX})"
        f" + 4.0 * {_VXY} * {_VXY})) / (2.0 * {_VXY}))"
    )
    intercept = (
        f"((cast(sy as double) / {_NN} - {slope}"
        f" * cast(sx as double) / {_NN}) / 1e6)"
    )
    return m.selectExpr(
        "n AS n_pairs",
        f"cast(floor(1e6 * {slope} + 0.5) as bigint) AS slope_micro",
        f"cast(floor(1e6 * {intercept} + 0.5) as bigint)"
        " AS intercept_micro",
    )


_DUCK_SLOPE = (
    f"(({_DUCK_VY} - {_DUCK_VX} + sqrt(({_DUCK_VY} - {_DUCK_VX})"
    f" * ({_DUCK_VY} - {_DUCK_VX}) + 4.0 * {_DUCK_VXY} * {_DUCK_VXY}))"
    f" / (2.0 * {_DUCK_VXY}))"
)

_ORACLE_DEMING = f"""
WITH {_SQL_HALF_PAIRS.strip()},
{_SQL_PAIR_MOMENTS.strip()}
SELECT n AS n_pairs,
       cast(floor(1e6 * {_DUCK_SLOPE} + 0.5) AS BIGINT) AS slope_micro,
       cast(floor(1e6 * ((cast(sy AS DOUBLE) / cast(n AS DOUBLE)
         - {_DUCK_SLOPE} * cast(sx AS DOUBLE) / cast(n AS DOUBLE)) / 1e6)
         + 0.5) AS BIGINT) AS intercept_micro
FROM m
"""


def q_tdi_coverage_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Lin (2000) absolute-agreement pair on the AM/PM
    half-day differences d = x - y: the total deviation index
    TDI_0.9 = 1.6448536·√MSD (MSD = Σd²/n — the 90% absolute-difference
    bound under approximate normality of d) and the EXACT empirical
    coverage probability CP = #{|d| ≤ 0.5}/n at the 0.5-value-unit
    tolerance. Output one row: n_pairs, msd_micro, tdi90_micro,
    n_within, cp_micro."""
    pairs = _half_pairs(spark, sf_dir)
    m = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.expr(f"{_DEC.format(x='(x - y)')} * (x - y)")
        ).alias("sdd"),
        F.sum(
            F.expr(f"if(abs(x - y) <= {_CP_DELTA_MICRO}, 1, 0)")
        ).cast("bigint").alias("nw"),
    )
    msd = f"(cast(sdd as double) / {_NN} / 1e12)"
    return m.selectExpr(
        "n AS n_pairs",
        f"cast(floor(1e6 * {msd} + 0.5) as bigint) AS msd_micro",
        f"cast(floor(1e6 * {_TDI_KAPPA} * sqrt({msd}) + 0.5) as bigint)"
        " AS tdi90_micro",
        "nw AS n_within",
        f"cast(floor(1e6 * cast(nw as double) / {_NN} + 0.5) as bigint)"
        " AS cp_micro",
    )


_ORACLE_TDI = f"""
WITH {_SQL_HALF_PAIRS.strip()},
m AS (
  SELECT count(*)::BIGINT AS n,
         sum((x - y)::HUGEINT * (x - y)) AS sdd,
         sum(CASE WHEN abs(x - y) <= {_CP_DELTA_MICRO} THEN 1 ELSE 0 END
             )::BIGINT AS nw
  FROM pairs
)
SELECT n AS n_pairs,
       cast(floor(1e6 * (cast(sdd AS DOUBLE) / cast(n AS DOUBLE) / 1e12)
         + 0.5) AS BIGINT) AS msd_micro,
       cast(floor(1e6 * {_TDI_KAPPA} * sqrt(cast(sdd AS DOUBLE)
         / cast(n AS DOUBLE) / 1e12) + 0.5) AS BIGINT) AS tdi90_micro,
       nw AS n_within,
       cast(floor(1e6 * cast(nw AS DOUBLE) / cast(n AS DOUBLE) + 0.5)
         AS BIGINT) AS cp_micro
FROM m
"""


def q_harrell_c_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7/X9 Harrell (1982) concordance index of the survival
    cohort score (risk = g1, the cox_ph_newton_1cov covariate) on the
    registry_ext130 time-to-event frame — conventions per the module
    docstring (lifelines-compatible: strictly-later pairs plus
    same-day event-vs-censored, event-event time ties incomparable,
    tied risk scores 1/2). All counts are exact suffix risk-set sums
    over duration-day cells. Output one row: n_users, n_events,
    comparable_pairs, c_index_micro."""
    tte = _per_user_tte(spark, sf_dir)
    cells = tte.groupBy("t").agg(
        F.sum(F.expr("ev * g1")).cast("bigint").alias("d1"),
        F.sum(F.expr("ev * (1 - g1)")).cast("bigint").alias("d0"),
        F.sum(F.expr("(1 - ev) * g1")).cast("bigint").alias("c1"),
        F.sum(F.expr("(1 - ev) * (1 - g1)")).cast("bigint").alias("c0"),
    )
    wd = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = cells.select(
        "t",
        "d1",
        "d0",
        "c1",
        "c0",
        F.coalesce(F.sum(F.expr("d1 + c1")).over(wd), F.lit(0))
        .cast("bigint")
        .alias("a1"),
        F.coalesce(F.sum(F.expr("d0 + c0")).over(wd), F.lit(0))
        .cast("bigint")
        .alias("a0"),
    )
    red = risk.agg(
        F.sum(F.expr("d1 + d0 + c1 + c0")).cast("bigint").alias("n_users"),
        F.sum(F.expr("d1 + d0")).cast("bigint").alias("n_events"),
        F.sum(
            F.expr(
                f"{_DEC.format(x='d1')} * (a1 + a0 + c1 + c0)"
                f" + {_DEC.format(x='d0')} * (a1 + a0 + c1 + c0)"
            )
        ).alias("den"),
        F.sum(
            F.expr(
                f"{_DEC.format(x='d1')} * (2 * (a0 + c0) + (a1 + c1))"
                f" + {_DEC.format(x='d0')} * (a0 + c0)"
            )
        ).alias("num2"),
    )
    return red.selectExpr(
        "n_users",
        "n_events",
        "cast(den as bigint) AS comparable_pairs",
        "cast(floor(1e6 * cast(num2 as double)"
        " / (2.0 * cast(den as double)) + 0.5) as bigint)"
        " AS c_index_micro",
    )


_ORACLE_HARRELL = f"""
WITH tte AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS g1,
         CASE WHEN dp IS NOT NULL THEN dp - d0 ELSE dl - d0 END AS t,
         CASE WHEN dp IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM (
    SELECT user_id,
           min(epoch_us(ts) // {_DAY_US}) AS d0,
           min(CASE WHEN event_type = 'purchase'
                    THEN epoch_us(ts) // {_DAY_US} END) AS dp,
           max(epoch_us(ts) // {_DAY_US}) AS dl
    FROM events GROUP BY 1
  )
),
cells AS (
  SELECT t,
         sum(ev * g1)::BIGINT AS d1,
         sum(ev * (1 - g1))::BIGINT AS d0,
         sum((1 - ev) * g1)::BIGINT AS c1,
         sum((1 - ev) * (1 - g1))::BIGINT AS c0
  FROM tte GROUP BY 1
),
risk AS (
  SELECT t, d1, d0, c1, c0,
         coalesce(sum(d1 + c1) OVER (ORDER BY t DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS a1,
         coalesce(sum(d0 + c0) OVER (ORDER BY t DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS a0
  FROM cells
),
red AS (
  SELECT sum(d1 + d0 + c1 + c0)::BIGINT AS n_users,
         sum(d1 + d0)::BIGINT AS n_events,
         sum(d1::HUGEINT * (a1 + a0 + c1 + c0)
             + d0::HUGEINT * (a1 + a0 + c1 + c0)) AS den,
         sum(d1::HUGEINT * (2 * (a0 + c0) + (a1 + c1))
             + d0::HUGEINT * (a0 + c0)) AS num2
  FROM risk
)
SELECT n_users, n_events,
       cast(den AS BIGINT) AS comparable_pairs,
       cast(floor(1e6 * cast(num2 AS DOUBLE)
         / (2.0 * cast(den AS DOUBLE)) + 0.5) AS BIGINT)
         AS c_index_micro
FROM red
"""


REGISTRY_EXT160: dict[str, QuerySpec] = {
    "lin_ccc_agreement": QuerySpec(
        q_lin_ccc_agreement, _ORACLE_CCC, "X7 [EXT] Lin CCC"
    ),
    "deming_regression": QuerySpec(
        q_deming_regression, _ORACLE_DEMING, "X7 [EXT] Deming orthogonal"
    ),
    "tdi_coverage_agreement": QuerySpec(
        q_tdi_coverage_agreement, _ORACLE_TDI, "X7 [EXT] TDI / CP"
    ),
    "harrell_c_index": QuerySpec(
        q_harrell_c_index, _ORACLE_HARRELL, "X7/X9 [EXT] Harrell C"
    ),
}
