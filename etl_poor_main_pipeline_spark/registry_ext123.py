"""Wave 123 [EXT]: categorical-association completers — Woolf odds-ratio
CI, Mantel-Haenszel stratified pooled OR, Cochran-Armitage trend,
Goodman-Kruskal gamma, Theil's uncertainty coefficient, Bowker symmetry.

Scale notes (the 100x question, per query):
- odds_ratio_woolf / cochran_armitage_trend: the corpus reduces
  map-side to a 2x2 (resp. 2x3) contingency of exact bigint counts in
  ONE keyless aggregate; everything after is constant-time arithmetic.
- mantel_haenszel_or: one groupBy(day) — calendar-bounded strata — with
  the per-stratum OR/expectation/variance terms micro-snapped per
  stratum (the documented AD staging for per-group rationals) before
  the final exact integer sums.
- goodman_kruskal_gamma / bowker_symmetry: the contingency tables are
  ENUM x ENUM (3x7 shift-x-weekday, 5x5 type-x-type) aggregates;
  concordance / symmetry needs the bounded table crossed with itself —
  a constant-size block at any corpus size. Bowker's modal-type-per-
  (user, half) frame uses a window KEYED by (user, half), never global.
- theils_u_uncertainty: joint counts over (event_type, weekday) — a
  35-cell enum frame; every ln(count) is micro-snapped immediately
  (JVM/DuckDB libm last-ulp divergence) and weighted by exact counts.

Reference parity: none; [EXT] X7 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import QuerySpec, _t

_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000
_CASE_TYPE = "purchase"

_DEC = "cast({x} as decimal(38,0))"


# --------------------------------------------------------------------------
# Woolf odds-ratio confidence interval (X7 [EXT])
# --------------------------------------------------------------------------


def q_odds_ratio_woolf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 odds ratio with the Woolf (log-normal) 95% CI: exposure =
    even user key, case = '{c}' events. The corpus reduces to four exact
    bigint cell counts in one keyless aggregate; ln(OR) is snapped to
    micro immediately (libm convention) and the CI is reported in log
    space: lnor +- 1.96 * sqrt(1/a + 1/b + 1/c + 1/d). Output one row:
    a, b, c, d, or_micro, lnor_micro, ci_lo_micro, ci_hi_micro."""
    e = _t(spark, sf_dir, "events")
    agg = e.select(
        F.expr("cast(user_id % 2 = 0 as int)").alias("exp"),
        F.expr(f"cast(event_type = '{_CASE_TYPE}' as int)").alias("cs"),
    ).agg(
        F.sum(F.expr("exp * cs")).cast("bigint").alias("a"),
        F.sum(F.expr("exp * (1 - cs)")).cast("bigint").alias("b"),
        F.sum(F.expr("(1 - exp) * cs")).cast("bigint").alias("c"),
        F.sum(F.expr("(1 - exp) * (1 - cs)")).cast("bigint").alias("d"),
    )
    return agg.selectExpr(
        "a",
        "b",
        "c",
        "d",
        "cast(floor(1e6 * cast(a as double) * cast(d as double)"
        " / (cast(b as double) * cast(c as double)) + 0.5) as bigint)"
        " AS or_micro",
        "cast(floor(1e6 * ln(cast(a as double) * cast(d as double)"
        " / (cast(b as double) * cast(c as double))) + 0.5) as bigint)"
        " AS lnor_micro",
        "cast(floor(1e6 * (ln(cast(a as double) * cast(d as double)"
        " / (cast(b as double) * cast(c as double)))"
        " - 1.96 * sqrt(1.0/cast(a as double) + 1.0/cast(b as double)"
        " + 1.0/cast(c as double) + 1.0/cast(d as double))) + 0.5) as bigint)"
        " AS ci_lo_micro",
        "cast(floor(1e6 * (ln(cast(a as double) * cast(d as double)"
        " / (cast(b as double) * cast(c as double)))"
        " + 1.96 * sqrt(1.0/cast(a as double) + 1.0/cast(b as double)"
        " + 1.0/cast(c as double) + 1.0/cast(d as double))) + 0.5) as bigint)"
        " AS ci_hi_micro",
    )


_ORACLE_ORW = f"""
WITH agg AS (
  SELECT sum(exp * cs)::BIGINT AS a, sum(exp * (1 - cs))::BIGINT AS b,
         sum((1 - exp) * cs)::BIGINT AS c,
         sum((1 - exp) * (1 - cs))::BIGINT AS d
  FROM (
    SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS exp,
           CASE WHEN event_type = '{_CASE_TYPE}' THEN 1 ELSE 0 END AS cs
    FROM events
  )
)
SELECT a, b, c, d,
       cast(floor(1e6 * cast(a AS DOUBLE) * cast(d AS DOUBLE)
            / (cast(b AS DOUBLE) * cast(c AS DOUBLE)) + 0.5) AS BIGINT)
       AS or_micro,
       cast(floor(1e6 * ln(cast(a AS DOUBLE) * cast(d AS DOUBLE)
            / (cast(b AS DOUBLE) * cast(c AS DOUBLE))) + 0.5) AS BIGINT)
       AS lnor_micro,
       cast(floor(1e6 * (ln(cast(a AS DOUBLE) * cast(d AS DOUBLE)
            / (cast(b AS DOUBLE) * cast(c AS DOUBLE)))
            - 1.96 * sqrt(1.0/cast(a AS DOUBLE) + 1.0/cast(b AS DOUBLE)
            + 1.0/cast(c AS DOUBLE) + 1.0/cast(d AS DOUBLE))) + 0.5) AS BIGINT)
       AS ci_lo_micro,
       cast(floor(1e6 * (ln(cast(a AS DOUBLE) * cast(d AS DOUBLE)
            / (cast(b AS DOUBLE) * cast(c AS DOUBLE)))
            + 1.96 * sqrt(1.0/cast(a AS DOUBLE) + 1.0/cast(b AS DOUBLE)
            + 1.0/cast(c AS DOUBLE) + 1.0/cast(d AS DOUBLE))) + 0.5) AS BIGINT)
       AS ci_hi_micro
FROM agg
"""


# --------------------------------------------------------------------------
# Mantel-Haenszel pooled odds ratio over day strata (X7 [EXT])
# --------------------------------------------------------------------------


def q_mantel_haenszel_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Mantel-Haenszel pooled odds ratio across DAY strata
    (exposure = even user key, case = '{c}' events): OR_MH =
    sum(a_i*d_i/n_i) / sum(b_i*c_i/n_i), with the continuity-corrected
    Cochran-MH chi-square from per-stratum hypergeometric moments
    E_i = r1_i*c1_i/n_i and V_i = r1_i*r0_i*c1_i*c0_i/(n_i^2*(n_i-1)).
    Each per-stratum rational is micro-snapped (AD staging) so both
    engines sum identical integers; strata are calendar-bounded. Strata
    where a margin is empty contribute zero to every sum (standard MH
    robustness). Output one row: n_strata, or_mh_micro, chi2_mh_milli,
    reject_05."""
    e = _t(spark, sf_dir, "events")
    cells = (
        e.select(
            F.expr(f"unix_micros(ts) div {_DAY_US}").alias("day"),
            F.expr("cast(user_id % 2 = 0 as int)").alias("exp"),
            F.expr(f"cast(event_type = '{_CASE_TYPE}' as int)").alias("cs"),
        )
        .groupBy("day")
        .agg(
            F.sum(F.expr("exp * cs")).cast("bigint").alias("a"),
            F.sum(F.expr("exp * (1 - cs)")).cast("bigint").alias("b"),
            F.sum(F.expr("(1 - exp) * cs")).cast("bigint").alias("c"),
            F.sum(F.expr("(1 - exp) * (1 - cs)")).cast("bigint").alias("d"),
        )
        .selectExpr("a", "b", "c", "d", "a + b + c + d AS n")
    )
    terms = cells.selectExpr(
        "cast(floor(1e6 * cast(a as double) * cast(d as double)"
        " / cast(n as double) + 0.5) as bigint) AS r_num",
        "cast(floor(1e6 * cast(b as double) * cast(c as double)"
        " / cast(n as double) + 0.5) as bigint) AS r_den",
        "a AS a_obs",
        "cast(floor(1e6 * cast(a + b as double) * cast(a + c as double)"
        " / cast(n as double) + 0.5) as bigint) AS e_micro",
        "if(n > 1, cast(floor(1e6 * cast(a + b as double) * cast(c + d as double)"
        " * cast(a + c as double) * cast(b + d as double)"
        " / (cast(n as double) * cast(n as double) * (cast(n as double) - 1.0))"
        " + 0.5) as bigint), cast(0 as bigint)) AS v_micro",
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("r_num").cast("bigint").alias("snum"),
        F.sum("r_den").cast("bigint").alias("sden"),
        F.sum("a_obs").cast("bigint").alias("sa"),
        F.sum("e_micro").cast("bigint").alias("se"),
        F.sum("v_micro").cast("bigint").alias("sv"),
    )
    chi2 = (
        "(pow(abs(cast(sa as double) - cast(se as double) / 1e6) - 0.5, 2.0)"
        " / (cast(sv as double) / 1e6))"
    )
    return agg.selectExpr(
        "n_strata",
        "cast(floor(1e6 * cast(snum as double) / cast(sden as double) + 0.5)"
        " as bigint) AS or_mh_micro",
        f"cast(floor(1e3 * {chi2} + 0.5) as bigint) AS chi2_mh_milli",
        f"cast(floor(1e3 * {chi2} + 0.5) as bigint) > 3841 AS reject_05",
    )


_ORACLE_MH = f"""
WITH cells AS (
  SELECT epoch_us(ts) // {_DAY_US} AS day,
         sum(CASE WHEN user_id % 2 = 0 AND event_type = '{_CASE_TYPE}'
                  THEN 1 ELSE 0 END)::BIGINT AS a,
         sum(CASE WHEN user_id % 2 = 0 AND event_type <> '{_CASE_TYPE}'
                  THEN 1 ELSE 0 END)::BIGINT AS b,
         sum(CASE WHEN user_id % 2 <> 0 AND event_type = '{_CASE_TYPE}'
                  THEN 1 ELSE 0 END)::BIGINT AS c,
         sum(CASE WHEN user_id % 2 <> 0 AND event_type <> '{_CASE_TYPE}'
                  THEN 1 ELSE 0 END)::BIGINT AS d
  FROM events GROUP BY 1
),
terms AS (
  SELECT cast(floor(1e6 * cast(a AS DOUBLE) * cast(d AS DOUBLE)
              / cast(a + b + c + d AS DOUBLE) + 0.5) AS BIGINT) AS r_num,
         cast(floor(1e6 * cast(b AS DOUBLE) * cast(c AS DOUBLE)
              / cast(a + b + c + d AS DOUBLE) + 0.5) AS BIGINT) AS r_den,
         a AS a_obs,
         cast(floor(1e6 * cast(a + b AS DOUBLE) * cast(a + c AS DOUBLE)
              / cast(a + b + c + d AS DOUBLE) + 0.5) AS BIGINT) AS e_micro,
         CASE WHEN a + b + c + d > 1 THEN
           cast(floor(1e6 * cast(a + b AS DOUBLE) * cast(c + d AS DOUBLE)
                * cast(a + c AS DOUBLE) * cast(b + d AS DOUBLE)
                / (cast(a + b + c + d AS DOUBLE) * cast(a + b + c + d AS DOUBLE)
                   * (cast(a + b + c + d AS DOUBLE) - 1.0))
                + 0.5) AS BIGINT)
         ELSE 0 END AS v_micro
  FROM cells
),
agg AS (
  SELECT count(*)::BIGINT AS n_strata, sum(r_num)::BIGINT AS snum,
         sum(r_den)::BIGINT AS sden, sum(a_obs)::BIGINT AS sa,
         sum(e_micro)::BIGINT AS se, sum(v_micro)::BIGINT AS sv
  FROM terms
)
SELECT n_strata,
       cast(floor(1e6 * cast(snum AS DOUBLE) / cast(sden AS DOUBLE) + 0.5)
            AS BIGINT) AS or_mh_micro,
       cast(floor(1e3 * (pow(abs(cast(sa AS DOUBLE) - cast(se AS DOUBLE) / 1e6)
            - 0.5, 2.0) / (cast(sv AS DOUBLE) / 1e6)) + 0.5) AS BIGINT)
       AS chi2_mh_milli,
       cast(floor(1e3 * (pow(abs(cast(sa AS DOUBLE) - cast(se AS DOUBLE) / 1e6)
            - 0.5, 2.0) / (cast(sv AS DOUBLE) / 1e6)) + 0.5) AS BIGINT) > 3841
       AS reject_05
FROM agg
"""


# --------------------------------------------------------------------------
# Cochran-Armitage trend test (X7 [EXT])
# --------------------------------------------------------------------------

_CA_Z_SQL = """
  (cast(t1 AS DOUBLE) - cast(nc AS DOUBLE) * cast(ts1 AS DOUBLE)
   / cast(n AS DOUBLE))
  / sqrt(cast(nc AS DOUBLE) / cast(n AS DOUBLE)
         * (1.0 - cast(nc AS DOUBLE) / cast(n AS DOUBLE))
         * (cast(ts2 AS DOUBLE)
            - cast(ts1 AS DOUBLE) * cast(ts1 AS DOUBLE) / cast(n AS DOUBLE)))
"""


def q_cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Cochran-Armitage trend test: does the '{c}' share rise
    monotonically across the day's three 8-hour shifts (scores 0,1,2)?
    z = (T - nc*S1/N) / sqrt(p(1-p)(S2 - S1^2/N)) with T = sum s_i*a_i,
    S1 = sum s_i*n_i, S2 = sum s_i^2*n_i, p = nc/N — six exact bigint
    sums off one keyless aggregate. Output one row: n, n_case, t1,
    z_milli, reject_05."""
    e = _t(spark, sf_dir, "events")
    agg = e.select(
        F.expr(
            f"cast((unix_micros(ts) % {_DAY_US}) div (8 * {_HOUR_US}) as bigint)"
        ).alias("s"),
        F.expr(f"cast(event_type = '{_CASE_TYPE}' as bigint)").alias("cs"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cs").cast("bigint").alias("nc"),
        F.sum(F.expr("s * cs")).cast("bigint").alias("t1"),
        F.sum("s").cast("bigint").alias("ts1"),
        F.sum(F.expr("s * s")).cast("bigint").alias("ts2"),
    )
    return agg.selectExpr(
        "n",
        "nc AS n_case",
        "t1",
        f"cast(floor(1e3 * {_CA_Z_SQL} + 0.5) as bigint) AS z_milli",
        f"abs(cast(floor(1e3 * {_CA_Z_SQL} + 0.5) as bigint)) > 1960 AS reject_05",
    )


_ORACLE_CA = f"""
WITH agg AS (
  SELECT count(*)::BIGINT AS n,
         sum(cs)::BIGINT AS nc,
         sum(s * cs)::BIGINT AS t1,
         sum(s)::BIGINT AS ts1,
         sum(s * s)::BIGINT AS ts2
  FROM (
    SELECT (epoch_us(ts) % {_DAY_US}) // (8 * {_HOUR_US}) AS s,
           CASE WHEN event_type = '{_CASE_TYPE}' THEN 1 ELSE 0 END AS cs
    FROM events
  )
)
SELECT n, nc AS n_case, t1,
       cast(floor(1e3 * {_CA_Z_SQL} + 0.5) AS BIGINT) AS z_milli,
       abs(cast(floor(1e3 * {_CA_Z_SQL} + 0.5) AS BIGINT)) > 1960 AS reject_05
FROM agg
"""


# --------------------------------------------------------------------------
# Goodman-Kruskal gamma (X7 [EXT])
# --------------------------------------------------------------------------


def q_goodman_kruskal_gamma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Goodman-Kruskal gamma between two ordinals — the day's
    8-hour shift (0<1<2) and the ISO weekday (0..6): gamma =
    (C - D) / (C + D) over concordant/discordant pairs, computed from
    the 3x7 ENUM contingency crossed with itself (a constant 441-pair
    block at any corpus size; ties contribute to neither). Output one
    row: n, c_pairs, d_pairs, gamma_micro."""
    e = _t(spark, sf_dir, "events")
    tab = (
        e.select(
            F.expr(
                f"cast((unix_micros(ts) % {_DAY_US}) div (8 * {_HOUR_US}) as int)"
            ).alias("g"),
            F.expr(
                f"cast(((unix_micros(ts) div {_DAY_US}) + 4) % 7 as int)"
            ).alias("dw"),
        )
        .groupBy("g", "dw")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    t2 = tab.selectExpr("g AS g2", "dw AS dw2", "cnt AS cnt2")
    pairs = tab.crossJoin(t2).agg(
        F.sum(
            F.expr(
                f"if((g < g2 and dw < dw2) or (g > g2 and dw > dw2),"
                f" {_DEC.format(x='cnt')} * cnt2, cast(0 as decimal(38,0)))"
            )
        ).alias("c2"),
        F.sum(
            F.expr(
                f"if((g < g2 and dw > dw2) or (g > g2 and dw < dw2),"
                f" {_DEC.format(x='cnt')} * cnt2, cast(0 as decimal(38,0)))"
            )
        ).alias("d2"),
        F.sum(F.expr("if(g = g2 and dw = dw2, cnt, cast(0 as bigint))"))
        .cast("bigint")
        .alias("n"),
    )
    return pairs.selectExpr(
        "n",
        "cast(c2 div 2 as bigint) AS c_pairs",
        "cast(d2 div 2 as bigint) AS d_pairs",
        "cast(floor(1e6 * (cast(c2 as double) - cast(d2 as double))"
        " / (cast(c2 as double) + cast(d2 as double)) + 0.5) as bigint)"
        " AS gamma_micro",
    )


_ORACLE_GKG = f"""
WITH tab AS (
  SELECT (epoch_us(ts) % {_DAY_US}) // (8 * {_HOUR_US}) AS g,
         ((epoch_us(ts) // {_DAY_US}) + 4) % 7 AS dw,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT sum(CASE WHEN (a.g < b.g AND a.dw < b.dw)
                    OR (a.g > b.g AND a.dw > b.dw)
                  THEN a.cnt::HUGEINT * b.cnt ELSE 0 END) AS c2,
         sum(CASE WHEN (a.g < b.g AND a.dw > b.dw)
                    OR (a.g > b.g AND a.dw < b.dw)
                  THEN a.cnt::HUGEINT * b.cnt ELSE 0 END) AS d2,
         sum(CASE WHEN a.g = b.g AND a.dw = b.dw THEN a.cnt ELSE 0 END)::BIGINT
           AS n
  FROM tab a, tab b
)
SELECT n,
       cast(c2 // 2 AS BIGINT) AS c_pairs,
       cast(d2 // 2 AS BIGINT) AS d_pairs,
       cast(floor(1e6 * (cast(c2 AS DOUBLE) - cast(d2 AS DOUBLE))
            / (cast(c2 AS DOUBLE) + cast(d2 AS DOUBLE)) + 0.5) AS BIGINT)
       AS gamma_micro
FROM pairs
"""


# --------------------------------------------------------------------------
# Theil's uncertainty coefficient (X7 [EXT])
# --------------------------------------------------------------------------


def q_theils_u_uncertainty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Theil's uncertainty coefficient U(type | weekday): how
    much does knowing the weekday reduce event-type entropy? U =
    (H_R + H_C - H_RC) / H_R with each entropy assembled as H = ln N -
    (sum n_i * lnmic(n_i)) / (N * 1e6), where lnmic(x) = the micro-
    snapped ln — snapped IMMEDIATELY per count (libm convention), so
    both engines sum identical integers over the 5x7 enum frame. Output
    one row: n, h_type_micro, h_wd_micro, h_joint_micro, u_micro."""
    e = _t(spark, sf_dir, "events")
    joint = (
        e.select(
            "event_type",
            F.expr(
                f"cast(((unix_micros(ts) div {_DAY_US}) + 4) % 7 as int)"
            ).alias("dw"),
        )
        .groupBy("event_type", "dw")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    lnm = "cast(floor(1e6 * ln(cast({x} as double)) + 0.5) as bigint)"
    sums = joint.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(F.expr(f"{_DEC.format(x='cnt')} * {lnm.format(x='cnt')}")).alias(
            "sj"
        ),
    )
    rows = (
        joint.groupBy("event_type")
        .agg(F.sum("cnt").cast("bigint").alias("cr"))
        .agg(
            F.sum(F.expr(f"{_DEC.format(x='cr')} * {lnm.format(x='cr')}")).alias(
                "sr"
            )
        )
    )
    cols = (
        joint.groupBy("dw")
        .agg(F.sum("cnt").cast("bigint").alias("cc"))
        .agg(
            F.sum(F.expr(f"{_DEC.format(x='cc')} * {lnm.format(x='cc')}")).alias(
                "sc"
            )
        )
    )
    h = (
        "(ln(cast(n as double))"
        " - cast({s} as double) / (cast(n as double) * 1e6))"
    )
    hr, hc, hj = h.format(s="sr"), h.format(s="sc"), h.format(s="sj")
    return (
        sums.crossJoin(F.broadcast(rows))
        .crossJoin(F.broadcast(cols))
        .selectExpr(
            "n",
            f"cast(floor(1e6 * {hr} + 0.5) as bigint) AS h_type_micro",
            f"cast(floor(1e6 * {hc} + 0.5) as bigint) AS h_wd_micro",
            f"cast(floor(1e6 * {hj} + 0.5) as bigint) AS h_joint_micro",
            f"cast(floor(1e6 * ({hr} + {hc} - {hj}) / {hr} + 0.5) as bigint)"
            " AS u_micro",
        )
    )


_ORACLE_THEILS_U = f"""
WITH joint AS (
  SELECT event_type, ((epoch_us(ts) // {_DAY_US}) + 4) % 7 AS dw,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2
),
sums AS (
  SELECT sum(cnt)::BIGINT AS n,
         sum(cnt::HUGEINT
             * cast(floor(1e6 * ln(cast(cnt AS DOUBLE)) + 0.5) AS BIGINT)) AS sj
  FROM joint
),
rws AS (
  SELECT sum(cr::HUGEINT
             * cast(floor(1e6 * ln(cast(cr AS DOUBLE)) + 0.5) AS BIGINT)) AS sr
  FROM (SELECT sum(cnt)::BIGINT AS cr FROM joint GROUP BY event_type)
),
cls AS (
  SELECT sum(cc::HUGEINT
             * cast(floor(1e6 * ln(cast(cc AS DOUBLE)) + 0.5) AS BIGINT)) AS sc
  FROM (SELECT sum(cnt)::BIGINT AS cc FROM joint GROUP BY dw)
)
SELECT n,
       cast(floor(1e6 * (ln(cast(n AS DOUBLE))
            - cast(sr AS DOUBLE) / (cast(n AS DOUBLE) * 1e6)) + 0.5) AS BIGINT)
       AS h_type_micro,
       cast(floor(1e6 * (ln(cast(n AS DOUBLE))
            - cast(sc AS DOUBLE) / (cast(n AS DOUBLE) * 1e6)) + 0.5) AS BIGINT)
       AS h_wd_micro,
       cast(floor(1e6 * (ln(cast(n AS DOUBLE))
            - cast(sj AS DOUBLE) / (cast(n AS DOUBLE) * 1e6)) + 0.5) AS BIGINT)
       AS h_joint_micro,
       cast(floor(1e6 * ((ln(cast(n AS DOUBLE))
            - cast(sr AS DOUBLE) / (cast(n AS DOUBLE) * 1e6))
            + (ln(cast(n AS DOUBLE))
            - cast(sc AS DOUBLE) / (cast(n AS DOUBLE) * 1e6))
            - (ln(cast(n AS DOUBLE))
            - cast(sj AS DOUBLE) / (cast(n AS DOUBLE) * 1e6)))
            / (ln(cast(n AS DOUBLE))
            - cast(sr AS DOUBLE) / (cast(n AS DOUBLE) * 1e6)) + 0.5) AS BIGINT)
       AS u_micro
FROM sums, rws, cls
"""


# --------------------------------------------------------------------------
# Bowker symmetry test (X7/X9 [EXT])
# --------------------------------------------------------------------------


def q_bowker_symmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7/X9 Bowker test of symmetry — McNemar's k x k
    generalization: does each user's MODAL event type in the first
    month-half (epoch-day % 30 < 15) shift asymmetrically in the
    second? Modal type per (user, half) = max count with lexicographic
    tiebreak via a row_number window KEYED by (user, half); users with
    both halves pair into a 5x5 enum transition table, and chi2 =
    sum over i<j of (n_ij - n_ji)^2 / (n_ij + n_ji) over the bounded
    table joined with its transpose. df = the number of i<j pairs with
    n_ij + n_ji > 0. Output one row: n_users_paired, chi2_milli, df."""
    e = _t(spark, sf_dir, "events")
    counts = (
        e.select(
            "user_id",
            F.expr(
                f"cast((unix_micros(ts) div {_DAY_US}) % 30 >= 15 as int)"
            ).alias("h"),
            "event_type",
        )
        .groupBy("user_id", "h", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    w = Window.partitionBy("user_id", "h").orderBy(
        F.desc("c"), F.asc("event_type")
    )
    modal = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", "h", F.col("event_type").alias("t"))
    )
    paired = (
        modal.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("nh"),
            F.max(F.expr("if(h = 0, t, null)")).alias("t1"),
            F.max(F.expr("if(h = 1, t, null)")).alias("t2"),
        )
        .filter(F.col("nh") == 2)
    )
    tab = paired.groupBy("t1", "t2").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    t2 = tab.selectExpr("t1 AS u1", "t2 AS u2", "cnt AS cnt2")
    cells = (
        tab.join(
            t2,
            (F.col("t1") == F.col("u2")) & (F.col("t2") == F.col("u1")),
            "full_outer",
        )
        .selectExpr(
            "coalesce(t1, u2) AS i",
            "coalesce(t2, u1) AS j",
            "coalesce(cnt, cast(0 as bigint)) AS nij",
            "coalesce(cnt2, cast(0 as bigint)) AS nji",
        )
        .filter(F.expr("i < j"))
    )
    agg = cells.agg(
        F.sum(
            F.expr(
                "cast(floor(1e3 * cast((nij - nji) * (nij - nji) as double)"
                " / cast(nij + nji as double) + 0.5) as bigint)"
            )
        ).alias("chi2_milli"),
        F.sum(F.expr("cast(nij + nji > 0 as bigint)")).cast("bigint").alias("df"),
    )
    n_users = paired.agg(F.count(F.lit(1)).cast("bigint").alias("n_users_paired"))
    return (
        agg.crossJoin(F.broadcast(n_users))
        .selectExpr(
            "n_users_paired", "cast(chi2_milli as bigint) AS chi2_milli", "df"
        )
    )


_ORACLE_BOWKER = f"""
WITH counts AS (
  SELECT user_id,
         CASE WHEN (epoch_us(ts) // {_DAY_US}) % 30 >= 15 THEN 1 ELSE 0 END AS h,
         event_type, count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2, 3
),
modal AS (
  SELECT user_id, h, event_type AS t
  FROM (
    SELECT user_id, h, event_type, c,
           row_number() OVER (PARTITION BY user_id, h
                              ORDER BY c DESC, event_type ASC) AS rk
    FROM counts
  ) WHERE rk = 1
),
paired AS (
  SELECT user_id,
         max(CASE WHEN h = 0 THEN t END) AS t1,
         max(CASE WHEN h = 1 THEN t END) AS t2
  FROM modal GROUP BY user_id HAVING count(*) = 2
),
tab AS (SELECT t1, t2, count(*)::BIGINT AS cnt FROM paired GROUP BY 1, 2),
cells AS (
  SELECT coalesce(a.t1, b.t2) AS i, coalesce(a.t2, b.t1) AS j,
         coalesce(a.cnt, 0)::BIGINT AS nij, coalesce(b.cnt, 0)::BIGINT AS nji
  FROM tab a
  FULL OUTER JOIN (SELECT t1, t2, cnt FROM tab) b
    ON a.t1 = b.t2 AND a.t2 = b.t1
  WHERE coalesce(a.t1, b.t2) < coalesce(a.t2, b.t1)
),
agg AS (
  SELECT sum(cast(floor(1e3 * cast((nij - nji) * (nij - nji) AS DOUBLE)
             / cast(nij + nji AS DOUBLE) + 0.5) AS BIGINT))::BIGINT
           AS chi2_milli,
         sum(CASE WHEN nij + nji > 0 THEN 1 ELSE 0 END)::BIGINT AS df
  FROM cells
),
nu AS (SELECT count(*)::BIGINT AS n_users_paired FROM paired)
SELECT n_users_paired, chi2_milli, df FROM agg, nu
"""


REGISTRY_EXT123: dict[str, QuerySpec] = {
    "odds_ratio_woolf": QuerySpec(
        q_odds_ratio_woolf, _ORACLE_ORW, "X7 [EXT] Woolf odds-ratio CI"
    ),
    "mantel_haenszel_or": QuerySpec(
        q_mantel_haenszel_or, _ORACLE_MH, "X7 [EXT] Mantel-Haenszel pooled OR"
    ),
    "cochran_armitage_trend": QuerySpec(
        q_cochran_armitage_trend, _ORACLE_CA, "X7 [EXT] Cochran-Armitage trend"
    ),
    "goodman_kruskal_gamma": QuerySpec(
        q_goodman_kruskal_gamma, _ORACLE_GKG, "X7 [EXT] Goodman-Kruskal gamma"
    ),
    "theils_u_uncertainty": QuerySpec(
        q_theils_u_uncertainty, _ORACLE_THEILS_U, "X7 [EXT] uncertainty coeff"
    ),
    "bowker_symmetry": QuerySpec(
        q_bowker_symmetry, _ORACLE_BOWKER, "X7/X9 [EXT] Bowker symmetry"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_odds_ratio_woolf.__doc__ = q_odds_ratio_woolf.__doc__.format(c=_CASE_TYPE)  # noqa: E501
q_mantel_haenszel_or.__doc__ = q_mantel_haenszel_or.__doc__.format(c=_CASE_TYPE)  # noqa: E501
q_cochran_armitage_trend.__doc__ = q_cochran_armitage_trend.__doc__.format(c=_CASE_TYPE)  # noqa: E501
