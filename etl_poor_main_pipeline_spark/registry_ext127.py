"""Wave 127 [EXT]: blocked-rank and paired-categorical completers —
Quade blocked rank ANOVA, Stuart-Maxwell marginal homogeneity,
Breslow-Day homogeneity of odds ratios (with Tarone correction),
empirical-characteristic-function two-sample distance, and the
Gehan-Breslow-Wilcoxon weighted log-rank test.

Scale notes (the 100x question, per query):
- quade_test: the corpus reduces map-side to a 35-cell (weekday x
  event_type) ENUM frame of exact micro mean values; within-block and
  between-block midranks come from bounded self-joins over that frame
  (35x5 and 7x7 pair counts — constant at any corpus size), and the
  Quade T3 statistic assembles from exact integer score sums (all /2
  and /4 midrank fractions folded into x2/x4 multiples).
- stuart_maxwell_test: per-(user, half) event counts band into a 3x3
  paired-classification ENUM table; d and the 2x2 covariance inverse
  are closed-form integer arithmetic over its 9 cells.
- breslow_day_homogeneity: per-weekday 2x2 strata reduce map-side; the
  Mantel-Haenszel common OR and each stratum's quadratic-root expected
  count are constant-time per stratum (7 strata), with the root
  micro-snapped so both engines square identical integers.
- ecf_distance_2samp: cohort value distributions reduce to CENTI VALUE
  CELLS; cos/sin at each literal t are micro-snapped once per cell and
  weighted by exact counts, so the ECF moment sums are exact integers
  (the corpus is never re-read per t — the 3-point t grid is a literal
  cross join against the bounded cell frame).
- gehan_breslow_wilcoxon: same calendar-bounded duration-day suffix
  walk as log_rank_survival (sanctioned cell-walk category); the
  n_t-weighted O and E terms collapse to EXACT integers
  (n_t * (d_t*n_1t/n_t) = d_t*n_1t), only the weighted variance term
  is micro-snapped per day.

Reference parity: none; [EXT] X7 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import QuerySpec, _t

_DAY_US = 86_400_000_000
_DEC = "cast({x} as decimal(38,0))"

_ECF_A, _ECF_B = "click", "purchase"
_ECF_TS = (0.05, 0.2, 0.8)  # literal t grid (radians per value unit)
_SM_E1, _SM_E2 = 46_000_000, 53_000_000  # per-half micro mean-value edges
_GB_EVENT = "purchase"  # time-to-first-purchase, as log_rank_survival
_QUADE_F_CRIT = 2.7763  # F(k-1=4, (b-1)(k-1)=24) at 0.95
_SM_CHI2_CRIT = 5.991  # chi2(2) at 0.95
_BD_CHI2_CRIT = 12.592  # chi2(strata-1=6) at 0.95


# --------------------------------------------------------------------------
# Quade test (X7 [EXT]) — blocked rank ANOVA with range-weighted blocks
# --------------------------------------------------------------------------


def q_quade_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Quade test (Quade 1979; Conover, Practical Nonparametric
    Statistics 3e §5.8): do the 5 event types differ in mean value when
    blocked by weekday? Treatments are ranked WITHIN each weekday block
    (midranks), blocks are weighted by the rank of their sample range,
    and S_wt = Q_w*(R_wt - (k+1)/2). T3 = (b-1)*B/(A-B) with
    A = sum S^2, B = (1/b) sum_t S_t^2 is F(k-1,(b-1)(k-1)) under H0.
    All midrank halves are folded into x2/x4 integer multiples
    (s4 = 2Q*(2R - k - 1) = 4S), so A16 = sum s4^2 and SB16 = sum_t
    (sum_w s4)^2 are exact integers and T3 = (b-1)*SB16/(b*A16 - SB16)
    exactly. Output one row: b, k, a16, sb16, t3_milli, reject_05."""
    e = _t(spark, sf_dir, "events")
    cells = (
        e.select(
            F.expr(f"(unix_micros(ts) div {_DAY_US} + 3) % 7").alias("w"),
            F.col("event_type").alias("t"),
            F.expr("cast(floor(value * 1e6 + 0.5) as bigint)").alias("vm"),
        )
        .groupBy("w", "t")
        .agg(
            F.sum("vm").cast("bigint").alias("svm"),
            F.count(F.lit(1)).cast("bigint").alias("c"),
        )
        .select(
            "w",
            "t",
            F.expr(
                "cast(floor(cast(svm as double) / cast(c as double) + 0.5)"
                " as bigint)"
            ).alias("m"),
        )
    )
    # within-block doubled midranks: 2R = 2*#less + #eq(incl self) + 1
    c2 = cells.select(
        F.col("w").alias("w2"), F.col("t").alias("t2"), F.col("m").alias("m2")
    )
    ranks = (
        cells.join(c2, cells.w == c2.w2)
        .groupBy("w", "t")
        .agg(
            F.max("m").alias("m"),  # constant per (w, t)
            (
                2 * F.sum(F.expr("cast(m2 < m as int)"))
                + F.sum(F.expr("cast(m2 = m as int)"))
                + 1
            )
            .cast("bigint")
            .alias("r2"),
        )
    )
    # block ranges and their doubled midranks over the 7-block frame
    blocks = cells.groupBy("w").agg((F.max("m") - F.min("m")).alias("rng"))
    b2f = blocks.select(F.col("w").alias("bw2"), F.col("rng").alias("rng2"))
    qranks = (
        blocks.crossJoin(b2f)
        .groupBy("w")
        .agg(
            (
                2 * F.sum(F.expr("cast(rng2 < rng as int)"))
                + F.sum(F.expr("cast(rng2 = rng as int)"))
                + 1
            )
            .cast("bigint")
            .alias("q2")
        )
    )
    kb = cells.agg(
        F.countDistinct("t").cast("bigint").alias("k"),
        F.countDistinct("w").cast("bigint").alias("b"),
    )
    scores = (
        ranks.join(qranks, "w")
        .crossJoin(F.broadcast(kb))
        .select(
            "t",
            "k",
            "b",
            F.expr(f"{_DEC.format(x='q2')} * (r2 - k - 1)").alias("s4"),
        )
    )
    agg = scores.groupBy("t").agg(
        F.max("k").alias("k"),
        F.max("b").alias("b"),
        F.sum(F.expr("s4 * s4")).alias("a16_t"),
        F.sum("s4").alias("st4"),
    )
    red = agg.agg(
        F.max("k").cast("bigint").alias("k"),
        F.max("b").cast("bigint").alias("b"),
        F.sum("a16_t").alias("a16"),
        F.sum(F.expr("st4 * st4")).alias("sb16"),
    )
    t3 = (
        "(cast(b as double) - 1.0) * cast(sb16 as double)"
        " / (cast(b as double) * cast(a16 as double) - cast(sb16 as double))"
    )
    return red.selectExpr(
        "b",
        "k",
        "cast(a16 as double) as a16",
        "cast(sb16 as double) as sb16",
        f"cast(floor(1e3 * {t3} + 0.5) as bigint) AS t3_milli",
        f"{t3} > {_QUADE_F_CRIT!r} AS reject_05",
    )


_ORACLE_QUADE = f"""
WITH cells AS (
  SELECT (epoch_us(ts) // {_DAY_US} + 3) % 7 AS w, event_type AS t,
         cast(floor(cast(sum(cast(floor(value * 1e6 + 0.5) AS BIGINT))
              AS DOUBLE) / cast(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS m
  FROM events GROUP BY 1, 2
),
ranks AS (
  SELECT c1.w, c1.t, max(c1.m) AS m,
         (2 * sum(CASE WHEN c2.m < c1.m THEN 1 ELSE 0 END)
          + sum(CASE WHEN c2.m = c1.m THEN 1 ELSE 0 END) + 1)::BIGINT AS r2
  FROM cells c1 JOIN cells c2 ON c1.w = c2.w
  GROUP BY c1.w, c1.t
),
blocks AS (SELECT w, max(m) - min(m) AS rng FROM cells GROUP BY 1),
qranks AS (
  SELECT b1.w,
         (2 * sum(CASE WHEN b2.rng < b1.rng THEN 1 ELSE 0 END)
          + sum(CASE WHEN b2.rng = b1.rng THEN 1 ELSE 0 END) + 1)::BIGINT AS q2
  FROM blocks b1 CROSS JOIN blocks b2
  GROUP BY b1.w
),
kb AS (
  SELECT count(DISTINCT t)::BIGINT AS k, count(DISTINCT w)::BIGINT AS b
  FROM cells
),
scores AS (
  SELECT r.t, kb.k, kb.b, q2::HUGEINT * (r2 - kb.k - 1) AS s4
  FROM ranks r JOIN qranks q ON r.w = q.w CROSS JOIN kb
),
agg AS (
  SELECT t, max(k) AS k, max(b) AS b, sum(s4 * s4) AS a16_t,
         sum(s4) AS st4
  FROM scores GROUP BY 1
),
red AS (
  SELECT max(k)::BIGINT AS k, max(b)::BIGINT AS b, sum(a16_t) AS a16,
         sum(st4 * st4) AS sb16
  FROM agg
)
SELECT b, k, cast(a16 AS DOUBLE) AS a16, cast(sb16 AS DOUBLE) AS sb16,
       cast(floor(1e3 * ((cast(b AS DOUBLE) - 1.0) * cast(sb16 AS DOUBLE)
            / (cast(b AS DOUBLE) * cast(a16 AS DOUBLE)
               - cast(sb16 AS DOUBLE))) + 0.5) AS BIGINT) AS t3_milli,
       ((cast(b AS DOUBLE) - 1.0) * cast(sb16 AS DOUBLE)
        / (cast(b AS DOUBLE) * cast(a16 AS DOUBLE) - cast(sb16 AS DOUBLE)))
         > {_QUADE_F_CRIT!r} AS reject_05
FROM red
"""


# --------------------------------------------------------------------------
# Stuart-Maxwell marginal homogeneity (X7 [EXT])
# --------------------------------------------------------------------------


def q_stuart_maxwell_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Stuart-Maxwell test (Stuart 1955; Maxwell 1970): did the
    distribution of per-user mean-value bands SHIFT between the first
    and second half of the observation window? Each user classifies
    into 3 bands on the micro-snapped half mean value (<= {e1}, <= {e2},
    > {e2} micro); the 3x3 paired table's marginal-homogeneity
    chi-square uses d_i = row_i - col_i and the closed-form 2x2
    covariance inverse:
    chi2 = (v22*d0^2 - 2*v01*d0*d1 + v11*d1^2) / (v11*v22 - v01^2),
    all integer until the final division. The companion of the shipped
    bowker_symmetry (symmetry vs marginal homogeneity). Output one row:
    n_users, d0, d1, chi2_milli, reject_05 (df=2)."""
    e = _t(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"),
    )
    band = (
        "cast(if({m} <= " + str(_SM_E1) + ", 0, if({m} <= " + str(_SM_E2)
        + ", 1, 2)) as int)"
    )
    # micro-snapped per-half mean (exact integer micro sums; a missing
    # half degrades to mean 0 -> band 0, deterministic in both engines)
    mean = (
        "if({c} = 0, 0L, cast(floor(cast({s} as double)"
        " / cast({c} as double) + 0.5) as bigint))"
    )
    per_user = (
        e.select(
            "user_id",
            F.unix_micros("ts").alias("tsu"),
            F.expr("cast(floor(value * 1e6 + 0.5) as bigint)").alias("vm"),
        )
        .crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            (F.col("tsu") * 2 >= F.col("t0") + F.col("t1"))
            .cast("int")
            .alias("h2"),
            "vm",
        )
        .groupBy("user_id")
        .agg(
            F.sum(F.expr("1 - h2")).cast("bigint").alias("c1"),
            F.sum("h2").cast("bigint").alias("c2"),
            F.sum(F.expr("vm * (1 - h2)")).cast("bigint").alias("s1"),
            F.sum(F.expr("vm * h2")).cast("bigint").alias("s2"),
        )
        .select(
            F.expr(band.format(m=mean.format(c="c1", s="s1"))).alias("b1"),
            F.expr(band.format(m=mean.format(c="c2", s="s2"))).alias("b2"),
        )
    )
    tab = per_user.groupBy("b1", "b2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    cell = "sum(if(b1 = {i} and b2 = {j}, n, 0L))"
    row = "sum(if(b1 = {i}, n, 0L))"
    col = "sum(if(b2 = {j}, n, 0L))"
    red = tab.agg(
        F.sum("n").cast("bigint").alias("n_users"),
        F.expr(f"{row.format(i=0)} - {col.format(j=0)}").cast("bigint").alias("d0"),
        F.expr(f"{row.format(i=1)} - {col.format(j=1)}").cast("bigint").alias("d1"),
        F.expr(
            f"{row.format(i=0)} + {col.format(j=0)} - 2 * {cell.format(i=0, j=0)}"
        ).cast("bigint").alias("v11"),
        F.expr(
            f"{row.format(i=1)} + {col.format(j=1)} - 2 * {cell.format(i=1, j=1)}"
        ).cast("bigint").alias("v22"),
        F.expr(
            f"-({cell.format(i=0, j=1)} + {cell.format(i=1, j=0)})"
        ).cast("bigint").alias("v01"),
    )
    chi2 = (
        "(cast(v22 as double) * d0 * d0 - 2.0 * cast(v01 as double) * d0 * d1"
        " + cast(v11 as double) * d1 * d1)"
        " / (cast(v11 as double) * v22 - cast(v01 as double) * v01)"
    )
    return red.selectExpr(
        "n_users",
        "d0",
        "d1",
        f"cast(floor(1e3 * {chi2} + 0.5) as bigint) AS chi2_milli",
        f"{chi2} > {_SM_CHI2_CRIT!r} AS reject_05",
    )


_ORACLE_SM = f"""
WITH bounds AS (
  SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1 FROM events
),
per_user AS (
  SELECT user_id,
         sum(CASE WHEN epoch_us(ts) * 2 >= t0 + t1 THEN 0 ELSE 1 END)::BIGINT
           AS c1,
         sum(CASE WHEN epoch_us(ts) * 2 >= t0 + t1 THEN 1 ELSE 0 END)::BIGINT
           AS c2,
         sum(CASE WHEN epoch_us(ts) * 2 >= t0 + t1 THEN 0
             ELSE cast(floor(value * 1e6 + 0.5) AS BIGINT) END)::BIGINT AS s1,
         sum(CASE WHEN epoch_us(ts) * 2 >= t0 + t1
             THEN cast(floor(value * 1e6 + 0.5) AS BIGINT) ELSE 0 END)::BIGINT
           AS s2
  FROM events, bounds GROUP BY user_id
),
means AS (
  SELECT CASE WHEN c1 = 0 THEN 0 ELSE cast(floor(cast(s1 AS DOUBLE)
           / cast(c1 AS DOUBLE) + 0.5) AS BIGINT) END AS m1,
         CASE WHEN c2 = 0 THEN 0 ELSE cast(floor(cast(s2 AS DOUBLE)
           / cast(c2 AS DOUBLE) + 0.5) AS BIGINT) END AS m2
  FROM per_user
),
banded AS (
  SELECT CASE WHEN m1 <= {_SM_E1} THEN 0 WHEN m1 <= {_SM_E2} THEN 1 ELSE 2 END
           AS b1,
         CASE WHEN m2 <= {_SM_E1} THEN 0 WHEN m2 <= {_SM_E2} THEN 1 ELSE 2 END
           AS b2
  FROM means
),
tab AS (SELECT b1, b2, count(*)::BIGINT AS n FROM banded GROUP BY 1, 2),
red AS (
  SELECT sum(n)::BIGINT AS n_users,
         (sum(CASE WHEN b1 = 0 THEN n ELSE 0 END)
          - sum(CASE WHEN b2 = 0 THEN n ELSE 0 END))::BIGINT AS d0,
         (sum(CASE WHEN b1 = 1 THEN n ELSE 0 END)
          - sum(CASE WHEN b2 = 1 THEN n ELSE 0 END))::BIGINT AS d1,
         (sum(CASE WHEN b1 = 0 THEN n ELSE 0 END)
          + sum(CASE WHEN b2 = 0 THEN n ELSE 0 END)
          - 2 * sum(CASE WHEN b1 = 0 AND b2 = 0 THEN n ELSE 0 END))::BIGINT
           AS v11,
         (sum(CASE WHEN b1 = 1 THEN n ELSE 0 END)
          + sum(CASE WHEN b2 = 1 THEN n ELSE 0 END)
          - 2 * sum(CASE WHEN b1 = 1 AND b2 = 1 THEN n ELSE 0 END))::BIGINT
           AS v22,
         (-(sum(CASE WHEN b1 = 0 AND b2 = 1 THEN n ELSE 0 END)
            + sum(CASE WHEN b1 = 1 AND b2 = 0 THEN n ELSE 0 END)))::BIGINT
           AS v01
  FROM tab
)
SELECT n_users, d0, d1,
       cast(floor(1e3 * ((cast(v22 AS DOUBLE) * d0 * d0
            - 2.0 * cast(v01 AS DOUBLE) * d0 * d1
            + cast(v11 AS DOUBLE) * d1 * d1)
            / (cast(v11 AS DOUBLE) * v22 - cast(v01 AS DOUBLE) * v01))
            + 0.5) AS BIGINT) AS chi2_milli,
       ((cast(v22 AS DOUBLE) * d0 * d0 - 2.0 * cast(v01 AS DOUBLE) * d0 * d1
         + cast(v11 AS DOUBLE) * d1 * d1)
        / (cast(v11 AS DOUBLE) * v22 - cast(v01 AS DOUBLE) * v01))
         > {_SM_CHI2_CRIT!r} AS reject_05
FROM red
"""


# --------------------------------------------------------------------------
# Breslow-Day homogeneity of odds ratios (X7 [EXT])
# --------------------------------------------------------------------------


def q_breslow_day_homogeneity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Breslow-Day test (Breslow & Day 1980 §IV.4; Tarone 1985
    correction): is the odds ratio between exposure (odd user_id) and
    outcome (event_type='{ev}') HOMOGENEOUS across the 7 weekday strata?
    The companion of the shipped mantel_haenszel_or (which assumes the
    common OR this test checks). Per stratum the expected exposed-case
    count under the MH common OR solves the quadratic
    (1-OR)*x^2 + ((n-r1-c1) + OR*(r1+c1))*x - OR*r1*c1 = 0 (root inside
    [max(0, r1+c1-n), min(r1, c1)], micro-snapped so both engines square
    identical values); chi2 = sum (a-x)^2/Var(x) with the harmonic
    variance, Tarone subtracts (sum(a-x))^2/sum Var. Output one row:
    n_strata, or_mh_milli, bd_chi2_milli, tarone_chi2_milli, reject_05
    (df=6)."""
    e = _t(spark, sf_dir, "events")
    strata = (
        e.select(
            F.expr(f"(unix_micros(ts) div {_DAY_US} + 3) % 7").alias("w"),
            F.expr("cast(user_id % 2 = 1 as int)").alias("x"),
            F.expr(f"cast(event_type = '{_GB_EVENT}' as int)").alias("y"),
        )
        .groupBy("w")
        .agg(
            F.sum(F.expr("x * y")).cast("bigint").alias("a"),
            F.sum(F.expr("x * (1 - y)")).cast("bigint").alias("b"),
            F.sum(F.expr("(1 - x) * y")).cast("bigint").alias("c"),
            F.sum(F.expr("(1 - x) * (1 - y)")).cast("bigint").alias("d"),
        )
    )
    # MH common OR from micro-snapped per-stratum ad/n and bc/n terms
    mh = strata.agg(
        F.sum(
            F.expr(
                "cast(floor(1e6 * cast(a as double) * cast(d as double)"
                " / cast(a + b + c + d as double) + 0.5) as bigint)"
            )
        ).alias("r_micro"),
        F.sum(
            F.expr(
                "cast(floor(1e6 * cast(b as double) * cast(c as double)"
                " / cast(a + b + c + d as double) + 0.5) as bigint)"
            )
        ).alias("s_micro"),
    )
    orr = "(cast(r_micro as double) / cast(s_micro as double))"
    # quadratic root for the expected exposed-case count per stratum
    terms = strata.crossJoin(F.broadcast(mh)).selectExpr(
        "w",
        "a",
        f"{orr} AS orr",
        "cast(a + b as double) AS r1",
        "cast(a + c as double) AS c1",
        "cast(a + b + c + d as double) AS n",
    )
    qa = "(1.0 - orr)"
    qb = "((n - r1 - c1) + orr * (r1 + c1))"
    qc = "(-orr * r1 * c1)"
    disc = f"sqrt({qb} * {qb} - 4.0 * {qa} * {qc})"
    rt1 = f"((-{qb} + {disc}) / (2.0 * {qa}))"
    rt2 = f"((-{qb} - {disc}) / (2.0 * {qa}))"
    lo = "greatest(0.0, r1 + c1 - n)"
    hi = "least(r1, c1)"
    pick = (
        f"if({rt1} >= {lo} - 1e-9 and {rt1} <= {hi} + 1e-9, {rt1}, {rt2})"
    )
    rooted = terms.selectExpr(
        "w",
        "a",
        "r1",
        "c1",
        "n",
        f"cast(floor(1e6 * {pick} + 0.5) as bigint) AS x_micro",
    ).selectExpr(
        "a",
        "cast(x_micro as double) / 1e6 AS x",
        "r1",
        "c1",
        "n",
    )
    var = (
        "(1.0 / (1.0/x + 1.0/(r1 - x) + 1.0/(c1 - x) + 1.0/(n - r1 - c1 + x)))"
    )
    red = rooted.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum(
            F.expr(
                f"cast(floor(1e6 * (cast(a as double) - x) * (cast(a as double) - x)"
                f" / {var} + 0.5) as bigint)"
            )
        ).alias("chi2_micro"),
        F.sum(
            F.expr("cast(floor(1e6 * (cast(a as double) - x) + 0.5) as bigint)")
        ).alias("dev_micro"),
        F.sum(F.expr(f"cast(floor(1e6 * {var} + 0.5) as bigint)")).alias(
            "var_micro"
        ),
    ).crossJoin(F.broadcast(mh))
    tarone = (
        "(cast(chi2_micro as double) / 1e6"
        " - (cast(dev_micro as double) / 1e6) * (cast(dev_micro as double) / 1e6)"
        " / (cast(var_micro as double) / 1e6))"
    )
    return red.selectExpr(
        "n_strata",
        f"cast(floor(1e3 * {orr} + 0.5) as bigint) AS or_mh_milli",
        "cast(floor(cast(chi2_micro as double) / 1e3 + 0.5) as bigint)"
        " AS bd_chi2_milli",
        f"cast(floor(1e3 * {tarone} + 0.5) as bigint) AS tarone_chi2_milli",
        f"{tarone} > {_BD_CHI2_CRIT!r} AS reject_05",
    )


_ORACLE_BD = f"""
WITH strata AS (
  SELECT (epoch_us(ts) // {_DAY_US} + 3) % 7 AS w,
         sum(CASE WHEN user_id % 2 = 1 AND event_type = '{_GB_EVENT}'
             THEN 1 ELSE 0 END)::BIGINT AS a,
         sum(CASE WHEN user_id % 2 = 1 AND event_type <> '{_GB_EVENT}'
             THEN 1 ELSE 0 END)::BIGINT AS b,
         sum(CASE WHEN user_id % 2 = 0 AND event_type = '{_GB_EVENT}'
             THEN 1 ELSE 0 END)::BIGINT AS c,
         sum(CASE WHEN user_id % 2 = 0 AND event_type <> '{_GB_EVENT}'
             THEN 1 ELSE 0 END)::BIGINT AS d
  FROM events GROUP BY 1
),
mh AS (
  SELECT sum(cast(floor(1e6 * cast(a AS DOUBLE) * cast(d AS DOUBLE)
             / cast(a + b + c + d AS DOUBLE) + 0.5) AS BIGINT)) AS r_micro,
         sum(cast(floor(1e6 * cast(b AS DOUBLE) * cast(c AS DOUBLE)
             / cast(a + b + c + d AS DOUBLE) + 0.5) AS BIGINT)) AS s_micro
  FROM strata
),
terms AS (
  SELECT w, a,
         cast(r_micro AS DOUBLE) / cast(s_micro AS DOUBLE) AS orr,
         cast(a + b AS DOUBLE) AS r1, cast(a + c AS DOUBLE) AS c1,
         cast(a + b + c + d AS DOUBLE) AS n
  FROM strata, mh
),
rooted AS (
  SELECT a, r1, c1, n,
         cast(floor(1e6 * (CASE WHEN
             ((-((n - r1 - c1) + orr * (r1 + c1))
               + sqrt(((n - r1 - c1) + orr * (r1 + c1))
                      * ((n - r1 - c1) + orr * (r1 + c1))
                      - 4.0 * (1.0 - orr) * (-orr * r1 * c1)))
              / (2.0 * (1.0 - orr))) >= greatest(0.0, r1 + c1 - n) - 1e-9
             AND
             ((-((n - r1 - c1) + orr * (r1 + c1))
               + sqrt(((n - r1 - c1) + orr * (r1 + c1))
                      * ((n - r1 - c1) + orr * (r1 + c1))
                      - 4.0 * (1.0 - orr) * (-orr * r1 * c1)))
              / (2.0 * (1.0 - orr))) <= least(r1, c1) + 1e-9
           THEN
             ((-((n - r1 - c1) + orr * (r1 + c1))
               + sqrt(((n - r1 - c1) + orr * (r1 + c1))
                      * ((n - r1 - c1) + orr * (r1 + c1))
                      - 4.0 * (1.0 - orr) * (-orr * r1 * c1)))
              / (2.0 * (1.0 - orr)))
           ELSE
             ((-((n - r1 - c1) + orr * (r1 + c1))
               - sqrt(((n - r1 - c1) + orr * (r1 + c1))
                      * ((n - r1 - c1) + orr * (r1 + c1))
                      - 4.0 * (1.0 - orr) * (-orr * r1 * c1)))
              / (2.0 * (1.0 - orr)))
           END) + 0.5) AS BIGINT) AS x_micro
  FROM terms
),
vals AS (
  SELECT a, cast(x_micro AS DOUBLE) / 1e6 AS x, r1, c1, n FROM rooted
),
red AS (
  SELECT count(*)::BIGINT AS n_strata,
         sum(cast(floor(1e6 * (cast(a AS DOUBLE) - x) * (cast(a AS DOUBLE) - x)
             / (1.0 / (1.0/x + 1.0/(r1 - x) + 1.0/(c1 - x)
                       + 1.0/(n - r1 - c1 + x))) + 0.5) AS BIGINT))
           AS chi2_micro,
         sum(cast(floor(1e6 * (cast(a AS DOUBLE) - x) + 0.5) AS BIGINT))
           AS dev_micro,
         sum(cast(floor(1e6 * (1.0 / (1.0/x + 1.0/(r1 - x) + 1.0/(c1 - x)
                       + 1.0/(n - r1 - c1 + x))) + 0.5) AS BIGINT))
           AS var_micro
  FROM vals
)
SELECT n_strata,
       cast(floor(1e3 * (cast(r_micro AS DOUBLE) / cast(s_micro AS DOUBLE))
            + 0.5) AS BIGINT) AS or_mh_milli,
       cast(floor(cast(chi2_micro AS DOUBLE) / 1e3 + 0.5) AS BIGINT)
         AS bd_chi2_milli,
       cast(floor(1e3 * (cast(chi2_micro AS DOUBLE) / 1e6
            - (cast(dev_micro AS DOUBLE) / 1e6)
              * (cast(dev_micro AS DOUBLE) / 1e6)
              / (cast(var_micro AS DOUBLE) / 1e6)) + 0.5) AS BIGINT)
         AS tarone_chi2_milli,
       (cast(chi2_micro AS DOUBLE) / 1e6
        - (cast(dev_micro AS DOUBLE) / 1e6) * (cast(dev_micro AS DOUBLE) / 1e6)
          / (cast(var_micro AS DOUBLE) / 1e6)) > {_BD_CHI2_CRIT!r}
         AS reject_05
FROM red, mh
"""


# --------------------------------------------------------------------------
# Empirical characteristic function distance (X7 [EXT])
# --------------------------------------------------------------------------


def q_ecf_distance_2samp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 empirical-characteristic-function two-sample distance
    between '{a}' and '{b}' event values (the moment family behind the
    Epps-Singleton test): at each literal frequency t the cohort ECFs
    phi(t) = (mean cos(t*v), mean sin(t*v)) are compared and
    dist = (dC^2 + dS^2). cos/sin are micro-snapped ONCE per centi value
    cell and weighted by exact counts, so the moment sums are exact
    integers and the 3-point t grid never re-reads the corpus. Output
    per t: t_milli, n_a, n_b, dc_micro, ds_micro, dist_micro."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_ECF_A, _ECF_B)
    )
    cells = (
        e.select(
            F.expr("cast(floor(value * 100.0 + 0.5) as bigint)").alias("vc"),
            F.expr(f"cast(event_type = '{_ECF_A}' as int)").alias("isa"),
        )
        .groupBy("vc")
        .agg(
            F.sum("isa").cast("bigint").alias("ca"),
            F.sum(F.expr("1 - isa")).cast("bigint").alias("cb"),
        )
    )
    # explicit DOUBLE literals: bare decimal literals parse as DECIMAL in
    # both engines, and decimal-vs-double trig arguments would drift
    ts = ", ".join(f"cast({t!r} as double)" for t in _ECF_TS)
    grid = cells.select(
        "vc", "ca", "cb", F.explode(F.expr(f"array({ts})")).alias("t")
    )
    cosm = "cast(floor(1e6 * cos(t * (cast(vc as double) / 100.0)) + 0.5) as bigint)"
    sinm = "cast(floor(1e6 * sin(t * (cast(vc as double) / 100.0)) + 0.5) as bigint)"
    agg = grid.groupBy("t").agg(
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
        F.sum(F.expr(f"ca * {cosm}")).cast("bigint").alias("sca"),
        F.sum(F.expr(f"cb * {cosm}")).cast("bigint").alias("scb"),
        F.sum(F.expr(f"ca * {sinm}")).cast("bigint").alias("ssa"),
        F.sum(F.expr(f"cb * {sinm}")).cast("bigint").alias("ssb"),
    )
    dc = "(cast(sca as double) / n_a - cast(scb as double) / n_b)"
    ds = "(cast(ssa as double) / n_a - cast(ssb as double) / n_b)"
    return agg.selectExpr(
        "cast(floor(1e3 * t + 0.5) as bigint) AS t_milli",
        "n_a",
        "n_b",
        f"cast(floor({dc} + 0.5) as bigint) AS dc_micro",
        f"cast(floor({ds} + 0.5) as bigint) AS ds_micro",
        f"cast(floor(({dc} * {dc} + {ds} * {ds}) / 1e6 + 0.5) as bigint)"
        " AS dist_micro",
    ).orderBy("t_milli")


_ORACLE_ECF = f"""
WITH cells AS (
  SELECT cast(floor(value * 100.0 + 0.5) AS BIGINT) AS vc,
         sum(CASE WHEN event_type = '{_ECF_A}' THEN 1 ELSE 0 END)::BIGINT AS ca,
         sum(CASE WHEN event_type = '{_ECF_B}' THEN 1 ELSE 0 END)::BIGINT AS cb
  FROM events WHERE event_type IN ('{_ECF_A}', '{_ECF_B}')
  GROUP BY 1
),
grid AS (
  SELECT vc, ca, cb, t
  FROM cells,
       unnest([{", ".join(f"cast({t!r} AS DOUBLE)" for t in _ECF_TS)}]) AS u(t)
),
agg AS (
  SELECT t, sum(ca)::BIGINT AS n_a, sum(cb)::BIGINT AS n_b,
         sum(ca * cast(floor(1e6 * cos(t * (cast(vc AS DOUBLE) / 100.0))
             + 0.5) AS BIGINT))::BIGINT AS sca,
         sum(cb * cast(floor(1e6 * cos(t * (cast(vc AS DOUBLE) / 100.0))
             + 0.5) AS BIGINT))::BIGINT AS scb,
         sum(ca * cast(floor(1e6 * sin(t * (cast(vc AS DOUBLE) / 100.0))
             + 0.5) AS BIGINT))::BIGINT AS ssa,
         sum(cb * cast(floor(1e6 * sin(t * (cast(vc AS DOUBLE) / 100.0))
             + 0.5) AS BIGINT))::BIGINT AS ssb
  FROM grid GROUP BY 1
)
SELECT cast(floor(1e3 * t + 0.5) AS BIGINT) AS t_milli, n_a, n_b,
       cast(floor((cast(sca AS DOUBLE) / n_a - cast(scb AS DOUBLE) / n_b)
            + 0.5) AS BIGINT) AS dc_micro,
       cast(floor((cast(ssa AS DOUBLE) / n_a - cast(ssb AS DOUBLE) / n_b)
            + 0.5) AS BIGINT) AS ds_micro,
       cast(floor(((cast(sca AS DOUBLE) / n_a - cast(scb AS DOUBLE) / n_b)
                   * (cast(sca AS DOUBLE) / n_a - cast(scb AS DOUBLE) / n_b)
                   + (cast(ssa AS DOUBLE) / n_a - cast(ssb AS DOUBLE) / n_b)
                   * (cast(ssa AS DOUBLE) / n_a - cast(ssb AS DOUBLE) / n_b))
                  / 1e6 + 0.5) AS BIGINT) AS dist_micro
FROM agg ORDER BY t_milli
"""


# --------------------------------------------------------------------------
# Gehan-Breslow-Wilcoxon weighted log-rank (X7/X9 [EXT])
# --------------------------------------------------------------------------


def q_gehan_breslow_wilcoxon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7/X9 Gehan-Breslow-Wilcoxon test: the n_t-weighted
    log-rank companion of the shipped log_rank_survival (same
    time-to-first-'{ev}' framing, weight w_t = n_t at risk — sensitive
    to EARLY survival differences where Mantel-Cox weights all days
    equally; Breslow 1970). The weighted O and E sums collapse to exact
    integers (n_t * (d_t*n_1t/n_t) = d_t*n_1t); only the weighted
    variance n_t^2 * V_t is micro-snapped per duration day. Same
    calendar-bounded suffix walk over the duration-day cells. Output one
    row: n_users, u_stat, v_micro, z_milli."""
    e = _t(spark, sf_dir, "events")
    per_user = (
        e.select(
            "user_id",
            F.expr(f"unix_micros(ts) div {_DAY_US}").alias("d"),
            F.when(
                F.col("event_type") == _GB_EVENT,
                F.expr(f"unix_micros(ts) div {_DAY_US}"),
            ).alias("pd"),
        )
        .groupBy("user_id")
        .agg(
            F.min("d").alias("d0"),
            F.min("pd").alias("dp"),
            F.max("d").alias("dl"),
        )
        .select(
            (F.col("user_id") % 2 == 0).cast("int").alias("g1"),
            F.when(F.col("dp").isNotNull(), F.col("dp") - F.col("d0"))
            .otherwise(F.col("dl") - F.col("d0"))
            .cast("bigint")
            .alias("t"),
            F.col("dp").isNotNull().cast("int").alias("ev"),
        )
    )
    cells = per_user.groupBy("t").agg(
        F.sum(F.expr("ev * g1")).cast("bigint").alias("d1"),
        F.sum("ev").cast("bigint").alias("dt"),
        F.sum("g1").cast("bigint").alias("a1"),
        F.count(F.lit(1)).cast("bigint").alias("at"),
    )
    w = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    live = "(dt > 0 and nt > 1)"
    terms = cells.select(
        "d1",
        "dt",
        F.sum("a1").over(w).cast("bigint").alias("n1"),
        F.sum("at").over(w).cast("bigint").alias("nt"),
    ).select(
        "nt",
        F.expr(f"if({live}, nt * d1, 0L)").alias("wo"),
        F.expr(f"if({live}, dt * n1, 0L)").alias("we"),
        F.expr(
            f"if({live},"
            " cast(floor(1e6 * cast(dt * n1 as double)"
            " * (1.0 - cast(n1 as double) / cast(nt as double))"
            " * cast(nt - dt as double) / cast(nt - 1 as double)"
            " * cast(nt as double)"  # w^2 * V with one nt cancelled
            " + 0.5) as bigint), 0L)"
        ).alias("wv_micro"),
    )
    red = terms.agg(
        F.max("nt").cast("bigint").alias("n_users"),
        F.sum("wo").cast("bigint").alias("wo"),
        F.sum("we").cast("bigint").alias("we"),
        F.sum("wv_micro").cast("bigint").alias("v_micro"),
    )
    z = (
        "(cast(wo - we as double)"
        " / sqrt(cast(v_micro as double) / 1e6))"
    )
    return red.selectExpr(
        "n_users",
        "wo - we AS u_stat",
        "v_micro",
        f"cast(floor(1e3 * {z} + 0.5) as bigint) AS z_milli",
    )


_ORACLE_GBW = f"""
WITH per_user AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS g1,
         (CASE WHEN min(CASE WHEN event_type = '{_GB_EVENT}'
                  THEN epoch_us(ts) // {_DAY_US} END) IS NOT NULL
           THEN min(CASE WHEN event_type = '{_GB_EVENT}'
                    THEN epoch_us(ts) // {_DAY_US} END)
                - min(epoch_us(ts) // {_DAY_US})
           ELSE max(epoch_us(ts) // {_DAY_US})
                - min(epoch_us(ts) // {_DAY_US}) END)::BIGINT AS t,
         CASE WHEN min(CASE WHEN event_type = '{_GB_EVENT}'
                  THEN epoch_us(ts) // {_DAY_US} END) IS NOT NULL
           THEN 1 ELSE 0 END AS ev
  FROM events GROUP BY user_id
),
cells AS (
  SELECT t, sum(ev * g1)::BIGINT AS d1, sum(ev)::BIGINT AS dt,
         sum(g1)::BIGINT AS a1, count(*)::BIGINT AS at
  FROM per_user GROUP BY 1
),
walk AS (
  SELECT d1, dt,
         sum(a1) OVER (ORDER BY t DESC)::BIGINT AS n1,
         sum(at) OVER (ORDER BY t DESC)::BIGINT AS nt
  FROM cells
),
terms AS (
  SELECT nt,
         CASE WHEN dt > 0 AND nt > 1 THEN nt * d1 ELSE 0 END AS wo,
         CASE WHEN dt > 0 AND nt > 1 THEN dt * n1 ELSE 0 END AS we,
         CASE WHEN dt > 0 AND nt > 1 THEN
           cast(floor(1e6 * cast(dt * n1 AS DOUBLE)
                * (1.0 - cast(n1 AS DOUBLE) / cast(nt AS DOUBLE))
                * cast(nt - dt AS DOUBLE) / cast(nt - 1 AS DOUBLE)
                * cast(nt AS DOUBLE) + 0.5) AS BIGINT)
           ELSE 0 END AS wv_micro
  FROM walk
)
SELECT max(nt)::BIGINT AS n_users,
       (sum(wo) - sum(we))::BIGINT AS u_stat,
       sum(wv_micro)::BIGINT AS v_micro,
       cast(floor(1e3 * (cast(sum(wo) - sum(we) AS DOUBLE)
            / sqrt(cast(sum(wv_micro) AS DOUBLE) / 1e6)) + 0.5) AS BIGINT)
         AS z_milli
FROM terms
"""


REGISTRY_EXT127: dict[str, QuerySpec] = {
    "quade_test": QuerySpec(q_quade_test, _ORACLE_QUADE, "X7 [EXT] Quade test"),
    "stuart_maxwell_test": QuerySpec(
        q_stuart_maxwell_test, _ORACLE_SM, "X7 [EXT] Stuart-Maxwell"
    ),
    "breslow_day_homogeneity": QuerySpec(
        q_breslow_day_homogeneity, _ORACLE_BD, "X7 [EXT] Breslow-Day"
    ),
    "ecf_distance_2samp": QuerySpec(
        q_ecf_distance_2samp, _ORACLE_ECF, "X7 [EXT] ECF distance"
    ),
    "gehan_breslow_wilcoxon": QuerySpec(
        q_gehan_breslow_wilcoxon, _ORACLE_GBW, "X7/X9 [EXT] Gehan-Breslow"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_stuart_maxwell_test.__doc__ = q_stuart_maxwell_test.__doc__.format(e1=_SM_E1, e2=_SM_E2)  # noqa: E501
q_breslow_day_homogeneity.__doc__ = q_breslow_day_homogeneity.__doc__.format(ev=_GB_EVENT)  # noqa: E501
q_ecf_distance_2samp.__doc__ = q_ecf_distance_2samp.__doc__.format(a=_ECF_A, b=_ECF_B)  # noqa: E501
q_gehan_breslow_wilcoxon.__doc__ = q_gehan_breslow_wilcoxon.__doc__.format(ev=_GB_EVENT)  # noqa: E501
