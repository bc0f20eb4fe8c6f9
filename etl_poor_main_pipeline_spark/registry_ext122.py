"""Wave 122 [EXT]: paired and rank nonparametrics — Wilcoxon signed-rank,
paired sign test, Hodges-Lehmann shift estimator, Ansari-Bradley
dispersion test, Jonckheere-Terpstra ordered-alternative trend.

Scale notes (the 100x question, per query):
- wilcoxon_signed_rank / sign_test_paired: the corpus reduces map-side
  to one row per (user, day, half-day) via exact integer micro sums;
  the paired-difference frame then collapses to CENTI DIFFERENCE CELLS
  (bounded by the value domain, not the corpus), and the signed-rank
  midranks are ONE prefix walk over those cells (the sanctioned
  KS/CvM/AD cell-walk category) that also carries the zero-cell pair
  count, so nothing re-reads the corpus. The sign test is a keyless
  aggregate over the same pair frame — no window at all.
- hodges_lehmann_shift: both cohorts reduce to DECI VALUE CELLS
  (<= ~5k cells at any corpus size); the pairwise-difference frame is
  the bounded cells x cells cross (value-domain^2, CONSTANT in the
  corpus — the same bounded-block idiom as energy_distance_2samp), and
  the weighted median is the order statistic at rank ceil(T/2) off one
  prefix walk over difference cells.
- ansari_bradley_test: pooled centi cells; every per-run score block
  (doubled AB scores 2*a_r = (N+1) - |N+1-2r|) has a CLOSED integer
  form in the run endpoints, assembled WITHOUT any division (the /2,
  /6, /4 are folded into x2/x3/x12 multiples carried in
  decimal(38,0)/HUGEINT), so Sum(a) and Sum(a^2) are exact off one
  prefix walk — no per-row ranks ever materialize. Only the per-cell
  midrank-AVERAGE score (a rational) is double-snapped to micro, the
  documented AD staging. General-scores moments (Conover): E[W] =
  m*Sum(a)/N, Var[W] = m*n*(N*Sum(a^2) - Sum(a)^2) / (N^2*(N-1)).
- jonckheere_terpstra_trend: (hour-bucket, centi-cell) counts pivot to
  one row per pooled cell with per-group counts; 2*JT needs only the
  per-group STRICT-PREFIX sums at each cell — one window walk, zero
  cross joins, zero per-row ranks. The Hollander-Wolfe tie-corrected
  variance needs only group sizes and cell-local tie triples, all
  exact integers.

Reference parity: none; [EXT] X7 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import QuerySpec, _t

_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000
_HL_A_MOD = 0  # even user_id -> cohort A
_AB_A, _AB_B = "click", "purchase"

_DEC = "cast({x} as decimal(38,0))"


# --------------------------------------------------------------------------
# paired (user, day) half-day frame shared by wilcoxon / sign test
# --------------------------------------------------------------------------


def _paired_diffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per (user, day) with both half-days present: d_centi =
    round-half-up centi difference of the exact micro-snapped half-day
    mean values (PM minus AM)."""
    e = _t(spark, sf_dir, "events")
    halves = (
        e.select(
            "user_id",
            F.expr(f"unix_micros(ts) div {_DAY_US}").alias("d"),
            F.expr(
                f"cast((unix_micros(ts) % {_DAY_US}) div {_HOUR_US} >= 12 as int)"
            ).alias("pm"),
            F.expr("cast(floor(value * 1e6 + 0.5) as bigint)").alias("vm"),
        )
        .groupBy("user_id", "d", "pm")
        .agg(
            F.expr(
                "cast(floor(cast(sum(vm) as double) / count(1) + 0.5) as bigint)"
            ).alias("m")
        )
    )
    return (
        halves.groupBy("user_id", "d")
        .agg(
            F.count(F.lit(1)).alias("nh"),
            F.sum(F.expr("if(pm = 1, m, cast(0 as bigint))")).alias("mpm"),
            F.sum(F.expr("if(pm = 0, m, cast(0 as bigint))")).alias("mam"),
        )
        .filter(F.col("nh") == 2)
        .select(
            F.expr(
                "cast(floor(cast(mpm - mam as double) / 1e4 + 0.5) as bigint)"
            ).alias("dc")
        )
    )


_PAIRED_DIFFS_SQL = f"""
  SELECT cast(floor(cast(mpm - mam AS DOUBLE) / 1e4 + 0.5) AS BIGINT) AS dc
  FROM (
    SELECT user_id, d, count(*) AS nh,
           sum(CASE WHEN pm = 1 THEN m ELSE 0 END) AS mpm,
           sum(CASE WHEN pm = 0 THEN m ELSE 0 END) AS mam
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


# --------------------------------------------------------------------------
# Wilcoxon signed-rank test (X7 [EXT])
# --------------------------------------------------------------------------

_WILCOXON_Z_SQL = """
  (cast(w2 AS DOUBLE) / 2.0
   - cast(n AS DOUBLE) * (cast(n AS DOUBLE) + 1.0) / 4.0)
  / sqrt(cast(n AS DOUBLE) * (cast(n AS DOUBLE) + 1.0)
         * (2.0 * cast(n AS DOUBLE) + 1.0) / 24.0
         - cast(tie3 AS DOUBLE) / 48.0)
"""


def q_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Wilcoxon signed-rank test: do PM half-day mean event
    values differ from AM within (user, day) pairs? Zero differences are
    dropped (the classical convention) but their pair count is carried
    through the SAME cell walk (no second corpus pass); |d| centi cells
    hold positive/negative counts, tie-aware doubled midranks R2 =
    2*before + l + 1 come from one prefix walk, and 2*W+ = sum(cp * R2)
    is an exact integer. Normal approximation with the standard tie
    correction: var = n(n+1)(2n+1)/24 - sum t(t-1)(t+1)/48. Output one
    row: n_pairs, n_nonzero, w_plus_x2, z_milli, reject_05."""
    pairs = _paired_diffs(spark, sf_dir)
    cells = pairs.groupBy(F.expr("abs(dc)").alias("a")).agg(
        F.sum(F.expr("cast(dc > 0 as bigint)")).alias("cp"),
        F.count(F.lit(1)).cast("bigint").alias("ctot"),
    )
    # a = 0 cells carry l = 0, so they never shift the nonzero midranks
    # (they sort first) but still contribute to n_pairs in the same pass.
    w = Window.orderBy("a").rowsBetween(Window.unboundedPreceding, 0)
    pref = cells.select(
        "cp",
        "ctot",
        F.expr("if(a > 0, ctot, cast(0 as bigint))").alias("l"),
        (
            F.sum(F.expr("if(a > 0, ctot, cast(0 as bigint))")).over(w)
            - F.expr("if(a > 0, ctot, cast(0 as bigint))")
        )
        .cast("bigint")
        .alias("bef"),
    )
    agg = pref.agg(
        F.sum("ctot").cast("bigint").alias("n_pairs"),
        F.sum("l").cast("bigint").alias("n"),
        F.sum(
            F.expr(f"{_DEC.format(x='cp')} * (2 * {_DEC.format(x='bef')} + l + 1)")
        ).alias("w2"),
        F.sum(F.expr(f"{_DEC.format(x='l')} * (l - 1) * (l + 1)")).alias("tie3"),
    )
    return agg.selectExpr(
        "n_pairs",
        "n AS n_nonzero",
        "cast(w2 as bigint) AS w_plus_x2",
        f"cast(floor(1e3 * {_WILCOXON_Z_SQL} + 0.5) as bigint) AS z_milli",
        f"abs(cast(floor(1e3 * {_WILCOXON_Z_SQL} + 0.5) as bigint)) > 1960"
        " AS reject_05",
    )


_ORACLE_WILCOXON = f"""
WITH pairs AS ({_PAIRED_DIFFS_SQL}),
cells AS (
  SELECT abs(dc) AS a,
         sum(CASE WHEN dc > 0 THEN 1 ELSE 0 END)::BIGINT AS cp,
         count(*)::BIGINT AS ctot
  FROM pairs GROUP BY 1
),
pref AS (
  SELECT cp, ctot,
         CASE WHEN a > 0 THEN ctot ELSE 0 END AS l,
         (sum(CASE WHEN a > 0 THEN ctot ELSE 0 END) OVER (ORDER BY a)
          - CASE WHEN a > 0 THEN ctot ELSE 0 END)::BIGINT AS bef
  FROM cells
),
agg AS (
  SELECT sum(ctot)::BIGINT AS n_pairs, sum(l)::BIGINT AS n,
         sum(cp::HUGEINT * (2 * bef::HUGEINT + l + 1)) AS w2,
         sum(l::HUGEINT * (l - 1) * (l + 1)) AS tie3
  FROM pref
)
SELECT n_pairs, n AS n_nonzero, cast(w2 AS BIGINT) AS w_plus_x2,
       cast(floor(1e3 * {_WILCOXON_Z_SQL} + 0.5) AS BIGINT) AS z_milli,
       abs(cast(floor(1e3 * {_WILCOXON_Z_SQL} + 0.5) AS BIGINT)) > 1960
       AS reject_05
FROM agg
"""


# --------------------------------------------------------------------------
# Paired sign test (X7 [EXT])
# --------------------------------------------------------------------------

_SIGN_Z_SQL = """
  (2.0 * cast(s_plus AS DOUBLE) - cast(s_plus + s_minus AS DOUBLE))
  / sqrt(cast(s_plus + s_minus AS DOUBLE))
"""


def q_sign_test_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 paired sign test on the same (user, day) PM-vs-AM frame
    as the signed-rank test: S+ = positive differences, S- = negative
    (zeros dropped), z = (2*S+ - n) / sqrt(n) — the distribution-free
    companion that needs no symmetry assumption. Output one row:
    n_pairs, s_plus, s_minus, z_milli, reject_05."""
    pairs = _paired_diffs(spark, sf_dir)
    agg = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.expr("cast(dc > 0 as bigint)")).cast("bigint").alias("s_plus"),
        F.sum(F.expr("cast(dc < 0 as bigint)")).cast("bigint").alias("s_minus"),
    )
    return agg.selectExpr(
        "n_pairs",
        "s_plus",
        "s_minus",
        f"cast(floor(1e3 * {_SIGN_Z_SQL} + 0.5) as bigint) AS z_milli",
        f"abs(cast(floor(1e3 * {_SIGN_Z_SQL} + 0.5) as bigint)) > 1960"
        " AS reject_05",
    )


_ORACLE_SIGN = f"""
WITH pairs AS ({_PAIRED_DIFFS_SQL}),
agg AS (
  SELECT count(*)::BIGINT AS n_pairs,
         sum(CASE WHEN dc > 0 THEN 1 ELSE 0 END)::BIGINT AS s_plus,
         sum(CASE WHEN dc < 0 THEN 1 ELSE 0 END)::BIGINT AS s_minus
  FROM pairs
)
SELECT n_pairs, s_plus, s_minus,
       cast(floor(1e3 * {_SIGN_Z_SQL} + 0.5) AS BIGINT) AS z_milli,
       abs(cast(floor(1e3 * {_SIGN_Z_SQL} + 0.5) AS BIGINT)) > 1960 AS reject_05
FROM agg
"""


# --------------------------------------------------------------------------
# Hodges-Lehmann shift estimator (X7 [EXT])
# --------------------------------------------------------------------------


def q_hodges_lehmann_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Hodges-Lehmann location-shift estimator between even- and
    odd-keyed user cohorts: the (lower) median of ALL pairwise value
    differences a_i - b_j at DECI resolution. Both cohorts reduce to
    deci value cells (value-domain-bounded, ~5k cells at ANY corpus
    size), the difference frame is the cells x cells cross weighted by
    count products — a CONSTANT-size block at 100x, the bounded-block
    idiom of energy_distance_2samp — and the median is the order
    statistic at rank ceil(T/2) off one prefix walk. Output one row:
    n_a, n_b, n_diff_pairs, hl_shift_deci."""
    e = _t(spark, sf_dir, "events")
    cells = (
        e.select(
            F.expr("cast(floor(value * 10.0 + 0.5) as bigint)").alias("vd"),
            F.expr(f"cast(user_id % 2 = {_HL_A_MOD} as int)").alias("isa"),
        )
        .groupBy("vd")
        .agg(
            F.sum("isa").cast("bigint").alias("ca"),
            F.sum(F.expr("1 - isa")).cast("bigint").alias("cb"),
        )
    )
    a = cells.filter(F.col("ca") > 0).select(F.col("vd").alias("va"), "ca")
    b = cells.filter(F.col("cb") > 0).select(F.col("vd").alias("vb"), "cb")
    diffs = (
        a.crossJoin(b)
        .groupBy(F.expr("va - vb").alias("dd"))
        .agg(F.sum(F.expr(f"{_DEC.format(x='ca')} * cb")).alias("cnt"))
    )
    wspec = Window.orderBy("dd").rowsBetween(Window.unboundedPreceding, 0)
    pref = diffs.select("dd", F.sum("cnt").over(wspec).alias("cum"))
    tot = pref.agg(F.max("cum").alias("t"))
    na_nb = cells.agg(
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
    )
    return (
        pref.crossJoin(F.broadcast(tot))
        .filter(
            F.expr("cum >= cast(ceil(cast(t as double) / 2.0) as decimal(38,0))")
        )
        .agg(F.min("dd").cast("bigint").alias("hl_shift_deci"))
        .crossJoin(F.broadcast(na_nb))
        .selectExpr("n_a", "n_b", "n_a * n_b AS n_diff_pairs", "hl_shift_deci")
    )


_ORACLE_HL = f"""
WITH cells AS (
  SELECT cast(floor(value * 10.0 + 0.5) AS BIGINT) AS vd,
         sum(CASE WHEN user_id % 2 = {_HL_A_MOD} THEN 1 ELSE 0 END)::BIGINT AS ca,
         sum(CASE WHEN user_id % 2 = {_HL_A_MOD} THEN 0 ELSE 1 END)::BIGINT AS cb
  FROM events GROUP BY 1
),
diffs AS (
  SELECT a.vd - b.vd AS dd, sum(a.ca::HUGEINT * b.cb) AS cnt
  FROM (SELECT vd, ca FROM cells WHERE ca > 0) a,
       (SELECT vd, cb FROM cells WHERE cb > 0) b
  GROUP BY 1
),
pref AS (SELECT dd, sum(cnt) OVER (ORDER BY dd) AS cum FROM diffs),
tot AS (SELECT max(cum) AS t FROM pref),
nn AS (SELECT sum(ca)::BIGINT AS n_a, sum(cb)::BIGINT AS n_b FROM cells)
SELECT n_a, n_b, n_a * n_b AS n_diff_pairs,
       (SELECT min(dd)::BIGINT FROM pref, tot
        WHERE cum >= ceil(cast(t AS DOUBLE) / 2.0)) AS hl_shift_deci
FROM nn
"""


# --------------------------------------------------------------------------
# Ansari-Bradley dispersion test (X7 [EXT])
# --------------------------------------------------------------------------

_AB_Z_SQL = """
  (cast(w_micro AS DOUBLE) / 1e6
   - cast(n_a AS DOUBLE) * (cast(suma2 AS DOUBLE) / 2.0) / cast(nn AS DOUBLE))
  / sqrt(cast(n_a AS DOUBLE) * cast(n_b AS DOUBLE)
         * (cast(nn AS DOUBLE) * (cast(sumaa12 AS DOUBLE) / 12.0)
            - (cast(suma2 AS DOUBLE) / 2.0) * (cast(suma2 AS DOUBLE) / 2.0))
         / (cast(nn AS DOUBLE) * cast(nn AS DOUBLE)
            * (cast(nn AS DOUBLE) - 1.0)))
"""


def q_ansari_bradley_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Ansari-Bradley scale test between '{a}' and '{b}' event
    values: scores a_r = min(r, N+1-r) concentrate small scores at both
    extremes, so a smaller A-sample score sum means MORE dispersion.
    With doubled scores 2*a_r = (N+1) - |N+1-2r|, every per-run block
    has a closed integer form in the run endpoints, assembled WITHOUT
    division: suma2 = 2*Sum(a) and sumaa12 = 12*Sum(a^2) stay exact in
    decimal(38,0)/HUGEINT. Only the per-cell midrank-average score is
    double-snapped to micro (the AD staging). Conover general-scores
    normal approximation. Output one row: n_a, n_b, w_micro, z_milli,
    reject_05."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type").isin(_AB_A, _AB_B))
    cells = (
        e.select(
            F.expr("cast(floor(value * 100.0 + 0.5) as bigint)").alias("vc"),
            F.expr(f"cast(event_type = '{_AB_A}' as int)").alias("isa"),
        )
        .groupBy("vc")
        .agg(
            F.sum("isa").cast("bigint").alias("ca"),
            F.sum(F.expr("1 - isa")).cast("bigint").alias("cb"),
        )
    )
    w = Window.orderBy("vc").rowsBetween(Window.unboundedPreceding, 0)
    pref = cells.select(
        "ca",
        "cb",
        F.expr("ca + cb").alias("l"),
        (F.sum(F.expr("ca + cb")).over(w) - F.expr("ca + cb"))
        .cast("bigint")
        .alias("bef"),
    )
    tot = pref.agg(F.max(F.expr("bef + l")).cast("bigint").alias("nn"))
    # Closed run forms over positions r = bef+1 .. bef+l with k = N+1,
    # h = k div 2 (rows with k - 2r >= 0), m1 = clamp(h - bef, 0, l):
    #   sabs  = Sum |k-2r|            (two arithmetic-series halves)
    #   s2    = Sum (k - |k-2r|)    = l*k - sabs          (= 2*Sum a, run)
    #   sr2   = 2*Sum r             = l*(2*bef + l + 1)
    #   srr6  = 6*Sum r^2           = B(B+1)(2B+1) - b0(b0+1)(2b0+1)
    #   usq3  = 3*Sum (k-2r)^2      = 3*l*k*k - 6*k*sr2 + 2*srr6
    #   ssq12 = 3*Sum (k-|k-2r|)^2  = 3*l*k*k - 6*k*sabs + usq3
    #           (= 12*Sum a^2 over the run; all divisions folded away)
    terms = (
        pref.crossJoin(F.broadcast(tot))
        .selectExpr(
            "ca",
            "l",
            "bef",
            "nn",
            "nn + 1 AS k",
            "greatest(cast(0 as bigint), least((nn + 1) div 2 - bef, l)) AS m1",
        )
        .selectExpr(
            "ca",
            "l",
            "nn",
            "k",
            f"{_DEC.format(x='m1')} * k - {_DEC.format(x='m1')} * (2 * (bef + 1) + m1 - 1)"
            f" + {_DEC.format(x='(l - m1)')} * (2 * (bef + 1 + m1) + (l - m1) - 1)"
            f" - {_DEC.format(x='(l - m1)')} * k AS sabs",
            f"{_DEC.format(x='l')} * (2 * bef + l + 1) AS sr2",
            f"{_DEC.format(x='(bef + l)')} * (bef + l + 1) * (2 * (bef + l) + 1)"
            f" - {_DEC.format(x='bef')} * (bef + 1) * (2 * bef + 1) AS srr6",
        )
        .selectExpr(
            "ca",
            "l",
            "nn",
            f"{_DEC.format(x='l')} * k - sabs AS s2",
            f"3 * {_DEC.format(x='l')} * k * k - 6 * {_DEC.format(x='k')} * sabs"
            f" + (3 * {_DEC.format(x='l')} * k * k - 6 * {_DEC.format(x='k')} * sr2"
            " + 2 * srr6) AS ssq12",
        )
    )
    sums = terms.agg(
        F.max("nn").alias("nn"),
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum(F.expr("l - ca")).cast("bigint").alias("n_b"),
        # W = sum_cells ca * (s2 / (2l)) — per-cell average score,
        # micro-snapped (the AD per-cell double staging)
        F.sum(
            F.expr(
                "cast(floor(1e6 * cast(ca as double) * cast(s2 as double)"
                " / (2.0 * cast(l as double)) + 0.5) as bigint)"
            )
        ).alias("w_micro"),
        F.sum("s2").alias("suma2"),
        F.sum("ssq12").alias("sumaa12"),
    )
    return sums.selectExpr(
        "n_a",
        "n_b",
        "w_micro",
        f"cast(floor(1e3 * {_AB_Z_SQL} + 0.5) as bigint) AS z_milli",
        f"abs(cast(floor(1e3 * {_AB_Z_SQL} + 0.5) as bigint)) > 1960 AS reject_05",
    )


_ORACLE_AB = f"""
WITH cells AS (
  SELECT cast(floor(value * 100.0 + 0.5) AS BIGINT) AS vc,
         sum(CASE WHEN event_type = '{_AB_A}' THEN 1 ELSE 0 END)::BIGINT AS ca,
         sum(CASE WHEN event_type = '{_AB_B}' THEN 1 ELSE 0 END)::BIGINT AS cb
  FROM cells_src GROUP BY 1
),
pref AS (
  SELECT ca, cb, ca + cb AS l,
         (sum(ca + cb) OVER (ORDER BY vc) - (ca + cb))::BIGINT AS bef
  FROM cells
),
tot AS (SELECT max(bef + l)::BIGINT AS nn FROM pref),
base AS (
  SELECT ca, l, bef, nn, nn + 1 AS k,
         greatest(0, least((nn + 1) // 2 - bef, l)) AS m1
  FROM pref, tot
),
closed AS (
  SELECT ca, l, nn, k,
         m1::HUGEINT * k - m1::HUGEINT * (2 * (bef + 1) + m1 - 1)
           + (l - m1)::HUGEINT * (2 * (bef + 1 + m1) + (l - m1) - 1)
           - (l - m1)::HUGEINT * k AS sabs,
         l::HUGEINT * (2 * bef + l + 1) AS sr2,
         (bef + l)::HUGEINT * (bef + l + 1) * (2 * (bef + l) + 1)
           - bef::HUGEINT * (bef + 1) * (2 * bef + 1) AS srr6
  FROM base
),
terms AS (
  SELECT ca, l, nn,
         l::HUGEINT * k - sabs AS s2,
         3 * l::HUGEINT * k * k - 6 * k::HUGEINT * sabs
           + (3 * l::HUGEINT * k * k - 6 * k::HUGEINT * sr2 + 2 * srr6) AS ssq12
  FROM closed
),
sums AS (
  SELECT max(nn) AS nn, sum(ca)::BIGINT AS n_a, sum(l - ca)::BIGINT AS n_b,
         sum(cast(floor(1e6 * cast(ca AS DOUBLE) * cast(s2 AS DOUBLE)
             / (2.0 * cast(l AS DOUBLE)) + 0.5) AS BIGINT))::BIGINT AS w_micro,
         sum(s2) AS suma2,
         sum(ssq12) AS sumaa12
  FROM terms
)
SELECT n_a, n_b, w_micro,
       cast(floor(1e3 * {_AB_Z_SQL} + 0.5) AS BIGINT) AS z_milli,
       abs(cast(floor(1e3 * {_AB_Z_SQL} + 0.5) AS BIGINT)) > 1960 AS reject_05
FROM sums
""".replace(
    "FROM cells_src",
    f"FROM events WHERE event_type IN ('{_AB_A}', '{_AB_B}')",
)


# --------------------------------------------------------------------------
# Jonckheere-Terpstra ordered-alternative trend test (X9 [EXT])
# --------------------------------------------------------------------------

_JT_Z_SQL = """
  (cast(jt_x2 AS DOUBLE) / 2.0
   - (cast(n AS DOUBLE) * cast(n AS DOUBLE)
      - cast(n0 AS DOUBLE) * cast(n0 AS DOUBLE)
      - cast(n1 AS DOUBLE) * cast(n1 AS DOUBLE)
      - cast(n2 AS DOUBLE) * cast(n2 AS DOUBLE)) / 4.0)
  / sqrt(
    (cast(n AS DOUBLE) * (cast(n AS DOUBLE) - 1.0)
       * (2.0 * cast(n AS DOUBLE) + 5.0)
     - (cast(n0 AS DOUBLE) * (cast(n0 AS DOUBLE) - 1.0)
          * (2.0 * cast(n0 AS DOUBLE) + 5.0)
        + cast(n1 AS DOUBLE) * (cast(n1 AS DOUBLE) - 1.0)
          * (2.0 * cast(n1 AS DOUBLE) + 5.0)
        + cast(n2 AS DOUBLE) * (cast(n2 AS DOUBLE) - 1.0)
          * (2.0 * cast(n2 AS DOUBLE) + 5.0))
     - cast(t25 AS DOUBLE)) / 72.0
    + (cast(n0 AS DOUBLE) * (cast(n0 AS DOUBLE) - 1.0)
         * (cast(n0 AS DOUBLE) - 2.0)
       + cast(n1 AS DOUBLE) * (cast(n1 AS DOUBLE) - 1.0)
         * (cast(n1 AS DOUBLE) - 2.0)
       + cast(n2 AS DOUBLE) * (cast(n2 AS DOUBLE) - 1.0)
         * (cast(n2 AS DOUBLE) - 2.0))
      * cast(t3 AS DOUBLE)
      / (36.0 * cast(n AS DOUBLE) * (cast(n AS DOUBLE) - 1.0)
         * (cast(n AS DOUBLE) - 2.0))
    + (cast(n0 AS DOUBLE) * (cast(n0 AS DOUBLE) - 1.0)
       + cast(n1 AS DOUBLE) * (cast(n1 AS DOUBLE) - 1.0)
       + cast(n2 AS DOUBLE) * (cast(n2 AS DOUBLE) - 1.0))
      * cast(t2 AS DOUBLE)
      / (8.0 * cast(n AS DOUBLE) * (cast(n AS DOUBLE) - 1.0)))
"""


def q_jonckheere_terpstra_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7/X9 Jonckheere-Terpstra test for an ORDERED alternative:
    do event values trend across the day's three 8-hour shifts
    (night < day < evening)? 2*JT = sum over pooled centi cells of
    sum over group pairs i<j of (2*c_j(cell)*before_i(cell) +
    c_i(cell)*c_j(cell)) — the per-group strict-prefix sums come from
    ONE window walk over the pooled cells, no group-pair cross join, no
    per-row ranks. Normal approximation with the full Hollander-Wolfe
    tie-corrected variance (group sizes n_i, pooled tie runs t_u).
    Output one row: n, jt_x2, z_milli, reject_05."""
    e = _t(spark, sf_dir, "events")
    cells = (
        e.select(
            F.expr("cast(floor(value * 100.0 + 0.5) as bigint)").alias("vc"),
            F.expr(
                f"cast((unix_micros(ts) % {_DAY_US}) div (8 * {_HOUR_US}) as int)"
            ).alias("g"),
        )
        .groupBy("vc")
        .agg(
            F.sum(F.expr("cast(g = 0 as bigint)")).alias("c0"),
            F.sum(F.expr("cast(g = 1 as bigint)")).alias("c1"),
            F.sum(F.expr("cast(g = 2 as bigint)")).alias("c2"),
        )
    )
    w = Window.orderBy("vc").rowsBetween(Window.unboundedPreceding, 0)
    pref = cells.select(
        "c0",
        "c1",
        "c2",
        (F.sum("c0").over(w) - F.col("c0")).cast("bigint").alias("b0"),
        (F.sum("c1").over(w) - F.col("c1")).cast("bigint").alias("b1"),
    )
    agg = pref.agg(
        F.sum("c0").cast("bigint").alias("n0"),
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum(
            F.expr(
                f"2 * {_DEC.format(x='c1')} * b0 + {_DEC.format(x='c0')} * c1"
                f" + 2 * {_DEC.format(x='c2')} * b0 + {_DEC.format(x='c0')} * c2"
                f" + 2 * {_DEC.format(x='c2')} * b1 + {_DEC.format(x='c1')} * c2"
            )
        ).alias("jt2"),
        F.sum(
            F.expr(
                f"{_DEC.format(x='(c0 + c1 + c2)')} * (c0 + c1 + c2 - 1)"
                " * (2 * (c0 + c1 + c2) + 5)"
            )
        ).alias("t25"),
        F.sum(
            F.expr(
                f"{_DEC.format(x='(c0 + c1 + c2)')} * (c0 + c1 + c2 - 1)"
                " * (c0 + c1 + c2 - 2)"
            )
        ).alias("t3"),
        F.sum(
            F.expr(f"{_DEC.format(x='(c0 + c1 + c2)')} * (c0 + c1 + c2 - 1)")
        ).alias("t2"),
    )
    named = agg.selectExpr(
        "n0 + n1 + n2 AS n",
        "n0",
        "n1",
        "n2",
        "cast(jt2 as bigint) AS jt_x2",
        "t25",
        "t3",
        "t2",
    )
    return named.selectExpr(
        "n",
        "jt_x2",
        f"cast(floor(1e3 * {_JT_Z_SQL} + 0.5) as bigint) AS z_milli",
        f"abs(cast(floor(1e3 * {_JT_Z_SQL} + 0.5) as bigint)) > 1960 AS reject_05",
    )


_ORACLE_JT = f"""
WITH cells AS (
  SELECT cast(floor(value * 100.0 + 0.5) AS BIGINT) AS vc,
         sum(CASE WHEN (epoch_us(ts) % {_DAY_US}) // (8 * {_HOUR_US}) = 0
                  THEN 1 ELSE 0 END)::BIGINT AS c0,
         sum(CASE WHEN (epoch_us(ts) % {_DAY_US}) // (8 * {_HOUR_US}) = 1
                  THEN 1 ELSE 0 END)::BIGINT AS c1,
         sum(CASE WHEN (epoch_us(ts) % {_DAY_US}) // (8 * {_HOUR_US}) = 2
                  THEN 1 ELSE 0 END)::BIGINT AS c2
  FROM events GROUP BY 1
),
pref AS (
  SELECT c0, c1, c2,
         (sum(c0) OVER (ORDER BY vc) - c0)::BIGINT AS b0,
         (sum(c1) OVER (ORDER BY vc) - c1)::BIGINT AS b1
  FROM cells
),
agg AS (
  SELECT sum(c0)::BIGINT AS n0, sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2,
         sum(2 * c1::HUGEINT * b0 + c0::HUGEINT * c1
             + 2 * c2::HUGEINT * b0 + c0::HUGEINT * c2
             + 2 * c2::HUGEINT * b1 + c1::HUGEINT * c2) AS jt2,
         sum((c0 + c1 + c2)::HUGEINT * (c0 + c1 + c2 - 1)
             * (2 * (c0 + c1 + c2) + 5)) AS t25,
         sum((c0 + c1 + c2)::HUGEINT * (c0 + c1 + c2 - 1)
             * (c0 + c1 + c2 - 2)) AS t3,
         sum((c0 + c1 + c2)::HUGEINT * (c0 + c1 + c2 - 1)) AS t2
  FROM pref
),
named AS (
  SELECT n0 + n1 + n2 AS n, n0, n1, n2, cast(jt2 AS BIGINT) AS jt_x2,
         t25, t3, t2
  FROM agg
)
SELECT n, jt_x2,
       cast(floor(1e3 * {_JT_Z_SQL} + 0.5) AS BIGINT) AS z_milli,
       abs(cast(floor(1e3 * {_JT_Z_SQL} + 0.5) AS BIGINT)) > 1960 AS reject_05
FROM named
"""


REGISTRY_EXT122: dict[str, QuerySpec] = {
    "wilcoxon_signed_rank": QuerySpec(
        q_wilcoxon_signed_rank, _ORACLE_WILCOXON, "X7 [EXT] Wilcoxon signed-rank"
    ),
    "sign_test_paired": QuerySpec(
        q_sign_test_paired, _ORACLE_SIGN, "X7 [EXT] paired sign test"
    ),
    "hodges_lehmann_shift": QuerySpec(
        q_hodges_lehmann_shift, _ORACLE_HL, "X7 [EXT] Hodges-Lehmann shift"
    ),
    "ansari_bradley_test": QuerySpec(
        q_ansari_bradley_test, _ORACLE_AB, "X7 [EXT] Ansari-Bradley scale test"
    ),
    "jonckheere_terpstra_trend": QuerySpec(
        q_jonckheere_terpstra_trend, _ORACLE_JT, "X7 [EXT] Jonckheere-Terpstra"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_ansari_bradley_test.__doc__ = q_ansari_bradley_test.__doc__.format(a=_AB_A, b=_AB_B)  # noqa: E501
