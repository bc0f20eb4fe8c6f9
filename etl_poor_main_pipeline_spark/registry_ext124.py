"""Wave 124 [EXT]: calendar-spine time-series completers — KPSS
stationarity, Engle-Granger cointegration, permutation entropy,
turning-point test, Cox-Stuart trend, Bartels rank von-Neumann ratio.

Scale notes (the 100x question, per query):
- ALL SIX reduce the corpus map-side to the DAILY spine (one groupBy on
  the calendar day; exact integer micro means) — the frame is bounded
  by the observation window, not the corpus, so every subsequent lag /
  prefix window is the sanctioned pettitt/page-hinkley calendar
  category. The daily means are micro-snapped integers, so lagged
  products, partial sums and rank arithmetic stay exact
  (decimal(38,0)/HUGEINT) until the final double assembly.
- kpss_stationarity: Bartlett long-run variance with fixed L=2 lags —
  two lag windows + one prefix-sum window over the spine.
- engle_granger_coint: exact integer OLS moments -> micro-snapped
  residuals -> lag-1 Dickey-Fuller regression on the residual spine
  (the cointegration companion of the shipped dickey_fuller_unit_root).
- permutation_entropy_daily: tie-aware ordinal codes (3-way compare
  trits, 27 codes) from two lead windows; entropy over the bounded code
  alphabet with per-count micro-snapped ln (libm convention).
- turning_point_test / cox_stuart_trend / bartels_rank_vonneumann:
  strict-inequality turning points, half-spine pairing (lead by
  h = n div 2 via an equi-join on day+h), and doubled midranks (2*rbar
  = n+1 exactly) keep every statistic an exact integer ratio.

Reference parity: none; [EXT] X7 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import QuerySpec, _t

_DAY_US = 86_400_000_000
_KPSS_L = 2  # Bartlett truncation lag
_EG_X, _EG_Y = "click", "purchase"

_DEC = "cast({x} as decimal(38,0))"


def _daily(spark: SparkSession, sf_dir: str, where: str | None = None) -> DataFrame:
    """Daily spine: exact micro-snapped mean event value per day."""
    e = _t(spark, sf_dir, "events")
    if where:
        e = e.filter(where)
    return (
        e.select(
            F.expr(f"unix_micros(ts) div {_DAY_US}").alias("d"),
            F.expr("cast(floor(value * 1e6 + 0.5) as bigint)").alias("vm"),
        )
        .groupBy("d")
        .agg(
            F.expr(
                "cast(floor(cast(sum(vm) as double) / count(1) + 0.5) as bigint)"
            ).alias("m")
        )
    )


def _daily_sql(where: str = "") -> str:
    return f"""
  SELECT epoch_us(ts) // {_DAY_US} AS d,
         cast(floor(cast(sum(cast(floor(value * 1e6 + 0.5) AS BIGINT))
                         AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS m
  FROM events {where}
  GROUP BY 1
"""


# --------------------------------------------------------------------------
# KPSS level-stationarity test (X7 [EXT])
# --------------------------------------------------------------------------

# Bartlett weights inlined as exact Python float reprs (bit-identical in
# both engines; the round-8 gumbel lesson about literal subexpressions)
_W1 = repr(1.0 - 1.0 / (_KPSS_L + 1.0))
_W2 = repr(1.0 - 2.0 / (_KPSS_L + 1.0))

_KPSS_STAT_SQL = f"""
  (cast(ssq AS DOUBLE) / (cast(n AS DOUBLE) * cast(n AS DOUBLE)))
  / ((cast(g0 AS DOUBLE) + 2.0 * {_W1} * cast(g1 AS DOUBLE)
      + 2.0 * {_W2} * cast(g2 AS DOUBLE)) / cast(n AS DOUBLE))
"""


def q_kpss_stationarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 KPSS level-stationarity test on the daily mean-value
    series: eta = n^-2 * sum S_t^2 / s^2_lrv, with S_t the running sum
    of micro-integer residuals e_t = m_t - mean(m) and the long-run
    variance the Bartlett kernel with L={l} lags (weights inlined as
    exact float reprs in BOTH engines). Residuals, partial sums and
    autocovariance products are exact integers until the final double
    ratio. Under H0 (level-stationary) eta's 5% critical value is
    0.463. Output one row: n, eta_milli, reject_05."""
    daily = _daily(spark, sf_dir)
    gm = daily.agg(
        F.expr(
            "cast(floor(cast(sum(m) as double) / count(1) + 0.5) as bigint)"
        ).alias("gm"),
    )
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wlag = Window.orderBy("d")
    e = (
        daily.crossJoin(F.broadcast(gm))
        .select(F.col("d"), (F.col("m") - F.col("gm")).alias("e"))
        .select(
            "e",
            F.sum("e").over(wcum).cast("bigint").alias("s"),
            F.lag("e", 1).over(wlag).alias("e1"),
            F.lag("e", 2).over(wlag).alias("e2"),
        )
    )
    agg = e.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr(f"{_DEC.format(x='s')} * s")).alias("ssq"),
        F.sum(F.expr(f"{_DEC.format(x='e')} * e")).alias("g0"),
        F.sum(F.expr(f"if(e1 is null, cast(0 as decimal(38,0)), {_DEC.format(x='e')} * e1)")).alias("g1"),
        F.sum(F.expr(f"if(e2 is null, cast(0 as decimal(38,0)), {_DEC.format(x='e')} * e2)")).alias("g2"),
    )
    return agg.selectExpr(
        "n",
        f"cast(floor(1e3 * {_KPSS_STAT_SQL} + 0.5) as bigint) AS eta_milli",
        f"cast(floor(1e3 * {_KPSS_STAT_SQL} + 0.5) as bigint) > 463 AS reject_05",
    )


_ORACLE_KPSS = f"""
WITH daily AS ({_daily_sql()}),
gm AS (
  SELECT cast(floor(cast(sum(m) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS gm
  FROM daily
),
e AS (
  SELECT m - gm AS e,
         sum(m - gm) OVER (ORDER BY d)::BIGINT AS s,
         lag(m - gm, 1) OVER (ORDER BY d) AS e1,
         lag(m - gm, 2) OVER (ORDER BY d) AS e2
  FROM daily, gm
),
agg AS (
  SELECT count(*)::BIGINT AS n,
         sum(s::HUGEINT * s) AS ssq,
         sum(e::HUGEINT * e) AS g0,
         sum(CASE WHEN e1 IS NULL THEN 0 ELSE e::HUGEINT * e1 END) AS g1,
         sum(CASE WHEN e2 IS NULL THEN 0 ELSE e::HUGEINT * e2 END) AS g2
  FROM e
)
SELECT n,
       cast(floor(1e3 * {_KPSS_STAT_SQL} + 0.5) AS BIGINT) AS eta_milli,
       cast(floor(1e3 * {_KPSS_STAT_SQL} + 0.5) AS BIGINT) > 463 AS reject_05
FROM agg
"""


# --------------------------------------------------------------------------
# Engle-Granger cointegration 2-step (X7 [EXT])
# --------------------------------------------------------------------------

_EG_TAU_SQL = """
  (cast(srd AS DOUBLE) / cast(srr AS DOUBLE))
  / sqrt(((cast(sdd AS DOUBLE)
           - cast(srd AS DOUBLE) * cast(srd AS DOUBLE) / cast(srr AS DOUBLE))
          / (cast(nd AS DOUBLE) - 1.0)) / cast(srr AS DOUBLE))
"""


def q_engle_granger_coint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Engle-Granger two-step cointegration check between the
    daily mean '{x}' series (x) and daily mean '{y}' series (y): step 1
    fits y = a + b*x by OLS from exact integer moments (slope and
    intercept micro-snapped); step 2 runs the no-constant Dickey-Fuller
    regression dr_t = rho * r_(t-1) + u_t on the micro-snapped
    residuals and reports tau = rho_hat / se(rho_hat) — the unit-root
    test on the cointegrating residual (compare tau to the Engle-
    Granger -3.37 5% critical value; more negative = cointegrated).
    Days present in only one series drop (inner day join). Output one
    row: n_days, slope_micro, intercept_micro, tau_milli,
    reject_05."""
    dx = _daily(spark, sf_dir, f"event_type = '{_EG_X}'").selectExpr(
        "d", "m AS mx"
    )
    dy = _daily(spark, sf_dir, f"event_type = '{_EG_Y}'").selectExpr(
        "d", "m AS my"
    )
    xy = dx.join(dy, "d")
    mom = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("mx").cast("bigint").alias("sx"),
        F.sum("my").cast("bigint").alias("sy"),
        F.sum(F.expr(f"{_DEC.format(x='mx')} * mx")).alias("sxx"),
        F.sum(F.expr(f"{_DEC.format(x='mx')} * my")).alias("sxy"),
    )
    # slope/intercept snapped to micro from exact moments (doubles only
    # at the snap): b = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
    fit = mom.selectExpr(
        "n",
        "cast(floor(1e6 * (cast(n as double) * cast(sxy as double)"
        " - cast(sx as double) * cast(sy as double))"
        " / (cast(n as double) * cast(sxx as double)"
        " - cast(sx as double) * cast(sx as double)) + 0.5) as bigint)"
        " AS b_micro",
    ).selectExpr(
        "n",
        "b_micro",
    )
    fit2 = (
        mom.crossJoin(F.broadcast(fit.select("b_micro")))
        .selectExpr(
            "n",
            "b_micro",
            # a = (Sy - b*Sx) / n, with b the SNAPPED slope so both
            # engines residualize identically; a in micro units
            "cast(floor((cast(sy as double)"
            " - cast(b_micro as double) / 1e6 * cast(sx as double))"
            " / cast(n as double) + 0.5) as bigint) AS a_micro",
        )
    )
    res = (
        xy.crossJoin(F.broadcast(fit2.select("b_micro", "a_micro")))
        .select(
            "d",
            F.expr(
                "cast(floor(cast(my as double) - cast(a_micro as double)"
                " - cast(b_micro as double) / 1e6 * cast(mx as double)"
                " + 0.5) as bigint)"
            ).alias("r"),
        )
    )
    wlag = Window.orderBy("d")
    dfr = res.select(
        F.lag("r", 1).over(wlag).alias("rp"),
        (F.col("r") - F.lag("r", 1).over(wlag)).alias("dr"),
    ).filter(F.col("rp").isNotNull())
    agg = dfr.agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.sum(F.expr(f"{_DEC.format(x='rp')} * dr")).alias("srd"),
        F.sum(F.expr(f"{_DEC.format(x='rp')} * rp")).alias("srr"),
        F.sum(F.expr(f"{_DEC.format(x='dr')} * dr")).alias("sdd"),
    )
    final = agg.crossJoin(F.broadcast(fit2.select("n", "b_micro", "a_micro")))
    return final.selectExpr(
        "n AS n_days",
        "b_micro AS slope_micro",
        "a_micro AS intercept_micro",
        f"cast(floor(1e3 * {_EG_TAU_SQL} + 0.5) as bigint) AS tau_milli",
        f"cast(floor(1e3 * {_EG_TAU_SQL} + 0.5) as bigint) < -3370 AS reject_05",
    )


_ORACLE_EG = f"""
WITH dx AS ({_daily_sql(f"WHERE event_type = '{_EG_X}'")}),
dy AS ({_daily_sql(f"WHERE event_type = '{_EG_Y}'")}),
xy AS (
  SELECT dx.d, dx.m AS mx, dy.m AS my FROM dx JOIN dy ON dx.d = dy.d
),
mom AS (
  SELECT count(*)::BIGINT AS n, sum(mx)::BIGINT AS sx, sum(my)::BIGINT AS sy,
         sum(mx::HUGEINT * mx) AS sxx, sum(mx::HUGEINT * my) AS sxy
  FROM xy
),
fit AS (
  SELECT n,
         cast(floor(1e6 * (cast(n AS DOUBLE) * cast(sxy AS DOUBLE)
              - cast(sx AS DOUBLE) * cast(sy AS DOUBLE))
              / (cast(n AS DOUBLE) * cast(sxx AS DOUBLE)
              - cast(sx AS DOUBLE) * cast(sx AS DOUBLE)) + 0.5) AS BIGINT)
           AS b_micro,
         sx, sy
  FROM mom
),
fit2 AS (
  SELECT n, b_micro,
         cast(floor((cast(sy AS DOUBLE)
              - cast(b_micro AS DOUBLE) / 1e6 * cast(sx AS DOUBLE))
              / cast(n AS DOUBLE) + 0.5) AS BIGINT) AS a_micro
  FROM fit
),
res AS (
  SELECT xy.d,
         cast(floor(cast(my AS DOUBLE) - cast(a_micro AS DOUBLE)
              - cast(b_micro AS DOUBLE) / 1e6 * cast(mx AS DOUBLE)
              + 0.5) AS BIGINT) AS r
  FROM xy, fit2
),
dfr AS (
  SELECT rp, r - rp AS dr FROM (
    SELECT r, lag(r, 1) OVER (ORDER BY d) AS rp FROM res
  ) WHERE rp IS NOT NULL
),
agg AS (
  SELECT count(*)::BIGINT AS nd,
         sum(rp::HUGEINT * dr) AS srd,
         sum(rp::HUGEINT * rp) AS srr,
         sum(dr::HUGEINT * dr) AS sdd
  FROM dfr
)
SELECT n AS n_days, b_micro AS slope_micro, a_micro AS intercept_micro,
       cast(floor(1e3 * {_EG_TAU_SQL} + 0.5) AS BIGINT) AS tau_milli,
       cast(floor(1e3 * {_EG_TAU_SQL} + 0.5) AS BIGINT) < -3370 AS reject_05
FROM agg, fit2
"""


# --------------------------------------------------------------------------
# Permutation entropy of the daily series (X7 [EXT])
# --------------------------------------------------------------------------


def q_permutation_entropy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 tie-aware permutation entropy (order m=3) of the daily
    mean-value series: each consecutive triple maps to a code of three
    comparison trits (sign(m1-m0), sign(m2-m0), sign(m2-m1) in base 3 —
    the 27-code alphabet degenerates to the classical 6 patterns when
    values are tie-free), and H = -sum p ln p over the observed codes
    with each ln(count) micro-snapped (libm convention). Output one
    row: n_triples, n_codes, h_micro, h_norm_micro (H / ln 27)."""
    daily = _daily(spark, sf_dir)
    wlag = Window.orderBy("d")
    tri = (
        daily.select(
            F.col("m").alias("m0"),
            F.lead("m", 1).over(wlag).alias("m1"),
            F.lead("m", 2).over(wlag).alias("m2"),
        )
        .filter(F.col("m2").isNotNull())
        .select(
            F.expr(
                "9 * (cast(m1 > m0 as int) * 2 + cast(m1 = m0 as int))"
                " + 3 * (cast(m2 > m0 as int) * 2 + cast(m2 = m0 as int))"
                " + (cast(m2 > m1 as int) * 2 + cast(m2 = m1 as int))"
            ).alias("code")
        )
    )
    counts = tri.groupBy("code").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    lnm = "cast(floor(1e6 * ln(cast({x} as double)) + 0.5) as bigint)"
    agg = counts.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_codes"),
        F.sum(F.expr(f"{_DEC.format(x='c')} * {lnm.format(x='c')}")).alias("sc"),
    )
    h = "(ln(cast(n as double)) - cast(sc as double) / (cast(n as double) * 1e6))"
    return agg.selectExpr(
        "n AS n_triples",
        "n_codes",
        f"cast(floor(1e6 * {h} + 0.5) as bigint) AS h_micro",
        f"cast(floor(1e6 * {h} / ln(27.0) + 0.5) as bigint) AS h_norm_micro",
    )


_ORACLE_PERMENT = f"""
WITH daily AS ({_daily_sql()}),
tri AS (
  SELECT 9 * (CASE WHEN m1 > m0 THEN 2 WHEN m1 = m0 THEN 1 ELSE 0 END)
         + 3 * (CASE WHEN m2 > m0 THEN 2 WHEN m2 = m0 THEN 1 ELSE 0 END)
         + (CASE WHEN m2 > m1 THEN 2 WHEN m2 = m1 THEN 1 ELSE 0 END) AS code
  FROM (
    SELECT m AS m0,
           lead(m, 1) OVER (ORDER BY d) AS m1,
           lead(m, 2) OVER (ORDER BY d) AS m2
    FROM daily
  ) WHERE m2 IS NOT NULL
),
counts AS (SELECT code, count(*)::BIGINT AS c FROM tri GROUP BY 1),
agg AS (
  SELECT sum(c)::BIGINT AS n, count(*)::BIGINT AS n_codes,
         sum(c::HUGEINT
             * cast(floor(1e6 * ln(cast(c AS DOUBLE)) + 0.5) AS BIGINT)) AS sc
  FROM counts
)
SELECT n AS n_triples, n_codes,
       cast(floor(1e6 * (ln(cast(n AS DOUBLE))
            - cast(sc AS DOUBLE) / (cast(n AS DOUBLE) * 1e6)) + 0.5) AS BIGINT)
       AS h_micro,
       cast(floor(1e6 * (ln(cast(n AS DOUBLE))
            - cast(sc AS DOUBLE) / (cast(n AS DOUBLE) * 1e6)) / ln(27.0) + 0.5)
            AS BIGINT) AS h_norm_micro
FROM agg
"""


# --------------------------------------------------------------------------
# Turning-point randomness test (X7 [EXT])
# --------------------------------------------------------------------------

_TP_Z_SQL = """
  (cast(tp AS DOUBLE) - 2.0 * (cast(n AS DOUBLE) - 2.0) / 3.0)
  / sqrt((16.0 * cast(n AS DOUBLE) - 29.0) / 90.0)
"""


def q_turning_point_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 turning-point test of serial randomness on the daily
    mean-value series: T = #{t : (m_t - m_(t-1)) * (m_(t+1) - m_t) < 0}
    (strict peaks/troughs; ties break the turning point, documented),
    E[T] = 2(n-2)/3, Var[T] = (16n-29)/90. Output one row: n,
    n_turning_points, z_milli, reject_05."""
    daily = _daily(spark, sf_dir)
    wlag = Window.orderBy("d")
    tri = daily.select(
        F.lag("m", 1).over(wlag).alias("mp"),
        F.col("m"),
        F.lead("m", 1).over(wlag).alias("mn"),
    ).filter(F.col("mp").isNotNull() & F.col("mn").isNotNull())
    agg = tri.agg(
        F.count(F.lit(1)).cast("bigint").alias("inner_n"),
        F.sum(
            F.expr(
                "cast((m > mp and m > mn) or (m < mp and m < mn) as bigint)"
            )
        )
        .cast("bigint")
        .alias("tp"),
    )
    return agg.selectExpr(
        "inner_n + 2 AS n",
        "tp AS n_turning_points",
        f"cast(floor(1e3 * {_TP_Z_SQL.replace('cast(n AS DOUBLE)', 'cast(inner_n + 2 AS DOUBLE)')} + 0.5) as bigint) AS z_milli",
        f"abs(cast(floor(1e3 * {_TP_Z_SQL.replace('cast(n AS DOUBLE)', 'cast(inner_n + 2 AS DOUBLE)')} + 0.5) as bigint)) > 1960 AS reject_05",
    )


_ORACLE_TP = f"""
WITH daily AS ({_daily_sql()}),
tri AS (
  SELECT mp, m, mn FROM (
    SELECT lag(m, 1) OVER (ORDER BY d) AS mp, m,
           lead(m, 1) OVER (ORDER BY d) AS mn
    FROM daily
  ) WHERE mp IS NOT NULL AND mn IS NOT NULL
),
agg AS (
  SELECT count(*)::BIGINT AS inner_n,
         sum(CASE WHEN (m > mp AND m > mn) OR (m < mp AND m < mn)
                  THEN 1 ELSE 0 END)::BIGINT AS tp
  FROM tri
)
SELECT inner_n + 2 AS n, tp AS n_turning_points,
       cast(floor(1e3 * {_TP_Z_SQL.replace('cast(n AS DOUBLE)', 'cast(inner_n + 2 AS DOUBLE)')} + 0.5) AS BIGINT) AS z_milli,
       abs(cast(floor(1e3 * {_TP_Z_SQL.replace('cast(n AS DOUBLE)', 'cast(inner_n + 2 AS DOUBLE)')} + 0.5) AS BIGINT)) > 1960 AS reject_05
FROM agg
"""


# --------------------------------------------------------------------------
# Cox-Stuart trend test (X7 [EXT])
# --------------------------------------------------------------------------


def q_cox_stuart_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Cox-Stuart trend test on the daily mean-value series:
    pair day t with day t + h (h = n div 2 over the OBSERVED ordered
    spine; the middle observation drops when n is odd), sign-test the
    paired differences (ties drop). The pairing uses the spine's dense
    row index, so calendar gaps don't break it; the index join is a
    spine-sized equi-join. Output one row: n_days, n_pairs_nonzero,
    s_plus, z_milli, reject_05."""
    daily = _daily(spark, sf_dir)
    wrk = Window.orderBy("d")
    idx = daily.select(
        F.row_number().over(wrk).cast("bigint").alias("i"), "m"
    )
    nrow = idx.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    lo = idx.crossJoin(F.broadcast(nrow)).filter(
        F.col("i") <= F.expr("n div 2")
    )
    hi = idx.selectExpr("i AS ih", "m AS mh")
    pairs = lo.join(
        hi, F.expr("ih = i + (n div 2) + (n % 2)"), "inner"
    ).select((F.col("mh") - F.col("m")).alias("dm"), "n")
    agg = pairs.agg(
        F.max("n").alias("n_days"),
        F.sum(F.expr("cast(dm > 0 as bigint)")).cast("bigint").alias("s_plus"),
        F.sum(F.expr("cast(dm <> 0 as bigint)")).cast("bigint").alias("nz"),
    )
    z = (
        "(2.0 * cast(s_plus as double) - cast(nz as double))"
        " / sqrt(cast(nz as double))"
    )
    return agg.selectExpr(
        "n_days",
        "nz AS n_pairs_nonzero",
        "s_plus",
        f"cast(floor(1e3 * {z} + 0.5) as bigint) AS z_milli",
        f"abs(cast(floor(1e3 * {z} + 0.5) as bigint)) > 1960 AS reject_05",
    )


_ORACLE_CS = f"""
WITH daily AS ({_daily_sql()}),
idx AS (
  SELECT row_number() OVER (ORDER BY d)::BIGINT AS i, m FROM daily
),
nrow AS (SELECT count(*)::BIGINT AS n FROM idx),
pairs AS (
  SELECT hi.m - lo.m AS dm, n
  FROM idx lo, idx hi, nrow
  WHERE lo.i <= n // 2 AND hi.i = lo.i + (n // 2) + (n % 2)
),
agg AS (
  SELECT max(n) AS n_days,
         sum(CASE WHEN dm > 0 THEN 1 ELSE 0 END)::BIGINT AS s_plus,
         sum(CASE WHEN dm <> 0 THEN 1 ELSE 0 END)::BIGINT AS nz
  FROM pairs
)
SELECT n_days, nz AS n_pairs_nonzero, s_plus,
       cast(floor(1e3 * (2.0 * cast(s_plus AS DOUBLE) - cast(nz AS DOUBLE))
            / sqrt(cast(nz AS DOUBLE)) + 0.5) AS BIGINT) AS z_milli,
       abs(cast(floor(1e3 * (2.0 * cast(s_plus AS DOUBLE) - cast(nz AS DOUBLE))
            / sqrt(cast(nz AS DOUBLE)) + 0.5) AS BIGINT)) > 1960 AS reject_05
FROM agg
"""


# --------------------------------------------------------------------------
# Bartels rank von-Neumann ratio (X7 [EXT])
# --------------------------------------------------------------------------

_RVN_Z_SQL = """
  ((cast(num AS DOUBLE) / cast(den AS DOUBLE)) - 2.0)
  / sqrt(4.0 * (cast(n AS DOUBLE) - 2.0)
         * (5.0 * cast(n AS DOUBLE) * cast(n AS DOUBLE)
            - 2.0 * cast(n AS DOUBLE) - 9.0)
         / (5.0 * cast(n AS DOUBLE) * (cast(n AS DOUBLE) + 1.0)
            * (cast(n AS DOUBLE) - 1.0) * (cast(n AS DOUBLE) - 1.0)))
"""


def q_bartels_rank_vonneumann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Bartels rank von-Neumann randomness test on the daily
    mean-value series: RVN = sum (r_t - r_(t+1))^2 / sum (r_t - rbar)^2
    over tie-aware midranks. Doubled midranks keep everything integer
    (2*rbar = n+1 exactly), so numerator and denominator are exact; the
    asymptotic z uses Bartels' variance 4(n-2)(5n^2-2n-9) /
    (5n(n+1)(n-1)^2). Output one row: n, rvn_milli, z_milli,
    reject_05."""
    daily = _daily(spark, sf_dir)
    # tie-aware doubled midranks via the value-cell prefix idiom, joined
    # back onto the spine (spine-sized frames throughout)
    cells = daily.groupBy("m").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wv = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    r2m = cells.select(
        "m",
        (2 * (F.sum("c").over(wv) - F.col("c")) + F.col("c") + 1)
        .cast("bigint")
        .alias("r2"),
    )
    wlag = Window.orderBy("d")
    seq = (
        daily.join(r2m, "m")
        .select("d", "r2")
        .select(
            "r2",
            F.lead("r2", 1).over(wlag).alias("r2n"),
        )
    )
    # rbar needs n before the moment sums (2*rbar = n+1): broadcast the
    # spine count back onto the SPINE-SIZED rank frame (bounded; same
    # category as the numerator window), then one aggregate carries both
    # the successive-difference and the deviation moments.
    nrow = seq.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    den = (
        seq.crossJoin(F.broadcast(nrow))
        .agg(
            F.sum(
                F.expr(
                    f"{_DEC.format(x='(r2 - (n + 1))')} * (r2 - (n + 1))"
                )
            ).alias("den4"),
            F.max("n").alias("n"),
            F.sum(
                F.expr(
                    f"if(r2n is null, cast(0 as decimal(38,0)),"
                    f" {_DEC.format(x='(r2 - r2n)')} * (r2 - r2n))"
                )
            ).alias("num4"),
        )
    )
    return den.selectExpr(
        "n",
        "cast(floor(1e3 * cast(num4 as double) / cast(den4 as double) + 0.5)"
        " as bigint) AS rvn_milli",
        f"cast(floor(1e3 * {_RVN_Z_SQL.replace('num', 'num4').replace('den', 'den4')} + 0.5) as bigint) AS z_milli",
        f"abs(cast(floor(1e3 * {_RVN_Z_SQL.replace('num', 'num4').replace('den', 'den4')} + 0.5) as bigint)) > 1960 AS reject_05",
    )


_ORACLE_RVN = f"""
WITH daily AS ({_daily_sql()}),
cells AS (SELECT m, count(*)::BIGINT AS c FROM daily GROUP BY 1),
r2m AS (
  SELECT m,
         (2 * (sum(c) OVER (ORDER BY m) - c) + c + 1)::BIGINT AS r2
  FROM cells
),
seq AS (
  SELECT r2, lead(r2, 1) OVER (ORDER BY d) AS r2n
  FROM (SELECT daily.d, r2m.r2 FROM daily JOIN r2m ON daily.m = r2m.m)
),
nrow AS (SELECT count(*)::BIGINT AS n FROM seq),
den AS (
  SELECT max(n) AS n,
         sum((r2 - (n + 1))::HUGEINT * (r2 - (n + 1))) AS den4,
         sum(CASE WHEN r2n IS NULL THEN 0
                  ELSE (r2 - r2n)::HUGEINT * (r2 - r2n) END) AS num4
  FROM seq, nrow
)
SELECT n,
       cast(floor(1e3 * cast(num4 AS DOUBLE) / cast(den4 AS DOUBLE) + 0.5)
            AS BIGINT) AS rvn_milli,
       cast(floor(1e3 * {_RVN_Z_SQL.replace('num', 'num4').replace('den', 'den4')} + 0.5) AS BIGINT) AS z_milli,
       abs(cast(floor(1e3 * {_RVN_Z_SQL.replace('num', 'num4').replace('den', 'den4')} + 0.5) AS BIGINT)) > 1960 AS reject_05
FROM den
"""


REGISTRY_EXT124: dict[str, QuerySpec] = {
    "kpss_stationarity": QuerySpec(
        q_kpss_stationarity, _ORACLE_KPSS, "X7 [EXT] KPSS stationarity"
    ),
    "engle_granger_coint": QuerySpec(
        q_engle_granger_coint, _ORACLE_EG, "X7 [EXT] Engle-Granger cointegration"
    ),
    "permutation_entropy_daily": QuerySpec(
        q_permutation_entropy_daily, _ORACLE_PERMENT, "X7 [EXT] permutation entropy"
    ),
    "turning_point_test": QuerySpec(
        q_turning_point_test, _ORACLE_TP, "X7 [EXT] turning-point test"
    ),
    "cox_stuart_trend": QuerySpec(
        q_cox_stuart_trend, _ORACLE_CS, "X7 [EXT] Cox-Stuart trend"
    ),
    "bartels_rank_vonneumann": QuerySpec(
        q_bartels_rank_vonneumann, _ORACLE_RVN, "X7 [EXT] Bartels rank von Neumann"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_kpss_stationarity.__doc__ = q_kpss_stationarity.__doc__.format(l=_KPSS_L)  # noqa: E501
q_engle_granger_coint.__doc__ = q_engle_granger_coint.__doc__.format(x=_EG_X, y=_EG_Y)  # noqa: E501
