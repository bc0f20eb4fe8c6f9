"""Wave 115 [EXT]: welfare-weighted inequality, tail-share concentration,
sequential drift detection, and unit-root testing — X6/X7 answers for
corpus economics and telemetry stationarity.

Scale notes (the 100x question, per query):
- atkinson_inequality: doc lengths reduce to (n_chars) VALUE CELLS;
  ln/sqrt per CELL (domain-bounded), per-cell products staged through
  decimal(38,0) (HUGEINT in DuckDB) so the weighted sums are exact at
  any corpus size. No windows at all.
- palma_ratio_lengths: one cumulative walk over the ordered value cells
  (domain-bounded global window, sanctioned category); the partial-cell
  boundary math is exact bigint arithmetic, so top-10%/bottom-40% char
  shares are exact integers until the single final divide.
- page_hinkley_drift: the classical sequential changepoint alarm as
  cumulative windows over the calendar-bounded hourly spine; the
  running mean uses integer division on positive operands (identical in
  both engines), so U_t and the alarm are exact integers.
- dickey_fuller_unit_root: lag-1 regression moments over the hourly
  spine staged through decimal(38,0); beta snaps micro before the
  t-ratio so both engines agree bit-for-bit.

Reference parity: none; [EXT] X6/X7 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import QuerySpec, _t

_HOUR_US = 3_600_000_000
_PH_DELTA_MICRO = 5_000  # drift dead-band
_PH_LAMBDA_MICRO = 500_000  # alarm threshold
_DF_CRIT_MILLI = -2_860  # tau crit, constant-only DF, alpha=.05


# --------------------------------------------------------------------------
# Atkinson inequality of document lengths (X6 [EXT])
# --------------------------------------------------------------------------


def q_atkinson_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6 Atkinson inequality index of document lengths at inequality
    aversion e=1 (1 - geometric/arithmetic mean) and e=0.5 — the
    welfare-economics companion of the shipped Gini/Theil that makes the
    aversion parameter EXPLICIT ("how much corpus volume would we give up
    for equal-length docs?"). Lengths reduce to value cells; ln/sqrt
    snap micro per cell and the weighted sums stage through
    decimal(38,0)/HUGEINT, so both indices are exact integer ratios
    until the single final transcendental (exp, micro-snapped). Output
    one row: n_docs, mean_chars_milli, atkinson_e1_micro,
    atkinson_e05_micro."""
    d = _t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    cells = d.groupBy(F.col("n_chars").alias("x")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    agg = cells.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.expr("sum(cast(cnt as decimal(38,0)) * cast(x as decimal(38,0)))").alias(
            "sx"
        ),
        F.expr(
            "sum(cast(cnt as decimal(38,0))"
            " * cast(cast(floor(1e6 * ln(cast(x as double)) + 0.5) as bigint)"
            "        as decimal(38,0)))"
        ).alias("sln"),
        F.expr(
            "sum(cast(cnt as decimal(38,0))"
            " * cast(cast(floor(1e6 * sqrt(cast(x as double)) + 0.5) as bigint)"
            "        as decimal(38,0)))"
        ).alias("ssq"),
    )
    return agg.select(
        F.col("n").alias("n_docs"),
        F.expr(
            "cast(floor(1e3 * cast(sx as double) / cast(n as double) + 0.5)"
            " as bigint)"
        ).alias("mean_chars_milli"),
        F.expr(
            "cast(floor(1e6 * (1.0"
            " - cast(floor(1e6 * exp((cast(sln as double) / 1e6)"
            "       / cast(n as double)) + 0.5) as double)"
            "   / (1e6 * cast(sx as double) / cast(n as double))) + 0.5) as bigint)"
        ).alias("atkinson_e1_micro"),
        F.expr(
            "cast(floor(1e6 * (1.0"
            " - ((cast(ssq as double) / 1e6 / cast(n as double))"
            "    * (cast(ssq as double) / 1e6 / cast(n as double)))"
            "   / (cast(sx as double) / cast(n as double))) + 0.5) as bigint)"
        ).alias("atkinson_e05_micro"),
    )


_ORACLE_ATKINSON = """
WITH cells AS (
  SELECT n_chars AS x, count(*)::BIGINT AS cnt
  FROM documents WHERE n_chars > 0 GROUP BY n_chars
),
agg AS (
  SELECT sum(cnt)::BIGINT AS n,
         sum(cnt::HUGEINT * x::HUGEINT) AS sx,
         sum(cnt::HUGEINT
             * cast(floor(1e6 * ln(cast(x AS DOUBLE)) + 0.5) AS BIGINT)::HUGEINT)
           AS sln,
         sum(cnt::HUGEINT
             * cast(floor(1e6 * sqrt(cast(x AS DOUBLE)) + 0.5) AS BIGINT)::HUGEINT)
           AS ssq
  FROM cells
)
SELECT n AS n_docs,
       cast(floor(1e3 * cast(sx AS DOUBLE) / cast(n AS DOUBLE) + 0.5)
         AS BIGINT) AS mean_chars_milli,
       cast(floor(1e6 * (1.0
            - cast(floor(1e6 * exp((cast(sln AS DOUBLE) / 1e6)
                  / cast(n AS DOUBLE)) + 0.5) AS DOUBLE)
              / (1e6 * cast(sx AS DOUBLE) / cast(n AS DOUBLE))) + 0.5)
         AS BIGINT) AS atkinson_e1_micro,
       cast(floor(1e6 * (1.0
            - ((cast(ssq AS DOUBLE) / 1e6 / cast(n AS DOUBLE))
               * (cast(ssq AS DOUBLE) / 1e6 / cast(n AS DOUBLE)))
              / (cast(sx AS DOUBLE) / cast(n AS DOUBLE))) + 0.5)
         AS BIGINT) AS atkinson_e05_micro
FROM agg
"""


# --------------------------------------------------------------------------
# Palma ratio of document-length concentration (X7 [EXT])
# --------------------------------------------------------------------------


def q_palma_ratio_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Palma ratio of corpus volume: chars owned by the LONGEST
    10% of documents over chars owned by the SHORTEST 40% — the
    tail-focused concentration measure (Gini is middle-insensitive; the
    Palma reads directly as "the top decile holds Nx the bottom two
    quintiles"). One cumulative walk over the ordered (n_chars) value
    cells (domain-bounded global window, sanctioned); boundary cells
    split by exact bigint rank arithmetic. Output one row: n_docs,
    bottom40_chars, top10_chars, bottom40_share_micro, top10_share_micro,
    palma_milli."""
    d = _t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    cells = d.groupBy(F.col("n_chars").alias("x")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    walked = cells.select(
        "x",
        "cnt",
        F.sum("cnt").over(w).cast("bigint").alias("cum"),
        F.expr("sum(cast(cnt as decimal(38,0)) * cast(x as decimal(38,0)))")
        .over(w)
        .alias("cumchars"),
    )
    tot = walked.agg(
        F.max("cum").cast("bigint").alias("n"),
        F.max("cumchars").alias("schars"),
    )
    # bottom 40%: first kb = (4n) div 10 docs; top 10%: last kt = n - (9n div 10)
    return (
        walked.crossJoin(F.broadcast(tot))
        .select(
            "n",
            "schars",
            F.expr("(4 * n) div 10").alias("kb"),
            F.expr("n - (9 * n) div 10").alias("kt"),
            "x",
            "cnt",
            "cum",
            "cumchars",
        )
        .groupBy("n", "schars", "kb", "kt")
        .agg(
            # full cells below the kb rank + the partial boundary cell
            F.expr(
                "sum(case when cum <= kb then cast(cnt as decimal(38,0))"
                " * cast(x as decimal(38,0))"
                " when cum - cnt < kb then cast(kb - (cum - cnt) as decimal(38,0))"
                " * cast(x as decimal(38,0)) else cast(0 as decimal(38,0)) end)"
            ).alias("b40"),
            F.expr(
                "sum(case when cum - cnt >= n - kt then cast(cnt as decimal(38,0))"
                " * cast(x as decimal(38,0))"
                " when cum > n - kt then cast(cum - (n - kt) as decimal(38,0))"
                " * cast(x as decimal(38,0)) else cast(0 as decimal(38,0)) end)"
            ).alias("t10"),
        )
        .select(
            F.col("n").alias("n_docs"),
            F.col("b40").cast("bigint").alias("bottom40_chars"),
            F.col("t10").cast("bigint").alias("top10_chars"),
            F.expr(
                "cast(floor(1e6 * cast(b40 as double) / cast(schars as double)"
                " + 0.5) as bigint)"
            ).alias("bottom40_share_micro"),
            F.expr(
                "cast(floor(1e6 * cast(t10 as double) / cast(schars as double)"
                " + 0.5) as bigint)"
            ).alias("top10_share_micro"),
            F.expr(
                "case when b40 > 0 then cast(floor(1e3 * cast(t10 as double)"
                " / cast(b40 as double) + 0.5) as bigint)"
                " else cast(-1 as bigint) end"
            ).alias("palma_milli"),
        )
    )


_ORACLE_PALMA = """
WITH cells AS (
  SELECT n_chars AS x, count(*)::BIGINT AS cnt
  FROM documents WHERE n_chars > 0 GROUP BY n_chars
),
walked AS (
  SELECT x, cnt,
         sum(cnt) OVER (ORDER BY x)::BIGINT AS cum,
         sum(cnt::HUGEINT * x::HUGEINT) OVER (ORDER BY x) AS cumchars
  FROM cells
),
tot AS (SELECT max(cum)::BIGINT AS n, max(cumchars) AS schars FROM walked),
agg AS (
  SELECT n, schars, (4 * n) // 10 AS kb, n - (9 * n) // 10 AS kt,
         sum(CASE WHEN cum <= (4 * n) // 10 THEN cnt::HUGEINT * x::HUGEINT
             WHEN cum - cnt < (4 * n) // 10
               THEN ((4 * n) // 10 - (cum - cnt))::HUGEINT * x::HUGEINT
             ELSE 0::HUGEINT END) AS b40,
         sum(CASE WHEN cum - cnt >= n - (n - (9 * n) // 10)
               THEN cnt::HUGEINT * x::HUGEINT
             WHEN cum > n - (n - (9 * n) // 10)
               THEN (cum - (n - (n - (9 * n) // 10)))::HUGEINT * x::HUGEINT
             ELSE 0::HUGEINT END) AS t10
  FROM walked, tot
  GROUP BY n, schars, kb, kt
)
SELECT n AS n_docs,
       b40::BIGINT AS bottom40_chars,
       t10::BIGINT AS top10_chars,
       cast(floor(1e6 * cast(b40 AS DOUBLE) / cast(schars AS DOUBLE) + 0.5)
         AS BIGINT) AS bottom40_share_micro,
       cast(floor(1e6 * cast(t10 AS DOUBLE) / cast(schars AS DOUBLE) + 0.5)
         AS BIGINT) AS top10_share_micro,
       CASE WHEN b40 > 0 THEN cast(floor(1e3 * cast(t10 AS DOUBLE)
            / cast(b40 AS DOUBLE) + 0.5) AS BIGINT)
            ELSE (-1)::BIGINT END AS palma_milli
FROM agg
"""


# --------------------------------------------------------------------------
# Page-Hinkley sequential drift detector (X7 [EXT])
# --------------------------------------------------------------------------


def q_page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Page-Hinkley sequential drift alarm on the hourly mean
    value series — the online companion of the shipped batch drift tests
    (KS/CvM/Pettitt): U_t = sum_i (x_i - rmean_i - delta), alarm when
    U_t - min_prefix(U) exceeds lambda; the canonical "did the metric
    drift upward, and WHEN?" detector streaming monitors run. Hourly
    means are micro ints; the running mean uses positive-operand integer
    division (identical both engines), so U_t and the alarm point are
    exact integers from cumulative windows over the calendar-bounded
    spine. Output one row: n_hours, max_deviation_micro, first_alarm_hr
    (-1 = none), drift_flag."""
    e = _t(spark, sf_dir, "events")
    hourly = (
        e.select(
            F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("hr"), F.col("value")
        )
        .groupBy("hr")
        .agg(
            F.expr(
                "cast(floor(1e6 * cast(sum(cast(value as decimal(18,6))) as double)"
                " / count(1) + 0.5) as bigint)"
            ).alias("x")
        )
    )
    w = Window.orderBy("hr").rowsBetween(Window.unboundedPreceding, 0)
    stepped = hourly.select(
        "hr",
        "x",
        F.sum("x").over(w).cast("bigint").alias("cs"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("t"),
    ).select(
        "hr",
        F.expr(f"x - cs div t - {_PH_DELTA_MICRO}").alias("u"),
    )
    cum = stepped.select(
        "hr",
        F.sum("u").over(w).cast("bigint").alias("uu"),
    )
    dev = cum.select(
        "hr",
        "uu",
        (F.col("uu") - F.min("uu").over(w)).cast("bigint").alias("dev"),
    )
    return dev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.max("dev").cast("bigint").alias("max_deviation_micro"),
        F.coalesce(
            F.min(F.when(F.col("dev") > _PH_LAMBDA_MICRO, F.col("hr"))),
            F.lit(-1),
        )
        .cast("bigint")
        .alias("first_alarm_hr"),
    ).select(
        "n_hours",
        "max_deviation_micro",
        "first_alarm_hr",
        (F.col("max_deviation_micro") > F.lit(_PH_LAMBDA_MICRO)).alias("drift_flag"),
    )


_ORACLE_PH = f"""
WITH hourly AS (
  SELECT epoch_us(ts) // {_HOUR_US} AS hr,
         cast(floor(1e6 * cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE)
              / count(*) + 0.5) AS BIGINT) AS x
  FROM events GROUP BY 1
),
stepped AS (
  SELECT hr,
         x - (sum(x) OVER (ORDER BY hr))::BIGINT
             // (count(*) OVER (ORDER BY hr))::BIGINT - {_PH_DELTA_MICRO} AS u
  FROM hourly
),
cum AS (
  SELECT hr, sum(u) OVER (ORDER BY hr)::BIGINT AS uu FROM stepped
),
dev AS (
  SELECT hr, uu, (uu - min(uu) OVER (ORDER BY hr))::BIGINT AS dev FROM cum
)
SELECT count(*)::BIGINT AS n_hours,
       max(dev)::BIGINT AS max_deviation_micro,
       coalesce(min(CASE WHEN dev > {_PH_LAMBDA_MICRO} THEN hr END), -1)::BIGINT
         AS first_alarm_hr,
       max(dev) > {_PH_LAMBDA_MICRO} AS drift_flag
FROM dev
"""


# --------------------------------------------------------------------------
# Dickey-Fuller unit-root test on the hourly spine (X7 [EXT])
# --------------------------------------------------------------------------


def q_dickey_fuller_unit_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Dickey-Fuller unit-root test (constant, no augmentation)
    on the hourly mean value series: regress dy_t on y_(t-1), tau =
    beta/se(beta), reject the unit root (series IS stationary) when
    tau < {c} — the stationarity gate that tells a forecasting pipeline
    whether to difference first; complements the shipped variance-ratio
    and Durbin-Watson diagnostics. Moments are decimal(38,0)-staged
    exact integers over the lag-joined hourly spine; beta snaps micro
    before the t-ratio. Output one row: n_diffs, beta_micro, tau_milli,
    stationary_flag."""
    e = _t(spark, sf_dir, "events")
    hourly = (
        e.select(
            F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("hr"), F.col("value")
        )
        .groupBy("hr")
        .agg(
            F.expr(
                "cast(floor(1e6 * cast(sum(cast(value as decimal(18,6))) as double)"
                " / count(1) + 0.5) as bigint)"
            ).alias("y")
        )
    )
    w = Window.orderBy("hr")
    lagged = hourly.select(
        "hr",
        "y",
        F.lag("y", 1).over(w).alias("yl"),
    ).filter(F.col("yl").isNotNull())
    mom = lagged.select(
        (F.col("y") - F.col("yl")).alias("dy"), F.col("yl").alias("x")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("sum(cast(x as decimal(38,0)))").alias("sx"),
        F.expr("sum(cast(dy as decimal(38,0)))").alias("sy"),
        F.expr("sum(cast(x as decimal(38,0)) * cast(x as decimal(38,0)))").alias(
            "sxx"
        ),
        F.expr("sum(cast(x as decimal(38,0)) * cast(dy as decimal(38,0)))").alias(
            "sxy"
        ),
        F.expr("sum(cast(dy as decimal(38,0)) * cast(dy as decimal(38,0)))").alias(
            "syy"
        ),
    )
    # centered moments in double (exact ints cast late), beta micro-snapped
    return mom.select(
        F.col("n").alias("n_diffs"),
        F.expr(
            "cast(floor(1e6 * (cast(n as double) * cast(sxy as double)"
            " - cast(sx as double) * cast(sy as double))"
            " / (cast(n as double) * cast(sxx as double)"
            "    - cast(sx as double) * cast(sx as double)) + 0.5) as bigint)"
        ).alias("beta_micro"),
        F.expr(
            """
            cast(floor(1e3 *
              ((cast(n as double) * cast(sxy as double)
                - cast(sx as double) * cast(sy as double))
               / (cast(n as double) * cast(sxx as double)
                  - cast(sx as double) * cast(sx as double)))
              / sqrt(
                 ((cast(syy as double) - cast(sy as double) * cast(sy as double)
                     / cast(n as double))
                  - ((cast(n as double) * cast(sxy as double)
                      - cast(sx as double) * cast(sy as double))
                     / (cast(n as double) * cast(sxx as double)
                        - cast(sx as double) * cast(sx as double)))
                    * (cast(sxy as double) - cast(sx as double)
                       * cast(sy as double) / cast(n as double)))
                 / (cast(n as double) - 2.0)
                 / (cast(sxx as double) - cast(sx as double) * cast(sx as double)
                    / cast(n as double)))
              + 0.5) as bigint)
            """
        ).alias("tau_milli"),
    ).select(
        "n_diffs",
        "beta_micro",
        "tau_milli",
        (F.col("tau_milli") < F.lit(_DF_CRIT_MILLI)).alias("stationary_flag"),
    )


_ORACLE_DF = f"""
WITH hourly AS (
  SELECT epoch_us(ts) // {_HOUR_US} AS hr,
         cast(floor(1e6 * cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE)
              / count(*) + 0.5) AS BIGINT) AS y
  FROM events GROUP BY 1
),
lagged AS (
  SELECT hr, y, lag(y, 1) OVER (ORDER BY hr) AS yl FROM hourly
),
mom AS (
  SELECT count(*)::BIGINT AS n,
         sum(yl::HUGEINT) AS sx,
         sum((y - yl)::HUGEINT) AS sy,
         sum(yl::HUGEINT * yl::HUGEINT) AS sxx,
         sum(yl::HUGEINT * (y - yl)::HUGEINT) AS sxy,
         sum((y - yl)::HUGEINT * (y - yl)::HUGEINT) AS syy
  FROM lagged WHERE yl IS NOT NULL
)
SELECT n AS n_diffs,
       cast(floor(1e6 * (cast(n AS DOUBLE) * cast(sxy AS DOUBLE)
            - cast(sx AS DOUBLE) * cast(sy AS DOUBLE))
            / (cast(n AS DOUBLE) * cast(sxx AS DOUBLE)
               - cast(sx AS DOUBLE) * cast(sx AS DOUBLE)) + 0.5)
         AS BIGINT) AS beta_micro,
       cast(floor(1e3 *
         ((cast(n AS DOUBLE) * cast(sxy AS DOUBLE)
           - cast(sx AS DOUBLE) * cast(sy AS DOUBLE))
          / (cast(n AS DOUBLE) * cast(sxx AS DOUBLE)
             - cast(sx AS DOUBLE) * cast(sx AS DOUBLE)))
         / sqrt(
            ((cast(syy AS DOUBLE) - cast(sy AS DOUBLE) * cast(sy AS DOUBLE)
                / cast(n AS DOUBLE))
             - ((cast(n AS DOUBLE) * cast(sxy AS DOUBLE)
                 - cast(sx AS DOUBLE) * cast(sy AS DOUBLE))
                / (cast(n AS DOUBLE) * cast(sxx AS DOUBLE)
                   - cast(sx AS DOUBLE) * cast(sx AS DOUBLE)))
               * (cast(sxy AS DOUBLE) - cast(sx AS DOUBLE)
                  * cast(sy AS DOUBLE) / cast(n AS DOUBLE)))
            / (cast(n AS DOUBLE) - 2.0)
            / (cast(sxx AS DOUBLE) - cast(sx AS DOUBLE) * cast(sx AS DOUBLE)
               / cast(n AS DOUBLE)))
         + 0.5) AS BIGINT) AS tau_milli,
       cast(floor(1e3 *
         ((cast(n AS DOUBLE) * cast(sxy AS DOUBLE)
           - cast(sx AS DOUBLE) * cast(sy AS DOUBLE))
          / (cast(n AS DOUBLE) * cast(sxx AS DOUBLE)
             - cast(sx AS DOUBLE) * cast(sx AS DOUBLE)))
         / sqrt(
            ((cast(syy AS DOUBLE) - cast(sy AS DOUBLE) * cast(sy AS DOUBLE)
                / cast(n AS DOUBLE))
             - ((cast(n AS DOUBLE) * cast(sxy AS DOUBLE)
                 - cast(sx AS DOUBLE) * cast(sy AS DOUBLE))
                / (cast(n AS DOUBLE) * cast(sxx AS DOUBLE)
                   - cast(sx AS DOUBLE) * cast(sx AS DOUBLE)))
               * (cast(sxy AS DOUBLE) - cast(sx AS DOUBLE)
                  * cast(sy AS DOUBLE) / cast(n AS DOUBLE)))
            / (cast(n AS DOUBLE) - 2.0)
            / (cast(sxx AS DOUBLE) - cast(sx AS DOUBLE) * cast(sx AS DOUBLE)
               / cast(n AS DOUBLE)))
         + 0.5) AS BIGINT) < {_DF_CRIT_MILLI} AS stationary_flag
FROM mom
"""


REGISTRY_EXT115: dict[str, QuerySpec] = {
    "atkinson_inequality": QuerySpec(
        q_atkinson_inequality, _ORACLE_ATKINSON, "X6 [EXT] Atkinson index"
    ),
    "palma_ratio_lengths": QuerySpec(
        q_palma_ratio_lengths, _ORACLE_PALMA, "X7 [EXT] Palma tail-share ratio"
    ),
    "page_hinkley_drift": QuerySpec(
        q_page_hinkley_drift, _ORACLE_PH, "X7 [EXT] Page-Hinkley drift alarm"
    ),
    "dickey_fuller_unit_root": QuerySpec(
        q_dickey_fuller_unit_root, _ORACLE_DF, "X7 [EXT] Dickey-Fuller test"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_dickey_fuller_unit_root.__doc__ = q_dickey_fuller_unit_root.__doc__.format(c=_DF_CRIT_MILLI / 1e3)  # noqa: E501
