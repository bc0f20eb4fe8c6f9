"""Operator registry, wave 89: experiment-design tier — group-sequential
monitoring, power/MDE planning, and overdispersion screening.

Scale stances:
- Group-sequential (O'Brien-Fleming): the experiment stream reduces to
  per-day arm aggregates (calendar-bounded); cumulative counts come from
  day-level windows over that bounded frame (partition = the calendar,
  never the corpus); the OBF boundary is closed-form per interim look.
- Power/MDE: one variance aggregate over the facts, then a literal
  effect-size spine (O(grid) rows) carrying the closed-form two-sample
  power arithmetic — planning math costs one scan at any corpus size.
- Overdispersion: per-(type, user) counts -> variance/mean ratio and the
  dispersion z-test, two grouped aggregates.

Every statistic lands on micro-ints from exact integer inputs through
fixed expression text; the only transcendentals (sqrt, exp) take
identical correctly-rounded doubles in both engines (exp feeds a
micro-snap, the wave-82 determinism rule).

Reference parity: none; [EXT] X7 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import QuerySpec, _t

# --------------------------------------------------------------------------
# Group-sequential monitoring with O'Brien-Fleming boundaries (X7 [EXT])
# --------------------------------------------------------------------------

_GS_Z_FINAL = "2.0398"  # z for OBF overall alpha ~0.05 two-sided (K=5-ish)


def q_group_sequential_obf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 group-sequential experiment monitor: arms are the
    deterministic md5 halves of user_id; each epoch DAY is an interim
    look at the cumulative purchase-rate difference, with the
    O'Brien-Fleming boundary z_k = {z} / sqrt(t_k) (t_k = information
    fraction = cumulative N over final N) — the monitoring rule that
    spends almost no alpha early, so peeking daily stays valid. Per
    look: cumulative counts (windows over the calendar-bounded daily
    frame), the z statistic, the boundary, and the crossing flag. Day
    index is unix_micros integer arithmetic. Caveat the monitor's
    users must know: the unit here is the EVENT; events cluster within
    users, so the z is anti-conservative under within-user correlation
    — production monitors pair this with user-level CUPED
    (cuped_adjustment) or a cluster-robust variance."""
    e = _t(spark, sf_dir, "events").selectExpr(
        "unix_micros(ts) div 86400000000 as day",
        "CASE WHEN substring(md5(cast(user_id as string)), 1, 1) < '8'"
        " THEN 1 ELSE 0 END as arm",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END as y",
    )
    daily = e.groupBy("day").agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("k1"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("bigint").alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("k0"),
    )
    w = Window.partitionBy(F.lit(1)).orderBy("day")
    cum = daily.select(
        "day",
        F.sum("n1").over(w).alias("cn1"),
        F.sum("k1").over(w).alias("ck1"),
        F.sum("n0").over(w).alias("cn0"),
        F.sum("k0").over(w).alias("ck0"),
    )
    tot = daily.agg(
        F.sum(F.col("n1") + F.col("n0")).cast("bigint").alias("n_final")
    )
    z = _GS_Z_FINAL
    return (
        cum.crossJoin(F.broadcast(tot))
        .selectExpr(
            "day",
            "cn1",
            "cn0",
            "cast(cn1 + cn0 as double) / cast(n_final as double) as t_k",
            "cast(ck1 as double) / cast(cn1 as double) as p1",
            "cast(ck0 as double) / cast(cn0 as double) as p0",
            "cast(ck1 + ck0 as double) / cast(cn1 + cn0 as double) as pp",
        )
        .selectExpr(
            "day",
            "cn1",
            "cn0",
            "cast(floor(1e6 * t_k + 0.5) as bigint) as info_frac_micro",
            "cast(floor(1e6 * (p1 - p0) / sqrt(pp * (1.0 - pp)"
            " * (1.0 / cast(cn1 as double) + 1.0 / cast(cn0 as double)))"
            " + 0.5) as bigint) as z_micro",
            f"cast(floor(1e6 * {z} / sqrt(t_k) + 0.5) as bigint)"
            " as boundary_micro",
            f"abs((p1 - p0) / sqrt(pp * (1.0 - pp)"
            " * (1.0 / cast(cn1 as double) + 1.0 / cast(cn0 as double))))"
            f" > {z} / sqrt(t_k) as crossed",
        )
        .orderBy("day")
    )


_ORACLE_GS = f"""
WITH e AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         CASE WHEN substr(md5(cast(user_id AS varchar)), 1, 1) < '8'
              THEN 1 ELSE 0 END AS arm,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
daily AS (
  SELECT day,
         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(CASE WHEN arm = 1 THEN y ELSE 0 END)::BIGINT AS k1,
         sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
         sum(CASE WHEN arm = 0 THEN y ELSE 0 END)::BIGINT AS k0
  FROM e GROUP BY 1
),
cum AS (
  SELECT day,
         sum(n1) OVER w AS cn1, sum(k1) OVER w AS ck1,
         sum(n0) OVER w AS cn0, sum(k0) OVER w AS ck0
  FROM daily WINDOW w AS (ORDER BY day)
),
tot AS (SELECT sum(n1 + n0)::BIGINT AS n_final FROM daily),
d AS (
  SELECT day, cn1, cn0,
         cast(cn1 + cn0 AS double) / cast(n_final AS double) AS t_k,
         cast(ck1 AS double) / cast(cn1 AS double) AS p1,
         cast(ck0 AS double) / cast(cn0 AS double) AS p0,
         cast(ck1 + ck0 AS double) / cast(cn1 + cn0 AS double) AS pp
  FROM cum CROSS JOIN tot
)
SELECT day, cn1::BIGINT AS cn1, cn0::BIGINT AS cn0,
       cast(floor(1e6 * t_k + 0.5) AS bigint) AS info_frac_micro,
       cast(floor(1e6 * (p1 - p0) / sqrt(pp * (1.0 - pp)
                  * (1.0 / cast(cn1 AS double) + 1.0 / cast(cn0 AS double)))
                  + 0.5) AS bigint) AS z_micro,
       cast(floor(1e6 * {_GS_Z_FINAL} / sqrt(t_k) + 0.5) AS bigint)
         AS boundary_micro,
       abs((p1 - p0) / sqrt(pp * (1.0 - pp)
           * (1.0 / cast(cn1 AS double) + 1.0 / cast(cn0 AS double))))
         > {_GS_Z_FINAL} / sqrt(t_k) AS crossed
FROM d ORDER BY day
"""


# --------------------------------------------------------------------------
# Power / MDE planning curve (X7 [EXT])
# --------------------------------------------------------------------------

_MDE_GRID = [1, 2, 5, 10, 20, 50]  # effect sizes, percent of the observed mean
_Z_ALPHA = "1.959963984540054"  # two-sided 5%
_Z_BETA = "0.8416212335729143"  # 80% power


def q_power_mde_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 experiment planning curve: from the observed per-event
    value variance (one aggregate; milli-grid exact sums), the
    required per-arm sample size n = 2 * (z_a + z_b)^2 * sigma^2 /
    delta^2 for each candidate effect size on a literal percent grid
    {g} of the observed mean — the 80%-power/5%-alpha sizing table
    every experiment review starts from, plus how many days of current
    traffic that n represents. Corpus work is one scan; the grid is a
    literal spine."""
    e = _t(spark, sf_dir, "events").selectExpr(
        "cast(floor(1e3 * value + 0.5) as bigint) as vk",
        "unix_micros(ts) div 86400000000 as day",
    )
    stats = e.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("vk").cast("decimal(19,0)")).alias("s1"),
        F.sum((F.col("vk") * F.col("vk")).cast("decimal(19,0)")).alias("s2"),
        F.countDistinct("day").cast("bigint").alias("n_days"),
    )
    grid = ", ".join(str(g) for g in _MDE_GRID)
    za, zb = _Z_ALPHA, _Z_BETA
    return (
        stats.selectExpr(
            "n",
            "n_days",
            "cast(s1 as double) / cast(n as double) as mu",
            "cast(s2 as double) / cast(n as double)"
            " - (cast(s1 as double) / cast(n as double))"
            " * (cast(s1 as double) / cast(n as double)) as var_",
            f"explode(array({grid})) as effect_pct",
        )
        .selectExpr(
            "effect_pct",
            "n",
            "n_days",
            "mu",
            "var_",
            "mu * cast(effect_pct as double) / 100.0 as delta",
        )
        .selectExpr(
            "cast(effect_pct as bigint) as effect_pct",
            "cast(floor(mu + 0.5) as bigint) as mean_milli",
            f"cast(ceil(2.0 * ({za} + {zb}) * ({za} + {zb}) * var_"
            " / (delta * delta)) as bigint) as n_per_arm",
            f"cast(floor(1e3 * (2.0 * ceil(2.0 * ({za} + {zb}) * ({za} + {zb})"
            " * var_ / (delta * delta)))"
            " / (cast(n as double) / cast(n_days as double)) + 0.5)"
            " as bigint) as days_needed_milli",
        )
        .orderBy("effect_pct")
    )


_ORACLE_MDE = f"""
WITH e AS (
  SELECT cast(floor(1e3 * value + 0.5) AS bigint) AS vk,
         epoch_us(ts) // 86400000000 AS day
  FROM events
),
stats AS (
  SELECT count(*)::BIGINT AS n,
         sum(vk::HUGEINT) AS s1,
         sum(vk::HUGEINT * vk) AS s2,
         count(DISTINCT day)::BIGINT AS n_days
  FROM e
),
base AS (
  SELECT n, n_days,
         cast(s1 AS double) / cast(n AS double) AS mu,
         cast(s2 AS double) / cast(n AS double)
           - (cast(s1 AS double) / cast(n AS double))
           * (cast(s1 AS double) / cast(n AS double)) AS var_
  FROM stats
),
g AS (
  SELECT b.*, cast(x.g AS bigint) AS effect_pct,
         b.mu * cast(x.g AS double) / 100.0 AS delta
  FROM base b, (SELECT unnest([{", ".join(str(g) for g in _MDE_GRID)}]) AS g) x
)
SELECT effect_pct,
       cast(floor(mu + 0.5) AS bigint) AS mean_milli,
       cast(ceil(2.0 * ({_Z_ALPHA} + {_Z_BETA}) * ({_Z_ALPHA} + {_Z_BETA})
                 * var_ / (delta * delta)) AS bigint) AS n_per_arm,
       cast(floor(1e3 * (2.0 * ceil(2.0 * ({_Z_ALPHA} + {_Z_BETA})
                 * ({_Z_ALPHA} + {_Z_BETA}) * var_ / (delta * delta)))
                  / (cast(n AS double) / cast(n_days AS double)) + 0.5)
            AS bigint) AS days_needed_milli
FROM g ORDER BY effect_pct
"""


# --------------------------------------------------------------------------
# Overdispersion screen (X7 [EXT])
# --------------------------------------------------------------------------


def q_negative_binomial_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 overdispersion screen for per-user event counts: if
    user activity were Poisson, variance/mean = 1; real traffic is
    clumped (negative-binomial-shaped), and modeling it as Poisson
    understates every experiment's variance. Per event_type: the
    dispersion index, its one-sided z under the Poisson null
    (z = (D - 1) * sqrt((n-1)/2), the classical dispersion test), and
    the NB method-of-moments size r = mu^2 / (var - mu) where
    overdispersed. Two grouped aggregates; exact integer count sums
    through decimal."""
    u = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    m = u.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.col("c").cast("decimal(19,0)")).alias("s1"),
        F.sum((F.col("c") * F.col("c")).cast("decimal(19,0)")).alias("s2"),
    )
    return (
        m.selectExpr(
            "event_type",
            "n_users",
            "cast(s1 as double) / cast(n_users as double) as mu",
            "cast(s2 as double) / cast(n_users as double)"
            " - (cast(s1 as double) / cast(n_users as double))"
            " * (cast(s1 as double) / cast(n_users as double)) as var_",
        )
        .selectExpr(
            "event_type",
            "n_users",
            "cast(floor(1e6 * mu + 0.5) as bigint) as mean_micro",
            "cast(floor(1e6 * var_ / mu + 0.5) as bigint) as dispersion_micro",
            "cast(floor(1e6 * (var_ / mu - 1.0)"
            " * sqrt(cast(n_users - 1 as double) / 2.0) + 0.5) as bigint)"
            " as z_micro",
            "CASE WHEN var_ > mu THEN"
            " cast(floor(1e6 * mu * mu / (var_ - mu) + 0.5) as bigint)"
            " ELSE cast(-1 as bigint) END as nb_size_micro",
        )
        .orderBy("event_type")
    )


_ORACLE_OVERDISP = """
WITH u AS (
  SELECT event_type, user_id, count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type, count(*)::BIGINT AS n_users,
         sum(c::HUGEINT) AS s1, sum(c::HUGEINT * c) AS s2
  FROM u GROUP BY 1
),
d AS (
  SELECT event_type, n_users,
         cast(s1 AS double) / cast(n_users AS double) AS mu,
         cast(s2 AS double) / cast(n_users AS double)
           - (cast(s1 AS double) / cast(n_users AS double))
           * (cast(s1 AS double) / cast(n_users AS double)) AS var_
  FROM m
)
SELECT event_type, n_users,
       cast(floor(1e6 * mu + 0.5) AS bigint) AS mean_micro,
       cast(floor(1e6 * var_ / mu + 0.5) AS bigint) AS dispersion_micro,
       cast(floor(1e6 * (var_ / mu - 1.0)
                  * sqrt(cast(n_users - 1 AS double) / 2.0) + 0.5) AS bigint)
         AS z_micro,
       CASE WHEN var_ > mu THEN
         cast(floor(1e6 * mu * mu / (var_ - mu) + 0.5) AS bigint)
       ELSE -1 END AS nb_size_micro
FROM d ORDER BY event_type
"""


REGISTRY_EXT88: dict[str, QuerySpec] = {
    "group_sequential_obf": QuerySpec(
        q_group_sequential_obf, _ORACLE_GS, "X7 [EXT] OBF sequential monitor"
    ),
    "power_mde_curve": QuerySpec(
        q_power_mde_curve, _ORACLE_MDE, "X7 [EXT] power/MDE planning"
    ),
    "negative_binomial_overdispersion": QuerySpec(
        q_negative_binomial_overdispersion,
        _ORACLE_OVERDISP,
        "X7 [EXT] dispersion screen",
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_group_sequential_obf.__doc__ = q_group_sequential_obf.__doc__.format(z=_GS_Z_FINAL)  # noqa: E501
q_power_mde_curve.__doc__ = q_power_mde_curve.__doc__.format(g=_MDE_GRID)  # noqa: E501
