"""Wave 121 [EXT]: peaks-over-threshold tail analysis (GPD mean-excess
fit) and the Cucconi joint location-scale two-sample test.

Scale notes (the 100x question, per query):
- pot_mean_excess: values reduce map-side to CENTI VALUE CELLS; the
  exact P95 threshold is the order statistic at rank ceil(0.95*n) read
  off the cell CDF (one prefix walk over the domain-bounded cell frame,
  sanctioned global-window category), and the exceedance moments are
  exact integer sums over the cells above it — the GPD
  method-of-moments fit is two double divisions at the very end.
- cucconi_test: both samples reduce to the same pooled cells; U and V
  need only the B-sample sums of squared (doubled) midranks and squared
  contrary ranks — exact decimal(38,0)/HUGEINT integers from the same
  single prefix walk. The null moments are closed-form polynomials in
  (n, m); a numpy reference implementation in tests/test_ext121.py
  pins the formula, not just cross-engine parity.

Reference parity: none; [EXT] X7 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import QuerySpec, _t

_POT_P = 0.95  # exceedance threshold quantile (order statistic)
_CU_A, _CU_B = "click", "purchase"


# --------------------------------------------------------------------------
# Peaks-over-threshold mean excess + GPD moments fit (X7 [EXT])
# --------------------------------------------------------------------------


def q_pot_mean_excess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 peaks-over-threshold tail fit: exceedances over the exact
    P{p} order statistic of event value, with the Generalized Pareto
    method-of-moments estimates xi = (1 - mean^2/var)/2 and sigma =
    mean*(1 + mean^2/var)/2 — the block-free companion of
    gumbel_daily_maxima (wave 118): POT uses every extreme observation,
    not one per day. The threshold is an ORDER STATISTIC (rank
    ceil({p}*n) off the centi-cell CDF — the engine-stable choice, see
    the repo's quantile convention), and the excess moments are exact
    integer cell sums. Output one row: n, u_centi, n_exceed,
    mean_excess_micro, xi_micro, sigma_micro."""
    e = _t(spark, sf_dir, "events")
    cells = (
        e.select(
            F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
            .cast("bigint")
            .alias("vc")
        )
        .groupBy("vc")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    w = Window.orderBy("vc").rowsBetween(Window.unboundedPreceding, 0)
    pref = cells.select(
        "vc", "c", F.sum("c").over(w).cast("bigint").alias("cum")
    )
    tot = pref.agg(F.max("cum").cast("bigint").alias("n"))
    # threshold = value of the cell where the CDF first reaches rank
    # ceil(p*n): min vc with cum >= rank (exact order statistic)
    u = (
        pref.crossJoin(F.broadcast(tot))
        .filter(F.expr(f"cum >= cast(ceil({_POT_P!r} * n) as bigint)"))
        .agg(F.min("vc").cast("bigint").alias("u"), F.max("n").alias("n"))
    )
    dec = "cast({x} as decimal(38,0))"
    mom = (
        pref.crossJoin(F.broadcast(u))
        .filter(F.col("vc") > F.col("u"))
        .agg(
            F.max("n").alias("n"),
            F.max("u").alias("u"),
            F.sum("c").cast("bigint").alias("k"),
            F.sum(F.expr(f"{dec.format(x='c')} * ({dec.format(x='vc')} - u)")).alias(
                "s1"
            ),
            F.sum(
                F.expr(
                    f"{dec.format(x='c')} * ({dec.format(x='vc')} - u)"
                    f" * ({dec.format(x='vc')} - u)"
                )
            ).alias("s2"),
        )
    )
    # moments in centi units -> value units (/100); mean^2/var is unitless
    return mom.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("u").cast("bigint").alias("u_centi"),
        F.col("k").alias("n_exceed"),
        F.expr(
            "cast(floor(1e6 * cast(s1 as double) / cast(k as double) / 100.0"
            " + 0.5) as bigint)"
        ).alias("mean_excess_micro"),
        F.expr(
            "cast(floor(1e6 * 0.5 * (1.0 -"
            "  pow(cast(s1 as double) / cast(k as double), 2.0)"
            "  / (cast(s2 as double) / cast(k as double)"
            "     - pow(cast(s1 as double) / cast(k as double), 2.0)))"
            " + 0.5) as bigint)"
        ).alias("xi_micro"),
        F.expr(
            "cast(floor(1e6 * 0.5 * (cast(s1 as double) / cast(k as double) / 100.0)"
            " * (1.0 + pow(cast(s1 as double) / cast(k as double), 2.0)"
            "     / (cast(s2 as double) / cast(k as double)"
            "        - pow(cast(s1 as double) / cast(k as double), 2.0)))"
            " + 0.5) as bigint)"
        ).alias("sigma_micro"),
    )


_ORACLE_POT = f"""
WITH cells AS (
  SELECT cast(floor(value * 100.0 + 0.5) AS BIGINT) AS vc,
         count(*)::BIGINT AS c
  FROM events GROUP BY 1
),
pref AS (
  SELECT vc, c, sum(c) OVER (ORDER BY vc)::BIGINT AS cum FROM cells
),
tot AS (SELECT max(cum)::BIGINT AS n FROM pref),
u AS (
  SELECT min(vc)::BIGINT AS u, max(n)::BIGINT AS n
  FROM pref, tot
  WHERE cum >= cast(ceil({_POT_P!r} * n) AS BIGINT)
),
mom AS (
  SELECT max(n) AS n, max(u) AS u, sum(c)::BIGINT AS k,
         sum(c::HUGEINT * (vc::HUGEINT - u)) AS s1,
         sum(c::HUGEINT * (vc::HUGEINT - u) * (vc::HUGEINT - u)) AS s2
  FROM pref, u
  WHERE vc > u
)
SELECT n::BIGINT AS n, u::BIGINT AS u_centi, k AS n_exceed,
       cast(floor(1e6 * cast(s1 AS DOUBLE) / cast(k AS DOUBLE) / 100.0
            + 0.5) AS BIGINT) AS mean_excess_micro,
       cast(floor(1e6 * 0.5 * (1.0 -
            pow(cast(s1 AS DOUBLE) / cast(k AS DOUBLE), 2.0)
            / (cast(s2 AS DOUBLE) / cast(k AS DOUBLE)
               - pow(cast(s1 AS DOUBLE) / cast(k AS DOUBLE), 2.0)))
            + 0.5) AS BIGINT) AS xi_micro,
       cast(floor(1e6 * 0.5 * (cast(s1 AS DOUBLE) / cast(k AS DOUBLE) / 100.0)
            * (1.0 + pow(cast(s1 AS DOUBLE) / cast(k AS DOUBLE), 2.0)
               / (cast(s2 AS DOUBLE) / cast(k AS DOUBLE)
                  - pow(cast(s1 AS DOUBLE) / cast(k AS DOUBLE), 2.0)))
            + 0.5) AS BIGINT) AS sigma_micro
FROM mom
"""


# --------------------------------------------------------------------------
# Cucconi joint location-scale test (X7 [EXT])
# --------------------------------------------------------------------------


def q_cucconi_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Cucconi test between '{a}' and '{b}' event values — the
    JOINT location-scale two-sample test (squared ranks U plus squared
    contrary ranks V, combined with their exact negative correlation):
    one statistic that reacts to a shift OR a spread change, where
    Mann-Whitney sees only location and the rank family one moment at a
    time. With doubled tie midranks R2 from one pooled-cell prefix walk,
    SB2 = sum_B R2^2 and SBC2 = sum_B (2N+2-R2)^2 are exact
    decimal/HUGEINT integers; U = (6*SB2/4 - m(N+1)(2N+1))/sqrt(V0),
    V likewise from SBC2, V0 = mn(N+1)(2N+1)(8N+11)/180, rho =
    2(N^2-4)/((2N+1)(8N+11)) - 1, and C = (U^2+V^2-2rho*U*V)/(2(1-rho^2))
    with H0 rejection at C > ln(1/alpha). A numpy reference in the tests
    pins the formula. Output one row: n_a, n_b, u_milli, v_milli,
    c_milli, reject_05."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type").isin(_CU_A, _CU_B))
    cells = (
        e.select(
            F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
            .cast("bigint")
            .alias("vc"),
            F.when(F.col("event_type") == _CU_A, F.lit(1))
            .otherwise(F.lit(0))
            .alias("isa"),
        )
        .groupBy("vc")
        .agg(
            F.sum("isa").cast("bigint").alias("ca"),
            F.sum(F.lit(1) - F.col("isa")).cast("bigint").alias("cb"),
        )
    )
    w = Window.orderBy("vc").rowsBetween(Window.unboundedPreceding, 0)
    pref = cells.select(
        "ca",
        "cb",
        (F.sum("ca").over(w) - F.col("ca")).cast("bigint").alias("befa"),
        (F.sum("cb").over(w) - F.col("cb")).cast("bigint").alias("befb"),
    )
    dec = "cast({x} as decimal(38,0))"
    r2 = "(2 * (befa + befb) + (ca + cb) + 1)"
    # contrary (doubled) rank needs the pooled TOTAL N = na + nb, so the
    # two totals broadcast back onto the cell walk before the sums
    sums = pref.crossJoin(
        F.broadcast(
            pref.agg(
                F.max(F.expr("befa + ca")).cast("bigint").alias("na"),
                F.max(F.expr("befb + cb")).cast("bigint").alias("nb"),
            )
        )
    ).agg(
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.sum(
            F.expr(f"{dec.format(x='cb')} * {dec.format(x=r2)} * {dec.format(x=r2)}")
        ).alias("sb2"),
        F.sum(
            F.expr(
                f"{dec.format(x='cb')}"
                f" * (2 * {dec.format(x='na + nb')} + 2 - {dec.format(x=r2)})"
                f" * (2 * {dec.format(x='na + nb')} + 2 - {dec.format(x=r2)})"
            )
        ).alias("sbc2"),
    )
    # U from doubled ranks: sum_B R^2 = sb2/4; contrary (N+1-R)^2 = sbc2/4
    stat = sums.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.expr(
            "cast(floor(1e3 * (6.0 * cast(sb2 as double) / 4.0"
            " - cast(nb as double) * (cast(na + nb as double) + 1.0)"
            "   * (2.0 * cast(na + nb as double) + 1.0))"
            " / sqrt(cast(na as double) * cast(nb as double)"
            "   * (cast(na + nb as double) + 1.0)"
            "   * (2.0 * cast(na + nb as double) + 1.0)"
            "   * (8.0 * cast(na + nb as double) + 11.0) / 5.0)"
            " + 0.5) as bigint)"
        ).alias("u_milli"),
        F.expr(
            "cast(floor(1e3 * (6.0 * cast(sbc2 as double) / 4.0"
            " - cast(nb as double) * (cast(na + nb as double) + 1.0)"
            "   * (2.0 * cast(na + nb as double) + 1.0))"
            " / sqrt(cast(na as double) * cast(nb as double)"
            "   * (cast(na + nb as double) + 1.0)"
            "   * (2.0 * cast(na + nb as double) + 1.0)"
            "   * (8.0 * cast(na + nb as double) + 11.0) / 5.0)"
            " + 0.5) as bigint)"
        ).alias("v_milli"),
    )
    return stat.select(
        "n_a",
        "n_b",
        "u_milli",
        "v_milli",
        F.expr(
            "cast(floor(1e3 * ((cast(u_milli as double) / 1e3)"
            " * (cast(u_milli as double) / 1e3)"
            " + (cast(v_milli as double) / 1e3) * (cast(v_milli as double) / 1e3)"
            " - 2.0 * (2.0 * (pow(cast(n_a + n_b as double), 2.0) - 4.0)"
            "   / ((2.0 * cast(n_a + n_b as double) + 1.0)"
            "      * (8.0 * cast(n_a + n_b as double) + 11.0)) - 1.0)"
            "   * (cast(u_milli as double) / 1e3) * (cast(v_milli as double) / 1e3))"
            " / (2.0 * (1.0 - pow(2.0 * (pow(cast(n_a + n_b as double), 2.0) - 4.0)"
            "   / ((2.0 * cast(n_a + n_b as double) + 1.0)"
            "      * (8.0 * cast(n_a + n_b as double) + 11.0)) - 1.0, 2.0)))"
            " + 0.5) as bigint)"
        ).alias("c_milli"),
    ).select(
        "n_a",
        "n_b",
        "u_milli",
        "v_milli",
        "c_milli",
        # C > ln(1/0.05) = 2.9957... at alpha = 0.05
        (F.col("c_milli") > F.lit(2996)).alias("reject_05"),
    )


_ORACLE_CUCCONI = f"""
WITH cells AS (
  SELECT cast(floor(value * 100.0 + 0.5) AS BIGINT) AS vc,
         sum(CASE WHEN event_type = '{_CU_A}' THEN 1 ELSE 0 END)::BIGINT AS ca,
         sum(CASE WHEN event_type = '{_CU_B}' THEN 1 ELSE 0 END)::BIGINT AS cb
  FROM events WHERE event_type IN ('{_CU_A}', '{_CU_B}')
  GROUP BY 1
),
pref AS (
  SELECT ca, cb,
         (sum(ca) OVER (ORDER BY vc) - ca)::BIGINT AS befa,
         (sum(cb) OVER (ORDER BY vc) - cb)::BIGINT AS befb
  FROM cells
),
tot AS (SELECT max(befa + ca)::BIGINT AS na, max(befb + cb)::BIGINT AS nb
        FROM pref),
sums AS (
  SELECT max(na) AS na, max(nb) AS nb,
         sum(cb::HUGEINT
             * (2 * (befa + befb) + (ca + cb) + 1)::HUGEINT
             * (2 * (befa + befb) + (ca + cb) + 1)::HUGEINT) AS sb2,
         sum(cb::HUGEINT
             * (2 * (na + nb) + 2 - (2 * (befa + befb) + (ca + cb) + 1))::HUGEINT
             * (2 * (na + nb) + 2 - (2 * (befa + befb) + (ca + cb) + 1))::HUGEINT)
           AS sbc2
  FROM pref, tot
),
uv AS (
  SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
         cast(floor(1e3 * (6.0 * cast(sb2 AS DOUBLE) / 4.0
              - cast(nb AS DOUBLE) * (cast(na + nb AS DOUBLE) + 1.0)
                * (2.0 * cast(na + nb AS DOUBLE) + 1.0))
              / sqrt(cast(na AS DOUBLE) * cast(nb AS DOUBLE)
                * (cast(na + nb AS DOUBLE) + 1.0)
                * (2.0 * cast(na + nb AS DOUBLE) + 1.0)
                * (8.0 * cast(na + nb AS DOUBLE) + 11.0) / 5.0)
              + 0.5) AS BIGINT) AS u_milli,
         cast(floor(1e3 * (6.0 * cast(sbc2 AS DOUBLE) / 4.0
              - cast(nb AS DOUBLE) * (cast(na + nb AS DOUBLE) + 1.0)
                * (2.0 * cast(na + nb AS DOUBLE) + 1.0))
              / sqrt(cast(na AS DOUBLE) * cast(nb AS DOUBLE)
                * (cast(na + nb AS DOUBLE) + 1.0)
                * (2.0 * cast(na + nb AS DOUBLE) + 1.0)
                * (8.0 * cast(na + nb AS DOUBLE) + 11.0) / 5.0)
              + 0.5) AS BIGINT) AS v_milli
  FROM sums
)
SELECT n_a, n_b, u_milli, v_milli,
       cast(floor(1e3 * ((cast(u_milli AS DOUBLE) / 1e3)
            * (cast(u_milli AS DOUBLE) / 1e3)
            + (cast(v_milli AS DOUBLE) / 1e3) * (cast(v_milli AS DOUBLE) / 1e3)
            - 2.0 * (2.0 * (pow(cast(n_a + n_b AS DOUBLE), 2.0) - 4.0)
              / ((2.0 * cast(n_a + n_b AS DOUBLE) + 1.0)
                 * (8.0 * cast(n_a + n_b AS DOUBLE) + 11.0)) - 1.0)
              * (cast(u_milli AS DOUBLE) / 1e3) * (cast(v_milli AS DOUBLE) / 1e3))
            / (2.0 * (1.0 - pow(2.0 * (pow(cast(n_a + n_b AS DOUBLE), 2.0) - 4.0)
              / ((2.0 * cast(n_a + n_b AS DOUBLE) + 1.0)
                 * (8.0 * cast(n_a + n_b AS DOUBLE) + 11.0)) - 1.0, 2.0)))
            + 0.5) AS BIGINT) AS c_milli,
       cast(floor(1e3 * ((cast(u_milli AS DOUBLE) / 1e3)
            * (cast(u_milli AS DOUBLE) / 1e3)
            + (cast(v_milli AS DOUBLE) / 1e3) * (cast(v_milli AS DOUBLE) / 1e3)
            - 2.0 * (2.0 * (pow(cast(n_a + n_b AS DOUBLE), 2.0) - 4.0)
              / ((2.0 * cast(n_a + n_b AS DOUBLE) + 1.0)
                 * (8.0 * cast(n_a + n_b AS DOUBLE) + 11.0)) - 1.0)
              * (cast(u_milli AS DOUBLE) / 1e3) * (cast(v_milli AS DOUBLE) / 1e3))
            / (2.0 * (1.0 - pow(2.0 * (pow(cast(n_a + n_b AS DOUBLE), 2.0) - 4.0)
              / ((2.0 * cast(n_a + n_b AS DOUBLE) + 1.0)
                 * (8.0 * cast(n_a + n_b AS DOUBLE) + 11.0)) - 1.0, 2.0)))
            + 0.5) AS BIGINT) > 2996 AS reject_05
FROM uv
"""


REGISTRY_EXT121: dict[str, QuerySpec] = {
    "pot_mean_excess": QuerySpec(
        q_pot_mean_excess, _ORACLE_POT, "X7 [EXT] POT / GPD mean excess"
    ),
    "cucconi_test": QuerySpec(
        q_cucconi_test, _ORACLE_CUCCONI, "X7 [EXT] Cucconi location-scale"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_pot_mean_excess.__doc__ = q_pot_mean_excess.__doc__.format(p=_POT_P)  # noqa: E501
q_cucconi_test.__doc__ = q_cucconi_test.__doc__.format(a=_CU_A, b=_CU_B)  # noqa: E501
