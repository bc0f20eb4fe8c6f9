"""Wave 128 [EXT]: inequality and concentration completers — Hoover
(Robin Hood) index, generalized-entropy profile GE(0)/GE(1)/GE(2),
Lorenz-curve decile ordinates, top-share percentiles, and the Duncan
dissimilarity (segregation) index.

Scale notes (the 100x question, per query):
- hoover_index: per-user exact micro totals; the numerator
  sum |N*x_i - S| is exact integer arithmetic against one broadcast
  1-row (N, S) aggregate — two keyless reduces, no window, no join.
- ge_entropy_profile: one pass over the per-user total frame collecting
  exact moments (N, S, sum x^2 in decimal, micro-snapped per-user ln
  and x*ln sums); GE(0)/GE(1)/GE(2) are constant-time assembly.
- lorenz_curve_deciles / top_share_percentiles: per-user totals snap to
  DECI-UNIT CELLS (bounded by the per-user activity envelope, not user
  cardinality — the decile_lift_table sanction category); one prefix
  (resp. suffix) walk over the cell CDF yields every ordinate, and the
  9-decile / 4-percentile grid is a literal cross join against the
  walked frame. Cell-resolution order statistics by design.
- duncan_segregation_index: the (source, lang) corpus reduces map-side
  to a 20-row source frame; D's numerator sum |a_s*B - b_s*A| is exact
  integers against one broadcast (A, B) total row.

Reference parity: none; [EXT] X7 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import QuerySpec, _t

_DEC = "cast({x} as decimal(38,0))"
_CELL_MICRO = 100_000  # deci-unit cells over per-user total micro value
_TOP_PCTS = (1, 5, 10, 25)
_DUNCAN_LANG = "en"


def _user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exact micro value totals (map-side reduce of events)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.sum(F.expr("cast(floor(value * 1e6 + 0.5) as bigint)"))
        .cast("bigint")
        .alias("x")
    )


_SQL_USER_TOTALS = """
  SELECT user_id,
         sum(cast(floor(value * 1e6 + 0.5) AS BIGINT))::BIGINT AS x
  FROM events GROUP BY 1
"""


# --------------------------------------------------------------------------
# Hoover / Robin Hood index (X7 [EXT])
# --------------------------------------------------------------------------


def q_hoover_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Hoover index (Robin Hood index): the share of total
    user value that would have to move to equalize all users,
    H = sum|x_i - mu| / (2*sum x) = sum|N*x_i - S| / (2*N*S) — the
    numerator stays EXACT integer (no per-user division). The
    transfer-share companion of the shipped gini_concentration_rank.
    Output one row: n_users, sum_micro, hoover_micro."""
    tot = _user_totals(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    dev = (
        _user_totals(spark, sf_dir)
        .crossJoin(F.broadcast(tot))
        .agg(
            F.max("n").cast("bigint").alias("n_users"),
            F.max("s").cast("bigint").alias("sum_micro"),
            F.sum(F.expr(f"abs({_DEC.format(x='n')} * x - s)")).alias("adev"),
        )
    )
    return dev.selectExpr(
        "n_users",
        "sum_micro",
        "cast(floor(1e6 * cast(adev as double)"
        " / (2.0 * cast(n_users as double) * cast(sum_micro as double))"
        " + 0.5) as bigint) AS hoover_micro",
    )


_ORACLE_HOOVER = f"""
WITH pu AS ({_SQL_USER_TOTALS}),
tot AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS s FROM pu),
dev AS (
  SELECT max(n)::BIGINT AS n_users, max(s)::BIGINT AS sum_micro,
         sum(abs(n::HUGEINT * x - s)) AS adev
  FROM pu, tot
)
SELECT n_users, sum_micro,
       cast(floor(1e6 * cast(adev AS DOUBLE)
            / (2.0 * cast(n_users AS DOUBLE) * cast(sum_micro AS DOUBLE))
            + 0.5) AS BIGINT) AS hoover_micro
FROM dev
"""


# --------------------------------------------------------------------------
# Generalized entropy profile GE(0), GE(1), GE(2) (X7 [EXT])
# --------------------------------------------------------------------------


def q_ge_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 generalized-entropy inequality profile over per-user
    value totals: GE(0) = mean log deviation ln(mu) - mean ln x,
    GE(1) = Theil T = (sum x*ln x)/S - ln(mu), GE(2) = half squared
    coefficient of variation (N*sum x^2/S^2 - 1)/2 — the one-parameter
    family whose alpha ranks sensitivity to the bottom (0), middle (1),
    and top (2) of the distribution. Per-user ln is micro-snapped so
    both engines sum identical integers; x^2 sums carry in
    decimal(38,0)/HUGEINT. Output one row: n_users, ge0_micro,
    ge1_micro, ge2_micro."""
    lnm = "cast(floor(1e6 * ln(cast(x as double) / 1e6) + 0.5) as bigint)"
    agg = _user_totals(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.expr(f"{_DEC.format(x='x')} * x")).alias("q"),
        F.sum(F.expr(lnm)).cast("bigint").alias("l"),
        F.sum(F.expr(f"{_DEC.format(x='x')} * {lnm}")).alias("xl"),
    )
    mu = "(cast(s as double) / cast(n as double))"
    ge0 = f"(ln({mu} / 1e6) - cast(l as double) / (cast(n as double) * 1e6))"
    ge1 = (
        f"(cast(xl as double) / (cast(s as double) * 1e6) - ln({mu} / 1e6))"
    )
    ge2 = (
        "((cast(n as double) * cast(q as double)"
        " / (cast(s as double) * cast(s as double)) - 1.0) / 2.0)"
    )
    return agg.selectExpr(
        "n AS n_users",
        f"cast(floor(1e6 * {ge0} + 0.5) as bigint) AS ge0_micro",
        f"cast(floor(1e6 * {ge1} + 0.5) as bigint) AS ge1_micro",
        f"cast(floor(1e6 * {ge2} + 0.5) as bigint) AS ge2_micro",
    )


_ORACLE_GE = f"""
WITH pu AS ({_SQL_USER_TOTALS}),
agg AS (
  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS s,
         sum(x::HUGEINT * x) AS q,
         sum(cast(floor(1e6 * ln(cast(x AS DOUBLE) / 1e6) + 0.5)
             AS BIGINT))::BIGINT AS l,
         sum(x::HUGEINT * cast(floor(1e6 * ln(cast(x AS DOUBLE) / 1e6) + 0.5)
             AS BIGINT)) AS xl
  FROM pu
)
SELECT n AS n_users,
       cast(floor(1e6 * (ln((cast(s AS DOUBLE) / cast(n AS DOUBLE)) / 1e6)
            - cast(l AS DOUBLE) / (cast(n AS DOUBLE) * 1e6)) + 0.5) AS BIGINT)
         AS ge0_micro,
       cast(floor(1e6 * (cast(xl AS DOUBLE) / (cast(s AS DOUBLE) * 1e6)
            - ln((cast(s AS DOUBLE) / cast(n AS DOUBLE)) / 1e6)) + 0.5)
            AS BIGINT) AS ge1_micro,
       cast(floor(1e6 * ((cast(n AS DOUBLE) * cast(q AS DOUBLE)
            / (cast(s AS DOUBLE) * cast(s AS DOUBLE)) - 1.0) / 2.0) + 0.5)
            AS BIGINT) AS ge2_micro
FROM agg
"""


# --------------------------------------------------------------------------
# Lorenz curve decile ordinates (X7 [EXT])
# --------------------------------------------------------------------------


def _total_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user totals snapped to deci-unit cells with exact per-cell
    user counts and micro value sums (the bounded frame both Lorenz
    walks run over)."""
    return (
        _user_totals(spark, sf_dir)
        .select(
            F.expr(
                f"cast(floor(cast(x as double) / {_CELL_MICRO} + 0.5)"
                " as bigint)"
            ).alias("tc"),
            "x",
        )
        .groupBy("tc")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nu"),
            F.sum("x").cast("bigint").alias("sv"),
        )
    )


_SQL_TOTAL_CELLS = f"""
  SELECT cast(floor(cast(x AS DOUBLE) / {_CELL_MICRO} + 0.5) AS BIGINT) AS tc,
         count(*)::BIGINT AS nu, sum(x)::BIGINT AS sv
  FROM pu GROUP BY 1
"""


def q_lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Lorenz curve at the population deciles: L(d/10) = the
    cumulative share of total user value held by the poorest d/10 of
    users, read off one ascending prefix walk over the DECI-UNIT total
    cells at the first cell where cum users >= ceil(d*N/10)
    (cell-resolution order statistic — the equi-depth idiom, no global
    row sort). The curve the shipped gini/palma indices summarize.
    Output 9 rows: decile, cut_cell, cum_users, cum_share_micro."""
    cells = _total_cells(spark, sf_dir)
    w = Window.orderBy("tc").rowsBetween(Window.unboundedPreceding, 0)
    walk = cells.select(
        "tc",
        F.sum("nu").over(w).cast("bigint").alias("cn"),
        F.sum("sv").over(w).cast("bigint").alias("cs"),
    )
    tot = cells.agg(
        F.sum("nu").cast("bigint").alias("n"),
        F.sum("sv").cast("bigint").alias("s"),
    )
    grid = walk.crossJoin(F.broadcast(tot)).select(
        "tc",
        "cn",
        "cs",
        "n",
        "s",
        F.explode(F.expr("array(1,2,3,4,5,6,7,8,9)")).alias("decile"),
    )
    hits = grid.filter(
        F.expr("cn >= cast((decile * n + 9) div 10 as bigint)")
    )
    return (
        hits.groupBy("decile")
        .agg(
            F.min("tc").cast("bigint").alias("cut_cell"),
            F.expr("min_by(cn, tc)").cast("bigint").alias("cum_users"),
            F.expr(
                "cast(floor(1e6 * cast(min_by(cs, tc) as double)"
                " / cast(max(s) as double) + 0.5) as bigint)"
            ).alias("cum_share_micro"),
        )
        .selectExpr(
            "cast(decile as bigint) AS decile",
            "cut_cell",
            "cum_users",
            "cum_share_micro",
        )
        .orderBy("decile")
    )


_ORACLE_LORENZ = f"""
WITH pu AS ({_SQL_USER_TOTALS}),
cells AS ({_SQL_TOTAL_CELLS}),
walk AS (
  SELECT tc, sum(nu) OVER (ORDER BY tc)::BIGINT AS cn,
         sum(sv) OVER (ORDER BY tc)::BIGINT AS cs
  FROM cells
),
tot AS (SELECT sum(nu)::BIGINT AS n, sum(sv)::BIGINT AS s FROM cells),
grid AS (
  SELECT tc, cn, cs, n, s, decile
  FROM walk, tot, unnest([1,2,3,4,5,6,7,8,9]) AS u(decile)
),
hits AS (
  SELECT * FROM grid WHERE cn >= cast((decile * n + 9) // 10 AS BIGINT)
)
SELECT cast(decile AS BIGINT) AS decile,
       min(tc)::BIGINT AS cut_cell,
       min_by(cn, tc)::BIGINT AS cum_users,
       cast(floor(1e6 * cast(min_by(cs, tc) AS DOUBLE)
            / cast(max(s) AS DOUBLE) + 0.5) AS BIGINT) AS cum_share_micro
FROM hits GROUP BY decile ORDER BY decile
"""


# --------------------------------------------------------------------------
# Top-share percentiles (X7 [EXT])
# --------------------------------------------------------------------------


def q_top_share_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 top-share concentration: the share of total user value
    held by the top {p}% of users, read off one DESCENDING suffix walk
    over the deci-unit total cells at the first cell where cum users >=
    ceil(p*N/100) (cell-resolution; the WID-style top-share companion
    of the Lorenz deciles). Output 4 rows: pct, k_users, cum_users,
    share_micro."""
    cells = _total_cells(spark, sf_dir)
    w = Window.orderBy(F.col("tc").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    walk = cells.select(
        "tc",
        F.sum("nu").over(w).cast("bigint").alias("cn"),
        F.sum("sv").over(w).cast("bigint").alias("cs"),
    )
    tot = cells.agg(
        F.sum("nu").cast("bigint").alias("n"),
        F.sum("sv").cast("bigint").alias("s"),
    )
    pcts = ",".join(str(p) for p in _TOP_PCTS)
    grid = walk.crossJoin(F.broadcast(tot)).select(
        "tc",
        "cn",
        "cs",
        "n",
        "s",
        F.explode(F.expr(f"array({pcts})")).alias("pct"),
    )
    hits = grid.filter(
        F.expr("cn >= cast((pct * n + 99) div 100 as bigint)")
    )
    return (
        hits.groupBy("pct")
        .agg(
            F.expr("cast((max(pct) * max(n) + 99) div 100 as bigint)").alias(
                "k_users"
            ),
            F.expr("max_by(cn, tc)").cast("bigint").alias("cum_users"),
            F.expr(
                "cast(floor(1e6 * cast(max_by(cs, tc) as double)"
                " / cast(max(s) as double) + 0.5) as bigint)"
            ).alias("share_micro"),
        )
        .selectExpr(
            "cast(pct as bigint) AS pct", "k_users", "cum_users", "share_micro"
        )
        .orderBy("pct")
    )


_ORACLE_TOPSHARE = f"""
WITH pu AS ({_SQL_USER_TOTALS}),
cells AS ({_SQL_TOTAL_CELLS}),
walk AS (
  SELECT tc, sum(nu) OVER (ORDER BY tc DESC)::BIGINT AS cn,
         sum(sv) OVER (ORDER BY tc DESC)::BIGINT AS cs
  FROM cells
),
tot AS (SELECT sum(nu)::BIGINT AS n, sum(sv)::BIGINT AS s FROM cells),
grid AS (
  SELECT tc, cn, cs, n, s, pct
  FROM walk, tot,
       unnest([{", ".join(str(p) for p in _TOP_PCTS)}]) AS u(pct)
),
hits AS (
  SELECT * FROM grid WHERE cn >= cast((pct * n + 99) // 100 AS BIGINT)
)
SELECT cast(pct AS BIGINT) AS pct,
       cast((max(pct) * max(n) + 99) // 100 AS BIGINT) AS k_users,
       max_by(cn, tc)::BIGINT AS cum_users,
       cast(floor(1e6 * cast(max_by(cs, tc) AS DOUBLE)
            / cast(max(s) AS DOUBLE) + 0.5) AS BIGINT) AS share_micro
FROM hits GROUP BY pct ORDER BY pct
"""


# --------------------------------------------------------------------------
# Duncan dissimilarity / segregation index (X7 [EXT])
# --------------------------------------------------------------------------


def q_duncan_segregation_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """[EXT] X7 Duncan & Duncan (1955) dissimilarity index: how
    unevenly are '{lg}' vs non-'{lg}' documents distributed across
    sources? D = (1/2) sum_s |a_s/A - b_s/B| = sum_s |a_s*B - b_s*A|
    / (2*A*B) — the numerator stays exact integer per source. D is the
    share of either group that would need to move source to equalize
    the mix. Output one row: n_sources, n_a, n_b,
    duncan_micro."""
    d = _t(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.sum(F.expr(f"cast(lang = '{_DUNCAN_LANG}' as int)"))
        .cast("bigint")
        .alias("a"),
        F.sum(F.expr(f"cast(lang <> '{_DUNCAN_LANG}' as int)"))
        .cast("bigint")
        .alias("b"),
    )
    tot = per_src.agg(
        F.sum("a").cast("bigint").alias("ta"),
        F.sum("b").cast("bigint").alias("tb"),
    )
    red = per_src.crossJoin(F.broadcast(tot)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        F.max("ta").cast("bigint").alias("n_a"),
        F.max("tb").cast("bigint").alias("n_b"),
        F.sum(
            F.expr(f"abs({_DEC.format(x='a')} * tb - {_DEC.format(x='b')} * ta)")
        ).alias("num"),
    )
    return red.selectExpr(
        "n_sources",
        "n_a",
        "n_b",
        "cast(floor(1e6 * cast(num as double)"
        " / (2.0 * cast(n_a as double) * cast(n_b as double)) + 0.5)"
        " as bigint) AS duncan_micro",
    )


_ORACLE_DUNCAN = f"""
WITH per_src AS (
  SELECT source,
         sum(CASE WHEN lang = '{_DUNCAN_LANG}' THEN 1 ELSE 0 END)::BIGINT AS a,
         sum(CASE WHEN lang <> '{_DUNCAN_LANG}' THEN 1 ELSE 0 END)::BIGINT AS b
  FROM documents GROUP BY 1
),
tot AS (SELECT sum(a)::BIGINT AS ta, sum(b)::BIGINT AS tb FROM per_src),
red AS (
  SELECT count(*)::BIGINT AS n_sources, max(ta)::BIGINT AS n_a,
         max(tb)::BIGINT AS n_b,
         sum(abs(a::HUGEINT * tb - b::HUGEINT * ta)) AS num
  FROM per_src, tot
)
SELECT n_sources, n_a, n_b,
       cast(floor(1e6 * cast(num AS DOUBLE)
            / (2.0 * cast(n_a AS DOUBLE) * cast(n_b AS DOUBLE)) + 0.5)
            AS BIGINT) AS duncan_micro
FROM red
"""


REGISTRY_EXT128: dict[str, QuerySpec] = {
    "hoover_index": QuerySpec(
        q_hoover_index, _ORACLE_HOOVER, "X7 [EXT] Hoover index"
    ),
    "ge_entropy_profile": QuerySpec(
        q_ge_entropy_profile, _ORACLE_GE, "X7 [EXT] GE profile"
    ),
    "lorenz_curve_deciles": QuerySpec(
        q_lorenz_curve_deciles, _ORACLE_LORENZ, "X7 [EXT] Lorenz deciles"
    ),
    "top_share_percentiles": QuerySpec(
        q_top_share_percentiles, _ORACLE_TOPSHARE, "X7 [EXT] top shares"
    ),
    "duncan_segregation_index": QuerySpec(
        q_duncan_segregation_index, _ORACLE_DUNCAN, "X7 [EXT] Duncan D"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_top_share_percentiles.__doc__ = q_top_share_percentiles.__doc__.format(p="/".join(str(p) for p in _TOP_PCTS))  # noqa: E501
q_duncan_segregation_index.__doc__ = q_duncan_segregation_index.__doc__.format(lg=_DUNCAN_LANG)  # noqa: E501
