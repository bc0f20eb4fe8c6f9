"""Wave 126 [EXT]: effect sizes, agreement, spectral centrality and
model-eval completers — Cohen's d / Hedges' g, quadratic-weighted kappa,
eigenvector centrality (power iteration), decile lift/gains table,
Kendall's W coefficient of concordance.

Scale notes (the 100x question, per query):
- cohens_d_effect: two keyless moment aggregates (exact decimal integer
  sums) and constant-time assembly — no window, no join.
- weighted_kappa_depth: per-(user, half) activity-depth labels reduce
  to a 3x3 ENUM agreement table; the quadratic-weighted expected/
  observed sums are constant-size arithmetic over that table crossed
  with its margins.
- eigenvector_centrality_types: the co-occurrence graph lives on the
  5-value event_type ENUM — the adjacency aggregate is corpus-reduced
  map-side, and the {it}-round power iteration unrolls as {it} joins
  over a 5-row frame with an L1 normalization + MILLI snap per round
  (both engines snap identically, so the iteration is exact).
- decile_lift_table: user scores reduce to micro-value CELLS; the nine
  decile cut points are ORDER STATISTICS off one prefix walk over the
  cell CDF (the equi-depth idiom — no global row sort at any scale),
  users map to deciles by threshold join, and lift is per-decile
  arithmetic.
- kendall_w_concordance: three 8-hour-shift "raters" rank the 7
  weekdays by mean event value — a 3x7 enum frame; midrank ties and
  the tie-corrected W are exact integer sums over it.

Reference parity: none; [EXT] X7/X9 tier per BASELINE.json.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import QuerySpec, _t

_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000
_CD_A, _CD_B = "click", "purchase"
_EC_ITERS = 10
_DEPTH_EDGES = (25, 40)  # per-half event-count bands: <=25, 26..40, >40

_DEC = "cast({x} as decimal(38,0))"


# --------------------------------------------------------------------------
# Cohen's d / Hedges' g / Glass delta (X7 [EXT])
# --------------------------------------------------------------------------


def q_cohens_d_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 standardized mean-difference effect sizes between '{a}'
    and '{b}' event values: Cohen's d on the pooled SD, Hedges' g with
    the small-sample correction J = 1 - 3/(4(n_a+n_b)-9), and Glass
    delta on the control ('{b}') SD. Exact integer micro moments; all
    divisions at the final double assembly. Output one row: n_a, n_b,
    d_milli, g_milli, glass_milli."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type").isin(_CD_A, _CD_B))
    agg = e.select(
        F.expr(f"cast(event_type = '{_CD_A}' as int)").alias("isa"),
        F.expr("cast(floor(value * 1e6 + 0.5) as bigint)").alias("vm"),
    ).agg(
        F.sum("isa").cast("bigint").alias("na"),
        F.sum(F.expr("1 - isa")).cast("bigint").alias("nb"),
        F.sum(F.expr("if(isa = 1, vm, cast(0 as bigint))")).alias("sa"),
        F.sum(F.expr("if(isa = 0, vm, cast(0 as bigint))")).alias("sb"),
        F.sum(F.expr(f"if(isa = 1, {_DEC.format(x='vm')} * vm, cast(0 as decimal(38,0)))")).alias("qa"),
        F.sum(F.expr(f"if(isa = 0, {_DEC.format(x='vm')} * vm, cast(0 as decimal(38,0)))")).alias("qb"),
    )
    # sample variances (n-1): va = (qa - sa^2/na) / (na - 1), in micro^2
    va = (
        "((cast(qa as double) - cast(sa as double) * cast(sa as double)"
        " / cast(na as double)) / (cast(na as double) - 1.0))"
    )
    vb = (
        "((cast(qb as double) - cast(sb as double) * cast(sb as double)"
        " / cast(nb as double)) / (cast(nb as double) - 1.0))"
    )
    dmean = (
        "(cast(sa as double) / cast(na as double)"
        " - cast(sb as double) / cast(nb as double))"
    )
    pooled = (
        f"sqrt(((cast(na as double) - 1.0) * {va}"
        f" + (cast(nb as double) - 1.0) * {vb})"
        " / (cast(na as double) + cast(nb as double) - 2.0))"
    )
    d = f"({dmean} / {pooled})"
    j = "(1.0 - 3.0 / (4.0 * (cast(na as double) + cast(nb as double)) - 9.0))"
    glass = f"({dmean} / sqrt({vb}))"
    return agg.selectExpr(
        "na AS n_a",
        "nb AS n_b",
        f"cast(floor(1e3 * {d} + 0.5) as bigint) AS d_milli",
        f"cast(floor(1e3 * {d} * {j} + 0.5) as bigint) AS g_milli",
        f"cast(floor(1e3 * {glass} + 0.5) as bigint) AS glass_milli",
    )


_VA_SQL = (
    "((cast(qa AS DOUBLE) - cast(sa AS DOUBLE) * cast(sa AS DOUBLE)"
    " / cast(na AS DOUBLE)) / (cast(na AS DOUBLE) - 1.0))"
)
_VB_SQL = (
    "((cast(qb AS DOUBLE) - cast(sb AS DOUBLE) * cast(sb AS DOUBLE)"
    " / cast(nb AS DOUBLE)) / (cast(nb AS DOUBLE) - 1.0))"
)
_DMEAN_SQL = (
    "(cast(sa AS DOUBLE) / cast(na AS DOUBLE)"
    " - cast(sb AS DOUBLE) / cast(nb AS DOUBLE))"
)
_POOLED_SQL = (
    f"sqrt(((cast(na AS DOUBLE) - 1.0) * {_VA_SQL}"
    f" + (cast(nb AS DOUBLE) - 1.0) * {_VB_SQL})"
    " / (cast(na AS DOUBLE) + cast(nb AS DOUBLE) - 2.0))"
)
_D_SQL = f"({_DMEAN_SQL} / {_POOLED_SQL})"
_J_SQL = "(1.0 - 3.0 / (4.0 * (cast(na AS DOUBLE) + cast(nb AS DOUBLE)) - 9.0))"

_ORACLE_COHEN = f"""
WITH agg AS (
  SELECT sum(isa)::BIGINT AS na, sum(1 - isa)::BIGINT AS nb,
         sum(CASE WHEN isa = 1 THEN vm ELSE 0 END)::BIGINT AS sa,
         sum(CASE WHEN isa = 0 THEN vm ELSE 0 END)::BIGINT AS sb,
         sum(CASE WHEN isa = 1 THEN vm::HUGEINT * vm ELSE 0 END) AS qa,
         sum(CASE WHEN isa = 0 THEN vm::HUGEINT * vm ELSE 0 END) AS qb
  FROM (
    SELECT CASE WHEN event_type = '{_CD_A}' THEN 1 ELSE 0 END AS isa,
           cast(floor(value * 1e6 + 0.5) AS BIGINT) AS vm
    FROM events WHERE event_type IN ('{_CD_A}', '{_CD_B}')
  )
)
SELECT na AS n_a, nb AS n_b,
       cast(floor(1e3 * {_D_SQL} + 0.5) AS BIGINT) AS d_milli,
       cast(floor(1e3 * {_D_SQL} * {_J_SQL} + 0.5) AS BIGINT) AS g_milli,
       cast(floor(1e3 * ({_DMEAN_SQL} / sqrt({_VB_SQL})) + 0.5) AS BIGINT)
         AS glass_milli
FROM agg
"""


# --------------------------------------------------------------------------
# Quadratic-weighted Cohen's kappa on activity depth (X7/X9 [EXT])
# --------------------------------------------------------------------------


def q_weighted_kappa_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7/X9 quadratic-weighted Cohen's kappa: do users keep their
    ACTIVITY-VOLUME band (events per month-half <= {e0} / {e0}+1..{e1}
    / > {e1}) between the two halves? The two "raters" are the halves;
    the 3x3 agreement table is an enum aggregate, and kappa_w = 1 -
    n * sum(w*O) / sum(w*E) with quadratic weights w_ij = (i-j)^2 and E
    the outer product of the margins (exact integer sums; one double
    ratio at the end). A degenerate table (every user in one band both
    halves, expected disagreement 0) reports the perfect-agreement
    convention kappa_w = 1. Output one row: n_users_paired,
    kappa_w_milli."""
    e0, e1 = _DEPTH_EDGES
    e = _t(spark, sf_dir, "events")
    depth = (
        e.select(
            "user_id",
            F.expr(
                f"cast((unix_micros(ts) div {_DAY_US}) % 30 >= 15 as int)"
            ).alias("h"),
        )
        .groupBy("user_id", "h")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nev"))
        .selectExpr(
            "user_id",
            "h",
            f"cast(nev > {e0} as int) + cast(nev > {e1} as int) AS band",
        )
    )
    paired = (
        depth.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("nh"),
            F.max(F.expr("if(h = 0, band, null)")).alias("b1"),
            F.max(F.expr("if(h = 1, band, null)")).alias("b2"),
        )
        .filter(F.col("nh") == 2)
    )
    tab = paired.groupBy("b1", "b2").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    m1 = tab.groupBy("b1").agg(F.sum("cnt").cast("bigint").alias("r"))
    m2 = tab.groupBy("b2").agg(F.sum("cnt").cast("bigint").alias("c"))
    wo = tab.agg(
        F.sum(F.expr(f"{_DEC.format(x='cnt')} * (b1 - b2) * (b1 - b2)")).alias(
            "swo"
        ),
        F.sum("cnt").cast("bigint").alias("n"),
    )
    we = (
        m1.crossJoin(m2)
        .agg(
            F.sum(
                F.expr(f"{_DEC.format(x='r')} * c * (b1 - b2) * (b1 - b2)")
            ).alias("swe")
        )
    )
    return (
        wo.crossJoin(F.broadcast(we))
        .selectExpr(
            "n AS n_users_paired",
            # kappa_w = 1 - (sum w*O / n) / (sum w*E / n^2); swe = 0 only
            # in the degenerate one-band table -> perfect agreement
            "if(swe = 0, cast(1000 as bigint),"
            " cast(floor(1e3 * (1.0 - cast(swo as double) * cast(n as double)"
            " / cast(swe as double)) + 0.5) as bigint)) AS kappa_w_milli",
        )
    )


_ORACLE_WKAPPA = f"""
WITH depth AS (
  SELECT user_id, h,
         (CASE WHEN count(*) > {_DEPTH_EDGES[0]} THEN 1 ELSE 0 END
          + CASE WHEN count(*) > {_DEPTH_EDGES[1]} THEN 1 ELSE 0 END) AS band
  FROM (
    SELECT user_id,
           CASE WHEN (epoch_us(ts) // {_DAY_US}) % 30 >= 15
                THEN 1 ELSE 0 END AS h
    FROM events
  )
  GROUP BY user_id, h
),
paired AS (
  SELECT user_id,
         max(CASE WHEN h = 0 THEN band END) AS b1,
         max(CASE WHEN h = 1 THEN band END) AS b2
  FROM depth GROUP BY user_id HAVING count(*) = 2
),
tab AS (SELECT b1, b2, count(*)::BIGINT AS cnt FROM paired GROUP BY 1, 2),
m1 AS (SELECT b1, sum(cnt)::BIGINT AS r FROM tab GROUP BY 1),
m2 AS (SELECT b2, sum(cnt)::BIGINT AS c FROM tab GROUP BY 1),
wo AS (
  SELECT sum(cnt::HUGEINT * (b1 - b2) * (b1 - b2)) AS swo,
         sum(cnt)::BIGINT AS n
  FROM tab
),
we AS (
  SELECT sum(r::HUGEINT * c * (b1 - b2) * (b1 - b2)) AS swe FROM m1, m2
)
SELECT n AS n_users_paired,
       CASE WHEN swe = 0 THEN 1000
            ELSE cast(floor(1e3 * (1.0 - cast(swo AS DOUBLE)
                 * cast(n AS DOUBLE) / cast(swe AS DOUBLE)) + 0.5) AS BIGINT)
       END AS kappa_w_milli
FROM wo, we
"""


# --------------------------------------------------------------------------
# Eigenvector centrality over the event-type co-occurrence graph (X9 [EXT])
# --------------------------------------------------------------------------


def q_eigenvector_centrality_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X9 eigenvector centrality on the event-type co-occurrence
    graph (types co-occurring within a (user, day) session, count-
    weighted, self-loops dropped): {it} power-iteration rounds, each
    L1-normalized and MILLI-snapped so both engines iterate identical
    integers. The adjacency AGGREGATE is distributed (one shuffle on
    the type pair); the iteration itself runs driver-side on the
    COLLECTED adjacency — bounded by the event-type ENUM domain
    (<= 5x5 cells at ANY corpus size, the PQ-codebook bounded-collect
    idiom) — because an in-plan loop doubles the logical tree per
    round (the raw/tot double reference) and a checkpoint would hide
    the plan from the guards. Output per type: event_type,
    centrality_milli."""
    e = _t(spark, sf_dir, "events")
    ud = e.select(
        "user_id",
        F.expr(f"unix_micros(ts) div {_DAY_US}").alias("d"),
        "event_type",
    ).distinct()
    other = ud.selectExpr("user_id", "d", "event_type AS t2")
    adj = (
        ud.join(other, ["user_id", "d"])
        .filter(F.col("event_type") != F.col("t2"))
        .groupBy(F.col("event_type").alias("i"), F.col("t2").alias("j"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    rows = adj.collect()  # <= |types|^2 cells, enum-bounded
    nodes = sorted({r.i for r in rows} | {r.j for r in rows})
    w = {(r.i, r.j): r.w for r in rows}
    v = {n: 1000 for n in nodes}
    for _ in range(_EC_ITERS):
        s = {
            n: sum(w.get((n, m), 0) * v[m] for m in nodes) for n in nodes
        }
        t = float(sum(s.values()))
        # same double-division + milli-snap text as the oracle
        v = {n: int(math.floor(1e3 * float(s[n]) / t + 0.5)) for n in nodes}
    out = spark.createDataFrame(
        [(n, v[n]) for n in nodes],
        "event_type string, centrality_milli bigint",
    )
    return out.orderBy("event_type")


def _ec_oracle() -> str:
    """Chained MATERIALIZED CTEs — every v{k}/s{k} is referenced twice,
    and DuckDB inlines plain CTEs, so without MATERIALIZED the chain
    re-expands exponentially (2^iters copies of the events scan)."""
    parts = [
        "v0 AS MATERIALIZED (SELECT i AS node, 1000::BIGINT AS v"
        " FROM (SELECT DISTINCT i FROM adj))"
    ]
    for k in range(_EC_ITERS):
        parts.append(
            f"s{k} AS MATERIALIZED (\n"
            f"  SELECT adj.i, sum(adj.w::HUGEINT * v{k}.v) AS s\n"
            f"  FROM adj JOIN v{k} ON adj.j = v{k}.node GROUP BY adj.i\n"
            ")"
        )
        parts.append(
            f"v{k + 1} AS MATERIALIZED (\n"
            f"  SELECT i AS node,\n"
            f"         cast(floor(1e3 * cast(s AS DOUBLE)\n"
            f"              / (SELECT cast(sum(s) AS DOUBLE) FROM s{k})\n"
            f"              + 0.5) AS BIGINT) AS v\n"
            f"  FROM s{k}\n"
            ")"
        )
    ctes = ",\n".join(parts)
    return f"""
WITH adj AS MATERIALIZED (
  SELECT a.event_type AS i, b.event_type AS j, count(*)::BIGINT AS w
  FROM (SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS d, event_type
        FROM events) a
  JOIN (SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS d, event_type
        FROM events) b
    ON a.user_id = b.user_id AND a.d = b.d AND a.event_type <> b.event_type
  GROUP BY 1, 2
),
{ctes}
SELECT node AS event_type, v AS centrality_milli FROM v{_EC_ITERS}
ORDER BY event_type
"""


_ORACLE_EIGEN = _ec_oracle()


# --------------------------------------------------------------------------
# Decile lift / gains table (X7/X8 [EXT])
# --------------------------------------------------------------------------


def q_decile_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7/X8 decile lift table: users scored by total '{a}' value
    (snapped to WHOLE value units so the score-cell domain is bounded
    by the per-user activity envelope, not user cardinality), outcome =
    did the user '{b}' at all; deciles are cut off the score-cell CDF
    (one prefix walk over the bounded cells, no global row sort at any
    scale), ties share a cell so decile sizes wobble at cell
    granularity (documented; identical in both engines). Output per
    decile: decile, n_users, n_pos, rate_micro, lift_micro
    (rate / overall rate)."""
    e = _t(spark, sf_dir, "events")
    # score snapped to WHOLE value units so the score-cell frame is
    # bounded by the per-user activity envelope (events/user and the
    # value domain are corpus-size-independent), not by user cardinality
    users = (
        e.groupBy("user_id")
        .agg(
            F.expr(
                f"cast(floor(cast(sum(if(event_type = '{_CD_A}',"
                " cast(floor(value * 1e6 + 0.5) as bigint),"
                " cast(0 as bigint))) as double) / 1e6 + 0.5) as bigint)"
            ).alias("score"),
            F.max(F.expr(f"cast(event_type = '{_CD_B}' as int)")).alias("pos"),
        )
    )
    cells = users.groupBy("score").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wcum = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    pref = cells.select(
        "score", F.sum("c").over(wcum).cast("bigint").alias("cum")
    )
    tot = pref.agg(F.max("cum").cast("bigint").alias("n"))
    # decile of a score cell = number of cut points at or below its rank:
    # d = floor(10 * (cum - 1) / n) of the cell's LAST member, assigned
    # per cell so ties stay together (documented convention)
    # explicit floor: DuckDB's double->bigint cast ROUNDS where Spark's
    # truncates, so the decile cut must floor before the cast
    dmap = pref.crossJoin(F.broadcast(tot)).selectExpr(
        "score",
        "least(cast(floor(10.0 * cast(cum - 1 as double) / cast(n as double))"
        " as bigint), cast(9 as bigint)) AS decile",
    )
    scored = users.join(dmap, "score")
    overall = users.agg(
        F.expr("cast(sum(pos) as double) / count(1)").alias("orate")
    )
    return (
        scored.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("pos").cast("bigint").alias("n_pos"),
        )
        .crossJoin(F.broadcast(overall))
        .selectExpr(
            "decile",
            "n_users",
            "n_pos",
            "cast(floor(1e6 * cast(n_pos as double) / cast(n_users as double)"
            " + 0.5) as bigint) AS rate_micro",
            "cast(floor(1e6 * (cast(n_pos as double) / cast(n_users as double))"
            " / orate + 0.5) as bigint) AS lift_micro",
        )
        .orderBy("decile")
    )


_ORACLE_LIFT = f"""
WITH users AS (
  SELECT user_id,
         cast(floor(cast(sum(CASE WHEN event_type = '{_CD_A}'
                  THEN cast(floor(value * 1e6 + 0.5) AS BIGINT)
                  ELSE 0 END) AS DOUBLE) / 1e6 + 0.5) AS BIGINT) AS score,
         max(CASE WHEN event_type = '{_CD_B}' THEN 1 ELSE 0 END) AS pos
  FROM events GROUP BY 1
),
cells AS (SELECT score, count(*)::BIGINT AS c FROM users GROUP BY 1),
pref AS (
  SELECT score, sum(c) OVER (ORDER BY score)::BIGINT AS cum FROM cells
),
tot AS (SELECT max(cum)::BIGINT AS n FROM pref),
dmap AS (
  SELECT score,
         least(cast(floor(10.0 * cast(cum - 1 AS DOUBLE) / cast(n AS DOUBLE))
               AS BIGINT), 9) AS decile
  FROM pref, tot
),
overall AS (SELECT cast(sum(pos) AS DOUBLE) / count(*) AS orate FROM users)
SELECT decile, count(*)::BIGINT AS n_users, sum(pos)::BIGINT AS n_pos,
       cast(floor(1e6 * cast(sum(pos) AS DOUBLE) / cast(count(*) AS DOUBLE)
            + 0.5) AS BIGINT) AS rate_micro,
       cast(floor(1e6 * (cast(sum(pos) AS DOUBLE) / cast(count(*) AS DOUBLE))
            / orate + 0.5) AS BIGINT) AS lift_micro
FROM users JOIN dmap USING (score), overall
GROUP BY decile, orate ORDER BY decile
"""


# --------------------------------------------------------------------------
# Kendall's W coefficient of concordance (X7 [EXT])
# --------------------------------------------------------------------------


def q_kendall_w_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Kendall's W: do the three 8-hour shifts agree on how the
    7 weekdays rank by mean event value? Each shift ranks the weekdays
    (tie-aware doubled midranks over the 3x7 enum frame), and the
    tie-corrected W = (12*S) / (m^2(k^3-k) - m*sum T) with S the sum of
    squared deviations of weekday rank sums — every term an exact
    integer (doubled ranks fold the /2 into the constants). Output one
    row: k_objects, m_raters, w_milli."""
    e = _t(spark, sf_dir, "events")
    cell = (
        e.select(
            F.expr(
                f"cast((unix_micros(ts) % {_DAY_US}) div (8 * {_HOUR_US}) as int)"
            ).alias("g"),
            F.expr(
                f"cast(((unix_micros(ts) div {_DAY_US}) + 4) % 7 as int)"
            ).alias("dw"),
            F.expr("cast(floor(value * 1e6 + 0.5) as bigint)").alias("vm"),
        )
        .groupBy("g", "dw")
        .agg(
            F.expr(
                "cast(floor(cast(sum(vm) as double) / count(1) + 0.5) as bigint)"
            ).alias("m")
        )
    )
    # doubled midranks of the 7 weekdays within each shift
    wrk = Window.partitionBy("g").orderBy("m").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cells2 = cell.groupBy("g", "m").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.collect_list("dw").alias("dws"),
    )
    r2 = (
        cells2.select(
            "g",
            "c",
            "dws",
            (2 * (F.sum("c").over(wrk) - F.col("c")) + F.col("c") + 1)
            .cast("bigint")
            .alias("r2"),
        )
        .select("g", "r2", "c", F.explode("dws").alias("dw"))
    )
    # rank sums per weekday (doubled); tie term per (rater, run)
    sums = r2.groupBy("dw").agg(F.sum("r2").cast("bigint").alias("rs2"))
    ties = r2.select("g", "r2", "c").distinct().agg(
        F.sum(F.expr(f"{_DEC.format(x='c')} * (c - 1) * (c + 1)")).alias("t3")
    )
    km = r2.agg(
        F.countDistinct("dw").cast("bigint").alias("k"),
        F.countDistinct("g").cast("bigint").alias("m_raters"),
    )
    s = (
        sums.crossJoin(F.broadcast(km))
        .agg(
            # S4 = sum (rs2 - m*(k+1))^2 = 4 * classical S (doubled ranks:
            # mean rank sum doubled = m*(k+1))
            F.sum(
                F.expr(
                    f"{_DEC.format(x='(rs2 - m_raters * (k + 1))')}"
                    " * (rs2 - m_raters * (k + 1))"
                )
            ).alias("s4"),
            F.max("k").alias("k"),
            F.max("m_raters").alias("m_raters"),
        )
    )
    # W = 12*(S4/4) / (m^2(k^3-k) - m*T3)  with T3 = sum t(t-1)(t+1)
    w_expr = (
        "(3.0 * cast(s4 as double))"
        " / (cast(m_raters as double) * cast(m_raters as double)"
        " * (pow(cast(k as double), 3.0) - cast(k as double))"
        " - cast(m_raters as double) * cast(t3 as double))"
    )
    return (
        s.crossJoin(F.broadcast(ties))
        .selectExpr(
            "k AS k_objects",
            "m_raters",
            f"cast(floor(1e3 * {w_expr} + 0.5) as bigint) AS w_milli",
        )
    )


_ORACLE_KW = f"""
WITH cell AS (
  SELECT (epoch_us(ts) % {_DAY_US}) // (8 * {_HOUR_US}) AS g,
         ((epoch_us(ts) // {_DAY_US}) + 4) % 7 AS dw,
         cast(floor(cast(sum(cast(floor(value * 1e6 + 0.5) AS BIGINT))
                         AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS m
  FROM events GROUP BY 1, 2
),
cells2 AS (
  SELECT g, m, count(*)::BIGINT AS c, list(dw) AS dws
  FROM cell GROUP BY g, m
),
r2 AS (
  SELECT g, c, u.dw,
         (2 * (sum(c) OVER (PARTITION BY g ORDER BY m) - c) + c + 1)::BIGINT
           AS r2
  FROM cells2, unnest(dws) AS u(dw)
),
sums AS (SELECT dw, sum(r2)::BIGINT AS rs2 FROM r2 GROUP BY 1),
ties AS (
  SELECT sum(c::HUGEINT * (c - 1) * (c + 1)) AS t3
  FROM (SELECT DISTINCT g, r2, c FROM r2)
),
km AS (
  SELECT count(DISTINCT dw)::BIGINT AS k,
         count(DISTINCT g)::BIGINT AS m_raters
  FROM r2
),
s AS (
  SELECT sum((rs2 - m_raters * (k + 1))::HUGEINT
             * (rs2 - m_raters * (k + 1))) AS s4,
         max(k) AS k, max(m_raters) AS m_raters
  FROM sums, km
)
SELECT k AS k_objects, m_raters,
       cast(floor(1e3 * ((3.0 * cast(s4 AS DOUBLE))
            / (cast(m_raters AS DOUBLE) * cast(m_raters AS DOUBLE)
               * (pow(cast(k AS DOUBLE), 3.0) - cast(k AS DOUBLE))
               - cast(m_raters AS DOUBLE) * cast(t3 AS DOUBLE))) + 0.5)
            AS BIGINT) AS w_milli
FROM s, ties
"""


REGISTRY_EXT126: dict[str, QuerySpec] = {
    "cohens_d_effect": QuerySpec(
        q_cohens_d_effect, _ORACLE_COHEN, "X7 [EXT] Cohen's d / Hedges' g"
    ),
    "weighted_kappa_depth": QuerySpec(
        q_weighted_kappa_depth, _ORACLE_WKAPPA, "X7/X9 [EXT] weighted kappa"
    ),
    "eigenvector_centrality_types": QuerySpec(
        q_eigenvector_centrality_types, _ORACLE_EIGEN, "X9 [EXT] eigenvector centrality"
    ),
    "decile_lift_table": QuerySpec(
        q_decile_lift_table, _ORACLE_LIFT, "X7/X8 [EXT] decile lift table"
    ),
    "kendall_w_concordance": QuerySpec(
        q_kendall_w_concordance, _ORACLE_KW, "X7 [EXT] Kendall's W"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_cohens_d_effect.__doc__ = q_cohens_d_effect.__doc__.format(a=_CD_A, b=_CD_B)  # noqa: E501
q_weighted_kappa_depth.__doc__ = q_weighted_kappa_depth.__doc__.format(e0=_DEPTH_EDGES[0], e1=_DEPTH_EDGES[1])  # noqa: E501
q_eigenvector_centrality_types.__doc__ = q_eigenvector_centrality_types.__doc__.format(it=_EC_ITERS)  # noqa: E501
q_decile_lift_table.__doc__ = q_decile_lift_table.__doc__.format(a=_CD_A, b=_CD_B)  # noqa: E501
