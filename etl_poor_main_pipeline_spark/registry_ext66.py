"""Operator registry, wave 67: target-mix rebalancing, per-key rate
caps, and Cohen's kappa.

Scale stances:
- Mix rebalance: the curation-planning solver — per-lang acceptance
  rates that reshape the corpus toward a literal target mix; frames
  are language-bounded, rates are exact cross-multiplied ratios.
- Rate cap: keep at most K rows per (user, hour) via rank windows
  PARTITIONED by the cap key — the ingestion guardrail against
  runaway emitters; reporting is one aggregate.
- Kappa: chance-corrected agreement between the lang-id heuristic and
  the labels, computed from the |langs|^2-bounded confusion cells
  with exact-int po/pe numerators over a common denominator.

Reference parity: none; [EXT] X6/X7/X8 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import QuerySpec, _oracle_lang_id, _t, q_lang_id

# --------------------------------------------------------------------------
# Target-mix rebalancing plan (X8 [EXT])
# --------------------------------------------------------------------------

# target language shares in ppm (sums to 1e6): flatten en dominance
_MIX_TARGET_PPM = {"en": 300_000, "es": 200_000, "de": 200_000, "fr": 200_000, "zh": 100_000}


def q_target_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X8 corpus-mix rebalancing plan: given a literal target
    language mix (ppm), compute each lang's downsampling acceptance
    rate so the rebalanced corpus hits the target proportions — the
    plan a mixture builder executes with the deterministic-hash
    sampler (sample_deterministic_hash). The binding lang is the one
    whose full supply is exhausted first; rates are exact
    cross-multiplied integer ratios (floor to micro), and expected
    kept counts come from the same integers."""
    d = _t(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n_have"))
    tgt = ", ".join(
        f"named_struct('lang', '{k}', 'ppm', {v}L)" for k, v in _MIX_TARGET_PPM.items()
    )
    targets = d.sparkSession.range(1).selectExpr(
        f"explode(array({tgt})) as t"
    ).select(F.col("t.lang").alias("lang"), F.col("t.ppm").alias("tgt_ppm"))
    j = counts.join(F.broadcast(targets), "lang")
    # scale bounded by the binding lang: S = min over langs of n_have/share
    # (kept_l = S * share_l <= n_have_l). Work in exact integers:
    # S_micro = min(n_have * 1e12 / tgt_ppm) (micro-docs of total output)
    s_micro = j.agg(
        F.min(
            F.floor(F.col("n_have") * F.lit(1_000_000_000_000) / F.col("tgt_ppm"))
        ).alias("s_micro")
    )
    return (
        j.crossJoin(F.broadcast(s_micro))
        .select(
            "lang",
            "n_have",
            "tgt_ppm",
            F.floor(F.col("s_micro") * F.col("tgt_ppm") / F.lit(1_000_000_000_000))
            .cast("bigint")
            .alias("n_keep"),
            F.floor(
                F.lit(1e6)
                * F.floor(F.col("s_micro") * F.col("tgt_ppm") / F.lit(1_000_000_000_000))
                / F.col("n_have")
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("accept_rate_micro"),
        )
        .orderBy("lang")
    )


def _oracle_mix() -> str:
    rows = ", ".join(f"('{k}', {v})" for k, v in _MIX_TARGET_PPM.items())
    return f"""
WITH counts AS (
  SELECT lang, count(*)::BIGINT AS n_have FROM documents GROUP BY 1
),
targets(lang, tgt_ppm) AS (VALUES {rows}),
j AS (
  SELECT c.lang, c.n_have, cast(t.tgt_ppm AS bigint) AS tgt_ppm
  FROM counts c JOIN targets t USING (lang)
),
s AS (
  SELECT min(cast(floor(n_have * 1000000000000 / tgt_ppm) AS bigint)) AS s_micro
  FROM j
)
SELECT lang, n_have, tgt_ppm,
       cast(floor(s.s_micro * tgt_ppm / 1000000000000) AS bigint) AS n_keep,
       cast(floor(1e6 * floor(s.s_micro * tgt_ppm / 1000000000000) / n_have + 0.5)
            AS bigint) AS accept_rate_micro
FROM j CROSS JOIN s ORDER BY lang
"""


# --------------------------------------------------------------------------
# Per-key hourly rate cap (X7/X10 [EXT])
# --------------------------------------------------------------------------

_RATE_CAP = 3


def q_rate_cap_per_key_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7/X10 ingestion rate cap: at most {k} events per
    (user, hour); excess rows (by (ts, event_id) order) are shed — the
    guardrail against runaway emitters that would skew every
    downstream aggregate. The cap is a rank window PARTITIONED by the
    cap key; reporting per event_type: kept, shed, and the worst
    single-key hourly burst."""
    w = Window.partitionBy("user_id", "hb").orderBy("t_us", "event_id")
    e = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            F.date_trunc("hour", "ts").alias("hb"),
            F.unix_micros("ts").alias("t_us"),
            "event_id",
        )
        .withColumn("rk", F.row_number().over(w))
    )
    burst = e.groupBy("user_id", "hb").agg(F.max("rk").alias("burst"))
    worst = burst.agg(F.max("burst").cast("bigint").alias("max_burst"))
    return (
        e.groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("rk") <= _RATE_CAP, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(F.when(F.col("rk") > _RATE_CAP, 1).otherwise(0))
            .cast("bigint")
            .alias("n_shed"),
        )
        .crossJoin(F.broadcast(worst))
        .orderBy("event_type")
    )


_ORACLE_RATE_CAP = f"""
WITH e AS (
  SELECT user_id, event_type, date_trunc('hour', ts) AS hb,
         epoch_us(ts) AS t_us, event_id,
         row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY epoch_us(ts), event_id) AS rk
  FROM events
),
worst AS (SELECT max(rk)::BIGINT AS max_burst FROM e)
SELECT event_type,
       sum(CASE WHEN rk <= {_RATE_CAP} THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       sum(CASE WHEN rk > {_RATE_CAP} THEN 1 ELSE 0 END)::BIGINT AS n_shed,
       (SELECT max_burst FROM worst) AS max_burst
FROM e GROUP BY 1 ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Cohen's kappa (X6/X7 [EXT])
# --------------------------------------------------------------------------


def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6/X7 Cohen's kappa between the lang-id heuristic and the
    labeled lang — the chance-corrected agreement a classifier must
    clear before it becomes a routing key (raw accuracy flatters
    imbalanced labels). po and pe ride exact-int numerators over the
    common N^2 denominator from the |langs|^2-bounded confusion
    cells; one division to a micro at the end."""
    pred = q_lang_id(spark, sf_dir).select(
        F.col("lang").alias("t"), F.col("lang_detected").alias("p")
    )
    cells = pred.groupBy("t", "p").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    nn = cells.agg(F.sum("n").cast("bigint").alias("n_tot"))
    diag = cells.where(F.col("t") == F.col("p")).agg(
        F.sum("n").cast("bigint").alias("agree")
    )
    rows_t = cells.groupBy("t").agg(F.sum("n").alias("nr"))
    cols_p = cells.groupBy("p").agg(F.sum("n").alias("nc"))
    pe_num = (
        rows_t.join(cols_p, rows_t.t == cols_p.p)
        .agg(F.sum(F.col("nr") * F.col("nc")).cast("bigint").alias("pe_num"))
    )
    return (
        nn.crossJoin(diag)
        .crossJoin(pe_num)
        .select(
            F.col("n_tot"),
            F.col("agree"),
            # kappa = (po - pe) / (1 - pe) with po = agree/N, pe = pe_num/N^2
            # => (agree*N - pe_num) / (N^2 - pe_num), exact integers
            F.floor(
                F.lit(1e6)
                * (F.col("agree") * F.col("n_tot") - F.col("pe_num")).cast("double")
                / (F.col("n_tot") * F.col("n_tot") - F.col("pe_num")).cast("double")
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("kappa_micro"),
        )
    )


_ORACLE_KAPPA = f"""
WITH pred AS ({_oracle_lang_id()}),
cells AS (
  SELECT lang AS t, lang_detected AS p, count(*)::BIGINT AS n
  FROM pred GROUP BY 1, 2
),
nn AS (SELECT sum(n)::BIGINT AS n_tot FROM cells),
diag AS (SELECT coalesce(sum(n), 0)::BIGINT AS agree FROM cells WHERE t = p),
rows_t AS (SELECT t, sum(n)::BIGINT AS nr FROM cells GROUP BY 1),
cols_p AS (SELECT p, sum(n)::BIGINT AS nc FROM cells GROUP BY 1),
pe AS (
  SELECT sum(r.nr * c.nc)::BIGINT AS pe_num
  FROM rows_t r JOIN cols_p c ON r.t = c.p
)
SELECT nn.n_tot, diag.agree,
       cast(floor(1e6 * cast(diag.agree * nn.n_tot - pe.pe_num AS double)
                  / cast(nn.n_tot * nn.n_tot - pe.pe_num AS double) + 0.5)
            AS bigint) AS kappa_micro
FROM nn CROSS JOIN diag CROSS JOIN pe
"""


REGISTRY_EXT66: dict[str, QuerySpec] = {
    "target_mix_rebalance": QuerySpec(
        q_target_mix_rebalance, _oracle_mix(), "X8 [EXT] mixture planning"
    ),
    "rate_cap_per_key_hour": QuerySpec(
        q_rate_cap_per_key_hour, _ORACLE_RATE_CAP, "X7/X10 [EXT] ingestion guardrail"
    ),
    "cohens_kappa": QuerySpec(
        q_cohens_kappa, _ORACLE_KAPPA, "X6/X7 [EXT] chance-corrected agreement"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_rate_cap_per_key_hour.__doc__ = q_rate_cap_per_key_hour.__doc__.format(k=_RATE_CAP)  # noqa: E501
