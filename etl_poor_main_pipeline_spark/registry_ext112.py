"""Wave 112 [EXT]: distribution-overlap drift, causal effect estimation,
readability scoring, and inequality decomposition — X6/X7 answers for
corpus curation and experiment telemetry.

Scale notes (the 100x question, per query):
- hellinger_drift_2samp: both samples reduce map-side to CENTI VALUE
  CELLS (bounded by the value domain, not the corpus); sqrt is IEEE
  correctly-rounded on both engines and every per-cell term snaps to the
  micro grid before the bigint sum, so the statistic is exact at any
  corpus size. No windows at all.
- did_effect_estimator: one conditional aggregate over the filtered
  events scan — four (group x period) cells of decimal-staged sums; the
  DiD contrast is integer arithmetic on micro-snapped cell means. The
  cheapest possible shape: scan -> map-side partials -> 4-cell reduce.
- flesch_reading_ease: pure-expression per-document token/sentence/
  vowel-group counts (regexp over the text column, linear in corpus
  bytes, JVM-codegen) reduced to per-source bigint sums; the score is
  two double divisions on exact integers, milli-snapped.
- theil_index_decomposition: doc lengths reduce to (source, n_chars)
  VALUE CELLS; per-source totals come from a window PARTITIONED by
  source (parallelism scales with sources); ln() snaps to the micro grid
  immediately (JVM/libm last-ulp rule) and every term is snapped before
  its bigint sum, so between + within == total exactly by construction.

Reference parity: none; [EXT] X6/X7 tier per BASELINE.json. The reference
ships fixed-SQL dashboards over weather facts
(analytics__world_weather.py:15-36); these are the curation-statistics
tier of that surface re-expressed for the driver corpus.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import QuerySpec, _t

_HD_A, _HD_B = "click", "purchase"
_DID_TREAT, _DID_CTRL = "click", "view"
# naive micros for 2024-01-16 00:00:00 (events ts is TIMESTAMP_NTZ micros)
_DID_CUT_US = int(
    (datetime(2024, 1, 16) - datetime(1970, 1, 1)).total_seconds() * 1_000_000
)


# --------------------------------------------------------------------------
# Hellinger / Bhattacharyya two-sample drift (X7 [EXT])
# --------------------------------------------------------------------------


def q_hellinger_drift_2samp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Hellinger distance and Bhattacharyya coefficient between
    the value distributions of '{a}' and '{b}' events — the bounded
    [0,1] overlap companion of the shipped KS/CvM drift tests (Hellinger
    is a true metric; 0 = identical, 1 = disjoint supports). Values
    reduce to centi cells; BC = sum_j sqrt(p_j * q_j) with each term
    micro-snapped (sqrt is correctly-rounded IEEE on both engines, so
    the snap only fixes SUM order), H = sqrt(1 - BC). Output one row:
    n_a, n_b, n_cells, bc_micro, hellinger_micro, bhat_dist_micro
    (-ln BC, micro-snapped)."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type").isin(_HD_A, _HD_B))
    cells = (
        e.select(
            F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
            .cast("bigint")
            .alias("vc"),
            F.when(F.col("event_type") == _HD_A, F.lit(1))
            .otherwise(F.lit(0))
            .alias("isa"),
        )
        .groupBy("vc")
        .agg(
            F.sum("isa").cast("bigint").alias("ca"),
            F.sum(F.lit(1) - F.col("isa")).cast("bigint").alias("cb"),
        )
    )
    tot = cells.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
        F.count(F.lit(1)).cast("bigint").alias("ncells"),
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "na",
            "nb",
            "ncells",
            F.expr(
                "cast(floor(1e6 * sqrt((cast(ca as double) * cast(cb as double))"
                " / (cast(na as double) * cast(nb as double))) + 0.5) as bigint)"
            ).alias("term"),
        )
        .groupBy("na", "nb", "ncells")
        .agg(F.sum("term").cast("bigint").alias("bc_micro"))
        .select(
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            F.col("ncells").alias("n_cells"),
            "bc_micro",
            F.expr(
                "cast(floor(1e6 * sqrt(greatest(0.0,"
                " 1.0 - cast(bc_micro as double) / 1e6)) + 0.5) as bigint)"
            ).alias("hellinger_micro"),
            F.expr(
                "cast(floor(1e6 * -ln(greatest(1e-12,"
                " cast(bc_micro as double) / 1e6)) + 0.5) as bigint)"
            ).alias("bhat_dist_micro"),
        )
    )


_ORACLE_HELLINGER = f"""
WITH cells AS (
  SELECT cast(floor(value * 100.0 + 0.5) AS BIGINT) AS vc,
         sum(CASE WHEN event_type = '{_HD_A}' THEN 1 ELSE 0 END)::BIGINT AS ca,
         sum(CASE WHEN event_type = '{_HD_B}' THEN 1 ELSE 0 END)::BIGINT AS cb
  FROM events WHERE event_type IN ('{_HD_A}', '{_HD_B}')
  GROUP BY 1
),
tot AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb,
               count(*)::BIGINT AS ncells FROM cells),
bc AS (
  SELECT na, nb, ncells,
         sum(cast(floor(1e6 * sqrt((cast(ca AS DOUBLE) * cast(cb AS DOUBLE))
               / (cast(na AS DOUBLE) * cast(nb AS DOUBLE))) + 0.5)
             AS BIGINT))::BIGINT AS bc_micro
  FROM cells, tot
  GROUP BY na, nb, ncells
)
SELECT na AS n_a, nb AS n_b, ncells AS n_cells, bc_micro,
       cast(floor(1e6 * sqrt(greatest(0.0,
            1.0 - cast(bc_micro AS DOUBLE) / 1e6)) + 0.5) AS BIGINT)
         AS hellinger_micro,
       cast(floor(1e6 * -ln(greatest(1e-12,
            cast(bc_micro AS DOUBLE) / 1e6)) + 0.5) AS BIGINT)
         AS bhat_dist_micro
FROM bc
"""


# --------------------------------------------------------------------------
# Difference-in-differences effect estimator (X7 [EXT])
# --------------------------------------------------------------------------


def q_did_effect_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 difference-in-differences: the causal-effect workhorse for
    "did the launch move the treated metric BEYOND the secular trend?".
    Treated = '{t}' events, control = '{c}' events, cutover at
    2024-01-16 (naive micros, so no session-zone calendar math). One
    conditional aggregate produces the four (group x period) cells of
    decimal-staged value sums; cell means snap to the micro grid and
    DiD = (treat_post - treat_pre) - (ctrl_post - ctrl_pre) is then
    EXACT integer arithmetic. Output one row: the four cell counts, the
    four micro means, did_micro."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_DID_TREAT, _DID_CTRL)
    )
    cell = e.select(
        F.when(F.col("event_type") == _DID_TREAT, F.lit(1))
        .otherwise(F.lit(0))
        .alias("tr"),
        F.expr(f"case when unix_micros(ts) >= {_DID_CUT_US} then 1 else 0 end").alias(
            "post"
        ),
        F.col("value"),
    )

    def _cnt(tr: int, post: int, name: str):
        return F.sum(
            F.when((F.col("tr") == tr) & (F.col("post") == post), 1).otherwise(0)
        ).cast("bigint").alias(name)

    def _mean(tr: int, post: int, name: str):
        return F.expr(
            "cast(floor(1e6 * cast(sum(case when tr = {tr} and post = {p}"
            " then cast(value as decimal(18,6)) end) as double)"
            " / sum(case when tr = {tr} and post = {p} then 1 else 0 end)"
            " + 0.5) as bigint)".format(tr=tr, p=post)
        ).alias(name)

    return (
        cell.agg(
            _cnt(1, 0, "n_treat_pre"),
            _cnt(1, 1, "n_treat_post"),
            _cnt(0, 0, "n_ctrl_pre"),
            _cnt(0, 1, "n_ctrl_post"),
            _mean(1, 0, "m_treat_pre_micro"),
            _mean(1, 1, "m_treat_post_micro"),
            _mean(0, 0, "m_ctrl_pre_micro"),
            _mean(0, 1, "m_ctrl_post_micro"),
        )
        .select(
            "*",
            (
                (F.col("m_treat_post_micro") - F.col("m_treat_pre_micro"))
                - (F.col("m_ctrl_post_micro") - F.col("m_ctrl_pre_micro"))
            )
            .cast("bigint")
            .alias("did_micro"),
        )
    )


_ORACLE_DID = f"""
WITH cell AS (
  SELECT CASE WHEN event_type = '{_DID_TREAT}' THEN 1 ELSE 0 END AS tr,
         CASE WHEN epoch_us(ts) >= {_DID_CUT_US} THEN 1 ELSE 0 END AS post,
         value
  FROM events WHERE event_type IN ('{_DID_TREAT}', '{_DID_CTRL}')
),
agg AS (
  SELECT
    sum(CASE WHEN tr = 1 AND post = 0 THEN 1 ELSE 0 END)::BIGINT AS n_treat_pre,
    sum(CASE WHEN tr = 1 AND post = 1 THEN 1 ELSE 0 END)::BIGINT AS n_treat_post,
    sum(CASE WHEN tr = 0 AND post = 0 THEN 1 ELSE 0 END)::BIGINT AS n_ctrl_pre,
    sum(CASE WHEN tr = 0 AND post = 1 THEN 1 ELSE 0 END)::BIGINT AS n_ctrl_post,
    cast(floor(1e6 * cast(sum(CASE WHEN tr = 1 AND post = 0
             THEN cast(value AS DECIMAL(18,6)) END) AS DOUBLE)
         / sum(CASE WHEN tr = 1 AND post = 0 THEN 1 ELSE 0 END) + 0.5)
       AS BIGINT) AS m_treat_pre_micro,
    cast(floor(1e6 * cast(sum(CASE WHEN tr = 1 AND post = 1
             THEN cast(value AS DECIMAL(18,6)) END) AS DOUBLE)
         / sum(CASE WHEN tr = 1 AND post = 1 THEN 1 ELSE 0 END) + 0.5)
       AS BIGINT) AS m_treat_post_micro,
    cast(floor(1e6 * cast(sum(CASE WHEN tr = 0 AND post = 0
             THEN cast(value AS DECIMAL(18,6)) END) AS DOUBLE)
         / sum(CASE WHEN tr = 0 AND post = 0 THEN 1 ELSE 0 END) + 0.5)
       AS BIGINT) AS m_ctrl_pre_micro,
    cast(floor(1e6 * cast(sum(CASE WHEN tr = 0 AND post = 1
             THEN cast(value AS DECIMAL(18,6)) END) AS DOUBLE)
         / sum(CASE WHEN tr = 0 AND post = 1 THEN 1 ELSE 0 END) + 0.5)
       AS BIGINT) AS m_ctrl_post_micro
  FROM cell
)
SELECT *,
       ((m_treat_post_micro - m_treat_pre_micro)
        - (m_ctrl_post_micro - m_ctrl_pre_micro))::BIGINT AS did_micro
FROM agg
"""


# --------------------------------------------------------------------------
# Flesch reading ease per source (X6 [EXT])
# --------------------------------------------------------------------------


def q_flesch_reading_ease(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6 Flesch reading ease per source: FRE = 206.835 -
    1.015*(words/sentences) - 84.6*(syllables/words), the curation
    pipeline's classic "is this prose or word salad?" readability gate.
    Words are whitespace tokens, sentences are [.!?]+ runs (min 1 per
    doc), syllables are approximated by [aeiouy]+ vowel groups — all
    pure-expression regexp counts, linear in corpus bytes. Per-source
    sums are exact bigints; the score is two double divisions on those
    integers, milli-snapped. Output per source: source, n_docs, n_words,
    n_sentences, n_syllables, fre_milli."""
    d = _t(spark, sf_dir, "documents")
    per_doc = d.select(
        "source",
        F.expr("size(filter(split(text, '\\\\s+'), t -> t <> ''))").alias("w"),
        F.expr("greatest(1, size(regexp_extract_all(text, '[.!?]+', 0)))").alias("s"),
        F.expr("size(regexp_extract_all(lower(text), '[aeiouy]+', 0))").alias("y"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("w").cast("bigint").alias("n_words"),
            F.sum("s").cast("bigint").alias("n_sentences"),
            F.sum("y").cast("bigint").alias("n_syllables"),
        )
        .select(
            "source",
            "n_docs",
            "n_words",
            "n_sentences",
            "n_syllables",
            F.expr(
                "cast(floor(1e3 * (206.835"
                " - 1.015 * (cast(n_words as double) / cast(n_sentences as double))"
                " - 84.6 * (cast(n_syllables as double)"
                "           / cast(greatest(1, n_words) as double))) + 0.5) as bigint)"
            ).alias("fre_milli"),
        )
    )


_ORACLE_FLESCH = r"""
WITH per_doc AS (
  SELECT source,
         len(list_filter(string_split_regex(text, '\s+'), t -> t <> ''))
           ::BIGINT AS w,
         greatest(1, len(regexp_extract_all(text, '[.!?]+', 0)))::BIGINT AS s,
         len(regexp_extract_all(lower(text), '[aeiouy]+', 0))::BIGINT AS y
  FROM documents
),
agg AS (
  SELECT source, count(*)::BIGINT AS n_docs, sum(w)::BIGINT AS n_words,
         sum(s)::BIGINT AS n_sentences, sum(y)::BIGINT AS n_syllables
  FROM per_doc GROUP BY source
)
SELECT source, n_docs, n_words, n_sentences, n_syllables,
       cast(floor(1e3 * (206.835
            - 1.015 * (cast(n_words AS DOUBLE) / cast(n_sentences AS DOUBLE))
            - 84.6 * (cast(n_syllables AS DOUBLE)
                      / cast(greatest(1, n_words) AS DOUBLE))) + 0.5)
         AS BIGINT) AS fre_milli
FROM agg
"""


# --------------------------------------------------------------------------
# Theil T inequality decomposition of document lengths (X6 [EXT])
# --------------------------------------------------------------------------


def q_theil_index_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6 Theil T index of document-length inequality, exactly
    decomposed into BETWEEN-source and WITHIN-source components — "is
    corpus length skew a few giant sources, or giants inside every
    source?", the additive-decomposability property Gini lacks. Lengths
    reduce to (source, n_chars) value cells; per-source totals come from
    a window PARTITIONED by source; every ln() snaps to the micro grid
    immediately and every term snaps before its bigint sum, so
    total = between + within EXACTLY by construction. Output one row:
    n_docs, n_sources, theil_between_micro, theil_within_micro,
    theil_total_micro."""
    d = _t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    cells = (
        d.groupBy("source", F.col("n_chars").alias("x"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    wsrc = Window.partitionBy("source")
    with_tot = cells.select(
        "source",
        "x",
        "cnt",
        F.sum("cnt").over(wsrc).cast("bigint").alias("n_g"),
        F.sum(F.col("cnt") * F.col("x")).over(wsrc).cast("bigint").alias("sum_g"),
    )
    per_src = (
        with_tot.select(
            "source",
            "n_g",
            "sum_g",
            F.expr(
                "cast(floor(cast(floor(1e6 * ln((cast(x as double)"
                " * cast(n_g as double)) / cast(sum_g as double)) + 0.5) as double)"
                " * ((cast(cnt as double) * cast(x as double))"
                "    / cast(sum_g as double)) + 0.5) as bigint)"
            ).alias("term"),
        )
        .groupBy("source", "n_g", "sum_g")
        .agg(F.sum("term").cast("bigint").alias("t_g_micro"))
    )
    glob = per_src.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("sum_g").cast("bigint").alias("sumx"),
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
    )
    return (
        per_src.crossJoin(F.broadcast(glob))
        .select(
            "n",
            "sumx",
            "n_sources",
            F.expr(
                "cast(floor(cast(floor(1e6 * ln((cast(sum_g as double)"
                " * cast(n as double)) / (cast(sumx as double)"
                " * cast(n_g as double))) + 0.5) as double)"
                " * (cast(sum_g as double) / cast(sumx as double)) + 0.5) as bigint)"
            ).alias("tb_term"),
            F.expr(
                "cast(floor(cast(t_g_micro as double)"
                " * (cast(sum_g as double) / cast(sumx as double)) + 0.5) as bigint)"
            ).alias("tw_term"),
        )
        .groupBy("n", "sumx", "n_sources")
        .agg(
            F.sum("tb_term").cast("bigint").alias("theil_between_micro"),
            F.sum("tw_term").cast("bigint").alias("theil_within_micro"),
        )
        .select(
            F.col("n").alias("n_docs"),
            "n_sources",
            "theil_between_micro",
            "theil_within_micro",
            (F.col("theil_between_micro") + F.col("theil_within_micro"))
            .cast("bigint")
            .alias("theil_total_micro"),
        )
    )


_ORACLE_THEIL = """
WITH cells AS (
  SELECT source, n_chars AS x, count(*)::BIGINT AS cnt
  FROM documents WHERE n_chars > 0
  GROUP BY source, n_chars
),
with_tot AS (
  SELECT source, x, cnt,
         sum(cnt) OVER (PARTITION BY source)::BIGINT AS n_g,
         sum(cnt * x) OVER (PARTITION BY source)::BIGINT AS sum_g
  FROM cells
),
per_src AS (
  SELECT source, n_g, sum_g,
         sum(cast(floor(cast(floor(1e6 * ln((cast(x AS DOUBLE)
               * cast(n_g AS DOUBLE)) / cast(sum_g AS DOUBLE)) + 0.5) AS DOUBLE)
             * ((cast(cnt AS DOUBLE) * cast(x AS DOUBLE))
                / cast(sum_g AS DOUBLE)) + 0.5) AS BIGINT))::BIGINT AS t_g_micro
  FROM with_tot
  GROUP BY source, n_g, sum_g
),
gtot AS (
  SELECT sum(n_g)::BIGINT AS n, sum(sum_g)::BIGINT AS sumx,
         count(*)::BIGINT AS n_sources
  FROM per_src
),
terms AS (
  SELECT n, sumx, n_sources,
         cast(floor(cast(floor(1e6 * ln((cast(sum_g AS DOUBLE)
               * cast(n AS DOUBLE)) / (cast(sumx AS DOUBLE)
               * cast(n_g AS DOUBLE))) + 0.5) AS DOUBLE)
             * (cast(sum_g AS DOUBLE) / cast(sumx AS DOUBLE)) + 0.5)
           AS BIGINT) AS tb_term,
         cast(floor(cast(t_g_micro AS DOUBLE)
             * (cast(sum_g AS DOUBLE) / cast(sumx AS DOUBLE)) + 0.5)
           AS BIGINT) AS tw_term
  FROM per_src, gtot
),
agg AS (
  SELECT n, sumx, n_sources,
         sum(tb_term)::BIGINT AS theil_between_micro,
         sum(tw_term)::BIGINT AS theil_within_micro
  FROM terms
  GROUP BY n, sumx, n_sources
)
SELECT n AS n_docs, n_sources, theil_between_micro, theil_within_micro,
       (theil_between_micro + theil_within_micro)::BIGINT AS theil_total_micro
FROM agg
"""


REGISTRY_EXT112: dict[str, QuerySpec] = {
    "hellinger_drift_2samp": QuerySpec(
        q_hellinger_drift_2samp, _ORACLE_HELLINGER, "X7 [EXT] Hellinger drift"
    ),
    "did_effect_estimator": QuerySpec(
        q_did_effect_estimator, _ORACLE_DID, "X7 [EXT] difference-in-differences"
    ),
    "flesch_reading_ease": QuerySpec(
        q_flesch_reading_ease, _ORACLE_FLESCH, "X6 [EXT] Flesch readability"
    ),
    "theil_index_decomposition": QuerySpec(
        q_theil_index_decomposition, _ORACLE_THEIL, "X6 [EXT] Theil decomposition"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_hellinger_drift_2samp.__doc__ = q_hellinger_drift_2samp.__doc__.format(a=_HD_A, b=_HD_B)  # noqa: E501
q_did_effect_estimator.__doc__ = q_did_effect_estimator.__doc__.format(t=_DID_TREAT, c=_DID_CTRL)  # noqa: E501
