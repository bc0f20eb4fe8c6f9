"""Wave 113 [EXT]: collocation mining, comparative keyness, temporal
regularity, and concentration measurement — X6/X7 answers for corpus
characterization at curation time.

Scale notes (the 100x question, per query):
- collocation_llr_bigrams: bigrams come from a zip of each token array
  with its own tail (pure expression, linear, no positional self-join);
  unigram margins are two grouped frames equi-joined back on the word
  keys (shuffle-linear). Dunning's G2 is four integer-count cells with
  every ln() snapped micro; the k11 >= 5 support floor bounds the ranked
  frame and the top-K is ORDER BY + LIMIT (TakeOrdered), never a global
  window.
- keyness_log_odds: token counts for cohort A (one source) vs B (rest)
  reduce map-side; the informative-Dirichlet prior uses corpus-wide
  token frequency (one 1-row broadcast of totals). ln()s snap micro;
  z ranks on exact milli ints with token tie-break; top-K via LIMIT.
- temporal_entropy_profile: event counts reduce to the 24-cell
  hour-of-day and 7-cell weekday enum grids (constant at any scale);
  Shannon entropies with per-cell micro-snapped ln p terms.
- herfindahl_concentration: per-source doc/char shares on the ~20-row
  source frame; HHI / normalized HHI / effective source count from
  per-term micro-snapped squares.

Reference parity: none; [EXT] X6/X7 tier per BASELINE.json (the
reference's fixed-SQL dashboard surface, analytics__world_weather.py:15-36,
re-expressed as corpus-characterization statistics).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import QuerySpec, _t

_TOK = r"filter(split(lower(text), '\\s+'), t -> t <> '')"
_DUCK_TOK = r"list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')"

_HOUR_US = 3_600_000_000
_LLR_MIN_K11 = 5
_LLR_TOPK = 25
_KEY_SRC_A = "src0"
_KEY_MIN_CNT = 10
_KEY_TOPK = 20
_KEY_A0 = 100.0
_LN24 = repr(math.log(24.0))
_LN7 = repr(math.log(7.0))


# --------------------------------------------------------------------------
# Dunning log-likelihood bigram collocations (X6 [EXT])
# --------------------------------------------------------------------------


def q_collocation_llr_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6 top-{k} bigram collocations by Dunning's log-likelihood
    ratio G2 — the curation-time "which word pairs are glued together?"
    detector that, unlike raw PMI, does not explode on rare pairs.
    Bigrams come from zipping each token array with its own tail (pure
    expression, linear); margins are grouped unigram-position frames
    equi-joined back; G2 = 2 * sum_ij k_ij * ln(k_ij*N / (R_i*C_j)) over
    the 2x2 contingency cells, each ln micro-snapped, zero cells
    contributing zero. Support floor k11 >= {m}; deterministic order
    (g2 desc, bigram asc). Output: bigram, k11, g2_micro."""
    d = _t(spark, sf_dir, "documents")
    big = (
        d.select(F.expr(_TOK).alias("ts"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ts) - 1),"
                    " i -> struct(element_at(ts, i) as w1,"
                    "             element_at(ts, i + 1) as w2))"
                )
            ).alias("bg")
        )
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    pair = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("k11"))
    left = big.groupBy("w1").agg(F.count(F.lit(1)).cast("bigint").alias("r1"))
    right = big.groupBy("w2").agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    tot = big.agg(F.count(F.lit(1)).cast("bigint").alias("nn"))
    cells = (
        pair.filter(F.col("k11") >= _LLR_MIN_K11)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            "k11",
            (F.col("r1") - F.col("k11")).alias("k12"),
            (F.col("c1") - F.col("k11")).alias("k21"),
            (F.col("nn") - F.col("r1") - F.col("c1") + F.col("k11")).alias("k22"),
            "r1",
            "c1",
            "nn",
        )
    )
    term = (
        "case when {k} > 0 then cast({k} as double)"
        " * cast(floor(1e6 * ln((cast({k} as double) * cast(nn as double))"
        " / (cast({r} as double) * cast({c} as double))) + 0.5) as double)"
        " else 0.0 end"
    )
    g2 = (
        "cast(floor(2.0 * ("
        + " + ".join(
            [
                term.format(k="k11", r="r1", c="c1"),
                term.format(k="k12", r="r1", c="nn - c1"),
                term.format(k="k21", r="nn - r1", c="c1"),
                term.format(k="k22", r="nn - r1", c="nn - c1"),
            ]
        )
        + ") + 0.5) as bigint)"
    )
    return (
        cells.select("bigram", "k11", F.expr(g2).alias("g2_micro"))
        .orderBy(F.col("g2_micro").desc(), F.col("bigram").asc())
        .limit(_LLR_TOPK)
    )


def _llr_term(k: str, r: str, c: str) -> str:
    return (
        f"CASE WHEN {k} > 0 THEN cast({k} AS DOUBLE)"
        f" * cast(floor(1e6 * ln((cast({k} AS DOUBLE) * cast(nn AS DOUBLE))"
        f" / (cast({r} AS DOUBLE) * cast({c} AS DOUBLE))) + 0.5) AS DOUBLE)"
        " ELSE 0.0 END"
    )


_ORACLE_LLR = f"""
WITH toks AS (
  SELECT {_DUCK_TOK} AS ts FROM documents
),
big AS (
  SELECT u.bg['w1'] AS w1, u.bg['w2'] AS w2
  FROM toks, unnest(list_transform(range(1, len(ts)),
       i -> {{'w1': ts[i], 'w2': ts[i + 1]}})) u(bg)
),
pair AS (SELECT w1, w2, count(*)::BIGINT AS k11 FROM big GROUP BY w1, w2),
lft AS (SELECT w1, count(*)::BIGINT AS r1 FROM big GROUP BY w1),
rgt AS (SELECT w2, count(*)::BIGINT AS c1 FROM big GROUP BY w2),
tot AS (SELECT count(*)::BIGINT AS nn FROM big),
cells AS (
  SELECT pair.w1 || ' ' || pair.w2 AS bigram, k11,
         r1 - k11 AS k12, c1 - k11 AS k21, nn - r1 - c1 + k11 AS k22,
         r1, c1, nn
  FROM pair JOIN lft USING (w1) JOIN rgt USING (w2) CROSS JOIN tot
  WHERE k11 >= {_LLR_MIN_K11}
)
SELECT bigram, k11,
       cast(floor(2.0 * ({_llr_term("k11", "r1", "c1")}
            + {_llr_term("k12", "r1", "nn - c1")}
            + {_llr_term("k21", "nn - r1", "c1")}
            + {_llr_term("k22", "nn - r1", "nn - c1")}) + 0.5) AS BIGINT)
         AS g2_micro
FROM cells
ORDER BY g2_micro DESC, bigram ASC
LIMIT {_LLR_TOPK}
"""


# --------------------------------------------------------------------------
# Informative-Dirichlet log-odds keyness (X6 [EXT])
# --------------------------------------------------------------------------


def q_keyness_log_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6 comparative keyness: which tokens are OVER-represented in
    source '{a}' vs the rest of the corpus, scored with the informative-
    Dirichlet-prior log-odds z of Monroe et al. — the corpus-linguistics
    standard that shrinks rare-token noise (raw log-odds and chi2 rank
    hapaxes first). Prior alpha_w = A0 * corpus_freq_w; delta = the
    difference of the two smoothed log-odds (each ln micro-snapped);
    var = 1/(y_a + a_w) + 1/(y_b + a_w); z ranks on exact milli ints
    with token tie-break, support floor {m}. Output top {k}: token,
    cnt_a, cnt_b, z_milli."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        F.when(F.col("source") == _KEY_SRC_A, F.lit(1)).otherwise(F.lit(0)).alias(
            "ina"
        ),
        F.explode(F.expr(_TOK)).alias("token"),
    )
    cnt = tok.groupBy("token").agg(
        F.sum("ina").cast("bigint").alias("ya"),
        F.sum(F.lit(1) - F.col("ina")).cast("bigint").alias("yb"),
    )
    tot = cnt.agg(
        F.sum("ya").cast("bigint").alias("na"),
        F.sum("yb").cast("bigint").alias("nb"),
    )
    scored = (
        cnt.filter(F.col("ya") + F.col("yb") >= _KEY_MIN_CNT)
        .crossJoin(F.broadcast(tot))
        .select(
            "token",
            F.col("ya").alias("cnt_a"),
            F.col("yb").alias("cnt_b"),
            F.expr(
                f"""
                cast(floor(1e3 * ((
                    cast(floor(1e6 * ln(
                      (cast(ya as double) + {_KEY_A0} * (cast(ya + yb as double)
                         / cast(na + nb as double)))
                      / (cast(na as double) + {_KEY_A0} - cast(ya as double)
                         - {_KEY_A0} * (cast(ya + yb as double)
                            / cast(na + nb as double)))) + 0.5) as double)
                    - cast(floor(1e6 * ln(
                      (cast(yb as double) + {_KEY_A0} * (cast(ya + yb as double)
                         / cast(na + nb as double)))
                      / (cast(nb as double) + {_KEY_A0} - cast(yb as double)
                         - {_KEY_A0} * (cast(ya + yb as double)
                            / cast(na + nb as double)))) + 0.5) as double)
                  ) / 1e6)
                  / sqrt(1.0 / (cast(ya as double) + {_KEY_A0}
                           * (cast(ya + yb as double) / cast(na + nb as double)))
                        + 1.0 / (cast(yb as double) + {_KEY_A0}
                           * (cast(ya + yb as double) / cast(na + nb as double))))
                  + 0.5) as bigint)
                """
            ).alias("z_milli"),
        )
    )
    return scored.orderBy(
        F.abs(F.col("z_milli")).desc(), F.col("token").asc()
    ).limit(_KEY_TOPK)


_ORACLE_KEYNESS = f"""
WITH tok AS (
  SELECT CASE WHEN source = '{_KEY_SRC_A}' THEN 1 ELSE 0 END AS ina, t.token
  FROM documents, unnest({_DUCK_TOK}) t(token)
),
cnt AS (
  SELECT token, sum(ina)::BIGINT AS ya, sum(1 - ina)::BIGINT AS yb
  FROM tok GROUP BY token
),
tot AS (SELECT sum(ya)::BIGINT AS na, sum(yb)::BIGINT AS nb FROM cnt),
scored AS (
  SELECT token, ya AS cnt_a, yb AS cnt_b,
         cast(floor(1e3 * ((
             cast(floor(1e6 * ln(
               (cast(ya AS DOUBLE) + {_KEY_A0} * (cast(ya + yb AS DOUBLE)
                  / cast(na + nb AS DOUBLE)))
               / (cast(na AS DOUBLE) + {_KEY_A0} - cast(ya AS DOUBLE)
                  - {_KEY_A0} * (cast(ya + yb AS DOUBLE)
                     / cast(na + nb AS DOUBLE)))) + 0.5) AS DOUBLE)
             - cast(floor(1e6 * ln(
               (cast(yb AS DOUBLE) + {_KEY_A0} * (cast(ya + yb AS DOUBLE)
                  / cast(na + nb AS DOUBLE)))
               / (cast(nb AS DOUBLE) + {_KEY_A0} - cast(yb AS DOUBLE)
                  - {_KEY_A0} * (cast(ya + yb AS DOUBLE)
                     / cast(na + nb AS DOUBLE)))) + 0.5) AS DOUBLE)
           ) / 1e6)
           / sqrt(1.0 / (cast(ya AS DOUBLE) + {_KEY_A0}
                    * (cast(ya + yb AS DOUBLE) / cast(na + nb AS DOUBLE)))
                 + 1.0 / (cast(yb AS DOUBLE) + {_KEY_A0}
                    * (cast(ya + yb AS DOUBLE) / cast(na + nb AS DOUBLE))))
           + 0.5) AS BIGINT) AS z_milli
  FROM cnt, tot
  WHERE ya + yb >= {_KEY_MIN_CNT}
)
SELECT token, cnt_a, cnt_b, z_milli
FROM scored
ORDER BY abs(z_milli) DESC, token ASC
LIMIT {_KEY_TOPK}
"""


# --------------------------------------------------------------------------
# Temporal entropy profile over hour-of-day / weekday grids (X7 [EXT])
# --------------------------------------------------------------------------


def q_temporal_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Shannon entropy of event timing over the 24-cell
    hour-of-day and 7-cell weekday enum grids, normalized by ln(24) /
    ln(7) — "is this traffic organic (uniform-ish) or batch/bot-driven
    (spiked)?". Hours come from naive micros (no session-zone calendar
    math); counts reduce map-side to the constant grids; each -p*ln(p)
    term snaps micro before its bigint sum. Output one row: n_events,
    hour_entropy_norm_micro, weekday_entropy_norm_micro, spiky_flag
    (hour entropy < 0.95)."""
    e = _t(spark, sf_dir, "events")
    base = e.select(
        F.expr(f"(unix_micros(ts) div {_HOUR_US}) % 24").alias("hh"),
        F.expr(f"((unix_micros(ts) div {_HOUR_US}) div 24 + 4) % 7").alias("wd"),
    )
    term = (
        "cast(floor(-(cast(cnt as double) / cast(n as double))"
        " * cast(floor(1e6 * ln(cast(cnt as double) / cast(n as double)) + 0.5)"
        "        as double) / 1e6 * 1e6 + 0.5) as bigint)"
    )

    def ent(col: str):
        cells = base.groupBy(col).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        tot = cells.agg(F.sum("cnt").cast("bigint").alias("n"))
        return (
            cells.crossJoin(F.broadcast(tot))
            .select(F.col("n"), F.expr(term).alias("t"))
            .groupBy("n")
            .agg(F.sum("t").cast("bigint").alias("ent_micro"))
        )

    he = ent("hh").select(
        F.col("n").alias("n_events"),
        F.expr(
            f"cast(floor(1e6 * (cast(ent_micro as double) / 1e6) / {_LN24}"
            " + 0.5) as bigint)"
        ).alias("hour_entropy_norm_micro"),
    )
    we = ent("wd").select(
        F.col("n").alias("n_events2"),
        F.expr(
            f"cast(floor(1e6 * (cast(ent_micro as double) / 1e6) / {_LN7}"
            " + 0.5) as bigint)"
        ).alias("weekday_entropy_norm_micro"),
    )
    return (
        he.crossJoin(F.broadcast(we))
        .select(
            "n_events",
            "hour_entropy_norm_micro",
            "weekday_entropy_norm_micro",
            (F.col("hour_entropy_norm_micro") < F.lit(950_000)).alias("spiky_flag"),
        )
    )


_ORACLE_TEMPORAL = f"""
WITH base AS (
  SELECT (epoch_us(ts) // {_HOUR_US}) % 24 AS hh,
         ((epoch_us(ts) // {_HOUR_US}) // 24 + 4) % 7 AS wd
  FROM events
),
hcells AS (SELECT hh, count(*)::BIGINT AS cnt FROM base GROUP BY hh),
htot AS (SELECT sum(cnt)::BIGINT AS n FROM hcells),
hent AS (
  SELECT n, sum(cast(floor(-(cast(cnt AS DOUBLE) / cast(n AS DOUBLE))
         * cast(floor(1e6 * ln(cast(cnt AS DOUBLE) / cast(n AS DOUBLE)) + 0.5)
                AS DOUBLE) / 1e6 * 1e6 + 0.5) AS BIGINT))::BIGINT AS ent_micro
  FROM hcells, htot GROUP BY n
),
wcells AS (SELECT wd, count(*)::BIGINT AS cnt FROM base GROUP BY wd),
wtot AS (SELECT sum(cnt)::BIGINT AS n FROM wcells),
went AS (
  SELECT n, sum(cast(floor(-(cast(cnt AS DOUBLE) / cast(n AS DOUBLE))
         * cast(floor(1e6 * ln(cast(cnt AS DOUBLE) / cast(n AS DOUBLE)) + 0.5)
                AS DOUBLE) / 1e6 * 1e6 + 0.5) AS BIGINT))::BIGINT AS ent_micro
  FROM wcells, wtot GROUP BY n
)
SELECT hent.n AS n_events,
       cast(floor(1e6 * (cast(hent.ent_micro AS DOUBLE) / 1e6) / {_LN24}
            + 0.5) AS BIGINT) AS hour_entropy_norm_micro,
       cast(floor(1e6 * (cast(went.ent_micro AS DOUBLE) / 1e6) / {_LN7}
            + 0.5) AS BIGINT) AS weekday_entropy_norm_micro,
       cast(floor(1e6 * (cast(hent.ent_micro AS DOUBLE) / 1e6) / {_LN24}
            + 0.5) AS BIGINT) < 950000 AS spiky_flag
FROM hent, went
"""


# --------------------------------------------------------------------------
# Herfindahl-Hirschman concentration of the corpus (X6 [EXT])
# --------------------------------------------------------------------------


def q_herfindahl_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6 Herfindahl-Hirschman concentration of the corpus across
    sources, by document count AND by character volume — "is the corpus
    a monoculture?" in one number, with the normalized index and the
    effective source count (1/HHI). Shares live on the ~|sources|-row
    frame; each squared share snaps micro before the bigint sum. Output
    one row: n_sources, hhi_docs_micro, hhi_chars_micro,
    nhhi_docs_micro, effective_sources_milli."""
    d = _t(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.sum("n_chars").cast("bigint").alias("nc"),
    )
    tot = per.agg(
        F.sum("nd").cast("bigint").alias("td"),
        F.sum("nc").cast("bigint").alias("tc"),
        F.count(F.lit(1)).cast("bigint").alias("ns"),
    )
    sq = (
        "cast(floor(1e6 * (cast({x} as double) / cast({t} as double))"
        " * (cast({x} as double) / cast({t} as double)) + 0.5) as bigint)"
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "ns",
            F.expr(sq.format(x="nd", t="td")).alias("sd"),
            F.expr(sq.format(x="nc", t="tc")).alias("sc"),
        )
        .groupBy("ns")
        .agg(
            F.sum("sd").cast("bigint").alias("hhi_docs_micro"),
            F.sum("sc").cast("bigint").alias("hhi_chars_micro"),
        )
        .select(
            F.col("ns").alias("n_sources"),
            "hhi_docs_micro",
            "hhi_chars_micro",
            F.expr(
                "cast(floor(1e6 * ((cast(hhi_docs_micro as double) / 1e6"
                " - 1.0 / cast(ns as double))"
                " / (1.0 - 1.0 / cast(ns as double))) + 0.5) as bigint)"
            ).alias("nhhi_docs_micro"),
            F.expr(
                "cast(floor(1e3 / (cast(hhi_docs_micro as double) / 1e6) + 0.5)"
                " as bigint)"
            ).alias("effective_sources_milli"),
        )
    )


_ORACLE_HHI = """
WITH per AS (
  SELECT source, count(*)::BIGINT AS nd, sum(n_chars)::BIGINT AS nc
  FROM documents GROUP BY source
),
tot AS (SELECT sum(nd)::BIGINT AS td, sum(nc)::BIGINT AS tc,
               count(*)::BIGINT AS ns FROM per),
agg AS (
  SELECT ns,
         sum(cast(floor(1e6 * (cast(nd AS DOUBLE) / cast(td AS DOUBLE))
             * (cast(nd AS DOUBLE) / cast(td AS DOUBLE)) + 0.5)
             AS BIGINT))::BIGINT AS hhi_docs_micro,
         sum(cast(floor(1e6 * (cast(nc AS DOUBLE) / cast(tc AS DOUBLE))
             * (cast(nc AS DOUBLE) / cast(tc AS DOUBLE)) + 0.5)
             AS BIGINT))::BIGINT AS hhi_chars_micro
  FROM per, tot
  GROUP BY ns
)
SELECT ns AS n_sources, hhi_docs_micro, hhi_chars_micro,
       cast(floor(1e6 * ((cast(hhi_docs_micro AS DOUBLE) / 1e6
            - 1.0 / cast(ns AS DOUBLE))
            / (1.0 - 1.0 / cast(ns AS DOUBLE))) + 0.5) AS BIGINT)
         AS nhhi_docs_micro,
       cast(floor(1e3 / (cast(hhi_docs_micro AS DOUBLE) / 1e6) + 0.5)
         AS BIGINT) AS effective_sources_milli
FROM agg
"""


REGISTRY_EXT113: dict[str, QuerySpec] = {
    "collocation_llr_bigrams": QuerySpec(
        q_collocation_llr_bigrams, _ORACLE_LLR, "X6 [EXT] Dunning G2 collocations"
    ),
    "keyness_log_odds": QuerySpec(
        q_keyness_log_odds, _ORACLE_KEYNESS, "X6 [EXT] informative-Dirichlet keyness"
    ),
    "temporal_entropy_profile": QuerySpec(
        q_temporal_entropy_profile, _ORACLE_TEMPORAL, "X7 [EXT] temporal entropy"
    ),
    "herfindahl_concentration": QuerySpec(
        q_herfindahl_concentration, _ORACLE_HHI, "X6 [EXT] HHI concentration"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_collocation_llr_bigrams.__doc__ = q_collocation_llr_bigrams.__doc__.format(k=_LLR_TOPK, m=_LLR_MIN_K11)  # noqa: E501
q_keyness_log_odds.__doc__ = q_keyness_log_odds.__doc__.format(a=_KEY_SRC_A, m=_KEY_MIN_CNT, k=_KEY_TOPK)  # noqa: E501
