"""Wave 119 [EXT]: two readability completers (Gunning fog, ARI), Yule's K
vocabulary concentration, and first-passage conversion timing.

Scale notes (the 100x question, per query):
- gunning_fog_index / ari_readability: pure-expression regexp counts per
  document (no explode for fog/ARI — the complex-word filter runs inside
  a higher-order lambda on the split array), then exact-bigint per-source
  sums; linear in corpus bytes, one groupBy shuffle on the source enum.
- yule_k_concentration: tokens explode map-side to (lang, token) counts
  (one shuffle on the token key, same shape as the shipped tf-idf), then
  the frequency-spectrum moments N = sum c and S2 = sum c^2 reduce per
  lang — K needs no per-type output, so the token-domain cardinality
  never leaves the aggregate.
- first_passage_purchase: the corpus reduces map-side to one row per
  USER (first event day / first purchase day), then to ONE row per
  cohort — conversion rate and mean time-to-convert are keyless-style
  sums over that user frame. No window anywhere.

Reference parity: none; [EXT] X6/X9 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import QuerySpec, _t

_DAY_US = 86_400_000_000
_FP_EVENT = "purchase"


# --------------------------------------------------------------------------
# Gunning fog index per source (X6 [EXT])
# --------------------------------------------------------------------------


def q_gunning_fog_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6 Gunning fog index per source: FOG = 0.4 * (words/sentences
    + 100 * complex/words) — the years-of-schooling readability gate that
    complements the shipped flesch_reading_ease (same token/sentence/
    vowel-group conventions; a 'complex' word has >= 3 vowel groups).
    The complex-word count runs INSIDE a higher-order filter on the split
    array (no explode); per-source sums are exact bigints and the score
    is two double divisions, milli-snapped. Output per source: source,
    n_docs, n_words, n_complex, fog_milli."""
    d = _t(spark, sf_dir, "documents")
    per_doc = d.select(
        "source",
        F.expr("size(filter(split(text, '\\\\s+'), t -> t <> ''))").alias("w"),
        F.expr("greatest(1, size(regexp_extract_all(text, '[.!?]+', 0)))").alias("s"),
        F.expr(
            "size(filter(split(lower(text), '\\\\s+'),"
            " t -> size(regexp_extract_all(t, '[aeiouy]+', 0)) >= 3))"
        ).alias("cx"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("w").cast("bigint").alias("n_words"),
            F.sum("s").cast("bigint").alias("n_sentences"),
            F.sum("cx").cast("bigint").alias("n_complex"),
        )
        .select(
            "source",
            "n_docs",
            "n_words",
            "n_complex",
            F.expr(
                "cast(floor(1e3 * 0.4 * ("
                "  cast(n_words as double) / cast(n_sentences as double)"
                "  + 100.0 * cast(n_complex as double)"
                "    / cast(greatest(1, n_words) as double)) + 0.5) as bigint)"
            ).alias("fog_milli"),
        )
    )


_ORACLE_FOG = r"""
WITH per_doc AS (
  SELECT source,
         len(list_filter(regexp_split_to_array(text, '\s+'),
             t -> t <> '')) AS w,
         greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS s,
         len(list_filter(regexp_split_to_array(lower(text), '\s+'),
             t -> len(regexp_extract_all(t, '[aeiouy]+')) >= 3)) AS cx
  FROM documents
)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(w)::BIGINT AS n_words,
       sum(cx)::BIGINT AS n_complex,
       cast(floor(1e3 * 0.4 * (
         cast(sum(w) AS DOUBLE) / cast(sum(s) AS DOUBLE)
         + 100.0 * cast(sum(cx) AS DOUBLE)
           / cast(greatest(1, sum(w)) AS DOUBLE)) + 0.5) AS BIGINT)
         AS fog_milli
FROM per_doc GROUP BY source
"""


# --------------------------------------------------------------------------
# Automated readability index per source (X6 [EXT])
# --------------------------------------------------------------------------


def q_ari_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6 Automated Readability Index per source: ARI =
    4.71*(chars/words) + 0.5*(words/sentences) - 21.43, with chars =
    alphanumeric characters only — the readability member that needs NO
    syllable heuristic (it was designed for mechanical typewriter
    counting), so it cross-checks the vowel-group-based Flesch/fog
    scores. Pure-expression counts, exact-bigint per-source sums,
    milli-snapped score. Output per source: source, n_docs, n_chars_an,
    n_words, ari_milli."""
    d = _t(spark, sf_dir, "documents")
    per_doc = d.select(
        "source",
        F.expr("length(regexp_replace(text, '[^A-Za-z0-9]', ''))").alias("c"),
        F.expr("size(filter(split(text, '\\\\s+'), t -> t <> ''))").alias("w"),
        F.expr("greatest(1, size(regexp_extract_all(text, '[.!?]+', 0)))").alias("s"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("c").cast("bigint").alias("n_chars_an"),
            F.sum("w").cast("bigint").alias("n_words"),
            F.sum("s").cast("bigint").alias("n_sentences"),
        )
        .select(
            "source",
            "n_docs",
            "n_chars_an",
            "n_words",
            F.expr(
                "cast(floor(1e3 * (4.71 * cast(n_chars_an as double)"
                " / cast(greatest(1, n_words) as double)"
                " + 0.5 * cast(n_words as double) / cast(n_sentences as double)"
                " - 21.43) + 0.5) as bigint)"
            ).alias("ari_milli"),
        )
    )


_ORACLE_ARI = r"""
WITH per_doc AS (
  SELECT source,
         length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS c,
         len(list_filter(regexp_split_to_array(text, '\s+'),
             t -> t <> '')) AS w,
         greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS s
  FROM documents
)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(c)::BIGINT AS n_chars_an,
       sum(w)::BIGINT AS n_words,
       cast(floor(1e3 * (4.71 * cast(sum(c) AS DOUBLE)
            / cast(greatest(1, sum(w)) AS DOUBLE)
            + 0.5 * cast(sum(w) AS DOUBLE) / cast(sum(s) AS DOUBLE)
            - 21.43) + 0.5) AS BIGINT) AS ari_milli
FROM per_doc GROUP BY source
"""


# --------------------------------------------------------------------------
# Yule's K vocabulary concentration per language (X6 [EXT])
# --------------------------------------------------------------------------


def q_yule_k_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6 Yule's characteristic K per language: K = 1e4 *
    (sum_types c^2 - N) / N^2 — the repeat-rate measure of vocabulary
    concentration (higher K = fewer types dominate), length-invariant
    where raw type-token ratio is not. Tokens are lowered whitespace
    tokens (shipped convention); the frequency-spectrum moments are
    exact bigints per lang. Output per lang: lang, n_tokens, n_types,
    k_milli."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        F.explode(
            F.expr("filter(split(lower(text), '\\\\s+'), t -> t <> '')")
        ).alias("tok"),
    )
    per_type = toks.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return (
        per_type.groupBy("lang")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum(F.expr("c * c")).cast("bigint").alias("s2"),
        )
        .select(
            "lang",
            "n_tokens",
            "n_types",
            F.expr(
                "cast(floor(1e3 * 1e4 * (cast(s2 as double) - cast(n_tokens as double))"
                " / cast(n_tokens as double) / cast(n_tokens as double)"
                " + 0.5) as bigint)"
            ).alias("k_milli"),
        )
    )


_ORACLE_YULE = r"""
WITH toks AS (
  SELECT lang, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                  t -> t <> '')) AS tok
  FROM documents
),
per_type AS (
  SELECT lang, tok, count(*)::BIGINT AS c FROM toks GROUP BY lang, tok
)
SELECT lang, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
       cast(floor(1e3 * 1e4 * (cast(sum(c * c) AS DOUBLE) - cast(sum(c) AS DOUBLE))
            / cast(sum(c) AS DOUBLE) / cast(sum(c) AS DOUBLE)
            + 0.5) AS BIGINT) AS k_milli
FROM per_type GROUP BY lang
"""


# --------------------------------------------------------------------------
# First-passage time to purchase per cohort (X9 [EXT])
# --------------------------------------------------------------------------


def q_first_passage_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X9 first-passage conversion timing: per even/odd user cohort,
    how many users ever reach a '{ev}' event and how long the first
    passage takes (days from first event to first '{ev}') — the
    descriptive companion of log_rank_survival (wave 118), answering
    "what fraction converts, and how fast?" rather than "do the cohorts
    differ?". One row per user, then one row per cohort; no window.
    Output per cohort: cohort, n_users, n_converted, conv_rate_micro,
    mean_days_micro."""
    e = _t(spark, sf_dir, "events")
    per_user = (
        e.select(
            "user_id",
            F.expr(f"unix_micros(ts) div {_DAY_US}").alias("d"),
            F.when(
                F.col("event_type") == _FP_EVENT,
                F.expr(f"unix_micros(ts) div {_DAY_US}"),
            ).alias("pd"),
        )
        .groupBy("user_id")
        .agg(F.min("d").alias("d0"), F.min("pd").alias("dp"))
        .select(
            (F.col("user_id") % 2).cast("int").alias("cohort"),
            F.col("dp").isNotNull().cast("int").alias("conv"),
            F.when(F.col("dp").isNotNull(), F.col("dp") - F.col("d0"))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("days"),
        )
    )
    return (
        per_user.groupBy("cohort")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("conv").cast("bigint").alias("n_converted"),
            F.sum("days").cast("bigint").alias("sum_days"),
        )
        .select(
            "cohort",
            "n_users",
            "n_converted",
            F.expr(
                "cast(floor(1e6 * cast(n_converted as double)"
                " / cast(n_users as double) + 0.5) as bigint)"
            ).alias("conv_rate_micro"),
            F.expr(
                "cast(floor(1e6 * cast(sum_days as double)"
                " / cast(greatest(1, n_converted) as double) + 0.5) as bigint)"
            ).alias("mean_days_micro"),
        )
        .orderBy("cohort")
    )


_ORACLE_FP = f"""
WITH per_user AS (
  SELECT (user_id % 2)::INT AS cohort,
         CASE WHEN min(CASE WHEN event_type = '{_FP_EVENT}'
                            THEN epoch_us(ts) // {_DAY_US} END) IS NOT NULL
              THEN 1 ELSE 0 END AS conv,
         coalesce(min(CASE WHEN event_type = '{_FP_EVENT}'
                           THEN epoch_us(ts) // {_DAY_US} END)
                  - min(epoch_us(ts) // {_DAY_US}), 0)::BIGINT AS days
  FROM events GROUP BY user_id
)
SELECT cohort, count(*)::BIGINT AS n_users, sum(conv)::BIGINT AS n_converted,
       cast(floor(1e6 * cast(sum(conv) AS DOUBLE) / cast(count(*) AS DOUBLE)
            + 0.5) AS BIGINT) AS conv_rate_micro,
       cast(floor(1e6 * cast(sum(days) AS DOUBLE)
            / cast(greatest(1, sum(conv)) AS DOUBLE) + 0.5) AS BIGINT)
         AS mean_days_micro
FROM per_user GROUP BY cohort ORDER BY cohort
"""


REGISTRY_EXT119: dict[str, QuerySpec] = {
    "gunning_fog_index": QuerySpec(
        q_gunning_fog_index, _ORACLE_FOG, "X6 [EXT] Gunning fog readability"
    ),
    "ari_readability": QuerySpec(
        q_ari_readability, _ORACLE_ARI, "X6 [EXT] automated readability index"
    ),
    "yule_k_concentration": QuerySpec(
        q_yule_k_concentration, _ORACLE_YULE, "X6 [EXT] Yule's K concentration"
    ),
    "first_passage_purchase": QuerySpec(
        q_first_passage_purchase, _ORACLE_FP, "X9 [EXT] first-passage conversion"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_first_passage_purchase.__doc__ = q_first_passage_purchase.__doc__.format(ev=_FP_EVENT)  # noqa: E501
